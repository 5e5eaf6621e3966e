"""Numerical substrate: spectra, color, sampling, RNG, geometry kernels."""
