"""Spectrum/color validation app (SpectrumColorTestApp capability): plots of
every spectrum class + CIE/illuminant/sensor curves; lambda-sampling
comparison; spectrum→XYZ checks; color-space conversions with known
answers printed."""

from __future__ import annotations

import json
import os

import numpy as np


def main(outdir="out"):
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.ops import spectrum as spec
    from computational_ray_tracer_tpu.ops import spectra_data as data
    from computational_ray_tracer_tpu.ops import color as colorlib
    from computational_ray_tracer_tpu.utils.plot import Graph2D

    os.makedirs(outdir, exist_ok=True)
    lam = np.arange(360.0, 831.0, 1.0)
    lam_j = jnp.asarray(lam, jnp.float32)

    # CIE curves
    g = Graph2D("CIE 1931 color-matching functions (analytic fits)")
    g.plot_line(lam, data.CIE_X, label="x̄")
    g.plot_line(lam, data.CIE_Y, label="ȳ")
    g.plot_line(lam, data.CIE_Z, label="z̄")
    g.save(os.path.join(outdir, "cie_cmf.png"))

    # illuminants
    g = Graph2D("standard illuminants")
    for name in ["stdillum-A", "stdillum-D50", "stdillum-D65",
                 "stdillum-F2", "stdillum-F11"]:
        g.plot_line(lam, data.get_named_spectrum(name), label=name)
    g.save(os.path.join(outdir, "illuminants.png"))

    # spectrum classes
    g = Graph2D("spectrum distribution classes")
    g.plot_line(lam, np.asarray(spec.ConstantSpectrum(0.6)(lam_j)),
                label="constant")
    g.plot_line(lam, np.asarray(spec.BlackbodySpectrum(5000.0)(lam_j)),
                label="blackbody 5000K")
    pw = spec.PiecewiseLinearSpectrum.from_interleaved(
        [400.0, 0.1, 550.0, 0.9, 700.0, 0.3])
    g.plot_line(lam, np.asarray(pw(lam_j)), label="piecewise linear")
    alb = colorlib.RGBAlbedoSpectrum.from_rgb(jnp.asarray([0.2, 0.6, 0.3]))
    g.plot_line(lam, np.asarray(alb(lam_j)), label="rgb albedo")
    g.save(os.path.join(outdir, "spectrum_classes.png"))

    # glass dispersion + metal eta/k
    g = Graph2D("glass dispersion n(lambda) (Sellmeier)")
    for name in ["glass-BK7", "glass-SF11", "glass-LASF9"]:
        g.plot_line(lam, data.GLASS_IOR[name], label=name)
    g.save(os.path.join(outdir, "glasses.png"))
    g = Graph2D("metal complex IoR")
    for name in ["metal-Au", "metal-Ag", "metal-Cu"]:
        g.plot_line(lam, data.METAL_ETA[name], label=name + " eta")
        g.plot_line(lam, data.METAL_K[name], label=name + " k")
    g.save(os.path.join(outdir, "metals.png"))

    # lambda sampling strategies
    us = jnp.linspace(0.001, 0.999, 4096)
    wl_u = spec.sample_uniform_wavelengths(us)
    wl_v = spec.sample_visible_wavelengths(us)
    g = Graph2D("hero-wavelength sampling: uniform vs visible-importance")
    g.plot_histogram(wl_u.lam.reshape(-1), bins=94, range=(360, 830),
                     label="uniform")
    g.plot_histogram(wl_v.lam.reshape(-1), bins=94, range=(360, 830),
                     label="visible")
    g.save(os.path.join(outdir, "lambda_sampling.png"))

    # known-answer conversions (the printed checks of
    # SpectrumColorTestApp.h:196-221)
    report = {}
    d65 = spec.DenselySampledSpectrum.from_named("stdillum-D65")
    xyz = np.asarray(spec.spectrum_to_xyz(d65))
    xy = xyz[:2] / xyz.sum()
    report["d65_chromaticity"] = [round(float(v), 4) for v in xy]
    report["d65_expected"] = [0.3127, 0.3290]

    white = jnp.asarray([1.0, 1.0, 1.0])
    report["srgb_white_to_xyz"] = [
        round(float(v), 4) for v in np.asarray(colorlib.SRGB.to_xyz(white))]
    report["expected_whitepoint_Y"] = 1.0

    rgb = jnp.asarray([0.7, 0.3, 0.2])
    p3 = colorlib.convert_rgb_colorspace(rgb, colorlib.SRGB, colorlib.DCI_P3)
    back = colorlib.convert_rgb_colorspace(p3, colorlib.DCI_P3, colorlib.SRGB)
    report["srgb_to_p3"] = [round(float(v), 4) for v in np.asarray(p3)]
    report["p3_round_trip_err"] = float(np.abs(np.asarray(back - rgb)).max())

    with open(os.path.join(outdir, "spectrum_color.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report
