"""Monte Carlo estimator utilities.

Capability parity with ``RayTracer/MonteCarlos.h:44-214``: the uniform
estimator ((b-a)/N Σ f(Xᵢ)) and the importance-sampled distribution estimator
(1/N Σ f/p), each reporting expected value, sample variance, efficiency, and a
Chebyshev confidence bound — vectorized over the whole sample batch (one
reduction instead of the reference's accumulation loop).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EstimatorResult:
    estimate: jnp.ndarray
    variance: jnp.ndarray          # variance of the *estimator* (σ²/N)
    sample_variance: jnp.ndarray   # variance of one-sample contributions
    efficiency: jnp.ndarray        # 1 / (variance · cost)
    chebyshev_bound: jnp.ndarray   # ε with P(|F - E| ≥ ε) ≤ delta

    @staticmethod
    def _from_contributions(contrib, cost, delta):
        n = contrib.shape[-1]
        est = jnp.mean(contrib, axis=-1)
        svar = jnp.var(contrib, axis=-1, ddof=1)
        var = svar / n
        eff = 1.0 / jnp.maximum(var * cost, 1e-30)
        cheb = jnp.sqrt(var / delta)
        return EstimatorResult(est, var, svar, eff, cheb)


def uniform_estimator(f, samples, a, b, cost=1.0, delta=0.05):
    """(b-a)/N Σ f(Xᵢ) for Xᵢ uniform on [a,b] (MonteCarlos.h:120-214)."""
    contrib = (b - a) * f(samples)
    return EstimatorResult._from_contributions(contrib, cost, delta)


def distribution_estimator(f, samples, pdf_values, cost=1.0, delta=0.05):
    """1/N Σ f(Xᵢ)/p(Xᵢ) importance-sampled estimator (MonteCarlos.h:44-118)."""
    contrib = f(samples) / jnp.maximum(pdf_values, 1e-30)
    return EstimatorResult._from_contributions(contrib, cost, delta)


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    """MIS balance heuristic."""
    return (nf * f_pdf) / jnp.maximum(nf * f_pdf + ng * g_pdf, 1e-30)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """MIS power heuristic (beta = 2)."""
    f = nf * f_pdf
    g = ng * g_pdf
    return (f * f) / jnp.maximum(f * f + g * g, 1e-30)
