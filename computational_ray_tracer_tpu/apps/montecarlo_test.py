"""Monte Carlo estimator app (MonteCarlosTestApp capability): EV / variance
/ efficiency / Chebyshev bounds on ∫₅¹²(cos x + 5)dx against the analytic
answer 35.4223513567, for uniform and importance-sampled estimators."""

from __future__ import annotations

import json
import os

import numpy as np

ANALYTIC = 35.4223513567  # MonteCarlosTestApp.h:67-68


def main(outdir="out", n=200_000):
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.ops import montecarlo as mc
    from computational_ray_tracer_tpu.ops import sampling as smp

    os.makedirs(outdir, exist_ok=True)
    f = lambda x: jnp.cos(x) + 5.0
    a, b = 5.0, 12.0
    report = {"analytic": ANALYTIC}

    x_u = jax.random.uniform(jax.random.PRNGKey(0), (n,), minval=a, maxval=b)
    res = mc.uniform_estimator(f, x_u, a, b)
    report["uniform"] = {
        "estimate": float(res.estimate),
        "abs_error": abs(float(res.estimate) - ANALYTIC),
        "variance": float(res.variance),
        "efficiency": float(res.efficiency),
        "chebyshev_95": float(res.chebyshev_bound),
    }

    # importance sampling with a linear pdf rising over [a, b]
    u = jax.random.uniform(jax.random.PRNGKey(1), (n,))
    t = smp.sample_linear(u, 0.8, 1.2)
    xs = a + t * (b - a)
    pdf = smp.linear_pdf(t, 0.8, 1.2) / (b - a)
    res_i = mc.distribution_estimator(f, xs, pdf)
    report["importance_linear"] = {
        "estimate": float(res_i.estimate),
        "abs_error": abs(float(res_i.estimate) - ANALYTIC),
        "variance": float(res_i.variance),
        "efficiency": float(res_i.efficiency),
    }

    with open(os.path.join(outdir, "montecarlo.json"), "w") as fjson:
        json.dump(report, fjson, indent=2)
    print(json.dumps(report, indent=2))
    return report
