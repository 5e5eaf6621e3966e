"""Sampler validation app (SamplerTestApp capability): histogram-vs-pdf
plots for every sampler + pixel-sampler point-set visualizations."""

from __future__ import annotations

import os

import numpy as np


def main(outdir="out", n=100_000):
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.ops import sampling as smp
    from computational_ray_tracer_tpu.ops import rng
    from computational_ray_tracer_tpu.utils.plot import Graph2D

    os.makedirs(outdir, exist_ok=True)
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (n,))
    u2 = jax.random.uniform(jax.random.PRNGKey(1), (n, 2))

    cases_1d = [
        ("linear", smp.sample_linear(u, 1.0, 3.0),
         lambda x: smp.linear_pdf(jnp.asarray(x, jnp.float32), 1.0, 3.0),
         (0, 1)),
        ("tent", smp.sample_tent(u, 2.0),
         lambda x: smp.tent_pdf(jnp.asarray(x, jnp.float32), 2.0), (-2, 2)),
        ("exponential", smp.sample_exponential(u, 1.5),
         lambda x: smp.exponential_pdf(jnp.asarray(x, jnp.float32), 1.5),
         (0, 4)),
        ("normal", smp.sample_normal(u, 0.0, 1.0),
         lambda x: smp.normal_pdf(jnp.asarray(x, jnp.float32)), (-4, 4)),
        ("logistic", smp.sample_logistic(jnp.clip(u, 1e-6, 1 - 1e-6), 0.7),
         lambda x: smp.logistic_pdf(jnp.asarray(x, jnp.float32), 0.7),
         (-5, 5)),
    ]
    for name, samples, pdf, (a, b) in cases_1d:
        g = Graph2D(f"{name} sampler: histogram vs pdf")
        g.plot_histogram(samples, bins=80, range=(a, b), label="samples")
        g.plot_function(pdf, a, b, label="pdf")
        g.save(os.path.join(outdir, f"sampler_{name}.png"))

    # 2D/3D samplers: radial/marginal histograms
    d = smp.sample_uniform_disk_concentric(u2)
    g = Graph2D("concentric disk: r^2 histogram (should be uniform)")
    g.plot_histogram(jnp.sum(d * d, axis=-1), bins=64, range=(0, 1))
    g.plot_function(lambda x: np.ones_like(x), 0, 1, label="uniform")
    g.save(os.path.join(outdir, "sampler_disk_r2.png"))

    h = smp.sample_cosine_hemisphere(u2)
    g = Graph2D("cosine hemisphere: cos(theta) histogram vs 2z")
    g.plot_histogram(h[:, 2], bins=64, range=(0, 1))
    g.plot_function(lambda x: 2 * x, 0, 1, label="pdf 2z")
    g.save(os.path.join(outdir, "sampler_cosine_z.png"))

    # pixel-sampler point sets (the "repeat runs land on top" determinism
    # visualization, SamplerTestApp.h:251-300)
    spp = 64
    idx = jnp.arange(spp)
    for name, pts in [
        ("independent", np.stack([
            np.asarray(rng.independent_1d(0, 5, idx, 0)),
            np.asarray(rng.independent_1d(0, 5, idx, 1))], axis=1)),
        ("stratified", np.asarray(rng.stratified_2d(0, 5, idx, 0, 8, 8))),
        ("sobol_owen", np.asarray(rng.sobol_owen_2d(0, 5, idx, 0, spp=spp))),
    ]:
        g = Graph2D(f"{name} pixel sampler: {spp} points")
        g.plot_points(pts[:, 0], pts[:, 1], s=14)
        g.set_range(0, 1, 0, 1)
        g.save(os.path.join(outdir, f"points_{name}.png"))
    print(f"sampler plots -> {outdir}")
