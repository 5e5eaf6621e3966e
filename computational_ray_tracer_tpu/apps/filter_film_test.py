"""Filter/film/sensor validation app (FilterFilmTestApp capability):
filter curves + sampled histograms + integrals; sensor swatch transforms;
visible-wavelength sampling histogram; sigmoid-polynomial round trips."""

from __future__ import annotations

import json
import os

import numpy as np


def main(outdir="out", n=60_000):
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.ops import filters as flt
    from computational_ray_tracer_tpu.ops import sensor as sen
    from computational_ray_tracer_tpu.ops import spectrum as spec
    from computational_ray_tracer_tpu.ops import color as colorlib
    from computational_ray_tracer_tpu.utils.plot import Graph2D

    os.makedirs(outdir, exist_ok=True)
    u2 = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    report = {}

    for name in ["box", "triangle", "gaussian", "lanczos"]:
        f = flt.FILTERS[name]()
        p, w = f.sample(u2)
        g = Graph2D(f"{name} filter: x-marginal of samples + f(x, 0)")
        g.plot_histogram(p[:, 0], bins=80,
                         range=(-f.radius[0], f.radius[0]),
                         label="sampled x")
        g.plot_function(
            lambda x: np.asarray(f.evaluate(
                jnp.stack([jnp.asarray(x, jnp.float32),
                           jnp.zeros_like(jnp.asarray(x, jnp.float32))],
                          axis=-1))),
            -f.radius[0], f.radius[0], label="f(x, 0)")
        g.save(os.path.join(outdir, f"filter_{name}.png"))
        report[name] = {
            "integral": float(f.integral),
            "mc_integral": float(jnp.mean(w)),
        }

    # sensor swatch transforms (XYZ vs camera sensors)
    swatches = sen.macbeth_reflectances()
    for sensor_name in [None, "canon_eos_5d_mkiv", "sony_ilce_7m3"]:
        s = sen.PixelSensor.create(sensor_name)
        wl = spec.sample_visible_wavelengths(jnp.linspace(0.001, 0.999, 256))
        rgbs = []
        for i in range(24):
            L = (spec.sample_dense(jnp.asarray(swatches[i], jnp.float32),
                                   wl.lam)
                 * spec.sample_dense(jnp.asarray(colorlib.SRGB.illuminant),
                                     wl.lam))
            cam_rgb = jnp.mean(s.to_sensor_rgb(L, wl), axis=0)
            srgb = colorlib.SRGB.to_rgb(s.sensor_rgb_to_xyz(cam_rgb))
            rgbs.append(np.asarray(srgb))
        report[f"sensor_{sensor_name or 'XYZ'}"] = {
            "white_swatch": [round(float(v), 4) for v in rgbs[18]],
            "red_swatch": [round(float(v), 4) for v in rgbs[14]],
        }

    # visible-wavelength sampling histogram vs pdf
    u = jax.random.uniform(jax.random.PRNGKey(3), (n,))
    lam = spec.sample_visible_wavelength(u)
    g = Graph2D("visible-wavelength importance sampling")
    g.plot_histogram(lam, bins=94, range=(360, 830), label="sampled lambda")
    g.plot_function(
        lambda x: np.asarray(spec.visible_wavelengths_pdf(
            jnp.asarray(x, jnp.float32))), 360, 830, label="pdf")
    g.save(os.path.join(outdir, "visible_lambda.png"))

    # sigmoid polynomial round trip plot
    rgb = jnp.asarray([0.6, 0.25, 0.1])
    alb = colorlib.RGBAlbedoSpectrum.from_rgb(rgb)
    g = Graph2D("rgb2spec sigmoid reflectance for (0.6, 0.25, 0.1)")
    g.plot_function(
        lambda x: np.asarray(alb(jnp.asarray(x, jnp.float32))), 360, 830)
    g.save(os.path.join(outdir, "rgb2spec.png"))

    with open(os.path.join(outdir, "filter_film.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report
