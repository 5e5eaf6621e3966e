"""Filter + PixelSensor + MC estimator tests (capability:
FilterFilmTestApp.h:68-174, MonteCarlosTestApp.h:61-117)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from computational_ray_tracer_tpu.ops import filters as flt
from computational_ray_tracer_tpu.ops import sensor as sen
from computational_ray_tracer_tpu.ops import montecarlo as mc
from computational_ray_tracer_tpu.ops import sampling as smp
from computational_ray_tracer_tpu.ops import spectrum as spec


def _u2(seed, n):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, 2))


@pytest.mark.parametrize("make,expected_integral", [
    (lambda: flt.box_filter((0.5, 0.5)), 1.0),
    (lambda: flt.triangle_filter((0.5, 0.5)), 0.0625),
    (lambda: flt.gaussian_filter((1.5, 1.5), 0.5), None),
    (lambda: flt.lanczos_sinc_filter((4.0, 4.0), 3.0), None),
])
def test_filter_integral_matches_mc(make, expected_integral):
    f = make()
    if expected_integral is not None:
        assert f.integral == pytest.approx(expected_integral, rel=1e-3)
    # MC estimate of the integral from importance samples: E[weight] == ∫f
    _, w = f.sample(_u2(0, 100_000))
    assert float(jnp.mean(w)) == pytest.approx(f.integral, rel=0.01)


def test_filter_samples_inside_radius():
    f = flt.gaussian_filter((1.5, 1.5), 0.5)
    p, _ = f.sample(_u2(1, 10_000))
    p = np.asarray(p)
    assert np.abs(p[:, 0]).max() <= 1.5 + 1e-5
    assert np.abs(p[:, 1]).max() <= 1.5 + 1e-5


def test_filter_sample_density_proportional_to_f():
    # Histogram of sampled x positions should match f marginal (box: uniform).
    f = flt.triangle_filter((1.0, 1.0))
    p, _ = f.sample(_u2(2, 200_000))
    x = np.asarray(p)[:, 0]
    h, edges = np.histogram(x, bins=20, range=(-1, 1), density=True)
    centers = (edges[:-1] + edges[1:]) / 2
    expect = (1.0 - np.abs(centers))  # triangle marginal, normalized below
    expect /= np.trapezoid(expect, centers)
    np.testing.assert_allclose(h, expect, atol=0.05)


def test_filter_evaluate():
    f = flt.box_filter((0.5, 0.5))
    assert float(f.evaluate(jnp.asarray([0.2, -0.3]))) == pytest.approx(1.0)
    assert float(f.evaluate(jnp.asarray([0.7, 0.0]))) == 0.0
    t = flt.triangle_filter((1.0, 1.0))
    assert float(t.evaluate(jnp.asarray([0.0, 0.0]))) == pytest.approx(1.0, rel=1e-3)
    assert float(t.evaluate(jnp.asarray([0.5, 0.5]))) == pytest.approx(0.25, rel=1e-2)


def test_xyz_sensor_whitepoint():
    # XYZ sensor viewing the colorspace illuminant should land on the
    # whitepoint chromaticity after conversion.
    s = sen.PixelSensor.create(None)
    d65 = spec.DenselySampledSpectrum.from_named("stdillum-D65")
    us = jnp.linspace(0.001, 0.999, 512)
    wl = spec.sample_visible_wavelengths(us)
    L = d65(wl.lam)
    rgb = jnp.mean(s.to_sensor_rgb(L, wl), axis=0)
    xyz = np.asarray(s.sensor_rgb_to_xyz(rgb))
    xy = xyz[:2] / xyz.sum()
    np.testing.assert_allclose(xy, [0.3127, 0.3290], atol=0.01)


def test_camera_sensor_calibration_neutral_swatch():
    # A neutral gray swatch through a camera sensor + calibrated matrix should
    # come out near-neutral in sRGB (the FilterFilmTestApp swatch check).
    from computational_ray_tracer_tpu.ops import color as c
    s = sen.PixelSensor.create("canon_eos_5d_mkiv")
    refl = sen.macbeth_reflectances()[20]  # neutral 6.5
    wl = spec.sample_visible_wavelengths(jnp.linspace(0.001, 0.999, 512))
    import computational_ray_tracer_tpu.ops.spectra_data as data
    L = (spec.sample_dense(jnp.asarray(refl, jnp.float32), wl.lam)
         * spec.sample_dense(jnp.asarray(data.ILLUM_D65), wl.lam))
    rgb_cam = jnp.mean(s.to_sensor_rgb(L, wl), axis=0)
    xyz = s.sensor_rgb_to_xyz(rgb_cam)
    srgb = np.asarray(c.SRGB.to_rgb(xyz))
    assert srgb.max() > 0
    ratio = srgb / srgb.max()
    assert ratio.min() > 0.9  # near neutral


def test_uniform_estimator_known_integral():
    # ∫₅¹² (cos x + 5) dx = 35.4223513567 (MonteCarlosTestApp.h:67-68).
    target = 35.4223513567
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (400_000,), minval=5.0, maxval=12.0)
    res = mc.uniform_estimator(lambda t: jnp.cos(t) + 5.0, x, 5.0, 12.0)
    assert float(res.estimate) == pytest.approx(target, abs=0.05)
    assert float(res.variance) > 0
    assert float(res.chebyshev_bound) > 0


def test_importance_estimator_lower_variance():
    # Importance sampling x^2 by a linear pdf should cut variance vs uniform.
    key = jax.random.PRNGKey(4)
    u = jax.random.uniform(key, (200_000,))
    xs = smp.sample_linear(u, 0.2, 1.8)  # roughly increasing like f
    pdf = smp.linear_pdf(xs, 0.2, 1.8)
    res_i = mc.distribution_estimator(lambda t: t * t, xs, pdf)
    x_u = jax.random.uniform(jax.random.PRNGKey(5), (200_000,))
    res_u = mc.uniform_estimator(lambda t: t * t, x_u, 0.0, 1.0)
    assert float(res_i.estimate) == pytest.approx(1.0 / 3.0, abs=0.005)
    assert float(res_u.estimate) == pytest.approx(1.0 / 3.0, abs=0.005)
    assert float(res_i.sample_variance) < float(res_u.sample_variance)
    assert float(res_i.efficiency) > float(res_u.efficiency)
