"""Sampler distribution tests: chi-square / moment checks replacing the
reference's eyeballed histogram plots (SamplerTestApp.h:64-249, SURVEY §4)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats as sps

from computational_ray_tracer_tpu.ops import sampling as s

N = 200_000


def _u1(seed=0, n=N):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n,))


def _u2(seed=0, n=N):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, 2))


def _chi2_ok(samples, cdf, a, b, bins=40):
    stat, k = s.chi_square_statistic(samples, cdf, a, b, bins)
    # 99.9% critical value — flaky-resistant
    return stat < sps.chi2.ppf(0.999, k - 1)


def test_erf_inv_round_trip():
    x = jnp.linspace(-0.999, 0.999, 201)
    y = s.erf_inv(x)
    np.testing.assert_allclose(np.asarray(jax.lax.erf(y)), np.asarray(x),
                               atol=2e-5)


def test_sample_linear_chi2():
    a, b = 1.0, 3.0
    x = s.sample_linear(_u1(), a, b)

    def cdf(t):
        return s.invert_linear_sample(np.clip(t, 0, 1), a, b)
    assert _chi2_ok(x, cdf, 0.0, 1.0)


def test_linear_inverse_round_trip():
    u = jnp.linspace(0.01, 0.99, 99)
    x = s.sample_linear(u, 0.5, 2.0)
    np.testing.assert_allclose(np.asarray(s.invert_linear_sample(x, 0.5, 2.0)),
                               np.asarray(u), atol=1e-5)


def test_sample_tent_chi2():
    r = 2.0
    x = s.sample_tent(_u1(1), r)

    def cdf(t):
        return float(s.invert_tent_sample(jnp.float32(t), r))
    assert _chi2_ok(x, cdf, -r, r)


def test_sample_exponential_chi2():
    a = 1.7
    x = s.sample_exponential(_u1(2), a)
    assert _chi2_ok(x, lambda t: 1 - math.exp(-a * t), 0.0, 4.0)


def test_sample_normal_moments():
    x = s.sample_normal(_u1(3), 1.5, 0.7)
    assert float(jnp.mean(x)) == pytest.approx(1.5, abs=0.01)
    assert float(jnp.std(x)) == pytest.approx(0.7, abs=0.01)
    assert _chi2_ok(x, lambda t: sps.norm.cdf(t, 1.5, 0.7), -1.0, 4.0)


def test_sample_logistic_chi2():
    sc = 0.8
    x = s.sample_logistic(jnp.clip(_u1(4), 1e-6, 1 - 1e-6), sc)
    assert _chi2_ok(x, lambda t: 1 / (1 + math.exp(-t / sc)), -5.0, 5.0)


def test_bilinear_sample_pdf_consistent():
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    u = _u2(5, 100_000)
    p = s.sample_bilinear(u, jnp.broadcast_to(w, (u.shape[0], 4)))
    # MC estimate of E[1/pdf] = area = 1
    pdf = s.bilinear_pdf(p, jnp.broadcast_to(w, (u.shape[0], 4)))
    assert float(jnp.mean(1.0 / pdf)) == pytest.approx(1.0, rel=0.02)
    # inverse round trip
    u_back = s.invert_bilinear_sample(p, jnp.broadcast_to(w, (u.shape[0], 4)))
    np.testing.assert_allclose(np.asarray(u_back)[:500], np.asarray(u)[:500],
                               atol=1e-4)


def test_disk_concentric_uniform():
    p = s.sample_uniform_disk_concentric(_u2(6))
    r2 = np.asarray(jnp.sum(p * p, axis=-1))
    assert r2.max() <= 1.0 + 1e-6
    # uniform on disk => r^2 uniform on [0,1]
    assert _chi2_ok(jnp.asarray(r2), lambda t: t, 0.0, 1.0)
    # angle uniform
    theta = np.arctan2(np.asarray(p)[:, 1], np.asarray(p)[:, 0])
    assert _chi2_ok(jnp.asarray(theta), lambda t: (t + math.pi) / (2 * math.pi),
                    -math.pi, math.pi)


def test_disk_polar_uniform():
    p = s.sample_uniform_disk_polar(_u2(7), radius=2.0)
    r2 = jnp.sum(p * p, axis=-1) / 4.0
    assert _chi2_ok(r2, lambda t: t, 0.0, 1.0)


def test_hemisphere_uniform():
    w = s.sample_uniform_hemisphere(_u2(8))
    n = np.asarray(jnp.linalg.norm(w, axis=-1))
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    assert np.asarray(w)[:, 2].min() >= 0
    # cos(theta) uniform on [0,1] for uniform hemisphere
    assert _chi2_ok(w[:, 2], lambda t: t, 0.0, 1.0)
    # inverse round trip
    u = _u2(8)
    np.testing.assert_allclose(
        np.asarray(s.invert_uniform_hemisphere_sample(w))[:300],
        np.asarray(u)[:300], atol=1e-4)


def test_sphere_uniform():
    w = s.sample_uniform_sphere(_u2(9))
    assert _chi2_ok(w[:, 2], lambda t: (t + 1) / 2, -1.0, 1.0)
    u = _u2(9)
    np.testing.assert_allclose(
        np.asarray(s.invert_uniform_sphere_sample(w))[:300],
        np.asarray(u)[:300], atol=1e-4)


def test_cosine_hemisphere():
    w = s.sample_cosine_hemisphere(_u2(10))
    # cos-weighted: cdf of z is z^2... actually pdf(z) = 2z on [0,1]
    assert _chi2_ok(w[:, 2], lambda t: t * t, 0.0, 1.0)
    n = np.asarray(jnp.linalg.norm(w, axis=-1))
    np.testing.assert_allclose(n, 1.0, atol=1e-4)


def test_cone_sampling():
    ct_max = 0.8
    w = s.sample_uniform_cone(_u2(11), ct_max)
    z = np.asarray(w)[:, 2]
    assert z.min() >= ct_max - 1e-5
    # cos(theta) is uniform on [ct_max, 1]
    assert _chi2_ok(jnp.asarray(z), lambda t: (t - ct_max) / (1 - ct_max),
                    ct_max, 1.0)
    # pdf integrates: solid angle * pdf = 1
    assert s.uniform_cone_pdf(ct_max) * 2 * math.pi * (1 - ct_max) == \
        pytest.approx(1.0)


def test_sample_discrete():
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    idx, pmf, u_remap = s.sample_discrete(_u1(12), jnp.broadcast_to(w, (N, 4)))
    counts = np.bincount(np.asarray(idx), minlength=4) / N
    np.testing.assert_allclose(counts, [0.1, 0.2, 0.3, 0.4], atol=0.01)
    expect_pmf = np.asarray([0.1, 0.2, 0.3, 0.4])[np.asarray(idx)]
    np.testing.assert_allclose(np.asarray(pmf), expect_pmf, atol=1e-6)
    ur = np.asarray(u_remap)
    assert ur.min() >= 0 and ur.max() <= 1
    # remapped u is uniform
    assert _chi2_ok(u_remap, lambda t: t, 0.0, 1.0)


def test_alias_table():
    # Completes the reference's stub (Sampling.h:905-952).
    t = s.AliasTable.build([5.0, 1.0, 3.0, 1.0])
    idx, pmf = t.sample(_u1(13))
    counts = np.bincount(np.asarray(idx), minlength=4) / N
    np.testing.assert_allclose(counts, [0.5, 0.1, 0.3, 0.1], atol=0.01)
    np.testing.assert_allclose(np.asarray(t.pmf), [0.5, 0.1, 0.3, 0.1],
                               atol=1e-6)


def test_tabulated_distribution():
    # x^2 on [0, 2] (SamplerTestApp inversion-sampler test case)
    d = s.TabulatedDistribution1D.from_function(lambda x: x * x, 0.0, 2.0)
    x, pdf = d.sample(_u1(14))
    assert _chi2_ok(x, lambda t: t ** 3 / 8.0, 0.0, 2.0)
    np.testing.assert_allclose(np.asarray(pdf),
                               3 * np.asarray(x) ** 2 / 8.0, rtol=0.02,
                               atol=1e-3)
    np.testing.assert_allclose(float(d.pdf_at(jnp.float32(1.0))), 3.0 / 8.0,
                               rtol=0.01)


def test_rejection_sampler():
    key = jax.random.PRNGKey(15)
    # oversample high enough that accepted >> n (duplicate picks would
    # otherwise distort the chi-square statistic)
    x = s.rejection_sample_1d(lambda t: jnp.exp(-t), key, 0.0, 5.0, 1.0,
                              50_000, oversample=16)
    # truncated exponential on [0,5]
    z = 1 - math.exp(-5.0)
    assert _chi2_ok(x, lambda t: (1 - math.exp(-t)) / z, 0.0, 5.0)


def test_normalize_pdf():
    c = s.normalize_pdf(lambda x: x * x, 0.0, 2.0)
    assert float(c) == pytest.approx(8.0 / 3.0, rel=1e-3)


def test_mis_heuristics():
    from computational_ray_tracer_tpu.ops.montecarlo import (
        balance_heuristic, power_heuristic)
    w1 = balance_heuristic(1, jnp.float32(0.5), 1, jnp.float32(0.5))
    assert float(w1) == pytest.approx(0.5)
    w2 = power_heuristic(1, jnp.float32(1.0), 1, jnp.float32(0.0))
    assert float(w2) == pytest.approx(1.0)
