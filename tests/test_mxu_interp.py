"""The MXU one-hot interpolation paths must agree with the gather paths to
f32 rounding — they are alternative lowerings of the same math (TPU gathers
serialize; one-hot dots do not). Forced on here so CI covers the one-hot
implementation even on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from computational_ray_tracer_tpu.ops import spectrum as spec
from computational_ray_tracer_tpu.ops import spectra_data as data
from computational_ray_tracer_tpu.ops import triangle as trimod
from computational_ray_tracer_tpu.utils import mesh_gen


@pytest.fixture
def force_mxu(monkeypatch):
    monkeypatch.setattr(spec, "_use_mxu_interp", lambda: True)


def test_sample_dense_multi_matches_gather(force_mxu):
    rng = np.random.default_rng(0)
    tables = jnp.asarray(rng.normal(size=(data.N_DENSE, 3)).astype(np.float32))
    lam = jnp.asarray(rng.uniform(350, 840, size=(257, 8)).astype(np.float32))
    got = spec.sample_dense_multi(tables, lam)
    want = jnp.stack([spec.sample_dense(tables[:, c], lam)
                      for c in range(3)], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_sample_dense_rows_matches_gather(force_mxu):
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(5, data.N_DENSE)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, 5, size=(123,)).astype(np.int32))
    lam = jnp.asarray(rng.uniform(360, 830, size=(123, 8)).astype(np.float32))
    got = spec.sample_dense_rows(table, rows, lam)
    # oracle: plain per-row gather formula
    x = np.asarray(lam) - spec.LAMBDA_MIN
    i0 = np.clip(np.floor(x).astype(np.int32), 0, data.N_DENSE - 2)
    f = np.clip(x - i0, 0.0, 1.0)
    t = np.asarray(table)
    r = np.asarray(rows)
    ref = (t[r[:, None], i0] * (1 - f) + t[r[:, None], i0 + 1] * f)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_sample_dense_rows_multi_matches_single(force_mxu):
    rng = np.random.default_rng(2)
    tabs = [jnp.asarray(rng.normal(size=(4, data.N_DENSE)).astype(np.float32))
            for _ in range(3)]
    rows = jnp.asarray(rng.integers(0, 4, size=(64,)).astype(np.int32))
    lam = jnp.asarray(rng.uniform(360, 830, size=(64, 8)).astype(np.float32))
    got = spec.sample_dense_rows_multi(tabs, rows, lam)
    for g, t in zip(got, tabs):
        want = spec.sample_dense_rows(t, rows, lam)
        np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_mesh_surface_onehot_matches_gather(monkeypatch):
    pos, idx, uv, mats, _ = mesh_gen.cornell_box(2.0)
    mesh = trimod.MeshData.build(pos, idx, uvs=uv)
    rng = np.random.default_rng(3)
    n = 97
    o = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.asarray(rng.uniform(0.5, 2.0, size=(n,)).astype(np.float32))
    tri = jnp.asarray(rng.integers(0, mesh.n_triangles, size=(n,))
                      .astype(np.int32))
    b1 = jnp.asarray(rng.uniform(0, 0.5, size=(n,)).astype(np.float32))
    b2 = jnp.asarray(rng.uniform(0, 0.5, size=(n,)).astype(np.float32))

    si_gather = trimod.mesh_surface(o, d, t, tri, b1, b2, mesh)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    si_onehot = trimod.mesh_surface(o, d, t, tri, b1, b2, mesh)
    for field in ("p", "n", "uv", "dpdu", "dpdv"):
        np.testing.assert_allclose(
            np.asarray(getattr(si_onehot, field)),
            np.asarray(getattr(si_gather, field)), rtol=1e-5, atol=1e-6,
            err_msg=field)


def test_dense_interp_pallas_matches_gather():
    """The (env-gated) Pallas one-hot-in-VMEM interp kernel must match the
    gather formula to f32 rounding (interpret mode off-TPU)."""
    from computational_ray_tracer_tpu.ops import pallas_interp as pi
    rng = np.random.default_rng(3)
    tables = jnp.asarray(rng.normal(size=(471, 15)).astype(np.float32))
    i0 = jnp.asarray(rng.integers(0, 469, size=(4096,)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0, 1, size=(4096,)).astype(np.float32))
    got = np.asarray(pi.dense_interp_pallas(tables, i0, w, interpret=True))
    t = np.asarray(tables)
    want = t[np.asarray(i0)] * (1 - np.asarray(w)[:, None]) \
        + t[np.asarray(i0) + 1] * np.asarray(w)[:, None]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
