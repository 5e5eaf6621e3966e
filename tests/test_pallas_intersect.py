"""Pallas mesh-intersection kernel vs the jnp watertight reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from computational_ray_tracer_tpu.ops import triangle as trimod
from computational_ray_tracer_tpu.ops import pallas_intersect as pk
from computational_ray_tracer_tpu.utils import mesh_gen


def _random_scene(n_rays=777, n_tris=450, seed=0):
    rng = np.random.default_rng(seed)
    # Random triangle soup in [-1,1]^3 with bounded size
    base = rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.25, (n_tris, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.25, (n_tris, 3)).astype(np.float32)
    pos = np.concatenate([base, base + e1, base + e2], axis=0)
    idx = np.stack([np.arange(n_tris), np.arange(n_tris) + n_tris,
                    np.arange(n_tris) + 2 * n_tris], axis=1).astype(np.int32)
    mesh = trimod.MeshData.build(pos, idx)

    o = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return mesh, jnp.asarray(o), jnp.asarray(d)


def test_pallas_matches_reference_soup():
    mesh, o, d = _random_scene()
    t_max = jnp.full(o.shape[:-1], jnp.inf)

    t_ref, i_ref, b1_ref, b2_ref, _ = trimod.mesh_intersect_brute(
        o, d, t_max, mesh)
    t_pk, i_pk, b1_pk, b2_pk, _ = pk.mesh_intersect_pallas(
        o, d, t_max, mesh, interpret=True)

    t_ref = np.asarray(t_ref)
    t_pk = np.asarray(t_pk)
    hit_ref = np.isfinite(t_ref)
    hit_pk = np.isfinite(t_pk)
    # Hit/miss agreement on >99.5% of rays (FP-order differences only at
    # silhouette-grazing rays; SURVEY §7 "hard parts" accepts allclose).
    agree = hit_ref == hit_pk
    assert agree.mean() > 0.995
    both = hit_ref & hit_pk & agree
    np.testing.assert_allclose(t_pk[both], t_ref[both], rtol=2e-4, atol=2e-5)
    same_tri = np.asarray(i_pk)[both] == np.asarray(i_ref)[both]
    assert same_tri.mean() > 0.99
    np.testing.assert_allclose(np.asarray(b1_pk)[both][same_tri],
                               np.asarray(b1_ref)[both][same_tri],
                               rtol=1e-3, atol=1e-4)


def test_pallas_cornell_box():
    pos, idx, uv, mats, _ = mesh_gen.cornell_box(2.0)
    mesh = trimod.MeshData.build(pos, idx, uvs=uv)
    rng = np.random.default_rng(3)
    # Origins inside the box: every direction must hit a wall.
    o = rng.uniform(-0.5, 0.5, (512, 3)).astype(np.float32)
    d = rng.normal(0, 1, (512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_max = jnp.full((512,), jnp.inf)

    t_ref, i_ref, *_ = trimod.mesh_intersect_brute(o, d, t_max, mesh)
    t_pk, i_pk, *_ = pk.mesh_intersect_pallas(o, d, t_max, mesh,
                                              interpret=True)
    t_ref, t_pk = np.asarray(t_ref), np.asarray(t_pk)
    # The box is open at the camera face: miss sets must agree exactly, and
    # hits must match the jnp watertight reference.
    np.testing.assert_array_equal(np.isfinite(t_ref), np.isfinite(t_pk))
    hit = np.isfinite(t_ref)
    assert hit.mean() > 0.5
    np.testing.assert_allclose(t_pk[hit], t_ref[hit], rtol=2e-4, atol=2e-5)
    assert (np.asarray(i_pk)[hit] == np.asarray(i_ref)[hit]).mean() > 0.99


def test_pallas_respects_tmax_and_mask():
    mesh, o, d = _random_scene(n_rays=256, n_tris=100, seed=5)
    t_max = jnp.full(o.shape[:-1], 1.5)
    mask = jnp.asarray(np.arange(100) % 2 == 0)

    t_ref, i_ref, *_ = trimod.mesh_intersect_brute(o, d, t_max, mesh,
                                                   tri_mask=mask)
    t_pk, i_pk, *_ = pk.mesh_intersect_pallas(o, d, t_max, mesh,
                                              tri_mask=mask, interpret=True)
    t_ref, t_pk = np.asarray(t_ref), np.asarray(t_pk)
    assert (t_pk[np.isfinite(t_pk)] <= 1.5 + 1e-5).all()
    agree = np.isfinite(t_ref) == np.isfinite(t_pk)
    assert agree.mean() > 0.99
    # masked-off triangles never reported
    hit = np.isfinite(t_pk)
    assert (np.asarray(i_pk)[hit] % 2 == 0).all()


def test_pallas_zero_gradient_detach():
    mesh, o, d = _random_scene(n_rays=64, n_tris=30, seed=7)
    t_max = jnp.full(o.shape[:-1], jnp.inf)

    def loss(o_):
        t, idx, b1, b2, _ = pk.mesh_intersect_pallas(o_, d, t_max, mesh,
                                                     interpret=True)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    g = jax.grad(loss)(o)
    assert np.allclose(np.asarray(g), 0.0)
