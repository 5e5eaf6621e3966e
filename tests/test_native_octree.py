"""Native C++ octree builder vs the NumPy reference builder."""

import numpy as np
import pytest

from computational_ray_tracer_tpu import native
from computational_ray_tracer_tpu.ops import octree as octmod
from computational_ray_tracer_tpu.ops import triangle as trimod
from computational_ray_tracer_tpu.utils import mesh_gen


needs_native = pytest.mark.skipif(native.load() is None,
                                  reason="native toolchain unavailable")


def _sphere_mesh(n=24):
    out = mesh_gen.uv_sphere((0.0, 0.0, 0.0), 1.0, n_theta=n, n_phi=n)
    return trimod.MeshData.build(out[0], out[1])


@needs_native
def test_native_tree_equals_numpy_tree():
    mesh = _sphere_mesh(20)
    pos_np, idx_np = octmod.host_mesh_arrays(mesh)
    t_np = octmod._build_octree_numpy(pos_np, idx_np, padding=0.002)
    t_cc = octmod._build_octree_native(pos_np, idx_np,
                                       octmod.TRIANGLE_CAPACITY,
                                       octmod.MAX_DEPTH, 0.002)
    assert t_cc is not None
    np.testing.assert_array_equal(np.asarray(t_np.node_child0),
                                  np.asarray(t_cc.node_child0))
    np.testing.assert_array_equal(np.asarray(t_np.node_leaf_id),
                                  np.asarray(t_cc.node_leaf_id))
    np.testing.assert_allclose(np.asarray(t_np.node_lo),
                               np.asarray(t_cc.node_lo), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_np.node_hi),
                               np.asarray(t_cc.node_hi), rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(t_np.leaf_counts),
                                  np.asarray(t_cc.leaf_counts))
    # Same triangles per leaf (order within a leaf preserved by both)
    np.testing.assert_array_equal(np.asarray(t_np.leaf_tris),
                                  np.asarray(t_cc.leaf_tris))


@needs_native
def test_native_traversal_matches_brute():
    import jax.numpy as jnp
    mesh = _sphere_mesh(16)
    tree = octmod.build_octree(mesh, backend="native")
    rng = np.random.default_rng(11)
    o = rng.uniform(-2, 2, (256, 3)).astype(np.float32)
    d = rng.normal(0, 1, (256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_max = jnp.full((256,), jnp.inf)

    t_oct, i_oct, *_ = octmod.octree_traverse(o, d, t_max, tree, mesh)
    t_ref, i_ref, *_ = trimod.mesh_intersect_brute(o, d, t_max, mesh)
    np.testing.assert_allclose(np.asarray(t_oct), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-6)


@needs_native
def test_native_builder_is_default_and_fast():
    mesh = _sphere_mesh(40)
    import time
    t0 = time.time()
    tree = octmod.build_octree(mesh)      # auto -> native
    dt = time.time() - t0
    info = tree.info()
    assert info["nodes"] > 8
    assert dt < 10.0                       # numpy takes minutes at this size
