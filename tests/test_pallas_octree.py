"""Pallas packet octree traversal vs the jnp lockstep oracle
(Octtree_Model::Traverse capability, Octtree_Model.h:66-127)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from computational_ray_tracer_tpu.utils import mesh_gen
from computational_ray_tracer_tpu.ops import triangle as trimod
from computational_ray_tracer_tpu.ops import octree as octmod
from computational_ray_tracer_tpu.ops import pallas_octree as poct
from computational_ray_tracer_tpu.ops import camera as cam


def _camera_rays(res, origin=(0, 0.4, -3.2)):
    camera = cam.PerspectiveCamera.create(origin, (res, res), fov_y=40.0,
                                          look_at=(0, 0, 0))
    px = jnp.arange(res * res, dtype=jnp.uint32)
    pp = jnp.stack([(px % res).astype(jnp.float32) + 0.5,
                    (px // res).astype(jnp.float32) + 0.5], axis=-1)
    return camera.generate_rays(pp, jnp.full((res * res, 2), 0.5))


@pytest.mark.parametrize("subdiv", [2, 3])
def test_packet_matches_jnp_oracle(subdiv):
    v, f, uv = mesh_gen.displaced_icosphere(subdiv)
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    tree = octmod.build_octree(mesh)
    packed = poct.pack_octree(tree, mesh)
    o, d = _camera_rays(40)
    tmax = jnp.full((o.shape[0],), jnp.inf)

    t_p, ti_p, b1p, b2p, _ = poct.octree_intersect_pallas(
        o, d, tmax, packed, interpret=True)
    t_j, ti_j, b1j, b2j, _ = octmod.octree_traverse(o, d, tmax, tree, mesh)

    hit_p = np.isfinite(np.asarray(t_p))
    hit_j = np.isfinite(np.asarray(t_j))
    np.testing.assert_array_equal(hit_p, hit_j)
    m = hit_p
    np.testing.assert_allclose(np.asarray(t_p)[m], np.asarray(t_j)[m],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ti_p)[m], np.asarray(ti_j)[m])
    np.testing.assert_allclose(np.asarray(b1p)[m], np.asarray(b1j)[m],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2p)[m], np.asarray(b2j)[m],
                               atol=1e-5)


def test_packet_respects_tmax_and_mask():
    v, f, uv = mesh_gen.displaced_icosphere(2)
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    tree = octmod.build_octree(mesh)
    o, d = _camera_rays(16)
    tmax = jnp.full((o.shape[0],), jnp.inf)

    # dead rays (tmax < 0) never hit
    packed = poct.pack_octree(tree, mesh)
    t, ti, *_ = poct.octree_intersect_pallas(o, d, -jnp.ones_like(tmax),
                                             packed, interpret=True)
    assert not np.isfinite(np.asarray(t)).any()

    # a backface-cull mask baked at pack time kills masked triangles
    mask = trimod.compute_backface_mask(mesh, (0.0, 0.0, 1.0))
    packed_m = poct.pack_octree(tree, mesh, mask)
    t_m, ti_m, *_ = poct.octree_intersect_pallas(o, d, tmax, packed_m,
                                                 interpret=True)
    t_j, ti_j, *_ = octmod.octree_traverse(o, d, tmax, tree, mesh,
                                           tri_mask=mask)
    np.testing.assert_array_equal(np.isfinite(np.asarray(t_m)),
                                  np.isfinite(np.asarray(t_j)))


@pytest.mark.parametrize("subdiv", [2, 3])
def test_anyhit_matches_closest_hit_occlusion(subdiv):
    """Shadow-ray any-hit (early-exit, stack drain) agrees with the
    closest-hit occlusion predicate for finite and infinite t_max."""
    v, f, uv = mesh_gen.displaced_icosphere(subdiv)
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    tree = octmod.build_octree(mesh)
    packed = poct.pack_octree(tree, mesh)
    o, d = _camera_rays(40)

    for tmax in (jnp.full((o.shape[0],), jnp.inf),
                 jnp.full((o.shape[0],), 2.5),
                 jnp.full((o.shape[0],), 0.5)):
        occ = poct.octree_anyhit_pallas(o, d, tmax, packed, interpret=True)
        t_j, ti_j, *_ = octmod.octree_traverse(o, d, tmax, tree, mesh)
        occ_j = np.isfinite(np.asarray(t_j)) & (np.asarray(ti_j) >= 0)
        np.testing.assert_array_equal(np.asarray(occ), occ_j)


def test_scene_uses_packet_kernel_when_forced():
    # use_pallas=True forces the packet path off-TPU (interpret mode):
    # the full scene_intersect must agree with the jnp octree scene.
    from computational_ray_tracer_tpu.models.scene import Scene, scene_intersect

    v, f, uv = mesh_gen.displaced_icosphere(2)
    mesh = trimod.MeshData.build(v, f, uvs=uv)

    def build(use_pallas):
        return Scene.build(
            materials=[{"kind": "diffuse", "albedo_rgb": (0.6, 0.6, 0.6)}],
            lights=[{"kind": "distant", "direction": (0, -1, 0),
                     "rgb": (1, 1, 1), "scale": 3.0}],
            mesh=(trimod.MeshData.build(v, f, uvs=uv),
                  jnp.zeros((f.shape[0],), jnp.int32)),
            use_octree=True, use_pallas=use_pallas)

    o, d = _camera_rays(24)
    tmax = jnp.full((o.shape[0],), jnp.inf)
    si_p, mid_p, _ = scene_intersect(build(True), o, d, tmax)
    si_j, mid_j, _ = scene_intersect(build(False), o, d, tmax)
    np.testing.assert_array_equal(np.asarray(si_p.valid),
                                  np.asarray(si_j.valid))
    m = np.asarray(si_p.valid)
    np.testing.assert_allclose(np.asarray(si_p.t)[m],
                               np.asarray(si_j.t)[m], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(si_p.n)[m],
                               np.asarray(si_j.n)[m], atol=1e-4)


def test_frustum_walk_matches_vector_walk():
    """The scalar interval-frustum walk may only ADD node visits (it is a
    conservative superset of the per-ray packet-OR); hits must be
    identical to the precise vector-walk kernel."""
    v, f, uv = mesh_gen.displaced_icosphere(3)
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    tree = octmod.build_octree(mesh)
    packed = poct.pack_octree(tree, mesh)
    o, d = _camera_rays(40)
    tmax = jnp.full((o.shape[0],), jnp.inf)

    out_f = poct.octree_intersect_pallas(o, d, tmax, packed,
                                         interpret=True, frustum=True)
    out_v = poct.octree_intersect_pallas(o, d, tmax, packed,
                                         interpret=True, frustum=False)
    np.testing.assert_array_equal(np.asarray(out_f[1]), np.asarray(out_v[1]))
    m = np.isfinite(np.asarray(out_f[0]))
    np.testing.assert_allclose(np.asarray(out_f[0])[m],
                               np.asarray(out_v[0])[m], rtol=1e-6)


def test_walk_width_2_matches_default():
    """CRT_WALK_WIDTH is read at import time, so the non-default width-2
    walk is exercised in a subprocess (interpret mode): its intersections
    must match the width-1 default bit-for-bit."""
    import os
    import subprocess
    import sys
    code = r"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp
from computational_ray_tracer_tpu.ops import triangle as trimod
from computational_ray_tracer_tpu.ops import octree as octmod
from computational_ray_tracer_tpu.ops import pallas_octree as poct
from computational_ray_tracer_tpu.utils import mesh_gen
assert poct.WALK_WIDTH == int(os.environ["CRT_WALK_WIDTH"])
v, f, uv = mesh_gen.displaced_icosphere(2)
mesh = trimod.MeshData.build(v, f, uvs=uv)
tree, packed = octmod.build_octree(mesh, capacity=16, pack=True)
rs = np.random.RandomState(3)
n = 1024
o = np.tile(np.array([[0, 0.5, -3.4]], np.float32), (n, 1))
tgt = rs.randn(n, 3).astype(np.float32) * 0.4
d = tgt - o
d /= np.linalg.norm(d, axis=1, keepdims=True)
t, tri, b1, b2, _ = poct.octree_intersect_pallas(
    jnp.asarray(o), jnp.asarray(d), jnp.full((n,), jnp.inf), packed)
np.save(sys.argv[1], np.stack([np.asarray(t), np.asarray(tri).astype(np.float32)]))
"""
    outs = {}
    for width in ("1", "2"):
        out = f"/tmp/walkw_{width}.npy"
        env = dict(os.environ, CRT_WALK_WIDTH=width, JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, "-c", code, out], check=True,
                       env=env, cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
        outs[width] = np.load(out)
    np.testing.assert_array_equal(outs["1"], outs["2"])


def test_chunk_rows_1_matches_default():
    """CRT_CHUNK_ROWS is read at import time (pack layout and kernel must
    agree); the non-default 1-row (8-triangle) entries are exercised in a
    subprocess and must match the default 2-row layout bit-for-bit."""
    import os
    import subprocess
    import sys
    code = r"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp
from computational_ray_tracer_tpu.ops import triangle as trimod
from computational_ray_tracer_tpu.ops import octree as octmod
from computational_ray_tracer_tpu.ops import pallas_octree as poct
from computational_ray_tracer_tpu.utils import mesh_gen
assert poct.CHUNK_ROWS == int(os.environ["CRT_CHUNK_ROWS"])
v, f, uv = mesh_gen.displaced_icosphere(2)
mesh = trimod.MeshData.build(v, f, uvs=uv)
tree, packed = octmod.build_octree(mesh, capacity=24, pack=True)
rs = np.random.RandomState(5)
n = 1024
o = np.tile(np.array([[0, 0.5, -3.4]], np.float32), (n, 1))
tgt = rs.randn(n, 3).astype(np.float32) * 0.4
d = tgt - o
d /= np.linalg.norm(d, axis=1, keepdims=True)
t, tri, b1, b2, _ = poct.octree_intersect_pallas(
    jnp.asarray(o), jnp.asarray(d), jnp.full((n,), jnp.inf), packed)
ah = poct.octree_anyhit_pallas(
    jnp.asarray(o), jnp.asarray(d), jnp.full((n,), 2.0), packed)
np.save(sys.argv[1], np.stack([np.asarray(t),
                               np.asarray(tri).astype(np.float32),
                               np.asarray(ah).astype(np.float32)]))
"""
    outs = {}
    for rows in ("1", "2"):
        out = f"/tmp/chunkrows_{rows}.npy"
        env = dict(os.environ, CRT_CHUNK_ROWS=rows, JAX_PLATFORMS="cpu",
                   CRT_OCTREE_CACHE="0")
        subprocess.run([sys.executable, "-c", code, out], check=True,
                       env=env, cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
        outs[rows] = np.load(out)
    # hit ids and anyhit bits must agree exactly; t carries ~1-ulp
    # variation (chunk grouping changes the in-range/fold sequencing)
    np.testing.assert_array_equal(outs["1"][1:], outs["2"][1:])
    np.testing.assert_allclose(outs["1"][0], outs["2"][0],
                               rtol=1e-5, atol=1e-6)
