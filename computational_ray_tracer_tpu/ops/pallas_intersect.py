"""Pallas TPU kernel for brute-force mesh intersection (the hot op).

The reference's innermost hot loop is ``Triangle::BasicIntersect`` inside the
octree/TriModel traversal (``RayTracer/Shapes.h:1101-1260``,
``Octtree_Model.h:66-127``). On TPU the wavefront formulation makes this a
(rays x triangles) pairwise problem that maps directly onto the VPU:

- grid = (ray_tiles, tri_tiles); each program intersects a tile of
  ``TILE_R`` rays against a tile of ``TILE_T`` triangles as one
  ``(TILE_R, TILE_T)`` elementwise watertight test — sublanes = rays,
  lanes = triangles;
- ray SoA components arrive as ``(TILE_R, 1)`` VMEM blocks, triangle SoA
  components as ``(1, TILE_T)`` blocks — broadcasting does the pairing with
  no transposes or relayouts;
- the triangle grid axis is innermost ("arbitrary" semantics): the output
  blocks for a ray tile are revisited across triangle tiles and accumulate
  the running closest hit in VMEM (the matmul-K-loop pattern), so HBM sees
  exactly one write per ray;
- the math is the same watertight algorithm as
  :func:`computational_ray_tracer_tpu.ops.triangle.triangle_intersect`
  (translate -> permute dominant axis -> shear -> signed edge functions with
  Dekker-split exact-product correction -> conservative gamma error bound),
  with the axis permutation done branch-free via per-ray selects.

Intersection outputs are piecewise-constant in scene parameters (hit ids and
barycentrics are sampling *decisions* — detached under the reparameterized
gradient design, SURVEY §7 stance #5), so the kernel is wrapped in a
``custom_jvp`` with zero tangents; the jnp path in ``triangle.py`` remains
the reference implementation and the differentiable-geometry fallback.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from computational_ray_tracer_tpu.ops.shapes import MACHINE_EPS

TILE_R = 256   # rays per tile (sublanes)
TILE_T = 128   # triangles per tile (lanes)


def _gamma(n):
    ne = n * MACHINE_EPS
    return ne / (1.0 - ne)


def _two_prod_err(a, b, ab):
    # Dekker split error of a*b - ab (no hardware FMA on the VPU fp32 path).
    c = jnp.float32(0x10001) * a
    ah = c - (c - a)
    al = a - ah
    c = jnp.float32(0x10001) * b
    bh = c - (c - b)
    bl = b - bh
    return ((ah * bh - ab) + ah * bl + al * bh) + al * bl


def _dop(a, b, c, d):
    """a*b - c*d with exact-product correction (DifferenceOfProducts,
    helpers.h:56-62)."""
    ab = a * b
    cd = c * d
    return (ab - cd) + (_two_prod_err(a, b, ab) - _two_prod_err(c, d, cd))


def _intersect_kernel(ox, oy, oz, dx, dy, dz, tmax,
                      p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z, mask,
                      t_out, idx_out, b1_out, b2_out):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_out[:] = tmax[:]
        idx_out[:] = jnp.full(idx_out.shape, -1, jnp.int32)
        b1_out[:] = jnp.zeros(b1_out.shape, jnp.float32)
        b2_out[:] = jnp.zeros(b2_out.shape, jnp.float32)

    o = (ox[:], oy[:], oz[:])          # each (R, 1)
    d = (dx[:], dy[:], dz[:])
    v0 = (p0x[:] - o[0], p0y[:] - o[1], p0z[:] - o[2])   # (R, T)
    v1 = (p1x[:] - o[0], p1y[:] - o[1], p1z[:] - o[2])
    v2 = (p2x[:] - o[0], p2y[:] - o[1], p2z[:] - o[2])

    # Branch-free axis permutation: kz = argmax |d| per ray, (kx, ky) cyclic.
    adx, ady, adz = jnp.abs(d[0]), jnp.abs(d[1]), jnp.abs(d[2])
    kz_x = (adx >= ady) & (adx >= adz)           # (R, 1) bool
    kz_y = (~kz_x) & (ady >= adz)

    def perm(v):
        # returns v permuted to (x', y', z') with z' = dominant axis
        vz = jnp.where(kz_x, v[0], jnp.where(kz_y, v[1], v[2]))
        vx = jnp.where(kz_x, v[1], jnp.where(kz_y, v[2], v[0]))
        vy = jnp.where(kz_x, v[2], jnp.where(kz_y, v[0], v[1]))
        return vx, vy, vz

    dxp, dyp, dzp = perm(d)
    axp, ayp, azp = perm(v0)
    bxp, byp, bzp = perm(v1)
    cxp, cyp, czp = perm(v2)

    inv_dz = 1.0 / dzp
    sx = -dxp * inv_dz
    sy = -dyp * inv_dz

    ax = axp + sx * azp
    ay = ayp + sy * azp
    bx = bxp + sx * bzp
    by = byp + sy * bzp
    cx = cxp + sx * czp
    cy = cyp + sy * czp

    e0 = _dop(bx, cy, by, cx)
    e1 = _dop(cx, ay, cy, ax)
    e2 = _dop(ax, by, ay, bx)

    same_side = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
    det = e0 + e1 + e2
    nonzero = det != 0.0

    az_s = inv_dz * azp
    bz_s = inv_dz * bzp
    cz_s = inv_dz * czp
    t_scaled = e0 * az_s + e1 * bz_s + e2 * cz_s

    t_cur = t_out[:]                               # (R, 1) running best
    ts = jnp.where(det < 0, -t_scaled, t_scaled)
    dd = jnp.abs(det)
    in_range = (ts > 0.0) & (ts < t_cur * dd)

    inv_det = 1.0 / jnp.where(nonzero, det, 1.0)
    t = t_scaled * inv_det

    # Conservative error bound on t (Shapes.h:1226-1256 capability).
    max_z = jnp.maximum(jnp.maximum(jnp.abs(az_s), jnp.abs(bz_s)),
                        jnp.abs(cz_s))
    max_x = jnp.maximum(jnp.maximum(jnp.abs(ax), jnp.abs(bx)), jnp.abs(cx))
    max_y = jnp.maximum(jnp.maximum(jnp.abs(ay), jnp.abs(by)), jnp.abs(cy))
    delta_z = _gamma(3) * max_z
    delta_x = _gamma(5) * (max_x + max_z)
    delta_y = _gamma(5) * (max_y + max_z)
    delta_e = 2.0 * (_gamma(2) * max_x * max_y
                     + delta_y * max_x + delta_x * max_y)
    max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    delta_t = 3.0 * (_gamma(3) * max_e * max_z + delta_e * max_z
                     + delta_z * max_e) * jnp.abs(inv_det)

    hit = same_side & nonzero & in_range & (t > delta_t) & (mask[:] > 0)
    t = jnp.where(hit, t, jnp.inf)                 # (R, T)

    # Closest hit in this tile, then fold into the running best.
    amin = jnp.argmin(t, axis=1, keepdims=True)    # (R, 1)
    t_min = jnp.min(t, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    at_min = lane == amin
    b1_min = jnp.sum(jnp.where(at_min, e1 * inv_det, 0.0), axis=1,
                     keepdims=True)
    b2_min = jnp.sum(jnp.where(at_min, e2 * inv_det, 0.0), axis=1,
                     keepdims=True)

    better = t_min < t_cur
    t_out[:] = jnp.where(better, t_min, t_cur)
    idx_out[:] = jnp.where(better,
                           j * TILE_T + amin.astype(jnp.int32),
                           idx_out[:])
    b1_out[:] = jnp.where(better, b1_min, b1_out[:])
    b2_out[:] = jnp.where(better, b2_min, b2_out[:])


@functools.partial(jax.custom_jvp, nondiff_argnums=(3,))
def _mesh_intersect_pallas(rays, tris, mask, interpret=False):
    """rays: (7, Np) comps [o3, d3, tmax]; tris: (9, Ft) comps;
    mask: (1, Ft) float. Returns (t, idx, b1, b2) each (Np, 1)."""
    return _mesh_intersect_impl(rays, tris, mask, interpret)


@_mesh_intersect_pallas.defjvp
def _mesh_intersect_jvp(interpret, primals, tangents):
    # Hit decisions are detached (SURVEY §7 stance #5): zero tangents.
    out = _mesh_intersect_pallas(*primals, interpret)
    zeros = tuple(
        np.zeros(o.shape, jax.dtypes.float0)
        if jnp.issubdtype(o.dtype, jnp.integer) else jnp.zeros_like(o)
        for o in out)
    return out, zeros


def _mesh_intersect_impl(rays, tris, mask, interpret):
    n_pad = rays.shape[1]
    f_pad = tris.shape[1]
    grid = (n_pad // TILE_R, f_pad // TILE_T)

    ray_spec = pl.BlockSpec((TILE_R, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, TILE_T), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE_R, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
    )
    kernel = pl.pallas_call(
        _intersect_kernel,
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec] * 10,
        out_specs=(out_spec,) * 4,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=140 * n_pad * f_pad,
            bytes_accessed=(7 + 4) * n_pad * 4 + 10 * f_pad * 4,
            transcendentals=0),
        interpret=interpret,
    )
    # rays is (7, Np); reshape comps to (Np, 1). tris is (9, Ft) -> (1, Ft).
    args = ([rays[k].reshape(-1, 1) for k in range(7)]
            + [tris[k].reshape(1, -1) for k in range(9)]
            + [mask.reshape(1, -1)])
    return kernel(*args)


def mesh_intersect_pallas(o, d, t_max, mesh, tri_mask=None, interpret=None):
    """Drop-in for :func:`triangle.mesh_intersect_brute` (same returns:
    t, tri_idx, b1, b2, count) backed by the Pallas pairwise kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch_shape = o.shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    f = mesh.n_triangles

    n_pad = -(-n // TILE_R) * TILE_R
    f_pad = -(-f // TILE_T) * TILE_T

    o2 = o.reshape(-1, 3)
    d2 = d.reshape(-1, 3)
    tm = t_max.reshape(-1)
    # Padded rays get t_max = -1 -> nothing can hit.
    rays = jnp.zeros((7, n_pad), jnp.float32)
    rays = rays.at[:3, :n].set(o2.T)
    rays = rays.at[3:6, :n].set(d2.T)
    rays = rays.at[5, n:].set(1.0)    # avoid 0-direction div patterns
    rays = rays.at[6, :n].set(tm)
    rays = rays.at[6, n:].set(-1.0)

    i = mesh.indices
    p0 = mesh.positions[i[:, 0]]
    p1 = mesh.positions[i[:, 1]]
    p2 = mesh.positions[i[:, 2]]
    tris = jnp.zeros((9, f_pad), jnp.float32)
    tris = tris.at[0:3, :f].set(p0.T)
    tris = tris.at[3:6, :f].set(p1.T)
    tris = tris.at[6:9, :f].set(p2.T)

    m = jnp.zeros((f_pad,), jnp.float32)
    keep = (jnp.ones((f,), jnp.float32) if tri_mask is None
            else tri_mask.astype(jnp.float32))
    m = m.at[:f].set(keep)

    t, idx, b1, b2 = _mesh_intersect_pallas(rays, tris, m.reshape(1, -1),
                                            interpret)
    t = t[:n, 0].reshape(batch_shape)
    idx = idx[:n, 0].reshape(batch_shape)
    b1 = b1[:n, 0].reshape(batch_shape)
    b2 = b2[:n, 0].reshape(batch_shape)
    count = jnp.full(batch_shape, f, jnp.int32)
    return jnp.where(idx >= 0, t, jnp.inf), idx, b1, b2, count
