"""Pallas TPU octree traversal: packet (ray-tile) traversal with a shared
scalar stack (SURVEY §7 stance #2 plan of record; the performance path for
``Octtree_Model::Traverse``, Octtree_Model.h:66-127).

Why packets: TPUs have no per-lane control flow, so a per-ray stack would
serialize. A *packet* of TILE_R coherent rays shares ONE stack in SMEM: a
node is visited if ANY ray in the packet needs it. Camera/sorted wavefronts
are coherent, so the shared walk visits barely more nodes than a single ray
would. Divergence cost is bounded by the packet, not the wavefront — unlike
the jnp lockstep traversal (``octree.octree_traverse``) where one straggler
stalls every ray in flight.

Kernel structure, per grid step (one packet of 8x128 rays in VMEM):

1. **Walk phase** (scalar): pop sibling-GROUP ids off the SMEM stack; one
   pop loads a single (1, 128) row holding all 8 children of a split and
   slab-tests each against the packet (vector (8,128) math against scalar
   bounds); hit interiors push their child group in *octant order*
   (near-to-far for the packet's majority direction sign — the
   front-to-back ordering SURVEY's hard-part #2 calls for), hit leaves
   append to a pending queue.
2. **Leaf phase**: stream the pending leaves' pre-gathered vertex rows
   from HBM with double-buffered async DMA into SMEM, 8 triangles PACKED
   per 128-lane row (16-lane stride: 9 vertex floats + pad each) — only
   ceil(count/8) rows per leaf, so sparse leaves never pay for padding;
   each triangle's coordinates are read as SMEM scalars and tested against
   the full (8, 128) ray tile (scalar operands splat into the vector ops
   for free), folding into the running closest hit.

Phases alternate so t_best tightens between flushes and prunes later nodes.

The leaf vertex table is *pre-gathered* at pack time (every leaf owns
ceil(count/8) contiguous compact packed rows): leaf fetches become
contiguous 512 B DMA, never gathers. The r4 layout spent one full
128-lane row per TRIANGLE (9 floats used of 128 — a 14x padding tax that
forced an 831 MB leaf table and leaf cap 96 on the 872k-tri mesh); the
packed layout is 8x smaller at identical DMA count, and scalar SMEM
unpack measured FASTER than the old (CHUNK, 8, 128) column-slice test
(sync-DMA microbench: 0.17 us vs 1.4+ us per 8-triangle chunk). Hit
outputs are (t, tri-slot, b1, b2); slot -> tri-id is one XLA gather
outside the kernel. Like the brute kernel, intersection ids are sampling
decisions: wrapped in custom_jvp with zero tangents (the jnp traversal
stays the differentiable/CPU oracle).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from computational_ray_tracer_tpu.ops.shapes import MACHINE_EPS
from computational_ray_tracer_tpu.ops import octree as octmod
from computational_ray_tracer_tpu.ops import triangle as trimod

import os

RAY_SUB = 8            # sublanes of the ray tile
RAY_LANES = 128        # lanes of the ray tile
TILE_R = RAY_SUB * RAY_LANES
STACK_SIZE = 288       # 8 * depth + slack (depth <= ~24 incl. chain
                       # splits) + WALK_WIDTH * 8 transient push blocks
# Packed-row geometry: 8 triangles per 128-lane row, 16-lane stride each
# (lanes [16s, 16s+8] hold triangle s's [p0 p1 p2]; 7 pad lanes). Mosaic
# tiles HBM arrays to 128 lanes and DMA slices must be lane-aligned to
# 128, so the row width is one full lane tile — but unlike the r4 layout
# (one triangle per row) the tile is now ~56% payload, not 7%.
TRI_PER_ROW = 8
TRI_LANES = 16
VERT_COLS = 128
# Packed rows per pending entry (one DMA; CHUNK = triangles per entry).
# Default 2 rows = 16 triangles = 1 KB per transfer: halves both the
# walk's pend-store loop (cpl) and the leaf DMA count vs 1-row entries —
# measured -13% anyhit on the 872k shadow wavefront, neutral on the 327k
# mesh. Env override for sweeps; pack layout and kernel must agree
# (module-level).
CHUNK_ROWS = int(os.environ.get("CRT_CHUNK_ROWS", "2"))
CHUNK = TRI_PER_ROW * CHUNK_ROWS
# Pending-chunk queue length between walk phases. Small: t_best tightens
# after only a few (front-to-back ordered) chunks, pruning far subtrees the
# walk would otherwise visit. Env override for sweeps.
PEND_SIZE = int(os.environ.get("CRT_PEND_SIZE", "64"))
# Leaf-DMA pipeline depth (scratch slots). 2 = classic double buffer; more
# slots keep several small in-flight copies hiding per-DMA issue latency.
DMA_SLOTS = int(os.environ.get("CRT_DMA_SLOTS", "2"))
# Stack pops processed per walk iteration. With compact (sentinel-free)
# pushes, width 1 measured best (342 ms vs 349 at width 2 on the 872k
# shadow wavefront); the widening machinery stays for sweeps.
WALK_WIDTH = int(os.environ.get("CRT_WALK_WIDTH", "1"))
# The stack budget must cover depth growth plus WALK_WIDTH transient push
# blocks (walk_cond guards only the pend queue, never sp — an oversized
# sweep width would silently overflow the SMEM scratch).
assert 8 * 24 + WALK_WIDTH * 8 + 8 <= STACK_SIZE, (
    f"CRT_WALK_WIDTH={WALK_WIDTH} exceeds the STACK_SIZE={STACK_SIZE} "
    f"budget (8*depth + width*8 transient)")


def _gamma(n):
    ne = n * MACHINE_EPS
    return ne / (1.0 - ne)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedOctree:
    """Kernel-ready flat octree + pre-gathered leaf vertices.

    Node storage is *sibling-group packed*: one (G, 128) f32 row holds all 8
    children of one interior node, NODE_LANES lanes per child
    ``[lo.xyz, hi.xyz, child_group, leaf_row_off, count, pad...]`` with the
    int fields stored as exact small floats (< 2^24, asserted at pack time).
    A naive (M, 8) layout lane-pads 8 -> 128 in VMEM (64 B/node/array); the
    group row is one full lane tile, so the whole tree costs 64 B/node total
    and a ~300k-node dragon-class tree fits VMEM (~18 MB)."""
    nodes: jnp.ndarray          # (G, 128) f32 sibling-group rows
    leaf_verts: jnp.ndarray     # (rows, VERT_COLS) f32, TRI_PER_ROW packed
                                # triangles per row at TRI_LANES stride
    row_tri: jnp.ndarray        # (rows*TRI_PER_ROW,) i32 tri id per slot
                                # (-1 pad)
    cap: int                    # max triangles per leaf (static)
    chunk: int = CHUNK          # triangles per pend entry the pack was
                                # built with; asserted == module CHUNK at
                                # kernel entry (a CRT_CHUNK_ROWS mismatch
                                # would mis-traverse)

    def tree_flatten(self):
        return (self.nodes, self.leaf_verts, self.row_tri), (self.cap,
                                                             self.chunk)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, cap=aux[0], chunk=aux[1])


NODE_LANES = 16     # lanes per child slot in a sibling-group row


def pack_from_numpy(tree_np, mesh: trimod.MeshData, tri_mask=None):
    """Pack a host-side (NumPy) Octree for the Pallas kernel.

    Compact id/bounds tables are prepared in NumPy and uploaded once; the
    heavy pre-gathered leaf-vertex rows are materialized ON DEVICE with one
    XLA gather from the (device-resident) mesh — the rows tensor is large
    (VERT_COLS lane padding) and must never cross the host<->device link.

    ``tri_mask``: optional (F,) keep mask (backface culling) baked in by
    degenerating dropped triangles (zero rows -> det==0 -> never hits)."""
    node_lo = np.asarray(tree_np.node_lo, np.float32)
    node_hi = np.asarray(tree_np.node_hi, np.float32)
    child0 = np.asarray(tree_np.node_child0, np.int32)
    leaf_id = np.asarray(tree_np.node_leaf_id, np.int32)
    leaf_tris = np.asarray(tree_np.leaf_tris, np.int32)
    counts = np.asarray(tree_np.leaf_counts, np.int32)
    L, cap0 = leaf_tris.shape
    cap = max(int(np.ceil(cap0 / CHUNK)) * CHUNK, CHUNK)

    # Compact chunk-aligned PACKED leaf rows: leaf i owns
    # ceil(count_i/CHUNK)*CHUNK_ROWS rows (TRI_PER_ROW triangles each)
    # starting at row_off[i] — NOT cap rows. The walk queues only those
    # chunks, so sparse leaves cost neither HBM capacity nor DMA for their
    # padding (a cap-aligned table at dragon scale is gigabytes; this is
    # ~occupancy-proportional at ~64 B/triangle).
    leaf_rows = np.maximum(
        ((counts.astype(np.int64) + CHUNK - 1) // CHUNK) * CHUNK_ROWS, 0)
    row_off = np.zeros(L + 1, np.int64)
    np.cumsum(leaf_rows, out=row_off[1:])
    total_rows = int(row_off[-1])

    # Sibling-group packing. The builders allocate all 8 children of a node
    # contiguously starting at id 1 (root = 0), so shifting every id by +7
    # puts the root in slot 7 of group 0 and makes every child0 a multiple
    # of 8: the 8 siblings of one split are exactly one group row.
    M = node_lo.shape[0]
    assert M + 7 < (1 << 24) and total_rows < (1 << 24), (
        "node/leaf-row ids must stay exactly representable as f32")
    interior = child0 >= 0
    if interior.any():
        assert ((child0[interior] % 8) == 1).all(), (
            "octree builder no longer allocates 8-contiguous children")
    G = (M + 7 + 7) // 8
    is_leaf = child0 < 0
    lid = np.maximum(leaf_id, 0)
    vals = np.zeros((M, NODE_LANES), np.float32)
    vals[:, 0:3] = node_lo
    vals[:, 3:6] = node_hi
    vals[:, 6] = np.where(is_leaf, -1, (child0 + 7) // 8)  # child group id
    vals[:, 7] = np.where(is_leaf, row_off[lid], 0)        # leaf row offset
    vals[:, 8] = np.where(is_leaf, counts[lid], 0)         # triangle count
    nodes = np.zeros((G * 8, NODE_LANES), np.float32)
    # Empty slots are guarded by child_g = -1 AND count = 0 (the walk only
    # acts on leaf slots with count > 0 / interior slots with child_g >= 0).
    # NOTE the inverted bounds below do NOT fail the slab test — min/max of
    # t0/t1 per axis makes an inverted box behave like an infinite one — so
    # never rely on the bounds alone to gate a slot.
    nodes[:, 0:3] = 1e30
    nodes[:, 3:6] = -1e30
    nodes[:, 6] = -1
    nodes[7:7 + M] = vals
    nodes = nodes.reshape(G, 8 * NODE_LANES)

    # Scatter each leaf's triangle ids into its compact SLOT range (slot =
    # packed row * TRI_PER_ROW + position-in-row).
    row_tri_np = np.full((total_rows * TRI_PER_ROW,), -1, np.int32)
    valid = leaf_tris >= 0
    if tri_mask is not None:
        valid &= np.asarray(tri_mask, bool)[np.maximum(leaf_tris, 0)]
    li, ci = np.nonzero(valid)
    row_tri_np[row_off[li] * TRI_PER_ROW + ci] = leaf_tris[li, ci]

    # device-side vertex gather (one upload of ids, no giant host array).
    # ONE jitted call: eager op dispatches cost seconds each on
    # remote-attached TPUs, so the ~6-op gather must be a single launch.
    # Slot s of row r lands at lanes [16s, 16s+9) — the packed layout.
    @jax.jit
    def _gather_rows(row_tri, positions, indices):
        tri = jnp.maximum(row_tri, 0)
        i = indices[tri]                                # (slots, 3)
        p = jnp.concatenate([positions[i[:, 0]],
                             positions[i[:, 1]],
                             positions[i[:, 2]]], axis=1)    # (slots, 9)
        p = jnp.where((row_tri >= 0)[:, None], p, 0.0)
        slots = jnp.zeros((row_tri.shape[0], TRI_LANES), jnp.float32)
        slots = slots.at[:, :9].set(p)
        return slots.reshape(-1, VERT_COLS)             # (rows, 128)

    row_tri = jnp.asarray(row_tri_np)
    rows = _gather_rows(row_tri, mesh.positions, mesh.indices)
    return PackedOctree(jnp.asarray(nodes), rows, row_tri, cap, chunk=CHUNK)


def pack_octree(tree: octmod.Octree, mesh: trimod.MeshData, tri_mask=None):
    """Pack a device-resident Octree (test convenience; pulls the compact
    node/leaf tables back to host first — prefer build_octree(pack=True))."""
    return pack_from_numpy(tree, mesh, tri_mask)


def _traverse_kernel(cap, anyhit, pend_size, skip_leaf, frustum, ray_sub,
                     ox, oy, oz, dx, dy, dz, tm_ref, nodes, verts,
                     t_out, row_out, b1_out, b2_out, cnt_out, pop_out,
                     stack, pend, vbuf, sem):
    # per-component ray blocks: (1, RAY_SUB, 128), squeezed via [0] to
    # plain (8, 128) vregs. NOTE the layout matters enormously: round 3
    # briefly switched to (ray_sub, 1, 128) blocks with a [:, 0, :]
    # squeeze — semantically identical, but Mosaic generated a 4x slower
    # kernel body (716 ms vs 181 ms for the same 512^2 closest-hit
    # wavefront, same node-pop/tri-test counters, bit-equal outputs).
    # Keep the leading-unit-axis blocks.
    #
    # Narrow packets (ray_sub < 8): Pallas requires the block sublane dim
    # to be 8, so a ray_sub x 128 packet is realized as a SUB-WALK of the
    # full (8, 128) block — the kernel runs 8/ray_sub sequential
    # traversals, each with the rows outside its subgroup forced dead
    # (t_best = -inf fails every node and triangle test), so each walk
    # visits exactly the nodes its own ray_sub x 128 rays need. Vector
    # work always runs on the full tile (free — the VPU is 8x128); only
    # the serial walk/leaf-stream work is per-subgroup.
    o = (ox[0], oy[0], oz[0])          # (8, 128) each
    d = (dx[0], dy[0], dz[0])
    tmax_all = tm_ref[0]
    # Pre-dead rays (t_max <= 0: already-occluded shadow rays, dead bounce
    # continuations, padding) are born done in BOTH modes: -inf fails every
    # node test (`tn < t_best` — a merely negative t_max does NOT, tn can
    # be arbitrarily negative for origins inside the scene box) and every
    # triangle test (ts > 0 required), and counts as done for the anyhit
    # whole-packet stack drain below.
    tmax_all = jnp.where(tmax_all > 0.0, tmax_all, -jnp.inf)
    safe = lambda v: jnp.where(jnp.abs(v) < 1e-20,
                               jnp.where(v < 0, -1e-20, 1e-20), v)
    inv = tuple(1.0 / safe(v) for v in d)
    g3 = 1.0 + 2.0 * _gamma(3)
    n_sub = RAY_SUB // ray_sub
    sub_row = jax.lax.broadcasted_iota(jnp.int32, (RAY_SUB, RAY_LANES), 0)

    # --- ray-only watertight-test precomputation (hoisted out of the leaf
    # loop AND the subgroup loop): permutation masks, permuted direction,
    # shear coefficients — all (8, 128) ray-tile values. Triangle
    # coordinates arrive as SMEM scalars (packed-row layout) and splat
    # into these vector ops as scalar operands.
    adx, ady, adz = (jnp.abs(d[0]), jnp.abs(d[1]), jnp.abs(d[2]))
    kz_x = (adx >= ady) & (adx >= adz)
    kz_y = (~kz_x) & (ady >= adz)

    def perm(vx, vy, vz):
        pz = jnp.where(kz_x, vx, jnp.where(kz_y, vy, vz))
        px = jnp.where(kz_x, vy, jnp.where(kz_y, vz, vx))
        py = jnp.where(kz_x, vz, jnp.where(kz_y, vx, vy))
        return px, py, pz

    dxp, dyp, dzp = perm(d[0], d[1], d[2])
    inv_dz = 1.0 / dzp
    sx = -dxp * inv_dz
    sy = -dyp * inv_dz

    def leaf_dma(i, slot):
        off = pend[i]
        return pltpu.make_async_copy(
            verts.at[pl.ds(off, CHUNK_ROWS), :], vbuf.at[slot],
            sem.at[slot])

    def leaf_test(slot, off, carry):
        # off: packed-row offset of this pend entry. One sequential
        # triangle at a time: 9 scalar SMEM reads splat against the full
        # (8, 128) ray tile — the same total vector work as the old
        # (CHUNK, 8, 128) column layout (each elementary op touches
        # CHUNK x 8 vregs either way), without the 14x row-padding tax.
        # Sequential folding tightens t_best WITHIN the chunk (strict <
        # keeps the first-slot winner on exact ties, matching the old
        # argmin-first semantics).
        t_best, row_b, b1_b, b2_b = carry
        for r in range(CHUNK_ROWS):
            for s in range(TRI_PER_ROW):
                base = TRI_LANES * s
                c = [vbuf[slot, r, base + j] for j in range(9)]
                v0 = (c[0] - o[0], c[1] - o[1], c[2] - o[2])
                v1 = (c[3] - o[0], c[4] - o[1], c[5] - o[2])
                v2 = (c[6] - o[0], c[7] - o[1], c[8] - o[2])

                axp, ayp, azp = perm(*v0)
                bxp, byp, bzp = perm(*v1)
                cxp, cyp, czp = perm(*v2)

                ax = axp + sx * azp
                ay = ayp + sy * azp
                bx = bxp + sx * bzp
                by = byp + sy * bzp
                cx = cxp + sx * czp
                cy = cyp + sy * czp

                e0 = bx * cy - by * cx
                e1 = cx * ay - cy * ax
                e2 = ax * by - ay * bx
                same_side = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                            ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
                det = e0 + e1 + e2

                az_s = inv_dz * azp
                bz_s = inv_dz * bzp
                cz_s = inv_dz * czp
                t_scaled = e0 * az_s + e1 * bz_s + e2 * cz_s
                ts = jnp.where(det < 0, -t_scaled, t_scaled)
                in_range = (ts > 0.0) & (ts < t_best * jnp.abs(det))

                # conservative t bound (Shapes.h:1226-1256 capability)
                max_z = jnp.maximum(jnp.maximum(jnp.abs(az_s),
                                                jnp.abs(bz_s)),
                                    jnp.abs(cz_s))
                max_x = jnp.maximum(jnp.maximum(jnp.abs(ax), jnp.abs(bx)),
                                    jnp.abs(cx))
                max_y = jnp.maximum(jnp.maximum(jnp.abs(ay), jnp.abs(by)),
                                    jnp.abs(cy))
                delta_z = _gamma(3) * max_z
                delta_x = _gamma(5) * (max_x + max_z)
                delta_y = _gamma(5) * (max_y + max_z)
                delta_e = 2.0 * (_gamma(2) * max_x * max_y
                                 + delta_y * max_x + delta_x * max_y)
                max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)),
                                    jnp.abs(e2))
                slot_id = (off + r) * TRI_PER_ROW + s
                if anyhit:
                    # Occlusion-only test: no division, no barycentrics,
                    # no closest-t fold. t > delta_t is rearranged to the
                    # scaled domain: t = ts/|det| and delta_t carries a
                    # 1/|det| factor, so compare ts > delta_scaled
                    # directly (|det| > 0 whenever ts > 0). The found
                    # flag poisons t_best to -inf exactly like the old
                    # post-fold drain did — the (8,128)-wide t_best*|det|
                    # range test then fails every later triangle.
                    delta_s = 3.0 * (_gamma(3) * max_e * max_z
                                     + delta_e * max_z + delta_z * max_e)
                    found = same_side & in_range & (ts > delta_s)
                    t_best = jnp.where(found, -jnp.inf, t_best)
                    row_b = jnp.where(found, slot_id, row_b)
                else:
                    nonzero = det != 0.0
                    inv_det = 1.0 / jnp.where(nonzero, det, 1.0)
                    t = t_scaled * inv_det
                    delta_t = 3.0 * (_gamma(3) * max_e * max_z
                                     + delta_e * max_z
                                     + delta_z * max_e) * jnp.abs(inv_det)
                    better = (same_side & nonzero & in_range
                              & (t > delta_t) & (t < t_best))
                    t_best = jnp.where(better, t, t_best)
                    row_b = jnp.where(better, slot_id, row_b)
                    b1_b = jnp.where(better, e1 * inv_det, b1_b)
                    b2_b = jnp.where(better, e2 * inv_det, b2_b)
        return t_best, row_b, b1_b, b2_b

    cpl = (cap + CHUNK - 1) // CHUNK    # max pending chunks per leaf (static)

    out_t = jnp.full((RAY_SUB, RAY_LANES), jnp.inf, jnp.float32)
    out_row = jnp.full((RAY_SUB, RAY_LANES), -1, jnp.int32)
    out_b1 = jnp.zeros((RAY_SUB, RAY_LANES), jnp.float32)
    out_b2 = jnp.zeros((RAY_SUB, RAY_LANES), jnp.float32)
    tests_total = jnp.int32(0)
    pops_total = jnp.int32(0)

    for g in range(n_sub):
        if n_sub == 1:
            mask_g = None
            tmax = tmax_all
            in_g = lambda v: v
        else:
            mask_g = (sub_row >= g * ray_sub) & (sub_row < (g + 1) * ray_sub)
            tmax = jnp.where(mask_g, tmax_all, -jnp.inf)
            in_g = lambda v: jnp.where(mask_g, v, 0.0)

        # Subgroup octant = majority direction sign per axis (scalars).
        half = jnp.float32(ray_sub * RAY_LANES // 2)
        octant = ((jnp.sum(in_g((d[0] < 0).astype(jnp.float32))) > half)
                  .astype(jnp.int32) * 4
                  + (jnp.sum(in_g((d[1] < 0).astype(jnp.float32))) > half)
                  .astype(jnp.int32) * 2
                  + (jnp.sum(in_g((d[2] < 0).astype(jnp.float32))) > half)
                  .astype(jnp.int32))

        stack[0] = jnp.int32(0)            # root pre-pushed

        if frustum:
            # Subgroup frustum hull (scalars). The walk only ever consumes
            # the packet-OR of the per-ray slab test, so a conservative
            # interval test over [o_lo,o_hi] x [inv_lo,inv_hi] replaces the
            # vector (8,128) slab tests per pop with ~70 scalar-unit ops
            # per child. False positives (interval slack) only add node
            # visits — never wrong results; camera/octant-sorted packets
            # are tight frustums.
            if mask_g is None:
                o_lo = tuple(jnp.min(v) for v in o)
                o_hi = tuple(jnp.max(v) for v in o)
                inv_lo = tuple(jnp.min(v) for v in inv)
                inv_hi = tuple(jnp.max(v) for v in inv)
            else:
                sel = lambda v, fill: jnp.where(mask_g, v, fill)
                o_lo = tuple(jnp.min(sel(v, jnp.inf)) for v in o)
                o_hi = tuple(jnp.max(sel(v, -jnp.inf)) for v in o)
                inv_lo = tuple(jnp.min(sel(v, jnp.inf)) for v in inv)
                inv_hi = tuple(jnp.max(sel(v, -jnp.inf)) for v in inv)

            def child_hit_frustum(row, base, tb_max, o_lo=o_lo, o_hi=o_hi,
                                  inv_lo=inv_lo, inv_hi=inv_hi):
                tn_lb = jnp.float32(-jnp.inf)
                tf_ub = jnp.float32(jnp.inf)
                for a in range(3):
                    lo_a = row[0, base + a]
                    hi_a = row[0, base + 3 + a]
                    a0 = lo_a - o_hi[a]
                    a1 = lo_a - o_lo[a]
                    b0 = hi_a - o_hi[a]
                    b1 = hi_a - o_lo[a]
                    i0, i1 = inv_lo[a], inv_hi[a]
                    s0l = jnp.minimum(jnp.minimum(a0 * i0, a0 * i1),
                                      jnp.minimum(a1 * i0, a1 * i1))
                    s0h = jnp.maximum(jnp.maximum(a0 * i0, a0 * i1),
                                      jnp.maximum(a1 * i0, a1 * i1))
                    s1l = jnp.minimum(jnp.minimum(b0 * i0, b0 * i1),
                                      jnp.minimum(b1 * i0, b1 * i1))
                    s1h = jnp.maximum(jnp.maximum(b0 * i0, b0 * i1),
                                      jnp.maximum(b1 * i0, b1 * i1))
                    tn_lb = jnp.maximum(tn_lb, jnp.minimum(s0l, s1l))
                    tf_ub = jnp.minimum(tf_ub, jnp.maximum(s0h, s1h))
                tf_ub = tf_ub * g3
                return (tn_lb <= tf_ub) & (tf_ub > 0.0) & (tn_lb < tb_max)

        def outer_body(state, octant=octant,
                       child_hit_frustum=(child_hit_frustum if frustum
                                          else None)):
            sp, tests, pops, t_best, row_b, b1_b, b2_b = state

            # ---- walk phase: fill the pending-chunk queue.
            # Stack entries are sibling-GROUP ids (-1 = skip sentinel): one
            # pop slab-tests all 8 children of a split against the packet,
            # pushes the child groups of hit interiors (positioned so pops
            # come near-to-far by octant), and queues hit leaves as
            # CHUNK-row entries — only the ceil(count/CHUNK) chunks that
            # hold real triangles, so the leaf phase never streams or tests
            # a leaf's padding rows.
            def walk_cond(c):
                sp, npend = c[0], c[1]
                return (sp > 0) & (npend <= pend_size
                                   - WALK_WIDTH * 8 * cpl)

            tb_max = jnp.max(t_best) if frustum else None

            def walk_body(c):
                # WALK_WIDTH-wide pop: stack entries are pairwise
                # non-ancestral (roots of disjoint unexplored subtrees),
                # so up to WALK_WIDTH of them process independently in one
                # iteration. The walk measured LATENCY-bound, not
                # throughput-bound: doubling the per-child extract /
                # slab-vop / reduce work changed nothing (<1%), while each
                # serial dynamic row load alone costs ~1.1 us — so the fix
                # is more independent work in flight per iteration, not
                # less work per pop.
                sp, npend, pops, t_best = c
                entries = []
                for _ in range(WALK_WIDTH):
                    have = sp > 0
                    spm = sp - 1
                    gid = jnp.where(have, stack[jnp.maximum(spm, 0)],
                                    jnp.int32(-1))
                    sp = jnp.where(have, spm, sp)
                    entries.append(gid)

                # --- compute phase: all pops' rows + per-child decisions
                # issued together (independent latency chains overlap)
                infos = []
                for gid in entries:
                    valid = gid >= 0
                    pops = pops + valid.astype(jnp.int32)
                    row = nodes[pl.ds(jnp.maximum(gid, 0), 1), :]
                    children = []
                    for j in range(8):
                        base = j * NODE_LANES
                        if frustum:
                            any_hit = (child_hit_frustum(row, base, tb_max)
                                       & valid)
                        else:
                            # dead rows (t_best = -inf) fail tn < t_best,
                            # so the packet-OR spans only the live subgroup
                            t0x = (row[0, base + 0] - o[0]) * inv[0]
                            t0y = (row[0, base + 1] - o[1]) * inv[1]
                            t0z = (row[0, base + 2] - o[2]) * inv[2]
                            t1x = (row[0, base + 3] - o[0]) * inv[0]
                            t1y = (row[0, base + 4] - o[1]) * inv[1]
                            t1z = (row[0, base + 5] - o[2]) * inv[2]
                            tn = jnp.maximum(
                                jnp.maximum(jnp.minimum(t0x, t1x),
                                            jnp.minimum(t0y, t1y)),
                                jnp.minimum(t0z, t1z))
                            tf = jnp.minimum(
                                jnp.minimum(jnp.maximum(t0x, t1x),
                                            jnp.maximum(t0y, t1y)),
                                jnp.maximum(t0z, t1z)) * g3
                            active = (tn <= tf) & (tf > 0.0) & (tn < t_best)
                            any_hit = jnp.any(active) & valid

                        child_g = row[0, base + 6].astype(jnp.int32)
                        cnt = row[0, base + 8].astype(jnp.int32)
                        is_leaf = child_g < 0
                        push_j = any_hit & ~is_leaf
                        leaf_j = any_hit & is_leaf & (cnt > 0)
                        n_chunks = jnp.where(
                            leaf_j, (cnt + (CHUNK - 1)) // CHUNK, 0)
                        leaf_off = row[0, base + 7].astype(jnp.int32)
                        children.append((push_j, leaf_j, child_g, n_chunks,
                                         leaf_off))
                    infos.append(children)

                # --- store phase, entries in REVERSE pop order so the
                # first-popped (previous stack top = nearest) entry's
                # children land on top and pop first, preserving the
                # near-to-far heuristic across the widened iteration.
                #
                # Pushes are COMPACT: exactly n_pushed contiguous slots,
                # no sentinels. The old fixed 8-slot block scheme left
                # ~5-6 cleared (-1) slots per push block, and every one
                # of those cost a full pop iteration later — ~2/3 of all
                # walk iterations were sentinel pops (invisible in the
                # node-pop counters, which count valid pops only). Slot
                # positions keep the near-to-far order: child j's
                # distance rank is j ^ octant (0 = nearest; xor is a
                # bijection so ranks are distinct), pops take the highest
                # slot first, so child j lands at
                # sp + (# pushed children with larger rank).
                for children in reversed(infos):
                    ranks = [None] * 8
                    for j in range(8):
                        ranks[j] = j ^ octant
                    n_pushed = jnp.int32(0)
                    for j, (push_j, leaf_j, child_g, n_chunks,
                            leaf_off) in enumerate(children):
                        pj = push_j.astype(jnp.int32)
                        above = jnp.int32(0)
                        for j2, (push_j2, _l2, _c2, _n2,
                                 _o2) in enumerate(children):
                            if j2 == j:
                                continue
                            above = above + jnp.where(
                                push_j2 & (ranks[j2] > ranks[j]), 1, 0)
                        @pl.when(push_j)
                        def _():
                            stack[sp + above] = child_g
                        n_pushed = n_pushed + pj

                        # Static PREDICATED store loop — measured faster
                        # than a dynamic-bound fori_loop writing exactly
                        # n_chunks entries (822 ms vs 684 ms on the 872k
                        # shadow wavefront: 8 nested loop setups per pop
                        # cost more than cpl x 8 predicated SMEM stores).
                        for k in range(cpl):
                            @pl.when(leaf_j & (k < n_chunks))
                            def _():
                                # pend entries are PACKED-ROW offsets
                                pend[npend + k] = leaf_off + CHUNK_ROWS * k

                        npend = npend + n_chunks
                    sp = sp + n_pushed
                return sp, npend, pops, t_best

            sp, npend, pops, t_best = jax.lax.while_loop(
                walk_cond, walk_body, (sp, jnp.int32(0), pops, t_best))

            # ---- leaf phase: stream pending chunks, DMA_SLOTS-deep
            # pipeline (per-transfer issue latency of the small CHUNK-row
            # copies is the cost being hidden, so several must stay in
            # flight).
            if not skip_leaf:
                for s in range(DMA_SLOTS - 1):
                    @pl.when(s < npend)
                    def _(s=s):
                        leaf_dma(s, s).start()

                def flush_body(i, carry):
                    slot = jax.lax.rem(i, DMA_SLOTS)
                    nxt = i + DMA_SLOTS - 1

                    @pl.when(nxt < npend)
                    def _():
                        leaf_dma(nxt, jax.lax.rem(nxt, DMA_SLOTS)).start()

                    leaf_dma(i, slot).wait()
                    return leaf_test(slot, pend[i], carry)

                t_best, row_b, b1_b, b2_b = jax.lax.fori_loop(
                    0, npend, flush_body, (t_best, row_b, b1_b, b2_b))
            tests = tests + npend * jnp.int32(CHUNK)
            if anyhit:
                # Shadow-ray semantics: a found ray needs no more work.
                # -inf fails every node test (tn < t_best) including
                # origin-inside nodes (tn < 0); when the whole subgroup is
                # done, drain the stack. (Dead rows are -inf already.)
                t_best = jnp.where(row_b >= 0, -jnp.inf, t_best)
                done = (row_b >= 0) | (t_best == -jnp.inf)
                sp = jnp.where(jnp.all(done), jnp.int32(0), sp)
            return sp, tests, pops, t_best, row_b, b1_b, b2_b

        def outer_cond(state):
            return state[0] > 0

        init = (jnp.int32(1), tests_total, pops_total, tmax,
                jnp.full((RAY_SUB, RAY_LANES), -1, jnp.int32),
                jnp.zeros((RAY_SUB, RAY_LANES), jnp.float32),
                jnp.zeros((RAY_SUB, RAY_LANES), jnp.float32))
        sp, tests_total, pops_total, t_best, row_b, b1_b, b2_b = \
            jax.lax.while_loop(outer_cond, outer_body, init)

        if mask_g is None:
            out_t, out_row, out_b1, out_b2 = t_best, row_b, b1_b, b2_b
        else:
            out_t = jnp.where(mask_g, t_best, out_t)
            out_row = jnp.where(mask_g, row_b, out_row)
            out_b1 = jnp.where(mask_g, b1_b, out_b1)
            out_b2 = jnp.where(mask_g, b2_b, out_b2)

    t_out[:] = out_t
    row_out[:] = out_row
    b1_out[:] = out_b1
    b2_out[:] = out_b2
    cnt_out[:] = jnp.broadcast_to(tests_total, (RAY_SUB, RAY_LANES))
    pop_out[:] = jnp.broadcast_to(pops_total, (RAY_SUB, RAY_LANES))


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _octree_pallas(rays, nodes, verts, cap, interpret, anyhit=False,
                   pend_size=PEND_SIZE, skip_leaf=False, frustum=False,
                   ray_sub=RAY_SUB):
    return _octree_pallas_impl(rays, nodes, verts, cap, interpret, anyhit,
                               pend_size, skip_leaf, frustum, ray_sub)


@_octree_pallas.defjvp
def _octree_pallas_jvp(cap, interpret, anyhit, pend_size, skip_leaf,
                       frustum, ray_sub, primals, tangents):
    out = _octree_pallas(*primals, cap, interpret, anyhit, pend_size,
                         skip_leaf, frustum, ray_sub)
    zeros = tuple(
        np.zeros(o.shape, jax.dtypes.float0)
        if jnp.issubdtype(o.dtype, jnp.integer) else jnp.zeros_like(o)
        for o in out)
    return out, zeros


def _octree_pallas_impl(rays, nodes, verts, cap, interpret, anyhit,
                        pend_size, skip_leaf=False, frustum=False,
                        ray_sub=RAY_SUB):
    # rays: (7, n_rows, RAY_LANES) — split into 7 per-component
    # (1, n_rows, RAY_LANES) operands read in (1, RAY_SUB, RAY_LANES)
    # blocks; outputs are plain (n_rows, RAY_LANES) in (RAY_SUB, RAY_LANES)
    # blocks (see _traverse_kernel for why the leading-unit-axis layout;
    # narrow ray_sub packets are sub-walks inside the 8-row block).
    n_rows = rays.shape[1]
    grid = (n_rows // RAY_SUB,)

    ray_spec = pl.BlockSpec((1, RAY_SUB, RAY_LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RAY_SUB, RAY_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((n_rows, RAY_LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows, RAY_LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_rows, RAY_LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows, RAY_LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows, RAY_LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_rows, RAY_LANES), jnp.int32),
    )

    # Scoped-VMEM budget: the resident node table + leaf double-buffer +
    # ray/out tiles + Mosaic temporaries. The default 16 MB scoped limit
    # rejects dragon-class trees; size the limit to the actual buffers.
    nodes_bytes = int(np.prod(nodes.shape)) * 4
    vmem_limit = min(nodes_bytes + 32 * 1024 * 1024, 120 * 1024 * 1024)

    kernel = pl.pallas_call(
        functools.partial(_traverse_kernel, cap, anyhit, pend_size,
                          skip_leaf, frustum, ray_sub),
        grid=grid,
        in_specs=[ray_spec] * 7 + [full(),
                                   pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec,) * 6,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.SMEM((STACK_SIZE,), jnp.int32),
            pltpu.SMEM((pend_size,), jnp.int32),
            # leaf buffer lives in SMEM: the unpack is all scalar reads,
            # and SMEM scalar loads measured 8x faster than VMEM ones
            pltpu.SMEM((DMA_SLOTS, CHUNK_ROWS, VERT_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((DMA_SLOTS,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )
    args = [rays[k].reshape(1, n_rows, RAY_LANES) for k in range(7)]
    return kernel(*args, nodes, verts)


def octree_anyhit_pallas(o, d, t_max, packed: PackedOctree, interpret=None,
                         ray_sub=None, frustum=False):
    """Shadow-ray any-hit: True where ANY triangle lies in (0, t_max).
    Early-exits per ray (first hit poisons its t_best) and drains the stack
    once the whole packet is done — the IntersectP fast path."""
    t, tri, *_ = octree_intersect_pallas(o, d, t_max, packed,
                                         interpret=interpret, anyhit=True,
                                         ray_sub=ray_sub, frustum=frustum)
    return tri >= 0


def octree_intersect_pallas(o, d, t_max, packed: PackedOctree,
                            interpret=None, anyhit=False,
                            pend_size=None, skip_leaf=False,
                            return_stats=False, frustum=False,
                            ray_sub=None):
    """Drop-in for octree_traverse backed by the packet kernel. Returns
    (t, tri_idx, b1, b2, tri_tests) with the usual conventions (with
    anyhit=True, only ``tri_idx >= 0`` is meaningful).

    return_stats: also return a dict with per-ray node-pop counts (the
    walk-phase cost) alongside the triangle-test counts.
    skip_leaf (profiling only): run the walk phase but never stream/test
    leaf chunks — isolates walk cost (t never tightens, so this is an
    UPPER bound on walk work; results are meaningless).
    ray_sub: packet height (packet = ray_sub x 128 rays). 8 for coherent
    camera wavefronts; 1 gives narrow tri-major packets for incoherent
    bounce rays (per-ray traversal cost scales with packet extent)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pend_size is None:
        pend_size = PEND_SIZE
    if ray_sub is None:
        ray_sub = RAY_SUB
    assert packed.chunk == CHUNK, (
        f"PackedOctree was packed with chunk={packed.chunk} triangles but "
        f"this process runs CHUNK={CHUNK} (CRT_CHUNK_ROWS mismatch) — the "
        f"kernel would mis-traverse")
    assert RAY_SUB % ray_sub == 0
    cpl = (packed.cap + CHUNK - 1) // CHUNK
    # The queue must hold one walk step's worst case (WALK_WIDTH pops x
    # 8 leaves x cpl chunks) with room for at least one step — auto-grow
    # for big leaf capacities.
    pend_size = max(pend_size, WALK_WIDTH * 8 * cpl + 8)
    batch_shape = o.shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    n_pad = -(-n // TILE_R) * TILE_R    # blocks are always 8x128 rays

    o2 = o.reshape(-1, 3)
    d2 = d.reshape(-1, 3)
    tm = t_max.reshape(-1)
    rays = jnp.zeros((7, n_pad), jnp.float32)
    rays = rays.at[:3, :n].set(o2.T)
    rays = rays.at[3:6, :n].set(d2.T)
    rays = rays.at[5, n:].set(1.0)
    rays = rays.at[6, :n].set(tm)
    # padded rays: fully dead. -inf (not just a negative t_max) so the
    # closest-hit walk's `tn < t_best` can never admit a node for them
    # (tn can be an arbitrarily negative finite number for an origin
    # inside the scene box).
    rays = rays.at[6, n:].set(-jnp.inf)
    rays = rays.reshape(7, n_pad // RAY_LANES, RAY_LANES)

    t, row, b1, b2, cnt, pops = _octree_pallas(
        rays, packed.nodes, packed.leaf_verts, packed.cap, interpret,
        anyhit, pend_size, skip_leaf, frustum, ray_sub)

    flat = lambda x: x.reshape(-1)[:n].reshape(batch_shape)
    t = flat(t)
    row = flat(row)
    b1 = flat(b1)
    b2 = flat(b2)
    cnt = flat(cnt)
    tri = jnp.where(row >= 0, packed.row_tri[jnp.maximum(row, 0)], -1)
    # anyhit poisons t to -inf on found rays; only the tri>=0 bit matters
    ok = (tri >= 0) if anyhit else (jnp.isfinite(t) & (tri >= 0))
    out = (jnp.where(ok, t, jnp.inf), jnp.where(ok, tri, -1),
           b1, b2, cnt)
    if return_stats:
        return out + ({"node_pops": flat(pops)},)
    return out
