"""Incoherent-(bounce-)ray profile of the packet octree kernel: the
workload the flagship path trace exposed (35s/pass at 256^2 — packets of
diffuse bounce rays visit most of the tree). Sweeps packet shape
(ray_sub x 128) x frustum-vs-vector walk on rays that mimic a sorted
compacted bounce wavefront: origins at camera-hit points, cosine-
hemisphere directions, sorted by (direction octant, origin Morton cell) —
exactly integrator._compact_fns.select's key.

Usage: python benchmarks/profile_octree_bounce.py [--subdiv 7] [--res 256]
       [--cap 40] [--ray-subs 8,1] [--sorted 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=7)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--cap", type=int, default=40)
    ap.add_argument("--ray-subs", type=str, default="8,1")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.utils import mesh_gen
    from computational_ray_tracer_tpu.ops import triangle as trimod
    from computational_ray_tracer_tpu.ops import octree as octmod
    from computational_ray_tracer_tpu.ops import pallas_octree as poct
    from computational_ray_tracer_tpu.ops import camera as cam
    from computational_ray_tracer_tpu.models.integrator import _tile_perm

    records = []

    def emit(rec):
        records.append(rec)
        print(json.dumps(rec), flush=True)

    v, f, uv = mesh_gen.displaced_icosphere(args.subdiv)
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    jax.block_until_ready(mesh.positions)

    pos_np, idx_np = octmod.host_mesh_arrays(mesh)
    padding = octmod.CHILD_PADDING_FRAC   # child-extent fraction (r4)
    tree_np = octmod._build_octree_native(pos_np, idx_np, args.cap,
                                          octmod.MAX_DEPTH, padding)
    tree_np = octmod._split_oversized_leaves(tree_np, args.cap)
    packed = poct.pack_from_numpy(tree_np, mesh)
    jax.block_until_ready(packed.leaf_verts)
    emit({"n_tris": int(mesh.n_triangles), "cap": args.cap,
          "device": str(jax.devices()[0])})

    res = args.res
    camera = cam.PerspectiveCamera.create((0, 0.5, -3.4), (res, res),
                                          fov_y=40.0, look_at=(0, 0, 0))

    @jax.jit
    def make_camera_rays():
        tiled = _tile_perm(res, res)[0]
        pp = jnp.stack([(tiled % res).astype(jnp.float32) + 0.5,
                        (tiled // res).astype(jnp.float32) + 0.5], axis=-1)
        o, d = camera.generate_rays(pp, jnp.full((res * res, 2), 0.5))
        return o, d, jnp.full((res * res,), jnp.inf)

    o, d, t_max = jax.block_until_ready(make_camera_rays())

    @jax.jit
    def make_bounce(o, d, t_res, tri, b1, b2, pk):
        """Cosine-hemisphere bounce rays at the camera hit points, sorted
        alive-first by (octant, Morton(origin cell)) like select()."""
        hitm = jnp.isfinite(t_res) & (tri >= 0)
        p = o + d * jnp.where(hitm, t_res, 1.0)[:, None]
        # geometric normal from the hit triangle
        tid = jnp.maximum(tri, 0)
        i = pk_idx[tid]
        e1 = pk_pos[i[:, 1]] - pk_pos[i[:, 0]]
        e2 = pk_pos[i[:, 2]] - pk_pos[i[:, 0]]
        n = jnp.cross(e1, e2)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                            1e-20)
        n = jnp.where((jnp.sum(n * d, axis=-1) > 0)[:, None], -n, n)
        # deterministic per-ray hash u
        idx = jnp.arange(p.shape[0], dtype=jnp.uint32)
        u1 = ((idx * jnp.uint32(2654435761)) >> 8).astype(jnp.float32) / (1 << 24)
        u2 = ((idx * jnp.uint32(0x9E3779B9)) >> 8).astype(jnp.float32) / (1 << 24)
        r = jnp.sqrt(u1)
        phi = 2 * np.pi * u2
        t1 = jnp.where(jnp.abs(n[:, 0:1]) > 0.9,
                       jnp.asarray([[0.0, 1.0, 0.0]]),
                       jnp.asarray([[1.0, 0.0, 0.0]]))
        tang = jnp.cross(n, t1)
        tang = tang / jnp.maximum(
            jnp.linalg.norm(tang, axis=-1, keepdims=True), 1e-20)
        bit = jnp.cross(n, tang)
        z = jnp.sqrt(jnp.maximum(1 - u1, 0.0))
        wd = (tang * (r * jnp.cos(phi))[:, None]
              + bit * (r * jnp.sin(phi))[:, None] + n * z[:, None])
        so = p + n * 1e-3
        s_tmax = jnp.where(hitm, jnp.inf, -1.0)
        # sort: alive-first, octant, morton (integrator select key)
        octant = ((wd[:, 0] < 0) * 4 + (wd[:, 1] < 0) * 2
                  + (wd[:, 2] < 0)).astype(jnp.int32)
        lo = jnp.min(jnp.where(hitm[:, None], so, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(hitm[:, None], so, -jnp.inf), axis=0)
        q = jnp.clip(((so - lo) / jnp.maximum(hi - lo, 1e-20) * 8.0)
                     .astype(jnp.int32), 0, 7)

        def spread3(x):
            x = (x | (x << 4)) & 0x0C3
            return (x | (x << 2)) & 0x249

        morton = spread3(q[:, 0]) | (spread3(q[:, 1]) << 1) \
            | (spread3(q[:, 2]) << 2)
        key = jnp.where(hitm, octant * 512 + morton, jnp.int32(1 << 14))
        order = jnp.argsort(key, stable=True)
        return so[order], wd[order], s_tmax[order], hitm.sum()

    pk_pos, pk_idx = mesh.positions, mesh.indices

    def timed(fn, *a):
        # convention: a = (o, d, t_max, ...); each rep perturbs t_max —
        # this runtime services a repeat of an identical dispatch
        # near-instantly, which silently zeroes repeat-timings.
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        cdt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for r in range(args.reps):
            av = (a[0], a[1], a[2] * (1.0 + 1e-7 * (r + 1))) + a[3:]
            out = fn(*av)
        jax.block_until_ready(out)
        return out, (time.perf_counter() - t0) / args.reps, cdt

    # closest-hit camera pass to get hit points (once)
    fn0 = jax.jit(lambda o, d, t, pk: poct.octree_intersect_pallas(
        o, d, t, pk))
    out0, dt0, _ = timed(fn0, o, d, t_max, packed)
    t_res, tri, b1, b2, _ = out0
    emit({"variant": "camera_closest_rs8", "rays_per_sec":
          round(res * res / dt0, 1), "sec_per_wavefront": round(dt0, 4)})

    so, sd, s_tmax, n_alive = jax.block_until_ready(
        jax.jit(make_bounce)(o, d, t_res, tri, b1, b2, packed))
    emit({"bounce_alive": int(n_alive)})

    for rs in [int(x) for x in args.ray_subs.split(",")]:
        for frustum in (True, False):
            fn = jax.jit(lambda o_, d_, t_, pk, rs=rs, fr=frustum:
                         poct.octree_intersect_pallas(
                             o_, d_, t_, pk, ray_sub=rs, frustum=fr,
                             return_stats=True))
            out, dt, cdt = timed(fn, so, sd, s_tmax, packed)
            emit({"variant": "bounce_closest", "ray_sub": rs,
                  "frustum": frustum,
                  "rays_per_sec": round(res * res / dt, 1),
                  "sec_per_wavefront": round(dt, 4),
                  "tri_tests_per_packet": round(
                      float(np.asarray(out[4]).mean()), 1),
                  "node_pops_per_packet": round(
                      float(np.asarray(out[5]["node_pops"]).mean()), 1),
                  "hit_frac": round(float((np.asarray(out[1]) >= 0).mean()),
                                    4),
                  "compile_sec": round(cdt, 1)})

    out_path = args.out or os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "profile_octree_bounce.json")
    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
