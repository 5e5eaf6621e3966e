"""Per-phase profile + knob sweep of the Pallas packet octree kernel at
dragon scale (VERDICT r2 next-step #1: commit the walk/leaf decomposition
and the leaf-capacity sweep that the 180k rays/s number motivates).

One process, one TPU: builds the mesh once, then for each leaf capacity
builds+packs a tree (timed in build/split/pack stages) and times
  - closest-hit (camera rays, tile-swizzled)
  - closest-hit walk-only (skip_leaf=True: walk upper bound, no pruning)
  - anyhit (shadow rays toward the distant light, same origins)
  - per-ray node-pop and triangle-test counters
Writes one JSON line per variant to stdout and the whole set to
benchmarks/profile_octree.json.

Usage: python benchmarks/profile_octree.py [--subdiv 7] [--res 512]
       [--caps 8,16,40] [--pends 64,128]
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
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--caps", type=str, default="8,16,40")
    ap.add_argument("--pends", type=str, default="64")
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
    emit({"n_tris": int(mesh.n_triangles),
          "device": str(jax.devices()[0])})

    res = args.res
    camera = cam.PerspectiveCamera.create((0, 0.5, -3.4), (res, res),
                                          fov_y=40.0, look_at=(0, 0, 0))

    # ONE jitted setup call: on the remote-attached TPU every eager op
    # dispatch costs seconds, so all device math must live inside jits.
    @jax.jit
    def make_rays():
        tiled = _tile_perm(res, res)[0]
        pp = jnp.stack([(tiled % res).astype(jnp.float32) + 0.5,
                        (tiled // res).astype(jnp.float32) + 0.5], axis=-1)
        o, d = camera.generate_rays(pp, jnp.full((res * res, 2), 0.5))
        return o, d, jnp.full((res * res,), jnp.inf)

    o, d, t_max = jax.block_until_ready(make_rays())
    emit({"setup": "rays_ready"})

    @jax.jit
    def make_shadow(o, d, t_res):
        light_d = -jnp.asarray([-0.4, -1.0, 0.5])
        light_d = light_d / jnp.linalg.norm(light_d)
        hitm = jnp.isfinite(t_res)
        p_hit = o + d * jnp.where(hitm, t_res, 1.0)[:, None]
        so = p_hit + light_d[None, :] * 1e-3
        sd = jnp.broadcast_to(light_d[None, :], so.shape)
        s_tmax = jnp.where(hitm, 1e6, -1.0)
        return so, sd, s_tmax

    def timed(fn, *a):
        # convention: a = (o, d, t_max, ...). Each rep perturbs t_max by
        # an epsilon — this runtime services a repeat of an identical
        # dispatch near-instantly, which silently zeroes repeat-timings.
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        compile_dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for r in range(args.reps):
            av = (a[0], a[1], a[2] * (1.0 + 1e-7 * (r + 1))) + a[3:]
            out = fn(*av)
        jax.block_until_ready(out)
        return out, (time.perf_counter() - t0) / args.reps, compile_dt

    for cap in [int(c) for c in args.caps.split(",")]:
        # --- staged build timing
        t0 = time.perf_counter()
        pos_np, idx_np = octmod.host_mesh_arrays(mesh)
        padding = octmod.CHILD_PADDING_FRAC   # child-extent fraction (r4)
        tree_np = octmod._build_octree_native(pos_np, idx_np, cap,
                                              octmod.MAX_DEPTH, padding)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        tree_np = octmod._split_oversized_leaves(tree_np, cap)
        t_split = time.perf_counter() - t0
        info = tree_np.info()
        emit({"cap": cap, "build_sec": round(t_build, 2),
              "split_sec": round(t_split, 2), **info})
        t0 = time.perf_counter()
        try:
            packed = poct.pack_from_numpy(tree_np, mesh)
            jax.block_until_ready(packed.leaf_verts)
        except Exception as e:  # e.g. HBM exhausted on tiny-cap trees
            emit({"cap": cap, "pack_error": repr(e)[:200]})
            continue
        t_pack = time.perf_counter() - t0
        leaf_rows = int(packed.leaf_verts.shape[0])
        emit({"cap": cap, "pack_sec": round(t_pack, 2),
              "leaf_verts_mb": round(leaf_rows * poct.VERT_COLS * 4 / 2**20),
              "nodes_mb": round(int(packed.nodes.size) * 4 / 2**20)})

        for pend in [int(p) for p in args.pends.split(",")]:
            if pend <= 8 * ((packed.cap + 7) // 8):
                continue
            variants = [
                ("closest", dict(anyhit=False)),
                ("walk_only", dict(anyhit=False, skip_leaf=True)),
            ]
            stats_closest = None
            for name, kw in variants:
                # packed MUST be a jit argument: closure constants are
                # embedded in the HLO and the remote compile helper
                # rejects gigabyte request bodies (HTTP 413)
                fn = jax.jit(lambda o, d, t, pk, kw=kw, p=pend:
                             poct.octree_intersect_pallas(
                                 o, d, t, pk, pend_size=p,
                                 return_stats=True, **kw))
                out, dt, cdt = timed(fn, o, d, t_max, packed)
                t_res, tri, b1, b2, cnt, st = out
                rec = {
                    "cap": cap, "pend": pend, "variant": name,
                    "rays_per_sec": round(res * res / dt, 1),
                    "sec_per_wavefront": round(dt, 4),
                    "tri_tests_per_ray": round(
                        float(np.asarray(cnt).mean()), 1),
                    "node_pops_per_ray": round(
                        float(np.asarray(st["node_pops"]).mean()), 1),
                    "hit_frac": round(
                        float((np.asarray(tri) >= 0).mean()), 4),
                    "compile_sec": round(cdt, 1),
                }
                emit(rec)
                if name == "closest":
                    stats_closest = (t_res, tri)

            # anyhit on the real shadow workload: origins at camera hits
            t_res, tri = stats_closest
            so, sd, s_tmax = jax.block_until_ready(make_shadow(o, d, t_res))
            fn = jax.jit(lambda o_, d_, t_, pk, p=pend:
                         poct.octree_intersect_pallas(
                             o_, d_, t_, pk, anyhit=True, pend_size=p,
                             return_stats=True))
            out, dt, cdt = timed(fn, so, sd, s_tmax, packed)
            emit({"cap": cap, "pend": pend, "variant": "anyhit_shadow",
                  "rays_per_sec": round(res * res / dt, 1),
                  "sec_per_wavefront": round(dt, 4),
                  "tri_tests_per_ray": round(
                      float(np.asarray(out[4]).mean()), 1),
                  "node_pops_per_ray": round(
                      float(np.asarray(out[5]["node_pops"]).mean()), 1),
                  "occluded_frac": round(
                      float((np.asarray(out[1]) >= 0).mean()), 4),
                  "compile_sec": round(cdt, 1)})

    out_path = args.out or os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "profile_octree.json")
    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
