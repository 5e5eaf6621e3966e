"""Mesh-intersection benchmark at dragon scale (VERDICT r1 item 1).

Times closest-hit intersection of one camera wavefront against a
displaced-icosphere mesh, per backend:

    python benchmarks/bench_mesh.py --subdiv 7 --res 512 --mode octree
    python benchmarks/bench_mesh.py --subdiv 6 --res 256 --mode brute

Prints one JSON line per run. Run ONE TPU process at a time (remote compile
helper), under timeout, in background.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=7)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--mode", default="octree",
                    choices=("octree", "brute", "pallas_brute",
                             "pallas_octree"))
    ap.add_argument("--rays", type=int, default=0,
                    help="cap the ray count (0 = res*res)")
    ap.add_argument("--chunk", type=int, default=2048,
                    help="triangle chunk for brute mode")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--swizzle", type=int, default=1,
                    help="order rays in 32x32 screen tiles (the render-path "
                         "packet layout) instead of raster rows")
    ap.add_argument("--anyhit", action="store_true",
                    help="any-hit (shadow) semantics for pallas_octree")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.utils import mesh_gen
    from computational_ray_tracer_tpu.ops import triangle as trimod
    from computational_ray_tracer_tpu.ops import octree as octmod
    from computational_ray_tracer_tpu.ops import camera as cam

    v, f, uv = mesh_gen.displaced_icosphere(args.subdiv)
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    n_tris = int(mesh.n_triangles)

    camera = cam.PerspectiveCamera.create((0, 0.4, -3.2), (args.res, args.res),
                                          fov_y=40.0, look_at=(0, 0, 0))
    if args.swizzle and args.res % 32 == 0:
        from computational_ray_tracer_tpu.models.integrator import _tile_perm
        px = _tile_perm(args.res, args.res)[0]
    else:
        px = jnp.arange(args.res * args.res, dtype=jnp.uint32)
    pixel_pos = jnp.stack([(px % args.res).astype(jnp.float32) + 0.5,
                           (px // args.res).astype(jnp.float32) + 0.5],
                          axis=-1)
    o, d = camera.generate_rays(pixel_pos, jnp.full((args.res * args.res, 2),
                                                    0.5))
    if args.rays:
        o, d = o[:args.rays], d[:args.rays]
    n_rays = o.shape[0]
    t_max = jnp.full((n_rays,), jnp.inf)

    build_t = time.perf_counter()
    tree = packed = None
    if args.mode == "pallas_octree":
        tree, packed = octmod.build_octree(mesh, pack=True)
        info = tree.info()
    elif args.mode == "octree":
        tree = octmod.build_octree(mesh)
        info = tree.info()
    build_dt = time.perf_counter() - build_t

    if args.mode == "octree":
        fn = jax.jit(lambda o, d, t: octmod.octree_traverse(
            o, d, t, tree, mesh)[:2])
    elif args.mode == "pallas_octree":
        from computational_ray_tracer_tpu.ops import pallas_octree
        fn = jax.jit(lambda o, d, t: pallas_octree.octree_intersect_pallas(
            o, d, t, packed, anyhit=args.anyhit)[:2])
    elif args.mode == "pallas_brute":
        from computational_ray_tracer_tpu.ops import pallas_intersect
        fn = jax.jit(lambda o, d, t: pallas_intersect.mesh_intersect_pallas(
            o, d, t, mesh)[:2])
    else:
        fn = jax.jit(lambda o, d, t: trimod.mesh_intersect_brute(
            o, d, t, mesh, chunk=args.chunk)[:2])

    t0 = time.perf_counter()
    t, ti = fn(o, d, t_max)
    t.block_until_ready()
    compile_dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.reps):
        t, ti = fn(o, d, t_max)
    t.block_until_ready()
    dt = (time.perf_counter() - t0) / args.reps

    hits = int(jnp.sum(ti >= 0))
    tests_per_ray = None
    if args.mode == "pallas_octree":
        from computational_ray_tracer_tpu.ops import pallas_octree
        cnt = jax.jit(lambda o, d, t: pallas_octree.octree_intersect_pallas(
            o, d, t, packed, anyhit=args.anyhit)[4])(o, d, t_max)
        tests_per_ray = round(float(jnp.mean(cnt.astype(jnp.float32))), 1)
    out = {
        "metric": f"mesh_intersect_{args.mode}",
        "n_tris": n_tris,
        "n_rays": int(n_rays),
        "rays_per_sec": round(n_rays / dt, 1),
        "sec_per_wavefront": round(dt, 4),
        "compile_sec": round(compile_dt, 1),
        "hit_frac": round(hits / n_rays, 4),
        "device": str(jax.devices()[0]),
    }
    if tests_per_ray is not None:
        out["tri_tests_per_ray"] = tests_per_ray
        out["pend_size"] = int(os.environ.get("CRT_PEND_SIZE", "16"))
        out["anyhit"] = bool(args.anyhit)
        out["swizzle"] = bool(args.swizzle)
    if tree is not None:
        out["octree"] = {k: round(vv, 2) if isinstance(vv, float) else vv
                         for k, vv in info.items()}
        out["octree_build_sec"] = round(build_dt, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
