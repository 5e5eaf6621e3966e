"""One-process sweep of the Pallas octree-kernel knobs at dragon scale:
builds/packs the mesh ONCE, then times (swizzle, anyhit, pend) variants.

Usage: python benchmarks/sweep_octree.py [--subdiv 7] [--res 512]
Prints one JSON line per variant.
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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.utils import mesh_gen
    from computational_ray_tracer_tpu.ops import triangle as trimod
    from computational_ray_tracer_tpu.ops import octree as octmod
    from computational_ray_tracer_tpu.ops import pallas_octree as poct
    from computational_ray_tracer_tpu.ops import camera as cam
    from computational_ray_tracer_tpu.models.integrator import _tile_perm

    v, f, uv = mesh_gen.displaced_icosphere(args.subdiv)
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    t0 = time.perf_counter()
    tree, packed = octmod.build_octree(mesh, pack=True)
    jax.block_until_ready(packed.leaf_verts)
    print(json.dumps({"build_sec": round(time.perf_counter() - t0, 1),
                      "n_tris": int(mesh.n_triangles),
                      **tree.info()}), flush=True)

    camera = cam.PerspectiveCamera.create((0, 0.4, -3.2),
                                          (args.res, args.res),
                                          fov_y=40.0, look_at=(0, 0, 0))
    res = args.res
    raster = jnp.arange(res * res, dtype=jnp.uint32)
    tiled = _tile_perm(res, res)[0]
    rays = {}
    for name, px in (("tile", tiled), ("raster", raster)):
        pp = jnp.stack([(px % res).astype(jnp.float32) + 0.5,
                        (px // res).astype(jnp.float32) + 0.5], axis=-1)
        rays[name] = camera.generate_rays(pp, jnp.full((res * res, 2), 0.5))
    t_max = jnp.full((res * res,), jnp.inf)

    variants = [
        ("tile", False, 16), ("tile", False, 8), ("tile", False, 64),
        ("raster", False, 16), ("tile", True, 16),
    ]
    for order, anyhit, pend in variants:
        o, d = rays[order]
        fn = jax.jit(lambda o, d, t, pk, a=anyhit, p=pend:
                     poct.octree_intersect_pallas(o, d, t, pk,
                                                  anyhit=a, pend_size=p))
        t0 = time.perf_counter()
        out = fn(o, d, t_max, packed)
        out[0].block_until_ready()
        compile_dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(o, d, t_max, packed)
        out[0].block_until_ready()
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({
            "order": order, "anyhit": anyhit, "pend": pend,
            "rays_per_sec": round(res * res / dt, 1),
            "sec_per_wavefront": round(dt, 4),
            "tri_tests_per_ray": round(
                float(jnp.mean(out[4].astype(jnp.float32))), 1),
            "hit_frac": round(float(jnp.mean((out[1] >= 0)
                                             .astype(jnp.float32))), 4),
            "compile_sec": round(compile_dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
