"""
NOTE: the 872k scene/camera/wavefront here mirror bench.bench_dragon870
(the source of truth) — keep them in sync when the bench scene changes.
Shadow-anyhit sweep round 2 on the 872k mesh: leaf capacity (the leaf
phase is 8x cheaper post-packing, so much bigger leaves may now win) x
packet sort-key variants (origin-major vs direction-major grouping for
the incoherent NEE wavefront), plus walk-only decomposition and per-ray
pop/test counters for the winner.

Usage: python benchmarks/sweep_shadow870b.py [--caps 96,160,256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", type=str, default="96,160,256")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--res", type=int, default=512)
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
    from computational_ray_tracer_tpu.ops import rng, spectrum as spec
    from computational_ray_tracer_tpu.models import lights as lgt
    from computational_ray_tracer_tpu.models import scene as scn
    from computational_ray_tracer_tpu.models.scene import Scene
    from computational_ray_tracer_tpu.models import integrator as integ

    records = []

    def emit(rec):
        records.append(rec)
        print(json.dumps(rec), flush=True)

    res = args.res
    v, f, uv = mesh_gen.dragon_stand_in()
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    scene = Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (0.7, 0.64, 0.52)}],
        lights=[{"kind": "distant", "direction": (-0.4, -1.0, 0.5),
                 "rgb": (1.0, 1.0, 1.0), "scale": 4.0},
                {"kind": "ambient", "spd_named": "stdillum-D65",
                 "scale": 0.15}],
        mesh=(mesh, jnp.zeros((mesh.n_triangles,), jnp.int32)),
        use_octree=True, octree_capacity=96)
    camera = cam.PerspectiveCamera.create((0, 12, -52), (res, res),
                                          fov_y=45.0, look_at=(0, -1, 0))
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=4),
        integrator="direct", max_depth=1)
    n = res * res
    pixel, _ = integ._swizzled_pixels(res, res)
    s = cfg.sampler
    px = (pixel % res).astype(jnp.float32) + 0.5
    py = (pixel // res).astype(jnp.float32) + 0.5

    @jax.jit
    def shadow_wavefront(sc, k):
        o, d = camera.generate_rays(jnp.stack([px, py], -1),
                                    jnp.full((n, 2), 0.5))
        t_max = jnp.full((n,), jnp.inf)
        hit = scn.scene_intersect_t(sc, o, d, t_max)
        si, mid = scn.scene_surface(sc, o, d, hit)
        wl = spec.sample_visible_wavelengths(
            rng.independent_1d(0, pixel, k, 0))
        u_sel = s.get_1d(pixel, k, 7)
        u_pos = s.get_2d(pixel, k, 8)
        wi, dist, li_val, pdf, _ = lgt.sample_light(
            sc.lights, si.p, si.n, wl.lam, u_sel, u_pos,
            sc.world_radius())
        eps = integ.spawn_eps(si, cfg)
        dist = jnp.where(si.valid, dist, -1.0)
        fwd = jnp.sum(wi * si.n, axis=-1) >= 0
        so = jnp.where(fwd[..., None], si.p + si.n * eps[..., None],
                       si.p - si.n * eps[..., None])
        t_m = jnp.where(dist > 0,
                        jnp.where(jnp.isfinite(dist), dist - 2 * eps, 1e7),
                        -1.0)
        return so, wi, t_m

    so, wi, t_m = jax.block_until_ready(shadow_wavefront(scene, 0))
    alive = np.asarray(t_m) > 0
    emit({"n_rays": n, "alive": int(alive.sum()),
          "device": str(jax.devices()[0])})

    # ---- sort-key variants (host-side numpy for flexibility) ----
    so_np = np.asarray(so)
    wi_np = np.asarray(wi)

    def cellkey(x, lo, hi, bits):
        q = np.clip(((x - lo) / np.maximum(hi - lo, 1e-20)
                     * (1 << bits)).astype(np.int64), 0, (1 << bits) - 1)
        return q

    def morton(q, bits):
        out = np.zeros(q.shape[0], np.int64)
        for b in range(bits):
            for a in range(3):
                out |= ((q[:, a] >> b) & 1) << (3 * b + a)
        return out

    lo = so_np[alive].min(0) if alive.any() else so_np.min(0)
    hi = so_np[alive].max(0) if alive.any() else so_np.max(0)
    octant = ((wi_np[:, 0] < 0).astype(np.int64) * 4
              + (wi_np[:, 1] < 0).astype(np.int64) * 2
              + (wi_np[:, 2] < 0).astype(np.int64))
    aw = np.abs(wi_np) + 1e-20

    def dirbin(bits):
        # quantize |d| shape: 2 angles via dominant-axis projection
        u_ = aw[:, 0] / aw.sum(1)
        v_ = aw[:, 1] / aw.sum(1)
        qu = np.clip((u_ * (1 << bits)).astype(np.int64), 0,
                     (1 << bits) - 1)
        qv = np.clip((v_ * (1 << bits)).astype(np.int64), 0,
                     (1 << bits) - 1)
        return (qu << bits) | qv

    q8 = cellkey(so_np, lo, hi, 3)
    q16 = cellkey(so_np, lo, hi, 4)
    q32 = cellkey(so_np, lo, hi, 5)
    variants = {
        "oct_m8 (current)": octant * (1 << 9) + morton(q8, 3),
        "oct_m16": octant * (1 << 12) + morton(q16, 4),
        "oct_m32": octant * (1 << 15) + morton(q32, 5),
        "oct_dir4_m8": ((octant * (1 << 4) + dirbin(2)) << 9) + morton(q8, 3),
        "dir16_oct_m4": ((octant * (1 << 8) + dirbin(4)) << 6)
                        + morton(cellkey(so_np, lo, hi, 2), 2),
    }

    for cap in [int(c) for c in args.caps.split(",")]:
        tree, packed = octmod.build_octree(mesh, capacity=cap, pack=True)
        jax.block_until_ready(packed.leaf_verts)
        emit({"cap": cap, **tree.info(),
              "leaf_mb": round(int(packed.leaf_verts.size) * 4 / 2**20)})
        fn = jax.jit(lambda o_, d_, t_, pk:
                     poct.octree_anyhit_pallas(o_, d_, t_, pk))
        fn_stats = jax.jit(lambda o_, d_, t_, pk:
                           poct.octree_intersect_pallas(
                               o_, d_, t_, pk, anyhit=True,
                               return_stats=True)[4:])
        for vname, key in variants.items():
            key = np.where(alive, key, 1 << 60)
            order = jnp.asarray(np.argsort(key, kind="stable").astype(
                np.int32))
            a = jax.block_until_ready(jax.jit(
                lambda o_, d_, t_, idx: (o_[idx], d_[idx], t_[idx]))(
                    so, wi, t_m, order))
            out = fn(*a, packed)
            jax.block_until_ready(out)
            ts = []
            for r in range(args.reps):
                aa = (a[0], a[1], a[2] * (1.0 + 1e-7 * (r + 1)))
                t0 = time.perf_counter()
                out = fn(*aa, packed)
                jax.block_until_ready(out)
                ts.append(time.perf_counter() - t0)
            cnt, stats = fn_stats(*a, packed)
            cnt = np.asarray(cnt)
            pops = np.asarray(stats["node_pops"])
            emit({"cap": cap, "key": vname, "ms": round(min(ts) * 1e3, 1),
                  "occl": round(float(np.asarray(out).mean()), 4),
                  "tests_per_packet": round(float(cnt.mean()), 0),
                  "pops_per_packet": round(float(pops.mean()), 0)})

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "sweep_shadow870b.json")
    with open(out_path, "w") as fp:
        json.dump(records, fp, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
