"""
NOTE: the 872k scene/camera/wavefront here mirror bench.bench_dragon870
(the source of truth) — keep them in sync when the bench scene changes.
Focused sweep of the anyhit (NEE shadow) kernel on the 872k-tri mesh —
the stage that dominates the direct pass (profile_mesh_pass: 1137 ms of a
934 ms pass vs 155 ms closest-hit). Sweeps leaf capacity x ray_sub x
frustum x sorted/unsorted on the REAL shadow wavefront (distant+ambient
mixed NEE directions from the bench scene's surface hits).

Usage: python benchmarks/sweep_shadow870.py [--caps 40,64,96] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", type=str, default="40,64,96")
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
        so = si.p + si.n * eps[..., None]
        fwd = jnp.sum(wi * si.n, axis=-1) >= 0
        so = jnp.where(fwd[..., None], so, si.p - si.n * eps[..., None])
        t_m = jnp.where(dist > 0,
                        jnp.where(jnp.isfinite(dist), dist - 2 * eps, 1e7),
                        -1.0)
        order = scn._packet_order(so, wi, t_m > 0)
        return so, wi, t_m, order

    so, wi, t_m, order = jax.block_until_ready(shadow_wavefront(scene, 0))
    emit({"n_rays": n, "alive": int(np.asarray(t_m > 0).sum()),
          "device": str(jax.devices()[0])})

    gather = jax.jit(lambda a, o: jax.tree_util.tree_map(
        lambda x: x[o], a))

    for cap in [int(c) for c in args.caps.split(",")]:
        tree_np_key = None
        tree, packed = octmod.build_octree(mesh, capacity=cap, pack=True)
        jax.block_until_ready(packed.leaf_verts)
        emit({"cap": cap, **tree.info(),
              "leaf_mb": round(int(packed.leaf_verts.size) * 4 / 2**20)})
        for sort in (True, False):
            for rs in (8, 4, 1):
                for fr in (False, True):
                    fn = jax.jit(lambda o_, d_, t_, pk, rs=rs, fr=fr:
                                 poct.octree_anyhit_pallas(
                                     o_, d_, t_, pk, ray_sub=rs,
                                     frustum=fr))
                    a = (gather((so, wi, t_m), order) if sort
                         else (so, wi, t_m))
                    try:
                        out = fn(*a, packed)
                        jax.block_until_ready(out)
                        ts = []
                        for r in range(args.reps):
                            # vary t_max epsilon to defeat the runtime's
                            # identical-call cache
                            aa = (a[0], a[1], a[2] * (1.0 + 1e-7 * (r + 1)))
                            t0 = time.perf_counter()
                            out = fn(*aa, packed)
                            jax.block_until_ready(out)
                            ts.append(time.perf_counter() - t0)
                        emit({"cap": cap, "sorted": sort, "ray_sub": rs,
                              "frustum": fr,
                              "ms": round(min(ts) * 1e3, 1),
                              "occl_frac": round(float(
                                  np.asarray(out).mean()), 4)})
                    except Exception as e:
                        emit({"cap": cap, "sorted": sort, "ray_sub": rs,
                              "frustum": fr, "error": repr(e)[:160]})

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "sweep_shadow870.json")
    with open(out_path, "w") as fp:
        json.dump(records, fp, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
