"""Stage attribution for the dragon-class mesh bench (bench_dragon): where
do 2.7 s per 512^2 direct-lighting pass go when the raw kernels cost
~0.4 s? Times each stage of li_direct in isolation on the real scene.

Usage: python benchmarks/profile_mesh_pass.py [env BENCH_MESH_RES=512
       BENCH_MESH_SUBDIV=7 BENCH_MESH_CAP=40 REPEATS=4]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from computational_ray_tracer_tpu.models import integrator as integ
from computational_ray_tracer_tpu.models import materials as mat
from computational_ray_tracer_tpu.models import lights as lgt
from computational_ray_tracer_tpu.models import scene as scn
from computational_ray_tracer_tpu.ops import camera as cam
from computational_ray_tracer_tpu.ops import spectrum as spec
from computational_ray_tracer_tpu.ops import rng

RES = int(os.environ.get("BENCH_MESH_RES", "512"))
REPEATS = int(os.environ.get("REPEATS", "4"))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args, jnp.uint32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    # k+1: this runtime services a repeat of an identical dispatch
    # near-instantly, so re-timing k=0 after the warm-up underreports
    for k in range(REPEATS):
        out = f(*args, jnp.uint32(k + 1))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPEATS
    print(f"{name:40s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    if os.environ.get("PROFILE_MESH870", "0") == "1":
        # the 872k-tri irregular mesh + its bench camera (bench_dragon870)
        from computational_ray_tracer_tpu.models.scene import Scene
        from computational_ray_tracer_tpu.ops import triangle as trimod
        from computational_ray_tracer_tpu.utils import mesh_gen
        v, f, uv = mesh_gen.dragon_stand_in()
        mesh = trimod.MeshData.build(v, f, uvs=uv)
        scene = Scene.build(
            materials=[{"kind": "diffuse", "albedo_rgb": (0.7, 0.64, 0.52)}],
            lights=[{"kind": "distant", "direction": (-0.4, -1.0, 0.5),
                     "rgb": (1.0, 1.0, 1.0), "scale": 4.0},
                    {"kind": "ambient", "spd_named": "stdillum-D65",
                     "scale": 0.15}],
            mesh=(mesh, jnp.zeros((mesh.n_triangles,), jnp.int32)),
            use_octree=True,
            octree_capacity=int(os.environ.get("BENCH_MESH870_CAP", "96")))
        camera = cam.PerspectiveCamera.create((0, 12, -52), (RES, RES),
                                              fov_y=45.0, look_at=(0, -1, 0))
    else:
        scene = bench._dragon_scene(
            int(os.environ.get("BENCH_MESH_SUBDIV", "7")),
            int(os.environ.get("BENCH_MESH_CAP", "40")))
        camera = cam.PerspectiveCamera.create((0, 0.5, -3.4), (RES, RES),
                                              fov_y=40.0, look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(RES, RES),
        sampler=integ.SamplerConfig(kind="sobol", spp=4),
        integrator="direct", max_depth=1)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)
    n = RES * RES
    # tile-swizzled pixel order — the order render_pass actually uses
    # (the r3 run of this profiler used raster order, which made isolated
    # closest-hit look 40x slower than in-pass: a 1024-ray packet spanned
    # two full image rows)
    pixel, _ = integ._swizzled_pixels(RES, RES)
    s = cfg.sampler
    px = (pixel % RES).astype(jnp.float32) + 0.5
    py = (pixel // RES).astype(jnp.float32) + 0.5
    o, d = camera.generate_rays(jnp.stack([px, py], -1),
                                jnp.full((n, 2), 0.5))
    t_max = jnp.full((n,), jnp.inf)
    print(f"device={jax.devices()[0]}, rays={n}")

    timeit("full render_pass (direct, 1 spp)",
           lambda sc, k: integ.render_pass(sc, camera, cfg, filter_obj,
                                           sensor, k), scene)

    # full pass with the NEE shadow test stubbed out — everything EXCEPT
    # scene_anyhit (closest hit, surface, shading, film) stays real.
    real_occluded = integ.scene_occluded
    try:
        integ.scene_occluded = lambda sc, p, wi, dist, eps=1e-3, n=None, \
            coherent=True: jnp.zeros(p.shape[:-1], bool)
        timeit("render_pass minus shadow (stubbed)",
               lambda sc, k: integ.render_pass(sc, camera, cfg, filter_obj,
                                               sensor, k), scene)
    finally:
        integ.scene_occluded = real_occluded
    timeit("scene_intersect_t (closest)",
           lambda sc, k: scn.scene_intersect_t(
               sc, o + 0.0 * k.astype(jnp.float32), d, t_max)[0], scene)
    hit = jax.jit(lambda sc: scn.scene_intersect_t(sc, o, d, t_max))(scene)
    timeit("scene_surface",
           lambda sc, k: scn.scene_surface(
               sc, o + 0.0 * k.astype(jnp.float32), d, hit)[0].t, scene)
    si, mid = jax.jit(lambda sc: scn.scene_surface(sc, o, d, hit))(scene)
    wl = spec.sample_visible_wavelengths(rng.independent_1d(0, pixel, 0, 0))

    def nee(sc, k):
        mrow = mat.MaterialView.create(sc.materials, mid)
        u_sel = s.get_1d(pixel, k, 7)
        u_pos = s.get_2d(pixel, k, 8)
        wi, dist, li_val, pdf, _ = lgt.sample_light(
            sc.lights, si.p, si.n, wl.lam, u_sel, u_pos, 100.0)
        f, _ = mat.bsdf_eval(mrow, si.n, si.wo, wi, wl.lam, None)
        return f * li_val * (1.0 / jnp.maximum(pdf, 1e-9))[..., None]
    timeit("NEE shade (no shadow ray)", nee, scene)

    def shadow(sc, k):
        mrow = mat.MaterialView.create(sc.materials, mid)
        u_sel = s.get_1d(pixel, k, 7)
        u_pos = s.get_2d(pixel, k, 8)
        wi, dist, li_val, pdf, _ = lgt.sample_light(
            sc.lights, si.p, si.n, wl.lam, u_sel, u_pos, 100.0)
        return scn.scene_occluded(sc, si.p, wi, dist,
                                  integ.spawn_eps(si, cfg), n=si.n,
                                  coherent=False)
    timeit("NEE shadow (sorted anyhit)", shadow, scene)

    def shadow_unsorted(sc, k):
        mrow = mat.MaterialView.create(sc.materials, mid)
        u_sel = s.get_1d(pixel, k, 7)
        u_pos = s.get_2d(pixel, k, 8)
        wi, dist, li_val, pdf, _ = lgt.sample_light(
            sc.lights, si.p, si.n, wl.lam, u_sel, u_pos, 100.0)
        return scn.scene_occluded(sc, si.p, wi, dist,
                                  integ.spawn_eps(si, cfg), n=si.n,
                                  coherent=True)
    if os.environ.get("PROFILE_UNSORTED", "0") == "1":
        timeit("NEE shadow (rs8+frustum, unsorted)", shadow_unsorted, scene)

    # sort machinery cost alone
    def sort_cost(sc, k):
        of = si.p + 0.0 * k.astype(jnp.float32)
        order = scn._packet_order(of, d, jnp.isfinite(si.t))
        return of[order]
    timeit("packet sort (argsort+gather)", sort_cost, scene)


if __name__ == "__main__":
    main()
