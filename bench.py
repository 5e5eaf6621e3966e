"""Benchmark harness (BASELINE.md north-star metrics). Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Two workloads, both on the real chip:
- headline: rays/sec/chip on the 1024spp Cornell box (path MIS, depth 4);
- dragon-class: rays/sec on a 327k-triangle displaced icosphere through the
  Pallas packet octree at 512x512 (the reference's canonical scale,
  RayTracerTestApp.h:70-106) — reported in detail.mesh.

Rays/s counts every traced ray: camera rays plus per-bounce continuation and
NEE shadow rays (the standard wavefront metric); the per-depth alive-ray
fractions are reported alongside so the nominal count stays honest.
A stored per-round baseline (benchmarks/baseline.json) anchors vs_baseline;
the first run writes it.

env: BENCH_RES, BENCH_SPP, BENCH_PASSES, BENCH_CHUNK, BENCH_SPP_BLOCK,
     BENCH_MESH=0 to skip the dragon workload, BENCH_MESH_SUBDIV,
     BENCH_MESH_RES, BENCH_MESH_SPP.
"""

import json
import os
import sys
import time

import numpy as np


def bench_cornell(res, spp, max_depth=4):
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models import integrator as integ
    from __graft_entry__ import _cornell_setup

    scene, camera, cfg = _cornell_setup(res=res, spp=spp)
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=spp),
        integrator="path", max_depth=max_depth)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)

    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    spp_block = int(os.environ.get("BENCH_SPP_BLOCK", "1"))

    @jax.jit
    def chunk_pass(scene, sample_idx):
        return integ.render_passes(scene, camera, cfg, filter_obj, sensor,
                                   sample_idx, chunk, spp_block)

    rgb, wt = chunk_pass(scene, jnp.uint32(0))
    rgb.block_until_ready()

    n_timed = int(os.environ.get("BENCH_PASSES", "32"))
    n_chunks = max(1, n_timed // chunk)
    n_timed = n_chunks * chunk
    t0 = time.perf_counter()
    for i in range(n_chunks):
        rgb, wt = chunk_pass(scene, jnp.uint32((i + 1) * chunk))
    rgb.block_until_ready()
    dt = time.perf_counter() - t0

    alive = np.asarray(jax.jit(lambda s: integ.alive_fractions(
        s, camera, cfg))(scene))

    n_pixels = res * res
    rays_per_sample = 1 + (max_depth - 1) + max_depth
    rays_per_sec = n_pixels * n_timed * rays_per_sample / dt
    return {
        "rays_per_sec": rays_per_sec,
        "passes_timed": n_timed,
        "sec_per_spp_pass": round(dt / n_timed, 6),
        "est_sec_full_1024spp": round(dt / n_timed * spp, 2),
        "alive_frac_per_depth": [round(float(a), 4) for a in alive],
    }


def bench_dragon():
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models.scene import Scene
    from computational_ray_tracer_tpu.models import integrator as integ
    from computational_ray_tracer_tpu.ops import camera as cam
    from computational_ray_tracer_tpu.ops import triangle as trimod
    from computational_ray_tracer_tpu.utils import mesh_gen

    subdiv = int(os.environ.get("BENCH_MESH_SUBDIV", "7"))
    res = int(os.environ.get("BENCH_MESH_RES", "512"))
    spp = int(os.environ.get("BENCH_MESH_SPP", "4"))

    t0 = time.perf_counter()
    v, f, uv = mesh_gen.displaced_icosphere(subdiv)
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    scene = Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (0.75, 0.71, 0.62)}],
        lights=[{"kind": "distant", "direction": (-0.4, -1.0, 0.5),
                 "rgb": (1.0, 1.0, 1.0), "scale": 4.0},
                {"kind": "ambient", "spd_named": "stdillum-D65",
                 "scale": 0.15}],
        mesh=(mesh, jnp.zeros((mesh.n_triangles,), jnp.int32)),
        use_octree=True)
    build_dt = time.perf_counter() - t0
    camera = cam.PerspectiveCamera.create((0, 0.5, -3.4), (res, res),
                                          fov_y=40.0, look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=spp),
        integrator="direct", max_depth=1)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)

    @jax.jit
    def one_pass(scene, sample_idx):
        return integ.render_pass(scene, camera, cfg, filter_obj, sensor,
                                 sample_idx)

    t0 = time.perf_counter()
    rgb, wt = one_pass(scene, jnp.uint32(0))
    rgb.block_until_ready()
    compile_dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(spp):
        rgb, wt = one_pass(scene, jnp.uint32(i + 1))
    rgb.block_until_ready()
    dt = (time.perf_counter() - t0) / spp

    # direct lighting: 1 camera ray + 1 shadow ray per sample
    rays = res * res * 2
    return {
        "n_triangles": int(mesh.n_triangles),
        "rays_per_sec": round(rays / dt, 1),
        "sec_per_spp_pass": round(dt, 4),
        "octree": scene.octree.info(),
        "scene_build_sec": round(build_dt, 1),
        "compile_sec": round(compile_dt, 1),
        "img_mean": round(float(jnp.mean(rgb)), 5),
    }


def main():
    import jax

    res = int(os.environ.get("BENCH_RES", "256"))
    spp = int(os.environ.get("BENCH_SPP", "1024"))
    cornell = bench_cornell(res, spp)
    mesh_detail = None
    if os.environ.get("BENCH_MESH", "1") != "0":
        mesh_detail = bench_dragon()

    rays_per_sec = cornell.pop("rays_per_sec")
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline.json")
    baseline = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get("rays_per_sec")
    if baseline is None:
        os.makedirs(os.path.dirname(base_path), exist_ok=True)
        with open(base_path, "w") as f:
            json.dump({"rays_per_sec": rays_per_sec, "res": res,
                       "device": str(jax.devices()[0])}, f)
        baseline = rays_per_sec

    detail = {"device": str(jax.devices()[0]), **cornell}
    if mesh_detail is not None:
        detail["mesh"] = mesh_detail
    print(json.dumps({
        "metric": f"rays_per_sec_per_chip_cornell_{res}x{res}_path4",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
