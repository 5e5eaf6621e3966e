"""Benchmark harness: rays/sec/chip on the 1024spp Cornell box (BASELINE.md
north-star metric). Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Rays/s counts every traced ray: camera rays plus per-bounce continuation and
NEE shadow rays (the standard wavefront metric). A stored per-round baseline
(benchmarks/baseline.json) anchors vs_baseline; the first run writes it.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models import integrator as integ
    from __graft_entry__ import _cornell_setup

    res = int(os.environ.get("BENCH_RES", "256"))
    spp = int(os.environ.get("BENCH_SPP", "1024"))
    max_depth = 4

    scene, camera, cfg = _cornell_setup(res=res, spp=spp)
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=spp),
        integrator="path", max_depth=max_depth)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)

    # Chunked: CHUNK spp per device launch (lax.scan inside jit) so host
    # dispatch overhead is amortized — one launch per chunk, not per spp.
    # SPP_BLOCK samples ride one wavefront (block*W*H rays in flight),
    # amortizing per-op overhead inside the launch.
    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    spp_block = int(os.environ.get("BENCH_SPP_BLOCK", "1"))

    @jax.jit
    def chunk_pass(scene, sample_idx):
        return integ.render_passes(scene, camera, cfg, filter_obj, sensor,
                                   sample_idx, chunk, spp_block)

    # warmup/compile
    rgb, wt = chunk_pass(scene, jnp.uint32(0))
    rgb.block_until_ready()

    # timed passes (each chunk = `chunk` spp over all pixels)
    n_timed = int(os.environ.get("BENCH_PASSES", "32"))
    n_chunks = max(1, n_timed // chunk)
    n_timed = n_chunks * chunk
    t0 = time.perf_counter()
    for i in range(n_chunks):
        rgb, wt = chunk_pass(scene, jnp.uint32((i + 1) * chunk))
    rgb.block_until_ready()
    dt = time.perf_counter() - t0

    n_pixels = res * res
    # rays per camera sample: 1 camera ray + per bounce (1 continuation
    # after the first hit + 1 NEE shadow ray)
    rays_per_sample = 1 + (max_depth - 1) + max_depth
    total_rays = n_pixels * n_timed * rays_per_sample
    rays_per_sec = total_rays / dt
    secs_full_render = dt / n_timed * spp

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
                       "spp_timed": n_timed,
                       "device": str(jax.devices()[0])}, f)
        baseline = rays_per_sec

    print(json.dumps({
        "metric": f"rays_per_sec_per_chip_cornell_{res}x{res}_path4",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 4),
        "detail": {
            "device": str(jax.devices()[0]),
            "passes_timed": n_timed,
            "sec_per_spp_pass": round(dt / n_timed, 6),
            "est_sec_full_1024spp": round(secs_full_render, 2),
        },
    }))


if __name__ == "__main__":
    main()
