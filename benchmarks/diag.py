"""Pipeline cost breakdown on the current device: times render variants and
isolated stages to show where a Cornell path-tracing pass spends its time.

python benchmarks/diag.py          # res 256, chunk 4, 8 timed chunks
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_fn(fn, *args, warmup=1, iters=4):
    import jax
    for _ in range(warmup):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _cornell_setup
    from computational_ray_tracer_tpu.models import integrator as integ
    from computational_ray_tracer_tpu.models.scene import (scene_intersect,
                                                           scene_anyhit)
    from computational_ray_tracer_tpu.ops import rng

    res = int(os.environ.get("DIAG_RES", "256"))
    chunk = int(os.environ.get("DIAG_CHUNK", "4"))
    scene, camera, _ = _cornell_setup(res=res, spp=16)
    report = {"device": str(jax.devices()[0]), "res": res, "chunk": chunk}

    def variant(name, **over):
        cfg = integ.RenderConfig(
            resolution=(res, res),
            sampler=integ.SamplerConfig(
                kind=over.pop("sampler", "sobol"), spp=16),
            integrator=over.pop("integrator", "path"),
            max_depth=over.pop("max_depth", 4))
        f = integ.make_filter(cfg)
        s = integ.make_sensor(cfg)

        @jax.jit
        def run(scene, i0):
            return integ.render_passes(scene, camera, cfg, f, s, i0, chunk)

        dt = bench_fn(run, scene, jnp.uint32(0)) / chunk
        report[name] = round(dt * 1e3, 2)   # ms per spp-pass
        print(f"{name}: {dt*1e3:.2f} ms/spp-pass", flush=True)

    variant("path_d4_sobol")
    variant("path_d4_independent", sampler="independent")
    variant("walk_d4_sobol", integrator="walk")        # no NEE/shadow rays
    variant("path_d1_sobol", max_depth=1)
    variant("direct_sobol", integrator="direct", max_depth=1)

    # --- isolated stages at wavefront size
    n = res * res
    o = jnp.zeros((n, 3)) + jnp.asarray([0.0, 0.0, -2.8])
    d_ = np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32)
    d_ /= np.linalg.norm(d_, axis=1, keepdims=True)
    d = jnp.asarray(d_)
    tmax = jnp.full((n,), jnp.inf)

    @jax.jit
    def isect(o, d, tmax):
        si, mid, _ = scene_intersect(scene, o, d, tmax)
        return si.p, mid

    report["scene_intersect_ms"] = round(
        bench_fn(isect, o, d, tmax) * 1e3, 2)
    print("scene_intersect:", report["scene_intersect_ms"], "ms", flush=True)

    @jax.jit
    def anyhit(o, d, tmax):
        return scene_anyhit(scene, o, d, jnp.where(jnp.isinf(tmax), 1e3,
                                                   tmax))

    report["scene_anyhit_ms"] = round(bench_fn(anyhit, o, d, tmax) * 1e3, 2)
    print("scene_anyhit:", report["scene_anyhit_ms"], "ms", flush=True)

    pixel = jnp.arange(n, dtype=jnp.uint32)

    @jax.jit
    def sobol_draws(pixel, i):
        tot = jnp.zeros((n,))
        for dim in range(12):
            tot = tot + rng.sobol_owen_1d(0, pixel, i, dim, spp=16)
        return tot

    report["12_sobol_draws_ms"] = round(
        bench_fn(sobol_draws, pixel, jnp.uint32(0)) * 1e3, 2)
    print("12 sobol draws:", report["12_sobol_draws_ms"], "ms", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "diag_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
