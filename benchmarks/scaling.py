"""Multi-device scaling efficiency of the sharded renderer (BASELINE.md
row 4: >80% rays/s scaling efficiency across the mesh).

Measures wall time of the sharded render step at dp in {1,2,4,8} (sp=1)
on whatever devices exist — the virtual 8-CPU mesh in CI (the measurement
*pipeline*; CPU numbers validate the plumbing and collective overhead
shape, not TPU throughput) or a real slice when one is attached.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/scaling.py [--res 128] [--passes 8] [--mesh-scene]
Writes benchmarks/scaling.json.
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
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--mesh-scene", action="store_true",
                    help="use the mesh+octree Cornell (Pallas interpret on "
                         "CPU) instead of the analytic sphere scene")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models import integrator as integ
    from computational_ray_tracer_tpu.ops import film as filmmod
    from computational_ray_tracer_tpu.parallel import sharding as par
    from __graft_entry__ import _cornell_setup

    res = args.res
    scene, camera, _ = _cornell_setup(
        res=res, spp=args.passes, use_octree=args.mesh_scene,
        use_pallas=args.mesh_scene)
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=args.passes),
        integrator="path", max_depth=4)

    devices = jax.devices()
    dps = [d for d in (1, 2, 4, 8) if d <= len(devices)]
    rows = []
    base_rate = None
    for dp in dps:
        mesh = par.make_mesh(n_dp=dp, n_sp=1, devices=devices[:dp])
        step, _ = par.make_sharded_render(scene, camera, cfg, mesh)
        film = filmmod.Film.create(cfg.resolution)
        film = step(scene, film, 0)                      # compile
        jax.block_until_ready(film.rgb_sum)
        t0 = time.perf_counter()
        for i in range(args.passes):
            film = step(scene, film, i + 1)
        jax.block_until_ready(film.rgb_sum)
        dt = time.perf_counter() - t0
        rays_per_sample = 1 + (cfg.max_depth - 1) + cfg.max_depth
        total_rays = res * res * args.passes * rays_per_sample
        rate = total_rays / dt
        if base_rate is None:
            base_rate = rate
        rows.append({
            "dp": dp, "sec": round(dt, 3),
            "rays_per_sec_total": round(rate, 1),
            "rays_per_sec_per_device": round(rate / dp, 1),
            "scaling_efficiency": round(rate / (base_rate * dp), 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {"device": str(devices[0]), "n_devices": len(devices),
           "res": res, "passes": args.passes,
           "scene": "mesh_octree_cornell" if args.mesh_scene
                    else "cornell", "rows": rows}
    out_path = args.out or os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scaling.json")
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
