"""Roofline anchor for the Cornell headline (VERDICT r4 next-step #8):
how far is the measured rays/s from this chip's ceilings, and which
resource is the limiter?

Method: compile the exact headline chunk (render_passes, path/MIS depth 4,
Sobol, 256^2, chunk spp) and read XLA's cost analysis (flops, bytes
accessed) off the compiled executable; time the warm pass; report achieved
FLOP/s and HBM bytes/s against the v5e peaks, plus per-ray arithmetic.

Peaks used (TPU v5e, public figures): 394 TFLOP/s bf16 MXU (197 per the
two cores? one chip = 1 TensorCore: 197 TFLOP/s bf16, f32 via VPU
~= 3.6 TFLOP/s (8x128x8 ALUs x 0.94 GHz x 2? — the VPU bound is an
estimate, stated as such), HBM ~= 819 GB/s. The renderer's hot loops are
f32 VPU + gather work, so the meaningful ceilings are VPU and HBM.

Usage: python benchmarks/roofline.py [--res 256] [--chunk 8]
Writes benchmarks/roofline.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_BYTES_PER_S = 819e9       # public v5e spec
V5E_BF16_FLOPS = 197e12           # public v5e spec (MXU)
V5E_VPU_F32_FLOPS = 3.6e12        # estimate: 8x128 lanes x 4 ALUs x
                                  # ~0.94 GHz (stated as an estimate)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp-chunk", type=int, default=8)
    ap.add_argument("--max-depth", type=int, default=4)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models import integrator as integ
    from __graft_entry__ import _cornell_setup

    res = args.res
    chunk = args.spp_chunk
    scene, camera, _ = _cornell_setup(res=res, spp=chunk)
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=1024),
        integrator="path", max_depth=args.max_depth)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)

    def chunk_pass(scene, sample_idx):
        return integ.render_passes(scene, camera, cfg, filter_obj, sensor,
                                   sample_idx, chunk)

    lowered = jax.jit(chunk_pass).lower(scene, jnp.uint32(0))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    out = compiled(scene, jnp.uint32(0))
    jax.block_until_ready(out)
    ts = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        out = compiled(scene, jnp.uint32(r + 1))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)

    n_rays = res * res * chunk * (1 + (args.max_depth - 1) + args.max_depth)
    achieved_flops = flops / dt
    achieved_bw = bytes_acc / dt
    util_vpu = achieved_flops / V5E_VPU_F32_FLOPS
    util_hbm = achieved_bw / V5E_HBM_BYTES_PER_S
    limiter = "HBM bandwidth" if util_hbm > util_vpu else "VPU f32 compute"
    if max(util_hbm, util_vpu) < 0.15:
        limiter = ("issue latency / occupancy — both VPU and HBM are far "
                   "below peak, so the bound is kernel-launch gaps, "
                   "gather/select issue rates and dependency chains, not "
                   "a hard resource ceiling")
    rec = {
        "config": f"cornell {res}x{res} path/MIS depth {args.max_depth} "
                  f"sobol, chunk {chunk} spp",
        "device": str(jax.devices()[0]),
        "sec_per_chunk": round(dt, 5),
        "rays_per_sec": round(n_rays / dt, 1),
        "hlo_flops_per_chunk": flops,
        "hlo_bytes_per_chunk": bytes_acc,
        "flops_per_ray": round(flops / n_rays, 1),
        "bytes_per_ray": round(bytes_acc / n_rays, 1),
        "achieved_tflops": round(achieved_flops / 1e12, 3),
        "achieved_gb_per_s": round(achieved_bw / 1e9, 1),
        "vpu_f32_utilization": round(util_vpu, 3),
        "hbm_utilization": round(util_hbm, 3),
        "arithmetic_intensity_flops_per_byte": round(
            flops / max(bytes_acc, 1.0), 2),
        "limiter": limiter,
        "peaks": {"hbm_bytes_per_s": V5E_HBM_BYTES_PER_S,
                  "vpu_f32_flops_est": V5E_VPU_F32_FLOPS,
                  "bf16_mxu_flops": V5E_BF16_FLOPS},
        "notes": "XLA cost analysis counts logical flops/bytes of the "
                 "optimized HLO (fusion-aware bytes are approximate); the "
                 "VPU f32 peak is an estimate — utilizations are "
                 "order-of-magnitude anchors, not exact occupancy.",
    }
    out_path = args.out or os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "roofline.json")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
