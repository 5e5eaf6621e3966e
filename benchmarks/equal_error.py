"""Equal-error benchmark: MSE-vs-spp and MSE-vs-wall-time for
{independent, stratified, sobol, sobol_global} x {simple, mis} on the
Cornell headline scene (VERDICT r2 next-step #2).

Rays/s alone can hide a quality regression (or mask a quality win): the
r1->r2 headline drop came from the path integrator gaining real MIS. This
harness renders each sampler/integrator combo fresh at several spp,
measures MSE against a converged reference render, and reports the wall
time each combo needs to reach a common error target — the comparison the
reference's Sobol sampler tier exists to make
(/root/reference/ThirdParty/pbrv4/samplers.h:144-327, stratified-vs-
independent demos Applications/RayTracingTests/SamplerTestApp.h:251-300).

The converged reference (mis + sobol_global at --ref-spp) is cached under
benchmarks/data/ so re-runs only pay for the sweep.

Usage: python benchmarks/equal_error.py [--res 128] [--ref-spp 4096]
       [--spps 16,64,256] [--out benchmarks/equal_error.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLERS = ("independent", "stratified", "sobol", "sobol_global")
INTEGRATORS = ("simple", "path")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--ref-spp", type=int, default=4096)
    ap.add_argument("--spps", type=str, default="16,64,256")
    ap.add_argument("--max-depth", type=int, default=4)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    spps = [int(s) for s in args.spps.split(",")]

    import numpy as np
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models import integrator as integ
    from __graft_entry__ import _cornell_setup

    res = args.res
    scene, camera, _ = _cornell_setup(res=res, spp=4)

    def make_cfg(kind, mode, spp):
        xs = int(round(math.sqrt(spp)))
        assert xs * xs == spp, f"spp {spp} must be square for stratified"
        return integ.RenderConfig(
            resolution=(res, res),
            sampler=integ.SamplerConfig(kind=kind, spp=spp, xs=xs, ys=xs),
            integrator=mode, max_depth=args.max_depth)

    def render(cfg, spp, chunk=32):
        """Returns (mean image (H,W,3) sensor-linear, pure render seconds)."""
        filter_obj = integ.make_filter(cfg)
        sensor = integ.make_sensor(cfg)
        chunk = min(chunk, spp)

        @jax.jit
        def chunk_pass(scene, sample_idx):
            return integ.render_passes(scene, camera, cfg, filter_obj,
                                       sensor, sample_idx, chunk)

        # untimed warm-up pass: compile must never pollute the wall-time
        # axis (VERDICT r4 weak #6: every first curve point carried the
        # compile — spp16 read 12.9 s where spp64 read 1.03 s on the same
        # config, corrupting time-to-target interpolation). The warm-up
        # uses a sentinel sample index: this runtime services a repeat of
        # an identical dispatch near-instantly, so warming on index 0
        # would make the first timed chunk read ~0.
        jax.block_until_ready(chunk_pass(scene, jnp.uint32(0x7FFFFFF0)))
        rgb_sum = wt_sum = None
        dt = float("inf")
        # Best-of-2 timed repeats: a single transient runtime hiccup (the
        # r4 artifact carried one 0.84 s point where its neighbours read
        # 0.14 s) must not corrupt the time-to-target interpolation. The
        # second repeat uses a disjoint sample-index range so the runtime's
        # identical-dispatch dedup (CLAUDE.md) cannot serve cached results;
        # the image is taken from the first repeat (sample indices 0..spp).
        for rep in range(2):
            base = rep * (1 << 20)
            t0 = time.perf_counter()
            rgb, wt = chunk_pass(scene, jnp.uint32(base))
            for i in range(1, spp // chunk):
                r, w = chunk_pass(scene, jnp.uint32(base + i * chunk))
                rgb = rgb + r
                wt = wt + w
            jax.block_until_ready(rgb)
            dt = min(dt, time.perf_counter() - t0)
            if rep == 0:
                rgb_sum, wt_sum = rgb, wt
        img = np.asarray(rgb_sum / jnp.maximum(wt_sum, 1e-9)[..., None])
        return img, dt

    # --- converged reference (cached)
    data_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data")
    os.makedirs(data_dir, exist_ok=True)
    ref_path = os.path.join(
        data_dir, f"equal_error_ref_{res}_{args.ref_spp}.npy")
    if os.path.exists(ref_path):
        ref = np.load(ref_path)
        print(f"loaded reference {ref_path}", file=sys.stderr)
    else:
        t0 = time.perf_counter()
        ref, _ = render(make_cfg("sobol_global", "path", args.ref_spp),
                        args.ref_spp, chunk=64)
        np.save(ref_path, ref)
        print(f"rendered reference in {time.perf_counter() - t0:.0f}s "
              f"-> {ref_path}", file=sys.stderr)

    def mse(img):
        return float(np.mean((img - ref) ** 2))

    records = []
    for kind in SAMPLERS:
        for mode in INTEGRATORS:
            curve = []
            for spp in spps:
                img, sec = render(make_cfg(kind, mode, spp), spp)
                curve.append({"spp": spp, "sec": round(sec, 2),
                              "mse": mse(img)})
                print(json.dumps({"sampler": kind, "integrator": mode,
                                  **curve[-1]}), flush=True)
            records.append({"sampler": kind, "integrator": mode,
                            "curve": curve})

    # --- equal-error summary: wall time to reach the target MSE (the MSE
    # the mis+sobol headline config reaches at the MIDDLE spp), log-log
    # interpolated along each combo's curve.
    target = next(r for r in records
                  if r["sampler"] == "sobol" and r["integrator"] == "path"
                  )["curve"][len(spps) // 2]["mse"]

    def time_to_target(curve):
        pts = [(c["sec"], c["mse"]) for c in curve]
        for (s0, m0), (s1, m1) in zip(pts, pts[1:]):
            if m0 >= target >= m1:
                f = ((math.log(m0) - math.log(target))
                     / max(math.log(m0) - math.log(m1), 1e-12))
                return s0 * (s1 / s0) ** f
        if pts[-1][1] > target:      # never reached: extrapolate MC 1/spp
            s1, m1 = pts[-1]
            return s1 * m1 / target
        return pts[0][0]             # already below at the first point

    summary = []
    for r in records:
        summary.append({"sampler": r["sampler"], "integrator": r["integrator"],
                        "sec_to_target_mse": round(time_to_target(r["curve"]),
                                                   2)})
    summary.sort(key=lambda s: s["sec_to_target_mse"])
    out = {"res": res, "ref_spp": args.ref_spp, "max_depth": args.max_depth,
           "device": str(jax.devices()[0]), "target_mse": target,
           "curves": records, "sec_to_target": summary}
    out_path = args.out or os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "equal_error.json")
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"target_mse": target, "ranking": summary}))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
