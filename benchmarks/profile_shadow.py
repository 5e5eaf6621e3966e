"""Packet-shape sweep on the REAL depth-0 NEE shadow wavefront of the
dragon-class mesh bench (the 2.0 s of the 2.72 s direct pass that
profile_mesh_pass.py attributed to 'NEE shadow (sorted anyhit)').

The wavefront mixes two direction families per pixel (u_sel coin flip):
the distant light's ONE fixed direction (perfectly coherent) and ambient
cosine-hemisphere samples (incoherent). The committed 2.48M rays/s anyhit
number (profile_octree_caps2.json) was distant-only; the mixed wavefront
through the blanket incoherent path (sort + ray_sub=1) runs at ~131k.
This sweep measures, on the exact mixed wavefront:

  - sorted (octant+Morton) x ray_sub in {1,2,4,8} x frustum on/off
  - light-kind SPLIT: distant rays as one coherent rs8 call + ambient
    rays as one narrow call (two kernels, no mixing)
  - the sort machinery cost alone (argsort + gather + scatter)

Usage: python benchmarks/profile_shadow.py  [env BENCH_MESH_RES=512
       BENCH_MESH_SUBDIV=7 BENCH_MESH_CAP=40 REPEATS=4]
Writes benchmarks/profile_shadow.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from computational_ray_tracer_tpu.models import integrator as integ
from computational_ray_tracer_tpu.models import lights as lgt
from computational_ray_tracer_tpu.models import scene as scn
from computational_ray_tracer_tpu.ops import camera as cam
from computational_ray_tracer_tpu.ops import pallas_octree as poct
from computational_ray_tracer_tpu.ops import spectrum as spec
from computational_ray_tracer_tpu.ops import rng

RES = int(os.environ.get("BENCH_MESH_RES", "512"))
REPEATS = int(os.environ.get("REPEATS", "4"))

records = []


def emit(rec):
    records.append(rec)
    print(json.dumps(rec), flush=True)


def timed(fn, *args):
    # convention: args = (o, d, t, ...). Each rep perturbs t by an
    # epsilon — this runtime services a repeat of an identical dispatch
    # near-instantly, which silently zeroes repeat-timings.
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    cdt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for r in range(REPEATS):
        av = (args[0], args[1],
              args[2] * (1.0 + 1e-7 * (r + 1))) + args[3:]
        out = fn(*av)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / REPEATS, cdt


def main():
    scene = bench._dragon_scene(int(os.environ.get("BENCH_MESH_SUBDIV", "7")),
                                int(os.environ.get("BENCH_MESH_CAP", "40")))
    camera = cam.PerspectiveCamera.create((0, 0.5, -3.4), (RES, RES),
                                          fov_y=40.0, look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(RES, RES),
        sampler=integ.SamplerConfig(kind="sobol", spp=4),
        integrator="direct", max_depth=1)
    n = RES * RES
    s = cfg.sampler

    # The exact depth-0 NEE shadow wavefront of li_direct, tile-swizzled
    # pixel order as in render_pass.
    @jax.jit
    def make_shadow(sc):
        pixel, _ = integ._swizzled_pixels(RES, RES)
        px = (pixel % RES).astype(jnp.float32) + 0.5
        py = (pixel // RES).astype(jnp.float32) + 0.5
        o, d = camera.generate_rays(jnp.stack([px, py], -1),
                                    jnp.full((n, 2), 0.5))
        t_max = jnp.full((n,), jnp.inf)
        hit = scn.scene_intersect_t(sc, o, d, t_max)
        si, mid = scn.scene_surface(sc, o, d, hit)
        u_lam = s.get_1d(pixel, jnp.uint32(0), integ.DIM_LAMBDA)
        wl = spec.sample_visible_wavelengths(u_lam)
        u_sel = s.get_1d(pixel, jnp.uint32(0), integ.DIM_BOUNCE0)
        u_pos = s.get_2d(pixel, jnp.uint32(0), integ.DIM_BOUNCE0 + 1)
        wi, dist, _, _, lkind = lgt.sample_light(
            sc.lights, si.p, si.n, wl.lam, u_sel, u_pos, sc.world_radius())
        eps = integ.spawn_eps(si, cfg)
        sgn = jnp.sign(jnp.sum(wi * si.n, axis=-1))
        so = si.p + si.n * (sgn * eps)[..., None]
        st = jnp.where(si.valid, dist * (1.0 - 1e-3) - eps, -1.0)
        return so, wi, st, lkind, si.valid

    so, sd, st, lkind, valid = jax.block_until_ready(make_shadow(scene))
    alive = np.asarray(st > 0)
    kinds = np.asarray(lkind)
    emit({"n_rays": n, "alive": int(alive.sum()),
          "frac_distant": round(float((kinds == lgt.DISTANT)[alive].mean()), 3),
          "chunk": poct.CHUNK, "dma_slots": poct.DMA_SLOTS,
          "pend_size": poct.PEND_SIZE,
          "leaf_verts_mb": round(
              int(scene.packed_octree.leaf_verts.size) * 4 / 2**20),
          "device": str(jax.devices()[0])})

    packed = scene.packed_octree

    # sort cost alone
    @jax.jit
    def sort_only(o, d, t):
        order = scn._packet_order(o, d, t > 0.0)
        h = jnp.zeros(t.shape, bool)
        return jnp.zeros_like(h).at[order].set(h[order])

    _, dt, cdt = timed(sort_only, so, sd, st)
    emit({"variant": "sort_machinery_only", "sec": round(dt, 4),
          "compile_sec": round(cdt, 1)})

    # sorted x (ray_sub, frustum). SHADOW_QUICK=1 trims to the narrow
    # shapes (for kernel-knob sweeps: CRT_DMA_SLOTS / CRT_CHUNK /
    # CRT_PEND_SIZE are read at pallas_octree import time).
    shapes = [(1, False), (2, False), (4, False), (8, False),
              (8, True), (4, True)]
    if os.environ.get("SHADOW_QUICK", "0") == "1":
        shapes = [(1, False), (2, False)]
    for rs, fr in shapes:
        fn = jax.jit(lambda o, d, t, pk, rs=rs, fr=fr:
                     _sorted_anyhit(o, d, t, pk, rs, fr))
        try:
            out, dt, cdt = timed(fn, so, sd, st, packed)
        except Exception as e:
            emit({"variant": f"sorted_rs{rs}_f{int(fr)}",
                  "error": repr(e)[:160]})
            continue
        occ, pops, tests = out
        emit({"variant": f"sorted_rs{rs}_f{int(fr)}",
              "rays_per_sec": round(n / dt, 1),
              "sec_per_wavefront": round(dt, 4),
              "occluded_frac": round(float(np.asarray(occ).mean()), 4),
              "node_pops_per_packet": round(float(
                  np.asarray(pops).reshape(-1, rs * 128)[:, 0].mean()), 1),
              "tri_tests_per_packet": round(float(
                  np.asarray(tests).reshape(-1, rs * 128)[:, 0].mean()), 1),
              "compile_sec": round(cdt, 1)})

    # light-kind split: distant (coherent rs8+frustum) + rest (narrow).
    # The sort key already separates them (distant = one octant), so this
    # measures whether EXPLICIT splitting beats octant-sorted mixing.
    splits = [(1, False), (4, False), (8, False)]
    if os.environ.get("SHADOW_QUICK", "0") == "1":
        splits = []
    for rs_amb, fr_amb in splits:
        fn = jax.jit(lambda o, d, t, lk, pk, rs=rs_amb, fr=fr_amb:
                     _split_anyhit(o, d, t, lk, pk, rs, fr))
        try:
            out, dt, cdt = timed(fn, so, sd, st, lkind, packed)
        except Exception as e:
            emit({"variant": f"split_amb_rs{rs_amb}_f{int(fr_amb)}",
                  "error": repr(e)[:160]})
            continue
        emit({"variant": f"split_amb_rs{rs_amb}_f{int(fr_amb)}",
              "rays_per_sec": round(n / dt, 1),
              "sec_per_wavefront": round(dt, 4),
              "occluded_frac": round(float(np.asarray(out).mean()), 4),
              "compile_sec": round(cdt, 1)})

    out_path = os.environ.get("SHADOW_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "profile_shadow.json")
    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


def _sorted_anyhit(o, d, t, pk, rs, fr):
    order = scn._packet_order(o, d, t > 0.0)
    tt, tri, _, _, tests, stats = poct.octree_intersect_pallas(
        o[order], d[order], t[order], pk, anyhit=True, ray_sub=rs,
        frustum=fr, return_stats=True)
    h = tri >= 0
    occ = jnp.zeros_like(h).at[order].set(h)
    return occ, stats["node_pops"], tests


def _split_anyhit(o, d, t, lkind, pk, rs_amb, fr_amb):
    # distant rays dead for the ambient call and vice versa (t_max<=0 rays
    # are born done in the anyhit kernel, costing only their packet slots);
    # each family is sorted so families are contiguous, not interleaved.
    is_dist = lkind == lgt.DISTANT
    t_dist = jnp.where(is_dist, t, -1.0)
    t_amb = jnp.where(is_dist, -1.0, t)
    o1 = scn._packet_order(o, d, t_dist > 0.0)
    h1 = poct.octree_anyhit_pallas(o[o1], d[o1], t_dist[o1], pk,
                                   ray_sub=8, frustum=True)
    o2 = scn._packet_order(o, d, t_amb > 0.0)
    h2 = poct.octree_anyhit_pallas(o[o2], d[o2], t_amb[o2], pk,
                                   ray_sub=rs_amb, frustum=fr_amb)
    occ = jnp.zeros_like(h1).at[o1].set(h1) | \
        jnp.zeros_like(h2).at[o2].set(h2)
    return occ


if __name__ == "__main__":
    main()
