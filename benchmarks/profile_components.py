"""Stage-level timing of the render hot path on the current device.

Times each stage of one spp pass (Cornell 256^2, the bench workload) in
isolation, each under its own jit with a lax.scan repeat to amortize
dispatch — so the numbers are device-compute times, not launch overhead.

Usage: python benchmarks/profile_components.py   (env BENCH_RES, REPEATS)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from computational_ray_tracer_tpu.models import integrator as integ
from computational_ray_tracer_tpu.models import materials as mat
from computational_ray_tracer_tpu.models import lights as lgt
from computational_ray_tracer_tpu.models.scene import (scene_intersect,
                                                       scene_occluded)
from computational_ray_tracer_tpu.ops import spectrum as spec
from computational_ray_tracer_tpu.ops import rng
from __graft_entry__ import _cornell_setup  # noqa: E402

RES = int(os.environ.get("BENCH_RES", "256"))
REPEATS = int(os.environ.get("REPEATS", "16"))


def timeit(name, fn, *args):
    """fn(*args, k) runs once per scan step; returns device time per call."""
    @jax.jit
    def run(args):
        def body(c, k):
            out = fn(*args, k)
            # fold output into carry so the scan can't be elided
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))
            return c + s, None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(REPEATS, dtype=jnp.uint32))
        return tot
    out = run(args)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = run(args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / REPEATS
    print(f"{name:34s} {dt*1e3:9.3f} ms/call")
    return dt


def main():
    scene, camera, cfg = _cornell_setup(res=RES, spp=1024)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)
    n = RES * RES
    pixel = jnp.arange(n, dtype=jnp.uint32)
    s = cfg.sampler

    # representative ray batch (camera rays)
    px = (pixel % RES).astype(jnp.float32) + 0.5
    py = (pixel // RES).astype(jnp.float32) + 0.5
    o, d = camera.generate_rays(jnp.stack([px, py], -1),
                                jnp.full((n, 2), 0.5))
    o = jax.device_put(o)
    d = jax.device_put(d)
    t_max = jnp.full((n,), jnp.inf)
    wl = spec.sample_visible_wavelengths(rng.independent_1d(0, pixel, 0, 0))
    lam = wl.lam

    print(f"device={jax.devices()[0]}, rays={n}")

    timeit("full render_pass (1 spp)",
           lambda sc, k: integ.render_pass(sc, camera, cfg, filter_obj,
                                           sensor, k), scene)

    timeit("scene_intersect",
           lambda sc, oo, dd, k: scene_intersect(
               sc, oo + 0.0 * k.astype(jnp.float32), dd, t_max)[0].t,
           scene, o, d)

    timeit("scene_occluded",
           lambda sc, oo, dd, k: scene_occluded(
               sc, oo + 0.0 * k.astype(jnp.float32), dd,
               jnp.full((n,), 2.0)), scene, o, d)

    si, mid, _ = jax.jit(lambda sc: scene_intersect(sc, o, d, t_max))(scene)

    def shade(sc, k):
        mrow = mat.MaterialView.create(sc.materials, mid)
        u_sel = s.get_1d(pixel, k, 7)
        u_pos = s.get_2d(pixel, k, 8)
        wi, dist, li_val, pdf, _ = lgt.sample_light(
            sc.lights, si.p, si.n, lam, u_sel, u_pos, 100.0)
        f, _ = mat.bsdf_eval(mrow, si.n, si.wo, wi, lam, None)
        return f * li_val * (1.0 / jnp.maximum(pdf, 1e-9))[..., None]
    timeit("NEE shade (no shadow ray)", shade, scene)

    def bsdf_s(sc, k):
        mrow = mat.MaterialView.create(sc.materials, mid)
        u2 = s.get_2d(pixel, k, 5)
        u1 = s.get_1d(pixel, k, 6)
        return mat.bsdf_sample(mrow, si.n, si.wo, u2, u1, lam)[1]
    timeit("bsdf_sample", bsdf_s, scene)

    def draws(sc, k):
        acc = s.get_1d(pixel, k, 0)
        for dep in range(4):
            d0 = 5 + dep * 8
            acc = acc + s.get_2d(pixel, k, d0)[..., 0]
            acc = acc + s.get_1d(pixel, k, d0 + 2)
            acc = acc + s.get_1d(pixel, k, d0 + 3)
            acc = acc + s.get_2d(pixel, k, d0 + 4)[..., 0]
            acc = acc + s.get_1d(pixel, k, d0 + 6)
        return acc
    timeit("sampler draws (all path dims)", draws, scene)

    def lam_sample(sc, k):
        u = rng.independent_1d(0, pixel, k, 0)
        wl_ = spec.sample_visible_wavelengths(u)
        return wl_.lam
    timeit("wavelength sample", lam_sample, scene)

    def sensor_resolve(sc, k):
        L = jnp.ones((n, 8)) * k.astype(jnp.float32)
        return sensor.to_sensor_rgb(L, wl)
    timeit("sensor to_sensor_rgb", sensor_resolve, scene)

    def camera_rays(sc, k):
        u_filt = s.get_2d(pixel, k, 1)
        fp, fw = filter_obj.sample(u_filt)
        pp = jnp.stack([px, py], -1) + fp
        u_lens = s.get_2d(pixel, k, 3)
        return camera.generate_rays(pp, u_lens)[1]
    timeit("camera ray gen + filter", camera_rays, scene)


if __name__ == "__main__":
    main()
