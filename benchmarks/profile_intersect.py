"""Sub-stage attribution of scene_intersect on the Cornell headline scene:
the component profile shows 8.6 ms/call for 12 triangles + 1 sphere over
65k rays — ~100x above any compute bound. Times each phase alone.

Usage: python benchmarks/profile_intersect.py   (env BENCH_RES, REPEATS)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from computational_ray_tracer_tpu.models import scene as scn
from computational_ray_tracer_tpu.models import materials as mat
from computational_ray_tracer_tpu.ops import shapes as shp
from computational_ray_tracer_tpu.ops import triangle as trimod
from computational_ray_tracer_tpu.ops import spectrum as spec
from computational_ray_tracer_tpu.ops import rng
from __graft_entry__ import _cornell_setup  # noqa: E402

RES = int(os.environ.get("BENCH_RES", "256"))
REPEATS = int(os.environ.get("REPEATS", "16"))


def timeit(name, fn, *args):
    @jax.jit
    def run(args):
        def body(c, k):
            out = fn(*args, k)
            s = sum(jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree_util.tree_leaves(out))
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
    print(f"{name:38s} {dt*1e3:9.3f} ms/call", flush=True)
    return dt


def main():
    scene, camera, cfg = _cornell_setup(res=RES, spp=1024)
    n = RES * RES
    pixel = jnp.arange(n, dtype=jnp.uint32)
    px = (pixel % RES).astype(jnp.float32) + 0.5
    py = (pixel // RES).astype(jnp.float32) + 0.5
    o, d = camera.generate_rays(jnp.stack([px, py], -1),
                                jnp.full((n, 2), 0.5))
    t_max = jnp.full((n,), jnp.inf)
    print(f"device={jax.devices()[0]}, rays={n}")

    def jitter(oo, k):
        return oo + 0.0 * k.astype(jnp.float32)

    timeit("scene_intersect (full)",
           lambda sc, oo, k: scn.scene_intersect(sc, jitter(oo, k), d,
                                                 t_max)[0].t, scene, o)
    timeit("scene_intersect_t (dists only)",
           lambda sc, oo, k: scn.scene_intersect_t(sc, jitter(oo, k), d,
                                                   t_max)[0], scene, o)
    hit = jax.jit(lambda sc: scn.scene_intersect_t(sc, o, d, t_max))(scene)
    timeit("scene_surface (winners only)",
           lambda sc, k: scn.scene_surface(
               sc, o + 0.0 * k.astype(jnp.float32), d, hit)[0].t, scene)
    timeit("mesh_intersect_brute (12 tris)",
           lambda sc, oo, k: trimod.mesh_intersect_brute(
               sc, jitter(oo, k), d, t_max, scene.mesh, scene.tri_mask)[0]
           if False else trimod.mesh_intersect_brute(
               jitter(oo, k), d, t_max, scene.mesh, scene.tri_mask)[0],
           scene, o)
    timeit("sphere_intersect_t (1 sphere)",
           lambda sc, oo, k: shp.sphere_intersect_t(
               jitter(oo, k), d, t_max, sc.spheres), scene, o)
    si, mid = jax.jit(lambda sc: scn.scene_surface(sc, o, d, hit))(scene)
    wl = spec.sample_visible_wavelengths(rng.independent_1d(0, pixel, 0, 0))

    def mspec(sc, k):
        mrow = mat.MaterialView.create(sc.materials, mid)
        return mat.material_spectra(mrow, wl.lam + 0.0 * k.astype(
            jnp.float32))
    timeit("material_spectra (emit+eta+k)", mspec, scene)

    def mview(sc, k):
        mrow = mat.MaterialView.create(sc.materials,
                                       mid + (0 * k).astype(jnp.int32))
        return mrow.albedo_coeffs
    timeit("MaterialView.create (gathers)", mview, scene)


if __name__ == "__main__":
    main()
