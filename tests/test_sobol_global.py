"""Global Sobol' sampler (SobolIntervalToIndex capability,
samplers.h:144-327): pixel-mapping correctness + convergence advantage."""

import numpy as np
import jax.numpy as jnp
import pytest

from computational_ray_tracer_tpu.ops import rng


def _host_sobol(index, dim):
    v = np.uint32(0)
    k = 0
    while index:
        if index & 1:
            v ^= rng.SOBOL_MATRICES[dim, k]
        index >>= 1
        k += 1
    return int(v)


@pytest.mark.parametrize("m", [1, 2, 3])
def test_interval_to_index_lands_in_pixel(m):
    # For every pixel of the 2^m grid and the first frames, the mapped
    # global index's dims 0/1 must land inside that pixel.
    res = 1 << m
    px, py = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    px = jnp.asarray(px.ravel(), jnp.uint32)
    py = jnp.asarray(py.ravel(), jnp.uint32)
    for frame in (0, 1, 2, 5, 9):
        idx = np.asarray(rng.sobol_global_index(px, py, jnp.uint32(frame), m))
        for i, ix in enumerate(idx):
            x0 = _host_sobol(int(ix), 0) >> (32 - m)
            x1 = _host_sobol(int(ix), 1) >> (32 - m)
            assert x0 == int(px[i]), (m, frame, i)
            assert x1 == int(py[i]), (m, frame, i)


def test_interval_to_index_is_partition():
    # Frame f's indices over all pixels are exactly f*4^m .. (f+1)*4^m - 1:
    # the image partitions the global sequence (one point per pixel per
    # frame) — the defining property of the reference's SobolSampler.
    m = 3
    res = 1 << m
    px, py = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    px = jnp.asarray(px.ravel(), jnp.uint32)
    py = jnp.asarray(py.ravel(), jnp.uint32)
    for frame in (0, 3):
        idx = np.sort(np.asarray(
            rng.sobol_global_index(px, py, jnp.uint32(frame), m)))
        lo = frame << (2 * m)
        np.testing.assert_array_equal(idx, np.arange(lo, lo + res * res))


def test_global_beats_padded_on_image_integral():
    # Image-average of a smooth 4D integrand (pixel position x one extra
    # 2D dim): the globally stratified sequence must beat the padded
    # per-pixel tier at low spp (the done-criterion for this sampler).
    m = 4
    res = 1 << m
    pixel = jnp.arange(res * res, dtype=jnp.uint32)
    px = pixel % res
    py = pixel // res

    def integrand(xy, uv):
        # smooth, non-separable-ish; analytic mean over [0,1]^4:
        # E[x y] = 1/4, E[sin(pi u) sin(pi v)] = (2/pi)^2
        return (xy[..., 0] * xy[..., 1]
                + jnp.sin(np.pi * uv[..., 0]) * jnp.sin(np.pi * uv[..., 1]))

    analytic = 0.25 + (2.0 / np.pi) ** 2

    def estimate(kind, spp, seed):
        total = 0.0
        for s_idx in range(spp):
            si = jnp.uint32(s_idx)
            if kind == "global":
                fxy = rng.sobol_global_pixel2d(seed, px, py, si, m)
                xy = (jnp.stack([px, py], axis=-1).astype(jnp.float32)
                      + fxy) / res
                uv = rng.sobol_global_2d(seed, px, py, si, 3, m)
            else:
                u = rng.sobol_owen_2d(seed, pixel, si, 1, spp=spp)
                xy = (jnp.stack([px, py], axis=-1).astype(jnp.float32)
                      + u) / res
                uv = rng.sobol_owen_2d(seed, pixel, si, 3, spp=spp)
            total = total + jnp.mean(integrand(xy, uv))
        return float(total) / spp

    for spp in (4, 16):
        err_g = np.mean([abs(estimate("global", spp, s) - analytic)
                         for s in range(8)])
        err_p = np.mean([abs(estimate("padded", spp, s) - analytic)
                         for s in range(8)])
        assert err_g < err_p, (spp, err_g, err_p)


def test_sobol_global_render_smoke():
    # End-to-end: the sampler tier plugs into the render pipeline.
    from computational_ray_tracer_tpu.models.scene import Scene
    from computational_ray_tracer_tpu.models import integrator as integ
    from computational_ray_tracer_tpu.ops import camera as cam

    scene = Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (0.7, 0.4, 0.3)}],
        lights=[{"kind": "point", "position": (2.0, 3.0, -2.0),
                 "spd_named": "stdillum-D65", "scale": 15.0}],
        spheres=[{"radius": 1.0, "material": 0}])
    camera = cam.PerspectiveCamera.create((0, 0, -4), (16, 16), fov_y=40.0,
                                          look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(16, 16),
        sampler=integ.SamplerConfig(kind="sobol_global", spp=4),
        integrator="path", max_depth=3)
    assert cfg.sampler.width == 16 and cfg.sampler.m == 4
    film, sensor = integ.render(scene, camera, cfg)
    img = np.asarray(film.resolve(sensor, to_srgb=False, clip=False))
    assert np.isfinite(img).all()
    assert img.mean() > 0.001
