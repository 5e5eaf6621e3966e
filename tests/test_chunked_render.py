"""Chunked (multi-spp per launch) rendering must equal pass-by-pass."""

import numpy as np
import jax.numpy as jnp

from computational_ray_tracer_tpu.models.scene import Scene
from computational_ray_tracer_tpu.models import integrator as integ
from computational_ray_tracer_tpu.ops import camera as cam
from computational_ray_tracer_tpu.ops import shapes as shp


def _simple_scene():
    return Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (0.6, 0.4, 0.3)}],
        lights=[{"kind": "point", "position": (2.0, 3.0, -2.0),
                 "rgb": (1.0, 1.0, 1.0), "scale": 30.0}],
        spheres=[{"radius": 1.0, "transform": shp.make_transform((0, 0, 0)),
                  "material": 0}])


def test_chunked_equals_sequential():
    scene = _simple_scene()
    camera = cam.PerspectiveCamera.create((0, 0, -4), (24, 24), fov_y=40.0,
                                          look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(24, 24),
        sampler=integ.SamplerConfig(kind="sobol", spp=8),
        integrator="path", max_depth=3)

    film_seq, sensor = integ.render(scene, camera, cfg, chunk=1)
    film_chk, _ = integ.render(scene, camera, cfg, chunk=4)
    np.testing.assert_allclose(np.asarray(film_chk.rgb_sum),
                               np.asarray(film_seq.rgb_sum),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(film_chk.weight_sum),
                               np.asarray(film_seq.weight_sum),
                               rtol=1e-5, atol=1e-6)
    assert int(film_chk.spp_done) == int(film_seq.spp_done) == 8


def test_chunk_not_dividing_spp():
    scene = _simple_scene()
    camera = cam.PerspectiveCamera.create((0, 0, -4), (16, 16), fov_y=40.0,
                                          look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(16, 16),
        sampler=integ.SamplerConfig(kind="independent", spp=5),
        integrator="direct", max_depth=1)
    film_seq, _ = integ.render(scene, camera, cfg, chunk=1)
    film_chk, _ = integ.render(scene, camera, cfg, chunk=3)   # 3 + 2
    np.testing.assert_allclose(np.asarray(film_chk.rgb_sum),
                               np.asarray(film_seq.rgb_sum),
                               rtol=1e-5, atol=1e-6)
    assert int(film_chk.spp_done) == 5
