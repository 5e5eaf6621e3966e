"""The multi-sample wavefront (render_pass_block / spp_block) must produce
exactly the same accumulated image as the per-sample scan — sample values
are pure functions of (seed, pixel, sample, dim), so batching samples into
one wavefront cannot change them (determinism contract)."""

import jax.numpy as jnp
import pytest

from __graft_entry__ import _cornell_setup
from computational_ray_tracer_tpu.models import integrator as integ


@pytest.mark.parametrize("kind", ["independent", "sobol"])
def test_spp_block_matches_per_sample_scan(kind):
    scene, camera, cfg = _cornell_setup(res=16, spp=8)
    cfg = integ.RenderConfig(
        resolution=(16, 16),
        sampler=integ.SamplerConfig(kind=kind, spp=8),
        integrator="path", max_depth=3)
    f = integ.make_filter(cfg)
    s = integ.make_sensor(cfg)
    rgb1, wt1 = integ.render_passes(scene, camera, cfg, f, s,
                                    jnp.uint32(0), 4, spp_block=1)
    rgb4, wt4 = integ.render_passes(scene, camera, cfg, f, s,
                                    jnp.uint32(0), 4, spp_block=4)
    assert float(jnp.abs(wt1 - wt4).max()) < 1e-6
    assert float(jnp.abs(rgb1 - rgb4).max()) < 1e-4


def test_spp_block_must_divide_passes():
    scene, camera, cfg = _cornell_setup(res=8, spp=4)
    f = integ.make_filter(cfg)
    s = integ.make_sensor(cfg)
    with pytest.raises(AssertionError):
        integ.render_passes(scene, camera, cfg, f, s, jnp.uint32(0), 3,
                            spp_block=2)
