"""Differentiable rendering tests: gradient allclose vs finite differences
(the BASELINE.md north-star metric) and inverse-recovery descent
(BASELINE config 5)."""

import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from computational_ray_tracer_tpu.models.scene import Scene
from computational_ray_tracer_tpu.models import integrator as integ
from computational_ray_tracer_tpu.models import inverse as inv
from computational_ray_tracer_tpu.ops import camera as cam


def small_scene(albedo=(0.6, 0.4, 0.3)):
    return Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": albedo}],
        lights=[{"kind": "point", "position": (2.0, 3.0, -2.0),
                 "spd_named": "stdillum-D65", "scale": 20.0}],
        spheres=[{"radius": 1.0, "material": 0}],
    )


def small_camera(res=8):
    return cam.PerspectiveCamera.create((0, 0, -4), (res, res), fov_y=40.0,
                                        look_at=(0, 0, 0))


def small_cfg(res=8, spp=2, integrator="direct"):
    return integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="independent", spp=spp),
        integrator=integrator, max_depth=3)


def test_gradient_matches_finite_differences_albedo():
    # North-star metric: AD pixel gradients == FD gradients (allclose).
    scene = small_scene()
    camera = small_camera(8)
    cfg = small_cfg(8, 2)
    extract, insert = inv.albedo_params(scene)
    render_image, _ = inv.make_render_fn(camera, cfg)

    def scalar_loss(params):
        img = render_image(insert(scene, params))
        return jnp.sum(img ** 2) * 10.0

    params = extract(scene)
    g_ad = jax.grad(scalar_loss)(params)
    g_fd = inv.finite_difference_grad(jax.jit(scalar_loss), params, eps=2e-3)
    ad = np.asarray(g_ad["albedo_coeffs"])
    fd = np.asarray(g_fd["albedo_coeffs"])
    assert np.abs(ad).max() > 1e-4  # non-trivial gradient
    np.testing.assert_allclose(ad, fd, rtol=0.05, atol=2e-3)


def test_gradient_matches_fd_light_scale():
    scene = small_scene()
    camera = small_camera(8)
    cfg = small_cfg(8, 2)
    render_image, _ = inv.make_render_fn(camera, cfg)

    def scalar_loss_of_scale(scale):
        s = dc.replace(scene, lights=dc.replace(scene.lights, scale=scale))
        return jnp.sum(render_image(s) ** 2) * 10.0

    scale0 = scene.lights.scale
    g_ad = jax.grad(scalar_loss_of_scale)(scale0)
    eps = 1e-3
    f = jax.jit(scalar_loss_of_scale)
    g_fd = (float(f(scale0 + eps)) - float(f(scale0 - eps))) / (2 * eps)
    assert float(g_ad[0]) == pytest.approx(g_fd, rel=0.03)


def test_gradient_through_path_integrator():
    # Gradients flow through multi-bounce paths too (NEE throughput chain).
    scene = small_scene()
    camera = small_camera(6)
    cfg = small_cfg(6, 1, integrator="path")
    extract, insert = inv.albedo_params(scene)
    render_image, _ = inv.make_render_fn(camera, cfg)

    def scalar_loss(params):
        return jnp.sum(render_image(insert(scene, params)))

    g = jax.grad(scalar_loss)(extract(scene))
    ga = np.asarray(g["albedo_coeffs"])
    assert np.isfinite(ga).all()
    assert np.abs(ga).max() > 1e-5


def test_inverse_recovery_albedo():
    # Recover a sphere albedo from a target image by gradient descent
    # (BASELINE config 5, small).
    target_scene = small_scene(albedo=(0.2, 0.7, 0.4))
    camera = small_camera(12)
    cfg = small_cfg(12, 2)
    render_image, _ = inv.make_render_fn(camera, cfg)
    target = render_image(target_scene)

    start_scene = small_scene(albedo=(0.5, 0.5, 0.5))
    ei = inv.albedo_params(start_scene)
    _, params, history = inv.optimize(start_scene, camera, cfg, ei, target,
                                      steps=150, lr=0.2)
    assert history[-1] < history[0] * 0.15  # ≥85% loss reduction
    # recovered coefficients produce (nearly) the target image
    final = render_image(ei[1](start_scene, params))
    np.testing.assert_allclose(np.asarray(final), np.asarray(target),
                               atol=0.02)
