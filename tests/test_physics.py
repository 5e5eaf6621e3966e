"""Physics correctness: dielectric refraction (Snell, focal point),
multi-bounce furnace energy conservation, and MIS variance reduction
(the Integrator.h "Path" intent + Shading.h:12-16 Fresnel capability)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from computational_ray_tracer_tpu.models.scene import Scene, scene_intersect
from computational_ray_tracer_tpu.models import materials as mat
from computational_ray_tracer_tpu.models import integrator as integ
from computational_ray_tracer_tpu.ops import camera as cam
from computational_ray_tracer_tpu.ops import shapes as shp
from computational_ray_tracer_tpu.ops import triangle as trimod
from computational_ray_tracer_tpu.utils import mesh_gen


def _step_through(scene, o, d, n_interfaces, u1=0.999):
    """Manually trace a ray through ``n_interfaces`` dielectric interfaces,
    forcing refraction (u1 ~ 1 -> reflect only on TIR). Returns the list of
    (hit_point, direction_after) pairs."""
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    lam = jnp.full((1, 8), 550.0)
    out = []
    for _ in range(n_interfaces):
        si, mid, _ = scene_intersect(scene, o, d,
                                     jnp.full((1,), jnp.inf))
        assert bool(si.valid[0]), "expected an interface hit"
        mrow = mat.MaterialView.create(scene.materials, mid)
        wi, w, pdf, is_spec, term = mat.bsdf_sample(
            mrow, si.n, si.wo, jnp.full((1, 2), 0.5), jnp.full((1,), u1),
            lam, backface=si.backface)
        out.append((np.asarray(si.p[0]), np.asarray(wi[0])))
        o = si.p + wi * 1e-4
        d = wi
    return out


def glass_slab_scene(eta=1.5):
    pos, idx, uv = mesh_gen.box((-2.0, -0.5, -2.0), (2.0, 0.5, 2.0))
    mesh = trimod.MeshData.build(pos, idx, uvs=uv)
    return Scene.build(
        materials=[{"kind": "dielectric", "albedo_rgb": (1, 1, 1),
                    "eta": eta}],
        lights=[{"kind": "ambient", "spd_named": "stdillum-E"}],
        mesh=(mesh, jnp.zeros((mesh.n_triangles,), jnp.int32)),
        use_octree=False)


def test_dielectric_slab_snell():
    # 30 deg incidence on a flat eta=1.5 slab: inside direction follows
    # Snell (sin_t = sin_i / eta); the exit ray is parallel to the entry ray
    # (requires the EXIT refraction to use 1/eta — the in/out tracking).
    scene = glass_slab_scene()
    d_in = np.asarray([0.5, -math.sqrt(3) / 2, 0.0])
    steps = _step_through(scene, (-1.0, 2.0, 0.0), d_in, 2)

    (_, d_inside), (_, d_exit) = steps
    sin_t = 1.0 / (2.0 * 1.5)
    expect_inside = np.asarray([sin_t, -math.sqrt(1 - sin_t ** 2), 0.0])
    np.testing.assert_allclose(d_inside, expect_inside, atol=2e-3)
    np.testing.assert_allclose(d_exit, d_in, atol=2e-3)


def test_dielectric_ball_lens_focal_point():
    # Paraxial ray through a glass ball (radius R, eta n) crosses the axis
    # at the back focal distance f = n R / (2 (n - 1)) from the center
    # (= 1.5 for R=1, n=1.5). Wrong exit-eta puts the crossing elsewhere.
    eta = 1.5
    scene = Scene.build(
        materials=[{"kind": "dielectric", "albedo_rgb": (1, 1, 1),
                    "eta": eta}],
        lights=[{"kind": "ambient", "spd_named": "stdillum-E"}],
        spheres=[{"radius": 1.0, "material": 0}])
    h = 0.05
    steps = _step_through(scene, (h, 0.0, -3.0), (0.0, 0.0, 1.0), 2)
    (p_exit, d_exit) = steps[1]
    assert d_exit[2] > 0.9          # still travelling forward
    # axis crossing: x(t) = p_exit.x + t d_exit.x = 0
    t_cross = -p_exit[0] / d_exit[0]
    z_cross = p_exit[2] + t_cross * d_exit[2]
    f_expect = eta * 1.0 / (2.0 * (eta - 1.0))
    np.testing.assert_allclose(z_cross, f_expect, rtol=0.02)


def test_furnace_multibounce():
    # Albedo-1 sphere in a uniform environment, random-walk integrator:
    # every path's throughput stays exactly 1 until it escapes into the
    # environment, so EVERY pixel (sphere or background) must equal the
    # environment radiance — a zero-variance test of throughput accounting.
    scene = Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (1.0, 1.0, 1.0)}],
        lights=[{"kind": "ambient", "spd_named": "stdillum-E",
                 "scale": 0.5}],
        spheres=[{"radius": 1.0, "material": 0}])
    camera = cam.PerspectiveCamera.create((0, 0, -4), (16, 16), fov_y=40.0,
                                          look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(16, 16),
        sampler=integ.SamplerConfig(kind="sobol", spp=64),
        integrator="walk", max_depth=8, rr_start=8)
    film, sensor = integ.render(scene, camera, cfg)
    img = np.asarray(film.resolve(sensor, to_srgb=False, clip=False))

    from computational_ray_tracer_tpu.ops import spectrum as spec
    from computational_ray_tracer_tpu.ops import color as c
    wl = spec.sample_visible_wavelengths(jnp.linspace(0.001, 0.999, 256))
    L = jnp.full_like(wl.lam, 0.5)
    rgb = jnp.mean(sensor.to_sensor_rgb(L, wl), axis=0)
    expect = np.asarray(c.SRGB.to_rgb(sensor.sensor_rgb_to_xyz(rgb)))
    # background pixel (pure env) and sphere center (multi-bounce)
    np.testing.assert_allclose(img[1, 1], expect, rtol=0.02)
    np.testing.assert_allclose(img[8, 8], expect, rtol=0.02)
    # whole image: albedo-1 furnace is constant
    np.testing.assert_allclose(img, np.broadcast_to(expect, img.shape),
                               rtol=0.04)


def test_furnace_path_mis_matches():
    # The MIS path integrator must agree with the analytic furnace too
    # (NEE + BSDF env contributions weighted, not double counted).
    scene = Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (1.0, 1.0, 1.0)}],
        lights=[{"kind": "ambient", "spd_named": "stdillum-E",
                 "scale": 0.5}],
        spheres=[{"radius": 1.0, "material": 0}])
    camera = cam.PerspectiveCamera.create((0, 0, -4), (12, 12), fov_y=40.0,
                                          look_at=(0, 0, 0))
    imgs = {}
    for kind in ("path", "simple"):
        cfg = integ.RenderConfig(
            resolution=(12, 12),
            sampler=integ.SamplerConfig(kind="sobol", spp=64),
            integrator=kind, max_depth=5, rr_start=5)
        film, sensor = integ.render(scene, camera, cfg)
        imgs[kind] = np.asarray(film.resolve(sensor, to_srgb=False,
                                             clip=False))
    # both unbiased estimators of the same constant-radiance furnace
    np.testing.assert_allclose(imgs["path"].mean(), imgs["simple"].mean(),
                               rtol=0.03)
    # the furnace value itself (sphere center)
    np.testing.assert_allclose(imgs["path"][6, 6], imgs["simple"][6, 6],
                               rtol=0.05)


def _mis_test_scene():
    """Rough-conductor floor + small emissive quad light: the classic
    Veach MIS setup. The light quad exists both as geometry (emissive mesh,
    BSDF-hittable) and as an NEE area light."""
    lc = np.asarray([-0.3, 1.8, -0.3], np.float32)
    le1 = np.asarray([0.6, 0.0, 0.0], np.float32)
    le2 = np.asarray([0.0, 0.0, 0.6], np.float32)
    # winding normal cross(le1, le2) = x cross z = -y (emits down),
    # matching the light table — emission is one-sided since r4
    pos, idx, uv = mesh_gen.quad(lc, le1, le2)
    mesh = trimod.MeshData.build(pos, idx, uvs=uv)
    return Scene.build(
        materials=[{"kind": "rough_conductor", "albedo_rgb": (1, 1, 1),
                    "metal": "metal-Ag", "roughness": 0.15},
                   {"kind": "diffuse", "albedo_rgb": (0, 0, 0),
                    "emission_rgb": (1.0, 1.0, 1.0), "emission_scale": 30.0}],
        lights=[{"kind": "quad", "corner": tuple(lc), "edge1": tuple(le1),
                 "edge2": tuple(le2), "rgb": (1.0, 1.0, 1.0),
                 "scale": 30.0}],
        disks=[{"radius": 4.0, "material": 0,
                "transform": shp.make_transform((0, 0, 0), (-90, 0, 0))}],
        mesh=(mesh, jnp.ones((mesh.n_triangles,), jnp.int32)),
        use_octree=False)


def _render_seeds(scene, camera, kind, spp, seeds, res):
    imgs = []
    for seed in seeds:
        cfg = integ.RenderConfig(
            resolution=(res, res),
            sampler=integ.SamplerConfig(kind="independent", spp=spp,
                                        seed=seed),
            integrator=kind, max_depth=3, rr_start=3)
        film, sensor = integ.render(scene, camera, cfg, chunk=spp)
        imgs.append(np.asarray(film.resolve(sensor, to_srgb=False,
                                            clip=False)))
    return np.stack(imgs)


def test_mis_reduces_variance():
    # On the glossy floor the light's reflection is where light-sampling
    # (simple) and BSDF-sampling (walk) each fail in part; MIS (path) must
    # beat both on variance at equal spp — the done-criterion of the MIS
    # milestone.
    scene = _mis_test_scene()
    res = 20
    camera = cam.PerspectiveCamera.create((0, 1.2, -3.5), (res, res),
                                          fov_y=40.0, look_at=(0, 0.3, 0))
    seeds = list(range(6))
    var = {}
    mean = {}
    for kind in ("path", "simple", "walk"):
        imgs = _render_seeds(scene, camera, kind, spp=8, seeds=seeds,
                             res=res)
        # variance over independent runs, averaged over pixels; restrict to
        # the floor region (bottom half) where the glossy highlight lives
        region = imgs[:, res // 2:, :, :]
        var[kind] = float(region.var(axis=0).mean())
        mean[kind] = float(region.mean())
    # all three are unbiased: means agree loosely
    assert mean["path"] == pytest.approx(mean["simple"], rel=0.3)
    # MIS strictly improves on both single strategies
    assert var["path"] < var["simple"]
    assert var["path"] < var["walk"]


def test_backface_flag_sphere():
    # Entering ray: front face. From inside the sphere: back face.
    scene = Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (0.5, 0.5, 0.5)}],
        lights=[{"kind": "ambient", "spd_named": "stdillum-E"}],
        spheres=[{"radius": 1.0, "material": 0}])
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    si, _, _ = scene_intersect(scene, o, d, jnp.full((1,), jnp.inf))
    assert not bool(si.backface[0])
    o2 = jnp.asarray([[0.0, 0.0, 0.0]])    # inside
    si2, _, _ = scene_intersect(scene, o2, d, jnp.full((1,), jnp.inf))
    assert bool(si2.backface[0])


def _cornell_scaled(scale):
    pos, idx, uv, mats, (lc, le1, le2) = mesh_gen.cornell_box(2.0 * scale)
    mesh = trimod.MeshData.build(pos, idx, uvs=uv)
    return Scene.build(
        materials=[
            {"kind": "diffuse", "albedo_rgb": (0.73, 0.73, 0.73)},
            {"kind": "diffuse", "albedo_rgb": (0.65, 0.05, 0.05)},
            {"kind": "diffuse", "albedo_rgb": (0.12, 0.45, 0.15)},
            {"kind": "diffuse", "albedo_rgb": (0.0, 0.0, 0.0),
             "emission_rgb": (1.0, 0.85, 0.6), "emission_scale": 5.0},
        ],
        lights=[{"kind": "quad", "corner": tuple(lc), "edge1": tuple(le1),
                 "edge2": tuple(le2), "rgb": (1.0, 0.85, 0.6),
                 "scale": 5.0}],
        mesh=(mesh, jnp.asarray(mats)), use_octree=False)


def test_scale_invariant_render():
    # The same Cornell box at unit scale and at 1000x must render the same
    # image (quad lights are radiance-based, so uniform scaling is a no-op):
    # catches absolute epsilons (shadow acne / light leaks) hiding anywhere
    # in the spawn-offset / intersection story.
    res = 20
    imgs = {}
    for s in (1.0, 1000.0):
        scene = _cornell_scaled(s)
        camera = cam.PerspectiveCamera.create(
            (0, 0, -2.8 * s), (res, res), fov_y=50.0, look_at=(0, 0, 0))
        cfg = integ.RenderConfig(
            resolution=(res, res),
            sampler=integ.SamplerConfig(kind="sobol", spp=8),
            integrator="path", max_depth=4)
        film, sensor = integ.render(scene, camera, cfg, chunk=8)
        imgs[s] = np.asarray(film.resolve(sensor, to_srgb=False, clip=False))
    a, b = imgs[1.0], imgs[1000.0]
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # identical sampling decisions (counter RNG) -> only FP noise differs
    np.testing.assert_allclose(a, b, atol=5e-3 * max(a.max(), 1e-6))
    # and the image actually has light in it
    assert a.mean() > 0.005
