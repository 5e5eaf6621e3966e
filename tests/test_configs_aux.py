"""BASELINE configs 3-4 (textured octree mesh; spectral path) and auxiliary
subsystems (checkpoint/resume, scene config files, metrics)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from computational_ray_tracer_tpu.models.scene import Scene, texture_lookup
from computational_ray_tracer_tpu.models import integrator as integ
from computational_ray_tracer_tpu.ops import camera as cam
from computational_ray_tracer_tpu.ops import triangle as trimod
from computational_ray_tracer_tpu.ops import spectrum as spec
from computational_ray_tracer_tpu.ops import film as filmmod
from computational_ray_tracer_tpu.utils import (mesh_gen, checkpoint,
                                                config as cfgmod, metrics,
                                                obj_loader)


def test_config3_textured_mesh_octree(tmp_path):
    # BASELINE config 3 (small): triangle-mesh scene via octree, textured.
    pos, idx, uv = mesh_gen.uv_sphere((0, 0, 0), 1.0, 10, 16)
    mesh = trimod.MeshData.build(pos, idx, uvs=uv)
    tex = mesh_gen.checker_texture(32, (0.9, 0.9, 0.9), (0.1, 0.1, 0.5))
    scene = Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (1.0, 1.0, 1.0),
                    "use_texture": True}],
        lights=[{"kind": "distant", "direction": (0, -1, 1),
                 "spd_named": "stdillum-D65", "scale": 1.0}],
        mesh=(mesh, jnp.zeros((mesh.n_triangles,), jnp.int32)),
        use_octree=True,
        texture_rgb=tex)
    assert scene.octree is not None
    assert scene.octree.info()["nodes"] > 1
    camera = cam.PerspectiveCamera.create((0, 0, -4), (24, 24), fov_y=40.0,
                                          look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(24, 24),
        sampler=integ.SamplerConfig(kind="stratified", spp=4, xs=2, ys=2),
        integrator="direct")
    film, sensor = integ.render(scene, camera, cfg)
    img = np.asarray(film.resolve(sensor, to_srgb=False, clip=False))
    assert np.isfinite(img).all()
    # the sphere is lit and the checker texture produces contrast
    sphere_px = img[8:16, 8:16].reshape(-1, 3).sum(-1)
    assert sphere_px.max() > 0.01
    assert sphere_px.max() > 2.0 * max(sphere_px.min(), 1e-6) or \
        sphere_px.min() == 0.0


def test_texture_lookup_bilinear():
    tex = jnp.asarray(np.arange(16, dtype=np.float32).reshape(2, 2, 4)[:, :, :3])
    v = texture_lookup(tex, jnp.asarray([[0.25, 0.75]]))
    assert v.shape == (1, 3)


def test_config4_spectral_blackbody_dispersion():
    # BASELINE config 4: hero-wavelength path with a blackbody-style emitter
    # and a dispersive glass sphere.
    bb = spec.BlackbodySpectrum(3000.0)
    lam = jnp.asarray(np.arange(360.0, 831.0, 1.0, dtype=np.float32))
    bb_dense = np.asarray(bb(lam)) * 0.1
    scene = Scene.build(
        materials=[
            {"kind": "diffuse", "albedo_rgb": (0.8, 0.8, 0.8)},
            {"kind": "dielectric", "albedo_rgb": (1, 1, 1),
             "glass": "glass-SF11"},
        ],
        lights=[{"kind": "point", "position": (0.0, 2.0, -2.0),
                 "spd_dense": bb_dense, "scale": 1.0}],
        spheres=[
            {"radius": 4.0, "material": 0,
             "transform": None},  # enclosing diffuse sphere (inside view)
            {"radius": 0.7, "material": 1},
        ])
    camera = cam.PerspectiveCamera.create((0, 0, -3), (16, 16), fov_y=45.0,
                                          look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(16, 16),
        sampler=integ.SamplerConfig(kind="sobol", spp=16),
        integrator="path", max_depth=5)
    film, sensor = integ.render(scene, camera, cfg)
    img = np.asarray(film.resolve(sensor, to_srgb=False, clip=False))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-4
    # 3000K blackbody is warm: red channel should dominate blue overall
    assert img[..., 0].mean() > img[..., 2].mean()


def test_dielectric_terminates_secondary_wavelengths():
    # A ray refracting through glass must collapse to its hero wavelength
    # (dispersion, spectrum.h:302-319 capability).
    from computational_ray_tracer_tpu.models import materials as mat
    table = mat.MaterialTable.build(
        [{"kind": "dielectric", "glass": "glass-BK7"}])
    row = jax.tree_util.tree_map(lambda x: x[jnp.asarray([0])], table)
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = jnp.asarray([[0.0, 0.6, 0.8]])
    lamv = spec.sample_visible_wavelengths(jnp.asarray([0.3])).lam
    wi, w, pdf, is_spec, term = mat.bsdf_sample(
        row, n, wo, jnp.asarray([[0.1, 0.2]]), jnp.asarray([0.9]), lamv)
    assert bool(term[0])
    assert bool(is_spec[0])


def test_checkpoint_film_roundtrip(tmp_path):
    film = filmmod.Film.create((8, 8))
    film = film.add_aligned(jnp.ones((8, 8, 3)) * 0.3, jnp.ones((8, 8)))
    p = str(tmp_path / "film.npz")
    checkpoint.save_film(p, film, {"spp": 1})
    film2, meta = checkpoint.load_film(p)
    np.testing.assert_allclose(np.asarray(film2.rgb_sum),
                               np.asarray(film.rgb_sum))
    assert meta == {"spp": 1}
    assert int(film2.spp_done) == 1


def test_checkpoint_exact_resume(tmp_path):
    # Render 4 spp straight vs 2 spp + checkpoint + resume 2 spp: identical
    # (counter-based RNG -> exact resume, SURVEY §5).
    scene = Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (0.7, 0.5, 0.3)}],
        lights=[{"kind": "point", "position": (2, 3, -2),
                 "spd_named": "stdillum-D65", "scale": 10.0}],
        spheres=[{"radius": 1.0, "material": 0}])
    camera = cam.PerspectiveCamera.create((0, 0, -4), (8, 8), fov_y=40.0,
                                          look_at=(0, 0, 0))
    cfg = integ.RenderConfig(resolution=(8, 8),
                             sampler=integ.SamplerConfig(kind="sobol", spp=4),
                             integrator="direct")
    film_straight, sensor = integ.render(scene, camera, cfg)

    # partial render with the SAME config (stratification depends on total
    # spp), stopped after 2 passes
    film_half, _ = integ.render(scene, camera, cfg, passes=2)
    p = str(tmp_path / "ck.npz")
    checkpoint.save_film(p, film_half)
    film_loaded, _ = checkpoint.load_film(p)
    film_resumed, _ = integ.render(scene, camera, cfg, film=film_loaded)
    np.testing.assert_allclose(np.asarray(film_resumed.rgb_sum),
                               np.asarray(film_straight.rgb_sum), rtol=1e-6)


def test_pytree_checkpoint(tmp_path):
    tree = {"a": jnp.ones((3, 2)), "b": [jnp.zeros(4), jnp.full((2,), 7.0)]}
    p = str(tmp_path / "tree.npz")
    checkpoint.save_pytree(p, tree)
    like = jax.tree_util.tree_map(jnp.zeros_like, tree)
    back = checkpoint.load_pytree(p, like)
    np.testing.assert_allclose(np.asarray(back["b"][1]), 7.0)


def test_scene_config_file(tmp_path):
    spec = {
        "render": {"resolution": [16, 16], "integrator": "direct",
                   "sampler": {"kind": "stratified", "spp": 4, "xs": 2,
                               "ys": 2}, "filter": "box"},
        "camera": {"kind": "perspective", "position": [0, 0, -4],
                   "look_at": [0, 0, 0], "fov_y": 45.0},
        "materials": [{"kind": "diffuse", "albedo_rgb": [0.6, 0.6, 0.2]}],
        "lights": [{"kind": "point", "position": [1, 2, -3],
                    "spd_named": "stdillum-D65", "scale": 10.0}],
        "shapes": [{"kind": "sphere", "radius": 1.0, "material": 0},
                   {"kind": "disk", "radius": 2.0, "material": 0,
                    "transform": {"translate": [0, -1, 0],
                                  "rotate_deg": [-90, 0, 0]}}],
    }
    path = str(tmp_path / "scene.json")
    with open(path, "w") as f:
        json.dump(spec, f)
    scene, camera, rcfg = cfgmod.load_scene_file(path)
    assert scene.spheres is not None and scene.disks is not None
    film, sensor = integ.render(scene, camera, rcfg)
    img = np.asarray(film.resolve(sensor, to_srgb=False))
    assert img.sum() > 0


def test_obj_loader_roundtrip(tmp_path):
    pos, idx, uv = mesh_gen.box((-1, -1, -1), (1, 1, 1))
    p = str(tmp_path / "box.obj")
    obj_loader.save_obj(p, pos, idx)
    pos2, idx2, nrm2, uv2 = obj_loader.load_obj(p)
    assert idx2.shape == idx.shape
    # same geometry: every loaded triangle has the same vertex positions
    tri_a = np.sort(pos[idx].reshape(len(idx), -1), axis=1)
    tri_b = np.sort(pos2[idx2].reshape(len(idx2), -1), axis=1)
    np.testing.assert_allclose(np.sort(tri_a, axis=0), np.sort(tri_b, axis=0),
                               atol=1e-5)


def test_obj_loader_with_uv_normals(tmp_path):
    p = str(tmp_path / "quad.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        f.write("vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n")
        f.write("vn 0 0 1\n")
        f.write("f 1/1/1 2/2/1 3/3/1 4/4/1\n")  # quad -> 2 tris (fan)
    pos, idx, nrm, uv = obj_loader.load_obj(p)
    assert idx.shape == (2, 3)
    np.testing.assert_allclose(nrm, [[0, 0, 1]] * 4)
    assert uv.shape == (4, 2)


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "metrics.jsonl")
    ml = metrics.MetricsLogger(path=p)
    ml.log("pass", seconds=0.5, rays_per_sec=1e6)
    ml.close()
    rec = json.loads(open(p).read().strip())
    assert rec["event"] == "pass"
    assert rec["rays_per_sec"] == 1e6


def test_timer():
    t = metrics.Timer()
    x = sum(range(10000))
    assert t.seconds() >= 0
    assert t.ms() >= 0
