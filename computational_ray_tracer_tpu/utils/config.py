"""Scene + render configuration: dataclasses and a JSON scene format.

The reference has NO config/flag system — apps are selected by compile-time
#defines and every scene parameter is a hard-coded local mutated through
ImGui (SURVEY §5, main.cpp:3-14, RayTracerTestApp.h:103-207). This module
gives the framework the scene *description* layer the reference lacks: a
declarative JSON/dict format that assembles a Scene + camera + RenderConfig,
so scenes are data instead of code."""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from computational_ray_tracer_tpu.models.scene import Scene
from computational_ray_tracer_tpu.models import integrator as integ
from computational_ray_tracer_tpu.ops import camera as cam
from computational_ray_tracer_tpu.ops import shapes as shp
from computational_ray_tracer_tpu.ops import triangle as trimod
from computational_ray_tracer_tpu.utils import mesh_gen, obj_loader


CAMERA_KINDS = {
    "perspective": cam.PerspectiveCamera,
    "orthographic": cam.OrthographicCamera,
    "pinhole": cam.PinholeCamera,
    "thinlens": cam.ThinLensCamera,
}


def _build_transform(spec):
    if spec is None:
        return None
    return shp.make_transform(
        translate=tuple(spec.get("translate", (0, 0, 0))),
        rotate_deg=tuple(spec.get("rotate_deg", (0, 0, 0))),
        scale=spec.get("scale", 1.0))


def build_camera(spec, resolution):
    kind = spec.get("kind", "perspective")
    kwargs = {k: v for k, v in spec.items() if k not in ("kind",)}
    for tup in ("position", "look_at", "window", "sensor_size"):
        if tup in kwargs:
            kwargs[tup] = tuple(kwargs[tup])
    return CAMERA_KINDS[kind].create(resolution=tuple(resolution), **kwargs)


def build_render_config(spec):
    s = spec.get("sampler", {})
    sampler = integ.SamplerConfig(
        kind=s.get("kind", "sobol"), spp=s.get("spp", 16),
        xs=s.get("xs", 4), ys=s.get("ys", 4), seed=s.get("seed", 0),
        jitter=s.get("jitter", True))
    return integ.RenderConfig(
        resolution=tuple(spec.get("resolution", (256, 256))),
        sampler=sampler,
        integrator=spec.get("integrator", "path"),
        max_depth=spec.get("max_depth", 5),
        rr_start=spec.get("rr_start", 3),
        lambda_mode=spec.get("lambda_mode", "visible"),
        filter_name=spec.get("filter", "gaussian"),
        filter_radius=tuple(spec.get("filter_radius", (0.5, 0.5))),
        sensor_name=spec.get("sensor"),
        clamp=spec.get("clamp", 0.0))


def build_scene(spec):
    """Assemble a Scene from a declarative dict (see tests for the shape)."""
    shapes = {"spheres": [], "cylinders": [], "disks": []}
    mesh_parts = []
    for sh in spec.get("shapes", []):
        kind = sh["kind"]
        body = {k: v for k, v in sh.items() if k != "kind"}
        if "transform" in body:
            body["transform"] = _build_transform(body["transform"])
        if kind in ("sphere", "cylinder", "disk"):
            shapes[kind + "s"].append(body)
        elif kind == "cornell_box":
            pos, idx, uv, mats, light_quad = mesh_gen.cornell_box(
                body.get("size", 2.0), body.get("light_frac", 0.5))
            base = body.get("material_base", 0)
            mesh_parts.append((pos, idx, uv, np.asarray(mats) + base))
        elif kind == "box":
            pos, idx, uv = mesh_gen.box(tuple(body["lo"]), tuple(body["hi"]))
            mesh_parts.append((pos, idx, uv,
                               np.full(len(idx), body.get("material", 0),
                                       np.int32)))
        elif kind == "mesh_obj":
            pos, idx, nrm, uv = obj_loader.load_obj(body["path"])
            mesh_parts.append((pos, idx, uv,
                               np.full(len(idx), body.get("material", 0),
                                       np.int32)))
        elif kind == "uv_sphere":
            pos, idx, uv = mesh_gen.uv_sphere(
                tuple(body.get("center", (0, 0, 0))), body.get("radius", 1.0))
            mesh_parts.append((pos, idx, uv,
                               np.full(len(idx), body.get("material", 0),
                                       np.int32)))
        else:
            raise ValueError(f"unknown shape kind {kind!r}")

    mesh = None
    if mesh_parts:
        pos, idx, uv, tri_mats = mesh_gen.merge_meshes(
            [(p, i, u) for (p, i, u, m) in mesh_parts])
        tri_mats = np.concatenate([m for (_, _, _, m) in mesh_parts])
        md = trimod.MeshData.build(pos, idx, uvs=uv)
        mesh = (md, jnp.asarray(tri_mats))

    texture = None
    if "texture" in spec:
        t = spec["texture"]
        if t.get("kind") == "checker":
            texture = mesh_gen.checker_texture(
                t.get("res", 64), tuple(t.get("c0", (0.9, 0.9, 0.9))),
                tuple(t.get("c1", (0.15, 0.15, 0.55))))
        elif t.get("kind") == "image":
            from computational_ray_tracer_tpu.utils import image
            texture = image.read_image(t["path"])

    return Scene.build(
        materials=spec["materials"],
        lights=spec.get("lights", []),
        spheres=shapes["spheres"] or None,
        cylinders=shapes["cylinders"] or None,
        disks=shapes["disks"] or None,
        mesh=mesh,
        use_octree=spec.get("use_octree", True),
        texture_rgb=texture,
        backface_cull_dir=spec.get("backface_cull_dir"))


def load_scene_file(path):
    """Load (scene, camera, render_config) from a JSON scene file."""
    with open(path) as f:
        spec = json.load(f)
    render_cfg = build_render_config(spec.get("render", {}))
    camera = build_camera(spec.get("camera", {"position": (0, 0, -4),
                                              "look_at": (0, 0, 0)}),
                          render_cfg.resolution)
    scene = build_scene(spec)
    return scene, camera, render_cfg
