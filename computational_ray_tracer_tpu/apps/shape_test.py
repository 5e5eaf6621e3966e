"""Shape/camera visual test app (ShapeTestApp capability): render every
shape type with normal / uv false-color shading, compare octree vs
brute-force traversal, report triangle-test counters."""

from __future__ import annotations

import json
import os

import numpy as np


def main(outdir="out", res=128):
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models.scene import (Scene,
                                                           scene_intersect)
    from computational_ray_tracer_tpu.ops import camera as cam
    from computational_ray_tracer_tpu.ops import shapes as shp
    from computational_ray_tracer_tpu.ops import triangle as trimod
    from computational_ray_tracer_tpu.ops import octree as octmod
    from computational_ray_tracer_tpu.utils import mesh_gen, image

    os.makedirs(outdir, exist_ok=True)
    mats = [{"kind": "diffuse", "albedo_rgb": (0.7, 0.7, 0.7)}]
    lights = [{"kind": "ambient", "spd_named": "stdillum-E", "scale": 1.0}]

    scenes = {
        "sphere": Scene.build(mats, lights, spheres=[
            {"radius": 1.0, "z_min": -0.8, "z_max": 0.9,
             "phi_max": 5.5, "material": 0}]),
        "cylinder": Scene.build(mats, lights, cylinders=[
            {"radius": 0.7, "z_min": -1.0, "z_max": 1.0, "material": 0,
             "transform": shp.make_transform(rotate_deg=(90, 0, 0))}]),
        "disk": Scene.build(mats, lights, disks=[
            {"radius": 1.2, "inner_radius": 0.3, "material": 0,
             "transform": shp.make_transform(rotate_deg=(25, 0, 0))}]),
    }
    pos, idx, uv = mesh_gen.uv_sphere((0, 0, 0), 1.0, 24, 48)
    mesh = trimod.MeshData.build(pos, idx, uvs=uv)
    scenes["mesh_octree"] = Scene.build(
        mats, lights, mesh=(mesh, jnp.zeros(mesh.n_triangles, jnp.int32)),
        use_octree=True)
    scenes["mesh_brute"] = Scene.build(
        mats, lights, mesh=(mesh, jnp.zeros(mesh.n_triangles, jnp.int32)),
        use_octree=False)

    camera = cam.PerspectiveCamera.create((0, 0.6, -3.2), (res, res),
                                          fov_y=45.0, look_at=(0, 0, 0))
    w = h = res
    px = jnp.arange(w * h) % w
    py = jnp.arange(w * h) // w
    pp = jnp.stack([px + 0.5, py + 0.5], axis=-1).astype(jnp.float32)
    o, d = camera.generate_rays(pp, jnp.full((w * h, 2), 0.5))

    report = {}
    for name, scene in scenes.items():
        si, mid, tests = scene_intersect(scene, o, d,
                                         jnp.full((w * h,), jnp.inf))
        normal_img = np.asarray(
            jnp.where(si.valid[:, None], (si.n + 1.0) / 2.0, 0.0)
        ).reshape(h, w, 3)
        uv_img = np.zeros((h, w, 3), np.float32)
        uvs = np.asarray(jnp.where(si.valid[:, None], si.uv, 0.0))
        uv_img[..., 0] = uvs[:, 0].reshape(h, w)
        uv_img[..., 1] = uvs[:, 1].reshape(h, w)
        image.write_png(os.path.join(outdir, f"{name}_normals.png"),
                        normal_img)
        image.write_png(os.path.join(outdir, f"{name}_uv.png"), uv_img)
        report[name] = {
            "hit_fraction": float(np.asarray(si.valid).mean()),
            "triangle_tests_total": int(np.asarray(tests).sum()),
        }
        if scene.octree is not None:
            report[name]["octree"] = scene.octree.info()

    # octree and brute force must produce identical hit images
    so, _, _ = scene_intersect(scenes["mesh_octree"], o, d,
                               jnp.full((w * h,), jnp.inf))
    sb, _, _ = scene_intersect(scenes["mesh_brute"], o, d,
                               jnp.full((w * h,), jnp.inf))
    report["octree_matches_brute"] = bool(
        np.allclose(np.asarray(so.t)[np.asarray(so.valid)],
                    np.asarray(sb.t)[np.asarray(sb.valid)], rtol=1e-4))
    report["octree_speedup_tests"] = (
        report["mesh_brute"]["triangle_tests_total"]
        / max(report["mesh_octree"]["triangle_tests_total"], 1))

    with open(os.path.join(outdir, "shape_test.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report
