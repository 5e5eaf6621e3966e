"""The reference's canonical workload, reproduced exactly (VERDICT r4
next-step #2): one committed parity frame of `RayTracerTestApp::MainLoop`
(/root/reference/Applications/RayTracerTestApp.h:103-207), assembled from
this framework's public components.

Reference configuration (file:line cites into RayTracerTestApp.h):
- film 500x500, image res 500x500 (pixel size 1)            :103-106
- TRIANGLE filter, half-pixel radius (film_1.filter = &tri_filter) :147,162
  (Box/Gaussian are constructed at :145-146 but not assigned)
- XYZ PixelSensor, sRGB space, D65, 1/CIE_Y_integral        :149-150
- PerspectiveCamera N=1 F=1000, fov 45, at origin looking +z,
  thin lens radius 50, focal distance 800                   :167-180
- StratifiedSampler 10x10 (100 spp), seed 0                 :184-189
- scene: stanford-dragon x15 at translate(0,-40,800) (+orientation
  rotations), per-face backface culling vs look dir (0,0,1) :83-97
  -> here: mesh_gen.dragon_stand_in() (the 872k-tri x15-scale stand-in;
  the reference's Game_Data/ mesh files are not in its repo) at the same
  translation, same culling.
- Li (direct, NO shadow rays — the reference casts none)    :218-284:
    hit: 0.3 * F1-illuminant(lambda)
         + max(dot(n, (0,0,-1)), 0) * RGBIlluminant(1,1,1)(lambda)
                                    * RGBAlbedo(0.5,0.5,0.5)(lambda)
    miss: 0
- per sample: StartPixelSample -> SampleVisible lambda -> GetPixel2D ->
  filter Sample -> generateRay -> Li -> ToSensorRGB -> clamp [0,1] ->
  filter-weighted accumulate                                :287-345
  (dimension order lambda, filter, lens == integrator DIM_* order)
- resolve: rgbsum/weightsum -> XYZFromSensorRGB -> sRGB -> clamp -> bytes
  (linear, no gamma encode)                                 :425-455

Usage:
  python benchmarks/canonical.py                 # full 500^2 x 100 spp (TPU)
  python benchmarks/canonical.py --golden        # write the small CPU golden
  python benchmarks/canonical.py --res 64 --spp 4 --check-golden
Writes benchmarks/canonical.json + benchmarks/data/canonical_500.png.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden", "canonical_64.npy")


def check_golden(img):
    """Compare a 64x64 spp-4 canonical render against the committed CPU
    golden. The single tolerance definition shared by the bench gate and
    --check-golden."""
    import numpy as np
    golden = np.load(GOLDEN)
    atol = 2e-3 * max(float(golden.max()), 1e-3)
    diff = float(np.abs(img - golden).max())
    return {"max_abs_diff": round(diff, 6), "atol": round(atol, 6),
            "ok": bool(diff <= atol)}


def build_scene(cap=40):
    import numpy as np
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models.scene import Scene
    from computational_ray_tracer_tpu.ops import triangle as trimod
    from computational_ray_tracer_tpu.utils import mesh_gen

    v, f, uv = mesh_gen.dragon_stand_in()
    # The reference's stanford-dragon.obj is not in its repo, so its
    # absolute scale is unknowable; the stand-in (extent ~±30) is scaled
    # x5 so the subject spans ~300 units — ~45% of the 45° fov frame at
    # z=800, a visible-subject framing consistent with the reference's
    # README screenshots. Everything else (translate (0,-40,800), camera,
    # lens, film, sampler, Li) follows RayTracerTestApp.h exactly.
    v = np.asarray(v, np.float32) * 5.0 + np.asarray([0.0, -40.0, 800.0],
                                                     np.float32)
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    scene = Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (0.5, 0.5, 0.5)}],
        lights=[{"kind": "distant", "direction": (0, 0, 1),
                 "rgb": (1.0, 1.0, 1.0), "scale": 1.0}],
        mesh=(mesh, jnp.zeros((mesh.n_triangles,), jnp.int32)),
        use_octree=True, octree_capacity=cap,
        backface_cull_dir=(0.0, 0.0, 1.0))
    return scene


def make_pass(scene, res, spp, seed=0):
    """One stratified sample pass of the reference pipeline. Returns a
    jitted fn(scene, sample_idx) -> (rgb (H,W,3), weight (H,W))."""
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models import integrator as integ
    from computational_ray_tracer_tpu.models.scene import scene_intersect
    from computational_ray_tracer_tpu.ops import camera as cam
    from computational_ray_tracer_tpu.ops import color as colorlib
    from computational_ray_tracer_tpu.ops import filters as flt
    from computational_ray_tracer_tpu.ops import sensor as sen
    from computational_ray_tracer_tpu.ops import spectrum as spec

    w = h = res
    xs = max(int(round(spp ** 0.5)), 1)
    sampler = integ.SamplerConfig(kind="stratified", spp=spp, xs=xs,
                                  ys=spp // xs, seed=seed)
    camera = cam.PerspectiveCamera.create(
        (0.0, 0.0, 0.0), (w, h), fov_y=45.0,
        lens_radius=50.0, focal_distance=800.0,
        look_at=(0.0, 0.0, 800.0))
    filter_obj = flt.triangle_filter((0.5, 0.5))
    sensor = sen.PixelSensor.create(None)    # XYZ sensor, D65 WB

    f1 = spec.DenselySampledSpectrum.from_named("stdillum-F1").values
    white = colorlib.RGBIlluminantSpectrum.from_rgb((1.0, 1.0, 1.0))
    gray = colorlib.RGBAlbedoSpectrum.from_rgb((0.5, 0.5, 0.5))
    light_wi = jnp.asarray([0.0, 0.0, -1.0])

    def one_pass(scene_, sample_idx):
        pixel, inv = integ._swizzled_pixels(w, h)
        px = (pixel % w).astype(jnp.float32)
        py = (pixel // w).astype(jnp.float32)
        u_lam = sampler.get_1d(pixel, sample_idx, integ.DIM_LAMBDA)
        wl = spec.sample_visible_wavelengths(u_lam)
        u_filt = sampler.get_2d(pixel, sample_idx, integ.DIM_FILTER)
        fp, fw = filter_obj.sample(u_filt)
        pixel_pos = jnp.stack([px + 0.5, py + 0.5], axis=-1) + fp
        u_lens = sampler.get_2d(pixel, sample_idx, integ.DIM_LENS)
        o, d = camera.generate_rays(pixel_pos, u_lens)

        # the reference Li: closest octree hit, local shade, no shadow ray
        t_max = jnp.full(o.shape[:-1], jnp.inf)
        si, mid, _ = scene_intersect(scene_, o, d, t_max)
        ambient = 0.3 * spec.sample_dense(f1, wl.lam)
        cosw = jnp.clip(jnp.sum(si.n * light_wi, axis=-1), 0.0, 1.0)
        L = ambient + cosw[..., None] * white(wl.lam) * gray(wl.lam)
        L = jnp.where(si.valid[..., None], L, 0.0)

        rgb = jnp.clip(sensor.to_sensor_rgb(L, wl), 0.0, 1.0)
        if inv is not None:
            rgb = rgb[inv]
            fw = fw[inv]
        return rgb.reshape(h, w, 3), fw.reshape(h, w)

    return jax.jit(one_pass), sensor


def render(res, spp, cap=40, progress=False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from computational_ray_tracer_tpu.ops import film as filmmod

    t0 = time.perf_counter()
    scene = build_scene(cap)
    build_sec = time.perf_counter() - t0
    one_pass, sensor = make_pass(scene, res, spp)

    film = filmmod.Film.create((res, res))
    accum = jax.jit(lambda f, rgb, wt: filmmod.Film(
        f.rgb_sum + rgb * wt[..., None], f.weight_sum + wt, f.spp_done + 1))

    t0 = time.perf_counter()
    rgb, wt = one_pass(scene, jnp.uint32(0))
    jax.block_until_ready((rgb, wt))
    compile_sec = time.perf_counter() - t0
    film = accum(film, rgb, wt)
    t0 = time.perf_counter()
    for i in range(1, spp):
        rgb, wt = one_pass(scene, jnp.uint32(i))
        film = accum(film, rgb, wt)
        if progress and i % 10 == 0:
            jax.block_until_ready(film.rgb_sum)
            print(f"  spp {i}/{spp}  {time.perf_counter() - t0:.1f}s",
                  flush=True)
    jax.block_until_ready(film.rgb_sum)
    render_sec = time.perf_counter() - t0
    sec_per_pass = render_sec / max(spp - 1, 1)

    img = np.asarray(film.resolve(sensor))
    stats = {
        "res": res, "spp": spp, "leaf_cap": cap,
        "n_triangles": int(scene.mesh.n_triangles),
        "octree": scene.octree.info(),
        "scene_build_sec": round(build_sec, 1),
        "compile_sec": round(compile_sec, 1),
        "sec_per_sample_pass": round(sec_per_pass, 4),
        "total_render_sec": round(render_sec, 1),
        # one camera ray per sample; the reference Li casts no shadow rays
        "rays_per_sec": round(res * res / sec_per_pass, 1),
        "img_mean": round(float(img.mean()), 5),
        "device": str(jax.devices()[0]),
    }
    return img, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=500)
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--cap", type=int, default=40)
    ap.add_argument("--golden", action="store_true",
                    help="write the 64x64 spp4 CPU golden")
    ap.add_argument("--check-golden", action="store_true",
                    help="compare this device's 64x64 spp4 render vs golden")
    args = ap.parse_args()

    import numpy as np

    if args.golden or args.check_golden:
        img, stats = render(64, 4, args.cap)
        if args.golden:
            np.save(GOLDEN, img)
            print("wrote", GOLDEN)
        else:
            print(json.dumps(check_golden(img)))
        return

    img, stats = render(args.res, args.spp, args.cap, progress=True)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "data")
    os.makedirs(out_dir, exist_ok=True)
    from computational_ray_tracer_tpu.utils import image
    png = os.path.join(out_dir, f"canonical_{args.res}.png")
    image.write_png(png, img)
    stats["png"] = os.path.relpath(png,
                                   os.path.dirname(os.path.abspath(__file__))
                                   + "/..")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "canonical.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
