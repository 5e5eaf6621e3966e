"""Benchmark harness (BASELINE.md north-star metrics). Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Workloads, all on the real chip:
- headline: rays/sec/chip on the 1024spp Cornell box (path MIS, depth 4,
  Sobol) — the metric tracked round-over-round in BENCH_rN;
- legacy pin: the identical config is ALSO timed with the round-1 launch
  shape (one render_pass per spp, no chunking) so config/driver changes
  can never hide a regression behind a definition change;
- dragon-class mesh (detail.mesh): direct lighting on a 327k-tri displaced
  icosphere through the Pallas packet octree at 512x512;
- flagship parity (detail.flagship): the reference's canonical workload
  end-to-end — textured mesh + octree + path/MIS + gaussian filter +
  sensor resolve at 512x512 (RayTracerTestApp.h:70-189);
- 872k-tri x15-scale irregular mesh (detail.mesh870) with leaf-table and
  HBM accounting;
- the reference's CANONICAL workload (detail.canonical): 500x500,
  stratified 10x10 spp, 872k tris at the reference's leaf cap 40,
  thin-lens camera, triangle filter, no-shadow Li — committed PNG +
  CPU-golden gate (benchmarks/canonical.py);
- 512^2 depth-8 through the public render() (detail.deep512, compacted);
- golden gate (detail.golden_gate): the 128x128 Cornell golden config
  rendered on TPU vs the checked-in CPU golden (BASELINE.md row 3);
- gradient consistency (detail.grad_check): inverse-rendering gradient on
  a mesh scene with the Pallas forward vs the jnp-traversal oracle.

Rays/s counts every traced ray: camera rays plus per-bounce continuation
and NEE shadow rays (the standard wavefront metric); per-depth alive-ray
fractions and an alive-weighted effective rays/s are reported alongside
so the nominal count stays honest.
A stored per-round baseline (benchmarks/baseline.json) anchors vs_baseline.

env: BENCH_RES, BENCH_SPP, BENCH_PASSES, BENCH_CHUNK,
     BENCH_MESH=0 / BENCH_MESH870=0 / BENCH_FLAGSHIP=0 / BENCH_LEGACY=0 /
     BENCH_CANONICAL=0 / BENCH_DEEP512=0 / BENCH_GOLDEN=0 / BENCH_GRAD=0
     to skip blocks, BENCH_MESH_SUBDIV, BENCH_MESH_RES, BENCH_MESH_SPP,
     BENCH_MESH_CAP / BENCH_MESH870_CAP (octree leaf capacities),
     BENCH_CANONICAL_RES / BENCH_CANONICAL_SPP.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np


def _env(name, default):
    return int(os.environ.get(name, str(default)))


def bench_cornell(res, spp, max_depth=4):
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models import integrator as integ
    from __graft_entry__ import _cornell_setup

    scene, camera, cfg = _cornell_setup(res=res, spp=spp)
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=spp),
        integrator="path", max_depth=max_depth)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)

    chunk = _env("BENCH_CHUNK", 8)

    @jax.jit
    def chunk_pass(scene, sample_idx):
        return integ.render_passes(scene, camera, cfg, filter_obj, sensor,
                                   sample_idx, chunk)

    rgb, wt = chunk_pass(scene, jnp.uint32(0))
    jax.block_until_ready((rgb, wt))

    n_timed = _env("BENCH_PASSES", 32)
    n_chunks = max(1, n_timed // chunk)
    n_timed = n_chunks * chunk
    # Best-of-2 timed sweeps (disjoint sample-index ranges, so the
    # runtime's identical-dispatch dedup can't serve cached results):
    # single-sweep headline readings vary ±3% run-to-run on this remote
    # runtime; min-over-repeats estimates the steady state.
    dt = float("inf")
    for rep in range(2):
        base = (rep + 1) * (1 << 20)
        t0 = time.perf_counter()
        for i in range(n_chunks):
            rgb, wt = chunk_pass(scene, jnp.uint32(base + i * chunk))
        jax.block_until_ready((rgb, wt))
        dt = min(dt, time.perf_counter() - t0)

    alive = np.asarray(jax.jit(lambda s: integ.alive_fractions(
        s, camera, cfg))(scene))

    n_pixels = res * res
    rays_per_sample = 1 + (max_depth - 1) + max_depth
    rays_per_sec = n_pixels * n_timed * rays_per_sample / dt
    # alive-weighted ray count: 1 camera ray + continuation rays at depths
    # 1..D-1 + NEE shadow rays at depths 0..D-1, each weighted by the
    # measured alive fraction (dead rays ride the lockstep scan as masked
    # work — the nominal count stays the headline, this keeps it honest)
    eff_rays_per_sample = (1.0 + float(sum(alive[1:max_depth]))
                           + float(sum(alive[:max_depth])))
    detail = {
        "rays_per_sec": rays_per_sec,
        "effective_rays_per_sec": round(
            n_pixels * n_timed * eff_rays_per_sample / dt, 1),
        "passes_timed": n_timed,
        "sec_per_spp_pass": round(dt / n_timed, 6),
        "est_sec_full_1024spp": round(dt / n_timed * spp, 2),
        "alive_frac_per_depth": [round(float(a), 4) for a in alive],
    }

    if os.environ.get("BENCH_LEGACY", "1") != "0":
        # Round-1 launch shape: one render_pass per spp, no chunk/scan.
        @jax.jit
        def one_pass(scene, sample_idx):
            return integ.render_pass(scene, camera, cfg, filter_obj,
                                     sensor, sample_idx)

        rgb, wt_l = one_pass(scene, jnp.uint32(0))
        jax.block_until_ready((rgb, wt_l))
        n_legacy = min(n_timed, 16)
        t0 = time.perf_counter()
        for i in range(n_legacy):
            rgb, wt_l = one_pass(scene, jnp.uint32(i + 1))
        jax.block_until_ready((rgb, wt_l))
        dt_l = time.perf_counter() - t0
        detail["legacy_unchunked"] = {
            "rays_per_sec": round(
                n_pixels * n_legacy * rays_per_sample / dt_l, 1),
            "passes_timed": n_legacy,
            "sec_per_spp_pass": round(dt_l / n_legacy, 6),
        }
    return detail


def _hbm_report():
    """Device-memory block that is never silently empty (VERDICT r4 missing
    #1): prefer the runtime's memory_stats(); when that returns nothing on
    this runtime (remote-attached TPUs), fall back to an analytic sum of
    every live device buffer's nbytes — a lower bound on bytes_in_use
    (excludes XLA workspace), labeled as such."""
    import jax
    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                mem[k + "_mb"] = round(stats[k] / 2**20)
    except Exception:
        pass
    if not mem:
        dev = jax.devices()[0]
        total = 0
        n = 0
        for a in jax.live_arrays():
            try:
                if dev in a.devices():
                    total += a.nbytes
                    n += 1
            except Exception:
                continue
        mem = {"live_buffers_mb": round(total / 2**20),
               "live_buffer_count": n,
               "method": "sum of jax.live_arrays().nbytes "
                         "(memory_stats() empty on this runtime; lower "
                         "bound — excludes XLA workspace)"}
    return mem


def _dragon_scene(subdiv, cap):
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models.scene import Scene
    from computational_ray_tracer_tpu.ops import triangle as trimod
    from computational_ray_tracer_tpu.utils import mesh_gen

    v, f, uv = mesh_gen.displaced_icosphere(subdiv)
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    return Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (0.75, 0.71, 0.62)}],
        lights=[{"kind": "distant", "direction": (-0.4, -1.0, 0.5),
                 "rgb": (1.0, 1.0, 1.0), "scale": 4.0},
                {"kind": "ambient", "spd_named": "stdillum-D65",
                 "scale": 0.15}],
        mesh=(mesh, jnp.zeros((mesh.n_triangles,), jnp.int32)),
        use_octree=True, octree_capacity=cap)


def bench_dragon():
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models import integrator as integ
    from computational_ray_tracer_tpu.ops import camera as cam

    subdiv = _env("BENCH_MESH_SUBDIV", 7)
    res = _env("BENCH_MESH_RES", 512)
    spp = _env("BENCH_MESH_SPP", 4)
    # cap 192 measured best post compact-push walk (r5 sweep on the 327k
    # direct pass: 2.59M rays/s at the reference's cap 40, 3.34M at 96,
    # 3.77M at 192, 3.73M at 256 — the cheaper walk moved the optimum up;
    # the canonical parity block keeps the reference's cap 40).
    cap = _env("BENCH_MESH_CAP", 192)

    t0 = time.perf_counter()
    scene = _dragon_scene(subdiv, cap)
    build_dt = time.perf_counter() - t0
    camera = cam.PerspectiveCamera.create((0, 0.5, -3.4), (res, res),
                                          fov_y=40.0, look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=spp),
        integrator="direct", max_depth=1)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)

    @jax.jit
    def one_pass(scene, sample_idx):
        return integ.render_pass(scene, camera, cfg, filter_obj, sensor,
                                 sample_idx)

    t0 = time.perf_counter()
    rgb, wt = one_pass(scene, jnp.uint32(0))
    jax.block_until_ready((rgb, wt))
    compile_dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(spp):
        rgb, wt = one_pass(scene, jnp.uint32(i + 1))
    jax.block_until_ready((rgb, wt))
    dt = (time.perf_counter() - t0) / spp

    # direct lighting: 1 camera ray + 1 shadow ray per sample
    rays = res * res * 2
    n_tris = int(scene.mesh.n_triangles)
    return scene, {
        "n_triangles": n_tris,
        "leaf_cap": cap,
        "rays_per_sec": round(rays / dt, 1),
        "sec_per_spp_pass": round(dt, 4),
        "octree": scene.octree.info(),
        "scene_build_sec": round(build_dt, 1),
        "compile_sec": round(compile_dt, 1),
        "img_mean": round(float(jnp.mean(rgb)), 5),
    }


def bench_dragon870():
    """Reference-scale irregular mesh (VERDICT r4 item 4): the ~870k-tri
    x15-scale dragon stand-in (mesh_gen.dragon_stand_in — blob radii and
    subdivision levels spanning orders of magnitude, tri-area p99/p1
    ~1300x) through the packed octree, direct lighting at 512^2, with the
    leaf-table footprint and device HBM peak recorded."""
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models.scene import Scene
    from computational_ray_tracer_tpu.models import integrator as integ
    from computational_ray_tracer_tpu.ops import camera as cam
    from computational_ray_tracer_tpu.ops import triangle as trimod
    from computational_ray_tracer_tpu.utils import mesh_gen

    res = _env("BENCH_MESH_RES", 512)
    spp = _env("BENCH_MESH_SPP", 4)
    # cap 160 measured best post leaf-packing (r5 sweep on the NEE shadow
    # wavefront: 693 ms vs 756 at cap 96 vs 690 at cap 256, with the leaf
    # table at 95 MB — bigger leaves suit the irregular density, and the
    # packed rows made leaf streaming cheap enough to raise the cap)
    cap = _env("BENCH_MESH870_CAP", 160)

    t0 = time.perf_counter()
    v, f, uv = mesh_gen.dragon_stand_in()
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    scene = Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (0.7, 0.64, 0.52)}],
        lights=[{"kind": "distant", "direction": (-0.4, -1.0, 0.5),
                 "rgb": (1.0, 1.0, 1.0), "scale": 4.0},
                {"kind": "ambient", "spd_named": "stdillum-D65",
                 "scale": 0.15}],
        mesh=(mesh, jnp.zeros((mesh.n_triangles,), jnp.int32)),
        use_octree=True, octree_capacity=cap)
    build_dt = time.perf_counter() - t0
    camera = cam.PerspectiveCamera.create((0, 12, -52), (res, res),
                                          fov_y=45.0, look_at=(0, -1, 0))
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=spp),
        integrator="direct", max_depth=1)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)

    @jax.jit
    def one_pass(scene, sample_idx):
        return integ.render_pass(scene, camera, cfg, filter_obj, sensor,
                                 sample_idx)

    t0 = time.perf_counter()
    rgb, wt = one_pass(scene, jnp.uint32(0))
    jax.block_until_ready((rgb, wt))
    compile_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(spp):
        rgb, wt = one_pass(scene, jnp.uint32(i + 1))
    jax.block_until_ready((rgb, wt))
    dt = (time.perf_counter() - t0) / spp

    pk = scene.packed_octree
    mem = _hbm_report()
    return {
        "n_triangles": int(scene.mesh.n_triangles),
        "leaf_cap": cap,
        "rays_per_sec": round(res * res * 2 / dt, 1),
        "sec_per_spp_pass": round(dt, 4),
        "octree": scene.octree.info(),
        "leaf_table_mb": round(int(pk.leaf_verts.size) * 4 / 2**20),
        "hbm": mem,
        "scene_build_sec": round(build_dt, 1),
        "compile_sec": round(compile_dt, 1),
        "img_mean": round(float(jnp.mean(rgb)), 5),
    }


def bench_dragon2m():
    """Opt-in (BENCH_MESH2M=1) 2,000,000-triangle scale probe: the same
    irregular-mesh pipeline at 2.3x the canonical triangle count — a
    memory/scale statement (the r4 one-triangle-per-row layout could not
    hold this mesh: its leaf table would have been ~1.9 GB; packed rows
    hold it in ~227 MB)."""
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models.scene import Scene
    from computational_ray_tracer_tpu.models import integrator as integ
    from computational_ray_tracer_tpu.ops import camera as cam
    from computational_ray_tracer_tpu.ops import triangle as trimod
    from computational_ray_tracer_tpu.utils import mesh_gen

    res = _env("BENCH_MESH_RES", 512)
    t0 = time.perf_counter()
    v, f, uv = mesh_gen.dragon_stand_in(target_tris=2_000_000)
    mesh = trimod.MeshData.build(v, f, uvs=uv)
    scene = Scene.build(
        materials=[{"kind": "diffuse", "albedo_rgb": (0.7, 0.64, 0.52)}],
        lights=[{"kind": "distant", "direction": (-0.4, -1.0, 0.5),
                 "rgb": (1.0, 1.0, 1.0), "scale": 4.0},
                {"kind": "ambient", "spd_named": "stdillum-D65",
                 "scale": 0.15}],
        mesh=(mesh, jnp.zeros((mesh.n_triangles,), jnp.int32)),
        use_octree=True, octree_capacity=160)
    build_dt = time.perf_counter() - t0
    camera = cam.PerspectiveCamera.create((0, 12, -52), (res, res),
                                          fov_y=45.0, look_at=(0, -1, 0))
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=4),
        integrator="direct", max_depth=1)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)

    @jax.jit
    def one_pass(scene, sample_idx):
        return integ.render_pass(scene, camera, cfg, filter_obj, sensor,
                                 sample_idx)

    t0 = time.perf_counter()
    rgb, wt = one_pass(scene, jnp.uint32(0))
    jax.block_until_ready((rgb, wt))
    compile_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(4):
        rgb, wt = one_pass(scene, jnp.uint32(i + 1))
    jax.block_until_ready((rgb, wt))
    dt = (time.perf_counter() - t0) / 4
    pk = scene.packed_octree
    return {
        "n_triangles": int(mesh.n_triangles),
        "rays_per_sec": round(res * res * 2 / dt, 1),
        "sec_per_spp_pass": round(dt, 4),
        "octree": scene.octree.info(),
        "leaf_table_mb": round(int(pk.leaf_verts.size) * 4 / 2**20),
        "hbm": _hbm_report(),
        "scene_build_sec": round(build_dt, 1),
        "compile_sec": round(compile_dt, 1),
        "img_mean": round(float(jnp.mean(rgb)), 5),
    }


def bench_flagship(dragon_scene=None):
    """The reference's canonical end-to-end workload
    (RayTracerTestApp.h:70-189): dragon-class textured mesh + octree +
    thin-lens perspective camera + stratified sampling + path/MIS +
    gaussian filter + sensor resolve, 512x512."""
    import jax
    import jax.numpy as jnp
    import dataclasses as dc
    from computational_ray_tracer_tpu.models import integrator as integ
    from computational_ray_tracer_tpu.models.scene import Scene
    from computational_ray_tracer_tpu.ops import camera as cam
    from computational_ray_tracer_tpu.ops import color as colorlib
    from computational_ray_tracer_tpu.utils import mesh_gen

    res = _env("BENCH_MESH_RES", 512)
    spp = _env("BENCH_MESH_SPP", 4)
    depth = 4

    scene = dragon_scene
    if scene is None:
        scene = _dragon_scene(_env("BENCH_MESH_SUBDIV", 7),
                              _env("BENCH_MESH_CAP", 192))
    # texture the dragon (uvmap.png analog: procedural checker through the
    # rgb2spec sigmoid table) and light it like the reference scene
    tex = mesh_gen.checker_texture(256)
    img = jnp.asarray(np.asarray(tex, np.float32))
    table = colorlib.RGBToSpectrumTable.srgb()
    tex_coeffs = table.lookup(img.reshape(-1, 3)).reshape(*img.shape)
    mats = dc.replace(scene.materials,
                      use_texture=jnp.ones_like(scene.materials.use_texture))
    scene = dc.replace(scene, texture=tex_coeffs, materials=mats)

    camera = cam.PerspectiveCamera.create(
        (0, 0.5, -3.4), (res, res), fov_y=40.0, look_at=(0, 0, 0),
        lens_radius=0.02, focal_distance=3.4)
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="stratified", spp=max(spp, 4),
                                    xs=2, ys=2),
        integrator="path", max_depth=depth,
        filter_name="gaussian", filter_radius=(0.5, 0.5),
        compact=True, compact_quantum=8192)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)

    # Compacted wavefront (render_pass_compact): bounce rays are gathered
    # alive-first sorted by direction octant each depth, which is what
    # keeps the packet octree kernel's frustums coherent for secondary
    # rays — an unsorted full-wavefront bounce loop makes every packet
    # visit most of the tree (and one giant multi-bounce XLA program at
    # 512x512 trips the device watchdog).
    def one_pass(scene, sample_idx):
        return integ.render_pass_compact(scene, camera, cfg, filter_obj,
                                         sensor, sample_idx)

    t0 = time.perf_counter()
    rgb, wt = one_pass(scene, jnp.uint32(0))
    jax.block_until_ready((rgb, wt))
    compile_dt = time.perf_counter() - t0
    # >= 8 warm passes: the compacted loop's occasional per-bucket-size
    # compiles amortize poorly over a 4-pass window (measured 2.77M vs
    # 3.20M rays/s for 4 vs 8 passes on identical steady-state speed)
    n_timed = max(spp, 8)
    t0 = time.perf_counter()
    for i in range(n_timed):
        rgb, wt = one_pass(scene, jnp.uint32(i + 1))
    jax.block_until_ready((rgb, wt))
    dt = (time.perf_counter() - t0) / n_timed

    rays_per_sample = 1 + (depth - 1) + depth
    return {
        "rays_per_sec": round(res * res * rays_per_sample / dt, 1),
        "sec_per_spp_pass": round(dt, 4),
        "passes_timed": n_timed,
        "compile_sec": round(compile_dt, 1),
        "img_mean": round(float(jnp.mean(rgb)), 5),
    }


def bench_canonical():
    """The reference's canonical workload as one committed parity block
    (VERDICT r4 next-step #2): 500x500, stratified 10x10 spp, the 872k-tri
    x15-scale mesh through an octree at the reference's leaf cap 40,
    thin-lens perspective (lens 50 / focal 800), triangle half-pixel
    filter, XYZ sensor + D65, the reference's direct Li (ambient F1 +
    cosine white light, no shadow rays) — RayTracerTestApp.h:103-207.
    Emits the PNG + per-pass wall time + rays/s + a CPU-golden gate."""
    import numpy as np
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    import canonical

    res = _env("BENCH_CANONICAL_RES", 500)
    spp = _env("BENCH_CANONICAL_SPP", 100)
    img, stats = canonical.render(res, spp, cap=40)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "data")
    os.makedirs(out_dir, exist_ok=True)
    from computational_ray_tracer_tpu.utils import image
    png = os.path.join(out_dir, f"canonical_{res}.png")
    image.write_png(png, img)
    stats["png"] = os.path.relpath(png, os.path.dirname(
        os.path.abspath(__file__)))

    # CPU-golden gate: the same pipeline at 64x64 spp 4 vs the committed
    # golden (tests/golden/canonical_64.npy, generated on CPU).
    img64, _ = canonical.render(64, 4, cap=40)
    stats["golden_gate"] = canonical.check_golden(img64)
    return stats


def bench_deep512(dragon_scene=None):
    """512^2 depth-8 render through the PUBLIC render() driver (VERDICT r4
    weak #4 done-criterion): cfg.compact routes the host-driven compacted
    bounce loop — the only code path that survives this depth/resolution
    (the full-wavefront program trips the TPU watchdog,
    benchmarks/compaction.json)."""
    import jax
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models import integrator as integ
    from computational_ray_tracer_tpu.ops import camera as cam

    res = 512
    scene = dragon_scene
    if scene is None:
        scene = _dragon_scene(_env("BENCH_MESH_SUBDIV", 7),
                              _env("BENCH_MESH_CAP", 192))
    camera = cam.PerspectiveCamera.create((0, 0.5, -3.4), (res, res),
                                          fov_y=40.0, look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=2),
        integrator="path", max_depth=8,
        compact=True, compact_quantum=8192)
    t0 = time.perf_counter()
    film, sensor = integ.render(scene, camera, cfg, passes=1)
    jax.block_until_ready(film.rgb_sum)
    cold = time.perf_counter() - t0
    # steady state: later passes can still hit novel compacted-bucket
    # sizes (each size compiles once); report the fastest of a few
    cfg_more = dataclasses.replace(
        cfg, sampler=dataclasses.replace(cfg.sampler, spp=4))
    warm = None
    for _ in range(3):
        t0 = time.perf_counter()
        film, sensor = integ.render(scene, camera, cfg_more, film=film,
                                    passes=1)
        jax.block_until_ready(film.rgb_sum)
        dt = time.perf_counter() - t0
        warm = dt if warm is None else min(warm, dt)
    rays = res * res * (1 + 7 + 8)
    return {"res": res, "max_depth": 8,
            "compile_plus_first_pass_sec": round(cold, 1),
            "warm_pass_sec": round(warm, 3),
            "rays_per_sec_warm": round(rays / warm, 1),
            "img_mean": round(float(jnp.mean(
                film.rgb_sum / jnp.maximum(film.weight_sum[..., None],
                                           1e-9))), 5),
            "ok": True}


def bench_golden_gate():
    """Render the 128x128 Cornell golden config on THIS device and compare
    against the checked-in CPU golden (BASELINE.md row 3 cross-check)."""
    import jax
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from test_golden import golden2_cornell_path, _render

    img = _render(lambda: golden2_cornell_path(res=128, spp=4))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "golden", "config2_cornell_path_128.npy")
    golden = np.load(path)
    atol = 2e-3 * max(float(golden.max()), 1e-3)
    max_diff = float(np.abs(img - golden).max())
    return {"max_abs_diff": round(max_diff, 6),
            "atol": round(atol, 6),
            "ok": bool(max_diff <= atol)}


def bench_grad_check():
    """TPU gradient consistency: d(loss)/d(albedo) on a mesh+octree scene
    with the Pallas packet forward must match the jnp lockstep-traversal
    oracle (the kernel's hit ids carry zero tangents by design — both
    paths must therefore produce the same reparameterized gradient)."""
    import jax
    import jax.numpy as jnp
    import dataclasses as dc
    from computational_ray_tracer_tpu.models import integrator as integ
    from computational_ray_tracer_tpu.ops import camera as cam

    scene = _dragon_scene(3, 16)            # 1280 tris: fast, still packed
    res = 32
    camera = cam.PerspectiveCamera.create((0, 0.5, -3.4), (res, res),
                                          fov_y=40.0, look_at=(0, 0, 0))
    cfg = integ.RenderConfig(
        resolution=(res, res),
        sampler=integ.SamplerConfig(kind="sobol", spp=2),
        integrator="path", max_depth=2)
    filter_obj = integ.make_filter(cfg)
    sensor = integ.make_sensor(cfg)

    def make_loss(scene_var):
        def loss(coeffs):
            s = dc.replace(scene_var, materials=dc.replace(
                scene_var.materials, albedo_coeffs=coeffs))
            rgb, wt = integ.render_pass(s, camera, cfg, filter_obj, sensor,
                                        jnp.uint32(0))
            return jnp.mean(rgb)
        return loss

    coeffs = scene.materials.albedo_coeffs
    # Pallas forward (auto-selected on TPU)
    g_pallas = jax.jit(jax.grad(make_loss(scene)))(coeffs)
    # jnp lockstep-traversal oracle on the same device
    scene_jnp = dc.replace(scene, packed_octree=None)
    g_jnp = jax.jit(jax.grad(make_loss(scene_jnp)))(coeffs)
    g_pallas = np.asarray(g_pallas)
    g_jnp = np.asarray(g_jnp)
    scale = max(float(np.abs(g_jnp).max()), 1e-12)
    max_rel = float(np.abs(g_pallas - g_jnp).max() / scale)
    return {"grad_max_rel_diff": round(max_rel, 6),
            "grad_linf_oracle": round(float(np.abs(g_jnp).max()), 8),
            "ok": bool(max_rel < 1e-3)}


def _enable_compile_cache():
    """Persistent XLA compilation cache (works through the remote TPU
    compile helper: flagship first-pass compile measured 52.7 s cold ->
    15.1 s warm across processes). Opt out with CRT_XLA_CACHE=0."""
    if os.environ.get("CRT_XLA_CACHE", "1") == "0":
        return
    import jax
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".cache", "xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    import jax
    _enable_compile_cache()

    res = _env("BENCH_RES", 256)
    spp = _env("BENCH_SPP", 1024)
    cornell = bench_cornell(res, spp)
    detail = {"device": str(jax.devices()[0]), **cornell}

    dragon_scene = None
    if os.environ.get("BENCH_MESH", "1") != "0":
        dragon_scene, detail["mesh"] = bench_dragon()
    if os.environ.get("BENCH_MESH870", "1") != "0":
        detail["mesh870"] = bench_dragon870()
    if os.environ.get("BENCH_MESH2M", "0") == "1":     # opt-in scale probe
        detail["mesh2m"] = bench_dragon2m()
    if os.environ.get("BENCH_FLAGSHIP", "1") != "0":
        detail["flagship"] = bench_flagship(dragon_scene)
    if os.environ.get("BENCH_CANONICAL", "1") != "0":
        detail["canonical"] = bench_canonical()
    if os.environ.get("BENCH_DEEP512", "1") != "0":
        detail["deep512"] = bench_deep512(dragon_scene)
    if os.environ.get("BENCH_GOLDEN", "1") != "0":
        detail["golden_gate"] = bench_golden_gate()
    if os.environ.get("BENCH_GRAD", "1") != "0":
        detail["grad_check"] = bench_grad_check()

    rays_per_sec = detail.pop("rays_per_sec")
    # vs_baseline is anchored to the PREVIOUS round's committed headline
    # (VERDICT r3 item 8: round-over-round is the honest ratio); the
    # round-0 capture is also reported so the long-run trend stays visible.
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline.json")
    prev_round = round0 = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            b = json.load(f)
        prev_round = b.get("prev_round_rays_per_sec") or b.get("rays_per_sec")
        round0 = b.get("round0_rays_per_sec") or b.get("rays_per_sec")
    if prev_round is None:
        # first ever run: seed the anchor file (updated once per round,
        # by hand, to the committed BENCH_r{N}.json headline)
        prev_round = round0 = rays_per_sec
        os.makedirs(os.path.dirname(base_path), exist_ok=True)
        with open(base_path, "w") as f:
            json.dump({"prev_round_rays_per_sec": rays_per_sec,
                       "round0_rays_per_sec": round0, "res": res,
                       "device": str(jax.devices()[0])}, f)
    detail["vs_round0"] = round(rays_per_sec / round0, 4)

    print(json.dumps({
        "metric": f"rays_per_sec_per_chip_cornell_{res}x{res}_path4",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / prev_round, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
