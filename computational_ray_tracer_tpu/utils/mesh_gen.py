"""Procedural mesh generation (hermetic test fixtures).

The reference loads its scenes from external model files that are absent
from its repo (``Game_Data/models/*``, RayTracerTestApp.h:70-73) — here we
generate equivalent geometry procedurally so every test and benchmark is
self-contained (SURVEY §7 hard parts: host-side scene assets).
"""

from __future__ import annotations

import math

import numpy as np


def quad(corner, edge1, edge2, flip=False):
    """Two triangles covering a parallelogram. Returns (positions (4,3),
    indices (2,3), uvs (4,2)). Winding gives the normal along
    cross(edge1, edge2) unless flipped."""
    c = np.asarray(corner, np.float32)
    e1 = np.asarray(edge1, np.float32)
    e2 = np.asarray(edge2, np.float32)
    pos = np.stack([c, c + e1, c + e1 + e2, c + e2])
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    if flip:
        idx = idx[:, ::-1].copy()
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return pos, idx, uv


def merge_meshes(parts):
    """parts: list of (positions, indices, uvs [, face_material]) tuples.
    Returns (positions, indices, uvs, tri_materials)."""
    pos_all, idx_all, uv_all, mat_all = [], [], [], []
    base = 0
    for part in parts:
        pos, idx, uv = part[:3]
        m = part[3] if len(part) > 3 else 0
        pos_all.append(pos)
        idx_all.append(np.asarray(idx) + base)
        uv_all.append(uv)
        mat_all.append(np.full(len(idx), m, np.int32))
        base += len(pos)
    return (np.concatenate(pos_all), np.concatenate(idx_all),
            np.concatenate(uv_all), np.concatenate(mat_all))


def box(lo, hi, flip=False):
    """12-triangle axis-aligned box with outward normals (inward if flip)."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    d = hi - lo
    ex = np.asarray([d[0], 0, 0], np.float32)
    ey = np.asarray([0, d[1], 0], np.float32)
    ez = np.asarray([0, 0, d[2]], np.float32)
    # each face's (edge1, edge2) order makes cross(edge1, edge2) point
    # outward, so the unflipped winding gives outward geometric normals
    faces = [
        quad(lo, ez, ey, flip=flip),            # -x
        quad(lo + ex, ey, ez, flip=flip),       # +x
        quad(lo, ex, ez, flip=flip),            # -y
        quad(lo + ey, ez, ex, flip=flip),       # +y
        quad(lo, ey, ex, flip=flip),            # -z
        quad(lo + ez, ex, ey, flip=flip),       # +z
    ]
    return merge_meshes(faces)[:3]


def uv_sphere(center, radius, n_theta=16, n_phi=32):
    """Lat-long triangulated sphere."""
    c = np.asarray(center, np.float32)
    verts, uvs = [], []
    for i in range(n_theta + 1):
        theta = math.pi * i / n_theta
        for j in range(n_phi + 1):
            phi = 2 * math.pi * j / n_phi
            p = np.asarray([math.sin(theta) * math.cos(phi),
                            math.sin(theta) * math.sin(phi),
                            math.cos(theta)], np.float32)
            verts.append(c + radius * p)
            uvs.append([j / n_phi, i / n_theta])
    idx = []
    stride = n_phi + 1
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * stride + j
            b = a + 1
            cc = a + stride
            dd = cc + 1
            if i > 0:
                idx.append([a, cc, b])
            if i < n_theta - 1:
                idx.append([b, cc, dd])
    return (np.asarray(verts, np.float32), np.asarray(idx, np.int32),
            np.asarray(uvs, np.float32))


def cornell_box(size=2.0, light_frac=0.5):
    """The classic five-walled Cornell box in [-s/2, s/2]^3, open toward -z
    viewers, with a ceiling light quad.

    Returns (positions, indices, uvs, tri_materials, light_quad) where
    materials are 0=white walls, 1=red left, 2=green right, 3=light, and
    light_quad = (corner, edge1, edge2) for the matching area light
    (BASELINE config 2)."""
    s = size / 2.0
    parts = [
        quad((-s, -s, -s), (0, 0, size), (size, 0, 0), False) + (0,),   # floor (+y normal)
        quad((-s, s, -s), (size, 0, 0), (0, 0, size), False) + (0,),    # ceiling (-y normal)
        quad((-s, -s, s), (0, size, 0), (size, 0, 0), False) + (0,),    # back (-z normal)
        quad((-s, -s, -s), (0, size, 0), (0, 0, size), False) + (1,),   # left red (+x normal)
        quad((s, -s, -s), (0, 0, size), (0, size, 0), False) + (2,),    # right green (-x normal)
    ]
    # ceiling light quad slightly below the ceiling. Edge order chosen so
    # cross(edge1, edge2) = -y: the light emits DOWNWARD (one-sided quad
    # light convention in models/lights.py).
    lf = light_frac * size / 2.0
    lc = np.asarray([-lf, s - 0.005 * size, -lf], np.float32)
    le1 = np.asarray([2 * lf, 0, 0], np.float32)
    le2 = np.asarray([0, 0, 2 * lf], np.float32)
    lq = quad(lc, le2, le1, False) + (3,)
    parts.append(lq)
    pos, idx, uv, mats = merge_meshes(parts)
    return pos, idx, uv, mats, (lc, le1, le2)


def icosphere(subdiv=3, radius=1.0, center=(0.0, 0.0, 0.0)):
    """Subdivided icosahedron projected to a sphere: 20·4^subdiv faces with
    shared vertices (subdiv=7 -> 327,680 tris — the dragon-class scale of
    RayTracerTestApp.h:70-106). Vectorized midpoint subdivision."""
    t = (1.0 + math.sqrt(5.0)) / 2.0
    verts = np.asarray([
        (-1, t, 0), (1, t, 0), (-1, -t, 0), (1, -t, 0),
        (0, -1, t), (0, 1, t), (0, -1, -t), (0, 1, -t),
        (t, 0, -1), (t, 0, 1), (-t, 0, -1), (-t, 0, 1)], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.asarray([
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)], np.int64)

    for _ in range(subdiv):
        nv = verts.shape[0]
        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])          # (3F, 2)
        e_sorted = np.sort(e, axis=1)
        key = e_sorted[:, 0] * (nv + 1) + e_sorted[:, 1]
        uniq, inv = np.unique(key, return_inverse=True)
        mid_pairs = np.stack([uniq // (nv + 1), uniq % (nv + 1)], axis=1)
        mids = verts[mid_pairs[:, 0]] + verts[mid_pairs[:, 1]]
        mids /= np.linalg.norm(mids, axis=1, keepdims=True)
        mid_ids = nv + inv.reshape(3, -1)               # (3, F)
        a, b, c = faces[:, 0], faces[:, 1], faces[:, 2]
        ab, bc, ca = mid_ids[0], mid_ids[1], mid_ids[2]
        faces = np.concatenate([
            np.stack([a, ab, ca], axis=1),
            np.stack([b, bc, ab], axis=1),
            np.stack([c, ca, bc], axis=1),
            np.stack([ab, bc, ca], axis=1)])
        verts = np.concatenate([verts, mids])

    verts = np.asarray(center, np.float64) + radius * verts
    # spherical uvs
    rel = verts - np.asarray(center, np.float64)
    u = 0.5 + np.arctan2(rel[:, 1], rel[:, 0]) / (2 * math.pi)
    v = 0.5 - np.arcsin(np.clip(rel[:, 2] / radius, -1, 1)) / math.pi
    uvs = np.stack([u, v], axis=1)
    return (verts.astype(np.float32), faces.astype(np.int32),
            uvs.astype(np.float32))


def displaced_icosphere(subdiv=7, radius=1.0, center=(0.0, 0.0, 0.0),
                        amplitude=0.15, seed=7):
    """Dragon-class test mesh: an icosphere with multi-octave sinusoidal
    radial displacement — high triangle count with the non-uniform spatial
    density an octree has to cope with (stand-in for the absent
    stanford-dragon asset, SURVEY §7 hard parts).

    Disk-cached (utils.asset_cache, the MeshCache analog): regeneration
    costs ~2.3 s host NumPy at subdiv 7 and dominated bench scene builds.
    """
    from computational_ray_tracer_tpu.utils import asset_cache
    key = (f"displaced_icosphere_v1_s{subdiv}_r{radius}_c{center[0]}_"
           f"{center[1]}_{center[2]}_a{amplitude}_seed{seed}")
    hit = asset_cache.load(key)
    if hit is not None:
        return hit["verts"], hit["faces"], hit["uvs"]
    verts, faces, uvs = icosphere(subdiv, 1.0, (0.0, 0.0, 0.0))
    rng_ = np.random.RandomState(seed)
    disp = np.zeros(verts.shape[0])
    for octave in range(4):
        freq = 2.0 ** octave * 3.0
        k = rng_.normal(size=(3, 3))
        phase = rng_.uniform(0, 2 * math.pi, size=3)
        for j in range(3):
            disp += (amplitude / (2.0 ** octave)
                     * np.sin(freq * (verts @ k[j]) + phase[j]))
    verts = verts * (1.0 + disp[:, None] / 3.0)
    verts = np.asarray(center, np.float64) + radius * verts
    out = (verts.astype(np.float32), faces.astype(np.int32),
           uvs.astype(np.float32))
    asset_cache.store(key, verts=out[0], faces=out[1], uvs=out[2])
    return out


def checker_texture(n=64, c0=(0.9, 0.9, 0.9), c1=(0.15, 0.15, 0.55)):
    """Simple checkerboard RGB image (the uvmap.png stand-in)."""
    img = np.zeros((n, n, 3), np.float32)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    mask = ((ii // (n // 8) + jj // (n // 8)) % 2).astype(bool)
    img[mask] = np.asarray(c1, np.float32)
    img[~mask] = np.asarray(c0, np.float32)
    return img
