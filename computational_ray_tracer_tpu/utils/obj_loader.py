"""Minimal Wavefront OBJ loader.

Capability parity with the reference's Assimp-based importer
(``RayTracer/AssetManager.cpp:67-191``: triangulated positions, normals,
texcoords, tangent generation, missing-attribute defaults) without the
external dependency: a small, dependency-free OBJ parser feeding
``MeshData.build`` (which generates normals/tangents when absent). A
host-side ``MeshCache`` mirrors the reference's static model cache
(AssetManager.h:60-65)."""

from __future__ import annotations

import numpy as np


def load_obj(path, native=None):
    """Parse an OBJ file into (positions, indices, normals, uvs) arrays.

    Faces are triangulated (fan) like Assimp's aiProcess_Triangulate.
    Per-corner normal/uv indices are resolved by splitting vertices on
    unique (v, vt, vn) triples.

    native: True forces the C++ loader (native/mesh_loader.cpp), False the
    Python parser; None (default) prefers native with Python fallback. Both
    produce identical arrays (asserted in tests/test_native_mesh.py)."""
    if native is not False:
        out = _load_obj_native(path)
        if out is not None:
            return out
        if native is True:
            raise RuntimeError("native mesh loader unavailable")
    return _load_obj_python(path)


def _load_obj_native(path):
    import ctypes
    from computational_ray_tracer_tpu import native as nat
    lib = nat.load()
    if lib is None:
        return None
    m = nat.CrtMesh()
    rc = lib.crt_load_obj(str(path).encode(), ctypes.byref(m))
    if rc != 0:
        raise FileNotFoundError(f"crt_load_obj({path}) failed rc={rc}")
    try:
        nv, nt = m.n_verts, m.n_tris
        positions = np.ctypeslib.as_array(m.positions,
                                          (nv, 3)).copy() if nv else np.zeros((0, 3), np.float32)
        indices = np.ctypeslib.as_array(m.indices,
                                        (nt, 3)).copy() if nt else np.zeros((0, 3), np.int32)
        uvs = np.ctypeslib.as_array(m.uvs, (nv, 2)).copy() if nv else np.zeros((0, 2), np.float32)
        normals = (np.ctypeslib.as_array(m.normals, (nv, 3)).copy()
                   if (m.has_normals and nv) else None)
    finally:
        lib.crt_free_mesh(ctypes.byref(m))
    return positions, indices, normals, uvs


def _load_obj_python(path):
    """NumPy oracle for the native loader (reference semantics: fan
    triangulation + unique-corner vertex splitting, AssetManager.cpp:104-191)."""
    vs, vts, vns = [], [], []
    corners = []  # list of (vi, vti, vni) per face corner, triangulated
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                vs.append([float(x) for x in t[1:4]])
            elif t[0] == "vt":
                vts.append([float(t[1]), float(t[2]) if len(t) > 2 else 0.0])
            elif t[0] == "vn":
                vns.append([float(x) for x in t[1:4]])
            elif t[0] == "f":
                face = []
                for c in t[1:]:
                    parts = c.split("/")
                    vi = int(parts[0])
                    vti = int(parts[1]) if len(parts) > 1 and parts[1] else 0
                    vni = int(parts[2]) if len(parts) > 2 and parts[2] else 0
                    face.append((vi, vti, vni))
                for k in range(1, len(face) - 1):  # fan triangulation
                    corners.extend([face[0], face[k], face[k + 1]])

    def resolve(idx, n):
        return idx - 1 if idx > 0 else n + idx

    key_to_new = {}
    positions, normals, uvs, indices = [], [], [], []
    for c in corners:
        if c not in key_to_new:
            key_to_new[c] = len(positions)
            vi, vti, vni = c
            positions.append(vs[resolve(vi, len(vs))])
            uvs.append(vts[resolve(vti, len(vts))] if vti else [0.0, 0.0])
            normals.append(vns[resolve(vni, len(vns))] if vni else None)
        indices.append(key_to_new[c])

    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32).reshape(-1, 3)
    uvs = np.asarray(uvs, np.float32)
    has_normals = all(n is not None for n in normals)
    normals_arr = (np.asarray(normals, np.float32) if has_normals else None)
    return positions, indices, normals_arr, uvs


def load_mtl(path):
    """Parse a Wavefront .mtl file into {name: material dict} usable by
    ``MaterialTable.build`` (reference binds Assimp aiMaterial properties in
    ``RayTracer/AssetManager.cpp:67-103``; this maps the same Blinn-Phong
    fields onto the spectral material kinds):

    - Kd               -> albedo_rgb
    - Ke (nonzero)     -> emission_rgb (+ emission_scale 1)
    - illum 4/6/7/9 or d<1 -> kind dielectric, Ni -> eta (Tf alone is NOT
      a transparency signal — it's a filter color, often 1 1 1 on opaque
      materials)
    - Ks dominant + Ns -> kind rough_conductor, roughness = sqrt(2/(Ns+2))
      (Blinn-Phong exponent -> GGX alpha, the standard conversion)
    - map_Kd           -> texture path stored under 'texture_path' +
                          use_texture=True (caller decides whether to load)
    """
    mats = {}
    cur = None
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t or t[0].startswith("#"):
                continue
            key = t[0]
            if key == "newmtl":
                cur = {"kind": "diffuse", "albedo_rgb": (0.5, 0.5, 0.5)}
                mats[t[1]] = cur
            elif cur is None:
                continue
            elif key == "Kd":
                cur["albedo_rgb"] = tuple(float(x) for x in t[1:4])
            elif key == "Ks":
                cur["_ks"] = tuple(float(x) for x in t[1:4])
            elif key == "Ke":
                ke = tuple(float(x) for x in t[1:4])
                if max(ke) > 0:
                    cur["emission_rgb"] = ke
                    cur["emission_scale"] = 1.0
            elif key == "Ns":
                cur["_ns"] = float(t[1])
            elif key == "Ni":
                cur["eta"] = float(t[1])
            elif key == "d":
                cur["_d"] = float(t[1])
            elif key == "Tr":
                cur["_d"] = 1.0 - float(t[1])
            elif key == "Tf":
                # Tf is a transmission *filter* color, not an amount — many
                # exporters emit "Tf 1 1 1" on fully opaque materials, so it
                # only corroborates transparency (alongside a transmissive
                # illum mode or d < 1), never asserts it by itself.
                cur["_tf"] = tuple(float(x) for x in t[1:4])
            elif key == "illum":
                cur["_illum"] = int(t[1])
            elif key == "map_Kd":
                cur["texture_path"] = t[-1]
                cur["use_texture"] = True
    for m in mats.values():
        m.pop("_tf", None)
        transmissive = (m.pop("_d", 1.0) < 0.999
                        or m.get("_illum", 2) in (4, 6, 7, 9))
        ks = m.pop("_ks", (0.0, 0.0, 0.0))
        ns = m.pop("_ns", 0.0)
        m.pop("_illum", None)
        if transmissive:
            m["kind"] = "dielectric"
            m.setdefault("eta", 1.5)
        elif max(ks) > 0.5 and max(m["albedo_rgb"]) < 0.25 and ns > 1.0:
            m["kind"] = "rough_conductor"
            m["roughness"] = float(min(1.0, (2.0 / (ns + 2.0)) ** 0.5))
    return mats


def load_obj_scene(path):
    """Parse an OBJ *with its .mtl bindings* into
    ``(positions, indices, normals, uvs, tri_mat, materials)`` where
    ``tri_mat`` is an (F,) int32 material index per triangle and
    ``materials`` the ordered material-dict list (first-use order; index 0 is
    a default diffuse when faces precede any usemtl).

    This is the multi-material import path of the reference's
    ``ASSIMPLoader::Load`` (AssetManager.cpp:67-191), which walks
    aiMesh::mMaterialIndex per submesh; here the per-face ``usemtl`` runs
    play that role."""
    import os as _os
    vs, vts, vns = [], [], []
    corners, face_mats = [], []
    mtl_defs = {}
    name_to_id = {}
    materials = []

    def mat_id(name):
        if name not in name_to_id:
            name_to_id[name] = len(materials)
            materials.append(mtl_defs.get(
                name, {"kind": "diffuse", "albedo_rgb": (0.5, 0.5, 0.5)}))
        return name_to_id[name]

    cur_mat = None
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                vs.append([float(x) for x in t[1:4]])
            elif t[0] == "vt":
                vts.append([float(t[1]), float(t[2]) if len(t) > 2 else 0.0])
            elif t[0] == "vn":
                vns.append([float(x) for x in t[1:4]])
            elif t[0] == "mtllib":
                mpath = _os.path.join(_os.path.dirname(_os.path.abspath(path)),
                                      t[1])
                if _os.path.exists(mpath):
                    mtl_defs.update(load_mtl(mpath))
            elif t[0] == "usemtl":
                cur_mat = mat_id(t[1])
            elif t[0] == "f":
                if cur_mat is None:
                    cur_mat = mat_id("__default__")
                face = []
                for c in t[1:]:
                    parts = c.split("/")
                    vi = int(parts[0])
                    vti = int(parts[1]) if len(parts) > 1 and parts[1] else 0
                    vni = int(parts[2]) if len(parts) > 2 and parts[2] else 0
                    face.append((vi, vti, vni))
                for k in range(1, len(face) - 1):
                    corners.extend([face[0], face[k], face[k + 1]])
                    face_mats.append(cur_mat)

    def resolve(idx, n):
        return idx - 1 if idx > 0 else n + idx

    key_to_new = {}
    positions, normals, uvs, indices = [], [], [], []
    for c in corners:
        if c not in key_to_new:
            key_to_new[c] = len(positions)
            vi, vti, vni = c
            positions.append(vs[resolve(vi, len(vs))])
            uvs.append(vts[resolve(vti, len(vts))] if vti else [0.0, 0.0])
            normals.append(vns[resolve(vni, len(vns))] if vni else None)
        indices.append(key_to_new[c])

    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32).reshape(-1, 3)
    uvs = np.asarray(uvs, np.float32)
    has_normals = all(n is not None for n in normals)
    normals_arr = (np.asarray(normals, np.float32) if has_normals else None)
    tri_mat = np.asarray(face_mats, np.int32)
    return positions, indices, normals_arr, uvs, tri_mat, materials


def save_obj(path, positions, indices):
    """Write a minimal OBJ (test fixture round-trips)."""
    with open(path, "w") as f:
        for p in np.asarray(positions):
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for t in np.asarray(indices):
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")


class MeshCache:
    """Named model cache (MeshCache::modelCache, AssetManager.cpp:6).
    Dispatches on file extension: .obj via load_obj, .ply via
    utils.ply_loader.load_ply."""
    _cache = {}

    @classmethod
    def load(cls, name, path, transform=None):
        from computational_ray_tracer_tpu.ops.triangle import MeshData
        key = (name, id(transform))
        if key not in cls._cache:
            if str(path).lower().endswith(".ply"):
                from computational_ray_tracer_tpu.utils.ply_loader import load_ply
                pos, idx, nrm, uv = load_ply(path)
            else:
                pos, idx, nrm, uv = load_obj(path)
            cls._cache[key] = MeshData.build(pos, idx, normals=nrm, uvs=uv,
                                             transform=transform)
        return cls._cache[key]

    @classmethod
    def clear(cls):
        cls._cache.clear()
