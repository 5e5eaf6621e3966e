"""Stanford PLY mesh loader (ascii + binary little/big endian).

Second import format beside OBJ, matching the reference's multi-format
Assimp path (``RayTracer/AssetManager.cpp:67-191`` loads fbx/dae/obj via
``aiImportFile``; PLY is the canonical format of its flagship asset, the
Stanford dragon). Vertex properties x/y/z, optional nx/ny/nz normals and
u/v (or s/t) texcoords are mapped onto the same ``(positions, indices,
normals, uvs)`` arrays ``MeshData.build`` consumes; face lists are fan-
triangulated like Assimp's aiProcess_Triangulate."""

from __future__ import annotations

import numpy as np

_PLY_TYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def load_ply(path, native=None):
    """Parse a PLY file into (positions, indices, normals, uvs).

    Returns float32/int32 arrays; normals/uvs are None when the file
    carries no nx/ny/nz (resp. u/v or s/t) properties.

    native: True forces the C++ loader (native/ply_loader.cpp), False the
    Python parser; None (default) prefers native with Python fallback.
    Both produce identical arrays (asserted in tests/test_native_mesh.py).
    """
    if native is not False:
        out = _load_ply_native(path)
        if out is not None:
            return out
        if native is True:
            raise RuntimeError("native PLY loader unavailable")
    return _load_ply_python(path)


def _load_ply_native(path):
    import ctypes
    from computational_ray_tracer_tpu import native as nat
    lib = nat.load()
    if lib is None:
        return None
    m = nat.CrtMesh()
    rc = lib.crt_load_ply(str(path).encode(), ctypes.byref(m))
    if rc != 0:
        raise ValueError(f"crt_load_ply({path}) failed rc={rc}")
    try:
        nv, nt = m.n_verts, m.n_tris
        positions = (np.ctypeslib.as_array(m.positions, (nv, 3)).copy()
                     if nv else np.zeros((0, 3), np.float32))
        indices = (np.ctypeslib.as_array(m.indices, (nt, 3)).copy()
                   if nt else np.zeros((0, 3), np.int32))
        uvs = (np.ctypeslib.as_array(m.uvs, (nv, 2)).copy()
               if (m.has_uvs and nv) else None)
        normals = (np.ctypeslib.as_array(m.normals, (nv, 3)).copy()
                   if (m.has_normals and nv) else None)
    finally:
        lib.crt_free_mesh(ctypes.byref(m))
    return positions, indices, normals, uvs


def _load_ply_python(path):
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # list of (name, count, [(prop_name, dtype|list-spec)])
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unterminated PLY header")
            t = line.decode("ascii", "replace").split()
            if not t or t[0] == "comment":
                continue
            if t[0] == "format":
                fmt = t[1]
            elif t[0] == "element":
                elements.append((t[1], int(t[2]), []))
            elif t[0] == "property":
                if t[1] == "list":
                    elements[-1][2].append(
                        (t[4], ("list", _PLY_TYPES[t[2]], _PLY_TYPES[t[3]])))
                else:
                    elements[-1][2].append((t[2], _PLY_TYPES[t[1]]))
            elif t[0] == "end_header":
                break
        if fmt == "ascii":
            data = _read_ascii(f, elements)
        elif fmt in ("binary_little_endian", "binary_big_endian"):
            data = _read_binary(f, elements,
                                "<" if fmt == "binary_little_endian" else ">")
        else:
            raise ValueError(f"{path}: unknown PLY format {fmt!r}")

    vert = data.get("vertex")
    if vert is None:
        raise ValueError(f"{path}: no vertex element")
    positions = np.stack([vert["x"], vert["y"], vert["z"]],
                         axis=1).astype(np.float32)
    normals = None
    if all(k in vert for k in ("nx", "ny", "nz")):
        normals = np.stack([vert["nx"], vert["ny"], vert["nz"]],
                           axis=1).astype(np.float32)
    uvs = None
    for ku, kv in (("u", "v"), ("s", "t")):
        if ku in vert and kv in vert:
            uvs = np.stack([vert[ku], vert[kv]], axis=1).astype(np.float32)
            break

    face = data.get("face", {})
    idx_lists = None
    for key in ("vertex_indices", "vertex_index"):
        if key in face:
            idx_lists = face[key]
            break
    tris = []
    if idx_lists is not None:
        for poly in idx_lists:
            for k in range(1, len(poly) - 1):  # fan triangulation
                tris.append((poly[0], poly[k], poly[k + 1]))
    indices = (np.asarray(tris, np.int32).reshape(-1, 3)
               if tris else np.zeros((0, 3), np.int32))
    return positions, indices, normals, uvs


def _read_ascii(f, elements):
    out = {}
    text = f.read().decode("ascii", "replace").split("\n")
    row = 0
    lines = [ln.split() for ln in text if ln.strip()]
    for name, count, props in elements:
        cols = {p: [] for p, _ in props}
        for _ in range(count):
            t = lines[row]
            row += 1
            pos = 0
            for pname, spec in props:
                if isinstance(spec, tuple):  # list property
                    n = int(t[pos])
                    vals = [float(x) for x in t[pos + 1:pos + 1 + n]]
                    pos += 1 + n
                    cols[pname].append(np.asarray(vals))
                else:
                    cols[pname].append(float(t[pos]))
                    pos += 1
        out[name] = {p: (v if isinstance(v[0], np.ndarray)
                         else np.asarray(v))
                     for p, v in cols.items()} if count else {}
    return out


def _read_binary(f, elements, endian):
    out = {}
    buf = f.read()
    off = 0
    for name, count, props in elements:
        fixed = all(not isinstance(s, tuple) for _, s in props)
        if fixed and count:
            dt = np.dtype([(p, endian + s) for p, s in props])
            arr = np.frombuffer(buf, dtype=dt, count=count, offset=off)
            off += dt.itemsize * count
            out[name] = {p: np.ascontiguousarray(arr[p]) for p, _ in props}
            continue
        cols = {p: [] for p, _ in props}
        for _ in range(count):
            for pname, spec in props:
                if isinstance(spec, tuple):
                    _, cnt_t, val_t = spec
                    cdt = np.dtype(endian + cnt_t)
                    n = int(np.frombuffer(buf, cdt, 1, off)[0])
                    off += cdt.itemsize
                    vdt = np.dtype(endian + val_t)
                    vals = np.frombuffer(buf, vdt, n, off)
                    off += vdt.itemsize * n
                    cols[pname].append(vals)
                else:
                    vdt = np.dtype(endian + spec)
                    cols[pname].append(np.frombuffer(buf, vdt, 1, off)[0])
                    off += vdt.itemsize
        out[name] = {p: (v if v and isinstance(v[0], np.ndarray)
                         else np.asarray(v))
                     for p, v in cols.items()} if count else {}
    return out


def save_ply(path, positions, indices, normals=None, uvs=None, binary=True):
    """Write a PLY file (test fixtures + export path)."""
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32).reshape(-1, 3)
    props = ["property float x", "property float y", "property float z"]
    cols = [positions]
    if normals is not None:
        normals = np.asarray(normals, np.float32)
        props += ["property float nx", "property float ny",
                  "property float nz"]
        cols.append(normals)
    if uvs is not None:
        uvs = np.asarray(uvs, np.float32)
        props += ["property float u", "property float v"]
        cols.append(uvs)
    header = "\n".join(
        ["ply",
         "format binary_little_endian 1.0" if binary else "format ascii 1.0",
         f"element vertex {len(positions)}"] + props +
        [f"element face {len(indices)}",
         "property list uchar int vertex_indices",
         "end_header", ""])
    vdata = np.concatenate(cols, axis=1)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(np.ascontiguousarray(vdata, "<f4").tobytes())
            face = np.empty((len(indices),),
                            np.dtype([("n", "u1"), ("v", "<i4", (3,))]))
            face["n"] = 3
            face["v"] = indices
            f.write(face.tobytes())
        else:
            for row in vdata:
                f.write((" ".join(repr(float(x)) for x in row) + "\n")
                        .encode("ascii"))
            for tri in indices:
                f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n".encode("ascii"))
