"""Native (C++) runtime components, loaded via ctypes.

The reference implements its whole runtime in C++; here the JAX/XLA/Pallas
path owns the device compute, and the one-shot host-side runtime pieces that
are performance-critical — the octree builder
(Octtree_Model::CreateOcttree capability, ~100x over the NumPy builder on
large meshes) and the OBJ/PLY mesh loaders (AssetManager capability) — are
C++ compiled on first use into ``libcrt_native.so``.

``load()`` returns the ctypes library or None (missing toolchain), letting
callers fall back to the NumPy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcrt_native.so")
_SRC = [os.path.join(_DIR, "octree_builder.cpp"),
        os.path.join(_DIR, "mesh_loader.cpp"),
        os.path.join(_DIR, "ply_loader.cpp")]
_lock = threading.Lock()
_lib = None
_tried = False


class CrtOctree(ctypes.Structure):
    _fields_ = [
        ("n_nodes", ctypes.c_int64),
        ("n_leaves", ctypes.c_int64),
        ("leaf_cap", ctypes.c_int64),
        ("node_lo", ctypes.POINTER(ctypes.c_float)),
        ("node_hi", ctypes.POINTER(ctypes.c_float)),
        ("node_child0", ctypes.POINTER(ctypes.c_int32)),
        ("node_leaf_id", ctypes.POINTER(ctypes.c_int32)),
        ("leaf_tris", ctypes.POINTER(ctypes.c_int32)),
        ("leaf_counts", ctypes.POINTER(ctypes.c_int32)),
    ]


class CrtMesh(ctypes.Structure):
    _fields_ = [
        ("n_verts", ctypes.c_int64),
        ("n_tris", ctypes.c_int64),
        ("has_normals", ctypes.c_int32),
        ("has_uvs", ctypes.c_int32),
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("indices", ctypes.POINTER(ctypes.c_int32)),
        ("uvs", ctypes.POINTER(ctypes.c_float)),
        ("normals", ctypes.POINTER(ctypes.c_float)),
    ]


def _compile():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO] + _SRC
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Compile (if needed) and load the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            src_mtime = max(os.path.getmtime(s) for s in _SRC)
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < src_mtime):
                _compile()
            lib = ctypes.CDLL(_SO)
            lib.crt_build_octree.restype = ctypes.c_int
            lib.crt_build_octree.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
                ctypes.POINTER(CrtOctree)]
            lib.crt_free_octree.restype = None
            lib.crt_free_octree.argtypes = [ctypes.POINTER(CrtOctree)]
            lib.crt_load_obj.restype = ctypes.c_int
            lib.crt_load_obj.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(CrtMesh)]
            lib.crt_load_ply.restype = ctypes.c_int
            lib.crt_load_ply.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(CrtMesh)]
            lib.crt_free_mesh.restype = None
            lib.crt_free_mesh.argtypes = [ctypes.POINTER(CrtMesh)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib
