"""On-disk asset cache for generated/parsed geometry.

The reference keeps every loaded model in a process-global ``modelCache``
so repeated loads are free (``RayTracer/AssetManager.h:60-65``,
``AssetManager.cpp:6``). Our assets are procedural (hermetic fixtures) or
parsed from OBJ/PLY, so the equivalent is a small content-keyed *disk*
cache: regenerating the 327k-tri displaced icosphere costs ~2.3 s of host
NumPy per process, which dominates scene-build time for benchmarks that
spawn fresh processes.

Layout: ``<repo>/.cache/assets/<key>.npz`` holding named float/int arrays.
Keys must encode every generation parameter; the cache is content-agnostic
(no invalidation beyond the key), so bump the ``v=`` version in the key if
a generator's semantics change.
"""

from __future__ import annotations

import os

import numpy as np

_CACHE_DIR = os.environ.get(
    "CRT_ASSET_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".cache", "assets"))


def cache_path(key: str) -> str:
    return os.path.join(_CACHE_DIR, f"{key}.npz")


def load(key: str):
    """Return the dict of arrays cached under ``key``, or None."""
    path = cache_path(key)
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        return None            # corrupt/partial file: regenerate


def store(key: str, **arrays) -> None:
    """Atomically cache named arrays under ``key`` (best-effort)."""
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        # np.savez appends .npz unless the name already ends with it —
        # keep the suffix so the atomic rename targets the real file
        tmp = cache_path(key + f".tmp{os.getpid()}")
        np.savez(tmp, **arrays)
        os.replace(tmp, cache_path(key))
    except OSError:
        pass                   # cache is an optimization, never a failure


def cached(key: str, generate, names):
    """Load ``names`` from the cache or run ``generate()`` (returning a
    tuple matching ``names``) and store it. Returns the tuple."""
    hit = load(key)
    if hit is not None and all(n in hit for n in names):
        return tuple(hit[n] for n in names)
    out = generate()
    store(key, **dict(zip(names, out)))
    return out
