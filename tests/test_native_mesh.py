"""Native C++ OBJ loader vs the Python oracle (AssetManager capability,
AssetManager.cpp:67-191: triangulation, attribute resolution, defaults)."""

import textwrap

import numpy as np
import pytest

from computational_ray_tracer_tpu import native
from computational_ray_tracer_tpu.utils import obj_loader

OBJ_FULL = textwrap.dedent("""\
    # full attributes, quads + tris, negative indices
    v 0 0 0
    v 1 0 0
    v 1 1 0
    v 0 1 0
    v 0.5 0.5 1
    vt 0 0
    vt 1 0
    vt 1 1
    vt 0 1
    vn 0 0 1
    vn 0 0 -1
    f 1/1/1 2/2/1 3/3/1 4/4/1
    f -5/-4/2 -4/-3/2 -1/-2/2
    """)

OBJ_POS_ONLY = textwrap.dedent("""\
    v 0 0 0
    v 2 0 0
    v 0 2 0
    v 0 0 2
    f 1 2 3
    f 1 3 4
    f 2 4 3
    """)

OBJ_MIXED = textwrap.dedent("""\
    v 0 0 0
    v 1 0 0
    v 0 1 0
    vt 0.25 0.75
    f 1/1 2/1 3/1
    f 1//  2// 3//
    """)


def _native_available():
    return native.load() is not None


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("src", [OBJ_FULL, OBJ_POS_ONLY, OBJ_MIXED],
                         ids=["full", "pos-only", "mixed"])
def test_native_matches_python(tmp_path, src):
    p = tmp_path / "m.obj"
    p.write_text(src)
    pn, in_, nn, un = obj_loader.load_obj(p, native=True)
    pp, ip, np_, up = obj_loader.load_obj(p, native=False)
    np.testing.assert_array_equal(in_, ip)
    np.testing.assert_allclose(pn, pp)
    np.testing.assert_allclose(un, up)
    assert (nn is None) == (np_ is None)
    if nn is not None:
        np.testing.assert_allclose(nn, np_)


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_large_random_mesh(tmp_path):
    rng = np.random.default_rng(7)
    pos = rng.normal(size=(500, 3)).astype(np.float32)
    idx = rng.integers(0, 500, size=(2000, 3)).astype(np.int32)
    p = tmp_path / "big.obj"
    obj_loader.save_obj(p, pos, idx)
    pn, in_, nn, _ = obj_loader.load_obj(p, native=True)
    pp, ip, np_, _ = obj_loader.load_obj(p, native=False)
    np.testing.assert_array_equal(in_, ip)
    np.testing.assert_allclose(pn, pp)
    assert nn is None and np_ is None


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_missing_file():
    with pytest.raises(FileNotFoundError):
        obj_loader.load_obj("/nonexistent/nope.obj", native=True)
