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


# ---------------------------------------------------------------------------
# Native PLY loader vs the Python oracle (second native import format;
# PLY is the reference's flagship-asset format — the Stanford dragon)
# ---------------------------------------------------------------------------

def _ply_fixture_arrays():
    rs = np.random.RandomState(7)
    pos = rs.randn(23, 3).astype(np.float32)
    nrm = rs.randn(23, 3).astype(np.float32)
    uv = rs.rand(23, 2).astype(np.float32)
    idx = rs.randint(0, 23, (31, 3)).astype(np.int32)
    return pos, idx, nrm, uv


@pytest.mark.parametrize("binary", [False, True])
@pytest.mark.parametrize("with_attrs", [False, True])
def test_native_ply_matches_python(tmp_path, binary, with_attrs):
    from computational_ray_tracer_tpu.utils import ply_loader

    pos, idx, nrm, uv = _ply_fixture_arrays()
    p = tmp_path / "m.ply"
    ply_loader.save_ply(p, pos, idx,
                        normals=nrm if with_attrs else None,
                        uvs=uv if with_attrs else None, binary=binary)
    out_py = ply_loader.load_ply(p, native=False)
    if native.load() is None:
        pytest.skip("native toolchain unavailable")
    out_nat = ply_loader.load_ply(p, native=True)
    for a, b in zip(out_py, out_nat):
        if a is None or b is None:
            assert a is None and b is None
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_native_ply_big_endian_and_quads(tmp_path):
    """Hand-built big-endian file with uchar/short/double properties and a
    quad face (fan triangulation), plus an unknown element to skip."""
    from computational_ray_tracer_tpu.utils import ply_loader
    import struct

    header = (
        b"ply\nformat binary_big_endian 1.0\n"
        b"comment hand-built\n"
        b"element vertex 4\n"
        b"property double x\nproperty double y\nproperty double z\n"
        b"property uchar red\n"          # skipped vertex property
        b"property float s\nproperty float t\n"
        b"element junk 2\n"
        b"property short a\nproperty list uchar int b\n"
        b"element face 1\n"
        b"property list uchar int vertex_indices\n"
        b"end_header\n")
    body = b""
    verts = [(0, 0, 0, 10, 0.1, 0.2), (1, 0, 0, 20, 0.3, 0.4),
             (1, 1, 0, 30, 0.5, 0.6), (0, 1, 0, 40, 0.7, 0.8)]
    for (x, y, z, r, s_, t_) in verts:
        body += struct.pack(">dddBff", x, y, z, r, s_, t_)
    body += struct.pack(">hBii", 7, 2, 1, 2)      # junk rows
    body += struct.pack(">hBi", 9, 1, 3)
    body += struct.pack(">Biiii", 4, 0, 1, 2, 3)  # quad face
    p = tmp_path / "be.ply"
    p.write_bytes(header + body)

    out_py = ply_loader.load_ply(p, native=False)
    if native.load() is None:
        pytest.skip("native toolchain unavailable")
    out_nat = ply_loader.load_ply(p, native=True)
    pos, idx, nrm, uv = out_nat
    assert idx.shape == (2, 3)                    # quad -> 2 fan tris
    np.testing.assert_array_equal(idx, [[0, 1, 2], [0, 2, 3]])
    assert nrm is None
    np.testing.assert_allclose(uv[:, 0], [0.1, 0.3, 0.5, 0.7], atol=1e-6)
    for a, b in zip(out_py, out_nat):
        if a is None or b is None:
            assert a is None and b is None
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
