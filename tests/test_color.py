"""Color pipeline tests (reference capability: SpectrumColorTestApp.h:181-221
known-answer conversions; color.h sigmoid polynomials; rgb2spec round trips
from FilterFilmTestApp.h:179-198)."""

import numpy as np
import jax.numpy as jnp
import pytest

from computational_ray_tracer_tpu.ops import color as c
from computational_ray_tracer_tpu.ops import spectrum as spec


def test_srgb_matrix_known_values():
    # Canonical sRGB D65 matrix (IEC 61966-2-1).
    expected = np.array([[0.4124, 0.3576, 0.1805],
                         [0.2126, 0.7152, 0.0722],
                         [0.0193, 0.1192, 0.9505]])
    np.testing.assert_allclose(c.SRGB.xyz_from_rgb, expected, atol=2e-4)


def test_rgb_xyz_round_trip():
    rgb = jnp.asarray([[0.2, 0.5, 0.8], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0]])
    back = c.SRGB.to_rgb(c.SRGB.to_xyz(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_white_maps_to_whitepoint():
    xyz = np.asarray(c.SRGB.to_xyz(jnp.asarray([1.0, 1.0, 1.0])))
    xy = xyz[:2] / xyz.sum()
    np.testing.assert_allclose(xy, [0.3127, 0.3290], atol=1e-4)
    assert xyz[1] == pytest.approx(1.0, abs=1e-5)


def test_srgb_dcip3_conversion_round_trip():
    # The known-answer conversion pattern of SpectrumColorTestApp.h:196-221.
    rgb = jnp.asarray([0.7, 0.3, 0.2])
    p3 = c.convert_rgb_colorspace(rgb, c.SRGB, c.DCI_P3)
    back = c.convert_rgb_colorspace(p3, c.DCI_P3, c.SRGB)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)
    # sRGB gamut is inside P3: pure red desaturates (r decreases, g increases)
    red_p3 = np.asarray(c.convert_rgb_colorspace(jnp.asarray([1.0, 0.0, 0.0]),
                                                 c.SRGB, c.DCI_P3))
    assert red_p3[0] < 1.0 and red_p3[1] > 0.0


def test_srgb_transfer_round_trip():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(np.asarray(c.srgb_to_linear(c.linear_to_srgb(x))),
                               np.asarray(x), atol=1e-5)


def test_white_balance_identity():
    m = c.white_balance_matrix((0.3127, 0.3290), (0.3127, 0.3290))
    np.testing.assert_allclose(m, np.eye(3), atol=1e-6)


def test_white_balance_moves_whitepoint():
    m = c.white_balance_matrix((0.4476, 0.4074), (0.3127, 0.3290))  # A -> D65
    xyz_a = np.asarray(c.xyY_to_xyz(jnp.asarray([0.4476, 0.4074])))
    out = m @ xyz_a
    xy = out[:2] / out.sum()
    np.testing.assert_allclose(xy, [0.3127, 0.3290], atol=1e-4)


def test_sigmoid_polynomial_bounds():
    coeffs = jnp.asarray([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0],
                          [-100.0, 0.0, 0.0]])
    lam = jnp.broadcast_to(jnp.linspace(360.0, 830.0, 16), (3, 16))
    r = np.asarray(c.sigmoid_polynomial(coeffs, lam))
    assert np.all((r >= 0) & (r <= 1))
    np.testing.assert_allclose(r[0], 0.5)
    np.testing.assert_allclose(r[1], 1.0, atol=1e-3)
    np.testing.assert_allclose(r[2], 0.0, atol=1e-3)


@pytest.mark.parametrize("rgb", [
    [0.5, 0.5, 0.5], [0.7, 0.2, 0.1], [0.05, 0.6, 0.3], [0.9, 0.9, 0.1],
    [0.1, 0.1, 0.8], [0.01, 0.01, 0.01], [0.95, 0.95, 0.95],
])
def test_rgb2spec_fit_round_trip(rgb):
    # The core rgb2spec guarantee (color.cpp capability): reflectance
    # spectrum integrates back to the requested RGB under D65.
    alb = c.RGBAlbedoSpectrum.from_rgb(jnp.asarray(rgb, jnp.float32))
    lam = jnp.asarray(np.arange(360.0, 831.0, 1.0, dtype=np.float32))
    refl = alb(lam)
    assert float(jnp.min(refl)) >= 0.0 and float(jnp.max(refl)) <= 1.0
    d65 = jnp.asarray(c.SRGB.illuminant)
    cmf = spec._CIE_XYZ_J
    norm = jnp.sum(d65 * cmf[1])
    xyz = jnp.stack([jnp.sum(refl * d65 * cmf[0]),
                     jnp.sum(refl * d65 * cmf[1]),
                     jnp.sum(refl * d65 * cmf[2])]) / norm
    out = np.asarray(c.SRGB.to_rgb(xyz))
    np.testing.assert_allclose(out, rgb, atol=0.01)


def test_rgb_unbounded_scale():
    s = c.RGBUnboundedSpectrum.from_rgb(jnp.asarray([3.0, 1.5, 0.75]))
    lam = jnp.asarray(np.arange(360.0, 831.0, 5.0, dtype=np.float32))
    assert float(jnp.max(s(lam))) > 1.0  # exceeds reflectance bound


def test_rgb_illuminant_spectrum_shape():
    s = c.RGBIlluminantSpectrum.from_rgb(jnp.asarray([1.0, 0.9, 0.8]))
    lam = jnp.asarray([400.0, 560.0, 700.0], jnp.float32)
    v = np.asarray(s(lam))
    assert v.shape == (3,) and np.all(v > 0)


def test_rgb_to_spectrum_table_lookup_matches_direct_fit():
    table = c.RGBToSpectrumTable.generate(res=16)
    rgb = jnp.asarray([0.4, 0.6, 0.3])
    ct = table.lookup(rgb)
    cd = c.fit_rgb_to_spectrum(rgb)
    lam = jnp.asarray(np.arange(380.0, 781.0, 10.0, dtype=np.float32))
    rt = np.asarray(c.sigmoid_polynomial(ct, lam))
    rd = np.asarray(c.sigmoid_polynomial(cd, lam))
    np.testing.assert_allclose(rt, rd, atol=0.05)
