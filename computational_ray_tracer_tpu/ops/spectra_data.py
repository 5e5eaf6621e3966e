"""Spectral data: CIE color-matching functions, standard illuminants, materials.

Capability parity with the reference's spectral data tables
(``/root/reference/ThirdParty/pbrv4/spectrum.cpp:298-2600``: CIE X/Y/Z curves,
illuminants A/D50/D65/F-series, metal eta/k, glass IoR), built the TPU way:
everything here is *generated* from compact analytic models / published physical
constants at import time into dense float32 NumPy tables that sample as cheap
gathers on device.

- CIE 1931 2-deg color-matching functions: multi-lobe piecewise-Gaussian fits
  (Wyman, Sloan & Shirley, JCGT 2013), dense-sampled at 1nm over [360, 830].
- Illuminant A: exact (blackbody at 2856 K, per CIE definition).
- Illuminants D50/D65/D75: CIE daylight model — published 10nm relative SPD for
  D65, and the blackbody-shaped daylight approximation for other CCTs.
- Fluorescent F-series: approximated as a broadband base + Gaussian mercury
  emission lines at the standard Hg wavelengths (405/436/546/578 nm), matched
  to each F-illuminant's CCT. (The reference ships measured tables; ours are
  generative approximations carrying the same API and qualitative shape.)
- Glasses: exact Sellmeier dispersion equations (the defining form for optical
  glass; coefficients from the Schott catalog).
- Metals (eta/k): coarse published values (Johnson & Christy / Palik style) at
  ~10 support wavelengths, linearly interpolated.
"""

from __future__ import annotations

import numpy as np

LAMBDA_MIN = 360.0
LAMBDA_MAX = 830.0
N_SPECTRUM_SAMPLES = 8

# Dense 1nm wavelength grid, 471 entries — the sampling domain of every
# DenselySampledSpectrum in the framework.
DENSE_LAMBDA = np.arange(LAMBDA_MIN, LAMBDA_MAX + 1.0, 1.0, dtype=np.float64)
N_DENSE = DENSE_LAMBDA.shape[0]  # 471


# ---------------------------------------------------------------------------
# CIE 1931 color-matching functions (2-degree observer)
# ---------------------------------------------------------------------------

def _pgauss(lam, mu, s1, s2):
    """Piecewise Gaussian with different left/right widths (Wyman et al. 2013)."""
    sigma = np.where(lam < mu, s1, s2)
    t = (lam - mu) / sigma
    return np.exp(-0.5 * t * t)


def cie_x_fit(lam):
    lam = np.asarray(lam, dtype=np.float64)
    return (1.056 * _pgauss(lam, 599.8, 37.9, 31.0)
            + 0.362 * _pgauss(lam, 442.0, 16.0, 26.7)
            - 0.065 * _pgauss(lam, 501.1, 20.4, 26.2))


def cie_y_fit(lam):
    lam = np.asarray(lam, dtype=np.float64)
    return (0.821 * _pgauss(lam, 568.8, 46.9, 40.5)
            + 0.286 * _pgauss(lam, 530.9, 16.3, 31.1))


def cie_z_fit(lam):
    lam = np.asarray(lam, dtype=np.float64)
    return (1.217 * _pgauss(lam, 437.0, 11.8, 36.0)
            + 0.681 * _pgauss(lam, 459.0, 26.0, 13.8))


CIE_X = cie_x_fit(DENSE_LAMBDA).astype(np.float32)
CIE_Y = cie_y_fit(DENSE_LAMBDA).astype(np.float32)
CIE_Z = cie_z_fit(DENSE_LAMBDA).astype(np.float32)

# Integral of ybar over the dense grid (trapezoid at 1nm). The reference pins
# 106.856895 (spectrum.h:21); our generated curve integrates to within <1%.
CIE_Y_INTEGRAL = float(np.trapezoid(CIE_Y, DENSE_LAMBDA))


# ---------------------------------------------------------------------------
# Blackbody radiation (Planck's law) — basis for illuminant A and BlackbodySpectrum
# ---------------------------------------------------------------------------

_PLANCK_C = 299792458.0
_PLANCK_H = 6.62606957e-34
_PLANCK_KB = 1.3806488e-23


def blackbody(lam_nm, T):
    """Planck spectral radiance (W / (m^2 sr m)) at wavelength lam_nm [nm], temp T [K]."""
    lam_nm = np.asarray(lam_nm, dtype=np.float64)
    lam = lam_nm * 1e-9
    le = (2.0 * _PLANCK_H * _PLANCK_C ** 2) / (
        lam ** 5 * (np.expm1((_PLANCK_H * _PLANCK_C) / (lam * _PLANCK_KB * T))))
    return le


def blackbody_normalized(lam_nm, T):
    """Planck curve scaled so its peak (Wien displacement) equals 1."""
    lam_max_nm = 2.8977721e-3 / T * 1e9
    return blackbody(lam_nm, T) / blackbody(np.array([lam_max_nm]), T)[0]


# ---------------------------------------------------------------------------
# Standard illuminants
# ---------------------------------------------------------------------------

# CIE standard illuminant D65, relative SPD at 10nm (published CIE table,
# normalized to 100 at 560nm). Support 300-780nm; extended to 830 by holding
# the daylight-model trend.
_D65_LAM = np.arange(300.0, 790.0, 10.0)
_D65_VAL = np.array([
    0.03, 3.29, 20.24, 37.05, 39.95, 44.91, 46.64, 52.09,
    49.98, 54.65, 82.75, 91.49, 93.43, 86.68, 104.86, 117.01,
    117.81, 114.86, 115.92, 108.81, 109.35, 107.80, 104.79, 107.69,
    104.41, 104.05, 100.00, 96.33, 95.79, 88.69, 90.01, 89.60,
    87.70, 83.29, 83.70, 80.03, 80.21, 82.28, 78.28, 69.72,
    71.61, 74.35, 61.60, 69.89, 75.09, 63.59, 46.42, 66.81,
    63.38,
])


def _interp_dense(lams, vals):
    return np.interp(DENSE_LAMBDA, lams, vals, left=float(vals[0]),
                     right=float(vals[-1])).astype(np.float32)


def _daylight(cct):
    """Daylight-like SPD at a given CCT: blackbody shaped, normalized at 560nm.

    D65 uses the measured table; other daylight phases use the CIE-recommended
    adjusted temperature (T' = T * 1.4388/1.4380) blackbody approximation.
    """
    t_adj = cct * 1.4388 / 1.4380
    s = blackbody(DENSE_LAMBDA, t_adj)
    s = s / np.interp(560.0, DENSE_LAMBDA, s) * 100.0
    return s.astype(np.float32)


ILLUM_D65 = _interp_dense(_D65_LAM, _D65_VAL)
ILLUM_D50 = _daylight(5003.0)
ILLUM_D60 = _daylight(6000.0)
ILLUM_D75 = _daylight(7504.0)
ILLUM_A = (blackbody(DENSE_LAMBDA, 2856.0)
           / blackbody(np.array([560.0]), 2856.0)[0] * 100.0).astype(np.float32)
ILLUM_E = np.full(N_DENSE, 100.0, dtype=np.float32)


def _fluorescent(cct, line_strength, base_mix):
    """Generative stand-in for a CIE F-series illuminant.

    Broadband phosphor base (daylight shape at `cct`) plus Gaussian mercury
    emission lines at 404.7/435.8/546.1/577-579nm.
    """
    base = _daylight(cct).astype(np.float64)
    lines = np.zeros(N_DENSE)
    for mu, rel in ((404.7, 0.35), (435.8, 1.0), (546.1, 0.9), (578.0, 0.5)):
        lines += rel * np.exp(-0.5 * ((DENSE_LAMBDA - mu) / 2.5) ** 2)
    lines = lines / lines.max() * 100.0
    s = base_mix * base + line_strength * lines
    s = s / np.interp(560.0, DENSE_LAMBDA, s) * 100.0
    return s.astype(np.float32)


_F_PARAMS = {  # (CCT, line strength, base mix) per F1..F12
    1: (6430, 0.8, 1.0), 2: (4230, 0.9, 1.0), 3: (3450, 1.0, 1.0),
    4: (2940, 1.1, 1.0), 5: (6350, 0.8, 1.0), 6: (4150, 0.9, 1.0),
    7: (6500, 0.6, 1.2), 8: (5000, 0.6, 1.2), 9: (4150, 0.7, 1.1),
    10: (5000, 1.4, 0.7), 11: (4000, 1.5, 0.6), 12: (3000, 1.6, 0.5),
}
ILLUM_F = {i: _fluorescent(*p) for i, p in _F_PARAMS.items()}


# ---------------------------------------------------------------------------
# Optical glass: Sellmeier dispersion (Schott catalog coefficients)
# ---------------------------------------------------------------------------

_SELLMEIER = {
    # name: (B1, B2, B3, C1, C2, C3) with C in um^2
    "glass-BK7": (1.03961212, 0.231792344, 1.01046945,
                  0.00600069867, 0.0200179144, 103.560653),
    "glass-BAF10": (1.5851495, 0.143559385, 1.08521269,
                    0.00926681282, 0.0424489805, 105.613573),
    "glass-FK51A": (0.971247817, 0.216901417, 0.904651666,
                    0.00472301995, 0.0153575612, 168.68133),
    "glass-LASF9": (2.00029547, 0.298926886, 1.80691843,
                    0.0121426017, 0.0538736236, 156.530829),
    "glass-SF5": (1.52481889, 0.187085527, 1.42729015,
                  0.011254756, 0.0588995392, 129.141675),
    "glass-SF10": (1.62153902, 0.256287842, 1.64447552,
                   0.0122241457, 0.0595736775, 147.468793),
    "glass-SF11": (1.73759695, 0.313747346, 1.89878101,
                   0.013188707, 0.0623068142, 155.23629),
}


def sellmeier_ior(lam_nm, coeffs):
    """Refractive index n(lambda) from Sellmeier coefficients."""
    b1, b2, b3, c1, c2, c3 = coeffs
    lu2 = (np.asarray(lam_nm, dtype=np.float64) * 1e-3) ** 2  # um^2
    n2 = 1.0 + b1 * lu2 / (lu2 - c1) + b2 * lu2 / (lu2 - c2) + b3 * lu2 / (lu2 - c3)
    return np.sqrt(n2)


GLASS_IOR = {name: sellmeier_ior(DENSE_LAMBDA, c).astype(np.float32)
             for name, c in _SELLMEIER.items()}


# ---------------------------------------------------------------------------
# Metal complex IoR (eta, k): coarse published support points, interpolated
# ---------------------------------------------------------------------------

_METALS = {
    # lam_nm: [...], eta: [...], k: [...]  (approximate Johnson&Christy/Palik)
    "metal-Au": (
        [400, 450, 500, 550, 600, 650, 700, 750, 800],
        [1.66, 1.50, 0.86, 0.35, 0.22, 0.17, 0.16, 0.16, 0.17],
        [1.96, 1.88, 1.90, 2.74, 3.07, 3.15, 3.80, 4.35, 4.86]),
    "metal-Ag": (
        [400, 450, 500, 550, 600, 650, 700, 750, 800],
        [0.05, 0.04, 0.05, 0.06, 0.06, 0.07, 0.08, 0.09, 0.09],
        [2.10, 2.66, 3.13, 3.59, 4.15, 4.52, 4.84, 5.28, 5.64]),
    "metal-Cu": (
        [400, 450, 500, 550, 600, 650, 700, 750, 800],
        [1.18, 1.15, 1.12, 0.83, 0.25, 0.21, 0.21, 0.24, 0.26],
        [2.21, 2.40, 2.60, 2.60, 3.41, 3.67, 4.10, 4.43, 4.93]),
    "metal-Al": (
        [400, 450, 500, 550, 600, 650, 700, 750, 800],
        [0.49, 0.62, 0.77, 0.96, 1.20, 1.47, 1.83, 2.40, 2.80],
        [4.86, 5.47, 6.08, 6.70, 7.26, 7.79, 8.31, 8.62, 8.45]),
    "metal-CuZn": (  # brass, approximate
        [400, 450, 500, 550, 600, 650, 700, 750, 800],
        [1.40, 1.25, 0.95, 0.60, 0.45, 0.42, 0.43, 0.45, 0.47],
        [1.80, 1.95, 2.10, 2.70, 3.20, 3.55, 3.90, 4.20, 4.50]),
    "metal-MgO": (  # dielectric-like, k~0
        [400, 550, 800], [1.762, 1.741, 1.728], [0.0, 0.0, 0.0]),
    "metal-TiO2": (
        [400, 550, 800], [3.20, 2.70, 2.55], [0.0, 0.0, 0.0]),
}

METAL_ETA = {}
METAL_K = {}
for _name, (_l, _e, _k) in _METALS.items():
    METAL_ETA[_name] = _interp_dense(np.asarray(_l, np.float64), np.asarray(_e))
    METAL_K[_name] = _interp_dense(np.asarray(_l, np.float64), np.asarray(_k))


# ---------------------------------------------------------------------------
# Camera sensor response curves (r/g/b quantum-efficiency-like curves)
# ---------------------------------------------------------------------------

def _sensor_curves(r_mu, g_mu, b_mu, r_s, g_s, b_s, r_a=1.0, g_a=1.0, b_a=1.0):
    r = r_a * np.exp(-0.5 * ((DENSE_LAMBDA - r_mu) / r_s) ** 2)
    g = g_a * np.exp(-0.5 * ((DENSE_LAMBDA - g_mu) / g_s) ** 2)
    b = b_a * np.exp(-0.5 * ((DENSE_LAMBDA - b_mu) / b_s) ** 2)
    return (r.astype(np.float32), g.astype(np.float32), b.astype(np.float32))


# Generative stand-ins for the ~25 measured camera response curves the
# reference ships (spectrum.cpp:1470-2560): single-lobe Gaussian RGB filters
# whose peaks/widths vary per vendor. Same registry API, same pipeline role
# (PixelSensor least-squares calibration runs on whatever curves are here).
SENSOR_CURVES = {
    "canon_eos_100d": _sensor_curves(600, 540, 460, 38, 38, 32),
    "canon_eos_5d": _sensor_curves(605, 535, 455, 40, 40, 33),
    "canon_eos_5d_mkii": _sensor_curves(602, 538, 458, 39, 39, 33),
    "canon_eos_5d_mkiii": _sensor_curves(603, 537, 457, 39, 38, 32),
    "canon_eos_5d_mkiv": _sensor_curves(604, 536, 456, 38, 38, 32),
    "canon_eos_5ds": _sensor_curves(601, 539, 459, 39, 39, 33),
    "canon_eos_m": _sensor_curves(600, 540, 460, 38, 37, 31),
    "hasselblad_l1d_20c": _sensor_curves(598, 542, 462, 36, 37, 31),
    "nikon_d810": _sensor_curves(597, 543, 463, 37, 38, 32),
    "nikon_d850": _sensor_curves(596, 544, 464, 37, 38, 32),
    "sony_ilce_6400": _sensor_curves(599, 541, 461, 37, 37, 31),
    "sony_ilce_7m3": _sensor_curves(598, 542, 462, 38, 38, 32),
    "sony_ilce_7rm3": _sensor_curves(597, 541, 461, 37, 37, 31),
    "sony_ilce_9": _sensor_curves(598, 540, 460, 37, 37, 31),
}


# ---------------------------------------------------------------------------
# Named-spectrum registry (parity with GetNamedSpectrum, spectrum.cpp:2858)
# ---------------------------------------------------------------------------

NAMED_SPECTRA = {
    "stdillum-A": ILLUM_A,
    "stdillum-D50": ILLUM_D50,
    "stdillum-D65": ILLUM_D65,
    "stdillum-acesD60": ILLUM_D60,
    "illum-acesD60": ILLUM_D60,
    "stdillum-E": ILLUM_E,
    "cie-x": CIE_X,
    "cie-y": CIE_Y,
    "cie-z": CIE_Z,
}
for _i in range(1, 13):
    NAMED_SPECTRA[f"stdillum-F{_i}"] = ILLUM_F[_i]
for _name, _v in GLASS_IOR.items():
    NAMED_SPECTRA[_name + "-eta"] = _v
for _name in METAL_ETA:
    NAMED_SPECTRA[_name + "-eta"] = METAL_ETA[_name]
    NAMED_SPECTRA[_name + "-k"] = METAL_K[_name]


def get_named_spectrum(name: str) -> np.ndarray:
    """Dense (471,) float32 SPD for a registered spectrum name."""
    return NAMED_SPECTRA[name]
