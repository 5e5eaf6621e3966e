"""Extract the measured spectral datasets into ops/data/spectra_tables.npz.

The reference embeds standard public measurement datasets as C++ float arrays
(`ThirdParty/pbrv4/spectrum.cpp:298-2560`, `pixelsensor.cpp:28-270`):

- CIE 1931 2-deg color-matching functions (CIE standard tables, 471 @ 1nm)
- CIE standard illuminants A / D50 / D65 / F1-F12 + ACES D60 (CIE / ACES data)
- CIE daylight basis functions S0/S1/S2 (CIE 015 tables)
- metal complex IoR eta/k (Ag, Al, Au, Cu, CuZn, MgO, TiO2 — Palik/J&C data)
- optical glass IoR (Schott BK7/BAF10/FK51A/LASF9/SF5/SF10/SF11)
- ~25 camera RGB spectral sensitivities (camspec database measurements)
- 24 ColorChecker swatch reflectances (BabelColor / Danny Pascale data)

This script re-extracts those *datasets* (numeric measurement data, not code)
and bakes them to dense 1nm [360, 830] float32 lookup tables with exactly the
reference's resampling semantics:

- `PiecewiseLinearSpectrum::FromInterleaved` (spectrum.cpp:134-163): interleaved
  (lambda, value) pairs, domain extended to [Lambda_min-1, Lambda_max+1] by
  holding endpoint values; out-of-domain queries return 0.
- illuminants are normalized to luminance 1: scaled by
  CIE_Y_integral / sum_{360..830} spec(l) * ybar(l)   (spectrum.cpp:158-160)
- dense sampling = Query() at integer wavelengths 360..830 (spectrum.h:376-456).

Run:  python tools/extract_spectral_tables.py [--ref /root/reference] [--out PATH]
The output .npz is committed so the package has no runtime dependency on the
reference tree (parity with the reference, whose rgb2spec binary was NOT
committed and broke at startup — color.cpp:160-163).
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np

LAMBDA_MIN, LAMBDA_MAX = 360.0, 830.0
DENSE_LAMBDA = np.arange(LAMBDA_MIN, LAMBDA_MAX + 1.0, 1.0, dtype=np.float64)
CIE_Y_INTEGRAL = 106.856895  # spectrum.h:21

_ARRAY_RE = re.compile(
    r"(?:static\s+)?(?:extern\s+)?const\s+float\s+(\w+)\s*\[[^\]]*\]\s*=\s*\{",
    re.MULTILINE)


def parse_float_arrays(path):
    """All `const float NAME[] = { ... };` arrays in a C++ file -> dict of
    float64 numpy arrays. Comments inside initializers are stripped."""
    with open(path, "r", errors="replace") as f:
        src = f.read()
    # strip // and /* */ comments so they can't pollute the numeric scan
    src = re.sub(r"/\*.*?\*/", " ", src, flags=re.DOTALL)
    src = re.sub(r"//[^\n]*", " ", src)
    out = {}
    for m in _ARRAY_RE.finditer(src):
        name = m.group(1)
        start = m.end()
        end = src.index("}", start)
        body = src[start:end]
        vals = re.findall(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?f?", body)
        if not vals:
            continue
        out[name] = np.array([float(v.rstrip("f")) for v in vals],
                             dtype=np.float64)
    return out


def from_interleaved(samples, normalize, ybar_dense=None):
    """NumPy port of PiecewiseLinearSpectrum::FromInterleaved +
    DenselySampledSpectrum resampling at 1nm over [360, 830]."""
    assert samples.size % 2 == 0, "interleaved array must have even length"
    lam = samples[0::2].copy()
    val = samples[1::2].copy()
    assert np.all(np.diff(lam) > 0), "wavelengths must increase"
    if lam[0] > LAMBDA_MIN:
        lam = np.concatenate([[LAMBDA_MIN - 1.0], lam])
        val = np.concatenate([[val[0]], val])
    if lam[-1] < LAMBDA_MAX:
        lam = np.concatenate([lam, [LAMBDA_MAX + 1.0]])
        val = np.concatenate([val, [val[-1]]])
    dense = np.interp(DENSE_LAMBDA, lam, val)
    if normalize:
        assert ybar_dense is not None
        dense *= CIE_Y_INTEGRAL / np.sum(dense * ybar_dense)
    return dense


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "computational_ray_tracer_tpu", "ops", "data", "spectra_tables.npz"))
    args = ap.parse_args()

    spectrum_cpp = os.path.join(args.ref, "ThirdParty", "pbrv4", "spectrum.cpp")
    pixelsensor_cpp = os.path.join(args.ref, "ThirdParty", "pbrv4",
                                   "pixelsensor.cpp")
    arrs = parse_float_arrays(spectrum_cpp)
    swatch_arrs = parse_float_arrays(pixelsensor_cpp)

    tables = {"lambda": DENSE_LAMBDA.astype(np.float32)}

    # --- CIE color-matching functions: tabulated on CIE_lambda (471 @ 1nm,
    # 360..830 — verified below), stored dense directly.
    cie_lam = arrs["CIE_lambda"]
    assert cie_lam.shape == (471,) and cie_lam[0] == 360 and cie_lam[-1] == 830
    for key, cname in (("cie-x", "CIE_X"), ("cie-y", "CIE_Y"),
                       ("cie-z", "CIE_Z")):
        a = arrs[cname]
        assert a.shape == (471,), (cname, a.shape)
        tables[key] = np.interp(DENSE_LAMBDA, cie_lam, a).astype(np.float32)
    ybar = tables["cie-y"].astype(np.float64)

    # --- CIE daylight basis S0/S1/S2 on their own 107-sample grid (kept on
    # the native grid; Spectra::D interpolates).
    tables["cie-s-lambda"] = arrs["CIE_S_lambda"].astype(np.float32)
    for i in range(3):
        tables[f"cie-s{i}"] = arrs[f"CIE_S{i}"].astype(np.float32)

    # --- Illuminants (normalized to luminance 1, as in Spectra::Init)
    illum_map = {
        "stdillum-A": "CIE_Illum_A",
        "stdillum-D50": "CIE_Illum_D5000",
        "stdillum-D65": "CIE_Illum_D6500",
        "illum-acesD60": "ACES_Illum_D60",
    }
    for i in range(1, 13):
        illum_map[f"stdillum-F{i}"] = f"CIE_Illum_F{i}"
    for key, cname in illum_map.items():
        tables[key] = from_interleaved(arrs[cname], True,
                                       ybar).astype(np.float32)

    # --- Metals (eta, k per metal)
    for metal in ("Ag", "Al", "Au", "Cu", "CuZn", "MgO", "TiO2"):
        for part in ("eta", "k"):
            tables[f"metal-{metal}-{part}"] = from_interleaved(
                arrs[f"{metal}_{part}"], False).astype(np.float32)

    # --- Glasses (eta only). The reference registers SF5/SF10/SF11 under the
    # names glass-F5/F10/F11 (spectrum.cpp:2697-2700); keep both spellings.
    for glass in ("BK7", "BAF10", "FK51A", "LASF9", "SF5", "SF10", "SF11"):
        dense = from_interleaved(arrs[f"Glass{glass}_eta"],
                                 False).astype(np.float32)
        tables[f"glass-{glass}-eta"] = dense

    # --- Camera sensor RGB sensitivities (every *_r/_g/_b triple)
    sensor_names = sorted({n[:-2] for n in arrs
                           if n.endswith(("_r", "_g", "_b"))
                           and any(v in n for v in
                                   ("canon", "nikon", "sony", "hasselblad"))})
    for name in sensor_names:
        for ch in "rgb":
            tables[f"{name}_{ch}"] = from_interleaved(
                arrs[f"{name}_{ch}"], False).astype(np.float32)

    # --- ColorChecker swatch reflectances (A_1, AA_1, B_1, BB_1, C_1, D_1,
    # E_1 ... V_1 — the 24 arrays used by PixelSensor::swatchReflectances,
    # pixelsensor.cpp:244-270, in declaration order).
    swatch_order = ["A_1", "AA_1", "B_1", "BB_1", "C_1", "D_1", "E_1", "F_1",
                    "G_1", "H_1", "I_1", "J_1", "K_1", "L_1", "M_1", "N_1",
                    "O_1", "P_1", "Q_1", "R_1", "S_1", "T_1", "U_1", "V_1"]
    swatches = []
    for n in swatch_order:
        swatches.append(from_interleaved(swatch_arrs[n], False))
    tables["macbeth-swatches"] = np.stack(swatches).astype(np.float32)  # (24,471)

    meta = {"n_sensor_curves": len(sensor_names)}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **tables)
    print(f"wrote {args.out}: {len(tables)} arrays, "
          f"{len(sensor_names)} sensor curve sets, "
          f"{os.path.getsize(args.out)/1024:.0f} KiB")
    print("sensors:", " ".join(sensor_names))
    print("D65 luminance check:",
          float(np.sum(tables["stdillum-D65"].astype(np.float64) * ybar)
                / CIE_Y_INTEGRAL))
    assert meta["n_sensor_curves"] >= 14


if __name__ == "__main__":
    main()
