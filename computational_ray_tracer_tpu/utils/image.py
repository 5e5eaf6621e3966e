"""Headless image I/O (the presentation-layer replacement, SURVEY §2.3:
GraphicsManager's GL upload becomes PNG/numpy dumps; live progress = periodic
image writes)."""

from __future__ import annotations

import numpy as np


def to_uint8(img):
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path, img):
    """img: (H, W, 3) float in [0,1] or uint8."""
    from PIL import Image
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    Image.fromarray(arr).save(path)


def read_image(path):
    """(H, W, 3) float32 in [0,1] (the stbi_load capability,
    RayTracerTestApp.h:79)."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def write_npy(path, img):
    np.save(path, np.asarray(img))
