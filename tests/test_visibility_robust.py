"""Reflex-heavy visibility-polygon robustness (the cave/winding cases the
reference handles in ``Geometry/ArtGalleryTheorem.h:144-288``).

Oracle: brute-force Monte Carlo visible area — sample points in the polygon
and test whether the guard->point segment crosses any boundary edge
strictly. The angular-sweep visibility polygon must match within ~2%."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from computational_ray_tracer_tpu.geometry2d.polygon import (Polygon,
                                                             points_in_polygon)
from computational_ray_tracer_tpu.geometry2d import visibility as vis

COMB = [(0, 0), (6, 0), (6, 3), (5, 3), (5, 1), (4, 1), (4, 3), (3, 3),
        (3, 1), (2, 1), (2, 3), (1, 3), (1, 1), (0, 1)]
SPIRAL = [(0, 0), (5, 0), (5, 5), (1, 5), (1, 2), (2, 2), (2, 4), (4, 4),
          (4, 1), (0, 1)]


def star(n_spikes=5, r_out=2.0, r_in=0.8):
    pts = []
    for k in range(2 * n_spikes):
        r = r_out if k % 2 == 0 else r_in
        a = math.pi * k / n_spikes
        pts.append((r * math.cos(a), r * math.sin(a)))
    return pts


def mc_visible_area(poly: Polygon, guard, n=20000, seed=1):
    rng = np.random.default_rng(seed)
    lo, hi = poly.v.min(0), poly.v.max(0)
    pts = rng.uniform(lo, hi, (n, 2))
    inside = np.asarray(points_in_polygon(jnp.asarray(pts, jnp.float32),
                                          jnp.asarray(poly.v, jnp.float32)))
    pts = pts[inside]
    box_area = float(np.prod(hi - lo))
    g = np.asarray(guard, float)
    e0 = np.asarray(poly.v, float)
    e1 = np.roll(e0, -1, 0)
    dseg = pts - g
    evec = e1 - e0
    denom = (dseg[:, None, 0] * evec[None, :, 1]
             - dseg[:, None, 1] * evec[None, :, 0])
    ao = e0[None, :, :] - g[None, None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (ao[..., 0] * evec[None, :, 1]
             - ao[..., 1] * evec[None, :, 0]) / denom
        u = (ao[..., 0] * dseg[:, None, 1]
             - ao[..., 1] * dseg[:, None, 0]) / denom
    blocked = ((np.abs(denom) > 1e-14) & (t > 1e-9) & (t < 1 - 1e-9)
               & (u > 1e-9) & (u < 1 - 1e-9))
    visible = ~blocked.any(1)
    return visible.mean() * inside.mean() * box_area


CASES = [
    ("comb_base", COMB, (3.5, 0.5)),       # sees into every tooth partially
    ("comb_tooth", COMB, (1.5, 2.5)),      # deep in a tooth, cave shadowing
    ("spiral_cave", SPIRAL, (0.5, 0.5)),   # wrap-around cave
    ("star_center", star(), (0.0, 0.0)),
    ("star_offcenter", star(), (0.5, 0.3)),
]


@pytest.mark.parametrize("name,poly,guard", CASES,
                         ids=[c[0] for c in CASES])
def test_visibility_area_matches_mc(name, poly, guard):
    p = Polygon(np.asarray(poly, np.float64))
    vp = vis.visibility_polygon(p, guard)
    mc = mc_visible_area(p, guard)
    assert abs(vp.area() - mc) < 0.02 * p.area(), (vp.area(), mc)
    # never exceeds the polygon
    assert vp.area() <= p.area() * 1.01


def test_visibility_random_reflex_polygons():
    rng = np.random.default_rng(7)
    for trial in range(4):
        n = 24
        ang = np.sort(rng.uniform(0, 2 * math.pi, n))
        # reject near-duplicate angles (degenerate slivers)
        if np.min(np.diff(ang)) < 1e-3:
            continue
        rad = rng.uniform(0.3, 2.0, n)
        pts = np.stack([rad * np.cos(ang), rad * np.sin(ang)], 1)
        p = Polygon(pts)
        vp = vis.visibility_polygon(p, (0.0, 0.0))
        mc = mc_visible_area(p, (0.0, 0.0), seed=trial)
        assert abs(vp.area() - mc) < 0.025 * p.area(), (trial, vp.area(), mc)


def test_star_center_sees_everything():
    p = Polygon(np.asarray(star(), np.float64))
    vp = vis.visibility_polygon(p, (0.0, 0.0))
    assert abs(vp.area() - p.area()) < 0.02 * p.area()


def test_comb_guard_coverage():
    """Tooth guards cover their teeth but miss the occluded base corner;
    adding a base guard completes coverage (art-gallery behavior)."""
    p = Polygon(np.asarray(COMB, np.float64))
    tooth_guards = [(1.5, 1.2), (3.5, 1.2), (5.5, 1.2)]
    partial = vis.guard_coverage(p, tooth_guards)
    assert 0.90 < partial < 0.99, partial
    full = vis.guard_coverage(p, tooth_guards + [(0.5, 0.5)])
    assert full > 0.995, full
