"""Art-gallery visibility polygons.

Capability parity with ``Geometry/ArtGalleryTheorem.h:76-288``
(GenerateVisibilityPolygon: the region of a simple polygon visible from a
guard point, handling caves/reflex shadowing via ray-boundary intersection;
FindIntersectionPointOnBoundary).

Implementation: the standard angular-sweep algorithm — cast a ray from the
guard through every vertex (± epsilon to catch silhouette edges), find the
nearest boundary hit per ray (a *batched* jnp segment-intersection over all
rays x edges), sort hits by angle. Equivalent output to the reference's
boundary-walk formulation, but expressed as one vectorized kernel instead of
sequential case analysis."""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from computational_ray_tracer_tpu.geometry2d import segment as seg
from computational_ray_tracer_tpu.geometry2d.polygon import Polygon


def first_boundary_hit(origin, directions, vertices):
    """Nearest boundary intersection of rays (origin, directions (R, 2))
    with polygon edges (M, 2). Returns (points (R, 2), t (R,)).

    The batched analog of FindIntersectionPointOnBoundary
    (ArtGalleryTheorem.h:76-117)."""
    o = jnp.asarray(origin, jnp.float32)
    d = jnp.asarray(directions, jnp.float32)          # (R, 2)
    a = jnp.asarray(vertices, jnp.float32)            # (M, 2)
    b = jnp.roll(a, -1, axis=0)

    # ray p = o + t d  vs segment a + u (b - a)
    e = (b - a)[None, :, :]                           # (1, M, 2)
    dd = d[:, None, :]                                # (R, 1, 2)
    denom = dd[..., 0] * e[..., 1] - dd[..., 1] * e[..., 0]
    parallel = jnp.abs(denom) < 1e-12
    dn = jnp.where(parallel, 1.0, denom)
    ao = a[None, :, :] - o[None, None, :]
    t = (ao[..., 0] * e[..., 1] - ao[..., 1] * e[..., 0]) / dn
    u = (ao[..., 0] * dd[..., 1] - ao[..., 1] * dd[..., 0]) / dn
    valid = (~parallel) & (t > 1e-6) & (u >= -1e-9) & (u <= 1 + 1e-9)
    t = jnp.where(valid, t, jnp.inf)
    t_min = jnp.min(t, axis=1)                        # (R,)
    return o[None, :] + t_min[:, None] * d, t_min


def visibility_polygon(polygon: Polygon, guard, eps=1e-4):
    """Visibility polygon of `guard` inside a simple polygon
    (GenerateVisibilityPolygon capability). Returns a Polygon whose vertices
    are sorted CCW around the guard."""
    v = np.asarray(polygon.v, np.float64)
    g = np.asarray(guard, np.float64)
    angles = np.arctan2(v[:, 1] - g[1], v[:, 0] - g[0])
    # three rays per vertex: exact + two offsets to slide past silhouettes
    sweep = np.concatenate([angles - eps, angles, angles + eps])
    dirs = np.stack([np.cos(sweep), np.sin(sweep)], axis=1)
    pts, t = first_boundary_hit(g, jnp.asarray(dirs, jnp.float32),
                                jnp.asarray(v, jnp.float32))
    pts = np.asarray(pts, np.float64)
    t = np.asarray(t)
    ok = np.isfinite(t)
    pts = pts[ok]
    sweep = sweep[ok]
    order = np.argsort(np.mod(sweep, 2 * math.pi))
    pts = pts[order]
    # dedupe near-identical consecutive points
    keep = [0]
    for i in range(1, len(pts)):
        if np.linalg.norm(pts[i] - pts[keep[-1]]) > 1e-6:
            keep.append(i)
    return Polygon(pts[keep])


def is_visible(polygon: Polygon, p, q, n_checks=32):
    """Are p and q mutually visible inside the polygon (IsSegmentVisible
    capability)? Checks boundary crossings + midpoint containment."""
    a = jnp.asarray(p, jnp.float32)
    b = jnp.asarray(q, jnp.float32)
    v = jnp.asarray(polygon.v, jnp.float32)
    c = v
    d = jnp.roll(v, -1, axis=0)
    crossing = seg.segments_intersect(a[None, :], b[None, :], c, d,
                                      include_endpoints=False)
    if bool(jnp.any(crossing)):
        return False
    mid = (np.asarray(p) + np.asarray(q)) / 2.0
    return polygon.contains(mid)


def guard_coverage(polygon: Polygon, guards, n_samples=2048, rng=None):
    """Fraction of polygon area visible from at least one guard (Monte
    Carlo) — the art-gallery quality metric."""
    rng = rng or np.random.default_rng(0)
    lo = polygon.v.min(axis=0)
    hi = polygon.v.max(axis=0)
    pts = rng.uniform(lo, hi, (n_samples, 2))
    inside = np.asarray(
        __import__("computational_ray_tracer_tpu.geometry2d.polygon",
                   fromlist=["points_in_polygon"]).points_in_polygon(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(polygon.v, jnp.float32)))
    pts = pts[inside]
    if len(pts) == 0:
        return 0.0
    covered = np.zeros(len(pts), bool)
    for gpt in guards:
        vis = visibility_polygon(polygon, gpt)
        from computational_ray_tracer_tpu.geometry2d.polygon import \
            points_in_polygon
        inside_vis = np.asarray(points_in_polygon(
            jnp.asarray(pts, jnp.float32), jnp.asarray(vis.v, jnp.float32)))
        covered |= inside_vis
    return float(covered.mean())
