"""Simple 2D polygons: editing, queries, ear clipping, triangulation.

Capability parity with ``Geometry/Polygon.{h,cpp}`` (mutable vertex editing,
shift/rotate/scale, CCW detection/enforcement, area, internal angles, ear and
mouth finding, diagonal testing, ear-clipping triangulation, point-in-polygon
ray cast, hit testing, txt import/export, random simple polygon generation).

Host-side NumPy by design: polygon editing is interactive-scale setup work
(SURVEY §2.4 maps it host-side); the *batch* predicates it rests on live in
``geometry2d.segment`` as jnp functions. Batched point-in-polygon for device
use is provided here as ``points_in_polygon`` (vectorized ray cast)."""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from computational_ray_tracer_tpu.geometry2d import segment as seg


class Polygon:
    """A simple polygon as an ordered vertex list (N, 2)."""

    def __init__(self, vertices):
        self.v = np.asarray(vertices, np.float64).reshape(-1, 2).copy()

    # ---- editing (Polygon.h add/remove/split/shift/rotate/scale) ----
    def add_vertex(self, p, index=None):
        p = np.asarray(p, np.float64)
        if index is None:
            self.v = np.vstack([self.v, p])
        else:
            self.v = np.insert(self.v, index, p, axis=0)

    def remove_vertex(self, index):
        self.v = np.delete(self.v, index % len(self.v), axis=0)

    def split_edge(self, index):
        """Insert the midpoint of edge (index, index+1)."""
        n = len(self.v)
        mid = (self.v[index % n] + self.v[(index + 1) % n]) / 2.0
        self.add_vertex(mid, (index % n) + 1)

    def shift(self, delta):
        self.v = self.v + np.asarray(delta, np.float64)

    def shift_vertex(self, index, delta):
        self.v[index % len(self.v)] += np.asarray(delta, np.float64)

    def rotate(self, angle_rad, about=None):
        c = np.asarray(about, np.float64) if about is not None \
            else self.centroid()
        r = np.array([[math.cos(angle_rad), -math.sin(angle_rad)],
                      [math.sin(angle_rad), math.cos(angle_rad)]])
        self.v = (self.v - c) @ r.T + c

    def scale(self, factor, about=None):
        c = np.asarray(about, np.float64) if about is not None \
            else self.centroid()
        self.v = (self.v - c) * factor + c

    # ---- queries ----
    def __len__(self):
        return len(self.v)

    def centroid(self):
        return self.v.mean(axis=0)

    def signed_area(self):
        x, y = self.v[:, 0], self.v[:, 1]
        return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))

    def area(self):
        """Polygon.cpp area capability."""
        return abs(self.signed_area())

    def is_ccw(self):
        return self.signed_area() > 0

    def make_ccw(self):
        """CCW enforcement (Polygon.cpp:859)."""
        if not self.is_ccw():
            self.v = self.v[::-1].copy()
        return self

    def internal_angles(self):
        """Interior angle at each vertex (radians), CCW polygons."""
        n = len(self.v)
        prev = self.v[(np.arange(n) - 1) % n]
        cur = self.v
        nxt = self.v[(np.arange(n) + 1) % n]
        a = prev - cur
        b = nxt - cur
        ang = np.arctan2(np.cross(b, a), np.sum(a * b, axis=1))
        ang = np.where(ang < 0, ang + 2 * math.pi, ang)
        return ang

    def is_convex_vertex(self, i):
        n = len(self.v)
        o = float(seg.orientation(
            jnp.asarray(self.v[(i - 1) % n]), jnp.asarray(self.v[i % n]),
            jnp.asarray(self.v[(i + 1) % n])))
        return o > 0 if self.is_ccw() else o < 0

    # ---- containment / hit testing ----
    def contains(self, p):
        """Point-in-polygon ray cast (IsInside, Polygon.cpp:747)."""
        return bool(points_in_polygon(jnp.asarray([p], jnp.float32),
                                      jnp.asarray(self.v, jnp.float32))[0])

    def hit_vertex(self, p, radius):
        """Index of the vertex within `radius` of p, or -1 (hit testing)."""
        d = np.linalg.norm(self.v - np.asarray(p), axis=1)
        i = int(np.argmin(d))
        return i if d[i] <= radius else -1

    def hit_edge(self, p, radius):
        n = len(self.v)
        pj = jnp.asarray(p, jnp.float32)
        a = jnp.asarray(self.v, jnp.float32)
        b = jnp.asarray(np.roll(self.v, -1, axis=0), jnp.float32)
        d = np.asarray(seg.point_segment_distance(pj, a, b))
        i = int(np.argmin(d))
        return i if d[i] <= radius else -1

    # ---- diagonals / ears / mouths (Polygon.cpp:145-330) ----
    def is_diagonal(self, i, j):
        """Is segment (v_i, v_j) a diagonal: interior and non-crossing?"""
        n = len(self.v)
        i, j = i % n, j % n
        if i == j or (i + 1) % n == j or (j + 1) % n == i:
            return False
        a = jnp.asarray(self.v[i], jnp.float32)
        b = jnp.asarray(self.v[j], jnp.float32)
        # no proper crossing with any non-adjacent edge
        for k in range(n):
            k2 = (k + 1) % n
            if k in (i, j) or k2 in (i, j):
                continue
            if bool(seg.segments_intersect(
                    a, b, jnp.asarray(self.v[k], jnp.float32),
                    jnp.asarray(self.v[k2], jnp.float32),
                    include_endpoints=True)):
                return False
        # midpoint must be inside (interior diagonal)
        mid = (self.v[i] + self.v[j]) / 2.0
        return self.contains(mid)

    def is_ear(self, i):
        """Vertex i is an ear: convex and (i-1, i+1) is a diagonal."""
        n = len(self.v)
        if n == 3:
            return True
        return self.is_convex_vertex(i) and self.is_diagonal(i - 1, i + 1)

    def ears(self):
        """All ear vertex indices (CalculateEars, Polygon.cpp:145)."""
        return [i for i in range(len(self.v)) if self.is_ear(i)]

    def is_mouth(self, i):
        """Reflex vertex whose chord is an external diagonal (mouth)."""
        n = len(self.v)
        if n == 3:
            return False
        return (not self.is_convex_vertex(i)) and not self.is_diagonal(
            i - 1, i + 1)

    def mouths(self):
        return [i for i in range(len(self.v)) if self.is_mouth(i)]

    # ---- triangulation (TriangulateDiagnolSplitting, Polygon.cpp:934) ----
    def triangulate(self):
        """Ear-clipping triangulation. Returns (T, 3) indices into the
        original vertex array. Works for any simple polygon."""
        verts = self.v.copy()
        idx = list(range(len(verts)))
        poly = Polygon(verts)
        poly_idx = idx[:]
        if not poly.is_ccw():
            poly.v = poly.v[::-1].copy()
            poly_idx = poly_idx[::-1]
        tris = []
        guard = 0
        while len(poly.v) > 3 and guard < 10000:
            guard += 1
            for i in range(len(poly.v)):
                if poly.is_ear(i):
                    n = len(poly.v)
                    tris.append((poly_idx[(i - 1) % n], poly_idx[i],
                                 poly_idx[(i + 1) % n]))
                    poly.v = np.delete(poly.v, i, axis=0)
                    poly_idx.pop(i)
                    break
            else:
                raise RuntimeError("no ear found (non-simple polygon?)")
        tris.append(tuple(poly_idx))
        return np.asarray(tris, np.int32)

    # ---- IO (Polygon.h:174-209, Polygon.cpp:894) ----
    def save_txt(self, path):
        with open(path, "w") as f:
            for p in self.v:
                f.write(f"{p[0]} {p[1]}\n")

    @classmethod
    def load_txt(cls, path):
        pts = []
        with open(path) as f:
            for line in f:
                t = line.split()
                if len(t) >= 2:
                    pts.append((float(t[0]), float(t[1])))
        return cls(pts)

    # ---- random simple polygon (Polygon.h:91-172) ----
    @classmethod
    def random_simple(cls, n, rng=None, r_min=0.5, r_max=1.5):
        """Star-shaped random polygon: sorted angles + random radii
        (always simple)."""
        rng = rng or np.random.default_rng()
        ang = np.sort(rng.uniform(0, 2 * math.pi, n))
        rad = rng.uniform(r_min, r_max, n)
        return cls(np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1))


def points_in_polygon(points, vertices):
    """Vectorized point-in-polygon ray cast: points (N, 2) vs polygon (M, 2).
    Returns (N,) bool. Pure jnp — runs batched on device."""
    px = points[..., 0:1]                       # (N, 1)
    py = points[..., 1:2]
    ax = vertices[None, :, 0]                   # (1, M)
    ay = vertices[None, :, 1]
    bx = jnp.roll(vertices[:, 0], -1)[None, :]
    by = jnp.roll(vertices[:, 1], -1)[None, :]
    cond = (ay > py) != (by > py)
    denom = jnp.where(by - ay == 0.0, 1e-30, by - ay)
    x_int = ax + (py - ay) * (bx - ax) / denom
    crossing = cond & (px < x_int)
    return jnp.sum(crossing, axis=-1) % 2 == 1
