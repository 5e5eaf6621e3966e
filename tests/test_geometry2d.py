"""2D geometry domain tests (capability: Geometry/Segment.h, Polygon.cpp,
ArtGalleryTheorem.h — the PolygonApp1 features as asserted checks)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from computational_ray_tracer_tpu.geometry2d import segment as seg
from computational_ray_tracer_tpu.geometry2d.polygon import (Polygon,
                                                             points_in_polygon)
from computational_ray_tracer_tpu.geometry2d import visibility as vis


def test_orientation_and_turns():
    a = jnp.asarray([0.0, 0.0])
    b = jnp.asarray([1.0, 0.0])
    c = jnp.asarray([1.0, 1.0])
    assert float(seg.orientation(a, b, c)) > 0
    assert bool(seg.is_left_turn(a, b, c))
    assert bool(seg.is_right_turn(a, c, b))
    assert bool(seg.collinear(a, b, jnp.asarray([2.0, 0.0])))


def test_segment_intersection_batch():
    a = jnp.asarray([[0.0, 0.0]] * 3)
    b = jnp.asarray([[2.0, 2.0]] * 3)
    c = jnp.asarray([[0.0, 2.0], [3.0, 0.0], [1.0, 1.0]])
    d = jnp.asarray([[2.0, 0.0], [4.0, 0.0], [3.0, 3.0]])
    hit = seg.segments_intersect(a, b, c, d)
    assert bool(hit[0])          # proper crossing
    assert not bool(hit[1])      # disjoint
    assert bool(hit[2])          # collinear overlap touches
    proper = seg.segments_intersect(a, b, c, d, include_endpoints=False)
    assert bool(proper[0]) and not bool(proper[1])


def test_intersection_point():
    p, t, u, valid = seg.segment_segment_intersection_point(
        jnp.asarray([0.0, 0.0]), jnp.asarray([2.0, 2.0]),
        jnp.asarray([0.0, 2.0]), jnp.asarray([2.0, 0.0]))
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(p), [1.0, 1.0], atol=1e-6)


def test_point_segment_distance():
    d = seg.point_segment_distance(jnp.asarray([1.0, 1.0]),
                                   jnp.asarray([0.0, 0.0]),
                                   jnp.asarray([2.0, 0.0]))
    assert float(d) == pytest.approx(1.0)
    d2 = seg.point_segment_distance(jnp.asarray([-3.0, 4.0]),
                                    jnp.asarray([0.0, 0.0]),
                                    jnp.asarray([2.0, 0.0]))
    assert float(d2) == pytest.approx(5.0)


def test_point_triangle_distance():
    a, b, c = (jnp.asarray([0.0, 0.0]), jnp.asarray([2.0, 0.0]),
               jnp.asarray([0.0, 2.0]))
    assert float(seg.point_triangle_distance(
        jnp.asarray([0.5, 0.5]), a, b, c)) == 0.0
    assert float(seg.point_triangle_distance(
        jnp.asarray([0.0, -1.0]), a, b, c)) == pytest.approx(1.0)


def square():
    return Polygon([(0, 0), (2, 0), (2, 2), (0, 2)])


def test_polygon_area_ccw():
    p = square()
    assert p.area() == pytest.approx(4.0)
    assert p.is_ccw()
    p2 = Polygon([(0, 0), (0, 2), (2, 2), (2, 0)])  # CW
    assert not p2.is_ccw()
    p2.make_ccw()
    assert p2.is_ccw()
    assert p2.area() == pytest.approx(4.0)


def test_polygon_editing():
    p = square()
    p.add_vertex((1.0, -0.5), 1)
    assert len(p) == 5
    p.remove_vertex(1)
    assert len(p) == 4
    p.split_edge(0)
    assert len(p) == 5
    np.testing.assert_allclose(p.v[1], [1.0, 0.0])
    p.shift((1, 1))
    np.testing.assert_allclose(p.v[0], [1.0, 1.0])
    p.rotate(math.pi / 2)
    p.scale(2.0)
    assert p.area() == pytest.approx(4.0 * 4.0, rel=1e-6)


def test_internal_angles_square():
    angles = square().internal_angles()
    np.testing.assert_allclose(angles, math.pi / 2, atol=1e-9)


def test_contains_and_hits():
    p = square()
    assert p.contains((1.0, 1.0))
    assert not p.contains((3.0, 1.0))
    assert p.hit_vertex((0.05, 0.0), 0.1) == 0
    assert p.hit_vertex((5, 5), 0.1) == -1
    assert p.hit_edge((1.0, 0.05), 0.1) == 0


def test_points_in_polygon_batch():
    p = square()
    pts = jnp.asarray([[1.0, 1.0], [3.0, 1.0], [-1.0, 1.0], [1.9, 1.9]],
                      jnp.float32)
    got = np.asarray(points_in_polygon(pts, jnp.asarray(p.v, jnp.float32)))
    np.testing.assert_array_equal(got, [True, False, False, True])


def test_ears_convex_polygon():
    # every vertex of a convex polygon is an ear
    p = square()
    assert p.ears() == [0, 1, 2, 3]
    assert p.mouths() == []


def test_ears_reflex_polygon():
    # L-shape: the reflex corner is not an ear
    p = Polygon([(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)])
    ears = p.ears()
    assert 3 not in ears  # (1,1) is the reflex vertex
    assert len(ears) >= 2


def test_triangulation_area_preserved():
    polys = [
        square(),
        Polygon([(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]),  # L
        Polygon.random_simple(12, np.random.default_rng(3)),
        Polygon.random_simple(20, np.random.default_rng(7)),
    ]
    for p in polys:
        tris = p.triangulate()
        assert len(tris) == len(p) - 2  # Euler: n-2 triangles
        area = 0.0
        for (i, j, k) in tris:
            a, b, c = p.v[i], p.v[j], p.v[k]
            area += abs(0.5 * ((b[0]-a[0])*(c[1]-a[1])
                               - (b[1]-a[1])*(c[0]-a[0])))
        assert area == pytest.approx(p.area(), rel=1e-6)


def test_polygon_txt_roundtrip(tmp_path):
    p = Polygon.random_simple(8, np.random.default_rng(1))
    path = str(tmp_path / "poly.txt")
    p.save_txt(path)
    q = Polygon.load_txt(path)
    np.testing.assert_allclose(q.v, p.v, rtol=1e-6)


def test_visibility_convex_sees_all():
    # in a convex polygon the visibility polygon == the polygon
    p = square()
    v = vis.visibility_polygon(p, (1.0, 1.0))
    assert v.area() == pytest.approx(p.area(), rel=0.01)


def test_visibility_blocked_by_reflex():
    # U-shaped cave: a guard in one arm cannot see the other arm
    p = Polygon([(0, 0), (5, 0), (5, 4), (4, 4), (4, 1), (3, 1), (3, 4),
                 (0, 4)])
    guard = (4.5, 3.5)  # in the right arm
    v = vis.visibility_polygon(p, guard)
    assert v.area() < p.area() * 0.9
    # a point deep in the left region is not visible
    from computational_ray_tracer_tpu.geometry2d.polygon import \
        points_in_polygon as pip
    assert not bool(pip(jnp.asarray([[0.5, 3.5]], jnp.float32),
                        jnp.asarray(v.v, jnp.float32))[0])
    # a point with line of sight is visible
    assert bool(pip(jnp.asarray([[4.5, 0.6]], jnp.float32),
                    jnp.asarray(v.v, jnp.float32))[0])


def test_is_visible():
    p = Polygon([(0, 0), (5, 0), (5, 4), (4, 4), (4, 1), (3, 1), (3, 4),
                 (0, 4)])
    assert vis.is_visible(p, (4.5, 0.5), (0.5, 0.5))
    assert not vis.is_visible(p, (4.5, 3.5), (3.2, 3.5))


def test_guard_coverage():
    p = square()
    cov = vis.guard_coverage(p, [(1.0, 1.0)], n_samples=512)
    assert cov > 0.97  # one guard covers a convex room
