"""Predicate goldens ported from
/root/reference/tests/vector_predicate_tests.py and tests/dateline_tests.py."""

import numpy as np
import pytest

from karta_ray.kernels import predicates as P


def pts(*xy):
    a = np.asarray(xy, dtype=np.float64)
    return a[:, 0], a[:, 1]


UNITSQUARE = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
DIAMOND = np.array([(0.0, 0.0), (1.0, 1.0), (2.0, 0.0), (1.0, -1.0)])


class TestContains:
    def test_trivial(self):
        # vector_predicate_tests.py:136-153
        px, py = pts((-0.5, 0.92), (0.125, 0.875))
        got = P.points_in_ring(px, py, UNITSQUARE)
        assert got.tolist() == [False, True]

        x = np.arange(-4, 5, dtype=float)
        y = x ** 2
        bbox_ring = np.array([(-2.5, 2.5), (2.5, 2.5), (2.5, -2.5), (-2.5, -2.5)])
        inside = P.points_in_ring(x, y, bbox_ring)
        kept = list(zip(x[inside], y[inside]))
        assert kept == [(-1.0, 1.0), (0.0, 0.0), (1.0, 1.0)]

    def test_hard_cases(self):
        # vector_predicate_tests.py:155-163
        px, py = pts((2, 1), (1, 0), (2.5, 0), (0, -1), (2, -1))
        got = P.points_in_ring(px, py, DIAMOND)
        assert got.tolist() == [False, True, False, False, False]

    def test_on_edge(self):
        # vector_predicate_tests.py:165-170: bottom and left edges are IN
        px, py = pts((0.5, 0.0), (0.0, 0.5))
        got = P.points_in_ring(px, py, UNITSQUARE)
        assert got.tolist() == [True, True]

    def test_hippie_star(self):
        # vector_predicate_tests.py:172-182
        theta = np.linspace(0, 2 * np.pi, 361)[:-1]
        r = 10 * np.sin(theta * 8) + 15
        ring = np.column_stack([np.cos(theta) * r + 25, np.sin(theta) * r + 25])
        got = P.points_in_ring(np.array([28.75]), np.array([25.625]), ring)
        assert got.tolist() == [True]

    def test_polar(self):
        # vector_predicate_tests.py:184-190
        ring = np.array([(0.0, 80.0), (45.0, 80.0), (90.0, 80.0), (135.0, 80.0),
                         (180.0, 80.0), (225.0, 80.0), (270.0, 80.0), (315.0, 80.0)])
        assert P.ring_is_polar(ring)
        got = P.points_in_polygon(np.array([45.0, 45.0]), np.array([85.0, 75.0]),
                                  [ring], geographical=True)
        assert got.tolist() == [True, False]

    def test_polygon_with_hole(self):
        outer = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)])
        hole = np.array([(2.0, 2.0), (4.0, 2.0), (3.0, 6.0)])
        px, py = pts((1, 1), (3, 3), (5, 5))
        got = P.points_in_polygon(px, py, [outer, hole])
        assert got.tolist() == [True, False, True]


class TestOrientation:
    def test_clockwise(self):
        # vector_predicate_tests.py:14-22
        assert P.ring_is_clockwise(np.array([(0, 0), (0, 1), (1, 1), (1, 0)], float))
        assert not P.ring_is_clockwise(np.array([(0, 0), (1, 0), (1, 1), (0, 1)], float))

    def test_ispolar(self):
        # vector_predicate_tests.py:24-46
        ring = np.array([(0.0, 80), (30.0, 80), (60.0, 80), (90.0, 80),
                         (120.0, 80), (150.0, 80), (180.0, 80), (-150.0, 80),
                         (-120.0, 80), (-90.0, 80), (-60.0, 80), (-30.0, 80)])
        assert P.ring_is_polar(ring)
        ring = np.array([(0.0, 85.0), (90.0, 85.0), (180.0, 85.0), (-90.0, 85.0)])
        assert P.ring_is_polar(ring)
        ring = np.array([(45.0, 30.0), (40.0, 25.0), (45.0, 20.0), (35.0, 25.0)])
        assert not P.ring_is_polar(ring)
        ring = np.array([(-80, 0), (-50, -10), (20, -8), (35, -17), (55, 15),
                         (-45, 18), (-60, 12)], dtype=float)
        assert not P.ring_is_polar(ring)


class TestIntersections:
    def test_cross(self):
        # vector_predicate_tests.py:50-55
        a = np.array([(0.0, 0.0), (3.0, 3.0)])
        b = np.array([(0.0, 3.0), (3.0, 0.0)])
        assert P.intersects_planar(a, b)
        got = P.intersections_planar(a, b)
        assert got.tolist() == [[1.5, 1.5]]

    def test_no_cross_overlapping_bbox(self):
        # vector_predicate_tests.py:57-67
        a = np.array([(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0)])
        b = np.array([(1.0, 4.0), (-2.0, 4.0), (-2.0, 1.0), (1.0, 1.0)])
        assert not P.intersects_planar(a, b)

    def test_polygons_cross(self):
        # vector_predicate_tests.py:69-81: same chains as rings DO cross
        a = np.array([(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0)])
        b = np.array([(1.0, 4.0), (-2.0, 4.0), (-2.0, 1.0), (1.0, 1.0)])
        assert P.intersects_planar(a, b, ring_a=True, ring_b=True)
        got = P.intersections_planar(a, b, ring_a=True, ring_b=True)
        s = sorted(map(tuple, np.unique(got, axis=0).tolist()))
        assert s == [(0.0, 1.0), (1.0, 3.0)]

    def test_horizontal(self):
        # vector_predicate_tests.py:83-88
        a = np.array([(-2.5, 2.5), (2.5, 2.5)])
        b = np.array([(0.0, 0.0), (1.0, 5.0)])
        got = P.intersections_planar(a, b)
        assert got.tolist() == [[0.5, 2.5]]

    def test_vertical(self):
        # vector_predicate_tests.py:90-95
        a = np.array([(2.5, 2.5), (2.5, -2.5)])
        b = np.array([(1.5, 2.5), (3.5, -2.5)])
        got = P.intersections_planar(a, b)
        assert got.tolist() == [[2.5, 0.0]]

    def test_intersection_polygons(self):
        # vector_predicate_tests.py:97-101
        a = np.array([(0, 0), (2, 0), (3, 1), (2, 1), (2, 2), (1, 0)], float)
        b = np.array([(-1, -1), (1, -1), (1, 1), (-1, 1)], float)
        assert P.intersects_planar(a, b, ring_a=True, ring_b=True)

    def test_geographical(self):
        # vector_predicate_tests.py:103-133
        assert P.intersects_sph(np.array([(-40.0, 36.0), (-38.0, 36.5)]),
                                np.array([(-39.0, 34.0), (-39.0, 37.5)]))
        assert not P.intersects_sph(np.array([(-40.0, 36.0), (-38.0, 36.5)]),
                                    np.array([(-42.0, 34.0), (-41.0, 37.5)]))
        # geodesic arc passes north of the rhumb line
        assert P.intersects_sph(np.array([(-50.0, 70.0), (50.0, 70.0)]),
                                np.array([(0.0, 71.0), (1.0, 89.0)]))
        # vertical segment on the sweepline
        assert P.intersects_sph(np.array([(-50.0, 70.0), (50.0, 70.0)]),
                                np.array([(0.0, 71.0), (0.0, 89.0)]))
        # longitudes are normalized (340 == -20)
        assert P.intersects_sph(np.array([(-10.0, 20.0), (-30.0, 20.0)]),
                                np.array([(340.0, 10.0), (340.0, 30.0)]))


class TestBBoxes:
    def test_overlap_touching_counts(self):
        assert P.bboxes_overlap((0, 0, 1, 1), (1, 0, 2, 1))
        assert P.bboxes_overlap((0, 0, 1, 1), (0.5, 0.5, 2, 2))
        assert not P.bboxes_overlap((0, 0, 1, 1), (1.1, 0, 2, 1))

    def test_planar_bbox(self):
        bb = P.bbox_planar(np.array([(0.0, 1.0), (2.0, -1.0), (1.0, 3.0)]))
        assert bb == (0.0, -1.0, 2.0, 3.0)

    def test_dateline_bbox(self):
        # dateline_tests.py:39-46: quad straddling the dateline
        ring = np.array([(179.0, -1.0), (-179.0, -1.0), (-179.0, 1.0), (179.0, 1.0)])
        xmin, ymin, xmax, ymax = P.bbox_geographical(ring, ring=True)
        assert xmin == 179.0
        assert xmax == -179.0
        assert ymin == pytest.approx(-1.000152297, abs=1e-6)
        assert ymax == pytest.approx(1.000152297, abs=1e-6)

    def test_geographical_bbox_simple(self):
        line = np.array([(10.0, 10.0), (20.0, 10.0)])
        xmin, ymin, xmax, ymax = P.bbox_geographical(line)
        assert xmin == 10.0 and xmax == 20.0
        # great-circle apex is above lat 10
        assert ymin == 10.0
        assert ymax > 10.0

    def test_crosses_dateline(self):
        assert P.crosses_dateline(179.0, -179.0) == -1
        assert P.crosses_dateline(-179.0, 179.0) == 1
        assert P.crosses_dateline(10.0, 20.0) == 0
        assert P.crosses_dateline(-10.0, 10.0) == 0


class TestCountCrossings:
    def test_count(self):
        # upward ray from inside the unit square crosses once
        assert P.count_crossings(np.array([0.5]), np.array([0.5]),
                                 UNITSQUARE, ring=True)[0] == 1
        assert P.count_crossings(np.array([-1.0]), np.array([0.5]),
                                 UNITSQUARE, ring=True)[0] == 0


class TestPolarDivergence:
    """Captured divergence from the reference (documented in README):
    karta's ``ispolar`` counts unsigned dateline crossings, flagging
    dateline-straddling NON-polar rings as polar and routing them to the
    azimuth-sum test; karta_ray's signed winding does not."""

    QUAD = np.array([(179.0, -10.0), (-179.0, -10.0),
                     (-179.0, 10.0), (179.0, 10.0)])

    def _reference_ispolar(self, ring):
        # karta/vector/geometry.py:1050-1076 semantics: accumulate
        # |360| whenever a segment crosses the dateline
        lons = ring[:, 0]
        s = 0.0
        for i in range(len(lons)):
            d = lons[(i + 1) % len(lons)] - lons[i]
            if abs(d) > 180.0:  # dateline crossing
                s += 360.0
            else:
                s += abs(d) * 0  # non-crossing segments contribute 0 net
        return bool(s >= 360.0)

    def test_verdicts_differ_on_dateline_quad(self):
        from karta_ray.kernels.predicates import (points_in_ring_dateline,
                                                  ring_is_polar)

        # reference would classify the quad polar; we do not
        assert self._reference_ispolar(self.QUAD) is True
        assert ring_is_polar(self.QUAD) is False
        # and our dateline winding gives the spherically-correct verdicts
        inside = points_in_ring_dateline(
            np.array([179.5, -179.5, 0.0, 179.5]),
            np.array([0.0, 0.0, 0.0, 80.0]), self.QUAD)
        assert inside.tolist() == [True, True, False, False]

    def test_true_polar_ring_still_polar(self):
        from karta_ray.kernels.predicates import ring_is_polar

        cap = np.column_stack([np.linspace(-180.0, 180.0, 9)[:-1],
                               np.full(8, 75.0)])
        assert ring_is_polar(cap) is True
