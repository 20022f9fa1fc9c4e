"""Line/measure/hull goldens ported from
/root/reference/tests/geometry_tests.py."""

import numpy as np
import pytest

from karta_ray import crs
from karta_ray.kernels import hull, lines, measures


class TestNearest:
    def test_shortest_distance_planar(self):
        # geometry_tests.py:387-391
        verts = np.array([(0.0, 0.0), (2.0, 2.0), (5.0, 4.0)])
        (x, y), d = lines.nearest_on_chain(0.0, 2.0, verts)
        assert d == pytest.approx(np.sqrt(2), abs=1e-10)
        assert (x, y) == (1.0, 1.0)

    def test_shortest_distance_geo(self):
        # geometry_tests.py:393-397
        verts = np.array([(127.0, -35.0), (132.0, -28.0), (142.0, -29.0)])
        _, d = lines.nearest_on_chain(98.0, -7.0, verts, crs.LonLatWGS84)
        assert d == pytest.approx(4257313.5324397, abs=0.5)

    def test_nearest_on_boundary_geo(self):
        # geometry_tests.py:412-429
        verts = np.array([(-40.0, 0.0), (35.0, 0.0)])
        (x, y), _ = lines.nearest_on_chain(30.0, 80.0, verts, crs.LonLatWGS84)
        assert x == pytest.approx(30.0, abs=1e-5)
        assert y == pytest.approx(0.0, abs=1e-5)
        # near-degenerate case that breaks naive root finding
        (x, y), _ = lines.nearest_on_chain(30.0, 1e-8, verts, crs.LonLatWGS84)
        assert x == pytest.approx(30.0, abs=1e-5)
        assert y == pytest.approx(0.0, abs=1e-5)

    def test_nearest_on_boundary_geo2(self):
        verts = np.array([(-20.0, 32.0), (-26.0, 43.0), (-38.0, 39.0)])
        (x, y), _ = lines.nearest_on_chain(-34.0, 52.0, verts, crs.LonLatWGS84)
        assert x == pytest.approx(-27.98347, abs=1e-5)
        assert y == pytest.approx(42.456316, abs=1e-5)


class TestResample:
    def test_to_points_cartesian(self):
        # geometry_tests.py:503-514
        verts = np.array([(0.0, 0.0), (4.0, 3.0), (1.0, 7.0)])
        pts = lines.to_points(verts, 1.0)
        ans = [(0., 0.), (0.8, 0.6), (1.6, 1.2), (2.4, 1.8), (3.2, 2.4),
               (4., 3.), (3.4, 3.8), (2.8, 4.6), (2.2, 5.4), (1.6, 6.2),
               (1., 7.)]
        assert len(pts) == len(ans)
        np.testing.assert_allclose(pts, ans, atol=1e-7)

    def test_to_points_lonlat(self):
        # geometry_tests.py:516-531
        verts = np.array([(0.0, 38.0), (-10.5, 33.0), (-6.0, 35.0)])
        pts = lines.to_points(verts, 100000.0, crs.LonLatWGS84)
        assert len(pts) == 17
        assert pts[1][0] == pytest.approx(-1.00809817, abs=1e-6)
        assert pts[1][1] == pytest.approx(37.58554833, abs=1e-6)
        assert pts[12][0] == pytest.approx(-10.09466286, abs=1e-6)
        assert pts[16][0] == pytest.approx(-6.30697252, abs=1e-6)

    def test_to_npoints_cartesian(self):
        # geometry_tests.py:533-557
        verts = np.array([(0.0, 0.0), (1.0, 2.0), (3.0, -2.0), (4.0, -1.0),
                          (4.0, 3.0), (3.0, 2.0)])
        pts = lines.to_npoints(verts, 20)
        assert len(pts) == 20
        assert pts[1][0] == pytest.approx(0.318619234003536, abs=1e-5)
        assert pts[1][1] == pytest.approx(0.637238468007072, abs=1e-5)
        assert pts[10][0] == pytest.approx(3.294395938694146, abs=1e-5)
        assert pts[18][0] == pytest.approx(3.5037812428946715, abs=1e-5)
        np.testing.assert_allclose(pts[19], (3.0, 2.0), atol=1e-8)

    def test_to_npoints_lonlat(self):
        # geometry_tests.py:559-585
        verts = np.array([(0.0, 40.0), (120.0, 40.0)])
        pts = lines.to_npoints(verts, 20)  # planar fallback shape check
        pts = lines.to_npoints(verts, 20, crs.LonLatWGS84)
        assert len(pts) == 20
        assert pts[1][0] == pytest.approx(4.006549675732082, abs=1e-5)
        assert pts[1][1] == pytest.approx(43.200316625343305, abs=1e-5)
        assert pts[9][0] == pytest.approx(55.7308352362257, abs=1e-5)
        assert pts[9][1] == pytest.approx(59.194673757153645, abs=1e-5)
        np.testing.assert_allclose(pts[19], (120.0, 40.0), atol=1e-8)

    def test_to_npoints_precision(self):
        # geometry_tests.py:587-597
        verts = np.array([(-20.247017, 79.683933), (-20.0993, 79.887917),
                          (-19.13705, 80.048567), (-18.680467, 80.089333),
                          (-17.451917, 80.14405), (-16.913233, 80.02715),
                          (-16.631367, 80.022933), (-16.194067, 80.0168),
                          (-15.915983, 80.020267), (-15.7763, 80.021283)])
        for n in range(2, 30):
            assert len(lines.to_npoints(verts, n, crs.LonLatWGS84)) == n


class TestMeasures:
    SQUARE = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)])
    TRI = np.array([(2.0, 2.0), (4.0, 2.0), (3.0, 6.0)])

    def test_ringed_perimeter(self):
        # geometry_tests.py:480-485
        p = measures.polygon_perimeter([self.SQUARE, self.TRI])
        assert round(p, 3) == 50.246

    def test_ringed_area(self):
        # geometry_tests.py:487-492
        a = measures.polygon_area([self.SQUARE, self.TRI])
        assert a == 100 - measures.polygon_area([self.TRI])

    def test_area_pi(self):
        # geometry_tests.py:494-499
        r = np.linspace(0, 2 * np.pi, 10000)
        ring = np.column_stack([np.cos(r), np.sin(r)])
        assert measures.polygon_area([ring]) == pytest.approx(np.pi, abs=1e-6)

    def test_centroid(self):
        # geometry_tests.py:445-465
        sq = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
        assert measures.ring_centroid(sq) == (0.5, 0.5)
        p = np.array([(0.0, 0.0), (1.0, 0.0), (2.0, 0.5), (1.0, 1.0), (0.0, 1.0)])
        cx, cy = measures.ring_centroid(p)
        assert cx == pytest.approx(7 / 9)
        assert cy == 0.5

    def test_rotate(self):
        # geometry_tests.py:468-478
        sq = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
        rot45 = measures.rotate(sq, 45, (0.5, 0.5))
        np.testing.assert_allclose(
            rot45,
            [(0.5, -0.20710678), (1.20710678, 0.5),
             (0.5, 1.20710678), (-0.20710678, 0.5)], atol=1e-8)
        rot90 = measures.rotate(sq, 90, (0.0, 0.0))
        np.testing.assert_allclose(
            rot90, [(0.0, 0.0), (0.0, 1.0), (-1.0, 1.0), (-1.0, 0.0)],
            atol=1e-12)

    def test_affine_roundtrip(self):
        rng = np.random.RandomState(2)
        src = rng.rand(10, 2) * 10
        M = np.array([[1.2, -0.3, 4.0], [0.2, 0.9, -1.0]])
        dst = measures.apply_affine(src, M)
        M2 = measures.best_fit_affine(src, dst)
        np.testing.assert_allclose(M, M2, atol=1e-9)


class TestHull:
    def test_planar_hull1(self):
        # geometry_tests.py:354-365
        verts = np.array([(953, 198), (986, 271), (937, 305), (934, 464),
                          (967, 595), (965, 704), (800, 407), (782, 322),
                          (863, 979), (637, 689), (254, 944), (330, 745),
                          (363, 646), (27, 990), (127, 696), (286, 352),
                          (436, 205), (88, 254), (187, 85)], dtype=float)
        idx = hull.convex_hull_planar(verts)
        got = [tuple(map(int, verts[i])) for i in idx]
        assert got == [(27, 990), (88, 254), (187, 85), (953, 198),
                       (986, 271), (965, 704), (863, 979)]

    def test_planar_hull2(self):
        # geometry_tests.py:367-377
        verts = np.array([(-158, 175), (-179, 230), (-404, -390), (259, -79),
                          (32, 144), (-59, 355), (402, 301), (239, 159),
                          (-421, 172), (-482, 26), (2, -499), (134, -72),
                          (-412, -12), (476, 235), (-412, 40), (-198, -256),
                          (314, 331), (431, -492), (325, -415), (-400, -491)],
                         dtype=float)
        idx = hull.convex_hull_planar(verts)
        got = [tuple(map(int, verts[i])) for i in idx]
        assert got == [(-482, 26), (-400, -491), (2, -499), (431, -492),
                       (476, 235), (402, 301), (314, 331), (-59, 355),
                       (-421, 172)]

    def test_spherical_hull(self):
        # geometry_tests.py:379-385
        verts = np.array([(-50, 70), (0, 71), (50, 70), (0, 50)], dtype=float)
        idx = hull.convex_hull_sph(verts)
        got = [tuple(map(int, verts[i])) for i in idx]
        assert got == [(-50, 70), (0, 50), (50, 70)]


class TestWithinDistance:
    def test_golden(self):
        # vector_predicate_tests.py:192-197
        from karta_ray.kernels.lines import within_distance
        verts = np.array([(0.0, 0.0), (1.0, 1.0), (3.0, 1.0)])
        assert within_distance(1.0, 1.5, verts, 0.6)
        assert not within_distance(1.0, 1.5, verts, 0.4)


class TestRank3:
    """Rank-3 (z) semantics per the reference's code paths: distance
    adds z in quadrature (geometry.py:311-313), shift/rotate pass z
    through (geometry.py:327-332), 3x4 affine transforms z
    (geometry.py:204-230)."""

    def test_distance_quadrature_planar(self):
        from karta_ray.crs import point_distance

        d = point_distance("cartesian", 3.0, 4.0, 6.0, 8.0,
                           alt1=5.0, alt2=10.0)
        assert float(d) == pytest.approx(np.sqrt(50.0), rel=1e-15)
        # without both alts: plain planar
        d2 = point_distance("cartesian", 3.0, 4.0, 6.0, 8.0)
        assert float(d2) == 5.0

    def test_distance_quadrature_geodesic(self):
        from karta_ray.crs import SphericalEarth, point_distance

        base = float(SphericalEarth.inverse(0.0, 0.0, 1.0, 1.0)[2])
        d = point_distance("spherical", 0.0, 0.0, 1.0, 1.0,
                           alt1=0.0, alt2=3000.0)
        assert float(d) == pytest.approx(np.sqrt(base * base + 9e6),
                                         rel=1e-15)

    def test_shift_rotate_pass_z(self):
        from karta_ray.kernels.measures import rotate, shift

        v = np.array([[1.0, 2.0, 7.0], [3.0, 4.0, -1.0]])
        s = shift(v, 10.0, 20.0)
        assert s[:, 2].tolist() == [7.0, -1.0]
        r = rotate(v, 90.0)
        assert r[:, 2].tolist() == [7.0, -1.0]

    def test_affine_3x4(self):
        from karta_ray.kernels.measures import apply_affine

        # scale z by 2 and lift x by z (geometry.py:219-230 math)
        M = np.array([[1.0, 0.0, 1.0, 0.0],
                      [0.0, 1.0, 0.0, 5.0],
                      [0.0, 0.0, 2.0, 1.0]])
        v3 = np.array([[2.0, 3.0, 4.0]])
        out = apply_affine(v3, M)
        assert out.tolist() == [[6.0, 8.0, 9.0]]
        # rank-2 input: z treated as 0, output stays rank 2
        v2 = np.array([[2.0, 3.0]])
        out2 = apply_affine(v2, M)
        assert out2.tolist() == [[2.0, 8.0]]

    def test_affine_bad_shape(self):
        from karta_ray.kernels.measures import apply_affine

        with pytest.raises(ValueError):
            apply_affine(np.zeros((1, 2)), np.zeros((4, 4)))

    def test_cumulength_rank3_planar(self):
        # Point.distance per segment: sqrt(d2d^2 + dz^2)
        v = np.array([[0.0, 0.0, 0.0], [3.0, 4.0, 12.0]])
        assert lines.cumulength(v).tolist() == [0.0, 13.0]

    def test_cumulength_rank3_geodesic(self):
        v = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 3000.0]])
        h = float(crs.SphericalEarth.inverse(0.0, 0.0, 1.0, 1.0)[2])
        got = lines.cumulength(v, crs=crs.SphericalEarth)
        assert got[1] == pytest.approx(np.sqrt(h * h + 9e6), rel=1e-15)

    def test_line_length_rank3_stays_2d(self):
        # reference quirk: Line.length reads only x/y
        # (vectorgeo.pyx:178-195, geometry.py:655-663), so for rank-3
        # lines length != cumulength()[-1]
        v = np.array([[0.0, 0.0, 0.0], [3.0, 4.0, 12.0]])
        assert lines.line_length(v) == 5.0
        assert lines.cumulength(v)[-1] == 13.0

    def test_flat_distances_rank3(self):
        v = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
        d = lines.flat_distances_to(v, 0.0, 0.0, pz=2.0)
        assert d.tolist() == [2.0, pytest.approx(np.sqrt(3.0))]
        # rank-2 verts ignore pz (reference min-rank slicing)
        d2 = lines.flat_distances_to(v[:, :2], 0.0, 0.0, pz=2.0)
        assert d2.tolist() == [0.0, pytest.approx(np.sqrt(2.0))]

    def test_nearest_vertex_rank3_reference_golden(self):
        # reference tests/geometry_tests.py:263-266: nearest vertex of
        # the 20-point rank-3 fixture to Point((1, 2, 3)) is index 12
        verts = np.array([
            (2.0, 9.0, 9.0), (4.0, 1.0, 9.0), (4.0, 1.0, 5.0),
            (2.0, 8.0, 0.0), (9.0, 8.0, 4.0), (1.0, 4.0, 6.0),
            (7.0, 3.0, 4.0), (2.0, 5.0, 3.0), (1.0, 6.0, 6.0),
            (8.0, 1.0, 0.0), (5.0, 5.0, 1.0), (4.0, 5.0, 7.0),
            (3.0, 3.0, 5.0), (9.0, 0.0, 9.0), (6.0, 3.0, 8.0),
            (4.0, 5.0, 7.0), (9.0, 9.0, 4.0), (1.0, 4.0, 7.0),
            (1.0, 7.0, 8.0), (9.0, 1.0, 6.0)])
        assert lines.nearest_vertex_to(verts, 1.0, 2.0, pz=3.0) == 12


class TestConversionsAndDistances:
    """Line<->Polygon conversion + per-vertex distance accessors
    (reference geometry.py:564-574, 971-973, 1176-1179)."""

    def test_polygon_to_line_closes(self):
        import numpy as np
        from karta_ray.kernels import lines as L
        ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0]])
        out = L.polygon_to_line(ring)
        assert len(out) == 4
        assert np.array_equal(out[0], out[-1])

    def test_line_to_polygon_drops_closure(self):
        import numpy as np
        from karta_ray.kernels import lines as L
        closed = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 0.0]])
        out = L.line_to_polygon(closed)
        assert len(out) == 3
        rt = L.polygon_to_line(out)
        assert np.array_equal(rt, closed)

    def test_flat_distances_to(self):
        import numpy as np
        from karta_ray.kernels import lines as L
        verts = np.array([[0.0, 0.0], [3.0, 4.0], [6.0, 8.0]])
        d = L.flat_distances_to(verts, 0.0, 0.0)
        assert np.allclose(d, [0.0, 5.0, 10.0])

    def test_distances_to_geodesic(self):
        import numpy as np
        from karta_ray import crs as C
        from karta_ray.kernels import lines as L
        verts = np.array([[0.0, 0.0], [0.0, 1.0]])
        d = L.distances_to(verts, 0.0, 0.0, crs=C.LonLatWGS84)
        assert d[0] == 0.0
        # one degree of latitude on WGS84 ~ 110.57 km
        assert abs(d[1] - 110574.0) < 200.0

    def test_center_vertex_coords(self):
        import numpy as np
        from karta_ray.kernels import raster as RK
        t = (10.0, 20.0, 2.0, 3.0, 0.0, 0.0)
        cx, cy = RK.center_coords(t, (2, 3))
        assert cx.shape == (2, 3) and cy.shape == (2, 3)
        assert cx[0, 0] == 11.0 and cy[0, 0] == 21.5
        vx, vy = RK.vertex_coords(t, (2, 3))
        assert vx.shape == (3, 4)
        assert vx[0, 0] == 10.0 and vy[2, 3] == 26.0
        mx, my = RK.coordmesh(t, (2, 3))
        assert np.array_equal(mx, cx)

    def test_data_mask_and_bbox(self):
        import numpy as np
        from karta_ray.kernels import raster as RK
        v = np.full((4, 5), np.nan)
        v[1, 2] = 7.0
        v[2, 3] = 8.0
        m = RK.data_mask(v)
        assert m.sum() == 2
        t = (0.0, 0.0, 1.0, 1.0, 0.0, 0.0)
        bb = RK.data_bbox(v, t)
        # centers (2.5,1.5)..(3.5,2.5) padded half a cell -> edges
        assert bb == (2.0, 1.0, 4.0, 3.0)
        # multiband: valid only where all bands hold data
        stack = np.stack([v, np.roll(v, 1, axis=1)])
        assert RK.data_mask(stack).sum() == 0
