"""Geodesy goldens ported from /root/reference/tests/crs_tests.py and
tests/geometry_tests.py (values originally verified against proj)."""

import numpy as np
import pytest

from karta_ray import crs
from karta_ray.kernels import geodesy, karney


class TestCartesian:
    def test_forward(self):
        # crs_tests.py:54-59
        lons, lats, backaz = crs.Cartesian.forward(0.0, 0.0, 30.0, 5.0)
        assert float(lons) == pytest.approx(5.0 * np.sin(np.radians(30.0)), abs=1e-12)
        assert float(lats) == pytest.approx(5.0 * np.cos(np.radians(30.0)), abs=1e-12)
        assert float(backaz) == pytest.approx(30.0 + 180.0, abs=1e-12)

    def test_inverse(self):
        az, baz, dist = crs.Cartesian.inverse(0.0, 0.0, 3.0, 4.0)
        assert float(dist) == pytest.approx(5.0, abs=1e-12)
        assert float(az) == pytest.approx(np.degrees(np.arctan2(3.0, 4.0)), abs=1e-12)


class TestSpherical:
    def test_forward1(self):
        # crs_tests.py:91-98
        lon2, lat2, baz = crs.SphericalEarth.forward(0.0, 0.0, 90.0,
                                                     5003778.767588614)
        assert float(lon2) == pytest.approx(45.000084759104425, abs=1e-8)
        assert float(lat2) == pytest.approx(0.0, abs=1e-8)
        assert float(baz) == pytest.approx(-90.0, abs=1e-8)

    def test_forward2(self):
        # crs_tests.py:100-107
        lon2, lat2, baz = crs.SphericalEarth.forward(30.0, 0.0, 90.0,
                                                     5003778.767588614)
        assert float(lon2) == pytest.approx(75.00008475910442, abs=1e-8)
        assert float(lat2) == pytest.approx(0.0, abs=1e-8)
        assert float(baz) == pytest.approx(-90.0, abs=1e-8)

    def test_forward3(self):
        # crs_tests.py:109-116
        lon2, lat2, baz = crs.SphericalEarth.forward(-120.0, 49.0, 310.0, 2000e3)
        assert float(lon2) == pytest.approx(-146.51186194714958, abs=2e-6)
        assert float(lat2) == pytest.approx(57.99979808258465, abs=2e-6)
        assert float(baz) == pytest.approx(108.48890006687964, abs=2e-6)

    def test_inverse1(self):
        # crs_tests.py:118-127 (equatorial westward)
        az, baz, dist = crs.SphericalEarth.inverse(0.0, 0.0, -45.0, 0.0)
        assert float(az) == pytest.approx(-90.0)
        assert float(baz) == pytest.approx(90.0)
        assert float(dist) == pytest.approx(5003769.342810653, abs=1.0)

    def test_inverse2(self):
        # crs_tests.py:129-137
        az, baz, dist = crs.SphericalEarth.inverse(32.0, -17.0, 38.0, 5.0)
        assert float(az) == pytest.approx(15.597740818516172, abs=1e-6)
        assert float(baz) == pytest.approx(-165.04174639642943, abs=1e-6)
        assert float(dist) == pytest.approx(2533567.302751705, abs=1.0)

    def test_inverse3(self):
        # crs_tests.py:139-147 (reversed)
        az, baz, dist = crs.SphericalEarth.inverse(32.0, 5.0, 38.0, -17.0)
        assert float(az) == pytest.approx(165.0417463964294, abs=1e-6)
        assert float(baz) == pytest.approx(-15.597740818516172, abs=1e-6)
        assert float(dist) == pytest.approx(2533567.302751705, abs=1.0)

    def test_area(self):
        # crs_tests.py:148-165
        S12 = geodesy.spherical_area(6378137.0, 0.0, 40.0, 137.84490004377,
                                     41.79331020506)
        assert abs(S12) / 1e6 == pytest.approx(84516702.1955, abs=1e-3)
        S12 = geodesy.spherical_area(6378137.0, 70.0, 40.0, 207.84490004377,
                                     41.79331020506)
        assert abs(S12) / 1e6 == pytest.approx(84516702.1955, abs=1e-3)

    def test_intersection_spherical(self):
        # crs_tests.py:167-177 via the vectorized kernel
        xi, yi = geodesy.intersection_sph(45.0, 10.0, 60.0, 10.0,
                                          50.0, -10.0, 50.0, 20.0)
        assert float(xi) == pytest.approx(50.0, abs=1e-6)
        assert float(yi) == pytest.approx(10.075124337, abs=1e-6)


class TestCart2Sph:
    def test_goldens(self):
        # crs_tests.py:296-300
        lon, lat = geodesy.cart2sph(1.0, 1.0, 1.0)
        assert float(lon) == pytest.approx(45.0, abs=1e-8)
        assert float(lat) == pytest.approx(35.2643896827, abs=1e-8)
        lon, lat = geodesy.cart2sph(1.0, 0.0, 1.0)
        assert (float(lon), float(lat)) == (pytest.approx(0.0), pytest.approx(45.0))
        lon, lat = geodesy.cart2sph(-1.0, 1.0, 0.0)
        assert float(lon) == pytest.approx(135.0, abs=1e-8)
        assert float(lat) == pytest.approx(0.0, abs=1e-8)

    def test_roundtrip(self):
        rng = np.random.RandomState(11)
        lon = rng.uniform(-179, 179, 200)
        lat = rng.uniform(-89, 89, 200)
        x, y, z = geodesy.sph2cart(lon, lat)
        lon2, lat2 = geodesy.cart2sph(x, y, z)
        np.testing.assert_allclose(geodesy.reduce_deg(lon2 - lon), 0.0, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)


class TestEllipsoidal:
    A = 6378137.0
    B = 6356752.314245

    def test_equatorial_azimuth(self):
        # crs_tests.py:181-188
        az, baz, _ = karney.ellipsoidal_inverse(self.A, self.B, -40.0, 0.0, 55.0, 0.0)
        assert (az, baz) == (90.0, -90.0)
        az2, baz2, _ = karney.ellipsoidal_inverse(self.A, self.B, 180.0, 0.0, 5.0, 0.0)
        assert (az2, baz2) == (-90.0, 90.0)

    def test_area(self):
        # crs_tests.py:190-208
        S12 = karney.ellipsoidal_area(self.A, self.B, 0.0, 40.0,
                                      137.84490004377, 41.79331020506)
        assert abs(S12) / 1e6 == pytest.approx(84275623.42235, abs=1e-3)
        S12 = karney.ellipsoidal_area(self.A, self.B, 70.0, 40.0,
                                      207.84490004377, 41.79331020506)
        assert abs(S12) / 1e6 == pytest.approx(84275623.42235, abs=1e-3)

    def test_forward_inverse_roundtrip(self):
        # forward then inverse must agree (random sample, crs_tests.py:302-330 style)
        rng = np.random.RandomState(43)
        for _ in range(100):
            x1 = 360 * rng.rand() - 180
            y1 = 170 * rng.rand() - 85
            az = 360 * rng.rand() - 180
            d = 1.5e7 * rng.rand() + 1.0
            x2, y2, baz = karney.ellipsoidal_forward(self.A, self.B, x1, y1, az, d)
            az_i, baz_i, d_i = karney.ellipsoidal_inverse(self.A, self.B, x1, y1, x2, y2)
            assert d_i == pytest.approx(d, abs=0.1)
            assert geodesy.reduce_deg(az_i - az) == pytest.approx(0.0, abs=1e-3)

    def test_near_antipodal(self):
        # crs_tests.py:332-338 — must converge and give a sane distance
        az, baz, d = karney.ellipsoidal_inverse(self.A, self.B,
                                                0.0, 30.0, 179.9999, -29.9999)
        assert 1.9e7 < d < 2.1e7

    def test_known_geodesics(self):
        # geometry_tests.py:641-656: distances verified against proj invgeod
        van, ott, whi = (-123.1, 49.25), (-75.69, 45.42), (-135.05, 60.72)
        _, _, d = karney.ellipsoidal_inverse(self.A, self.B, *van, *ott)
        assert d == pytest.approx(3549030.70541, abs=0.01)
        _, _, d = karney.ellipsoidal_inverse(self.A, self.B, *van, *whi)
        assert d == pytest.approx(1483327.53922, abs=0.01)
        _, _, d = karney.ellipsoidal_inverse(self.A, self.B, *whi, *ott)
        assert d == pytest.approx(4151366.88185, abs=0.01)

    def test_known_azimuths(self):
        # geometry_tests.py:673-680: verified against proj invgeod
        az1, _, _ = karney.ellipsoidal_inverse(self.A, self.B,
                                               -123.1, 49.25, -75.69, 45.42)
        assert az1 == pytest.approx(78.483344, abs=1e-5)
        az2, _, _ = karney.ellipsoidal_inverse(self.A, self.B,
                                               -123.1, 49.25, -135.05, 60.72)
        assert az2 == pytest.approx(-26.135827, abs=1e-5)

    def test_brent(self):
        # crs_tests.py:340-344
        root = karney._brent(2, 3, lambda x: x ** 3 - 2 * x - 5, 1e-12)
        assert root == pytest.approx(2.094551482, abs=1e-8)

    def test_sphere_limit(self):
        # with a ~spherical ellipsoid, Karney ~ spherical formulas
        a = geodesy.SPHERE_RADIUS
        az, baz, d = karney.ellipsoidal_inverse(a, a * (1 - 1e-12),
                                                32.0, -17.0, 38.0, 5.0)
        assert d == pytest.approx(2533567.302751705, rel=1e-6)


class TestPlaneAzimuth:
    def test_quadrants(self):
        # geometry_tests.py:217-236
        from karta_ray.kernels.geodesy import plane_azimuth_deg
        cases = [((2.0, 3.0), 45.0), ((0.0, 3.0), -45.0),
                 ((0.0, 1.0), -135.0), ((2.0, 1.0), 135.0),
                 ((1.0, 3.0), 0.0), ((1.0, 1.0), -180.0)]
        for (x, y), want in cases:
            assert float(plane_azimuth_deg(1.0, 2.0, x, y)) == want

    def test_nan_for_coincident(self):
        # geometry_tests.py:238-242
        from karta_ray.kernels.geodesy import plane_azimuth_deg
        assert np.isnan(plane_azimuth_deg(5.0, 2.0, 5.0, 2.0))


class TestDatelineSymmetry:
    """dateline_tests.py:15-47: azimuth/distance/area invariance across
    the dateline for both geographical CRSs."""

    def test_azimuth_symmetry(self):
        for c in (crs.SphericalEarth, crs.LonLatWGS84):
            az_a = float(c.inverse(0.0, 0.0, -1.0, 1.0)[0])
            az_b = float(c.inverse(-179.5, 0.0, 179.5, 1.0)[0])
            assert az_a == pytest.approx(az_b, abs=1e-8)

    def test_distance_symmetry(self):
        for c in (crs.SphericalEarth, crs.LonLatWGS84):
            d_a = float(c.inverse(0.0, 0.0, -1.0, 1.0)[2])
            d_b = float(c.inverse(-179.5, 0.0, 179.5, 1.0)[2])
            assert d_a == pytest.approx(d_b, abs=1e-6)

    def test_area_symmetry(self):
        from karta_ray.kernels import measures

        ring0 = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
        ring1 = np.array([(179.0, -1.0), (-179.0, -1.0),
                          (-179.0, 1.0), (179.0, 1.0)])
        # reference-faithful area: symmetric across the dateline (the
        # reference's own assertion — note its segment-sum cancels to 0
        # on such rectangles, see ring_area_sphere_exact docstring)
        for tag in ("spherical", "lonlat_wgs84"):
            a0 = measures.polygon_area([ring0], crs_tag=tag)
            a1 = measures.polygon_area([ring1], crs_tag=tag)
            assert a0 == pytest.approx(a1, abs=1e-6)

    def test_exact_spherical_area(self):
        from karta_ray.kernels import measures

        ring0 = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
        ring1 = np.array([(179.0, -1.0), (-179.0, -1.0),
                          (-179.0, 1.0), (179.0, 1.0)])
        a0 = measures.ring_area_sphere_exact(ring0)
        a1 = measures.ring_area_sphere_exact(ring1)
        assert a0 == pytest.approx(a1, rel=1e-12)
        # ~2 deg x 2 deg at the equator ~ (222.4 km)^2
        assert a0 == pytest.approx((2 * 111194.9) ** 2, rel=1e-3)
        # orientation-independent
        assert measures.ring_area_sphere_exact(ring0[::-1]) == pytest.approx(a0)


class TestWebMercator:
    """EPSG:3857 closed-form goldens (published spherical-Mercator
    values) + consistency with the engine's tile math."""

    def test_projection_goldens(self):
        from karta_ray.crs import WebMercator

        x, y = WebMercator.project(180.0, 0.0)
        assert float(x) == pytest.approx(20037508.342789244, abs=1e-6)
        assert float(y) == pytest.approx(0.0, abs=1e-9)
        x, y = WebMercator.project(0.0, 85.05112877980659)
        assert float(y) == pytest.approx(20037508.342789244, abs=1e-5)
        x, y = WebMercator.project(-73.985656, 40.748433)  # ESB
        assert float(x) == pytest.approx(-8236045.54, abs=1.0)
        assert float(y) == pytest.approx(4975306.29, abs=1.0)

    def test_round_trip(self):
        from karta_ray.crs import WebMercator

        lon = np.linspace(-179.0, 179.0, 21)
        lat = np.linspace(-84.0, 84.0, 21)
        x, y = WebMercator.project(lon, lat)
        lon2, lat2 = WebMercator.project(x, y, inverse=True)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_matches_tile_pixel_scale(self):
        # tile pixel x at zoom z: c*(lon_rad + pi), c = 128/pi*2^z —
        # an affine rescale of the projected x; verify proportionality
        from karta_ray.crs import WebMercator
        from karta_ray.kernels import tiles

        lon = np.array([-120.0, -45.0, 30.0, 150.0])
        lat = np.array([-70.0, 10.0, 45.0, 80.0])
        px, py = WebMercator.project(lon, lat)
        x, y = tiles.tile_xy(lon, lat, 20)
        c = 128.0 / np.pi * 2.0 ** 20
        expect_x = np.floor(c * (lon * np.pi / 180.0 + np.pi) / 256.0)
        assert (x == expect_x.astype(np.int64)).all()
        # projected y and tile y increase in opposite directions
        assert (np.diff(py) > 0).all() == (np.diff(y.astype(float)) < 0).all()

    def test_planar_dispatch_and_geodesics(self):
        from karta_ray.crs import WebMercator

        assert WebMercator.kind == "cartesian"  # ProjectedCRS semantics
        az, baz, dist = WebMercator.inverse(0.0, 0.0, 90.0, 0.0)
        assert float(az) == pytest.approx(90.0)
        assert float(dist) == pytest.approx(np.pi / 2 * 6378137.0, rel=1e-12)
        x2, y2, baz2 = WebMercator.forward(0.0, 0.0, 90.0,
                                           np.pi / 2 * 6378137.0)
        assert float(x2) == pytest.approx(90.0)
        assert abs(float(baz2)) <= 180.0

    def test_registry(self):
        from karta_ray.crs import WebMercator, get_crs

        assert get_crs("webmercator") is WebMercator
