"""Coordinate reference systems.

The engine supports exactly the three CRS families exercised by the
reference test suite (karta/crs.py:160-246, 353-356), implemented with
self-contained numpy kernels (no pyproj):

- ``Cartesian``      — planar; identity projection
  (karta/crs.py:160-202)
- ``SphericalEarth`` — lon/lat on a sphere of radius 6370997 m
  (pyproj "+ellps=sphere"; karta/crs.py:353-354)
- ``LonLatWGS84``    — lon/lat on the WGS84 ellipsoid, geodesics via the
  Karney solver (karta/crs.py:355, karta/geodesy.py:310-635)

All azimuths are degrees clockwise from north, normalized to [-180, 180)
for geographical CRSs per karta/crs.py:228-239.
"""

from __future__ import annotations

import numpy as np

from .kernels import geodesy, karney


class CRS:
    name: str = "base"
    kind: str = "cartesian"  # "cartesian" | "geographical"

    def __repr__(self):
        return f"<CRS {self.name}>"

    @property
    def is_geographical(self) -> bool:
        return self.kind == "geographical"


class CartesianCRS(CRS):
    name = "cartesian"
    kind = "cartesian"

    @staticmethod
    def project(x, y, inverse: bool = False):
        return x, y

    @staticmethod
    def forward(x, y, az, dist, radians: bool = False):
        if not radians:
            az = np.asarray(az, dtype=np.float64) * np.pi / 180.0
        x2 = np.asarray(x) + dist * np.sin(az)
        y2 = np.asarray(y) + dist * np.cos(az)
        baz = geodesy.unroll_rad(az + np.pi)
        if not radians:
            baz = baz * 180.0 / np.pi
        return x2, y2, baz

    @staticmethod
    def inverse(x1, y1, x2, y2, radians: bool = False):
        dist = geodesy.plane_distance(x1, y1, x2, y2)
        az = geodesy.plane_azimuth(x1, y1, x2, y2)
        baz = geodesy.unroll_rad(az + np.pi)
        if not radians:
            az = az * 180.0 / np.pi
            baz = baz * 180.0 / np.pi
        return az, baz, dist


class SphericalCRS(CRS):
    name = "spherical"
    kind = "geographical"

    def __init__(self, radius: float = geodesy.SPHERE_RADIUS):
        self.radius = radius
        self.a = radius
        self.b = radius

    @staticmethod
    def project(x, y, inverse: bool = False):
        return x, y

    def forward(self, x, y, az, dist):
        return geodesy.sphere_forward(x, y, az, dist, radius=self.radius)

    def inverse(self, x1, y1, x2, y2):
        return geodesy.sphere_inverse(x1, y1, x2, y2, radius=self.radius)

    def distance(self, x1, y1, x2, y2):
        return geodesy.sphere_distance(x1, y1, x2, y2, radius=self.radius)


class EllipsoidalCRS(CRS):
    kind = "geographical"

    def __init__(self, a: float, b: float, name: str = "ellipsoidal"):
        self.a = a
        self.b = b
        self.name = name

    @staticmethod
    def project(x, y, inverse: bool = False):
        return x, y

    def forward(self, x, y, az, dist):
        if np.isscalar(x) or np.asarray(x).ndim == 0:
            return karney.ellipsoidal_forward(self.a, self.b, float(x), float(y),
                                              float(az), float(dist))
        return karney.forward_vec(self.a, self.b, x, y, az, dist)

    def inverse(self, x1, y1, x2, y2):
        if np.isscalar(x1) or np.asarray(x1).ndim == 0:
            return karney.ellipsoidal_inverse(self.a, self.b, float(x1), float(y1),
                                              float(x2), float(y2))
        return karney.inverse_vec(self.a, self.b, x1, y1, x2, y2)

    def distance(self, x1, y1, x2, y2):
        return self.inverse(x1, y1, x2, y2)[2]


Cartesian = CartesianCRS()
SphericalEarth = SphericalCRS()
SphericalEarth.name = "spherical"
LonLatWGS84 = EllipsoidalCRS(karney.WGS84_A, karney.WGS84_B, name="lonlat_wgs84")

_REGISTRY = {
    "cartesian": Cartesian,
    "spherical": SphericalEarth,
    "lonlat_wgs84": LonLatWGS84,
}


def get_crs(name):
    """Resolve a CRS by its string tag (the ``crs`` column convention of
    the polygon tables, FIXTURES.md §2)."""
    if isinstance(name, CRS):
        return name
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown CRS tag {name!r}; known: {sorted(_REGISTRY)}")
