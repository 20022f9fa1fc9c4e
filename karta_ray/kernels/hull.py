"""Convex hulls: Graham scan on the plane and on the sphere.

Replicates the reference's azimuth-sort Graham scan
(/root/reference/karta/vector/convexhull.pyx:18-148) so hull vertex
*order* matches the goldens (tests/geometry_tests.py:354-385): pivot at
the leftmost (upper on ties) point, candidates sorted CCW by
``pi/2 - azimuth(pivot, p)``, equal-azimuth duplicates keep only the
farthest, then a left-turn scan.

Hulls are aggregations: in the engine they run per-group inside
``groupby().map_groups`` with an associative hull-of-hulls combine.
"""

from __future__ import annotations

import numpy as np

from . import geodesy


def _pivot_index(x, y):
    ileft = 0
    for i in range(1, len(x)):
        if x[i] < x[ileft] or (x[i] == x[ileft] and y[i] > y[ileft]):
            ileft = i
    return ileft


def _graham(x, y, az, dist, ileft):
    n = len(x)
    order = [i for i in range(n) if i != ileft]
    order.sort(key=lambda i: az[i])

    # drop all but farthest of duplicate azimuths
    kept = [order[0]]
    last = order[0]
    for i in order[1:]:
        if az[i] == az[last]:
            if dist[i] > dist[kept[-1]]:
                kept[-1] = i
        else:
            kept.append(i)
        last = i

    if len(kept) == 1:
        return [ileft, kept[0]]
    hull = [ileft, kept[0], kept[1]]
    if len(kept) == 2:
        return hull

    def isleft(i0, i1, i2):
        return ((x[i1] - x[i0]) * (y[i2] - y[i0])
                - (y[i1] - y[i0]) * (x[i2] - x[i0])) > 0.0

    for i in kept[2:]:
        while len(hull) > 1 and not isleft(hull[-2], hull[-1], i):
            hull.pop()
        hull.append(i)
    return hull


def convex_hull_planar(coords):
    """Indices of hull vertices (CCW from the leftmost point)."""
    coords = np.asarray(coords, dtype=np.float64)
    x, y = coords[:, 0], coords[:, 1]
    ileft = _pivot_index(x, y)
    az = 0.5 * np.pi - np.arctan2(x - x[ileft], y - y[ileft])
    dist = np.hypot(x - x[ileft], y - y[ileft])
    return _graham(x, y, az, dist, ileft)


def convex_hull_sph(coords):
    """Spherical variant: azimuths/distances on the unit sphere, left-turn
    test via azimuth differences (convexhull.pyx:84-148)."""
    coords = np.asarray(coords, dtype=np.float64)
    x, y = coords[:, 0], coords[:, 1]
    ileft = _pivot_index(x, y)
    az = 0.5 * np.pi - geodesy.sphere_azimuth_rad(x[ileft], y[ileft], x, y)
    dist = geodesy.sphere_distance(x[ileft], y[ileft], x, y, radius=1.0)

    n = len(x)
    order = [i for i in range(n) if i != ileft]
    order.sort(key=lambda i: az[i])
    kept = [order[0]]
    last = order[0]
    for i in order[1:]:
        if az[i] == az[last]:
            if dist[i] > dist[kept[-1]]:
                kept[-1] = i
        else:
            kept.append(i)
        last = i

    if len(kept) == 1:
        return [ileft, kept[0]]
    hull = [ileft, kept[0], kept[1]]
    if len(kept) == 2:
        return hull

    def isleft_sph(i0, i1, i2):
        a = geodesy.sphere_azimuth_rad(x[i1], y[i1], x[i2], y[i2])
        a_pt = geodesy.sphere_azimuth_rad(x[i1], y[i1], x[i0], y[i0])
        daz = (float(a) - float(a_pt) + np.pi) % (2.0 * np.pi) - np.pi
        return daz > 0

    for i in kept[2:]:
        while len(hull) > 1 and not isleft_sph(hull[-2], hull[-1], i):
            hull.pop()
        hull.append(i)
    return hull
