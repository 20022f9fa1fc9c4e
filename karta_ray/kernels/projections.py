"""Closed-form ellipsoidal map projections (no pyproj).

Implements the projection math behind the reference's predefined
projected CRSs (/root/reference/karta/crs.py:358-386): polar
stereographic (UPS north/south + the NSIDC lat_ts variants), Lambert
azimuthal equal-area (equatorial aspect), and the Gall-Peters
cylindrical equal-area.  Formulas follow Snyder, "Map Projections — A
Working Manual", USGS Professional Paper 1395 (1987): polar
stereographic pp. 160-162 (eqs. 21-33..21-41, 15-11), LAEA pp. 187-190
(eqs. 24-3..24-16, 3-11/3-18), cylindrical equal-area pp. 76-85
(eqs. 10-1, 10-2, 3-12, 3-16).

All functions are vectorized numpy over degrees in / meters out.
"""

from __future__ import annotations

import numpy as np

D2R = np.pi / 180.0

WGS84_A = 6378137.0
WGS84_B = 6356752.314245179


def _eccentricity(a: float, b: float) -> float:
    return float(np.sqrt(1.0 - (b * b) / (a * a)))


def _ts(phi, e):
    """Snyder 15-9: the isometric-latitude parameter t."""
    s = np.sin(phi)
    return (np.tan(np.pi / 4.0 - phi / 2.0)
            / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))


def _conformal_to_geodetic(chi, e):
    """Snyder 3-5: series from conformal latitude chi to geodetic."""
    e2 = e * e
    e4 = e2 * e2
    e6 = e4 * e2
    e8 = e6 * e2
    return (chi
            + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360)
            * np.sin(2 * chi)
            + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520)
            * np.sin(4 * chi)
            + (7 * e6 / 120 + 81 * e8 / 1120) * np.sin(6 * chi)
            + (4279 * e8 / 161280) * np.sin(8 * chi))


def _authalic_q(phi, e):
    """Snyder 3-12."""
    s = np.sin(phi)
    return ((1.0 - e * e)
            * (s / (1.0 - e * e * s * s)
               - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))))


def _authalic_to_geodetic(beta, e):
    """Snyder 3-18 series from authalic latitude beta to geodetic,
    polished with two rounds of the Newton iteration 3-16 (guarded at
    the poles where cos(phi) -> 0 and the series is already exact)."""
    e2 = e * e
    e4 = e2 * e2
    e6 = e4 * e2
    phi = (beta
           + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * np.sin(2 * beta)
           + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta)
           + (761 * e6 / 45360) * np.sin(6 * beta))
    qp = _authalic_q(np.pi / 2.0, e)
    q = qp * np.sin(beta)
    for _ in range(2):
        s = np.sin(phi)
        c = np.cos(phi)
        denom = 1.0 - e2 * s * s
        with np.errstate(invalid="ignore", divide="ignore"):
            step = (denom * denom / (2.0 * c)) * (
                q / (1.0 - e2) - s / denom
                + np.log((1.0 - e * s) / (1.0 + e * s)) / (2.0 * e))
        phi = np.where(np.abs(c) < 1e-9, phi, phi + np.nan_to_num(step))
    return phi


# ---------------------------------------------------------------------------
# Polar stereographic (Snyder pp. 160-162)
# ---------------------------------------------------------------------------

def polar_stereographic_fwd(lon, lat, *, lat_ts: float, lon_0: float,
                            k0: float = 1.0, fe: float = 0.0,
                            fn: float = 0.0, south: bool = False,
                            a: float = WGS84_A, b: float = WGS84_B):
    """(lon, lat) degrees -> (x, y) meters.

    ``lat_ts`` is the latitude of true scale (+/-90 uses the central
    scale factor ``k0``, Snyder 21-33; otherwise 21-34).  The south
    aspect mirrors the formulas with negated latitude/longitude."""
    lon = np.asarray(lon, dtype=np.float64) * D2R
    lat = np.asarray(lat, dtype=np.float64) * D2R
    e = _eccentricity(a, b)
    lam0 = lon_0 * D2R
    if south:
        lat = -lat
        dlam = -(lon - lam0)
        phi_ts = -lat_ts
    else:
        dlam = lon - lam0
        phi_ts = lat_ts
    t = _ts(lat, e)
    if abs(phi_ts) >= 90.0 - 1e-12:
        # true scale at the pole, central scale factor k0 (Snyder 21-33)
        rho = (2.0 * a * k0 * t
               / np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e)))
    else:
        phic = phi_ts * D2R
        mc = np.cos(phic) / np.sqrt(1.0 - e * e * np.sin(phic) ** 2)
        tc = _ts(phic, e)
        rho = a * mc * t / tc  # Snyder 21-34
    x = rho * np.sin(dlam)
    y = -rho * np.cos(dlam)
    if south:
        x = -x
        y = -y
    return fe + x, fn + y


def polar_stereographic_inv(x, y, *, lat_ts: float, lon_0: float,
                            k0: float = 1.0, fe: float = 0.0,
                            fn: float = 0.0, south: bool = False,
                            a: float = WGS84_A, b: float = WGS84_B):
    """Inverse of :func:`polar_stereographic_fwd` via the conformal-
    latitude series (Snyder 3-5), not iteration."""
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    e = _eccentricity(a, b)
    if south:
        x = -x
        y = -y
        phi_ts = -lat_ts
    else:
        phi_ts = lat_ts
    rho = np.hypot(x, y)
    if abs(phi_ts) >= 90.0 - 1e-12:
        t = (rho * np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
             / (2.0 * a * k0))
    else:
        phic = phi_ts * D2R
        mc = np.cos(phic) / np.sqrt(1.0 - e * e * np.sin(phic) ** 2)
        tc = _ts(phic, e)
        t = rho * tc / (a * mc)
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)
    lat = _conformal_to_geodetic(chi, e)
    # polish the series with Snyder's fixed-point iteration (7-9);
    # two rounds take the round-trip error from ~1e-9 deg to ~1e-13
    for _ in range(2):
        s = np.sin(lat)
        lat = (np.pi / 2.0
               - 2.0 * np.arctan(t * ((1.0 - e * s)
                                      / (1.0 + e * s)) ** (e / 2.0)))
    dlam = np.arctan2(x, -y)
    if south:
        lat = -lat
        lon = lon_0 * D2R - dlam
    else:
        lon = lon_0 * D2R + dlam
    lon = (lon + np.pi) % (2.0 * np.pi) - np.pi
    return lon / D2R, lat / D2R


# ---------------------------------------------------------------------------
# Lambert azimuthal equal-area, equatorial aspect (Snyder pp. 187-190)
# ---------------------------------------------------------------------------

def laea_fwd(lon, lat, *, lon_0: float = 0.0,
             a: float = WGS84_A, b: float = WGS84_B):
    """Equatorial-aspect ellipsoidal LAEA (lat_0 = 0, the reference's
    ``LambertEqualArea``): Snyder 24-3..24-16 with beta_1 = 0."""
    lon = np.asarray(lon, dtype=np.float64) * D2R
    lat = np.asarray(lat, dtype=np.float64) * D2R
    e = _eccentricity(a, b)
    qp = _authalic_q(np.pi / 2.0, e)
    q = _authalic_q(lat, e)
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    rq = a * np.sqrt(qp / 2.0)
    dlam = lon - lon_0 * D2R
    dlam = (dlam + np.pi) % (2.0 * np.pi) - np.pi
    # beta_1 = 0 -> m1 = cos(0)/sqrt(1-0) = 1, D = a * m1 / (rq * cos b1)
    dd = a / rq
    with np.errstate(invalid="ignore", divide="ignore"):
        bb = rq * np.sqrt(
            2.0 / (1.0 + np.cos(beta) * np.cos(dlam)))  # Snyder 24-19
        x = bb * dd * np.cos(beta) * np.sin(dlam)
        y = (bb / dd) * np.sin(beta)
    return x, y


def laea_inv(x, y, *, lon_0: float = 0.0,
             a: float = WGS84_A, b: float = WGS84_B):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    e = _eccentricity(a, b)
    qp = _authalic_q(np.pi / 2.0, e)
    rq = a * np.sqrt(qp / 2.0)
    dd = a / rq
    rho = np.hypot(x / dd, dd * y)  # Snyder 24-28
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        # equatorial aspect: beta_1 = 0 (Snyder 24-27 with sin b1=0)
        beta = np.where(rho == 0.0, 0.0,
                        np.arcsin(np.clip(dd * y * np.sin(ce) / rho,
                                          -1.0, 1.0)))
        dlam = np.arctan2(x * np.sin(ce),
                          dd * rho * np.cos(ce))  # Snyder 24-26, b1=0
    lat = _authalic_to_geodetic(beta, e)
    lon = lon_0 * D2R + dlam
    lon = (lon + np.pi) % (2.0 * np.pi) - np.pi
    return lon / D2R, lat / D2R


# ---------------------------------------------------------------------------
# Cylindrical equal-area (Gall-Peters: lat_ts = 45; Snyder pp. 76-85)
# ---------------------------------------------------------------------------

def cea_fwd(lon, lat, *, lat_ts: float = 45.0, lon_0: float = 0.0,
            a: float = WGS84_A, b: float = WGS84_B):
    lon = np.asarray(lon, dtype=np.float64) * D2R
    lat = np.asarray(lat, dtype=np.float64) * D2R
    e = _eccentricity(a, b)
    phis = lat_ts * D2R
    k0 = np.cos(phis) / np.sqrt(1.0 - e * e * np.sin(phis) ** 2)
    dlam = lon - lon_0 * D2R
    dlam = (dlam + np.pi) % (2.0 * np.pi) - np.pi
    x = a * k0 * dlam  # Snyder 10-1
    y = a * _authalic_q(lat, e) / (2.0 * k0)  # Snyder 10-2
    return x, y


def cea_inv(x, y, *, lat_ts: float = 45.0, lon_0: float = 0.0,
            a: float = WGS84_A, b: float = WGS84_B):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    e = _eccentricity(a, b)
    phis = lat_ts * D2R
    k0 = np.cos(phis) / np.sqrt(1.0 - e * e * np.sin(phis) ** 2)
    qp = _authalic_q(np.pi / 2.0, e)
    q = 2.0 * y * k0 / a
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    lat = _authalic_to_geodetic(beta, e)
    lon = lon_0 * D2R + x / (a * k0)
    lon = (lon + np.pi) % (2.0 * np.pi) - np.pi
    return lon / D2R, lat / D2R


# ---------------------------------------------------------------------------
# Transverse Mercator (Snyder pp. 60-64, eqs. 8-9..8-25 + 3-21/3-26/7-19)
# — the general family behind UTM and most national grids; series
# accurate to < 1 mm within several degrees of the central meridian.
# ---------------------------------------------------------------------------

def _meridian_arc(phi, a: float, e2: float):
    """Snyder 3-21: meridian distance from the equator, M(phi)."""
    e4 = e2 * e2
    e6 = e4 * e2
    return a * ((1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
                - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0
                   + 45.0 * e6 / 1024.0) * np.sin(2.0 * phi)
                + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0)
                * np.sin(4.0 * phi)
                - (35.0 * e6 / 3072.0) * np.sin(6.0 * phi))


def tmerc_fwd(lon, lat, *, lon_0: float, lat_0: float = 0.0,
              k0: float = 0.9996, fe: float = 0.0, fn: float = 0.0,
              a: float = WGS84_A, b: float = WGS84_B):
    lon = np.asarray(lon, dtype=np.float64) * D2R
    phi = np.asarray(lat, dtype=np.float64) * D2R
    e = _eccentricity(a, b)
    e2 = e * e
    ep2 = e2 / (1.0 - e2)
    dlam = lon - lon_0 * D2R
    dlam = (dlam + np.pi) % (2.0 * np.pi) - np.pi
    sphi = np.sin(phi)
    cphi = np.cos(phi)
    N = a / np.sqrt(1.0 - e2 * sphi * sphi)          # 4-20
    T = (sphi / cphi) ** 2                           # 8-13
    C = ep2 * cphi * cphi                            # 8-14
    A = dlam * cphi                                  # 8-15
    M = _meridian_arc(phi, a, e2)
    M0 = _meridian_arc(np.float64(lat_0 * D2R), a, e2)
    A2 = A * A
    x = fe + k0 * N * (A + (1.0 - T + C) * A * A2 / 6.0
                       + (5.0 - 18.0 * T + T * T + 72.0 * C
                          - 58.0 * ep2) * A * A2 * A2 / 120.0)   # 8-9
    y = fn + k0 * (M - M0 + N * (sphi / cphi)
                   * (A2 / 2.0
                      + (5.0 - T + 9.0 * C + 4.0 * C * C) * A2 * A2 / 24.0
                      + (61.0 - 58.0 * T + T * T + 600.0 * C
                         - 330.0 * ep2) * A2 * A2 * A2 / 720.0))  # 8-10
    return x, y


def tmerc_inv(x, y, *, lon_0: float, lat_0: float = 0.0,
              k0: float = 0.9996, fe: float = 0.0, fn: float = 0.0,
              a: float = WGS84_A, b: float = WGS84_B):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    e = _eccentricity(a, b)
    e2 = e * e
    ep2 = e2 / (1.0 - e2)
    M0 = _meridian_arc(np.float64(lat_0 * D2R), a, e2)
    M = M0 + (y - fn) / k0                            # 8-20
    mu = M / (a * (1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0
                   - 5.0 * e2 * e2 * e2 / 256.0))     # 7-19
    e1 = (1.0 - np.sqrt(1.0 - e2)) / (1.0 + np.sqrt(1.0 - e2))  # 3-24
    phi1 = (mu + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu)
            + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0)
            * np.sin(4.0 * mu)
            + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
            + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu))  # 3-26
    s1 = np.sin(phi1)
    c1 = np.cos(phi1)
    t1 = s1 / c1
    C1 = ep2 * c1 * c1                                # 8-21
    T1 = t1 * t1                                      # 8-22
    N1 = a / np.sqrt(1.0 - e2 * s1 * s1)              # 8-23
    R1 = a * (1.0 - e2) / (1.0 - e2 * s1 * s1) ** 1.5  # 8-24
    D = (x - fe) / (N1 * k0)                          # 8-25
    D2 = D * D
    phi = phi1 - (N1 * t1 / R1) * (
        D2 / 2.0
        - (5.0 + 3.0 * T1 + 10.0 * C1 - 4.0 * C1 * C1
           - 9.0 * ep2) * D2 * D2 / 24.0
        + (61.0 + 90.0 * T1 + 298.0 * C1 + 45.0 * T1 * T1
           - 252.0 * ep2 - 3.0 * C1 * C1) * D2 * D2 * D2 / 720.0)  # 8-17
    lam = lon_0 * D2R + (
        D - (1.0 + 2.0 * T1 + C1) * D * D2 / 6.0
        + (5.0 - 2.0 * C1 + 28.0 * T1 - 3.0 * C1 * C1 + 8.0 * ep2
           + 24.0 * T1 * T1) * D * D2 * D2 / 120.0) / c1            # 8-18
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    return lam / D2R, phi / D2R


# ---------------------------------------------------------------------------
# Lambert conformal conic, 2 standard parallels (Snyder pp. 104-110,
# eqs. 15-1..15-11, inverse via conformal-latitude series 3-5) — the
# projection behind most US State Plane / Canadian / European national
# conic grids.  Forward verified against Snyder's worked example
# (p. 296: Clarke 1866, sp 33/45, origin 23N 96W, point 35N 75W ->
# 1,894,410.9 E, 1,564,649.5 N).
# ---------------------------------------------------------------------------

def _lcc_m(phi, e):
    """Snyder 14-15: m = cos(phi) / sqrt(1 - e^2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - e * e * s * s)


def _lcc_consts(lat_1, lat_2, lat_0, a, b):
    e = _eccentricity(a, b)
    p1 = lat_1 * D2R
    p2 = lat_2 * D2R
    p0 = lat_0 * D2R
    m1 = _lcc_m(p1, e)
    t1 = _ts(p1, e)
    t0 = _ts(p0, e)
    if abs(lat_1 - lat_2) < 1e-12:
        n = np.sin(p1)                                 # 15-4 limit (1SP)
    else:
        m2 = _lcc_m(p2, e)
        t2 = _ts(p2, e)
        n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))  # 15-8
    F = m1 / (n * t1 ** n)                             # 15-10
    rho0 = a * F * t0 ** n                             # 15-7a
    return e, n, F, rho0


def lcc_fwd(lon, lat, *, lon_0: float, lat_0: float, lat_1: float,
            lat_2: float, fe: float = 0.0, fn: float = 0.0,
            a: float = WGS84_A, b: float = WGS84_B):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    e, n, F, rho0 = _lcc_consts(lat_1, lat_2, lat_0, a, b)
    t = _ts(lat * D2R, e)
    rho = a * F * t ** n                               # 15-7
    dlam = (lon - lon_0 + 180.0) % 360.0 - 180.0
    theta = n * dlam * D2R                             # 14-4
    return rho * np.sin(theta) + fe, rho0 - rho * np.cos(theta) + fn


def lcc_inv(x, y, *, lon_0: float, lat_0: float, lat_1: float,
            lat_2: float, fe: float = 0.0, fn: float = 0.0,
            a: float = WGS84_A, b: float = WGS84_B):
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    e, n, F, rho0 = _lcc_consts(lat_1, lat_2, lat_0, a, b)
    sgn = 1.0 if n >= 0 else -1.0
    rho = sgn * np.hypot(x, rho0 - y)                  # 14-10
    theta = np.arctan2(sgn * x, sgn * (rho0 - y))      # 14-11
    t = (rho / (a * F)) ** (1.0 / n)                   # 15-11
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)            # 7-13
    phi = _conformal_to_geodetic(chi, e)               # 3-5
    lam = theta / n + lon_0 * D2R
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    return lam / D2R, phi / D2R


# ---------------------------------------------------------------------------
# Albers equal-area conic, 2 standard parallels (Snyder pp. 98-103,
# eqs. 14-1..14-11, inverse via authalic-latitude series 3-18) — the
# standard continental-statistics projection (e.g. US National Atlas).
# Forward verified against Snyder's worked example (p. 292: Clarke
# 1866, sp 29.5/45.5, origin 23N 96W, point 35N 75W ->
# 1,885,472.7 E, 1,535,925.0 N).
# ---------------------------------------------------------------------------

def _aea_consts(lat_1, lat_2, lat_0, a, b):
    e = _eccentricity(a, b)
    p1 = lat_1 * D2R
    p2 = lat_2 * D2R
    p0 = lat_0 * D2R
    m1 = _lcc_m(p1, e)
    q1 = _authalic_q(p1, e)
    q0 = _authalic_q(p0, e)
    if abs(lat_1 - lat_2) < 1e-12:
        n = np.sin(p1)                                 # 14-14 limit (1SP)
    else:
        m2 = _lcc_m(p2, e)
        q2 = _authalic_q(p2, e)
        n = (m1 * m1 - m2 * m2) / (q2 - q1)            # 14-14
    C = m1 * m1 + n * q1                               # 14-13
    rho0 = a * np.sqrt(C - n * q0) / n                 # 14-12a
    return e, n, C, rho0


def aea_fwd(lon, lat, *, lon_0: float, lat_0: float, lat_1: float,
            lat_2: float, fe: float = 0.0, fn: float = 0.0,
            a: float = WGS84_A, b: float = WGS84_B):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    e, n, C, rho0 = _aea_consts(lat_1, lat_2, lat_0, a, b)
    q = _authalic_q(lat * D2R, e)
    rho = a * np.sqrt(C - n * q) / n                   # 14-12
    dlam = (lon - lon_0 + 180.0) % 360.0 - 180.0
    theta = n * dlam * D2R                             # 14-4
    return rho * np.sin(theta) + fe, rho0 - rho * np.cos(theta) + fn


def aea_inv(x, y, *, lon_0: float, lat_0: float, lat_1: float,
            lat_2: float, fe: float = 0.0, fn: float = 0.0,
            a: float = WGS84_A, b: float = WGS84_B):
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    e, n, C, rho0 = _aea_consts(lat_1, lat_2, lat_0, a, b)
    sgn = 1.0 if n >= 0 else -1.0
    rho = np.hypot(x, rho0 - y)
    theta = np.arctan2(sgn * x, sgn * (rho0 - y))      # 14-11
    q = (C - (rho * n / a) ** 2) / n                   # 14-19
    qp = _authalic_q(np.pi / 2.0, e)
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))       # 3-11
    phi = _authalic_to_geodetic(beta, e)               # 3-18
    lam = theta / n + lon_0 * D2R
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    return lam / D2R, phi / D2R
