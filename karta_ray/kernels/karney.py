"""Ellipsoidal geodesy: Karney's algorithms for geodesics.

Implements the direct and inverse geodesic problems and geodesic areas on
an ellipsoid of revolution, following C.F.F. Karney, "Algorithms for
geodesics", J. Geodesy 87 (2013) 43-55 — the same published algorithm the
reference implements in pure Python (/root/reference/karta/geodesy.py:
187-729), with series truncated at the same order so golden values agree
to the reference test tolerances (tests/crs_tests.py:302-338: 1e-4 deg in
azimuth, centimeters in distance vs pyproj).

Scalar core functions plus small vectorized wrappers; the hot paths of
the engine (distance filters, kNN) use the spherical kernels — the
ellipsoid is only consulted for LonLatWGS84 refinement and goldens.
"""

from __future__ import annotations

import warnings
from math import atan, atan2, atanh, cos, pi, sin, sqrt, tan

import numpy as np

from .geodesy import _canonical_configuration, _vincenty_sphere

WGS84_A = 6378137.0
WGS84_B = 6356752.314245179  # a * (1 - 1/298.257223563)


def _eps_from_k2(k2):
    r = sqrt(1.0 + k2)
    return (r - 1.0) / (r + 1.0)


def _A1(eps):
    return (1.0 + eps * eps / 4 + eps ** 4 / 64 + eps ** 6 / 256) / (1.0 - eps)


def _C1(eps):
    return (
        -eps / 2 + 3 * eps ** 3 / 16 - eps ** 5 / 32,
        -eps ** 2 / 16 + eps ** 4 / 32 - 9 * eps ** 6 / 2048,
        -eps ** 3 / 48 + 3 * eps ** 5 / 256,
        -5 * eps ** 4 / 512 + 3 * eps ** 6 / 512,
        -7 * eps ** 5 / 1280,
        -7 * eps ** 6 / 2048,
    )


def _C1p(eps):
    return (
        eps / 2 - 9 * eps ** 3 / 32 + 205 * eps ** 5 / 1536,
        5 * eps ** 2 / 16 - 37 * eps ** 4 / 96 + 1335 * eps ** 6 / 4096,
        29 * eps ** 3 / 96 - 75 * eps ** 5 / 128,
        539 * eps ** 4 / 1536 - 2391 * eps ** 6 / 2560,
        3467 * eps ** 5 / 7680,
        38081 * eps ** 6 / 61440,
    )


def _A2(eps):
    return (1.0 - eps) * (1 + eps ** 2 / 4 + 9 * eps ** 4 / 64 + 25 * eps ** 6 / 256)


def _C2(eps):
    return (
        eps / 2 + eps ** 3 / 16 + eps ** 5 / 32,
        3 * eps ** 2 / 16 + eps ** 4 / 32 + 35 * eps ** 6 / 2048,
        5 * eps ** 3 / 48 + 5 * eps ** 5 / 256,
        35 * eps ** 4 / 512 + 7 * eps ** 6 / 512,
        63 * eps ** 5 / 1280,
        77 * eps ** 6 / 2048,
    )


def _A3(n, eps):
    n2 = n * n
    return (1.0
            - (0.5 - 0.5 * n) * eps
            - (0.25 + n / 8 - 3 * n2 / 8) * eps ** 2
            - (1.0 / 16 + 3 * n / 16 + n2 / 16) * eps ** 3
            - (3.0 / 64 + n / 32) * eps ** 4
            - 3.0 / 128 * eps ** 5)


def _C3(n, eps):
    n2 = n * n
    return (
        (0.25 - n / 4) * eps + (1.0 / 8 - n2 / 8) * eps ** 2
        + (3.0 / 64 + 3 * n / 64 - n2 / 64) * eps ** 3
        + (5.0 / 128 + n / 64) * eps ** 4 + 3.0 / 128 * eps ** 5,
        (1.0 / 16 - 3 * n / 32 + n2 / 32) * eps ** 2
        + (3.0 / 64 - n / 32 - 3 * n2 / 64) * eps ** 3
        + (3.0 / 128 + n / 128) * eps ** 4 + 5.0 / 256 * eps ** 5,
        (5.0 / 192 - 3 * n / 64 + 5 * n2 / 192) * eps ** 3
        + (3.0 / 128 - 5 * n / 192) * eps ** 4 + 7.0 / 512 * eps ** 5,
        (7.0 / 512 - 7 * n / 256) * eps ** 4 + 7.0 / 512 * eps ** 5,
        21.0 / 2560 * eps ** 5,
    )


def _sinsum(sigma, coeffs):
    """sum_i c_i * sin(2*(i+1)*sigma)"""
    return sum(c * sin(2 * (i + 1) * sigma) for i, c in enumerate(coeffs))


def _triangle_NEA(alpha0, alpha1, beta1):
    sigma1 = atan2(sin(beta1), cos(alpha1) * cos(beta1))
    omega1 = atan2(sin(alpha0) * sin(sigma1), cos(sigma1))
    return sigma1, omega1


def _triangle_NEB(alpha0, alpha1, beta1, beta2):
    arg = (cos(alpha1) ** 2 * cos(beta1) ** 2 + (cos(beta2) ** 2 - cos(beta1) ** 2))
    if arg >= 0 and cos(beta2) != 0 and sqrt(arg) / cos(beta2) <= 1.0:
        from math import acos
        alpha2 = acos(sqrt(arg) / cos(beta2))
    else:
        from math import asin
        alpha2 = asin(max(-1.0, min(1.0, sin(alpha0) / cos(beta2))))
    sigma2 = atan2(sin(beta2), cos(alpha2) * cos(beta2))
    omega2 = atan2(sin(alpha0) * sin(sigma2), cos(sigma2))
    return alpha2, sigma2, omega2


def _brent(a, b, f, tol):
    """Brent's bracketed root finder (karta/geodesy.py:734-818 semantics)."""
    fa, fb = f(a), f(b)
    if fa == 0:
        return a
    if fb == 0:
        return b
    if fa * fb > 0:
        raise ValueError("root not bracketed")
    if abs(fa) < abs(fb):
        a, b = b, a
        fa, fb = fb, fa
    c, fc = a, fa
    d = None
    mflag = True
    for _ in range(1000):
        if fa != fc and fb != fc:
            s = (a * fb * fc / ((fa - fb) * (fa - fc))
                 + b * fa * fc / ((fb - fa) * (fb - fc))
                 + c * fa * fb / ((fc - fa) * (fc - fb)))
        else:
            s = b - fb * (b - a) / (fb - fa)
        cond = ((not (min(0.25 * (3 * a + b), b) < s < max(0.25 * (3 * a + b), b)))
                or (mflag and abs(s - b) >= 0.5 * abs(b - c))
                or (not mflag and d is not None and abs(s - b) >= 0.5 * abs(c - d))
                or (mflag and abs(b - c) < 1e-10)
                or (not mflag and d is not None and abs(c - d) < 1e-10))
        if cond:
            s = 0.5 * (a + b)
            mflag = True
        else:
            mflag = False
        fs = f(s)
        d, c, fc = c, b, fb
        if fa * fs < 0:
            b, fb = s, fs
        else:
            a, fa = s, fs
        if abs(fa) < abs(fb):
            a, b = b, a
            fa, fb = fb, fa
        if fb == 0:
            return b
        if fs == 0:
            return s
        if abs(b - a) < tol:
            return b
    raise RuntimeError("brent: maximum iterations exceeded")


def _astroid_alpha1(a, f, lambda12, phi1, phi2):
    """Initial azimuth guess for nearly-antipodal points (Karney sec. 5)."""
    beta1 = atan((1 - f) * tan(phi1))
    beta2 = atan((1 - f) * tan(phi2))
    delta = f * a * pi * cos(beta1) ** 2
    x = (lambda12 - pi) * (a * cos(beta1)) / delta
    y = (beta2 + beta1) * a / delta
    mu = _brent(1e-6, pi * a,
                lambda m: (m ** 4 + 2 * m ** 3 + (1 - x * x - y * y) * m * m
                           - 2 * y * y * m - y * y),
                1e-12)
    return atan2(-x / (1 + mu), y / mu)


def ellipsoidal_forward(a, b, lon, lat, azimuth, distance):
    """Direct problem: degrees in, (lon2, lat2, back_azimuth_deg) out.

    Karney (2013) eqns; mirrors the semantics of
    /root/reference/karta/geodesy.py:310-419.
    """
    f = (a - b) / a
    phi1 = lat * pi / 180.0
    alpha1 = azimuth * pi / 180.0

    beta1 = atan((1 - f) * tan(phi1))
    alpha0 = atan2(sin(alpha1) * cos(beta1),
                   sqrt(cos(alpha1) ** 2 + (sin(alpha1) * sin(beta1)) ** 2))
    sigma1, omega1 = _triangle_NEA(alpha0, alpha1, beta1)

    eccn2 = f * (2 - f)
    second_eccn2 = eccn2 / (1 - eccn2)
    k2 = second_eccn2 * cos(alpha0) ** 2
    eps = _eps_from_k2(k2)

    A1 = _A1(eps)
    s1 = A1 * (sigma1 + _sinsum(sigma1, _C1(eps))) * b
    tau2 = (s1 + distance) / (b * A1)
    sigma2 = tau2 + _sinsum(tau2, _C1p(eps))

    alpha2 = atan2(sin(alpha0), cos(alpha0) * cos(sigma2))
    beta2 = atan2(cos(alpha0) * sin(sigma2),
                  sqrt((cos(alpha0) * cos(sigma2)) ** 2 + sin(alpha0) ** 2))
    omega2 = atan2(sin(alpha0) * sin(sigma2), cos(sigma2))

    n = f / (2.0 - f)
    A3 = _A3(n, eps)
    C3 = _C3(n, eps)
    lam1 = omega1 - f * sin(alpha0) * A3 * (sigma1 + _sinsum(sigma1, C3))
    lam2 = omega2 - f * sin(alpha0) * A3 * (sigma2 + _sinsum(sigma2, C3))

    lon2 = lon + (lam2 - lam1) * 180.0 / pi
    if lon2 >= 180.0:
        lon2 -= 360.0
    lat2 = atan(tan(beta2) / (1 - f)) * 180.0 / pi
    backaz = (alpha2 + pi) * 180.0 / pi
    lon2 = (lon2 + 180.0) % 360.0 - 180.0
    backaz = (backaz + 180.0) % 360.0 - 180.0
    return lon2, lat2, backaz


def ellipsoidal_inverse(a, b, x1, y1, x2, y2, tol=1e-12):
    """Inverse problem: degrees in, (azimuth°, back_azimuth°, distance) out.

    Newton iteration on the spherical-triangle longitude equation
    (Karney 2013); mirrors /root/reference/karta/geodesy.py:432-635
    including the equatorial and meridional special cases.
    """
    if y1 == y2 == 0:
        # Equatorial geodesic
        diff = (x2 - x1 + 180.0) % 360.0 - 180.0
        az, baz = (-90.0, 90.0) if diff < 0 else (90.0, -90.0)
        return az, baz, 2 * pi * a * abs(x1 - x2) / 360.0

    tr, x1, y1, x2, y2 = _canonical_configuration(x1, y1, x2, y2)

    phi1 = y1 * pi / 180.0
    phi2 = y2 * pi / 180.0
    lambda12 = (x2 - x1) * pi / 180.0
    f = (a - b) / a
    beta1 = atan((1 - f) * tan(phi1))
    beta2 = atan((1 - f) * tan(phi2))
    eccn2 = f * (2 - f)
    second_eccn2 = eccn2 / (1 - eccn2)
    n = f / (2 - f)

    alpha0 = alpha1 = alpha2 = 0.0
    sigma1 = sigma2 = 0.0

    if x1 == x2:
        # Meridional geodesic (same longitude)
        alpha0 = alpha1 = alpha2 = 0.0
        alpha0 = atan2(sin(alpha1) * cos(beta1),
                       sqrt(cos(alpha1) ** 2 + (sin(alpha1) * sin(beta1)) ** 2))
        sigma1, _ = _triangle_NEA(alpha0, alpha1, beta1)
        _, sigma2, _ = _triangle_NEB(alpha0, alpha1, beta1, beta2)
        eps = _eps_from_k2(second_eccn2)
    elif abs(lambda12 % (2 * pi) - pi) < 1e-12:
        # Meridional geodesic (through the pole)
        if y1 + y2 > 0:
            alpha0 = alpha1 = 0.0
            alpha2 = pi
        else:
            alpha0 = alpha1 = pi
            alpha2 = 0.0
        sigma1, _ = _triangle_NEA(alpha0, alpha1, beta1)
        _, sigma2, _ = _triangle_NEB(alpha0, alpha1, beta1, beta2)
        eps = _eps_from_k2(second_eccn2)
    else:
        if (abs(lambda12 - pi) > 0.0087) and (abs(phi1 + phi2) > 0.0087):
            alpha1, _, _ = _vincenty_sphere(a, f, lambda12, phi1, phi2)
        else:
            alpha1 = _astroid_alpha1(a, f, lambda12, phi1, phi2)

        dlambda12 = tol + 1.0
        niter = 0
        eps = 0.0
        while abs(dlambda12) > tol and niter != 100:
            alpha0 = atan2(sin(alpha1) * cos(beta1),
                           sqrt(cos(alpha1) ** 2 + (sin(alpha1) * sin(beta1)) ** 2))
            sigma1, omega1 = _triangle_NEA(alpha0, alpha1, beta1)
            alpha2, sigma2, omega2 = _triangle_NEB(alpha0, alpha1, beta1, beta2)

            k2 = second_eccn2 * cos(alpha0) ** 2
            eps = _eps_from_k2(k2)
            A3 = _A3(n, eps)
            C3 = _C3(n, eps)
            lam1 = omega1 - f * sin(alpha0) * A3 * (sigma1 + _sinsum(sigma1, C3))
            lam2 = omega2 - f * sin(alpha0) * A3 * (sigma2 + _sinsum(sigma2, C3))
            dlambda12 = (lam2 - lam1) - lambda12

            if abs(dlambda12) > tol:
                # Newton step using the reduced length m12 (Karney eqn 38)
                A1 = _A1(eps)
                A2 = _A2(eps)
                C1 = _C1(eps)
                C2 = _C2(eps)
                I1s1 = A1 * (sigma1 + _sinsum(sigma1, C1))
                I1s2 = A1 * (sigma2 + _sinsum(sigma2, C1))
                I2s1 = A2 * (sigma1 + _sinsum(sigma1, C2))
                I2s2 = A2 * (sigma2 + _sinsum(sigma2, C2))
                Js1 = I1s1 - I2s1
                Js2 = I1s2 - I2s2
                m12 = b * (sqrt(1 + k2 * sin(sigma2) ** 2) * cos(sigma1) * sin(sigma2)
                           - sqrt(1 + k2 * sin(sigma1) ** 2) * sin(sigma1) * cos(sigma2)
                           - cos(sigma1) * cos(sigma2) * (Js2 - Js1))
                dalpha1 = -dlambda12 * (a * cos(alpha2) * cos(beta2)) / m12
                alpha1 = (alpha1 + dalpha1) % (2 * pi)
            niter += 1
        if niter == 100:
            warnings.warn("geodesic inverse failed to converge", RuntimeWarning)

    k2 = second_eccn2 * cos(alpha0) ** 2
    eps = _eps_from_k2(k2)
    A1 = _A1(eps)
    C1 = _C1(eps)
    s12 = (A1 * (sigma2 + _sinsum(sigma2, C1)) - A1 * (sigma1 + _sinsum(sigma1, C1))) * b

    if tr["xflip"]:
        alpha1, alpha2 = -alpha1, -alpha2
    if tr["yflip"]:
        alpha1, alpha2 = pi - alpha2, pi - alpha1
    if tr["ysignswap"]:
        alpha1, alpha2 = pi - alpha1, pi - alpha2

    az = (alpha1 * 180.0 / pi + 180.0) % 360.0 - 180.0
    backaz = ((alpha2 + pi) * 180.0 / pi + 180.0) % 360.0 - 180.0
    return az, backaz, s12


def ellipsoidal_area(a, b, x1, y1, x2, y2):
    """Signed area between a geodesic segment and the equator
    (Karney 2013 sec. 6; mirrors karta/geodesy.py:637-729), scalar."""
    reverse = -1.0 if x2 < x1 else 1.0
    _, x1, y1, x2, y2 = _canonical_configuration(x1, y1, x2, y2)
    phi1 = y1 * pi / 180.0
    phi2 = y2 * pi / 180.0
    lambda12 = (x2 - x1) * pi / 180.0

    az, baz, _ = ellipsoidal_inverse(a, b, x1, y1, x2, y2)
    alpha1 = az * pi / 180.0
    alpha2 = (baz * pi / 180.0) - pi

    f = (a - b) / a
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    e = sqrt(e2)
    c2 = a * a / 2 + b * b / 2 * atanh(e) / e  # authalic radius squared

    beta1 = atan((1 - f) * tan(phi1))
    beta2 = atan((1 - f) * tan(phi2))
    alpha0 = atan2(sin(alpha1) * cos(beta1),
                   sqrt(cos(alpha1) ** 2 + (sin(alpha1) * sin(beta1)) ** 2))
    sigma1, omega1 = _triangle_NEA(alpha0, alpha1, beta1)
    _, sigma2, omega2 = _triangle_NEB(alpha0, alpha1, beta1, beta2)
    omega12 = omega2 - omega1

    alpha12 = 2 * atan(sin(0.5 * (beta1 + beta2)) / cos(0.5 * (beta2 - beta1))
                       * tan(0.5 * omega12))
    sph_term = c2 * alpha12

    k2 = ep2 * cos(alpha0) ** 2
    C4 = _C4_coeffs(ep2, k2)
    I4s1 = sum(c * cos((2 * i + 1) * sigma1) for i, c in enumerate(C4))
    I4s2 = sum(c * cos((2 * i + 1) * sigma2) for i, c in enumerate(C4))
    S12 = sph_term + e2 * a * a * cos(alpha0) * sin(alpha0) * (I4s2 - I4s1)
    return reverse * S12


def _C4_coeffs(ep2, k2):
    """C4 series for the area integral I4 (Karney 2013, eqn 65)."""
    C40 = ((2.0 / 3 - ep2 / 15 + 4 * ep2 ** 2 / 105 - 8 * ep2 ** 3 / 315
            + 64 * ep2 ** 4 / 3465 - 128 * ep2 ** 5 / 9009)
           - (1.0 / 20 - ep2 / 35 + 2 * ep2 ** 2 / 105 - 16 * ep2 ** 3 / 1155
              + 32 * ep2 ** 4 / 3003) * k2
           + (1.0 / 42 - ep2 / 63 + 8 * ep2 ** 2 / 693 - 90 * ep2 ** 3 / 9009) * k2 ** 2
           - (1.0 / 72 - ep2 / 99 + 10 * ep2 ** 2 / 1287) * k2 ** 3
           + (1.0 / 110 - ep2 / 143) * k2 ** 4 - k2 ** 5 / 156)
    C41 = ((1.0 / 180 - ep2 / 315 + 2 * ep2 ** 2 / 945 - 16 * ep2 ** 3 / 10395
            + 32 * ep2 ** 4 / 27027) * k2
           - (1.0 / 252 - ep2 / 378 + 4 * ep2 ** 2 / 2079 - 40 * ep2 ** 3 / 27027) * k2 ** 2
           + (1.0 / 360 - ep2 / 495 + 2 * ep2 ** 2 / 1287) * k2 ** 3
           - (1.0 / 495 - 2 * ep2 / 1287) * k2 ** 4 + 5 * k2 ** 5 / 3276)
    C42 = ((1.0 / 2100 - ep2 / 3150 + 4 * ep2 ** 2 / 17325 - 8 * ep2 ** 3 / 45045) * k2 ** 2
           - (1.0 / 1800 - ep2 / 2475 + 2 * ep2 ** 2 / 6435) * k2 ** 3
           + (1.0 / 1925 - 2 * ep2 / 5005) * k2 ** 4 - k2 ** 5 / 2184)
    C43 = ((1.0 / 17640 - ep2 / 24255 + 2 * ep2 ** 2 / 63063) * k2 ** 3
           - (1.0 / 10780 - ep2 / 14014) * k2 ** 4 + 5 * k2 ** 5 / 45864)
    C44 = (1.0 / 124740 - ep2 / 162162) * k2 ** 4 - k2 ** 5 / 58968
    C45 = k2 ** 5 / 792792
    return (C40, C41, C42, C43, C44, C45)


# ---------------------------------------------------------------------------
# Vectorized wrappers (loop over scalars; used in batch kernels where the
# refinement genuinely needs the ellipsoid)
# ---------------------------------------------------------------------------

def inverse_vec(a, b, x1, y1, x2, y2):
    x1, y1, x2, y2 = np.broadcast_arrays(
        *(np.atleast_1d(np.asarray(v, dtype=np.float64)) for v in (x1, y1, x2, y2)))
    out_az = np.empty(x1.shape)
    out_baz = np.empty(x1.shape)
    out_d = np.empty(x1.shape)
    it = np.nditer(x1, flags=["multi_index"])
    for _ in it:
        i = it.multi_index
        out_az[i], out_baz[i], out_d[i] = ellipsoidal_inverse(
            a, b, x1[i], y1[i], x2[i], y2[i])
    return out_az, out_baz, out_d


def forward_vec(a, b, lon, lat, az, dist):
    lon, lat, az, dist = np.broadcast_arrays(
        *(np.atleast_1d(np.asarray(v, dtype=np.float64)) for v in (lon, lat, az, dist)))
    out_x = np.empty(lon.shape)
    out_y = np.empty(lon.shape)
    out_baz = np.empty(lon.shape)
    it = np.nditer(lon, flags=["multi_index"])
    for _ in it:
        i = it.multi_index
        out_x[i], out_y[i], out_baz[i] = ellipsoidal_forward(
            a, b, lon[i], lat[i], az[i], dist[i])
    return out_x, out_y, out_baz
