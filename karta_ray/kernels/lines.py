"""Polyline kernels: length, cumulative length, resampling, nearest
point on boundary.

Semantics follow the reference exactly:
- ``to_points`` walk algorithm: karta/vector/geometry.py:890-918
- ``to_npoints`` stepping with per-step azimuth re-aim (the segment
  start is mutated to the current position): geometry.py:920-960
- nearest point on a segment: planar closed-form projection
  (karta/vector/vectorgeo.pyx:197-251) and geodesic bisection
  minimization with 0.01 m tolerance (vectorgeo.pyx:274-318,
  geometry.py:744-752)
"""

from __future__ import annotations

import numpy as np

from .. import crs as crsmod


def _dist_az_walk(crs):
    """Return (distance, azimuth_deg, walk) scalar-friendly functions for
    a CRS (degrees in/out; azimuth clockwise from north)."""
    if crs.kind == "cartesian":
        def dist(x0, y0, x1, y1):
            return float(np.hypot(x1 - x0, y1 - y0))

        def az(x0, y0, x1, y1):
            return float(np.degrees(np.arctan2(x1 - x0, y1 - y0)))

        def walk(x, y, azm, d):
            a = np.radians(azm)
            return (x + d * np.sin(a), y + d * np.cos(a))
    else:
        def dist(x0, y0, x1, y1):
            return float(crs.inverse(x0, y0, x1, y1)[2])

        def az(x0, y0, x1, y1):
            return float(crs.inverse(x0, y0, x1, y1)[0])

        def walk(x, y, azm, d):
            x2, y2, _ = crs.forward(x, y, azm, d)
            return (float(x2), float(y2))
    return dist, az, walk


def line_to_polygon(verts):
    """Line -> Polygon vertex array (reference ``Line.to_polygon``,
    karta/vector/geometry.py:971-973: the ring is stored OPEN; closure
    is implicit). Drops a duplicated closing vertex if present."""
    verts = np.asarray(verts, dtype=np.float64)
    if len(verts) > 1 and np.array_equal(verts[0], verts[-1]):
        return verts[:-1]
    return verts


def polygon_to_line(verts):
    """Polygon ring -> self-closing polyline (reference
    ``Polygon.to_line``, karta/vector/geometry.py:1176-1179: appends the
    first vertex; sub-ring (hole) handling is the caller's)."""
    verts = np.asarray(verts, dtype=np.float64)
    return np.vstack([verts, verts[:1]])


def flat_distances_to(verts, px, py, pz=None):
    """Planar distance from each vertex to a point (reference
    ``flat_distances_to``, karta/vector/geometry.py:564-569). The
    reference sums squared offsets over EVERY coordinate column, so a
    rank-3 vertex array with a rank-3 query point measures in 3-D;
    pass ``pz`` to opt in (rank-2 verts or a rank-2 point stay 2-D,
    like mixing ranks does in the reference constructors, which slice
    to the minimum rank)."""
    verts = np.asarray(verts, dtype=np.float64)
    if pz is not None and verts.shape[1] >= 3:
        dx = verts[:, 0] - px
        dy = verts[:, 1] - py
        dz = verts[:, 2] - pz
        return np.sqrt(dx * dx + dy * dy + dz * dz)
    return np.hypot(verts[:, 0] - px, verts[:, 1] - py)


def distances_to(verts, px, py, crs=crsmod.Cartesian, pz=None):
    """CRS-dispatched distance from each vertex to a point (reference
    ``distances_to``, geometry.py:571-574 — per-vertex Point.distance,
    here one vectorized call). With rank-3 verts AND ``pz``, the
    vertical offset is added in quadrature AFTER the horizontal
    (geodesic or planar) distance, exactly like ``Point.distance``
    (geometry.py:311-313)."""
    verts = np.asarray(verts, dtype=np.float64)
    alt1 = alt2 = None
    if pz is not None and verts.shape[1] >= 3:
        alt1 = verts[:, 2]
        alt2 = np.full(len(verts), pz, dtype=np.float64)
    return crsmod.point_distance(crs, verts[:, 0], verts[:, 1],
                                 np.full(len(verts), px),
                                 np.full(len(verts), py),
                                 alt1=alt1, alt2=alt2)


def nearest_vertex_to(verts, px, py, crs=crsmod.Cartesian, pz=None):
    """Index of the vertex nearest to the point — argmin of
    ``distances_to`` (reference ``nearest_vertex_to``,
    geometry.py:576-591), rank-3 aware through the same z-quadrature."""
    return int(np.argmin(distances_to(verts, px, py, crs=crs, pz=pz)))


def segment_lengths(verts):
    """Planar per-segment lengths as ``sqrt(dx*dx + dy*dy)`` — written
    with explicit sqrt (NOT np.hypot, which is only faithfully rounded
    and can differ by 1 ulp) so results are bit-identical to any engine
    computing the textbook formula (the DuckDB oracle certifies this
    kernel)."""
    verts = np.asarray(verts, dtype=np.float64)
    dx = np.diff(verts[:, 0])
    dy = np.diff(verts[:, 1])
    return np.sqrt(dx * dx + dy * dy)


def cumulength(verts, crs=crsmod.Cartesian):
    """Cumulative arc length per vertex (geometry.py:875-888).

    The reference computes this through per-segment ``Point.distance``,
    so for rank-3 vertices each segment adds the vertical offset in
    quadrature AFTER the horizontal distance (``sqrt(d*d + dz*dz)``
    with d already rounded — geometry.py:311-313); the two-step order
    is kept for bit parity rather than folding dz into one sqrt."""
    verts = np.asarray(verts, dtype=np.float64)
    if crs.kind == "cartesian":
        seg = segment_lengths(verts)
    else:
        dist, _, _ = _dist_az_walk(crs)
        seg = np.array([dist(*verts[i, :2], *verts[i + 1, :2])
                        for i in range(len(verts) - 1)])
    if verts.shape[1] >= 3:
        dz = np.diff(verts[:, 2])
        seg = np.sqrt(seg * seg + dz * dz)
    return np.concatenate([[0.0], np.cumsum(seg)])


def line_length(verts, crs=crsmod.Cartesian, ring=False):
    """Total length; ring adds the closing segment
    (vectorgeo.pyx:178-195, geometry.py:646-665).

    Deliberately 2-D even for rank-3 vertices: the reference's
    ``Line.length`` reads only x/y (the planar Cython kernel walks
    getX/getY, vectorgeo.pyx:178-195; the geographic branch slices
    ``[:2]``, geometry.py:655-663) — so for a rank-3 line,
    ``length != cumulength()[-1]`` in the reference, a quirk preserved
    here (cumulength goes through the z-aware Point.distance)."""
    verts = np.asarray(verts, dtype=np.float64)[:, :2]
    if ring:
        verts = np.vstack([verts, verts[:1]])
    return float(cumulength(verts, crs)[-1])


def to_points(verts, dx, crs=crsmod.Cartesian):
    """Resample at fixed spacing *dx* (geometry.py:890-918): walk each
    segment with the carry-over remainder; azimuth fixed per segment."""
    verts = np.asarray(verts, dtype=np.float64)
    dist, az, walk = _dist_az_walk(crs)
    remainder = 0.0
    p0 = tuple(verts[0, :2])
    out = [p0]
    for i in range(len(verts) - 1):
        s0 = tuple(verts[i, :2])
        s1 = tuple(verts[i + 1, :2])
        seglen = dist(*s0, *s1)
        azm = az(*s0, *s1)
        pos = 0.0
        while pos < seglen:
            d_end = dist(*p0, *s1)
            # 1e-8 relative slack absorbs walk fp drift at exact-endpoint
            # steps (same order of slack the reference uses in to_npoints,
            # geometry.py:944)
            if d_end >= dx * (1.0 - 1e-8):
                p1 = walk(*p0, azm, dx - remainder)
                pos += dx - remainder
                out.append(p1)
                remainder = 0.0
                p0 = p1
            else:
                remainder = d_end
                pos = seglen
                p0 = s1
    return np.asarray(out, dtype=np.float64)


def to_npoints(verts, n, crs=crsmod.Cartesian):
    """Resample to exactly *n* points (geometry.py:920-960): fixed step
    of total_length/(n-1); the walking segment's start is moved to the
    current position after each emitted point, so the azimuth re-aims at
    the segment end (great-circle paths curve)."""
    verts = np.asarray(verts, dtype=np.float64)
    dist, az, walk = _dist_az_walk(crs)
    total = float(cumulength(verts, crs)[-1])
    step = total / float(n - 1)
    step_remaining = step

    out = [tuple(verts[0, :2])]
    x = 0.0
    pos = tuple(verts[0, :2])
    si = 0
    seg_start = tuple(verts[0, :2])
    seg_end = tuple(verts[1, :2])
    seg_remaining = dist(*seg_start, *seg_end)

    while x < total - 1e-8:
        azm = az(*seg_start, *seg_end)
        if step_remaining <= seg_remaining:
            pos = walk(*pos, azm, step_remaining)
            x += step_remaining
            seg_remaining -= step_remaining
            step_remaining = step
            out.append(pos)
            seg_start = pos
        else:
            pos = seg_end
            x += seg_remaining
            step_remaining -= seg_remaining
            si += 1
            if si < len(verts) - 1:
                seg_start = tuple(verts[si, :2])
                seg_end = tuple(verts[si + 1, :2])
            seg_remaining = dist(*seg_start, *seg_end)

    if len(out) == n - 1:
        out.append(seg_end)
    return np.asarray(out, dtype=np.float64)


# ---------------------------------------------------------------------------
# Nearest point on a polyline
# ---------------------------------------------------------------------------

def nearest_on_segments_planar(px, py, x0, y0, x1, y1):
    """Vectorized planar point-on-segment projection with endpoint clamp
    (equivalent to vectorgeo.pyx:197-251). Scalar point vs segment
    arrays. Returns (xn, yn, dist) per segment."""
    x0, y0, x1, y1 = (np.asarray(v, dtype=np.float64) for v in (x0, y0, x1, y1))
    vx = x1 - x0
    vy = y1 - y0
    ux = px - x0
    uy = py - y0
    vv = vx * vx + vy * vy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(vv > 0, (ux * vx + uy * vy) / np.where(vv == 0, 1.0, vv), 0.0)
    t = np.clip(t, 0.0, 1.0)
    xn = x0 + t * vx
    yn = y0 + t * vy
    return xn, yn, np.hypot(px - xn, py - yn)


def nearest_on_chain_planar(px, py, verts):
    """Nearest position on an open vertex chain to one point
    (geometry.py:725-763 planar path): per-segment projection, min scan
    keeping the first minimum."""
    verts = np.asarray(verts, dtype=np.float64)
    xn, yn, d = nearest_on_segments_planar(
        float(px), float(py), verts[:-1, 0], verts[:-1, 1],
        verts[1:, 0], verts[1:, 1])
    i = int(np.argmin(d))
    return (float(xn[i]), float(yn[i])), float(d[i])


def _along_distance(fwd, inv, x0, y0, xp, yp, azm, f):
    tx, ty, _ = fwd(x0, y0, azm, f)
    return float(inv(float(tx), float(ty), xp, yp)[2])


def nearest_on_segment_geo(px, py, s0, s1, crs, tol=0.01, maxiter=100):
    """Geodesic nearest-point on one segment by bisection on the
    along-track distance gradient (vectorgeo.pyx:274-318), tol in
    meters."""
    fwd, inv = crs.forward, crs.inverse
    azm, _, L = inv(s0[0], s0[1], s1[0], s1[1])
    azm = float(azm)
    L = float(L)
    eps = 1e-7 * L

    def grad(f):
        d1 = _along_distance(fwd, inv, s0[0], s0[1], px, py, azm, f)
        d2 = _along_distance(fwd, inv, s0[0], s0[1], px, py, azm, f + eps)
        return (d2 - d1) / eps

    if grad(0.0) > 0:
        return (s0[0], s0[1]), _along_distance(fwd, inv, s0[0], s0[1], px, py, azm, 0.0)
    if grad(L) < 0:
        return (s1[0], s1[1]), _along_distance(fwd, inv, s0[0], s0[1], px, py, azm, L)

    x0f, x1f = 0.0, 1.0
    dx = tol + 1.0
    i = 0
    xm = 0.5
    while dx > tol:
        if i == maxiter:
            raise RuntimeError("nearest_on_segment_geo: no convergence")
        xm = 0.5 * (x0f + x1f)
        g = grad(xm * L)
        if g > 0:
            dx = abs(x1f - xm) * L
            x1f = xm
        else:
            dx = abs(x0f - xm) * L
            x0f = xm
        i += 1
    xn, yn, _ = fwd(s0[0], s0[1], azm, xm * L)
    d = _along_distance(fwd, inv, s0[0], s0[1], px, py, azm, xm * L)
    return (float(xn), float(yn)), d


def within_distance(px, py, verts, distance, crs=crsmod.Cartesian):
    """Whether the point is within *distance* of every segment of the
    chain (karta ``within_distance``, geometry.py:794-807: ``all`` over
    per-segment shortest distances)."""
    verts = np.asarray(verts, dtype=np.float64)
    if crs.kind == "cartesian":
        _, _, d = nearest_on_segments_planar(
            float(px), float(py), verts[:-1, 0], verts[:-1, 1],
            verts[1:, 0], verts[1:, 1])
        return bool((distance >= d).all())
    for i in range(len(verts) - 1):
        _, d = nearest_on_segment_geo(px, py, verts[i, :2], verts[i + 1, :2], crs)
        if d > distance:
            return False
    return True


def nearest_on_chain(px, py, verts, crs=crsmod.Cartesian, tol=0.01):
    """Nearest position + distance on a chain for any CRS
    (karta ``nearest_on_boundary`` / ``shortest_distance_to``,
    geometry.py:765-792)."""
    if crs.kind == "cartesian":
        return nearest_on_chain_planar(px, py, verts)
    verts = np.asarray(verts, dtype=np.float64)
    best = None
    for i in range(len(verts) - 1):
        pt, d = nearest_on_segment_geo(px, py, verts[i, :2], verts[i + 1, :2],
                                       crs, tol=tol)
        if best is None or d < best[1]:
            best = (pt, d)
    return best
