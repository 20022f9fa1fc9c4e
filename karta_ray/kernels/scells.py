"""S2-style spherical cell index: cube-face gnomonic projection +
Morton-interleaved quantization.

Why alongside Web-Mercator tiles (kernels/tiles.py): Mercator cells
degenerate toward the poles and exclude |lat| > ~85.05, so a polar or
global corpus needs an index whose cells stay usable everywhere. The
unit sphere maps onto 6 cube faces (gnomonic: straight rays through
the center), each face quantizes to a 2^L x 2^L grid, and (i, j)
interleave into a Morton code — hierarchical like S2 (parent = code
>> 2) but NOT wire-compatible with the S2 library (no quadratic UV
remap, own face/axis conventions), which keeps the math exactly
mirrorable in SQL.

Cell id layout (level L <= 29): ``face << (2 L) | morton(i, j)``;
``parent_cell`` drops one level. Total bits: 3 + 2 L <= 61.
"""

from __future__ import annotations

import numpy as np


def face_uv(lon, lat):
    """(face, u, v) per point; u, v in [-1, 1] (gnomonic).

    Face selection by the largest |coordinate| with the fixed priority
    x > y > z on ties (mirrored by the SQL CASE order):
    0:+x 1:+y 2:+z 3:-x 4:-y 5:-z.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    # (lat * pi) / 180 — the same association order as the SQL mirror
    # `lat*pi()/180`, so phi/lam agree bit for bit
    phi = lat * np.pi / 180.0
    lam = lon * np.pi / 180.0
    cp = np.cos(phi)
    x = cp * np.cos(lam)
    y = cp * np.sin(lam)
    z = np.sin(phi)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = ~is_x & (ay >= az)
    is_z = ~is_x & ~is_y

    face = np.where(is_x, np.where(x >= 0, 0, 3),
                    np.where(is_y, np.where(y >= 0, 1, 4),
                             np.where(z >= 0, 2, 5))).astype(np.int64)
    # per-face (u, v): forward axes chosen so each face is right-handed
    # looking at the sphere from outside; mirrored verbatim in SQL
    # over='ignore': the MASKED-OUT branches of the np.where divide by
    # near-zero components (subnormal coords overflow to inf before
    # being discarded)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        u = np.where(is_x, y / x,
                     np.where(is_y, -x / y, x / z))
        v = np.where(is_x, z / x,
                     np.where(is_y, z / y, y / z))
    # negative faces flip the ray direction: dividing by the signed
    # component already encodes it (x/x' keeps u, v continuous per face)
    return face, u, v


def quantize(u, v, level: int):
    """(i, j) integer cell coordinates at ``level``: floor of the
    [-1, 1] -> [0, 2^level) affine map, boundary clamped (u == 1.0
    lands in the last cell)."""
    n = np.int64(1) << np.int64(level)
    i = np.floor((np.asarray(u) + 1.0) * 0.5 * float(n)).astype(np.int64)
    j = np.floor((np.asarray(v) + 1.0) * 0.5 * float(n)).astype(np.int64)
    i = np.clip(i, 0, int(n) - 1)
    j = np.clip(j, 0, int(n) - 1)
    return i, j


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of x to even positions (Morton helper)."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton(i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Interleave: bit b of i -> bit 2b+1, bit b of j -> bit 2b."""
    return ((_part1by1(np.asarray(i, dtype=np.int64)) << np.uint64(1))
            | _part1by1(np.asarray(j, dtype=np.int64))).astype(np.int64)


def compose(face: np.ndarray, i: np.ndarray, j: np.ndarray,
            level: int) -> np.ndarray:
    """The single owner of the id bit layout:
    ``face << (2 level) | morton(i, j)``."""
    return (np.asarray(face, dtype=np.int64) << np.int64(2 * level)) \
        | morton(i, j)


def cell_id(lon, lat, level: int) -> np.ndarray:
    """Pole-safe spherical cell id at ``level``."""
    face, u, v = face_uv(lon, lat)
    i, j = quantize(u, v, level)
    return compose(face, i, j, level)


def parent_cell(cell: np.ndarray, level: int) -> np.ndarray:
    """The containing cell one level up (level must be the cells'
    CURRENT level)."""
    cell = np.asarray(cell, dtype=np.int64)
    face = cell >> np.int64(2 * level)
    code = cell & ((np.int64(1) << np.int64(2 * level)) - 1)
    return (face << np.int64(2 * (level - 1))) | (code >> np.int64(2))


def morton_sql(i_expr: str, j_expr: str, level: int) -> str:
    """DuckDB expression mirroring :func:`morton` bit for bit: the sum
    of shifted bit tests, generated per level (no 64-bit intrinsics
    needed)."""
    if level <= 0:
        return "0"
    terms = []
    for b in range(level):
        terms.append(f"((({i_expr}) >> {b}) & 1) * {1 << (2 * b + 1)}")
        terms.append(f"((({j_expr}) >> {b}) & 1) * {1 << (2 * b)}")
    return "(" + " + ".join(terms) + ")"
