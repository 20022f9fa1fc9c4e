"""Raster kernels over plain numpy arrays.

Grid model follows the reference's ``RegularGrid``
(karta/raster/grid.py:81-194): a 6-tuple affine transform
``(x0, y0, dx, dy, sx, sy)`` maps indices to world coordinates with
pixel centers at half-offsets; values arrays are (ny, nx) or
(ny, nx, bands), row 0 at the y0 edge (grids with negative dy are
normalized at ingest).

Kernels replicate the reference numerics:
- positions: inverse affine with the -0.5 center offset
  (karta/raster/crfuncs.pyx:11-33)
- bilinear sampling incl. the asymmetric integer-index branch and
  out-of-bounds -> nodata (crfuncs.pyx:35-157)
- point-to-grid binning with per-cell means (crfuncs.pyx:159-195,
  grid.py:1259-1302)
- neighborhood stencils (karta/raster/misc.py)
- polygon scanline mask (grid.py:1304-1384)
"""

from __future__ import annotations

import numpy as np


def get_nodata(T):
    """Default NODATA per pixel dtype (karta/raster/grid.py:1233-1257):
    max for unsigned ints, min for signed ints, NaN for real/complex."""
    dt = np.dtype(T)
    if dt.kind == "u":
        return np.iinfo(dt).max
    if dt.kind in ("i", "b"):
        return np.iinfo(dt).min
    if dt.kind in ("f", "c"):
        return np.nan
    raise ValueError(f"No default NODATA value for type {T}")


def positions(transform, x, y):
    """Float (row, col) indices of world coords (center-referenced)."""
    x0, y0, dx, dy, sx, sy = transform
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    j = (dy * x - dy * x0 + sx * y0 - sx * y) / (dx * dy - sx * sy)
    i = (y - y0 - j * sy) / dy
    return i - 0.5, j - 0.5


def world_coords(transform, i, j):
    """Pixel-center world coordinates of (row, col) indices
    (karta/raster/coordgen.py semantics)."""
    x0, y0, dx, dy, sx, sy = transform
    i = np.asarray(i, dtype=np.float64)
    j = np.asarray(j, dtype=np.float64)
    x = x0 + (j + 0.5) * dx + (i + 0.5) * sx
    y = y0 + (i + 0.5) * dy + (j + 0.5) * sy
    return x, y


def center_coords(transform, shape):
    """Meshes of cell-center coordinates, shape (ny, nx) each (reference
    ``center_coords``/``coordmesh``, karta/raster/grid.py:299-308) —
    broadcast closed form, no per-row loop."""
    x0, y0, dx, dy, sx, sy = transform
    ny, nx = shape
    jj = np.arange(nx, dtype=np.float64)[None, :]
    ii = np.arange(ny, dtype=np.float64)[:, None]
    x = x0 + (jj + 0.5) * dx + (ii + 0.5) * sx
    y = y0 + (ii + 0.5) * dy + (jj + 0.5) * sy
    return np.broadcast_to(x, shape).copy(), np.broadcast_to(y, shape).copy()


coordmesh = center_coords  # reference alias (grid.py:271-273)


def vertex_coords(transform, shape):
    """Meshes of cell-vertex coordinates, shape (ny+1, nx+1) each
    (reference ``vertex_coords``, karta/raster/grid.py:310-320; the
    reference leaves its last row uninitialized — np.empty garbage — so
    this emits the closed form for ALL ny+1 rows instead)."""
    x0, y0, dx, dy, sx, sy = transform
    ny, nx = shape
    jj = np.arange(nx + 1, dtype=np.float64)[None, :]
    ii = np.arange(ny + 1, dtype=np.float64)[:, None]
    x = x0 + jj * dx + ii * sx
    y = y0 + ii * dy + jj * sy
    out_shape = (ny + 1, nx + 1)
    return (np.broadcast_to(x, out_shape).copy(),
            np.broadcast_to(y, out_shape).copy())


def data_mask(values, nodata=np.nan):
    """Boolean mask of valid (non-nodata) cells; multi-band stacks are
    valid only where ALL bands hold data (reference ``data_mask`` /
    ``data_mask_full``, karta/raster/grid.py:464-477)."""
    v = np.asarray(values)
    nodata_is_nan = isinstance(nodata, (float, np.floating)) \
        and np.isnan(nodata)
    m = ~np.isnan(v) if nodata_is_nan else v != nodata
    if v.ndim == 3:
        m = np.all(m, axis=0)
    return m


def data_bbox(values, transform, nodata=np.nan):
    """(xmin, ymin, xmax, ymax) of the data-holding region, edge
    referenced (reference ``data_bbox``, karta/raster/grid.py:334-336:
    data_extent with reference="edge", reordered)."""
    x0, y0, dx, dy, sx, sy = transform
    xmin, ymin, xmax, ymax = data_extent(values, transform, nodata)
    # center -> edge: pad by half a cell on each side
    return (xmin - dx / 2.0, ymin - dy / 2.0,
            xmax + dx / 2.0, ymax + dy / 2.0)


def sample_nearest(transform, values, x, y, nodata=np.nan):
    """Nearest-cell-center sampling; out-of-bounds -> nodata."""
    I, J = positions(transform, x, y)
    i = np.round(I).astype(np.int64)
    j = np.round(J).astype(np.int64)
    m, n = values.shape[:2]
    ok = (i >= 0) & (i < m) & (j >= 0) & (j < n)
    out = np.full(np.shape(i), nodata, dtype=np.float64)
    out[ok] = values[i[ok], j[ok]]
    return out


def _lohi(v):
    """The reference's asymmetric index bracket (crfuncs.pyx:48-68):
    fractional -> (floor, floor+1); integer nonzero -> (v-1, v);
    zero -> (0, 1)."""
    v = np.asarray(v, dtype=np.float64)
    frac = v % 1.0 != 0.0
    lo = np.where(frac, np.floor(v), np.where(v != 0, v - 1.0, v))
    hi = np.where(frac, np.floor(v) + 1.0, np.where(v != 0, v, v + 1.0))
    return lo.astype(np.int64), hi.astype(np.int64)


def sample_bilinear(transform, values, x, y, nodata=np.nan):
    """Bilinear sampling (crfuncs.pyx:118-157); out-of-bounds -> nodata.
    Integer dtypes truncate toward zero like the reference's int paths."""
    I, J = positions(transform, x, y)
    i0, i1 = _lohi(I)
    j0, j1 = _lohi(J)
    m, n = values.shape[:2]
    ok = (i0 >= 0) & (i1 < m) & (j0 >= 0) & (j1 < n)
    i0c = np.clip(i0, 0, m - 1)
    i1c = np.clip(i1, 0, m - 1)
    j0c = np.clip(j0, 0, n - 1)
    j1c = np.clip(j1, 0, n - 1)
    Z = values.astype(np.float64)
    out = (Z[i0c, j0c] * (i1 - I) * (j1 - J)
           + Z[i1c, j0c] * (I - i0) * (j1 - J)
           + Z[i0c, j1c] * (i1 - I) * (J - j0)
           + Z[i1c, j1c] * (I - i0) * (J - j0))
    if np.issubdtype(values.dtype, np.integer):
        out = np.trunc(out)
    return np.where(ok, out, nodata)


def bin_mean(x, y, z, transform, shape=None, nodata=np.nan):
    """Points -> grid binning with per-cell means (``gridpoints``
    semantics, grid.py:1259-1302): cell indices by rounding `positions`,
    empty cells -> nodata. Returns (ny, nx) float64."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    x0, y0, dx, dy, sx, sy = transform
    if shape is None:
        ny = int((y.max() - y0) // dy) + 1
        nx = int((x.max() - x0) // dx) + 1
    else:
        ny, nx = shape
    I, J = positions(transform, x, y)
    i = np.round(I).astype(np.int64)
    j = np.round(J).astype(np.int64)
    ok = (i >= 0) & (i < ny) & (j >= 0) & (j < nx)
    flat = i[ok] * nx + j[ok]
    sums = np.bincount(flat, weights=z[ok], minlength=ny * nx)
    counts = np.bincount(flat, minlength=ny * nx)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(counts > 0, sums / np.maximum(counts, 1), nodata)
    return out.reshape(ny, nx), counts.reshape(ny, nx)


def grid_merge(grids, weights=None, nodata=np.nan):
    """Mosaic of integer-translated grids with weighted means where they
    overlap, nodata where none covers (karta ``raster.merge``,
    grid.py:1141-1231).

    ``grids``: list of (values, transform); values (ny, nx) or
    (ny, nx, bands). Returns (values, transform).
    """
    T = tuple(grids[0][1])
    dx, dy = T[2], T[3]
    for i, (_, t) in enumerate(grids[1:]):
        if tuple(t[2:6]) != T[2:6]:
            raise ValueError(f"grid {i + 2} stretch/skew mismatch")
        rx = (t[0] - T[0]) / dx
        ry = (t[1] - T[1]) / dy
        # distance to the NEAREST integer (r % 1 would reject offsets
        # landing just below an integer, remainder ~0.9999999999)
        if (abs(rx - round(rx)) > 1e-9) or (abs(ry - round(ry)) > 1e-9):
            raise ValueError(f"grid {i + 2} not an integer translation")

    if weights is None:
        weights = np.ones(len(grids))
    weights = np.asarray(weights, dtype=np.float64)
    weights = weights * len(weights) / weights.sum()

    def extent(values, t):
        ny, nx = values.shape[:2]
        return (t[0], t[0] + nx * dx, t[1], t[1] + ny * dy)

    xmin = min(extent(v, t)[0] for v, t in grids)
    xmax = max(extent(v, t)[1] for v, t in grids)
    ymin = min(extent(v, t)[2] for v, t in grids)
    ymax = max(extent(v, t)[3] for v, t in grids)
    nx = int(round((xmax - xmin) / dx))
    ny = int(round((ymax - ymin) / dy))

    first = np.asarray(grids[0][0], dtype=np.float64)
    nbands = 1 if first.ndim == 2 else first.shape[2]
    out = np.empty((ny, nx, nbands))
    for b in range(nbands):
        acc = np.zeros((ny, nx))
        cnt = np.zeros((ny, nx))
        for (v, t), w in zip(grids, weights):
            v = np.asarray(v, dtype=np.float64)
            band = v if v.ndim == 2 else v[:, :, b]
            gy, gx = band.shape
            offx = int(round((t[0] - xmin) / dx))
            offy = int(round((t[1] - ymin) / dy))
            mask = (band != nodata) if not np.isnan(nodata) else ~np.isnan(band)
            acc[offy:offy + gy, offx:offx + gx][mask] += band[mask] * w
            cnt[offy:offy + gy, offx:offx + gx][mask] += w
        with np.errstate(invalid="ignore", divide="ignore"):
            out[:, :, b] = np.where(cnt != 0, acc / np.maximum(cnt, 1e-300),
                                    nodata)
    if nbands == 1:
        out = out[:, :, 0]
    return out, (xmin, ymin) + T[2:]


def grid_minmax(values, nodata=np.nan):
    """Nodata-masked extrema (karta grid.py:26-48)."""
    v = np.asarray(values, dtype=np.float64)
    mask = ~np.isnan(v) if np.isnan(nodata) else v != nodata
    if not mask.any():
        return (np.nan, np.nan)
    return (float(v[mask].min()), float(v[mask].max()))


def data_extent(values, transform, nodata=np.nan):
    """bbox (xmin, ymin, xmax, ymax) of pixel centers holding data
    (karta grid.py:389-463)."""
    v = np.asarray(values, dtype=np.float64)
    mask = ~np.isnan(v) if np.isnan(nodata) else v != nodata
    if not mask.any():
        return (np.nan, np.nan, np.nan, np.nan)
    ii, jj = np.nonzero(mask)
    x, y = world_coords(transform, ii, jj)
    return (float(x.min()), float(y.min()), float(x.max()), float(y.max()))


def clip(values, transform, xmin, ymin, xmax, ymax):
    """Sub-grid covering the world bbox (karta ``Grid.clip``,
    grid.py:525-562): keep pixels whose centers fall inside."""
    ny, nx = values.shape[:2]
    xc, _ = world_coords(transform, np.zeros(nx), np.arange(nx))
    _, yc = world_coords(transform, np.arange(ny), np.zeros(ny))
    cols = np.nonzero((xc >= xmin) & (xc <= xmax))[0]
    rows = np.nonzero((yc >= ymin) & (yc <= ymax))[0]
    if len(rows) == 0 or len(cols) == 0:
        return values[:0, :0], transform
    r0, r1 = rows.min(), rows.max() + 1
    c0, c1 = cols.min(), cols.max() + 1
    x0, y0, dx, dy, sx, sy = transform
    new_t = (x0 + c0 * dx, y0 + r0 * dy, dx, dy, sx, sy)
    return values[r0:r1, c0:c1], new_t


def resize(values, transform, xmin, ymin, xmax, ymax, nodata=np.nan):
    """Resize the grid to new edge extents on the same sampling lattice
    (karta ``Grid.resize``, grid.py:564-617): crop where the new extent
    is smaller, pad with nodata where larger. Extents snap to whole
    cells of the existing transform."""
    x0, y0, dx, dy, sx, sy = transform
    ny, nx = values.shape[:2]
    # solve the lattice shift from the full affine (x = x0 + j dx + i sx,
    # y = y0 + i dy + j sy), so sheared grids resize on their own
    # lattice too (reference resize keeps sx/sy in Tnew,
    # grid.py:590-618; sizes are measured along the grid axes there as
    # well)
    det = dx * dy - sx * sy
    ox, oy = xmin - x0, ymin - y0
    j0 = int(round((ox * dy - oy * sx) / det))
    i0 = int(round((oy * dx - ox * sy) / det))
    new_nx = int(round((xmax - xmin) / dx))
    new_ny = int(round((ymax - ymin) / dy))
    out = np.full((new_ny, new_nx), nodata, dtype=np.float64)
    src_i0 = max(i0, 0)
    src_j0 = max(j0, 0)
    src_i1 = min(i0 + new_ny, ny)
    src_j1 = min(j0 + new_nx, nx)
    if src_i1 > src_i0 and src_j1 > src_j0:
        out[src_i0 - i0:src_i1 - i0, src_j0 - j0:src_j1 - j0] = \
            values[src_i0:src_i1, src_j0:src_j1]
    return out, (x0 + j0 * dx + i0 * sx, y0 + i0 * dy + j0 * sy,
                 dx, dy, sx, sy)


def resample(values, transform, new_dx, new_dy, *, method="nearest",
             nodata=np.nan):
    """Resample to a new resolution (karta ``Grid.resample``,
    grid.py:724-760): sample the source at the new pixel centers."""
    x0, y0, dx, dy, sx, sy = transform
    ny, nx = values.shape[:2]
    new_ny = int(ny * dy / new_dy)
    new_nx = int(nx * dx / new_dx)
    jj, ii = np.meshgrid(np.arange(new_nx), np.arange(new_ny))
    # the new grid keeps the source shear (reference resample builds
    # tnew with t[4], t[5] preserved, grid.py:744-747); sample_* invert
    # the full affine, so sheared sources resolve correctly
    new_t = (x0, y0, new_dx, new_dy, sx, sy)
    xq, yq = world_coords(new_t, ii.ravel(), jj.ravel())
    if method == "nearest":
        out = sample_nearest(transform, values, xq, yq, nodata)
    else:
        out = sample_bilinear(transform, values, xq, yq, nodata)
    return out.reshape(new_ny, new_nx), new_t


# ---------------------------------------------------------------------------
# Neighborhood stencils (karta/raster/misc.py)
# ---------------------------------------------------------------------------

def _ddx_ddy(D, res):
    dx, dy = res
    Ddx = ((2 * D[1:-1, 2:] + D[:-2, 2:] + D[2:, 2:])
           - (2 * D[1:-1, :-2] + D[:-2, :-2] + D[2:, :-2])) / (8.0 * dx)
    Ddy = ((2 * D[2:, 1:-1] + D[2:, 2:] + D[2:, :-2])
           - (2 * D[:-2, 1:-1] + D[:-2, :-2] + D[:-2, 2:])) / (8.0 * dy)
    return Ddx, Ddy


def slope(D, res=(1.0, 1.0)):
    """ESRI neighbourhood slope; odd-reflect padded (misc.py:8-41)."""
    Ddx, Ddy = _ddx_ddy(D, res)
    return np.pad(np.sqrt(Ddx * Ddx + Ddy * Ddy), 1, "reflect",
                  reflect_type="odd")


def aspect(D, res=(1.0, 1.0)):
    """Slope aspect; NaN-padded (misc.py:43-71)."""
    Ddx, Ddy = _ddx_ddy(D, res)
    return np.pad(np.arctan2(Ddy, -Ddx), 1, "constant",
                  constant_values=np.nan)


def gradient(D, res=(1.0, 1.0)):
    """(dD/dx, dD/dy); NaN-padded (misc.py:73-101)."""
    Ddx, Ddy = _ddx_ddy(D, res)
    pad = lambda a: np.pad(a, 1, "constant", constant_values=np.nan)
    return pad(Ddx), pad(Ddy)


def divergence(U, V, res=(1.0, 1.0)):
    """Central-difference divergence of (U, V) (misc.py:103-130)."""
    dU = (U[:, 2:] - U[:, :-2]) / (2.0 * res[0])
    dV = (V[2:, :] - V[:-2, :]) / (2.0 * res[1])
    return (np.pad(dU, ((0, 0), (1, 1)), "constant", constant_values=np.nan)
            + np.pad(dV, ((1, 1), (0, 0)), "constant", constant_values=np.nan))


def normed_potential_vectors(D, res=(1.0, 1.0)):
    """(U, V) gradient field of potential D, normalized to the max
    gradient magnitude (misc.py:132-165); NaN-padded."""
    Ddx, Ddy = _ddx_ddy(D, res)
    M = np.sqrt(Ddx ** 2 + Ddy ** 2)
    mmax = M[~np.isnan(M)].max()
    pad = lambda a: np.pad(a, 1, "constant", constant_values=np.nan)
    return pad(Ddx / mmax), pad(Ddy / mmax)


def hillshade(D, res=(1.0, 1.0), azimuth=330.0, elevation=60.0):
    """Hillshade with 2-98 percentile clip (misc.py:167-206)."""
    dzdx, dzdy = gradient(D, res)
    nx_ = -res[1] * dzdx
    ny_ = -res[0] * dzdy
    nz_ = np.full_like(dzdx, res[0] * res[1])
    norm = np.sqrt(nx_ ** 2 + ny_ ** 2 + nz_ ** 2)
    s = np.array([np.cos(azimuth * np.pi / 180.0),
                  np.sin(azimuth * np.pi / 180.0),
                  np.sin(elevation * np.pi / 180.0)])
    dprod = (nx_ * s[0] + ny_ * s[1] + nz_ * s[2]) / norm
    finite = dprod[~np.isnan(dprod)]
    if len(finite) == 0:  # degenerate tile (all halo/NaN)
        return dprod
    q = np.percentile(finite, [2, 98])
    return np.clip(dprod, q[0], q[1])


# ---------------------------------------------------------------------------
# Polygon scanline mask (grid.py:1304-1384)
# ---------------------------------------------------------------------------

def mask_poly(xpoly, ypoly, nx, ny, transform):
    """Boolean inside-mask of a clockwise polygon over the grid, by
    scanline mark/unmark from the southernmost vertex."""
    xpoly = np.asarray(xpoly, dtype=np.float64)
    ypoly = np.asarray(ypoly, dtype=np.float64)
    mask = np.zeros((ny, nx), dtype=np.int32)

    i_bot = 0
    for i in range(1, len(ypoly)):
        if (ypoly[i] < ypoly[i_bot]
                or (ypoly[i] == ypoly[i_bot] and xpoly[i] < xpoly[i_bot])):
            i_bot = i
    x0 = xpoly[i_bot]
    y0 = ypoly[i_bot]

    ta, tb, tc, td, te, tf = transform
    if tc < 0:
        ta = ta + nx * tc
        tc = -tc
    if td < 0:
        tb = tb + ny * td
        td = -td

    i0 = int(round((y0 - tb - tf / tc * (x0 - ta)) / (td - tf * te / tc)))
    j0 = int(round((x0 - ta - te / td * (y0 - tb)) / (tc - te * tf / td)))

    npts = len(xpoly)
    for el in range(1, npts + 1):
        idx = (el + i_bot) % npts
        x1 = xpoly[idx]
        y1 = ypoly[idx]
        i1 = int(round((y1 - tb - tf / tc * (x1 - ta)) / (td - tf * te / tc)))
        j1 = int(round((x1 - ta - te / td * (y1 - tb)) / (tc - te * tf / td)))

        if ((0 <= i0 < ny) and (0 <= i1 < ny)) or (y1 != y0):
            if y1 > y0:  # upward: mark cells to the right
                ii = np.arange(i0, i1)
                ok = (ii >= 0) & (ii < ny)
                jj = np.round((ii - i0) * (x1 - x0) / (y1 - y0) + j0).astype(np.int64)
                for i_, j_ in zip(ii[ok], jj[ok]):
                    if j_ < nx:
                        mask[i_, max(0, j_):] += 1
            else:  # downward: unmark
                ii = np.arange(i1, i0)
                ok = (ii >= 0) & (ii < ny)
                jj = np.round((ii - i1) * (x1 - x0) / (y1 - y0) + j1).astype(np.int64)
                for i_, j_ in zip(ii[ok], jj[ok]):
                    if j_ < nx:
                        mask[i_, max(0, j_):] -= 1
        x0, y0, i0, j0 = x1, y1, i1, j1

    return mask.astype(bool)


def mask_by_polys(values, transform, rings, nodata=np.nan):
    """Apply mask_poly for a list of rings (each oriented any way;
    flipped to clockwise like grid.py:650-656), OR-combined; outside ->
    nodata."""
    from . import predicates

    ny, nx = values.shape[:2]
    msk = np.zeros((ny, nx), dtype=bool)
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not predicates.ring_is_clockwise(ring):
            ring = ring[::-1]
        msk |= mask_poly(ring[:, 0], ring[:, 1], nx, ny, transform)
    out = values.astype(np.float64).copy()
    out[~msk] = nodata
    return out
