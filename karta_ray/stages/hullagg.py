"""Convex hull as a distributed aggregation.

A hull is an aggregate over a point set (karta ``convex_hull``,
karta/vector/geometry.py:600-613): compute per-block partial hulls, then
the hull of the union of hull vertices — associative, so the combine is
a tree like any other aggregate. Spherical hulls use the spherical scan
on the same plan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import hull as HK


def _hull_vertices(coords, geographical: bool):
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 3:
        return coords
    idx = (HK.convex_hull_sph(coords) if geographical
           else HK.convex_hull_planar(coords))
    return coords[idx]


def convex_hull(points_ds, *, x_col="lon", y_col="lat",
                geographical: bool = False):
    """Global convex hull of a points Dataset.

    Per-block partial hulls shrink each block to its hull vertices; the
    final exact hull is computed over the (small) union. Returns an
    Arrow table (order, x, y) with vertices in scan order starting from
    the leftmost point, matching the reference's output order.
    """
    def partial(batch: pa.Table) -> pa.Table:
        coords = np.column_stack([
            batch.column(x_col).to_numpy(zero_copy_only=False),
            batch.column(y_col).to_numpy(zero_copy_only=False)])
        coords = coords[~np.isnan(coords).any(axis=1)]
        hv = _hull_vertices(coords, geographical)
        return pa.table({"x": pa.array(hv[:, 0]), "y": pa.array(hv[:, 1])})

    part = points_ds.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
    # partial hulls are tiny (tens of vertices per block) — collect
    # directly, no repartition stage needed
    all_pts = part.to_pandas()
    coords = np.column_stack([all_pts["x"].to_numpy(),
                              all_pts["y"].to_numpy()])
    hv = _hull_vertices(np.unique(coords, axis=0), geographical)
    return pa.table({
        "order": pa.array(np.arange(len(hv), dtype=np.int64)),
        "x": pa.array(hv[:, 0]),
        "y": pa.array(hv[:, 1]),
    })


def grouped_convex_hull(points_ds, group_col: str, *, x_col="lon",
                        y_col="lat", geographical: bool = False):
    """Per-group convex hulls via groupby().map_groups — one hull row
    set per key (the reference's per-layer hull, distributed)."""
    def hull_of_group(group: pa.Table) -> pa.Table:
        coords = np.column_stack([
            group.column(x_col).to_numpy(zero_copy_only=False),
            group.column(y_col).to_numpy(zero_copy_only=False)])
        coords = coords[~np.isnan(coords).any(axis=1)]
        if len(coords) == 0:
            return pa.table({group_col: pa.array([], pa.int64()),
                             "order": pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64())})
        hv = _hull_vertices(coords, geographical)
        key = group.column(group_col)[0].as_py()
        n = len(hv)
        return pa.table({
            group_col: pa.array([key] * n, pa.int64()),
            "order": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(hv[:, 0]),
            "y": pa.array(hv[:, 1]),
        })

    return points_ds.groupby(group_col).map_groups(hull_of_group,
                                                   batch_format="pyarrow")
