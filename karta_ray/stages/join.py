"""Point-in-polygon spatial join — the heart of the engine.

Replaces the reference's ``Multipoint.within_polygon`` (quadtree bbox
prefilter -> exact contains, karta/vector/geometry.py:1391-1405) with the
distributed shape:

1. points carry a packed Web-Mercator ``cell_id`` (tile zoom Z);
2. the polygon layer is prepped ONCE into plain arrays + a
   cell -> candidate-polygons cover map, put in the object store with
   ``ray.put`` and shared zero-copy by every join actor;
3. ``PolyJoiner`` is a callable class for
   ``map_batches(PolyJoiner, concurrency=N)``: candidate lookup by cell,
   then the exact winding-number / polar-azimuth test per candidate
   polygon, vectorized over the point subset.

The cell prefilter is a strict superset of the reference's bbox
prefilter, and the exact test is identical — so join outputs match
row-for-row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..geoms import PolygonSet

DEFAULT_ZOOM = 7


def _strtree_boxes(polyset: PolygonSet):
    """Expand polygon bboxes into STRtree leaf boxes: dateline-crossing
    bboxes (xmin > xmax) split into two boxes; polar polygons get a
    full-longitude box down to their low-latitude edge (their lon/lat
    bbox is meaningless around a pole). Returns (boxes, box_to_poly)."""
    boxes = []
    owner = []
    for ip in range(len(polyset)):
        xmin, ymin, xmax, ymax = polyset.bbox[ip]
        if polyset.is_polar is not None and polyset.is_polar[ip]:
            outer = polyset.rings_of(ip)[0]
            if outer[:, 1].mean() > 0:
                boxes.append((-180.0, ymin, 180.0, 90.0))
            else:
                boxes.append((-180.0, -90.0, 180.0, ymax))
            owner.append(ip)
        elif xmin > xmax:
            boxes.append((xmin, ymin, 180.0, ymax))
            owner.append(ip)
            boxes.append((-180.0, ymin, xmax, ymax))
            owner.append(ip)
        else:
            boxes.append((xmin, ymin, xmax, ymax))
            owner.append(ip)
    return np.asarray(boxes, dtype=np.float64), np.asarray(owner, dtype=np.int64)


def prep_polygons_strtree(polyset: PolygonSet):
    """Broadcastable join state with an STR-packed bbox tree prefilter
    (the reference's R-tree analogue, state/strtree.py) instead of the
    cell cover — useful when the polygon layer is queried without a cell
    assignment or at many zooms."""
    from ..state.strtree import STRtree

    boxes, owner = _strtree_boxes(polyset)
    return ray.put({"polys": polyset, "tree": STRtree(boxes),
                    "box_owner": owner})


class PolyJoinerSTR:
    """PIP join stage probing an STRtree prefilter (bbox candidates ->
    exact winding/polar test). Same results as the cell-cover joiner."""

    def __init__(self, prep_ref, mode: str = "inner"):
        prep = ray.get(prep_ref) if isinstance(prep_ref, ray.ObjectRef) else prep_ref
        self.polys: PolygonSet = prep["polys"]
        self.tree = prep["tree"]
        self.box_owner = prep["box_owner"]
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        pt_idx, box_idx = self.tree.query_points(
            np.where(ok, lon, 1e9), np.where(ok, lat, 1e9))
        poly_idx = self.box_owner[box_idx]
        # a dateline poly contributes two boxes; dedup (point, poly)
        if len(pt_idx):
            key = pt_idx * (len(self.polys) + 1) + poly_idx
            _, ui = np.unique(key, return_index=True)
            pt_idx, poly_idx = pt_idx[ui], poly_idx[ui]

        hit_point = []
        hit_poly = []
        if len(pt_idx):
            order = np.argsort(poly_idx, kind="stable")
            pt_s, pl_s = pt_idx[order], poly_idx[order]
            uniq, starts_u = np.unique(pl_s, return_index=True)
            bounds = np.append(starts_u, len(pl_s))
            for k, ip in enumerate(uniq):
                idx = pt_s[bounds[k]:bounds[k + 1]]
                mask = self.polys.contains(lon[idx], lat[idx], int(ip))
                if mask.any():
                    hit_point.append(idx[mask])
                    hit_poly.append(np.full(int(mask.sum()), ip, dtype=np.int64))
        if hit_point:
            pts = np.concatenate(hit_point)
            pls = np.concatenate(hit_poly)
            o = np.lexsort((pls, pts))
            pts, pls = pts[o], pls[o]
        else:
            pts = np.empty(0, dtype=np.int64)
            pls = np.empty(0, dtype=np.int64)
        out = batch.take(pa.array(pts, pa.int64()))
        out = out.append_column(
            "poly_id", pa.array(self.polys.poly_id[pls], pa.int64()))
        names = pa.array(list(self.polys.name), pa.string())
        return out.append_column(
            "poly_name", names.take(pa.array(pls, pa.int64())))


def pip_join_strtree(points_ds, polyset: PolygonSet, *,
                     concurrency=None, batch_size: int = 8192):
    """PIP join via the STRtree prefilter. Default is task-based
    map_batches with a per-worker joiner cache (no actor-pool spin-up
    lag, see _JOINER_CACHE); pass ``concurrency`` to force a pool."""
    prep_ref = prep_polygons_strtree(polyset)
    if concurrency is not None:
        return points_ds.map_batches(
            PolyJoinerSTR,
            fn_constructor_kwargs={"prep_ref": prep_ref},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, zero_copy_batch=True)

    def fn(batch: pa.Table) -> pa.Table:
        key = (prep_ref.hex() if hasattr(prep_ref, "hex")
               else id(prep_ref), "strtree")
        joiner = _JOINER_CACHE.get(key)
        if joiner is None:
            joiner = PolyJoinerSTR(prep_ref)
            _JOINER_CACHE.clear()
            _JOINER_CACHE[key] = joiner
        return joiner(batch)

    return points_ds.map_batches(fn, batch_format="pyarrow",
                                 batch_size=batch_size,
                                 zero_copy_batch=True)


def prep_polygons(polyset: PolygonSet, zoom: int = DEFAULT_ZOOM):
    """Build the broadcastable join state and put it in the object store.

    The cell -> candidate-polygons cover map is flattened to three sorted
    numpy arrays (cells, offsets, flat poly indices) so batch lookup is a
    single vectorized searchsorted instead of per-cell dict probes.

    Returns an ObjectRef; pass it (not the value) to PolyJoiner so each
    actor reads the same immutable copy zero-copy from shared memory
    instead of re-shipping it per task.
    """
    cover = polyset.cell_cover(zoom)
    cells = np.fromiter(sorted(cover), dtype=np.int64, count=len(cover))
    off = np.zeros(len(cells) + 1, dtype=np.int64)
    flat = []
    for i, c in enumerate(cells):
        flat.append(cover[int(c)])
        off[i + 1] = off[i] + len(cover[int(c)])
    flat = np.concatenate(flat) if flat else np.empty(0, dtype=np.int64)
    return ray.put({"polys": polyset, "cover_cells": cells,
                    "cover_off": off, "cover_flat": flat, "zoom": zoom})


class PolyJoiner:
    """Actor-pool stage: inner/semi point-in-polygon join.

    Parameters
    ----------
    prep_ref : ObjectRef from :func:`prep_polygons`
    mode : "inner"  -> one output row per (point, containing polygon)
           "semi"   -> input row passes through iff contained by >= 1
                       polygon (karta ``within_polygon`` subset semantics)
           "tag"    -> all rows pass through with poly_id (-1 if none;
                       first match by polygon order, for aggregation)
    """

    def __init__(self, prep_ref, mode: str = "inner",
                 cell_col: str = "cell_id", with_name: bool = True):
        prep = ray.get(prep_ref) if isinstance(prep_ref, ray.ObjectRef) else prep_ref
        self.polys: PolygonSet = prep["polys"]
        self.cover_cells: np.ndarray = prep["cover_cells"]
        self.cover_off: np.ndarray = prep["cover_off"]
        self.cover_flat: np.ndarray = prep["cover_flat"]
        self.zoom: int = prep["zoom"]
        self.mode = mode
        self.cell_col = cell_col
        self.with_name = with_name
        # vectorized poly_name lookup (take on a prebuilt arrow array,
        # not a per-output-row Python list comprehension)
        self.name_arr = pa.array(list(self.polys.name), pa.string())

    def _candidates(self, cells: np.ndarray):
        """Vectorized cell -> candidate pairs: (point_idx, poly_idx)."""
        n = len(cells)
        if len(self.cover_cells) == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        pos = np.searchsorted(self.cover_cells, cells)
        pos_c = np.minimum(pos, len(self.cover_cells) - 1)
        match = self.cover_cells[pos_c] == cells
        starts = self.cover_off[pos_c]
        counts = np.where(match, self.cover_off[pos_c + 1] - starts, 0)
        total = int(counts.sum())
        if total == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        pt_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        cum = np.cumsum(counts) - counts
        flat_pos = (np.arange(total, dtype=np.int64)
                    - np.repeat(cum, counts) + np.repeat(starts, counts))
        return pt_idx, self.cover_flat[flat_pos]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cells = batch.column(self.cell_col).to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        n = len(cells)

        pt_idx, poly_idx = self._candidates(cells)
        hit_point: list = []
        hit_poly: list = []
        if len(pt_idx):
            # exact test per distinct candidate polygon over its points
            order = np.argsort(poly_idx, kind="stable")
            pt_s, pl_s = pt_idx[order], poly_idx[order]
            uniq, starts_u = np.unique(pl_s, return_index=True)
            bounds = np.append(starts_u, len(pl_s))
            for k, ip in enumerate(uniq):
                idx = pt_s[bounds[k]:bounds[k + 1]]
                mask = self.polys.contains(lon[idx], lat[idx], int(ip))
                if mask.any():
                    hit_point.append(idx[mask])
                    hit_poly.append(np.full(int(mask.sum()), ip, dtype=np.int64))

        if hit_point:
            pts = np.concatenate(hit_point)
            pls = np.concatenate(hit_poly)
        else:
            pts = np.empty(0, dtype=np.int64)
            pls = np.empty(0, dtype=np.int64)

        if self.mode == "semi":
            keep = np.unique(pts)
            return batch.take(pa.array(keep, pa.int64()))

        if self.mode == "tag":
            tag = np.full(n, -1, dtype=np.int64)
            # first match by polygon order: process high->low so low wins
            for ip in sorted(set(pls.tolist()), reverse=True):
                tag[pts[pls == ip]] = self.polys.poly_id[ip]
            return batch.append_column("poly_id", pa.array(tag, pa.int64()))

        # inner: sort pairs by (point order, poly order) for determinism
        if len(pts):
            o = np.lexsort((pls, pts))
            pts, pls = pts[o], pls[o]
        out = batch.take(pa.array(pts, pa.int64()))
        out = out.append_column(
            "poly_id", pa.array(self.polys.poly_id[pls], pa.int64()))
        if not self.with_name:
            return out
        return out.append_column(
            "poly_name", self.name_arr.take(pa.array(pls, pa.int64())))


# per-worker-process cache of constructed joiners: Ray reuses worker
# processes across tasks, so a task-based join stage gets actor-like
# state amortization (build once per worker) with elastic task
# scheduling (no actor-pool spin-up / autoscaling lag).
_JOINER_CACHE: dict = {}


def _join_batch(batch: pa.Table, *, prep_ref, mode: str,
                cell_col: str, with_name: bool = True) -> pa.Table:
    key = (prep_ref.hex() if hasattr(prep_ref, "hex") else id(prep_ref),
           mode, cell_col, with_name)
    joiner = _JOINER_CACHE.get(key)
    if joiner is None:
        joiner = PolyJoiner(prep_ref, mode=mode, cell_col=cell_col,
                            with_name=with_name)
        _JOINER_CACHE.clear()  # at most one live polygon layer per worker
        _JOINER_CACHE[key] = joiner
    return joiner(batch)


# batch_size=8192 deliberately breaks read->map fusion: the parquet read
# then pipelines with the compute chain across the streaming executor
# instead of serializing I/O and compute inside one fused task (measured
# ~1.5x faster end-to-end on the 4M-page bench).
def pip_join(points_ds, polyset: PolygonSet, *, zoom: int = DEFAULT_ZOOM,
             mode: str = "inner", concurrency=None, batch_size: int = 8192,
             cell_col: str = "cell_id", with_name: bool = True):
    """points Dataset (with lon/lat/cell_id columns) x PolygonSet ->
    joined Dataset.

    The polygon state is broadcast once with ray.put and read zero-copy
    in every task; the constructed joiner is cached per worker process
    (see _JOINER_CACHE). Pass ``concurrency`` to force an actor pool
    instead (useful when the prep is expensive enough to pin workers)."""
    prep_ref = prep_polygons(polyset, zoom)
    kwargs = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        fn_kwargs={"prep_ref": prep_ref, "mode": mode, "cell_col": cell_col,
                   "with_name": with_name},
    )
    if concurrency is not None and not isinstance(concurrency, (tuple, list)):
        kwargs["concurrency"] = concurrency
    return points_ds.map_batches(_join_batch, **kwargs)
