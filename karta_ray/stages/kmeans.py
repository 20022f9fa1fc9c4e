"""Distributed k-means (Lloyd's) over an embedding Dataset.

The scale shape: centroids broadcast per iteration (k x d floats — tiny
relative to data), assignment + per-centroid partial (sum, count)
computed inside map_batches, partials combined driver-side (bounded:
k x n_blocks rows, the same bounded-cardinality pattern as the IVF
centroid pass, stages/ann.py). Data streams through each iteration; no
full materialization of the vectors.

Used to build real IVF cluster assignments (`ann_ivf_topk` probes the
nprobe nearest centroids) when the corpus has no precomputed labels.

Deterministic: seeds are the k vectors with the smallest ids, and all
arithmetic is fixed-order per block layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _assign(emb: np.ndarray, cent: np.ndarray) -> np.ndarray:
    # squared L2 via the expansion; cent is (k, d)
    d2 = (np.sum(emb * emb, axis=1)[:, None]
          - 2.0 * emb @ cent.T + np.sum(cent * cent, axis=1)[None, :])
    return np.argmin(d2, axis=1)


def kmeans_seeds(emb_ds, k: int, *, emb_col: str = "embedding",
                 id_col: str = "vec_id") -> np.ndarray:
    """Deterministic seed centroids: the k vectors with the smallest
    ids (sort -> limit, a distributed top-k, not a full collect)."""
    from ..functions.arrays import list_column_to_matrix

    seeds = emb_ds.sort(id_col).limit(k).take_batch(k, batch_format="pyarrow")
    return list_column_to_matrix(seeds[emb_col])


def kmeans_fit(emb_ds, k: int, *, iters: int = 10,
               emb_col: str = "embedding", id_col: str = "vec_id"):
    """Lloyd's iterations over the Dataset; returns (k, d) centroids."""
    from ..functions.arrays import list_column_to_matrix

    cent = kmeans_seeds(emb_ds, k, emb_col=emb_col, id_col=id_col)
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table, *, ref=ref) -> pa.Table:
            c = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            emb = list_column_to_matrix(batch.column(emb_col))
            lab = _assign(emb, c)
            rows_l = []
            rows_s = []
            rows_n = []
            for li in np.unique(lab):
                m = lab == li
                rows_l.append(int(li))
                rows_s.append(emb[m].sum(axis=0).tobytes())
                rows_n.append(int(m.sum()))
            return pa.table({
                "label": pa.array(rows_l, pa.int64()),
                "vsum": pa.array(rows_s, pa.binary()),
                "n": pa.array(rows_n, pa.int64()),
            })

        parts = emb_ds.map_batches(partial,
                                   batch_format="pyarrow").take_all()
        d = cent.shape[1]
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        # deterministic combine order: sort partials by label
        for row in sorted(parts, key=lambda r: r["label"]):
            sums[row["label"]] += np.frombuffer(row["vsum"],
                                                dtype=np.float64)
            counts[row["label"]] += row["n"]
        nonzero = counts > 0
        new = cent.copy()
        new[nonzero] = sums[nonzero] / counts[nonzero, None]
        if np.allclose(new, cent, rtol=0.0, atol=1e-12):
            cent = new
            break
        cent = new
    return cent


def kmeans_predict(emb_ds, centroids: np.ndarray, *,
                   emb_col: str = "embedding"):
    """Append a ``label`` column (nearest centroid) to every row."""
    from ..functions.arrays import list_column_to_matrix

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table, *, ref=ref) -> pa.Table:
        c = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        emb = list_column_to_matrix(batch.column(emb_col))
        lab = _assign(emb, c)
        # replace any pre-existing label column
        if "label" in batch.column_names:
            batch = batch.drop_columns(["label"])
        return batch.append_column("label",
                                   pa.array(lab.astype(np.int64)))

    return emb_ds.map_batches(fn, batch_format="pyarrow",
                              zero_copy_batch=True)
