"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: exact brute-force cosine top-k — per-batch numpy matmul
  against a broadcast query matrix, per-batch pruning, tree-combined
  global top-k. The baseline the approximate variants are judged
  against.
- ``ann_ivf_topk``: IVF-style variant — probe only the ``nprobe``
  clusters whose centroids are nearest each query (approximate; the
  100-TB path where scanning every vector is off the table).
- ``cosine_neardup_pairs``: all pairs with cosine >= threshold, exact,
  via blocked matmul of each batch against the broadcast full matrix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _to_matrix(col) -> np.ndarray:
    from ..functions.arrays import list_column_to_matrix

    return list_column_to_matrix(col, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


class _TopkScorer:
    """map_batches stage: per-batch cosine scores vs all queries, pruned
    to local top-k rows per query."""

    def __init__(self, queries_ref, k: int, exclude_self: bool):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q["qids"]
        self.qmat = q["qmat"]  # normalized (nq, d)
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy()
        emb = _normalize(_to_matrix(batch.column("embedding")))
        sims = self.qmat @ emb.T  # (nq, nb)
        out_q = []
        out_v = []
        out_s = []
        for qi in range(len(self.qids)):
            s = sims[qi]
            mask = np.ones(len(vid), dtype=bool)
            if self.exclude_self:
                mask &= vid != self.qids[qi]
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            top = idx[np.argsort(-s[idx], kind="stable")[:self.k]]
            out_q.append(np.full(len(top), self.qids[qi], dtype=np.int64))
            out_v.append(vid[top].astype(np.int64))
            out_s.append(s[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        })


def _final_topk(k: int):
    def fn(batch: pa.Table) -> pa.Table:
        q = batch.column("query_id").to_numpy()
        v = batch.column("vec_id").to_numpy()
        s = batch.column("sim").to_numpy()
        out_idx = []
        out_rank = []
        for qi in np.unique(q):
            rows = np.nonzero(q == qi)[0]
            # deterministic: sim desc, then vec_id asc
            order = rows[np.lexsort((v[rows], -s[rows]))][:k]
            out_idx.append(order)
            out_rank.append(np.arange(1, len(order) + 1, dtype=np.int64))
        idx = np.concatenate(out_idx)
        out = batch.take(pa.array(idx, pa.int64()))
        return out.append_column("rank", pa.array(np.concatenate(out_rank)))
    return fn


def ann_topk(emb_ds, query_ids, query_mat, k: int = 10, *,
             exclude_self: bool = True):
    """Exact cosine top-k of every query vs the embedding Dataset.

    Returns (query_id, vec_id, sim, rank). Scale: batches stream through
    the scorer; only nq*k rows per batch survive to the final combine.
    """
    q = {"qids": np.asarray(query_ids, dtype=np.int64),
         "qmat": _normalize(np.asarray(query_mat, dtype=np.float64))}
    ref = ray.put(q)
    cache: dict = {}

    def score(batch: pa.Table) -> pa.Table:
        s = cache.get("s")
        if s is None:
            s = _TopkScorer(ref, k, exclude_self)
            cache["s"] = s
        return s(batch)

    part = emb_ds.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)
    return part.repartition(1).map_batches(_final_topk(k),
                                           batch_format="pyarrow")


def ann_ivf_topk(emb_ds, query_ids, query_mat, k: int = 10, *,
                 label_col: str = "label", nprobe: int | None = 3,
                 exclude_self: bool = True):
    """IVF variant (``nprobe=None`` probes every cluster — the
    exact-mode twin, result identical to brute-force top-k):
    compute per-cluster centroids (one small pass), then
    score each query only against its ``nprobe`` nearest clusters."""
    def partial_centroids(batch: pa.Table) -> pa.Table:
        lab = batch.column(label_col).to_numpy()
        emb = _to_matrix(batch.column("embedding"))
        out = []
        for l in np.unique(lab):
            m = lab == l
            out.append((int(l), emb[m].sum(axis=0), int(m.sum())))
        return pa.table({
            "label": pa.array([o[0] for o in out], pa.int64()),
            "vsum": pa.array([o[1].tolist() for o in out]),
            "n": pa.array([o[2] for o in out], pa.int64()),
        })

    parts = emb_ds.map_batches(partial_centroids,
                               batch_format="pyarrow").take_all()
    sums: dict = {}
    counts: dict = {}
    for row in parts:
        l = row["label"]
        sums[l] = sums.get(l, 0) + np.asarray(row["vsum"])
        counts[l] = counts.get(l, 0) + row["n"]
    labels = sorted(sums)
    cent = _normalize(np.stack([sums[l] / counts[l] for l in labels]))

    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    probe_labels = [{labels[j] for j in row} for row in probe]

    q = {"qids": np.asarray(query_ids, dtype=np.int64), "qmat": qmat}
    ref = ray.put({"q": q, "probe": probe_labels})

    class Scorer(_TopkScorer):
        def __init__(self, ref, k, exclude_self):
            data = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            super().__init__(data["q"], k, exclude_self)
            self.probe = data["probe"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            # Queries are grouped by their probed label SET, so the
            # row-membership mask is built once per distinct set (not
            # once per query), and the cosine scores come from ONE
            # matmul of all queries vs the batch — per-batch cost is
            # O(nq*nb + distinct_sets*nb), flat in query count for
            # query workloads that share probe sets.
            lab = batch.column(label_col).to_numpy()
            vid = batch.column("vec_id").to_numpy()
            emb = _normalize(_to_matrix(batch.column("embedding")))
            groups: dict = {}
            for qi, ls in enumerate(self.probe):
                groups.setdefault(frozenset(ls), []).append(qi)
            sims = None
            out_q, out_v, out_s = [], [], []
            for ls, qis in groups.items():
                mask = np.isin(lab, np.fromiter(ls, dtype=np.int64,
                                                count=len(ls)))
                if not mask.any():
                    continue
                if sims is None:
                    sims = self.qmat @ emb.T
                idx = np.nonzero(mask)[0]
                svid = vid[idx]
                for qi in qis:
                    s = sims[qi, idx]
                    if self.exclude_self:
                        keep = np.nonzero(svid != self.qids[qi])[0]
                    else:
                        keep = np.arange(len(svid))
                    if len(keep) == 0:
                        continue
                    # same selection rule as _TopkScorer (stable sort in
                    # batch order) so results are bit-identical to the
                    # per-query formulation
                    top = keep[np.argsort(-s[keep],
                                          kind="stable")[:self.k]]
                    out_q.append(np.full(len(top), self.qids[qi],
                                         dtype=np.int64))
                    out_v.append(svid[top].astype(np.int64))
                    out_s.append(s[top])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            })

    cache: dict = {}

    def score(batch: pa.Table) -> pa.Table:
        s = cache.get("s")
        if s is None:
            s = Scorer(ref, k, exclude_self)
            cache["s"] = s
        return s(batch)

    part = emb_ds.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)
    return part.repartition(1).map_batches(_final_topk(k),
                                           batch_format="pyarrow")


def _hyperplanes(dim: int, bits: int) -> np.ndarray:
    rng = np.random.RandomState(7)
    return rng.randn(bits, dim)


def cosine_neardup_lsh(emb_ds, threshold: float, *, bits: int = 32,
                       bands: int = 4, max_bucket: int = 512):
    """Near-duplicate pairs via random-hyperplane LSH — the no-broadcast
    scale path: signature -> band buckets -> within-bucket exact cosine.

    Approximate (recall < 1 for moderate thresholds; near-certain for
    true near-dups with cos >~ 0.95). Exact verification inside buckets,
    dedup across bands with a tree combine.
    """
    rows_per_band = bits // bands
    state = {"planes": None}  # lazily sized to the embedding dim per worker

    def sig_rows(batch: pa.Table) -> pa.Table:
        from ..functions.arrays import matrix_to_list_column

        emb = _normalize(_to_matrix(batch.column("embedding")))
        if state["planes"] is None or state["planes"].shape[1] != emb.shape[1]:
            state["planes"] = _hyperplanes(emb.shape[1], bits)
        bitsm = (emb @ state["planes"].T) > 0  # (n, bits)
        vid = batch.column("vec_id").to_numpy().astype(np.int64)
        out_band = []
        out_key = []
        out_id = []
        for b in range(bands):
            chunk = bitsm[:, b * rows_per_band:(b + 1) * rows_per_band]
            key = (chunk.astype(np.int64)
                   << np.arange(rows_per_band, dtype=np.int64)).sum(axis=1)
            out_band.append(np.full(len(vid), b, dtype=np.int64))
            out_key.append(key)
            out_id.append(vid)
        return pa.table({
            "band": pa.array(np.concatenate(out_band)),
            "key": pa.array(np.concatenate(out_key)),
            "vec_id": pa.array(np.concatenate(out_id)),
            "embedding": matrix_to_list_column(np.tile(emb, (bands, 1))),
        })

    rows = emb_ds.map_batches(sig_rows, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"vec_a": pa.array([], pa.int64()),
                          "vec_b": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if group.num_rows < 2 or group.num_rows > max_bucket:
            return empty
        vid = group.column("vec_id").to_numpy()
        emb = _to_matrix(group.column("embedding"))
        order = np.argsort(vid, kind="stable")
        vid, emb = vid[order], emb[order]
        sims = emb @ emb.T
        ai, bi = np.triu_indices(len(vid), 1)
        keep = (sims[ai, bi] >= threshold) & (vid[ai] != vid[bi])
        return pa.table({
            "vec_a": pa.array(vid[ai][keep], pa.int64()),
            "vec_b": pa.array(vid[bi][keep], pa.int64()),
            "sim": pa.array(sims[ai, bi][keep], pa.float64()),
        })

    pairs = rows.groupby(["band", "key"]).map_groups(bucket_pairs,
                                                     batch_format="pyarrow")
    from .agg import tree_agg

    return tree_agg(pairs, ["vec_a", "vec_b"], [("sim", "max")])


def cosine_neardup_blocked(emb_ds, threshold: float, *, nblocks: int = 8):
    """Exact all-pairs cosine >= threshold with NO broadcast side and no
    driver materialization — the distributed "triangle join":

    every vector hashes to one of ``nblocks`` blocks and is replicated
    to the ``nblocks`` block-pair buckets it participates in; each
    bucket (i, j) receives exactly the vectors of blocks i and j and
    scores its cross product (i == j scores the in-block triangle), so
    every unordered pair is scored in exactly one bucket. Replication
    factor is ``nblocks`` (choose ~sqrt(cluster parallelism)); total
    compute remains the inherent O(N^2/2) of an exact all-pairs scan.

    Results are identical to the broadcast variant: same normalized
    float64 dot products, same threshold rule, (vec_a < vec_b) pairs.
    """
    from ..functions.arrays import matrix_to_list_column

    def expand(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy().astype(np.int64)
        emb = _normalize(_to_matrix(batch.column("embedding")))
        blk = (vid * np.int64(2654435761)) % nblocks  # deterministic
        lo = np.minimum(blk[:, None], np.arange(nblocks)[None, :])
        hi = np.maximum(blk[:, None], np.arange(nblocks)[None, :])
        bucket = (lo * nblocks + hi).ravel()
        rep = np.repeat(emb, nblocks, axis=0) if len(vid) else \
            np.empty((0, 0))
        # VARIABLE list type so empty batches (d unknown) produce the
        # same schema as populated ones
        d = rep.shape[1] if rep.size else 0
        flat = pa.array(np.ascontiguousarray(rep).ravel(), pa.float64())
        offsets = pa.array(
            np.arange(0, (len(rep) + 1) * d, d, dtype=np.int32)
            if d else np.zeros(len(rep) + 1, dtype=np.int32), pa.int32())
        return pa.table({
            "bucket": pa.array(bucket, pa.int64()),
            "blk": pa.array(np.repeat(blk, nblocks), pa.int64()),
            "vec_id": pa.array(np.repeat(vid, nblocks), pa.int64()),
            "embedding": pa.ListArray.from_arrays(offsets, flat),
        })

    rows = emb_ds.map_batches(expand, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"vec_a": pa.array([], pa.int64()),
                          "vec_b": pa.array([], pa.int64())})
        if group.num_rows < 2:
            return empty
        bucket = int(group.column("bucket")[0].as_py())
        lo, hi = bucket // nblocks, bucket % nblocks
        vid = group.column("vec_id").to_numpy()
        blk = group.column("blk").to_numpy()
        emb = _to_matrix(group.column("embedding"))
        if lo == hi:
            order = np.argsort(vid, kind="stable")
            vid, emb = vid[order], emb[order]
            sims = emb @ emb.T
            ai, bi = np.triu_indices(len(vid), 1)
            keep = sims[ai, bi] >= threshold
            a, b = vid[ai][keep], vid[bi][keep]
        else:
            ml = blk == lo
            va, ea = vid[ml], emb[ml]
            vb, eb = vid[~ml], emb[~ml]
            if not len(va) or not len(vb):
                return empty
            sims = ea @ eb.T
            ii, jj = np.nonzero(sims >= threshold)
            a, b = va[ii], vb[jj]
            a, b = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"vec_a": pa.array(a, pa.int64()),
                         "vec_b": pa.array(b, pa.int64())})

    return rows.groupby("bucket").map_groups(bucket_pairs,
                                             batch_format="pyarrow")


def cosine_neardup_pairs(emb_ds, full_ids, full_mat, threshold: float):
    """Exact all-pairs cosine >= threshold: each batch multiplies against
    the broadcast full (normalized) matrix; emit (a < b) pairs."""
    ref = ray.put({"ids": np.asarray(full_ids, dtype=np.int64),
                   "mat": _normalize(np.asarray(full_mat, dtype=np.float64))})

    def score(batch: pa.Table, *, ref=ref, threshold=threshold) -> pa.Table:
        data = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        vid = batch.column("vec_id").to_numpy().astype(np.int64)
        emb = _normalize(_to_matrix(batch.column("embedding")))
        sims = emb @ data["mat"].T  # (nb, N)
        bi, fj = np.nonzero(sims >= threshold)
        a = vid[bi]
        b = data["ids"][fj]
        keep = a < b
        return pa.table({
            "vec_a": pa.array(a[keep], pa.int64()),
            "vec_b": pa.array(b[keep], pa.int64()),
        })

    return emb_ds.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)
