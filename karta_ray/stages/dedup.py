"""Deduplication stages: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Shapes (all Ray-Data-native):
- exact:        groupby(key) -> representative + count (real shuffle;
                unbounded key cardinality).
- ngram-jaccard: shingle -> (shingle, doc, size) rows -> groupby(shingle)
                pair emission -> tree-combined pair counts -> threshold.
                Exact but inherently quadratic in bucket sizes; for
                web-scale corpora cap bucket sizes or use MinHash LSH.
- minhash-lsh:  per-doc signature -> band bucket rows -> groupby(bucket)
                candidate pairs -> signature-estimated similarity filter.
- simhash:      64-bit signature -> 4x16-bit block buckets -> candidate
                pairs -> exact Hamming distance filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import text as T
from .agg import tree_sum


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact)
# ---------------------------------------------------------------------------

def shingle_rows(batch: pa.Table, *, id_col: str, text_col: str,
                 n: int = 3) -> pa.Table:
    """Per document: distinct hashed n-grams -> rows (sh, doc_id)."""
    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    sh_all = []
    id_all = []
    for i, t in enumerate(texts):
        sh = T.char_shingles(t, n)
        sh_all.append(sh.astype(np.int64))
        id_all.append(np.full(len(sh), ids[i], dtype=np.int64))
    return pa.table({
        "sh": pa.array(np.concatenate(sh_all) if sh_all else []),
        "doc_id": pa.array(np.concatenate(id_all) if id_all else []),
    })


def _emit_pairs_and_sizes(max_df: int):
    def fn(group: pa.Table) -> pa.Table:
        """Per shingle bucket: drop the bucket if its document frequency
        exceeds max_df; otherwise emit candidate pairs (doc_a < doc_b)
        plus one size-contribution sentinel row (doc, -1) per member, so
        pair counts and post-filter set sizes come out of ONE shuffle."""
        ids = np.sort(group.column("doc_id").to_numpy())
        m = len(ids)
        if m > max_df or m == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(m, 1)
        da = np.concatenate([ids[ai], ids])
        db = np.concatenate([ids[bi], np.full(m, -1, dtype=np.int64)])
        return pa.table({
            "doc_a": pa.array(da, pa.int64()),
            "doc_b": pa.array(db, pa.int64()),
            "n": pa.array(np.ones(len(da), dtype=np.int64)),
        })
    return fn


def ngram_jaccard_pairs(docs_ds, *, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.7, max_df: int = 50):
    """Doc pairs with exact n-gram Jaccard >= threshold, computed over
    the *rare* shingles (document frequency <= max_df).

    The DF cap is what keeps this op sub-quadratic: a shingle present in
    F docs emits F^2/2 candidate pairs, so ubiquitous shingles ("e t",
    " th") would produce billions of pairs at corpus scale while
    carrying no near-dup signal. Near-identical documents still share
    their rare shingles, and both the engine and the SQL oracle apply
    the identical cap, so parity is exact.

    Returns Dataset (doc_a, doc_b, n_shared).
    """
    import ray

    rows = docs_ds.map_batches(shingle_rows, batch_format="pyarrow",
                               fn_kwargs={"id_col": id_col,
                                          "text_col": text_col, "n": n})
    emitted = rows.groupby("sh").map_groups(_emit_pairs_and_sizes(max_df),
                                            batch_format="pyarrow")
    counts = tree_sum(emitted, ["doc_a", "doc_b"], ["n"]).materialize()

    sizes_df = counts.filter(lambda r: r["doc_b"] == -1).to_pandas()
    if "doc_a" in sizes_df.columns:
        sizes_map = dict(zip(sizes_df["doc_a"].to_numpy(),
                             sizes_df["n"].to_numpy()))
    else:  # low-entropy corpus: no shingle under the DF cap
        sizes_map = {}
    sizes_ref = ray.put(sizes_map)

    def threshold_filter(batch: pa.Table, *, sizes_ref=sizes_ref) -> pa.Table:
        sizes = ray.get(sizes_ref) if isinstance(sizes_ref, ray.ObjectRef) \
            else sizes_ref
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        c = batch.column("n").to_numpy().astype(np.float64)
        real = db >= 0
        na = np.array([sizes.get(d, 0) for d in da], dtype=np.float64)
        nb = np.array([sizes.get(d, 0) for d in db], dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            j = c / (na + nb - c)
        keep = np.nonzero(real & (j >= threshold))[0]
        out = batch.take(pa.array(keep, pa.int64()))
        return out.rename_columns(["doc_a", "doc_b", "n_shared"])

    return counts.map_batches(threshold_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate, the web-scale path)
# ---------------------------------------------------------------------------

def minhash_rows(batch: pa.Table, *, id_col: str, text_col: str,
                 k: int = 128, bands: int = 16, n: int = 3) -> pa.Table:
    """Per doc: signature -> one row per LSH band
    (band, key, doc_id, sig as fixed list)."""
    rows = k // bands
    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    band_l = []
    key_l = []
    id_l = []
    sig_l = []
    for i, t in enumerate(texts):
        sig = T.minhash_signature(T.char_shingles(t, n), k)
        keys = T.band_keys(sig, bands, rows)
        band_l.append(np.arange(bands, dtype=np.int64))
        key_l.append(keys.astype(np.int64))
        id_l.append(np.full(bands, ids[i], dtype=np.int64))
        sig_l.extend([sig.astype(np.int64)] * bands)
    return pa.table({
        "band": pa.array(np.concatenate(band_l) if band_l else []),
        "key": pa.array(np.concatenate(key_l) if key_l else []),
        "doc_id": pa.array(np.concatenate(id_l) if id_l else []),
        "sig": pa.array([s.tolist() for s in sig_l],
                        pa.list_(pa.int64(), 128 if not sig_l else len(sig_l[0]))),
    })


LSH_MAX_BUCKET = 200


def _lsh_pairs(group: pa.Table) -> pa.Table:
    if group.num_rows > LSH_MAX_BUCKET:
        # oversized bucket: a band key shared by this many documents is
        # not a near-dup signal (hash pileup); skip — standard LSH
        # bucket-size cap, keeps the stage sub-quadratic
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "est_sim": pa.array([], pa.float64())})
    ids = group.column("doc_id").to_numpy()
    sigs = np.asarray(group.column("sig").to_pylist(), dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    sigs = sigs[order]
    m = len(ids)
    if m < 2:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "est_sim": pa.array([], pa.float64())})
    ai, bi = np.triu_indices(m, 1)
    est = (sigs[ai] == sigs[bi]).mean(axis=1)
    keep = ids[ai] != ids[bi]
    return pa.table({
        "doc_a": pa.array(ids[ai][keep], pa.int64()),
        "doc_b": pa.array(ids[bi][keep], pa.int64()),
        "est_sim": pa.array(est[keep], pa.float64()),
    })


def minhash_lsh_pairs(docs_ds, *, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 128,
                      bands: int = 16, threshold: float = 0.6):
    """Near-dup candidate pairs via MinHash banding; similarity is
    estimated from full-signature agreement; deduplicated across bands
    by a groupby on the pair."""
    rows = docs_ds.map_batches(minhash_rows, batch_format="pyarrow",
                               fn_kwargs={"id_col": id_col,
                                          "text_col": text_col,
                                          "k": k, "bands": bands})
    pairs = rows.groupby(["band", "key"]).map_groups(
        _lsh_pairs, batch_format="pyarrow")

    def thresh(batch: pa.Table) -> pa.Table:
        keep = np.nonzero(batch.column("est_sim").to_numpy() >= threshold)[0]
        return batch.take(pa.array(keep, pa.int64()))

    cand = pairs.map_batches(thresh, batch_format="pyarrow")
    # dedup identical pairs found in multiple bands (tree combine, max)
    from .agg import tree_agg

    return tree_agg(cand, ["doc_a", "doc_b"], [("est_sim", "max")])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_rows(batch: pa.Table, *, id_col: str, text_col: str) -> pa.Table:
    """Per doc: 64-bit SimHash over token hashes -> 4 x 16-bit block
    bucket rows."""
    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    block_l = []
    key_l = []
    id_l = []
    sig_l = []
    for i, t in enumerate(texts):
        toks = [w.encode() for w in t.split()]
        sig = T.simhash64(T.hash_bytes_u64(toks)) if toks else np.uint64(0)
        blocks = [(int(sig) >> (16 * b)) & 0xFFFF for b in range(4)]
        block_l.extend(range(4))
        key_l.extend(blocks)
        id_l.extend([int(ids[i])] * 4)
        sig_l.extend([np.int64(np.uint64(sig).astype(np.int64))] * 4)
    return pa.table({
        "block": pa.array(block_l, pa.int64()),
        "key": pa.array(key_l, pa.int64()),
        "doc_id": pa.array(id_l, pa.int64()),
        "sig": pa.array(sig_l, pa.int64()),
    })


SIMHASH_MAX_BUCKET = 500


def _simhash_pairs(max_hamming: int):
    def fn(group: pa.Table) -> pa.Table:
        if group.num_rows > SIMHASH_MAX_BUCKET:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        ids = group.column("doc_id").to_numpy()
        sigs = group.column("sig").to_numpy().astype(np.int64).view(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        sigs = sigs[order]
        m = len(ids)
        if m < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(m, 1)
        h = T.hamming64(sigs[ai], sigs[bi])
        keep = (h <= max_hamming) & (ids[ai] != ids[bi])
        return pa.table({
            "doc_a": pa.array(ids[ai][keep], pa.int64()),
            "doc_b": pa.array(ids[bi][keep], pa.int64()),
            "hamming": pa.array(h[keep], pa.int64()),
        })
    return fn


def simhash_pairs(docs_ds, *, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3):
    """Near-dup pairs with SimHash Hamming distance <= max_hamming;
    16-bit block bucketing guarantees recall for max_hamming <= 3
    (pigeonhole over 4 blocks)."""
    rows = docs_ds.map_batches(simhash_rows, batch_format="pyarrow",
                               fn_kwargs={"id_col": id_col,
                                          "text_col": text_col})
    pairs = rows.groupby(["block", "key"]).map_groups(
        _simhash_pairs(max_hamming), batch_format="pyarrow")
    from .agg import tree_agg

    return tree_agg(pairs, ["doc_a", "doc_b"], [("hamming", "min")])
