"""Distributed cardinality sketch: HyperLogLog.

The reference has no approximate aggregates (SURVEY.md §2.5); at 10^12
rows an exact distinct-count of urls is a full shuffle, while an HLL
register array is a tiny, mergeable partial — the canonical
partial+combine aggregate. Standard HLL (Flajolet et al. 2007) with the
usual small/large-range corrections; register merge = elementwise max.
"""

from __future__ import annotations

import numpy as np

_P_DEFAULT = 12  # 4096 registers, ~1.6% standard error


def hll_create(p: int = _P_DEFAULT) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(registers: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold 64-bit hashes into the register array (vectorized)."""
    p = int(np.log2(len(registers)))
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = leading zeros of the remaining bits + 1
    lz = np.zeros(len(h), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    found = np.zeros(len(h), dtype=bool)
    for i in range(64 - p + 1):
        hit = (~found) & ((cur & mask) != 0)
        lz[hit] = i + 1
        found |= hit
        cur = cur << np.uint64(1)
    np.maximum.at(registers, idx, lz)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_count(registers: np.ndarray) -> float:
    m = float(len(registers))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** -registers.astype(np.float64))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # small-range correction
    elif est > (1 << 32) / 30.0:
        est = -(1 << 32) * np.log(1 - est / (1 << 32))
    return float(est)


def hll_register_rows(ds, col: str, p: int = _P_DEFAULT, *,
                      hash_fn: str = "md5"):
    """The HLL sketch itself as a Dataset of (bucket, register) rows —
    per-batch register partials tree-combined with max (registers are
    mergeable by elementwise max, so the combine is associative).

    ``hash_fn="md5"`` (default) uses the DuckDB-parity hash
    (functions.text.md5_u64 == md5_number_lower), which makes the whole
    sketch — bucket index, rank, register max — reproducible in SQL bit
    for bit; any other value uses the vectorized engine-internal hash
    (functions.text.hash_column_u64 — no per-row Python).
    Only nonzero registers are emitted (bounded: <= 2^p rows).

    The md5 path batch-dedups values first (Arrow ``unique`` — the
    register set is invariant under duplicates), so the unavoidable
    per-value Python md5 runs over per-batch DISTINCT values only; its
    str() key must match SQL's CAST(x AS VARCHAR), which holds for the
    integer/string columns the oracles use."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.agg import tree_agg
    from .text import hash_column_u64, md5_u64

    def partial(batch: pa.Table) -> pa.Table:
        if hash_fn == "md5":
            uniq = pc.unique(batch.column(col))
            vals = pc.cast(uniq, pa.string()).to_pylist()
            h = md5_u64([("" if v is None else v).encode() for v in vals])
        else:
            h = hash_column_u64(batch.column(col))
        regs = hll_add_hashes(hll_create(p), h)
        nz = np.nonzero(regs)[0]
        return pa.table({
            "bucket": pa.array(nz.astype(np.int64)),
            "register": pa.array(regs[nz].astype(np.int64)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return tree_agg(parts, ["bucket"], [("register", "max")])


def hll_count_from_rows(rows, p: int = _P_DEFAULT) -> float:
    """Estimate from a (bucket, register) table (the hll_register_rows
    output) — reconstructs the register array and applies hll_count."""
    regs = hll_create(p)
    b = np.asarray(rows["bucket"], dtype=np.int64)
    r = np.asarray(rows["register"], dtype=np.int64)
    regs[b] = r.astype(np.uint8)
    return hll_count(regs)


def approx_distinct(ds, col: str, p: int = _P_DEFAULT) -> float:
    """Approximate distinct count of a column over a Dataset.

    Per-batch register partials (vectorized hash — no per-row Python)
    are tree-combined as (bucket, register-max) rows INSIDE the
    cluster; the driver collects only the <= 2^p final register rows —
    transfer independent of block count (at 10^6 blocks the former
    per-block 2^p-byte blob collect would put GBs on the driver)."""
    rows = hll_register_rows(ds, col, p, hash_fn="fast")
    tbl = rows.take_all()
    return hll_count_from_rows(
        {"bucket": [r["bucket"] for r in tbl],
         "register": [r["register"] for r in tbl]}, p)
