"""Distributed EXACT quantiles over a fixed-point integer column.

A full distributed sort computes exact quantiles but moves every row;
this stage moves only a histogram. Per-batch partials aggregate
(keys, value) -> count, the tree combiner sums them, and the final
per-key pass walks each key's compacted histogram. The shuffled data
volume is bounded by |keys| x |value domain| regardless of row count —
the precondition (caller must check) is that the value column is
fixed-point with a bounded domain (e.g. prices in cents), NOT an
unbounded float. 100 TB of events with cent-valued prices compacts to
at most ~10^5 histogram rows per key.

Discrete-quantile semantics match DuckDB/Postgres ``quantile_disc`` /
``percentile_disc``: the 0-based index ``ceil(q*n) - 1`` of the sorted
values, computed in exact integer arithmetic from the percent p
(q = p/100).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def grouped_quantiles(ds, keys: list, value_col: str, percents: list):
    """Per distinct ``keys``: exact p-th percentiles (``quantile_disc``
    semantics) of int64 ``value_col``. Returns one row per key group
    with columns ``keys + [f"p{p}" for p in percents] + ["n_rows"]``.
    """
    from .agg import group_runs, sorted_map_groups, tree_sum

    out_qcols = [f"p{p}" for p in percents]

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys + [value_col]).append_column(
            "n", pa.array(np.ones(batch.num_rows, dtype=np.int64)))
        g = t.group_by(keys + [value_col]).aggregate([("n", "sum")])
        return g.rename_columns(keys + [value_col, "n"])

    hist = tree_sum(ds.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True),
                    keys + [value_col], ["n"])

    def finals(batch: pa.Table) -> pa.Table:
        # residue boundedness: groups-per-key = distinct values, which
        # the domain-bounded precondition caps — no hot-key escape
        # needed (see agg.py sorted_map_groups contract)
        key_cols = {k: [] for k in keys}
        q_out = {c: [] for c in out_qcols}
        n_out = []
        if batch.num_rows:
            starts, ends = group_runs(batch.select(keys), keys)
            vals = batch.column(value_col).to_numpy(zero_copy_only=False)
            cnts = batch.column("n").to_numpy(zero_copy_only=False)
            for s, e in zip(starts, ends):
                v = vals[s:e]
                order = np.argsort(v, kind="stable")
                v = v[order]
                cum = np.cumsum(cnts[s:e][order])
                total = int(cum[-1])
                for k in keys:
                    key_cols[k].append(batch.column(k)[s].as_py())
                for p, c in zip(percents, out_qcols):
                    rank = (p * total + 99) // 100   # ceil(q*n), exact
                    q_out[c].append(int(v[np.searchsorted(cum, rank)]))
                n_out.append(total)
        cols = {k: pa.array(key_cols[k],
                            type=batch.schema.field(k).type)
                for k in keys}
        for c in out_qcols:
            cols[c] = pa.array(q_out[c], pa.int64())
        cols["n_rows"] = pa.array(n_out, pa.int64())
        return pa.table(cols)

    return sorted_map_groups(hist, keys, finals,
                             sort_keys=keys + [value_col])
