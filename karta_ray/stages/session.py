"""Sessionization as sort + vectorized segment partials.

The r01 implementation used ``groupby(user).map_groups`` with one Python
call and a 1-row Arrow table per user — correct, but at 10^9 users the
per-group overhead dominates. This shape is fully vectorized:

1. global sort by (user, ts) — one all-to-all shuffle;
2. per sorted block, a vectorized partial per (user, block): n_events,
   inner session bounds (gap > gap_us), first/last ts — all numpy
   segment reductions, no per-user work;
3. a DISTRIBUTED merge of the partials on sorted_map_groups (range
   shuffle by (user, first_ts) + per-block stitch): adjacent same-user
   partials are stitched with a junction-gap check, vectorized per
   block; users straddling a partial-block boundary are pre-reduced to
   one partial row per (user, block) before the bounded residue pass.

No stage ever holds more than one block of partials: with 10^9 users
the merge input (~n_users rows) stays spread across the range shuffle's
blocks instead of collapsing onto a single O(users) block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _segments(u: np.ndarray):
    """Start/end indices of equal-value runs in a sorted key array."""
    if len(u) == 0:
        return (np.empty(0, dtype=np.int64),) * 2
    new = np.nonzero(u[1:] != u[:-1])[0] + 1
    starts = np.concatenate([[0], new])
    ends = np.concatenate([new, [len(u)]])
    return starts, ends


def sessionize(ds, *, user_col: str = "user_id", ts_col: str = "ts",
               gap_us: int):
    """(user_id, n_events, n_sessions) with a new session whenever the
    idle gap between consecutive events exceeds ``gap_us``."""

    def partials(batch: pa.Table) -> pa.Table:
        u = batch.column(user_col).to_numpy(zero_copy_only=False)
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        starts, ends = _segments(u)
        if len(starts) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_bounds": pa.array([], pa.int64()),
                             "first_ts": pa.array([], pa.int64()),
                             "last_ts": pa.array([], pa.int64())})
        # bound[i] — a session break between rows i and i+1 of one user
        same = u[1:] == u[:-1]
        bound = same & ((ts[1:] - ts[:-1]) > gap_us)
        cb = np.concatenate([[0], np.cumsum(bound)])
        n_bounds = cb[ends - 1] - cb[starts]
        return pa.table({
            "user_id": pa.array(u[starts].astype(np.int64)),
            "n_events": pa.array(ends - starts),
            "n_bounds": pa.array(n_bounds.astype(np.int64)),
            "first_ts": pa.array(ts[starts]),
            "last_ts": pa.array(ts[ends - 1]),
        })

    parts = (ds.sort([user_col, ts_col])
             .map_batches(partials, batch_format="pyarrow"))

    def stitch_partials(batch: pa.Table) -> pa.Table:
        """pre_reduce: collapse a (user, first_ts)-sorted run of
        partial rows to ONE partial row per user — same stitch rule as
        the final merge (sum events, sum bounds + junction breaks),
        but keeping the partial schema so the residue pass can re-feed
        it through the merge."""
        u = batch.column("user_id").to_numpy()
        ne = batch.column("n_events").to_numpy()
        nb = batch.column("n_bounds").to_numpy()
        ft = batch.column("first_ts").to_numpy()
        lt = batch.column("last_ts").to_numpy()
        order = np.lexsort((ft, u))
        u, ne, nb, ft, lt = (u[order], ne[order], nb[order], ft[order],
                             lt[order])
        starts, ends = _segments(u)
        if len(starts) == 0:
            return batch
        same = u[1:] == u[:-1]
        junction = same & ((ft[1:] - lt[:-1]) > gap_us)
        ce = np.concatenate([[0], np.cumsum(ne)])
        cb = np.concatenate([[0], np.cumsum(nb)])
        cj = np.concatenate([[0], np.cumsum(junction)])
        return pa.table({
            "user_id": pa.array(u[starts].astype(np.int64)),
            "n_events": pa.array((ce[ends] - ce[starts]).astype(np.int64)),
            "n_bounds": pa.array(((cb[ends] - cb[starts])
                                  + (cj[ends - 1] - cj[starts]))
                                 .astype(np.int64)),
            "first_ts": pa.array(ft[starts]),
            "last_ts": pa.array(lt[ends - 1]),
        })

    def merge(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        ne = batch.column("n_events").to_numpy()
        nb = batch.column("n_bounds").to_numpy()
        ft = batch.column("first_ts").to_numpy()
        lt = batch.column("last_ts").to_numpy()
        order = np.lexsort((ft, u))
        u, ne, nb, ft, lt = u[order], ne[order], nb[order], ft[order], lt[order]
        starts, ends = _segments(u)
        if len(starts) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64())})
        same = u[1:] == u[:-1]
        junction = same & ((ft[1:] - lt[:-1]) > gap_us)
        ce = np.concatenate([[0], np.cumsum(ne)])
        cb = np.concatenate([[0], np.cumsum(nb)])
        cj = np.concatenate([[0], np.cumsum(junction)])
        n_events = ce[ends] - ce[starts]
        n_bounds = (cb[ends] - cb[starts]) + (cj[ends - 1] - cj[starts])
        return pa.table({
            "user_id": pa.array(u[starts].astype(np.int64)),
            "n_events": pa.array(n_events.astype(np.int64)),
            "n_sessions": pa.array((n_bounds + 1).astype(np.int64)),
        })

    from .agg import sorted_map_groups

    # distributed stitch: no single O(n_users) merge block. pre_reduce
    # bounds the residue to <= 2 rows per (user, partial-block) even for
    # users whose partials span many blocks.
    return sorted_map_groups(parts, ["user_id"], merge,
                             pre_reduce=stitch_partials,
                             sort_keys=["user_id", "first_ts"])


# ---------------------------------------------------------------------------
# Ordered funnels
# ---------------------------------------------------------------------------

_I64_MAX = np.iinfo(np.int64).max
_I64_MIN = np.iinfo(np.int64).min


def funnel_block(tbl: pa.Table, steps, *, user_col: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type"
                 ) -> pa.Table:
    """Progressive funnel over a ``user_col``-sorted block: per user,
    the first ``steps[0]`` event, then the first ``steps[1]`` strictly
    after it, and so on. Returns (user_id, steps_reached). len(steps)
    vectorized passes over the whole block — segmented mins via
    ``np.minimum.reduceat`` — no per-user Python."""
    import pyarrow.compute as pc

    from .agg import group_runs

    if tbl.num_rows == 0:
        return pa.table({user_col: pa.array([], pa.int64()),
                         "steps_reached": pa.array([], pa.int64())})
    starts, ends = group_runs(tbl, [user_col])
    uid = tbl.column(user_col).to_numpy()
    ts = tbl.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    run_idx = np.repeat(np.arange(len(starts)), ends - starts)
    thr = np.full(len(starts), _I64_MIN)
    reached_steps = np.zeros(len(starts), np.int64)
    for step in steps:
        is_step = pc.equal(tbl.column(type_col),
                           pa.scalar(step)).to_numpy(zero_copy_only=False)
        cand = np.where(is_step & (ts > thr[run_idx]), ts, _I64_MAX)
        m = np.minimum.reduceat(cand, starts)
        reached = m < _I64_MAX
        reached_steps += reached
        thr = np.where(reached, m, _I64_MAX)
    return pa.table({user_col: pa.array(uid[starts], pa.int64()),
                     "steps_reached": pa.array(reached_steps, pa.int64())})


def funnel_steps(ds, steps, *, user_col: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type"):
    """Distributed ordered funnel: one range shuffle by user, then
    :func:`funnel_block` per block. Users straddling block boundaries
    resolve through sorted_map_groups' raw-row residue — bounded by
    per-user matching-event counts (no finite mergeable summary exists
    for progressive matching, so shipping the straddling user's rows IS
    the standard distributed-funnel plan)."""
    from .agg import sorted_map_groups

    def block_fn(tbl: pa.Table) -> pa.Table:
        return funnel_block(tbl, steps, user_col=user_col,
                            ts_col=ts_col, type_col=type_col)

    return sorted_map_groups(ds, [user_col], block_fn)
