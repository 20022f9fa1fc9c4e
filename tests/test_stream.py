"""Event-time session windows (stages/stream.py): brute-force
equivalence, tie handling, gap boundary semantics (strict >), hot-user
block straddles with the pre-collapsed residue."""

import numpy as np
import pyarrow as pa


def _brute(users, ts, gap):
    """(user, session_id, start, end, n) via a plain sorted walk."""
    order = np.lexsort((ts, users))
    out = {}
    for i in order:
        u = users[i]
        sess = out.setdefault(u, [])
        if sess and ts[i] - sess[-1][1] <= gap:
            s = sess[-1]
            sess[-1] = (s[0], ts[i], s[2] + 1)
        else:
            sess.append((ts[i], ts[i], 1))
    rows = []
    for u, sess in out.items():
        for k, (a, b, n) in enumerate(sess):
            rows.append((u, k, a, b, n))
    return sorted(rows)


def _run(users, ts, gap, nblocks=9):
    import ray

    from karta_ray.stages.stream import session_windows

    t = pa.table({"user_id": pa.array(users.astype(np.int64)),
                  "ts": pa.array(ts.astype(np.int64))})
    ds = ray.data.from_arrow(t).repartition(nblocks)
    got = session_windows(ds, key="user_id", on="ts", gap=gap).to_pandas()
    return sorted(map(tuple, got[["user_id", "session_id", "start_us",
                                  "end_us", "n_events"]].to_numpy()))


class TestSessionWindows:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(7)
        n = 3000
        users = rng.randint(0, 50, n)
        ts = rng.randint(0, 10**6, n)
        gap = 5000
        assert _run(users, ts, gap) == _brute(users, ts, gap)

    def test_gap_boundary_strict(self, ray_session):
        # diff == gap stays in-session; gap+1 opens a new one
        users = np.zeros(3, dtype=np.int64)
        ts = np.array([0, 100, 201])
        got = _run(users, ts, gap=100, nblocks=1)
        assert got == [(0, 0, 0, 100, 2), (0, 1, 201, 201, 1)]

    def test_ties_share_session(self, ray_session):
        users = np.zeros(4, dtype=np.int64)
        ts = np.array([0, 1000, 1000, 5000])
        got = _run(users, ts, gap=100, nblocks=2)
        assert got == [(0, 0, 0, 0, 1), (0, 1, 1000, 1000, 2),
                       (0, 2, 5000, 5000, 1)]

    def test_hot_user_straddles_blocks(self, ray_session):
        # one user's burst spans every block: the residue sees
        # pre-collapsed partials and must still merge exactly
        n = 60000
        ts = np.arange(n, dtype=np.int64) * 3       # all gaps 3 <= gap
        ts[n // 2:] += 10**9                        # one far jump
        users = np.zeros(n, dtype=np.int64)
        got = _run(users, ts, gap=10, nblocks=16)
        assert got == [
            (0, 0, 0, (n // 2 - 1) * 3, n // 2),
            (0, 1, (n // 2) * 3 + 10**9, (n - 1) * 3 + 10**9, n - n // 2)]

    def test_rollup_matches_sessionize_query(self, ray_session):
        # cross-operator consistency on real testdata: rolling the
        # per-window rows up per user must reproduce the independent
        # batch sessionize query (n_events total, n_sessions = number
        # of windows)
        import __ray_entry__ as entry

        qs = entry.queries()
        sf = "/root/testdata/sf0.001"
        win = (qs["session_windows"](sf).to_pandas()
               .groupby("user_id")
               .agg(n_events=("n_events", "sum"),
                    n_sessions=("session_id", "count")))
        sess = (qs["sessionize"](sf).to_pandas()
                .set_index("user_id").sort_index())
        win = win.sort_index()
        assert (win.n_events == sess.n_events).all()
        assert (win.n_sessions == sess.n_sessions).all()
