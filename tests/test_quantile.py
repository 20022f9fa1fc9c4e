"""Distributed exact quantiles (stages/quantile.py): quantile_disc
parity with a direct sorted-index computation, duplicate-heavy
domains, single-row groups, multi-block histograms."""

import numpy as np
import pyarrow as pa


def _disc(sorted_vals, p):
    n = len(sorted_vals)
    return int(sorted_vals[(p * n + 99) // 100 - 1])


def _run(keys, vals, percents, n_blocks=11):
    import ray

    from karta_ray.stages.quantile import grouped_quantiles

    t = pa.table({"k": pa.array(keys), "v": vals.astype(np.int64)})
    out = grouped_quantiles(
        ray.data.from_arrow(t).repartition(n_blocks), ["k"], "v",
        percents)
    return out.to_pandas().set_index("k").sort_index()


class TestGroupedQuantiles:
    def test_matches_sorted_index(self, ray_session):
        rng = np.random.RandomState(7)
        n = 20000
        keys = rng.choice(["a", "b", "c"], n).tolist()
        vals = rng.randint(0, 500, n)     # heavy duplication
        got = _run(keys, vals, [50, 90, 99])
        karr = np.array(keys)
        for k in "abc":
            sv = np.sort(vals[karr == k])
            assert got.loc[k, "n_rows"] == len(sv)
            for p in (50, 90, 99):
                assert got.loc[k, f"p{p}"] == _disc(sv, p), (k, p)

    def test_duckdb_parity_direct(self, ray_session):
        import duckdb

        rng = np.random.RandomState(9)
        n = 5000
        keys = rng.choice(["x", "y"], n).tolist()
        vals = rng.randint(-100, 100, n)
        got = _run(keys, vals, [50, 90, 99])
        con = duckdb.connect()
        con.register("t", pa.table({"k": pa.array(keys),
                                    "v": vals.astype(np.int64)}))
        want = con.execute(
            "SELECT k, quantile_disc(v, 0.50) p50,"
            " quantile_disc(v, 0.90) p90, quantile_disc(v, 0.99) p99"
            " FROM t GROUP BY k ORDER BY k").fetchall()
        for k, p50, p90, p99 in want:
            assert got.loc[k, "p50"] == p50
            assert got.loc[k, "p90"] == p90
            assert got.loc[k, "p99"] == p99

    def test_single_row_group(self, ray_session):
        got = _run(["solo"], np.array([42]), [50, 99], n_blocks=1)
        assert got.loc["solo", "p50"] == 42
        assert got.loc["solo", "p99"] == 42
        assert got.loc["solo", "n_rows"] == 1
