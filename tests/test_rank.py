"""Global ranking primitive (stages/rank.py): partitioning invariance,
offset correctness, NTILE edge semantics."""

import numpy as np
import pyarrow as pa


class TestGlobalRank:
    def test_partitioning_invariance(self, ray_session):
        import ray

        from karta_ray.stages.rank import global_rank

        rng = np.random.RandomState(7)
        t = pa.table({
            "id": pa.array(np.arange(5000, dtype=np.int64)),
            "v": pa.array(rng.randint(0, 50, 5000).astype(np.int64)),
        })

        def run(nb):
            ds = ray.data.from_arrow(t).repartition(nb)
            out, total = global_rank(ds, ["v", "id"])
            assert total == 5000
            return out.to_pandas().sort_values("id").reset_index(drop=True)

        a, b = run(1), run(17)
        assert a.equals(b)
        # rank agrees with numpy lexsort position
        order = np.lexsort((t.column("id").to_numpy(),
                            t.column("v").to_numpy()))
        expect = np.empty(5000, dtype=np.int64)
        expect[order] = np.arange(1, 5001)
        assert (a.sort_values("id")["rnk"].to_numpy() == expect).all()

    def test_descending(self, ray_session):
        import ray

        from karta_ray.stages.rank import global_rank

        t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                      "v": pa.array([10, 30, 20], pa.int64())})
        out, _ = global_rank(ray.data.from_arrow(t), ["v", "id"],
                             descending=[True, False])
        df = out.to_pandas().set_index("id")
        assert df.loc[2, "rnk"] == 1 and df.loc[1, "rnk"] == 3


class TestNtile:
    def test_sql_semantics(self):
        from karta_ray.stages.rank import ntile_of_rank

        # n=10, k=3: tiles sized 4,3,3
        tiles = ntile_of_rank(np.arange(1, 11), 10, 3)
        assert tiles.tolist() == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]

    def test_fewer_rows_than_tiles(self):
        from karta_ray.stages.rank import ntile_of_rank

        tiles = ntile_of_rank(np.arange(1, 4), 3, 7)
        assert tiles.tolist() == [1, 2, 3]
