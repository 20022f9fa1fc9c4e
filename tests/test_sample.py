"""Deterministic hash-based stratified sampling (stages/sample.py):
rate fidelity, stratum-specific rates, rerun/partitioning invariance,
cross-table alignment, edge rates 0 and 1."""

import numpy as np
import pyarrow as pa


def _docs(n=4000, seed=3):
    rng = np.random.RandomState(seed)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(rng.choice(["en", "fr", "sw"], n,
                                    p=[0.6, 0.3, 0.1]).tolist()),
    })


class TestStratifiedSample:
    def test_rates_and_determinism(self, ray_session):
        import ray

        from karta_ray.stages.sample import stratified_sample

        t = _docs()
        rates = {"en": 0.1, "fr": 0.5}

        def run(n_blocks):
            ds = ray.data.from_arrow(t).repartition(n_blocks)
            out = stratified_sample(ds, id_col="doc_id",
                                    stratum_col="lang", rates=rates,
                                    default_rate=0.9)
            return out.to_pandas().sort_values("doc_id").reset_index(
                drop=True)

        a, b = run(1), run(13)
        # identical rows regardless of partitioning / rerun
        assert a.equals(b)
        # realized rates near nominal per stratum
        pdf = t.to_pandas()
        for lang, rate in [("en", 0.1), ("fr", 0.5), ("sw", 0.9)]:
            total = (pdf.lang == lang).sum()
            kept = (a.lang == lang).sum()
            assert abs(kept / total - rate) < 0.06, (lang, kept, total)

    def test_alignment_across_tables(self, ray_session):
        """Same id + same predicate selects the same rows in a second
        table — sampled docs and their embeddings stay joinable."""
        import ray

        from karta_ray.stages.sample import stratified_sample

        t = _docs()
        emb = pa.table({
            "doc_id": t.column("doc_id"),
            "lang": t.column("lang"),
            "v": pa.array(np.arange(t.num_rows, dtype=np.float64)),
        })
        kw = dict(id_col="doc_id", stratum_col="lang",
                  rates={"en": 0.25}, default_rate=0.75)
        ids_a = set(stratified_sample(
            ray.data.from_arrow(t), **kw).to_pandas().doc_id)
        ids_b = set(stratified_sample(
            ray.data.from_arrow(emb), **kw).to_pandas().doc_id)
        assert ids_a == ids_b

    def test_edge_rates(self, ray_session):
        import ray

        from karta_ray.stages.sample import stratified_sample

        t = _docs(500)
        out = stratified_sample(ray.data.from_arrow(t),
                                id_col="doc_id", stratum_col="lang",
                                rates={"en": 0.0, "fr": 1.0},
                                default_rate=0.0).to_pandas()
        assert (out.lang == "fr").all()
        pdf = t.to_pandas()
        assert len(out) == (pdf.lang == "fr").sum()

    def test_internal_hasher(self, ray_session):
        """hash_column_u64 path (no per-row Python) also works and is
        partition-invariant."""
        import ray

        from karta_ray.functions.text import hash_column_u64
        from karta_ray.stages.sample import stratified_sample

        t = _docs(2000)
        kw = dict(id_col="doc_id", stratum_col="lang", rates={},
                  default_rate=0.3, hasher=hash_column_u64)
        a = stratified_sample(
            ray.data.from_arrow(t), **kw).to_pandas()
        b = stratified_sample(
            ray.data.from_arrow(t).repartition(7),
            **kw).to_pandas()
        assert set(a.doc_id) == set(b.doc_id)
        assert abs(len(a) / t.num_rows - 0.3) < 0.06


class TestGroupedHashSample:
    def test_exact_k_and_determinism(self, ray_session):
        import ray

        from karta_ray.stages.sample import grouped_hash_sample

        t = _docs(3000)

        def run(n_blocks):
            ds = ray.data.from_arrow(t).repartition(n_blocks)
            out = grouped_hash_sample(ds, keys=["lang"],
                                      id_col="doc_id", k=7)
            return (out.to_pandas().sort_values(["lang", "doc_id"])
                    .reset_index(drop=True))

        a, b = run(1), run(17)
        assert a.equals(b)
        counts = a.groupby("lang").size()
        assert (counts == 7).all()

    def test_small_group_keeps_all(self, ray_session):
        import ray

        from karta_ray.stages.sample import grouped_hash_sample

        t = _docs(30)
        out = grouped_hash_sample(
            ray.data.from_arrow(t), keys=["lang"], id_col="doc_id",
            k=1000).to_pandas()
        assert len(out) == 30  # every row survives

    def test_rank_column_dropped(self, ray_session):
        import ray

        from karta_ray.stages.sample import grouped_hash_sample

        t = _docs(100)
        out = grouped_hash_sample(ray.data.from_arrow(t),
                                  keys=["lang"], id_col="doc_id", k=3)
        assert set(out.schema().names) == set(t.schema.names)
