"""Table profiling (pipelines/queries3.q_profile_table machinery):
exact distinct via 128-bit value hashes + sorted shuffle, null
accounting, partitioning invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _write_docs(tmp_path, n=3000, seed=11):
    rng = np.random.RandomState(seed)
    text = [f"t{v}" for v in rng.randint(0, 700, n)]
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(text),
        "lang": pa.array(
            [None if i % 17 == 0 else l for i, l in
             enumerate(rng.choice(["en", "fr", "de", "sw"], n).tolist())]),
        "source": pa.array(rng.choice(["a.com", "b.org"], n).tolist()),
        "n_chars": pa.array(rng.randint(-50, 50, n).astype(np.int64)),
    })
    import pyarrow.parquet as pq
    pq.write_table(t, tmp_path / "documents.parquet")
    return t


class TestProfileTable:
    def test_matches_pandas(self, ray_session, tmp_path):
        from karta_ray.pipelines.queries3 import q_profile_table

        t = _write_docs(tmp_path)
        out = q_profile_table(str(tmp_path)).to_pandas() \
            .set_index("col").sort_index()
        pdf = t.to_pandas()
        for c in out.index:
            s = pdf[c]
            assert out.loc[c, "n_rows"] == len(pdf)
            assert out.loc[c, "n_null"] == int(s.isna().sum())
            assert out.loc[c, "n_distinct"] == int(s.dropna().nunique())
            as_str = s.dropna().astype(str)
            assert out.loc[c, "sum_len"] == int(
                as_str.str.encode("utf-8").str.len().sum())
            assert out.loc[c, "min_v"] == as_str.min()
            assert out.loc[c, "max_v"] == as_str.max()

    def test_partitioning_invariance(self, ray_session, tmp_path):
        # distinct counting must survive values straddling many blocks
        import ray

        from karta_ray.functions.text import hash_column_u64
        from karta_ray.stages.agg import (group_runs, sorted_map_groups,
                                          tree_sum)
        import pyarrow.compute as pc

        rng = np.random.RandomState(5)
        vals = rng.randint(0, 97, 5000)

        def distinct_count(n_blocks):
            t = pa.table({"v": pa.array([f"x{v}" for v in vals])})
            ds = ray.data.from_arrow(t).repartition(n_blocks)

            def pairs(batch):
                uniq = pc.unique(batch.column("v"))
                h = hash_column_u64(uniq).view(np.int64)
                return pa.table({"h": pa.array(h)})

            def dedup(batch):
                return batch.group_by(["h"]).aggregate([])

            def count(batch):
                starts, _ = group_runs(batch, ["h"])
                return pa.table({"k": pa.array([0]),
                                 "nd": pa.array([len(starts)])})

            rows = tree_sum(
                sorted_map_groups(ds.map_batches(
                    pairs, batch_format="pyarrow"), ["h"], count,
                    pre_reduce=dedup),
                ["k"], ["nd"]).take_all()
            return sum(r["nd"] for r in rows)

        assert distinct_count(1) == 97
        assert distinct_count(23) == 97


class TestRepetitionSignals:
    def test_edge_docs(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from karta_ray.pipelines.queries3 import q_repetition_signals

        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a a a a", "x", "a b a b a"]),
        })
        pq.write_table(t, tmp_path / "documents.parquet")
        out = q_repetition_signals(str(tmp_path)).to_pandas() \
            .set_index("doc_id").sort_index()
        # doc 1: 4 words, 1 distinct, bigrams "a a" x3
        assert out.loc[1, "n_words"] == 4
        assert out.loc[1, "n_distinct_words"] == 1
        assert out.loc[1, "n_bigrams"] == 3
        assert out.loc[1, "n_distinct_bigrams"] == 1
        assert out.loc[1, "dup_word_frac"] == 0.75
        # doc 2: single word, no bigrams
        assert out.loc[2, "n_words"] == 1
        assert out.loc[2, "n_bigrams"] == 0
        # doc 3: "a b a b a": 5 words 2 distinct; bigrams: "a b"x2 "b a"x2
        assert out.loc[3, "top_word_n"] == 3
        assert out.loc[3, "n_bigrams"] == 4
        assert out.loc[3, "n_distinct_bigrams"] == 2
        assert out.loc[3, "top_bigram_n"] == 2
