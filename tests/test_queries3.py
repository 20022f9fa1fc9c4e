"""Late round-4 operators (pipelines/queries3.py): partitioning
invariance and edge semantics that the sf0.01 oracles can't isolate."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts, ids=None):
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(ids if ids is not None
                           else np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return t


class TestInvertedIndex:
    def test_cap_and_partition_invariance(self, ray_session, tmp_path,
                                          monkeypatch):
        import karta_ray.pipelines.queries3 as Q3

        monkeypatch.setattr(Q3, "POSTINGS_CAP", 3)
        # term "a b" in 5 docs (over cap -> dropped), "c d" in 2
        texts = ["a b x", "a b y", "a b z", "a b w", "a b q",
                 "c d", "c d", "e f"]
        _write_docs(tmp_path, texts)
        out = Q3.q_inverted_index(str(tmp_path)).to_pandas() \
            .set_index("term").sort_index()
        assert "a b" not in out.index          # over cap, dropped whole
        assert out.loc["c d", "df"] == 2
        assert out.loc["c d", "postings"] == "5,6"
        assert out.loc["e f", "postings"] == "7"

    def test_term_straddles_blocks_over_cap(self, ray_session, tmp_path,
                                            monkeypatch):
        # a hot term spread over MANY input blocks must still be
        # dropped (tombstone truncation), never emitted under-cap
        import ray

        import karta_ray.pipelines.queries3 as Q3

        monkeypatch.setattr(Q3, "POSTINGS_CAP", 4)
        texts = ["h h t"] * 40 + ["u v"]
        t = _write_docs(tmp_path, texts)
        # force fragmentation by writing many row groups
        pq.write_table(t, tmp_path / "documents.parquet",
                       row_group_size=3)
        out = Q3.q_inverted_index(str(tmp_path)).to_pandas()
        terms = set(out["term"])
        assert "h h" not in terms and "h t" not in terms
        assert "u v" in terms


class TestLatestSnapshot:
    def test_negative_payload_and_tiebreak(self, ray_session, tmp_path):
        from karta_ray.pipelines.queries3 import q_latest_snapshot

        t = pa.table({
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                np.array([100, 200, 200, 50], dtype="datetime64[us]")),
            "event_id": pa.array([10, 11, 12, 13], pa.int64()),
            "value": pa.array([-1.5, -2.5, -3.5, 0.0], pa.float64()),
        })
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_latest_snapshot(str(tmp_path)).to_pandas() \
            .set_index("user_id").sort_index()
        # user 1: ts tie at 200 -> event_id 12 wins; negative payload
        # must round-trip through the packed blob exactly
        assert out.loc[1, "last_event_id"] == 12
        assert out.loc[1, "last_value"] == -3.5
        assert out.loc[1, "last_ts_us"] == 200
        assert out.loc[2, "last_value"] == 0.0


class TestEventTransitions:
    def test_user_straddles_blocks(self, ray_session, tmp_path):
        from karta_ray.pipelines.queries3 import q_event_transitions

        # one user's ordered chain a->b->a->b...; a second user c->c
        n = 3000
        t = pa.table({
            "user_id": pa.array([1] * n + [2, 2], pa.int64()),
            "ts": pa.array(np.concatenate(
                [np.arange(n), [0, 1]]).astype("datetime64[us]")),
            "event_id": pa.array(np.arange(n + 2, dtype=np.int64)),
            "event_type": pa.array(
                ["a" if i % 2 == 0 else "b" for i in range(n)] + ["c", "c"]),
        })
        pq.write_table(t, tmp_path / "events.parquet", row_group_size=100)
        out = q_event_transitions(str(tmp_path)).to_pandas() \
            .set_index(["prev_type", "next_type"])["n"]
        assert out.loc[("a", "b")] == n // 2
        assert out.loc[("b", "a")] == n // 2 - 1
        assert out.loc[("c", "c")] == 1
