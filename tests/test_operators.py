"""Unit tests for operators: as-of join edges, transformers, dedup
(SURVEY.md §5.2.4: nulls / empty partitions / duplicate keys / ties)."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from dist_keras_spark.operators.asof import asof_join
from dist_keras_spark.operators.dedup import exact_dedup, jaccard_pairs, simhash_pairs
from dist_keras_spark.operators.transformers import (
    LabelIndexTransformer,
    MinMaxTransformer,
    OneHotTransformer,
    ReshapeTransformer,
    StringIndexTransformer,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 10:00:00"), "e1"),
                (1, _ts("2024-01-01 12:00:00"), "e2"),
                (2, _ts("2024-01-01 09:00:00"), "e3"),  # before any right row
                (3, _ts("2024-01-01 10:00:00"), "e4"),  # key w/o right rows
            ],
            "k long, t timestamp, tag string",
        )
        right = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 09:00:00"), 100),
                (1, _ts("2024-01-01 12:00:00"), 200),  # exactly simultaneous w/ e2
                (1, _ts("2024-01-01 12:00:00"), 201),  # tie on ts → larger v wins
                (2, _ts("2024-01-01 11:00:00"), 300),
            ],
            "k long, rt timestamp, v int",
        )
        return left, right

    def test_inner_matches_latest_at_or_before(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, "k", "t", "rt", ["v"], how="inner", tiebreak="v")
        got = {r["tag"]: r["v"] for r in out.collect()}
        # e1: only 09:00 row qualifies; e2: simultaneous 12:00 rows
        # qualify (<=), tie → larger v; e3/e4: no match → dropped
        assert got == {"e1": 100, "e2": 201}

    def test_left_keeps_unmatched(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, "k", "t", "rt", ["v"], how="left", tiebreak="v")
        got = {r["tag"]: r["v"] for r in out.collect()}
        assert got == {"e1": 100, "e2": 201, "e3": None, "e4": None}

    def test_null_right_value_is_not_skipped(self, spark):
        """A matched right row whose value is NULL must yield NULL —
        not resurrect an older right row's value — and how='inner'
        must KEEP that left row (it did match)."""
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01 12:00:00"), "e1")], "k long, t timestamp, tag string"
        )
        right = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 09:00:00"), 100),
                (1, _ts("2024-01-01 11:00:00"), None),  # latest match, NULL value
            ],
            "k long, rt timestamp, v int",
        )
        for how in ("inner", "left"):
            got = {
                r["tag"]: r["v"]
                for r in asof_join(
                    left, right, "k", "t", "rt", ["v"], how=how
                ).collect()
            }
            assert got == {"e1": None}, how

    def test_inner_drops_only_truly_unmatched(self, spark):
        left = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 08:00:00"), "before_any"),
                (1, _ts("2024-01-01 12:00:00"), "matched_null"),
            ],
            "k long, t timestamp, tag string",
        )
        right = spark.createDataFrame(
            [(1, _ts("2024-01-01 11:00:00"), None)], "k long, rt timestamp, v int"
        )
        out = asof_join(left, right, "k", "t", "rt", ["v"], how="inner")
        assert [r["tag"] for r in out.collect()] == ["matched_null"]


class TestTransformers:
    def test_minmax_scalar_and_array(self, spark):
        df = spark.createDataFrame([(0.0, [0.0, 10.0]), (10.0, [5.0, 0.0])], "x double, a array<double>")
        s = MinMaxTransformer(0, 1, 0, 10, "x", "xs").transform(df)
        assert [r["xs"] for r in s.orderBy("x").collect()] == [0.0, 1.0]
        a = MinMaxTransformer(-1, 1, 0, 10, "a", "an").transform(df)
        assert a.orderBy("x").collect()[0]["an"] == [-1.0, 1.0]

    def test_one_hot_and_argmax_roundtrip(self, spark):
        df = spark.createDataFrame([(i,) for i in range(5)], "label int")
        oh = OneHotTransformer(5, "label", "oh").transform(df)
        back = LabelIndexTransformer(input_col="oh", output_col="idx").transform(oh)
        assert all(r["idx"] == float(r["label"]) for r in back.collect())
        row = oh.filter(F.col("label") == 3).collect()[0]
        assert row["oh"] == [0, 0, 0, 1, 0]

    def test_label_index_threshold(self, spark):
        df = spark.createDataFrame([([0.1, 0.2],), ([0.1, 0.9],)], "p array<double>")
        t = LabelIndexTransformer(
            input_col="p", output_col="i", activation_threshold=0.55, default_index=-1
        )
        assert [r["i"] for r in t.transform(df).collect()] == [-1.0, 1.0]

    def test_label_index_first_max_wins(self, spark):
        df = spark.createDataFrame([([0.5, 0.5, 0.1],)], "p array<double>")
        t = LabelIndexTransformer(input_col="p", output_col="i")
        assert t.transform(df).collect()[0]["i"] == 0.0

    def test_string_indexer_frequency_order(self, spark):
        df = spark.createDataFrame(
            [("b",), ("b",), ("a",), ("c",), ("c",)], "s string"
        )
        out = StringIndexTransformer("s", "i").transform(df)
        m = {r["s"]: r["i"] for r in out.collect()}
        # b and c tie on count 2 → lexical tiebreak; a is least frequent
        assert m == {"b": 0.0, "c": 1.0, "a": 2.0}

    def test_reshape_metadata(self, spark):
        df = spark.createDataFrame([([1.0] * 6,)], "v array<double>")
        out = ReshapeTransformer("v", "r", (2, 3)).transform(df)
        row = out.collect()[0]
        assert row["r_shape"] == [2, 3] and row["r"] == row["v"]


class TestDedup:
    def test_exact_dedup_idempotent_and_priority(self, spark):
        df = spark.createDataFrame(
            [(1, "x", "b"), (2, "x", "a"), (3, "y", "a")], "id long, text string, src string"
        )
        out = exact_dedup(df, "text", keep_order=["src", "id"])
        rows = {(r["id"], r["src"]) for r in out.collect()}
        assert rows == {(2, "a"), (3, "a")}
        again = exact_dedup(out, "text", keep_order=["src", "id"])
        assert sorted(r["id"] for r in again.collect()) == sorted(r["id"] for r in out.collect())

    def test_jaccard_identical_docs_score_one(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b c d e f"),
                (2, "a b c d e f"),
                (3, "z y x w v u"),
            ],
            "doc_id long, text string",
        )
        out = jaccard_pairs(df, threshold=0.9).collect()
        assert len(out) == 1 and out[0]["id_a"] == 1 and out[0]["id_b"] == 2
        assert abs(out[0]["jaccard"] - 1.0) < 1e-12

    def test_jaccard_short_doc_no_crash(self, spark):
        df = spark.createDataFrame([(1, "a b"), (2, "a b")], "doc_id long, text string")
        assert jaccard_pairs(df, threshold=0.1).count() == 0  # < 3 tokens → no shingles

    def test_simhash_identical_distance_zero(self, spark):
        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over it"), (2, "the quick brown fox jumps over it")],
            "doc_id long, text string",
        )
        out = simhash_pairs(df, radius=0).collect()
        assert len(out) == 1 and out[0]["hamming"] == 0


class TestSetOpEdges:
    def test_union_by_name_missing_columns(self, spark):
        a = spark.createDataFrame([(1, "x")], "id long, s string")
        b = spark.createDataFrame([(2,)], "id long")
        out = a.unionByName(b, allowMissingColumns=True).orderBy("id").collect()
        assert [(r["id"], r["s"]) for r in out] == [(1, "x"), (2, None)]

    def test_intersect_all_keeps_duplicates(self, spark):
        a = spark.createDataFrame([(1,), (1,), (2,)], "v int")
        b = spark.createDataFrame([(1,), (1,), (3,)], "v int")
        assert a.intersectAll(b).count() == 2
        assert a.intersect(b).count() == 1


class TestAsofRandomizedDifferential:
    def test_matches_pandas_merge_asof(self, spark):
        """Differential oracle for C8: on seeded random tables the
        union+window asof_join must agree with pandas.merge_asof
        (backward, allow_exact_matches) — an independent reference
        implementation, not our own logic restated."""
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(0)
        for trial in range(3):
            nl, nr = 120, 80
            left_pd = pd.DataFrame(
                {
                    "k": rng.randint(0, 5, nl).astype("int64"),
                    "t": pd.to_datetime(
                        rng.randint(0, 1_000_000, nl), unit="s"
                    ),
                    "tag": np.arange(nl).astype("int64"),
                }
            )
            right_pd = pd.DataFrame(
                {
                    "k": rng.randint(0, 5, nr).astype("int64"),
                    "rt": pd.to_datetime(
                        rng.randint(0, 1_000_000, nr), unit="s"
                    ),
                    "v": rng.randint(0, 1000, nr).astype("int64"),
                }
            )
            # merge_asof needs global sort on the time keys
            expected = pd.merge_asof(
                left_pd.sort_values("t"),
                right_pd.sort_values("rt"),
                left_on="t",
                right_on="rt",
                by="k",
                direction="backward",
                allow_exact_matches=True,
            )
            exp = {int(r.tag): (None if pd.isna(r.v) else int(r.v))
                   for r in expected.itertuples()}

            out = asof_join(
                spark.createDataFrame(left_pd),
                spark.createDataFrame(right_pd),
                key="k",
                left_ts="t",
                right_ts="rt",
                value_cols=["v"],
                how="left",
            ).collect()
            got = {int(r["tag"]): (None if r["v"] is None else int(r["v"]))
                   for r in out}
            assert got == exp, f"trial {trial}: asof_join != pandas.merge_asof"


class TestNeardupClusters:
    def test_chain_graph_converges_to_min_label(self, spark):
        """a-b, b-c, d-e chains: {1,2,3} → cluster 1, {4,5} → cluster 4,
        isolated 6 → itself. Requires 2 propagation rounds (diameter 2)."""
        from dist_keras_spark.operators.dedup import neardup_clusters

        verts = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
        )
        got = {
            r["id"]: r["cluster_id"]
            for r in neardup_clusters(verts, pairs).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}

    def test_max_iter_raises_on_long_path(self, spark):
        import pytest

        from dist_keras_spark.operators.dedup import neardup_clusters

        n = 8
        verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
        # path graph 0-1-2-...-7 labeled from the high end needs ~n rounds
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        with pytest.raises(RuntimeError, match="fixpoint"):
            neardup_clusters(verts, pairs, max_iter=1)
