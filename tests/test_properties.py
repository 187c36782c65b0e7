"""Property-based invariants (hypothesis; SURVEY.md §5.2.5)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from dist_keras_spark.operators.dedup import exact_dedup
from dist_keras_spark.operators.transformers import (
    LabelIndexTransformer,
    MinMaxTransformer,
    OneHotTransformer,
)

_ints = st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=20)
_floats = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=20
)


@settings(max_examples=10, deadline=None)
@given(_ints)
def test_onehot_argmax_identity(spark, labels):
    df = spark.createDataFrame([(x,) for x in labels], "label int")
    out = LabelIndexTransformer(input_col="oh", output_col="idx").transform(
        OneHotTransformer(10, "label", "oh").transform(df)
    )
    assert all(r["idx"] == float(r["label"]) for r in out.collect())


@settings(max_examples=10, deadline=None)
@given(_floats)
def test_minmax_bounds(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    out = MinMaxTransformer(0, 1, -100, 100, "x", "s").transform(df)
    assert all(-1e-9 <= r["s"] <= 1 + 1e-9 for r in out.collect())


@settings(max_examples=10, deadline=None)
@given(_ints, _ints)
def test_union_count_additive(spark, a, b):
    da = spark.createDataFrame([(x,) for x in a], "v int")
    db = spark.createDataFrame([(x,) for x in b], "v int")
    assert da.union(db).count() == len(a) + len(b)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abc", min_size=1, max_size=5), min_size=1, max_size=15))
def test_dedup_idempotent_and_distinct(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    once = exact_dedup(df, "text", keep_order=["id"])
    assert once.count() == len(set(texts))
    assert exact_dedup(once, "text", keep_order=["id"]).count() == once.count()
    # filter commutes with project
    lhs = df.filter(F.col("text") == "a").select("id")
    rhs = df.select("id", "text").filter(F.col("text") == "a").select("id")
    assert sorted(r["id"] for r in lhs.collect()) == sorted(r["id"] for r in rhs.collect())
