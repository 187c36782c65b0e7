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


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 16) - 1), min_size=1, max_size=20
    ),
    st.lists(
        st.integers(min_value=0, max_value=(1 << 16) - 1), min_size=1, max_size=20
    ),
)
def test_zorder_bijective_and_bounded(spark, xs, ys):
    """z_value is a bijection on (a, b) pairs (interleaving loses no
    bits) and bounded by 2^(2·bits)."""
    from dist_keras_spark.functions.zorder import z_value

    n = min(len(xs), len(ys))
    pairs = list(dict.fromkeys(zip(xs[:n], ys[:n])))
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select("a", "b", z_value(F.col("a"), F.col("b")).alias("z")).collect()
    assert len({r.z for r in rows}) == len(pairs)  # injective on distinct pairs
    for r in rows:
        assert 0 <= r.z < (1 << 32)
        # de-interleave reproduces the inputs exactly
        a = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (a, b) == (r.a, r.b)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=12,
    )
)
def test_ewma_bounded_by_series_range(spark, xs):
    """A convex-combination smoother can never leave [min, max] of its
    inputs — pins the closed-form weight algebra in events_ewma_last."""
    rows = [(1, i, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    from pyspark.sql import Window as W

    wk = W.partitionBy("user_id").orderBy("event_id")
    seq = df.select(
        "user_id",
        "value",
        F.row_number().over(wk).alias("i"),
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n"),
    )
    weight = F.when(F.col("i") == 1, F.pow(F.lit(0.7), F.col("n") - 1)).otherwise(
        F.lit(0.3) * F.pow(F.lit(0.7), F.col("n") - F.col("i"))
    )
    out = seq.groupBy("user_id").agg(F.sum(weight * F.col("value")).alias("ewma"))
    ewma = out.collect()[0].ewma
    assert min(xs) - 1e-9 <= ewma <= max(xs) + 1e-9


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=10),
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=10),
)
def test_asof_forward_backward_duality(spark, lts, rts):
    """Mirror symmetry: forward as-of on t equals backward as-of on -t
    (with the tie/tiebreak conventions mirrored)."""
    from dist_keras_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(lts)], "k long, t long, lid long"
    )
    right = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(rts)], "k long, t long, rid long"
    )
    fwd = {
        r.lid: r.rid
        for r in asof_join(
            left,
            right.select("k", "t", "rid"),
            key="k",
            left_ts="t",
            right_ts="t",
            value_cols=["rid"],
            how="left",
            direction="forward",
            tiebreak="rid",
        ).collect()
    }
    neg_l = left.select("k", (-F.col("t")).alias("t"), "lid")
    neg_r = right.select("k", (-F.col("t")).alias("t"), (-F.col("rid")).alias("rid"))
    bwd = {
        r.lid: (-r.rid if r.rid is not None else None)
        for r in asof_join(
            neg_l,
            neg_r,
            key="k",
            left_ts="t",
            right_ts="t",
            value_cols=["rid"],
            how="left",
            direction="backward",
            tiebreak="rid",
        ).collect()
    }
    assert fwd == bwd


_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=1, max_value=20),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(_intervals)
def test_sweepline_peak_matches_bruteforce(spark, iv):
    """Sweep-line peak == brute-force max overlap over half-open
    [s, s+d) intervals, evaluated at every start point."""
    from pyspark.sql import Window as W

    rows = [(1, s, s + d) for s, d in iv]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    sweep = df.select("k", F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        df.select("k", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = W.partitionBy("k").orderBy("t", "d").rowsBetween(W.unboundedPreceding, 0)
    got = (
        sweep.withColumn("r", F.sum("d").over(w))
        .agg(F.max("r"))
        .first()[0]
    )
    expect = max(
        sum(1 for s, d in iv if s <= t < s + d) for t in {s for s, _ in iv}
    )
    assert got == expect


_points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=1,
    max_size=15,
)


@settings(max_examples=8, deadline=None)
@given(_points)
def test_skyline_window_sweep_matches_dominance(spark, pts):
    """The RANGE-window skyline formulation == the O(n²) dominance
    definition (minimize price, maximize size), on arbitrary points
    including duplicates and price ties."""
    from pyspark.sql import Window as W

    rows = [(i, p, s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "pid long, price long, size long")
    w_strict = W.orderBy("price").rangeBetween(W.unboundedPreceding, -1)
    w_tie = W.orderBy("price").rangeBetween(0, 0)
    flagged = df.select(
        "pid",
        F.max("size").over(w_strict).alias("mc"),
        F.max("size").over(w_tie).alias("mt"),
        "price",
        "size",
    )
    dominated = (
        F.coalesce(F.col("mc") >= F.col("size"), F.lit(False))
    ) | (F.col("mt") > F.col("size"))
    got = {r.pid for r in flagged.filter(~dominated).collect()}
    expect = {
        i
        for i, (p, s) in enumerate(pts)
        if not any(
            q <= p and t >= s and (q < p or t > s) for q, t in pts
        )
    }
    assert got == expect


_weighted = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100),  # value
        st.integers(min_value=1, max_value=9),  # weight
    ),
    min_size=1,
    max_size=15,
)


@settings(max_examples=8, deadline=None)
@given(_weighted)
def test_weighted_median_cumulative_property(spark, wv):
    """Lower weighted median: the smallest value v (by the full sort
    order) whose cumulative weight reaches half the total."""
    from pyspark.sql import Window as W

    rows = [(i, v, w) for i, (v, w) in enumerate(wv)]
    df = spark.createDataFrame(rows, "rid long, v long, w long")
    wc = W.orderBy("v", "rid").rowsBetween(W.unboundedPreceding, 0)
    cum = df.select(
        "v",
        F.sum("w").over(wc).alias("c"),
        F.sum("w").over(W.partitionBy()).alias("total"),
    )
    got = cum.filter(2 * F.col("c") >= F.col("total")).agg(F.min("v")).first()[0]
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    total = sum(w for _, _, w in ordered)
    acc = 0
    for _, v, w in ordered:
        acc += w
        if 2 * acc >= total:
            expect = v
            break
    assert got == expect


# --- exact substring (50-gram) dedup: injected span is always caught,
# --- token-disjoint docs never pair (operators/dedup.py:substring_dup_pairs)

_span_case = st.tuples(
    st.integers(min_value=50, max_value=70),   # shared span length
    st.integers(min_value=0, max_value=20),    # prefix tokens on doc A
    st.integers(min_value=0, max_value=20),    # suffix tokens on doc B
    st.integers(min_value=0, max_value=3),     # extra disjoint docs
)


@settings(max_examples=8, deadline=None)
@given(_span_case)
def test_substring_dedup_injects_and_disjoint(spark, case):
    """A pair sharing an injected >=50-token span is ALWAYS reported;
    documents over disjoint token alphabets are NEVER reported."""
    from dist_keras_spark.operators.dedup import substring_dup_pairs

    span_len, n_pre, n_suf, n_extra = case
    span = " ".join(f"s{i}" for i in range(span_len))
    doc_a = " ".join(["a"] * n_pre + [span])
    doc_b = " ".join([span] + ["b"] * n_suf)
    # Disjoint docs: unique alphabet per doc, 60 tokens each (long
    # enough to have 50-grams, so absence of pairs is non-vacuous).
    extras = [
        (100 + j, " ".join(f"x{j}_{k}" for k in range(60)))
        for j in range(n_extra)
    ]
    df = spark.createDataFrame(
        [(0, doc_a), (1, doc_b)] + extras, "doc_id long, text string"
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in substring_dup_pairs(df, n=50).collect()
    }
    assert (0, 1) in pairs, "injected shared 50-token span not caught"
    assert pairs == {(0, 1)}, f"disjoint docs falsely paired: {pairs}"
