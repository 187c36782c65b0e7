"""Scale-posture features: bucketed co-located joins (no shuffle),
dynamic partition pruning, approx-percentile accuracy, EAMSGD mode."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dist_keras_spark.sources.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """bucketBy on the join key → sort-merge join with zero Exchange
    on either side (the 100 TB co-location strategy)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("orders_b")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("lineitem_b")
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join must not shuffle"
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        import shutil

        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A partitioned fact joined to a filtered dim → DPP subquery in
    the scan (partitions pruned at runtime, not post-scan)."""
    p = str(tmp_path / "li_part")
    li = load_table(spark, sf_dir, "lineitem")
    li.write.partitionBy("l_returnflag").parquet(p)
    fact = spark.read.parquet(p)
    # DPP requires a *filtered* dim side (the filter's result seeds the
    # runtime pruning subquery; an unfiltered literal dim doesn't trigger)
    dim = spark.createDataFrame(
        [("A", "keep"), ("N", "drop")], "flag string, tag string"
    ).filter(F.col("tag") == "keep")
    joined = fact.join(dim, fact.l_returnflag == dim.flag)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "SubqueryBroadcast" in plan, plan[:2000]
    assert joined.count() == li.filter(F.col("l_returnflag") == "A").count()


def test_approx_percentile_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.percentile("l_extendedprice", 0.5).alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_eamsgd_mode_trains(spark, sf_dir):
    from dist_keras_spark.operators.trainers import EAMSGD

    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("embedding").alias("features"), "label")
    )
    t = EAMSGD(64, 16, 10, num_workers=4, rounds=6, learning_rate=0.1)
    t.train(df)
    losses = [h["loss"] for h in t.history]
    assert losses[-1] < losses[0]


def test_unknown_trainer_mode_rejected():
    from dist_keras_spark.operators.trainers import SyncDistributedTrainer

    with pytest.raises(ValueError, match="unknown mode"):
        SyncDistributedTrainer(4, 2, 2, mode="gossip")


def test_elastic_modes_default_multi_step_window():
    """easgd/eamsgd with communication_window=1 degenerate to plain
    rho-scaled SGD (no local drift to elastically average), so the
    elastic modes must default to a local-SGD window > 1."""
    from dist_keras_spark.operators.trainers import AEASGD, EAMSGD, ADAG

    assert AEASGD(4, 2, 2).communication_window > 1
    assert EAMSGD(4, 2, 2).communication_window > 1
    assert ADAG(4, 2, 2).communication_window == 1
    # explicit override still honored
    assert AEASGD(4, 2, 2, communication_window=3).communication_window == 3


def test_unflatten_never_aliases_the_flat_buffer():
    """Regression: _unflatten must COPY — a view would let a model's
    in-place SGD steps mutate the broadcast center buffer, zeroing the
    reported center→local movement (elastic modes silently froze)."""
    import numpy as np

    from dist_keras_spark.operators.models import MLP
    from dist_keras_spark.operators.trainers import _flatten, _unflatten

    like = MLP(4, 3, 2).get_weights()
    flat = _flatten(like)
    before = flat.copy()
    m = MLP(4, 3, 2)
    m.set_weights(_unflatten(flat, like))
    for w in m.get_weights():
        w -= 1.0  # in-place update, as sgd_epoch does
    assert np.array_equal(flat, before), "flat buffer mutated through a view"
    assert np.linalg.norm(_flatten(m.get_weights()) - flat) > 0
