"""Barrier-mode allreduce and the two-phase quantile bucketing."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from dist_keras_spark.operators.barrier import barrier_allreduce_mean
from dist_keras_spark.operators.similarity import approx_quantile_buckets


def test_barrier_allreduce_matches_driver_mean(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(4)
    got = barrier_allreduce_mean(e, "embedding")
    pdf = e.select("embedding").toPandas()
    expected = np.stack(pdf["embedding"].to_numpy()).astype(np.float64).mean(axis=0)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-9)


def test_approx_quantile_buckets_agree_with_ntile(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bucketed = approx_quantile_buckets(
        o, "o_totalprice", n_buckets=4, id_cols=["o_orderkey"], relative_error=0.0001
    )
    from pyspark.sql import Window as W

    exact = o.select(
        "o_orderkey",
        F.ntile(4).over(W.orderBy("o_totalprice", "o_orderkey")).alias("tile"),
    )
    joined = bucketed.join(exact, "o_orderkey")
    agree = joined.filter(F.col("bucket") == F.col("tile")).count() / joined.count()
    assert agree > 0.98, f"bucket/ntile agreement {agree:.3f}"
    # all four buckets populated, roughly balanced
    sizes = {r["bucket"]: r["count"] for r in bucketed.groupBy("bucket").count().collect()}
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) < 2 * min(sizes.values())
