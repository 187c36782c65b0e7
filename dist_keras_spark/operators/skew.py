"""Skew-mitigation operators (SURVEY.md §4: the 100 TB posture).

AQE's skew-join splitting handles sort-merge skew automatically
(enabled in session.py); `salted_join` is the explicit fallback for
the cases AQE can't fix — e.g. a broadcast-ineligible dimension with
one catastrophically hot key, or aggregations whose single hot group
overwhelms one reducer (`salted_count`).

salted_join(left, right, key, salt_n):
  left gets a random salt in [0, salt_n); right is replicated salt_n
  times; the join key becomes (key, salt) — the hot key's rows spread
  over salt_n reducers at the cost of replicating the (smaller) right
  side salt_n×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame, right: DataFrame, key: str, salt_n: int = 8, how: str = "inner"
) -> DataFrame:
    """Equi-join with a salted key to spread a skewed left side."""
    l_s = left.withColumn("__salt", (F.rand(seed=42) * salt_n).cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    out = l_s.join(r_s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count(df: DataFrame, key: str, salt_n: int = 16) -> DataFrame:
    """Two-phase count for a hot group key: partial count on
    (key, salt), final sum on key. Spark's partial aggregation already
    does this for built-in aggs; the explicit form is for custom
    aggregates (e.g. pandas UDAFs) that lack map-side combine."""
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * salt_n).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__pc"))
    )
    return partial.groupBy(key).agg(F.sum("__pc").alias("n"))
