"""Data-quality checks and deterministic sampling — the validation /
subsetting layer of a training-data pipeline (north star: operations
a large-scale data pipeline needs beyond the reference's surface).

Checks are pure aggregates (one pass, map-side combined); sampling is
content-hash-based so the same row always lands in the same split
regardless of partitioning, executor count, or engine — the property
that makes train/eval splits reproducible at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_summary(
    df: DataFrame,
    unique_cols: list[str] | None = None,
    not_null_cols: list[str] | None = None,
    range_checks: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """One-row violation summary: duplicate count over `unique_cols`,
    null counts per `not_null_cols`, out-of-range counts per
    `range_checks` {col: (lo, hi)}. Single aggregation job."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    if unique_cols:
        aggs.append(
            (
                F.count(F.lit(1))
                - F.countDistinct(*[F.col(c) for c in unique_cols])
            ).alias("dup_violations")
        )
    for c in not_null_cols or []:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    for c, (lo, hi) in (range_checks or {}).items():
        aggs.append(
            F.sum((~F.col(c).between(lo, hi)).cast("long")).alias(f"oob_{c}")
        )
    return df.agg(*aggs)


def hash_split(
    df: DataFrame, key_col: str, buckets: int = 100
) -> Column:
    """Deterministic content-hash bucket in [0, buckets): derived from
    the first 4 hex chars of md5(key) so it is reproducible across
    engines, partitionings and runs (unlike rand()/sampleBy)."""
    nibble = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10)
    return F.pmod(nibble.cast("long"), F.lit(buckets))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction_pct: int
) -> DataFrame:
    """Keep rows whose hash bucket < fraction_pct (out of 100)."""
    return df.filter(hash_split(df, key_col, 100) < fraction_pct)
