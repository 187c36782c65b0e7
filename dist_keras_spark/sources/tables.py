"""Fixture-table catalog (TESTDATA.md star schema + events/documents/embeddings).

Parquet scans are the engine's primary source. We rely on Catalyst for
predicate pushdown + column pruning (verify with
``df.explain('formatted')`` → PushedFilters / ReadSchema), so loaders
return *lazy* DataFrames, never cached/collected.

The `events.ts` column has shipped as both nanosecond and microsecond
parquet across fixture generations; `normalize_events_ts` branches on
the observed read schema so either encoding works (SURVEY.md §7.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables that are safe to ALWAYS broadcast: only the SF-invariant dims
# (region 5 rows, nation 25). Everything else — supplier (SF·10k),
# customer (SF·150k), part (SF·200k) — scales linearly with SF: at
# 100 TB lineitem (≈ SF 1e5) supplier alone is ~1e9 rows / hundreds of
# GB, so a broadcast hint OOMs. AQE still broadcasts any of them at
# runtime when the observed size fits — the hint would only remove
# that safety net.
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize `events.ts` to a microsecond timestamp, whatever the
    fixture generation shipped.

    - `timestamp[ns]` parquet: Spark 4 rejects it outright
      (PARQUET_TYPE_ILLEGAL) unless ``spark.sql.legacy.parquet.nanosAsLong``
      is set, in which case `ts` reads as raw ns BIGINT. We truncate to
      µs with *integer* division — ns-since-epoch (~1.7e18) overflows a
      double's 53-bit mantissa, so float division would corrupt
      timestamps by ±0.25 µs. DuckDB truncates the same file to µs on
      read, so both engines agree exactly at µs precision.
    - `timestamp[us]` parquet (current fixtures, regenerated
      2026-08-13): Spark reads TIMESTAMP_NTZ natively and matches
      DuckDB exactly — pass through untouched so `ts` predicates stay
      raw-column comparisons that push down to parquet stats.

    Shared by the batch loader and streaming/pipelines.stream_events so
    the two paths can't diverge.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table (events ts normalized —
    see `normalize_events_ts`)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # Harmless for µs files; required to even read a ns file.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register fixture tables as temp views so plans can use spark.sql."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
