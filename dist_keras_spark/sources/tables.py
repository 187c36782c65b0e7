"""Fixture-table catalog (TESTDATA.md star schema + events/documents/embeddings).

Parquet scans are the engine's primary source. We rely on Catalyst for
predicate pushdown + column pruning (verify with
``df.explain('formatted')`` → PushedFilters / ReadSchema), so loaders
return *lazy* DataFrames, never cached/collected.

The `events.ts` column is nanosecond parquet; Spark truncates to µs on
read — callers that compare against the DuckDB oracle should bucket or
truncate to ms (SURVEY.md §7.3).
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table.

    `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
    outright (PARQUET_TYPE_ILLEGAL). We read it as raw nanos
    (legacy nanosAsLong) and truncate to µs with *integer* division —
    ns-since-epoch (~1.7e18) overflows a double's 53-bit mantissa, so
    a float division here would corrupt timestamps by ±0.25 µs.
    DuckDB truncates the same file to µs `TIMESTAMP` on read, so both
    engines agree exactly at µs precision.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return spark.read.parquet(f"{sf_dir}/{name}.parquet").withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register fixture tables as temp views so plans can use spark.sql."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
