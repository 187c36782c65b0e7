"""Sinks (SURVEY.md §2.A A5/A6): parquet, partitioned parquet.

Partitioned layout is the 100 TB posture: `partitionBy` on a
low-cardinality natural key gives static + dynamic partition pruning
on every downstream scan (§4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """A5: plain parquet sink."""
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """A6: hive-layout partitioned sink (one directory level per col)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
