"""Sinks (SURVEY.md §2.A A5/A6): parquet, partitioned parquet.

Partitioned layout is the 100 TB posture: `partitionBy` on a
low-cardinality natural key gives static + dynamic partition pruning
on every downstream scan (§4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scratch_path(spark, name: str) -> str:
    """Session-unique scratch dir for sink round-trip queries.

    Keyed on the Spark applicationId so two concurrent sessions
    (pytest-xdist worker + driver gate + dev shell) can never clobber
    each other's half-written files, and a predictable world-shared
    /tmp name can't be symlink-squatted by another user. Within ONE
    session the path is stable, so repeated runs of the same query
    overwrite their own output rather than accreting directories."""
    import tempfile

    app = spark.sparkContext.applicationId
    return f"{tempfile.gettempdir()}/spark_graft_{app}/{name}"


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """A5: plain parquet sink."""
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """A6: hive-layout partitioned sink (one directory level per col)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Upsert-by-partition: dynamic partition overwrite replaces ONLY
    the partitions present in `df`, leaving the rest of the table
    untouched — the parquet-native incremental-load pattern (static
    overwrite would truncate the whole table)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_parquet(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ~target-sized files (returns the file count written). Streaming
    sinks and incremental loads accrete small files; scan cost at
    100 TB is dominated by file-open overhead once files ≪ the scan
    split size.

    Crash safety: the rewrite lands in a temp dir, then the live dir is
    renamed ASIDE (not deleted) before the temp dir takes its place, and
    only then is the old data removed. A failure at any step leaves a
    complete copy of the data on disk — either the live path or the
    `.__compact_old__` dir — never a deleted live path with data only
    in a temp dir.

    Hive partitioning is preserved: partition columns are detected from
    `key=value` directory levels and re-applied with `partitionBy`, so
    compaction never flattens the layout or loses partition pruning.

    Scope: local/POSIX filesystems (os.rename atomicity + os.walk
    sizing). On HDFS/object stores run the same rewrite through the
    FileSystem API instead — on S3-like stores "rename" is a copy, so
    the atomic-promote step should become a catalog/manifest swap
    (Iceberg/Delta-style) rather than a directory rename.
    """
    import math
    import shutil
    import os

    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    # Recovery from a hard kill (SIGKILL/power loss) in a previous run,
    # BEFORE touching the live path: a stale `old` with no live `path`
    # means the crash hit between the two renames — restore it. A stale
    # `old` WITH a live path (or a stale tmp) is leftover garbage that
    # would make the renames below fail confusingly — clear it now.
    if os.path.exists(old):
        if not os.path.exists(path):
            os.rename(old, path)
        else:
            shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    df = spark.read.parquet(path)
    # Detect hive partition columns from the first key=value dir chain.
    partition_cols: list[str] = []
    probe = path
    while True:
        subdirs = [
            d
            for d in os.listdir(probe)
            if "=" in d and os.path.isdir(os.path.join(probe, d))
        ]
        if not subdirs:
            break
        partition_cols.append(subdirs[0].split("=", 1)[0])
        probe = os.path.join(probe, subdirs[0])
    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    if partition_cols:
        # Hash on the partition cols so each hive partition is written
        # by exactly one task — otherwise every task can emit a file
        # into every partition, recreating the small-file problem.
        shaped = df.repartition(n_files, *partition_cols)
        shaped.write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)  # live data set aside, still intact
    try:
        os.rename(tmp, path)  # new data goes live
    except BaseException:
        os.rename(old, path)  # roll back: restore the live path
        raise
    shutil.rmtree(old)  # only now is the old copy discarded
    return n_files
