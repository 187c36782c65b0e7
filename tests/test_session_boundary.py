"""Session-window boundary semantics: Spark merges events exactly one
gap apart (inclusive). The DuckDB oracle for events_session_window
mirrors this with `<=` — this test pins the behavior so a Spark
version change that flips it fails loudly."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F


def test_exact_gap_merges(spark):
    ts = lambda s: datetime.fromisoformat(s)
    df = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00")), (1, ts("2024-01-01 10:30:00"))],
        "u long, ts timestamp",
    )
    out = df.groupBy(F.session_window("ts", "30 minutes"), "u").count().collect()
    assert len(out) == 1, "events exactly one gap apart must share a session"


def test_gap_plus_epsilon_splits(spark):
    ts = lambda s: datetime.fromisoformat(s)
    df = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00")), (1, ts("2024-01-01 10:30:00.000001"))],
        "u long, ts timestamp",
    )
    out = df.groupBy(F.session_window("ts", "30 minutes"), "u").count().collect()
    assert len(out) == 2, "a gap strictly beyond the duration must split"
