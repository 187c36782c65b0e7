"""K4: watermark semantics — a late event must be dropped once the
watermark has passed its window.

Subtlety this test encodes (verified empirically on Spark 4.1): a
late row is only GUARANTEED dropped once its window's state has been
evicted, and eviction happens at the END of the batch in which the
watermark passes the window end. If the late row arrives in that same
batch it still merges (the documented "may not drop" looseness) — so
the advancing event and the late event sit two batches apart here."""

from __future__ import annotations

import time
import uuid
from datetime import datetime

import pyspark.sql.functions as F


def test_watermark_drops_late_event(spark, tmp_path):
    src = str(tmp_path / "src")
    ts = lambda s: datetime.fromisoformat(s)
    schema = "id long, ts timestamp, v double"

    def write(batch_dir: str, rows: list) -> None:
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{src}/{batch_dir}")
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    write("b1", [(1, ts("2024-01-01 10:05:00"), 1.0)])
    write("b2", [(2, ts("2024-01-01 12:59:00"), 1.0)])  # advances event time
    # batch 3 runs with watermark 12:49 → 10:00-11:00 window emitted and
    # its state evicted at batch end
    write("b3", [(3, ts("2024-01-01 13:01:00"), 1.0)])
    # batch 4: the 3-hours-late v=100.0 row hits evicted state → dropped
    write("b4", [(4, ts("2024-01-01 10:30:00"), 100.0)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/b*")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("v").alias("sv"))
        .select(F.col("w.start").alias("ws"), "sv")
    )
    name = "wm" + uuid.uuid4().hex[:8]
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["ws"]: r["sv"] for r in spark.table(name).collect()}
    assert rows.get(ts("2024-01-01 10:00:00")) == 1.0, f"late row not dropped: {rows}"
