"""Structured Streaming surface (SURVEY.md §2.K): file/rate sources,
watermarked windowed aggregations, streaming dedup, stream-static
joins, memory/foreachBatch sinks.

The reference has no streaming at all; this is ENG surface. The
design rule: every streaming pipeline here reuses the SAME column
expressions as its batch twin in plans/events_time.py — Spark's
unified semantics make the batch DuckDB oracle meaningful for the
stream, and tests/test_streaming.py asserts stream == batch.
"""

from dist_keras_spark.streaming.pipelines import (
    run_available_now,
    stream_events,
    streaming_dedup,
    streaming_session_agg,
    streaming_sliding_counts,
    streaming_stream_static_join,
    streaming_tumbling_counts,
)

__all__ = [
    "stream_events",
    "streaming_tumbling_counts",
    "streaming_session_agg",
    "streaming_sliding_counts",
    "streaming_dedup",
    "streaming_stream_static_join",
    "run_available_now",
]
