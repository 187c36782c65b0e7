"""Custom connector via the Python Data Source API (Spark 4,
pyspark.sql.datasource) — the public extension point for sources Spark
has no built-in reader for (internal services, bespoke formats).

`SyntheticEventsSource` is the reference implementation: a
PARTITIONED deterministic generator — `partitions()` returns one split
per shard and Spark schedules `read(partition)` calls across
executors, so a custom Python source parallelizes exactly like a file
scan (the single-partition default would funnel 100 TB through one
task). Rows derive from pure integer arithmetic on the global row id,
so any engine can replay the dataset (the DuckDB oracle uses range()).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _ShardPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        step = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _ShardPartition(i, min(i + step, self.n_rows))
            for i in range(0, self.n_rows, step)
        ]

    def read(self, partition: _ShardPartition):
        kinds = ("view", "click", "purchase")
        for i in range(partition.start, partition.end):
            yield (i, kinds[i % 3], (i * 37 % 1000) / 10.0)


class SyntheticEventsSource(DataSource):
    """spark.read.format("synthetic_events").option("rows", N)
    .option("partitions", P).load() → (event_id, kind, amount)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, kind string, amount double"

    def reader(self, schema):
        return _SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SyntheticEventsSource)
