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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


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


def _row(i: int):
    kinds = ("view", "click", "purchase")
    return (i, kinds[i % 3], (i * 37 % 1000) / 10.0)


class _SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same generator: offsets are plain row
    indices, `read` advances the offset and `readBetweenOffsets`
    replays any committed range deterministically — which is the
    whole replayability contract exactly-once streaming needs from a
    source. The bounded fixture (`rows` option) is emitted in one
    micro-batch because PythonMicroBatchStream's availableNow support
    falls back to single-batch execution."""

    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        i = start["i"]
        return iter([_row(j) for j in range(i, self.n_rows)]), {"i": self.n_rows}

    def readBetweenOffsets(self, start, end):
        return iter([_row(j) for j in range(start["i"], end["i"])])


class SyntheticEventsSource(DataSource):
    """spark.read.format("synthetic_events").option("rows", N)
    .option("partitions", P).load() → (event_id, kind, amount);
    also readable with spark.readStream (same rows, same oracle)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, kind string, amount double"

    def reader(self, schema):
        return _SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return _SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SyntheticEventsSource)


class _FileCommit(WriterCommitMessage):
    """Per-task commit message: the one file this task produced."""

    def __init__(self, filename: str):
        self.filename = filename


class _JsonlWriter(DataSourceWriter):
    """Executor-side writer with a driver-side commit protocol:

    - each task writes its rows to a uniquely-named JSONL file and
      returns the name in its commit message;
    - `commit` (driver, once, after ALL tasks succeed) atomically
      publishes the manifest listing exactly the committed files;
    - `abort` removes whatever partial files the failed attempt left.

    Readers resolve the manifest FIRST and read only listed files, so
    a torn write (task retry, job crash) is invisible — the same
    publish-via-manifest discipline as sources/snapshots.py, here at
    the custom-connector layer. At scale each task streams its
    partition; nothing aggregates on the driver but filenames."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, fname)
        with open(full, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
        return _FileCommit(fname)

    def commit(self, messages):
        import json
        import os

        files = sorted(m.filename for m in messages if m is not None)
        tmp = os.path.join(self.path, "_manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"files": files}, f)
        os.replace(tmp, os.path.join(self.path, "_manifest.json"))

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlManifestSink(DataSource):
    """df.write.format("jsonl_manifest").option("path", p).save() —
    a custom Python Data Source WRITE path (the sink-side twin of
    SyntheticEventsSource's read/stream faces)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool):
        return _JsonlWriter(self.options, overwrite)


def read_manifest_files(path: str) -> list[str]:
    """The committed file list (absolute paths) for a JsonlManifestSink
    directory; raises if nothing was ever committed."""
    import json
    import os

    with open(os.path.join(path, "_manifest.json")) as f:
        files = json.load(f)["files"]
    return [os.path.join(path, f) for f in files]


def register_sink(spark) -> None:
    """Idempotent registration of the custom sink on a session."""
    spark.dataSource.register(JsonlManifestSink)
