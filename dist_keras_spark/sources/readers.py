"""Generic ingest (SURVEY.md §2.A A1/A3/A4): CSV / JSON / in-memory.

Schema policy (§1.1): inference is allowed only at ingest and only
when asked for (the reference inferSchema'd everywhere and re-inferred
after every operator); prefer passing an explicit StructType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """A1 (REF-ex examples/workflow.ipynb cell 2: the databricks-csv
    reader with header+inferSchema). Explicit schema skips the
    inference pass — at 100 TB inference reads the data twice."""
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options
) -> DataFrame:
    """A3: line-delimited JSON."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def from_rows(spark: SparkSession, rows: list, schema: StructType | str) -> DataFrame:
    """A4: in-memory rows → DataFrame (explicit schema, Arrow path)."""
    return spark.createDataFrame(rows, schema)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options
) -> DataFrame:
    """A2-adjacent: ORC scan (columnar like parquet; Spark's vectorized
    ORC reader + predicate pushdown apply the same way). Schema is
    self-describing, so an explicit schema is only a projection hint."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_text(spark: SparkSession, path: str, **options) -> DataFrame:
    """A1-adjacent: raw text scan — one row per line, single `value`
    string column. The ingest shape for unstructured corpora before
    parsing; splittable, so it parallelizes like any file source."""
    return spark.read.options(**options).text(path)
