"""Utility operators mirroring distkeras/utils.py.

- `shuffle` (REF §shuffle ~L90, F1): random row reorder to decorrelate
  minibatches. Seeded rand column + repartition-by-rand — same
  multiset out, order randomized; deterministic given the seed.
- `precache` (REF §precache ~L100, A7): materialize a DataFrame in
  executor memory and force it with a count.

new_dataframe_row / serialize_keras_model have no engine equivalent on
purpose: rows are never rebuilt in Python (withColumn replaces it,
SURVEY.md §1.1) and model serialization lives in operators/models.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffle(df: DataFrame, seed: int = 42, num_partitions: int | None = None) -> DataFrame:
    """Randomly reorder rows (same multiset; seeded)."""
    n = num_partitions or df.rdd.getNumPartitions()
    return (
        df.withColumn("__r", F.rand(seed))
        .repartitionByRange(n, "__r")
        .sortWithinPartitions("__r")
        .drop("__r")
    )


def precache(df: DataFrame) -> int:
    """Cache + force materialization; returns the row count."""
    df.cache()
    return df.count()
