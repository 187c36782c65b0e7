"""Z-order (Morton) curve encoding as pure column expressions.

Multi-dimensional data layout: sorting a table by the bit-interleaved
z-value of two columns clusters BOTH dimensions simultaneously, so
file-level min/max statistics prune scans on either predicate — the
standard lakehouse OPTIMIZE ZORDER BY layout, expressed Spark-first
(integer bit math the optimizer folds into whole-stage codegen; no
UDF, no driver loop).

At 100 TB: compute `z_value`, `repartitionByRange(z)` (range
partitioner samples the distribution), sort within partitions, write.
Every output file then covers a tight hyper-rectangle in (a, b) space
and parquet row-group stats do the pruning for both columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative ints into a
    Morton code (a's bit i → position 2i, b's bit i → position 2i+1).

    Pure shift/and/or column arithmetic — 2·bits terms summed, all
    JVM-side, identical integer semantics in any engine (the DuckDB
    oracle replays the same expression)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
            + (F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z
