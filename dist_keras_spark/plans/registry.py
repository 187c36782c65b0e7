"""Registry wiring query callables to their DuckDB oracle SQL.

Driver contract (__spark_entry__.py): `queries()[name](spark, sf_dir)`
runs the Spark plan; `oracle_sql()[name]` is equivalent ANSI SQL DuckDB
executes over the same parquet (views pre-registered). The driver
compares row-count + schema + order-insensitive value-hash, sorting
columns by name — so EVERY computed column must carry the same alias
on both sides.

Queries with no SQL equivalent (approx algorithms, training loops,
streaming) register with oracle=None → the driver's weaker rows-only
check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query plan and (optionally) its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def promote(*names: str) -> None:
    """Move queries to the FRONT of registration order, in the given
    order (dicts preserve insertion order; the driver's correctness
    harness checks the first 50). Used to rotate a chosen set of
    queries into the driver-checked window each round; everything else
    keeps its relative order after them."""
    missing = [n for n in names if n not in QUERIES]
    if missing:
        raise KeyError(f"promote: unknown queries {missing!r}")
    front = {n: QUERIES[n] for n in names}
    rest = {k: v for k, v in QUERIES.items() if k not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)


def demote(*names: str) -> None:
    """Move queries to the END of registration order (dicts preserve
    insertion order; the driver's correctness harness checks the first
    50). Used to keep rows-only queries (whose driver signal is just
    "ran clean" — already pytest-gated) out of the oracle-checked
    window in favor of hash-verifiable ones."""
    for n in names:
        QUERIES[n] = QUERIES.pop(n)
        if n in ORACLE:
            ORACLE[n] = ORACLE.pop(n)
