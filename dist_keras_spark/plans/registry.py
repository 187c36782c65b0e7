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

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

_CONTAINER_TYPES = (T.ArrayType, T.MapType, T.StructType)


def assert_driver_hashable(name: str, df: DataFrame) -> DataFrame:
    """Reject result schemas the driver's value-hash canon can't handle.

    The driver sorts columns by name and factorizes/hashes cell values;
    container cells (array/map/struct) crash that canon (the r3
    `feature_reshape` incident). House convention: serialize containers
    to a string column suffixed `_csv`/`_json` before returning. This
    fires at *query invocation* (schema is known without executing the
    plan), the earliest point the schema exists.
    """
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _CONTAINER_TYPES)
    ]
    if bad:
        raise TypeError(
            f"query {name!r} returns container-typed column(s) {bad} — "
            "the driver hash canon only handles scalar cells; serialize "
            "to a *_csv/*_json string column instead"
        )
    return df


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query plan and (optionally) its oracle SQL.

    The registered callable is wrapped to assert the returned schema is
    driver-hashable (scalar columns only) — see `assert_driver_hashable`.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return assert_driver_hashable(name, fn(spark, sf_dir))

        QUERIES[name] = wrapped
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
