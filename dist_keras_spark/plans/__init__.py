"""Query plan library. Importing this package registers every query.

Each query is a `(spark, sf_dir) -> DataFrame` callable registered in
`registry.QUERIES`, optionally paired with a DuckDB oracle SQL string
in `registry.ORACLE` (driver contract, __spark_entry__.py).
"""

from dist_keras_spark.plans import registry
from dist_keras_spark.plans.registry import ORACLE, QUERIES

# Import for side effect: each module registers its queries.
from dist_keras_spark.plans import (  # noqa: E402,F401
    aggregates,
    events_time,
    extras,
    features,
    llm,
    ml,
    multimodal_stream,
    relational,
    scalars,
    tpch,
    windows,
)

__all__ = ["registry", "QUERIES", "ORACLE"]
