"""dist_keras_spark — a PySpark-native analytics + distributed-ML engine.

Re-expresses the capabilities of the reference `cerndb/dist-keras`
(row-at-a-time RDD transformers, socket parameter-server trainers,
per-row predictors — see SURVEY.md) as idiomatic Spark DataFrame /
SQL / Structured Streaming plans, extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis) designed for 100 TB scale.

Layout:
    session      SparkSession factory (AQE on, Arrow on, UTC)
    sources      table loaders / readers / sinks
    functions    column-expression helpers (arrays, text, hashing)
    operators    feature transformers, predictors, evaluators, trainers,
                 dedup, similarity, as-of join, multimodal plumbing
    plans        relational query library over the fixture star schema
    streaming    windowed / stateful event processing
"""

from dist_keras_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
