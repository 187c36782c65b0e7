"""SQL entry surface, grouped-map, stateful streaming, embedding dedup.

Covers the remaining SURVEY.md §2 rows: the spark.sql+temp-view entry
(§1.1), applyInPandas grouped-map (§2.L), applyInPandasWithState (K7),
and embedding-cosine near-dedup (§2.J).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt, register_views

_Q3_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 20
"""


@query("sql_entry_q3", oracle=_Q3_SQL)
def sql_entry_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.1 SQL surface: temp views + spark.sql — the SAME SQL text the
    DuckDB oracle runs (shared ANSI subset), proving the engine's SQL
    entry point, not just the DataFrame DSL."""
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q3_SQL)


@query(
    "grouped_zscore",
    oracle="""
SELECT lang,
       CAST(n_chars AS DOUBLE) AS n_chars,
       round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
             / stddev_samp(n_chars) OVER (PARTITION BY lang), 6) AS zscore
FROM documents
""",
)
def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.L grouped-map: per-language z-score of document length via
    applyInPandas (Arrow batch per group); oracle replays it with SQL
    window aggregates. At scale prefer the pure-window form (JVM);
    the grouped-map exists for logic SQL can't express."""
    from dist_keras_spark.operators.grouped import zscore_per_group

    d = _lt(spark, sf_dir, "documents").withColumn(
        "n_chars", F.col("n_chars").cast("double")
    )
    return zscore_per_group(d, "lang", "n_chars")


@query(
    "stateful_user_totals_live",
    oracle="""
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
""",
)
def stateful_user_totals_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7 as REAL streaming: applyInPandasWithState keeps per-user
    (count, sum) state; with an availableNow replay the final state
    equals the batch aggregate, which is the oracle."""
    from dist_keras_spark.streaming.pipelines import run_available_now, stream_events
    from dist_keras_spark.streaming.stateful import running_user_totals

    out = running_user_totals(stream_events(spark, sf_dir))
    return run_available_now(out, output_mode="update")


@query(
    "dedup_embedding_cosine",
    oracle="""
SELECT e.vec_id FROM embeddings e
ANTI JOIN (
    SELECT DISTINCT a.vec_id
    FROM embeddings a JOIN embeddings b ON b.vec_id < a.vec_id
    WHERE list_sum(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
           * sqrt(list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
          >= 0.9
) d ON e.vec_id = d.vec_id
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-dedup by embedding: drop any vector with cosine ≥ 0.9 to a
    lower-id vector (semantic near-dup removal). Implemented as
    pair-scan → left-anti join; at scale the pair scan swaps for the
    LSH-bucketed candidate generator (same downstream)."""
    from dist_keras_spark.functions.arrays import dot, l2_norm

    e = _lt(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("va"),
                 l2_norm("embedding").alias("na"))
    b = e.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"),
                 l2_norm("embedding").alias("nb"))
    dup_of_earlier = (
        a.join(b, F.col("idb") < F.col("ida"))
        .filter(dot("va", "vb") / (F.col("na") * F.col("nb")) >= 0.9)
        .select(F.col("ida").alias("vec_id"))
        .distinct()
    )
    return e.join(dup_of_earlier, "vec_id", "left_anti").select("vec_id")
