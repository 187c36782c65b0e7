"""Round-8 operators: exact-substring (50-gram) training-data dedup,
the Gopher/C4 named quality-rule suite, and the AveragingTrainer
weight-mean replay.

All three extend the LLM training-data layer (SURVEY.md §2.J) or close
a trainer blind spot (§2.I) the optimizer-replay way. dist-keras has
no analogue for the first two — "beyond the reference" surface, mapped
in COVERAGE.md.

House rules: md5 is the engine-portable fingerprint (Spark md5() ==
DuckDB md5() byte-for-byte); integer cents via floor(x*100); every
float constant that must agree across engines is the repr() of the
same Python-computed IEEE double on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_keras_spark.operators.dedup import substring_dup_pairs
from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt


@query(
    "substring_dedup_50gram",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+49], ' ')) AS fp
  FROM toks, unnest(range(1, len(t) - 49 + 1)) AS r(i)
  WHERE len(t) >= 50
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM grams a JOIN grams b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
""",
)
def substring_dedup_50gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup at 50-grams — the Lee et al. 2022
    ExactSubstr criterion (documents sharing any 50-token span are
    duplicates), computed via a bucketed inverted index of md5 span
    fingerprints instead of the paper's single-node suffix array.
    The oracle replays the IDENTICAL fingerprint arithmetic in DuckDB
    (md5 agrees across engines), so candidate generation, not just
    the final pair set, is pinned. One (id, fp) shuffle; text never
    leaves the scan stage. See operators/dedup.py:substring_dup_pairs
    for the 100 TB shape and the max_df stop-span valve."""
    docs = _lt(spark, sf_dir, "documents")
    return substring_dup_pairs(docs, n=50)


@query(
    "weight_average_exact",
    oracle="""
WITH sh AS (
  SELECT l_suppkey % 8 AS shard,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) % 997 AS BIGINT) AS w1,
         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) % 997
              AS BIGINT) AS w2,
         CAST(sum(l_partkey) % 997 AS BIGINT) AS w3,
         CAST(sum(l_orderkey) % 997 AS BIGINT) AS w4
  FROM lineitem GROUP BY 1
), unp AS (
  SELECT shard, n, 'w1' AS component, w1 AS w FROM sh
  UNION ALL SELECT shard, n, 'w2', w2 FROM sh
  UNION ALL SELECT shard, n, 'w3', w3 FROM sh
  UNION ALL SELECT shard, n, 'w4', w4 FROM sh
)
SELECT component,
       CAST(sum(w * n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS merged,
       CAST(count(*) AS BIGINT) AS n_shards
FROM unp GROUP BY component
""",
)
def weight_average_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-exact replay of the AveragingTrainer merge rule (I3/D10,
    operators/trainers.py:weighted_mean_merge) — the last trainer
    whose arithmetic had no oracle twin. Eight 'shards' are built from
    lineitem (shard = l_suppkey mod 8) with a 4-component
    integer-quantized weight vector per shard (mod-997 sums, so every
    payload·n product stays far under 2^53); the merge
    Σ(w·n) / Σn is computed with INTEGER sums and ONE final double
    division — bitwise-identical across Spark, DuckDB, and the
    trainer's own numpy merge (integer-valued float64 sums are exact
    in any order; tests/test_ml.py pins weighted_mean_merge to this
    query's formulation on the same shard values).

    100 TB shape: one groupBy(shard) partial-aggregated scan, a
    4-row-per-shard stack, and an 8·4-row final agg — the merge cost
    is O(shards·components), never O(rows)."""
    l = _lt(spark, sf_dir, "lineitem")
    sh = l.groupBy(F.pmod(F.col("l_suppkey"), F.lit(8)).alias("shard")).agg(
        F.count(F.lit(1)).alias("n"),
        F.pmod(F.sum(F.col("l_quantity").cast("long")), F.lit(997)).alias("w1"),
        F.pmod(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")),
            F.lit(997),
        ).alias("w2"),
        F.pmod(F.sum(F.col("l_partkey").cast("long")), F.lit(997)).alias("w3"),
        F.pmod(F.sum(F.col("l_orderkey").cast("long")), F.lit(997)).alias("w4"),
    )
    unp = sh.select(
        "shard",
        "n",
        F.expr(
            "stack(4, 'w1', w1, 'w2', w2, 'w3', w3, 'w4', w4) AS (component, w)"
        ),
    )
    return unp.groupBy("component").agg(
        (
            F.sum(F.col("w") * F.col("n")).cast("double")
            / F.sum("n").cast("double")
        ).alias("merged"),
        F.count(F.lit(1)).alias("n_shards"),
    )
