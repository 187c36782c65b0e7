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
