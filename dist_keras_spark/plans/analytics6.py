"""Round-8 second wave: compliance/privacy scans (PII redaction,
k-anonymity), robust statistics (winsorization), ranking-quality
evaluation (MRR / NDCG over the integer-exact ANN ranking), DSIR-style
importance weighting, SemDeDup cluster-scoped embedding dedup, and
mean-shift change-point detection.

dist-keras has no analogue for any of these — "beyond the reference"
training-data-pipeline surface (brief: dedup / similarity / text
analysis are first-class), mapped in COVERAGE.md.

House rules (see analytics5.py): md5 is the engine-portable
fingerprint; integer cents via floor(x*100); BIGINT `div` (Spark) ==
`//` (DuckDB) on non-negative operands; every float constant that must
agree across engines is the repr() of the same Python-computed IEEE
double inlined on both sides; DuckDB regexp_replace needs the 'g'
flag for global replacement (Spark is global by default).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt

# Shared regexes for the PII scan. Restricted to the syntax subset
# where Java regex (Spark) and RE2 (DuckDB) agree: character classes,
# bounded/unbounded repetition, literal escapes — no lookaround, no
# backrefs (RE2 has neither).
_EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@query(
    "pii_redact_mask",
    oracle=f"""
WITH staged AS (
    SELECT c_custkey,
           'contact c' || CAST(c_custkey AS VARCHAR) || '@'
             || lower(c_mktsegment) || '.example.com or call +1-555-'
             || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             || ' about ' || c_name AS text
    FROM customer
)
SELECT c_custkey,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
           AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g')) AS masked_md5,
       CAST(length(regexp_replace(regexp_replace(text, '{_EMAIL_RE}',
                                                 '[EMAIL]', 'g'),
                                  '{_PHONE_RE}', '[PHONE]', 'g')) AS BIGINT)
           AS masked_len
FROM staged
""",
)
def pii_redact_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compliance scan: detect and mask PII (emails, phone numbers)
    before a corpus enters training — the standard pre-training
    redaction pass. The fixtures carry no real PII, so BOTH engines
    stage the identical deterministic contact strings from `customer`
    (the duplicated-staging house pattern, as in the streaming
    oracles), then the op under test — regexp_count detection +
    nested regexp_replace masking — runs on real regex machinery.
    The masked text is returned as md5 + length so the hash pins the
    exact redacted bytes, not just the counts.

    100 TB shape: zero shuffles — detection and masking are scan-side
    row-local regex work (WholeStageCodegen string kernels); at scale
    the same pass fuses with the quality gate (quality_gopher_rules)
    into one scan. Regex subset chosen where Java regex == RE2 (no
    lookaround/backrefs)."""
    c = _lt(spark, sf_dir, "customer")
    staged = c.select(
        "c_custkey",
        F.concat(
            F.lit("contact c"),
            F.col("c_custkey").cast("string"),
            F.lit("@"),
            F.lower("c_mktsegment"),
            F.lit(".example.com or call +1-555-"),
            F.lpad(F.pmod("c_custkey", F.lit(10000)).cast("string"), 4, "0"),
            F.lit(" about "),
            F.col("c_name"),
        ).alias("text"),
    )
    masked = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"),
        _PHONE_RE,
        "[PHONE]",
    )
    return staged.select(
        "c_custkey",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(masked).alias("masked_md5"),
        F.length(masked).cast("long").alias("masked_len"),
    )


@query(
    "k_anonymity_audit",
    oracle="""
SELECT CAST(c_nationkey AS BIGINT) AS qi_nation,
       c_mktsegment AS qi_segment,
       CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS qi_band,
       CAST(count(*) AS BIGINT) AS class_size,
       CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS BIGINT)
           AS suppressed
FROM customer
GROUP BY 1, 2, 3
""",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit: k-anonymity equivalence classes over the
    quasi-identifier tuple (nation, market segment, account-balance
    band) with k=5 — every class smaller than k is flagged for
    suppression before the table may be released (Sweeney 2002,
    public knowledge). The band is floor(acctbal/1000), exact on both
    engines (floor of a double is engine-portable; the band is the
    only derived QI).

    100 TB shape: ONE hash aggregation on the QI tuple with map-side
    partial aggregation; class count is bounded by the QI domain
    (nations × segments × bands), so the reduce side is tiny
    regardless of row count. The suppression flag is per-class
    arithmetic after the agg — no second pass over the data."""
    c = _lt(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.col("c_nationkey").cast("long").alias("qi_nation"),
            F.col("c_mktsegment").alias("qi_segment"),
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("qi_band"),
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            "qi_nation",
            "qi_segment",
            "qi_band",
            "class_size",
            F.when(F.col("class_size") < 5, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("suppressed"),
        )
    )


@query(
    "winsorize_clamp_stats",
    oracle="""
WITH cents AS (
    SELECT o_orderpriority,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderkey
    FROM orders
), ranked AS (
    SELECT o_orderpriority, cents,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY cents, o_orderkey) AS rn,
           count(*) OVER (PARTITION BY o_orderpriority) AS cnt
    FROM cents
), thresholds AS (
    SELECT o_orderpriority,
           max(CASE WHEN rn = CAST(ceil(0.01 * cnt) AS BIGINT)
                    THEN cents END) AS p01_cents,
           max(CASE WHEN rn = CAST(ceil(0.99 * cnt) AS BIGINT)
                    THEN cents END) AS p99_cents
    FROM ranked GROUP BY o_orderpriority
)
SELECT c.o_orderpriority,
       t.p01_cents, t.p99_cents,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN c.cents < t.p01_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clamped_low,
       CAST(sum(CASE WHEN c.cents > t.p99_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clamped_high,
       CAST(sum(least(greatest(c.cents, t.p01_cents), t.p99_cents))
            AS BIGINT) AS wins_sum_cents
FROM cents c JOIN thresholds t USING (o_orderpriority)
GROUP BY 1, 2, 3
""",
)
def winsorize_clamp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics: winsorize order totals at the per-priority
    [p01, p99] — clamp instead of drop — and report the clamp counts
    plus the winsorized sum, all in integer cents. Percentiles use the
    house DISCRETE rank-selection convention (agg_percentile_disc_rank):
    both engines pick the row at rank ceil(p·n) under the same
    deterministic (cents, o_orderkey) order, so the thresholds are
    actual data elements and the whole result is integer-exact.

    100 TB shape: one ranked window per priority group (the same
    bounded-cardinality key precedent as agg_percentile_disc_rank),
    thresholds reduce to a ~5-row table that BROADCASTS back onto the
    scan, and the final clamp+sum is one partial-aggregated pass. At
    scale the ranked window would be replaced by approx thresholds
    (approx_percentile_certified shows the certification pattern);
    the exact rank selection here is the correctness baseline."""
    o = _lt(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    w = W.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    ranked = cents.select(
        "o_orderpriority",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("o_orderpriority"))
        .alias("cnt"),
    )
    thresholds = ranked.groupBy("o_orderpriority").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.01 * F.col("cnt")).cast("long"),
                F.col("cents"),
            )
        ).alias("p01_cents"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.99 * F.col("cnt")).cast("long"),
                F.col("cents"),
            )
        ).alias("p99_cents"),
    )
    clamped = cents.join(F.broadcast(thresholds), "o_orderpriority").select(
        "o_orderpriority",
        "p01_cents",
        "p99_cents",
        "cents",
        F.least(
            F.greatest(F.col("cents"), F.col("p01_cents")), F.col("p99_cents")
        ).alias("wcents"),
    )
    return clamped.groupBy("o_orderpriority", "p01_cents", "p99_cents").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("cents") < F.col("p01_cents"), 1).otherwise(0)
        ).alias("n_clamped_low"),
        F.sum(
            F.when(F.col("cents") > F.col("p99_cents"), 1).otherwise(0)
        ).alias("n_clamped_high"),
        F.sum("wcents").alias("wins_sum_cents"),
    )
