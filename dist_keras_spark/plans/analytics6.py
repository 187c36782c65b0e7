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

from dist_keras_spark.plans.registry import ORACLE, query
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


# NDCG discount weights as INTEGERS: floor(1e9 / log2(rank+1)) for
# ranks 1..5, computed ONCE in Python and inlined as int literals on
# both engine sides — no cross-engine float risk anywhere in the
# ranking metrics. _NDCG_CUM[r] = ideal DCG with r relevant results.
_NDCG_W = [math.floor(1e9 / math.log2(r + 1)) for r in range(1, 6)]
_NDCG_CUM = [sum(_NDCG_W[: r + 1]) for r in range(5)]


def _ranking_eval_oracle_sql() -> str:
    """Wraps the REGISTERED knn_int8_quantized_top5 oracle as a CTE —
    the ranking under evaluation is pinned to the exact SQL the
    driver already hash-checks, so the two queries can never drift."""
    idcg = "".join(
        f" WHEN {r + 1} THEN {_NDCG_CUM[r]}" for r in range(5)
    )
    return f"""
WITH base AS ({ORACLE["knn_int8_quantized_top5"]}),
lab AS (SELECT vec_id, label FROM embeddings),
rel AS (
    SELECT b.query_id, b.knn_rank,
           CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
    FROM base b
    JOIN lab ql ON ql.vec_id = b.query_id
    JOIN lab nl ON nl.vec_id = b.neighbor_id
)
SELECT query_id,
       CAST(sum(rel) AS BIGINT) AS n_rel,
       CAST(coalesce(max(CASE WHEN rel = 1
                               THEN 1000000000 // knn_rank END), 0)
            AS BIGINT) AS rr_e9,
       CAST(sum(rel * CASE knn_rank
                WHEN 1 THEN {_NDCG_W[0]} WHEN 2 THEN {_NDCG_W[1]}
                WHEN 3 THEN {_NDCG_W[2]} WHEN 4 THEN {_NDCG_W[3]}
                WHEN 5 THEN {_NDCG_W[4]} END) AS BIGINT) AS dcg_e9,
       CAST(CASE sum(rel) WHEN 0 THEN 0{idcg} END AS BIGINT) AS idcg_e9
FROM rel
GROUP BY query_id
"""


@query("ranking_mrr_ndcg_at5", oracle=_ranking_eval_oracle_sql())
def ranking_mrr_ndcg_at5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation (the retrieval twin of D1's
    classification evaluator): MRR and NDCG@5 of the int8 ANN ranking
    against label-match relevance, entirely in integers — reciprocal
    rank as 1e9 div rank, DCG with floor(1e9/log2(r+1)) discount
    weights precomputed in Python and inlined identically on both
    sides, ideal DCG as the n_rel-prefix sum of the same weights. The
    final MRR/NDCG averages are one trivial division away downstream;
    keeping the per-query rows integer makes the hash check exact and
    the metric auditable per query.

    100 TB shape: the ranking reuses knn_int8_quantized_top5's plan
    (broadcast queries, corpus never shuffles); the label joins are
    id-keyed lookups (broadcast at fixture scale, shuffle-hash at
    100 TB); the metric agg groups on query_id — the data-scaling
    key. The oracle WRAPS the registered int8 oracle as a CTE, so the
    ranking under evaluation is the same bytes the driver checks."""
    from dist_keras_spark.plans.llm import knn_int8_quantized_top5

    base = knn_int8_quantized_top5(spark, sf_dir)
    lab = _lt(spark, sf_dir, "embeddings").select("vec_id", "label")
    q_lab = lab.select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    n_lab = lab.select(
        F.col("vec_id").alias("n_id"), F.col("label").alias("n_label")
    )
    rel = (
        base.join(F.broadcast(q_lab), base.query_id == q_lab.q_id)
        .join(F.broadcast(n_lab), F.col("neighbor_id") == n_lab.n_id)
        .select(
            "query_id",
            "knn_rank",
            F.when(F.col("q_label") == F.col("n_label"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    w_map = F.when(F.col("knn_rank") == 1, _NDCG_W[0])
    for r in range(2, 6):
        w_map = w_map.when(F.col("knn_rank") == r, _NDCG_W[r - 1])
    idcg = F.when(F.col("n_rel") == 0, 0)
    for r in range(1, 6):
        idcg = idcg.when(F.col("n_rel") == r, _NDCG_CUM[r - 1])
    return (
        rel.groupBy("query_id")
        .agg(
            F.sum("rel").alias("n_rel"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("rel") == 1,
                        F.expr("1000000000 div knn_rank"),
                    )
                ),
                F.lit(0),
            ).alias("rr_e9"),
            F.sum(F.col("rel") * w_map).alias("dcg_e9"),
        )
        .select(
            "query_id",
            "n_rel",
            F.col("rr_e9").cast("long").alias("rr_e9"),
            F.col("dcg_e9").cast("long").alias("dcg_e9"),
            idcg.cast("long").alias("idcg_e9"),
        )
    )


@query(
    "dsir_importance_weights",
    oracle="""
WITH tok AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
    FROM documents
), stats AS (
    SELECT token,
           CAST(count(*) AS BIGINT) AS q,
           CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3')
                         THEN 1 ELSE 0 END) AS BIGINT) AS p
    FROM tok GROUP BY token
), weighted AS (
    SELECT t.doc_id, (1000000 * (s.p + 1)) // (s.q + 1) AS w_e6
    FROM tok t JOIN stats s USING (token)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(w_e6) AS BIGINT) AS score_e6,
       CAST(sum(w_e6) // count(*) AS BIGINT) AS per_token_e6
FROM weighted
GROUP BY doc_id
""",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, public
    knowledge): score each document by how much its token distribution
    resembles a target domain (sources src0-src3) relative to the raw
    corpus. Per token, weight = (1e6·(target_count+1)) div
    (raw_count+1) — Laplace-smoothed importance ratio in integer
    micro-units (BIGINT div truncates identically on both engines;
    the canonical log-ratio is a monotone transform, same selection
    order — the house log-free pattern from bigram_pmi_top). Doc
    score = Σ occurrence weights; per_token_e6 is the length-
    normalized variant a sampler would threshold on.

    100 TB shape: token stats are ONE map-side-combined aggregation
    on token (vocab-sized result — broadcastable for real corpora;
    Zipf caps the useful vocab); the weight join-back then hits the
    exploded scan without shuffling the corpus (broadcast hash join),
    and the doc rollup keys on doc_id, the data-scaling key. Text
    itself never shuffles — only (doc_id, token) pairs."""
    d = _lt(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("token")
    )
    stats = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("q"),
        F.sum(
            F.when(
                F.col("source").isin("src0", "src1", "src2", "src3"), 1
            ).otherwise(0)
        ).alias("p"),
    )
    weighted = tok.join(F.broadcast(stats), "token").select(
        "doc_id", F.expr("(1000000 * (p + 1)) div (q + 1)").alias("w_e6")
    )
    return weighted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("w_e6").alias("score_e6"),
        F.expr("sum(w_e6) div count(*)").cast("long").alias("per_token_e6"),
    )


def _semdedup_oracle_sql(n_cells: int = 16, seed: int = 42) -> str:
    """Replays the integer SemDeDup end-to-end: int8 quantization (the
    knn_int8 formulation), md5-ordered centroid sample (the knn_ivf
    portability pattern), MAX-INNER-PRODUCT cell assignment (integer
    dot, ties to the lower cell — no float anywhere, so unlike
    knn_ivf's cosine assignment there is NO tie-risk caveat), and the
    cross-multiplied cosine threshold 100·dot² ≥ 9·na·nb (τ=0.3)."""
    return f"""
WITH sc AS (
    SELECT vec_id, embedding,
           127.0 / list_max(list_transform(embedding,
                            y -> abs(CAST(y AS DOUBLE)))) AS scale
    FROM embeddings
), q8 AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * scale) AS BIGINT)) AS v
    FROM sc
), n AS (
    SELECT vec_id, v,
           CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS nn
    FROM q8
), cent AS (
    SELECT row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR) || ':{seed}'),
                        vec_id) - 1 AS cell,
           v AS cv
    FROM q8
    QUALIFY row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR) || ':{seed}'),
                        vec_id) <= {n_cells}
), assign AS (
    SELECT nq.vec_id, ct.cell, nq.v, nq.nn,
           row_number() OVER (PARTITION BY nq.vec_id
               ORDER BY CAST(list_sum(list_transform(range(1, 65),
                             i -> nq.v[i] * ct.cv[i])) AS BIGINT) DESC,
                        ct.cell) AS pr
    FROM n nq CROSS JOIN cent ct
), cellv AS (
    SELECT vec_id, cell, v, nn FROM assign WHERE pr = 1
), dup AS (
    SELECT DISTINCT b.vec_id
    FROM cellv a JOIN cellv b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE CAST(list_sum(list_transform(range(1, 65),
               i -> a.v[i] * b.v[i])) AS BIGINT) > 0
      AND 100 * CAST(list_sum(list_transform(range(1, 65),
                i -> a.v[i] * b.v[i])) AS BIGINT)
              * CAST(list_sum(list_transform(range(1, 65),
                i -> a.v[i] * b.v[i])) AS BIGINT)
          >= 9 * a.nn * b.nn
)
SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
       CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           AS dropped
FROM cellv c LEFT JOIN dup d ON d.vec_id = c.vec_id
"""


@query("semdedup_cell_prune", oracle=_semdedup_oracle_sql())
def semdedup_cell_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public knowledge): semantic
    dedup that restricts candidate pairs to the same coarse cluster
    cell — the economics of embedding dedup at 100 TB come from never
    comparing across cells. Differs from dedup_embedding_cosine
    (banded global candidates) exactly where SemDeDup differs from
    plain near-dup: the cluster assignment IS the blocking structure,
    and cross-cell duplicates are a documented, accepted miss.

    Fully integer-exact variant: int8 quantization (knn_int8
    formulation), 16 md5-sampled centroids, max-inner-product cell
    assignment (integer dot, ties to lower cell — no float tie risk,
    unlike knn_ivf's cosine assignment), then within-cell pairs with
    cosine ≥ 0.3 decided by the cross-multiplied integer predicate
    100·dot² ≥ 9·na·nb (dot > 0); keep-first greedy drops the higher
    vec_id (the substring_dedup_survivors convention).

    100 TB shape: quantization and norms are scan-side column math;
    the 16-row centroid table broadcasts into the assignment
    crossJoin (corpus never shuffles for assignment); the dedup
    self-join shuffles ids+vectors ONCE on cell, and per-cell pair
    counts are bounded by cell size — the operator's scale knob is
    n_cells, exactly as in the paper (cells ∝ corpus size keeps
    per-cell work constant). Bounds: dot ≤ 127²·64 ≈ 1.03e6, so
    100·dot² ≤ 1.1e14 and 9·na·nb ≤ 9.6e12 — well inside int64."""
    e = _lt(spark, sf_dir, "embeddings")
    scale = F.lit(127.0) / F.array_max(
        F.transform("embedding", lambda y: F.abs(y.cast("double")))
    )
    q8 = e.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("v"),
    )
    n = q8.select(
        "vec_id",
        "v",
        F.aggregate(
            F.transform("v", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("nn"),
    )
    # centroid sample keeps its md5 sort key so the cells can be
    # labeled 0..15 in the SAME order after the limit
    cent = (
        q8.select(
            "vec_id",
            "v",
            F.md5(
                F.concat(F.col("vec_id").cast("string"), F.lit(":42"))
            ).alias("mk"),
        )
        .orderBy("mk", "vec_id")
        .limit(16)
    )
    from dist_keras_spark.operators.utils import bounded_window_key

    # 16-row post-limit frame: bounded_window_key marks the reviewed
    # single-partition window (plan-hygiene gate convention)
    cent = cent.select(
        (
            F.row_number().over(
                W.partitionBy(bounded_window_key(F.col("vec_id"))).orderBy(
                    "mk", "vec_id"
                )
            )
            - 1
        ).alias("cell"),
        F.col("v").alias("cv"),
    )
    dot_c = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    assign = (
        n.crossJoin(F.broadcast(cent))
        .select("vec_id", "cell", "v", "nn", dot_c.alias("dotc"))
        .withColumn(
            "pr",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(F.desc("dotc"), F.asc("cell"))
            ),
        )
        .filter(F.col("pr") == 1)
        .select("vec_id", "cell", "v", "nn")
    )
    a = assign.select(
        F.col("vec_id").alias("id_a"),
        "cell",
        F.col("v").alias("va"),
        F.col("nn").alias("na"),
    )
    b = assign.select(
        F.col("vec_id").alias("id_b"),
        "cell",
        F.col("v").alias("vb"),
        F.col("nn").alias("nb"),
    )
    dot_p = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dup = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_b", dot_p.alias("dot"), "na", "nb")
        .filter(
            (F.col("dot") > 0)
            & (
                F.lit(100).cast("long") * F.col("dot") * F.col("dot")
                >= F.lit(9).cast("long") * F.col("na") * F.col("nb")
            )
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        assign.join(dup, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            F.coalesce(F.col("is_dup"), F.lit(0)).cast("long").alias("dropped"),
        )
    )


@query(
    "changepoint_mean_shift",
    oracle="""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), cum AS (
    SELECT event_type, day, c,
           row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
           sum(c) OVER (PARTITION BY event_type ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS s,
           count(*) OVER (PARTITION BY event_type) AS n,
           sum(c) OVER (PARTITION BY event_type) AS tot
    FROM daily
), cand AS (
    SELECT event_type, day, t, n,
           (1000000 * abs(s * (n - t) - (tot - s) * t))
               // (t * (n - t)) AS score_e6,
           (1000000 * s) // t AS mean_before_e6,
           (1000000 * (tot - s)) // (n - t) AS mean_after_e6
    FROM cum WHERE t < n
)
SELECT event_type, day AS split_day, CAST(t AS BIGINT) AS split_t,
       CAST(n AS BIGINT) AS n_days,
       CAST(score_e6 AS BIGINT) AS score_e6,
       CAST(mean_before_e6 AS BIGINT) AS mean_before_e6,
       CAST(mean_after_e6 AS BIGINT) AS mean_after_e6
FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY score_e6 DESC, t) AS rk
      FROM cand)
WHERE rk = 1
""",
)
def changepoint_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection on the daily event-count series per
    event type: the split day t maximizing the between-segment mean
    shift |mean(1..t) − mean(t+1..n)| — the single-change-point
    least-squares criterion (CUSUM family, public knowledge), made
    integer-exact by scoring on the common denominator t·(n−t):
    score = 1e6·|S_t·(n−t) − (T−S_t)·t| div (t·(n−t)), which orders
    split candidates identically to the float mean difference. Ties
    break to the earliest day on both engines.

    100 TB shape: the daily rollup is ONE map-side-combined
    aggregation keyed (type, day); everything after operates on the
    bounded (types × days) series — running sums via forward-ordered
    running frames (never the O(rows²) unbounded-following shape),
    then a per-type top-1 window. Integer headroom: score ≤ 1e6·T·n;
    for daily counts beyond ~9e9·days, rescale to 1e3 units (noted,
    not needed at any fixture SF)."""
    e = _lt(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    wt = W.partitionBy("event_type").orderBy("day")
    wp = W.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.row_number().over(wt).alias("t"),
        F.sum("c").over(wt.rowsBetween(W.unboundedPreceding, 0)).alias("s"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("c").over(wp).alias("tot"),
    )
    cand = cum.filter(F.col("t") < F.col("n")).select(
        "event_type",
        "day",
        "t",
        "n",
        F.expr(
            "(1000000 * abs(s * (n - t) - (tot - s) * t)) div (t * (n - t))"
        ).alias("score_e6"),
        F.expr("(1000000 * s) div t").alias("mean_before_e6"),
        F.expr("(1000000 * (tot - s)) div (n - t)").alias("mean_after_e6"),
    )
    best = cand.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.desc("score_e6"), F.asc("t"))
        ),
    ).filter(F.col("rk") == 1)
    return best.select(
        "event_type",
        F.col("day").alias("split_day"),
        F.col("t").cast("long").alias("split_t"),
        F.col("n").cast("long").alias("n_days"),
        F.col("score_e6").cast("long").alias("score_e6"),
        F.col("mean_before_e6").cast("long").alias("mean_before_e6"),
        F.col("mean_after_e6").cast("long").alias("mean_after_e6"),
    )
