"""Round-11 third wave: language-model quality scoring — the CCNet /
Gopher "perplexity filter" family the registry still lacked.

  unigram_surprisal_quality : per-document mean surprisal under the
      corpus's own unigram LM (Wenzek et al., CCNet 2020 — public —
      filter web text by LM perplexity; the unigram form is its
      order-0 analogue and the classic "rare-word density" signal);
  heldout_bigram_surprisal  : per-document mean surprisal of the
      odd-doc_id half under a bigram LM trained on the even half, with
      stupid backoff α=0.4 to the train unigram (Brants et al. 2007,
      "Large Language Models in Machine Translation", public). The
      held-out split is what makes backoff REACHABLE — a same-corpus
      LM has seen every bigram it scores.

dist-keras has no analogue — "beyond the reference" training-data
surface (quality scoring is first-class per the brief), mapped in
COVERAGE.md.

House rules (analytics5/9/10/11.py): the ONLY float work is the
per-WORD (resp. per-BIGRAM-TYPE) surprisal, computed once in the
vocabulary-sized dimension with the formula CHARACTER-IDENTICAL on
both engines and immediately quantized to integer micro-nats via
floor(x·1e6 + 0.5) — every data-sized aggregation downstream is exact
int64, so cross-engine float summation order can never diverge.
(ln is not required correctly-rounded by IEEE-754, so a 1-ulp
engine difference is possible; it flips the micro-nat only when
ln(·)·1e6 sits within ~1e-10 of a .5 boundary, per-TYPE not per-token
— the same accepted risk class as the green entropy/geo_mean ops,
shrunk from data-sized to vocab-sized.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt

# Per-doc mean-surprisal thresholds, integer micro-nats. Fixture
# distribution (uniform ~31-word vocab ⇒ surprisal ≈ ln(31) ≈ 3.434):
# sf0.001/0.01/0.1 min 3379795–3392581, max 3699159–3995705. 3450000
# flags the rare-word tail (15/19/192 docs), 3395000 the repetitive
# head (39/35/7 docs) — live at all three SFs.
_UNI_HI_E6 = 3_450_000
_UNI_LO_E6 = 3_395_000

# Held-out bigram mean-surprisal "high perplexity" threshold: fixture
# p90 ≈ 3494078 at sf0.01; 3480000 flags 32/40/57 docs at the 3 SFs.
_BI_HI_E6 = 3_480_000

# Per-word surprisal in integer micro-nats: s = ⌊ln(N/c)·1e6 + 0.5⌋.
# floor-then-cast on BOTH engines (DuckDB CAST(double) rounds, Spark
# truncates — floor first makes them agree; verify-skill gotcha).
_S_E6 = "CAST(floor(ln(n_total * 1.0 / c) * 1000000 + 0.5) AS BIGINT)"


@query(
    "unigram_surprisal_quality",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source, a[generate_subscripts(a, 1)] AS tok
    FROM (SELECT doc_id, source, string_split(text, ' ') AS a
          FROM documents) t
), cnt AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1
), tot AS (
    SELECT CAST(sum(c) AS BIGINT) AS n_total FROM cnt
), dim AS (
    SELECT tok, {_S_E6} AS s_e6 FROM cnt, tot
), per_doc AS (
    SELECT t.doc_id, t.source,
           CAST(count(*) AS BIGINT) AS n_toks,
           CAST(sum(d.s_e6) // count(*) AS BIGINT) AS mean_e6
    FROM toks t JOIN dim d USING (tok)
    GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       CAST(sum(mean_e6) // count(*) AS BIGINT) AS avg_doc_surprisal_e6,
       CAST(max(mean_e6) AS BIGINT) AS max_doc_surprisal_e6,
       CAST(sum(CASE WHEN mean_e6 >= {_UNI_HI_E6} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high_surprisal,
       CAST(sum(CASE WHEN mean_e6 < {_UNI_LO_E6} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low_surprisal
FROM per_doc GROUP BY source
""",
)
def unigram_surprisal_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality score, order-0: per-doc mean surprisal
    −(1/n)Σ ln p(w) under the corpus unigram LM, per-source rollup
    with high-tail (rare-word soup → drop candidates) and low-tail
    (repetitive head) document counts. Per-WORD surprisal is quantized
    to integer micro-nats in the vocab dimension; every data-sized sum
    is exact int64 (module docstring).

    Int64 headroom: s_e6 ≤ ln(N)·1e6 ≤ 3.3e7 at N=1e14 tokens;
    per-doc sum ≤ 1e5·3.3e7 = 3.3e12; Σ mean_e6 per source exact
    through ~2.6e11 docs. (A TOKEN-weighted global sum Σ s would
    overflow past ~3e11 tokens — below the 100 TB ≈ 2e13-token design
    point — so the rollup deliberately aggregates per-doc MEANS, which
    is also the grain CCNet filters at.)

    100 TB shape: one groupBy word (map-side combined, Zipf keys are
    combiner-friendly), vocab dim joined back to the exploded scan
    with NO forced broadcast hint (ADVICE r11: a web-scale unigram
    vocab is not reliably driver-sized — AQE broadcasts when it
    measures small and shuffle-hash-joins on `tok` otherwise, the
    same reason heldout_bigram_surprisal shuffle-joins its (w1,w2)
    model), one groupBy doc_id, one dim-sized groupBy source. The
    only non-broadcast shuffles key on word / doc_id — both
    data-scaling. n_total rides a 1-row broadcast crossJoin, never a
    window."""
    toks = _lt(spark, sf_dir, "documents").select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cnt.agg(F.sum("c").cast("long").alias("n_total"))
    dim = cnt.crossJoin(F.broadcast(tot)).select(
        "tok", F.expr(_S_E6).alias("s_e6")
    )
    per_doc = (
        toks.join(F.broadcast(dim), "tok")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.expr("CAST(sum(s_e6) div count(1) AS BIGINT)").alias(
                "mean_e6"
            ),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.expr("CAST(sum(mean_e6) div count(1) AS BIGINT)").alias(
            "avg_doc_surprisal_e6"
        ),
        F.max("mean_e6").cast("long").alias("max_doc_surprisal_e6"),
        F.sum(F.when(F.col("mean_e6") >= _UNI_HI_E6, 1).otherwise(0))
        .cast("long")
        .alias("n_high_surprisal"),
        F.sum(F.when(F.col("mean_e6") < _UNI_LO_E6, 1).otherwise(0))
        .cast("long")
        .alias("n_low_surprisal"),
    )


# Scored-side surprisal CASE, character-identical on both engines.
# Seen bigram: −ln p(w2|w1) = ln(cc/cb). Unseen: stupid backoff
# −ln(0.4·cu(w2)/Nt) = ln(5·Nt / (2·cu)), integers inside the ratio;
# a w2 never seen in train backs off to the count-1 floor.
_BI_CASE = (
    "CASE WHEN cb IS NOT NULL"
    " THEN CAST(floor(ln(cc * 1.0 / cb) * 1000000 + 0.5) AS BIGINT)"
    " ELSE CAST(floor(ln(5 * nt * 1.0 / (2 * coalesce(cu, 1)))"
    " * 1000000 + 0.5) AS BIGINT) END"
)


@query(
    "heldout_bigram_surprisal",
    oracle=f"""
WITH base AS (
    SELECT doc_id, source, string_split(text, ' ') AS a FROM documents
), bi AS (
    SELECT doc_id, source, a[i] AS w1, a[i + 1] AS w2
    FROM (SELECT doc_id, source, a, generate_subscripts(a, 1) AS i
          FROM base) t
    WHERE i < len(a)
), train_uni AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS cu
    FROM (SELECT a[generate_subscripts(a, 1)] AS tok
          FROM base WHERE doc_id % 2 = 0) t
    GROUP BY 1
), train_tot AS (
    SELECT CAST(sum(cu) AS BIGINT) AS nt FROM train_uni
), train_bi AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
    FROM bi WHERE doc_id % 2 = 0 GROUP BY 1, 2
), train_ctx AS (
    SELECT w1, CAST(sum(cb) AS BIGINT) AS cc FROM train_bi GROUP BY 1
), scored AS (
    SELECT e.doc_id, e.source, {_BI_CASE} AS s_e6,
           CASE WHEN cb IS NULL THEN 1 ELSE 0 END AS backoff
    FROM (SELECT * FROM bi WHERE doc_id % 2 = 1) e
    LEFT JOIN train_bi tb ON e.w1 = tb.w1 AND e.w2 = tb.w2
    LEFT JOIN train_ctx tc ON e.w1 = tc.w1
    LEFT JOIN train_uni tu ON e.w2 = tu.tok
    CROSS JOIN train_tot tt
), per_doc AS (
    SELECT doc_id, source,
           CAST(count(*) AS BIGINT) AS n_bi,
           CAST(sum(backoff) AS BIGINT) AS nb,
           CAST(sum(s_e6) // count(*) AS BIGINT) AS mean_e6
    FROM scored GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bi) AS BIGINT) AS n_bigrams,
       CAST(sum(nb) AS BIGINT) AS n_backoff,
       CAST(sum(mean_e6) // count(*) AS BIGINT) AS avg_doc_surprisal_e6,
       CAST(sum(CASE WHEN mean_e6 >= {_BI_HI_E6} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high_ppl
FROM per_doc GROUP BY source
""",
)
def heldout_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram-LM perplexity filter: train bigram/unigram
    counts on even doc_ids, score each odd doc's mean bigram surprisal
    −(1/n)Σ ln p(w2|w1) with stupid backoff (α=0.4) to the train
    unigram for bigrams the train half never saw. The per-source
    rollup carries the backoff count (OOV-bigram mass — itself a
    distribution-shift signal) and the high-perplexity doc count.
    The 31-word fixture vocab saturates the bigram space at sf0.1
    (n_backoff = 0 there; 7 at sf0.001/0.01) — on real Zipfian text
    backoff carries the tail mass; pytest plants an unseen bigram to
    pin the backoff arithmetic regardless of fixture shape.

    Int64 headroom: s_e6 ≤ ln(2.5·Nt)·1e6 ≤ 3.4e7 at Nt=1e14;
    per-doc and per-source sums as in unigram_surprisal_quality.

    100 TB shape: bigram explode is scan-side codegen (sequence +
    element_at, no Python); train_bi groupBy keys on the (w1,w2)
    composite — data-scaling, map-side combined. The eval-side probe
    joins on (w1,w2): the bigram model is vocab²-bounded and
    Zipf-truncated in practice, so it SHUFFLE-joins on its own key
    (never driver-sized); ctx/uni/tot dims are vocab-/1-row-sized and
    broadcast."""
    base = _lt(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("a")
    )
    bi = (
        base.where(F.size("a") >= 2)
        .select(
            "doc_id",
            "source",
            "a",
            F.explode(
                F.sequence(F.lit(1), F.size("a") - 1)
            ).alias("i"),
        )
        .select(
            "doc_id",
            "source",
            F.element_at("a", F.col("i")).alias("w1"),
            F.element_at("a", F.col("i") + 1).alias("w2"),
        )
    )
    train_bi = (
        bi.where(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    train_ctx = train_bi.groupBy("w1").agg(
        F.sum("cb").cast("long").alias("cc")
    )
    train_uni = (
        base.where(F.col("doc_id") % 2 == 0)
        .select(F.explode("a").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cu"))
    )
    train_tot = train_uni.agg(F.sum("cu").cast("long").alias("nt"))
    scored = (
        bi.where(F.col("doc_id") % 2 == 1)
        .join(train_bi, ["w1", "w2"], "left")
        .join(F.broadcast(train_ctx), "w1", "left")
        .join(
            F.broadcast(train_uni.withColumnRenamed("tok", "w2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(train_tot))
        .select(
            "doc_id",
            "source",
            F.expr(_BI_CASE).alias("s_e6"),
            F.expr(
                "CASE WHEN cb IS NULL THEN 1 ELSE 0 END"
            ).alias("backoff"),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bi"),
        F.sum("backoff").cast("long").alias("nb"),
        F.expr("CAST(sum(s_e6) div count(1) AS BIGINT)").alias("mean_e6"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bi").cast("long").alias("n_bigrams"),
        F.sum("nb").cast("long").alias("n_backoff"),
        F.expr("CAST(sum(mean_e6) div count(1) AS BIGINT)").alias(
            "avg_doc_surprisal_e6"
        ),
        F.sum(F.when(F.col("mean_e6") >= _BI_HI_E6, 1).otherwise(0))
        .cast("long")
        .alias("n_high_ppl"),
    )
