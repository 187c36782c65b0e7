"""Round-7 analytics operators: skew-salted joins, sequence training
examples, deterministic negative sampling, seasonal-naive backtesting,
and cross-validation fold assignment.

The first is a pure scale technique demonstrated under an invariance
oracle (salting must not change the answer); the middle three are the
training-data-pipeline shapes the brief calls first-class (sequence
dataset construction, contrastive negatives, deterministic splits);
the backtest is the classic forecasting-baseline evaluation loop.
dist-keras has no analogue — "beyond the reference" surface, mapped
in COVERAGE.md.

House rules: integer cents via floor(x*100); pseudo-randomness is
MULTIPLICATIVE integer hashing (Knuth 2654435761 mod 2^32), never
F.hash/rand — Spark's murmur3 and DuckDB's hash disagree, while plain
int64 arithmetic is engine-portable; windows partition on data-scaling
keys (user_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt

# Knuth's multiplicative constant and a large odd mixer for the
# per-negative offset; both fit comfortably in int64 products with
# key spaces up to ~2^30 rows.
_KNUTH = 2654435761
_MIX = 968665207
_M32 = 4294967296


@query(
    "join_skew_salted",
    oracle="""
SELECT s.s_nationkey,
       count(*) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join — THE manual remedy when one join key is hot
    enough that a single shuffle partition holds the whole key and AQE
    skew-split can't help (e.g. the hot key exceeds one task's memory,
    or the build side must be replicated anyway). The dimension side
    is replicated SALT_N ways (explode over the salt domain); each
    fact row picks ONE deterministic salt from its row identity; the
    join runs on (key, salt), so the hot key's rows spread over SALT_N
    tasks while every fact row still matches exactly one dim replica —
    the oracle is the PLAIN join, because salting that changes the
    answer is a bug, and the driver hash pins that invariance.

    The in-plan assertion requires a ShuffledHashJoin keyed on the
    salt (a broadcast would bypass the shuffle being fixed and make
    the demo vacuous). Scale: dim replication costs SALT_N× a
    model-sized table; the fact side's extra column is one int. At
    100 TB pick SALT_N ≈ hot-key-rows / rows-per-task, and salt ONLY
    when AQE's skewedJoin (which splits without replication) doesn't
    apply — it can't split the build side of a SHJ."""
    SALT_N = 8
    s = _lt(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    salted_dim = s.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_N - 1)))
    ).hint("shuffle_hash")
    fact = _lt(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.pmod(
            F.col("l_orderkey").cast("long") * _KNUTH
            + F.col("l_linenumber").cast("long") * _MIX,
            F.lit(SALT_N),
        ).alias("salt"),
    )
    out = (
        fact.join(
            salted_dim,
            (fact.l_suppkey == salted_dim.s_suppkey)
            & (fact.salt == salted_dim.salt),
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "salt" in plan, (
        "salted join must run as a ShuffledHashJoin on (key, salt); "
        "got:\n" + plan[:800]
    )
    return out


@query(
    "next_event_training_examples",
    oracle="""
WITH seq AS (
    SELECT user_id, event_id, event_type,
           lag(event_type, 3) OVER w AS t3,
           lag(event_type, 2) OVER w AS t2,
           lag(event_type, 1) OVER w AS t1
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       t3 || '|' || t2 || '|' || t1 AS context,
       event_type AS label
FROM seq WHERE t3 IS NOT NULL
""",
)
def next_event_training_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-model dataset construction: every event becomes a
    supervised example (context = the 3 preceding event types in time
    order, label = the current type) — the next-event-prediction /
    session-recommendation shape. Three lags over ONE user-keyed
    window share a single shuffle+sort; rows without a full context
    are dropped (no padding — padded variants are a projection away).
    At 100 TB this is the canonical one-pass windowed featurization:
    no self-joins, no collect_list of whole histories, output is
    O(events) rows with O(1) context each."""
    e = _lt(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type", 3).over(w).alias("t3"),
        F.lag("event_type", 2).over(w).alias("t2"),
        F.lag("event_type", 1).over(w).alias("t1"),
    )
    return seq.filter(F.col("t3").isNotNull()).select(
        "user_id",
        "event_id",
        F.concat_ws("|", "t3", "t2", "t1").alias("context"),
        F.col("event_type").alias("label"),
    )


@query(
    "negative_sampling_contrastive",
    oracle=f"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
cand AS (
    SELECT d.doc_id, k.k,
           (d.doc_id * {_KNUTH} + CAST(k.k AS BIGINT) * {_MIX})
               % {_M32} % n.n_docs AS neg_raw
    FROM documents d, (SELECT unnest([0, 1, 2, 3]) AS k) k, n
), resolved AS (
    SELECT doc_id, k,
           CASE WHEN neg_raw = doc_id
                THEN (neg_raw + 1) % (SELECT n_docs FROM n)
                ELSE neg_raw END AS neg_id
    FROM cand
)
SELECT r.doc_id, r.k, r.neg_id
FROM resolved r JOIN documents d2 ON r.neg_id = d2.doc_id
""",
)
def negative_sampling_contrastive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    document gets K=4 pseudo-random negative partners via Knuth
    multiplicative hashing over (doc_id, k) — reproducible across
    runs, engines, and retries, which is what a training pipeline
    needs from its sampling (a rand() here makes every epoch a
    different dataset and every backfill unverifiable). Collision
    with the positive remaps to the next id; the join back to
    `documents` pins existence (and keeps both engines honest if ids
    were ever non-contiguous — matching is by VALUE, not position).

    Scale: the candidate generator is a projection (no shuffle); the
    existence join shuffles ids only — at 100 TB you'd broadcast the
    id-universe bloom or bucket both sides on doc_id. K and the mix
    constants are the only knobs."""
    d = _lt(spark, sf_dir, "documents").select("doc_id")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    ks = spark.range(4).select(F.col("id").cast("int").alias("k"))
    cand = (
        d.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "k",
            F.pmod(
                F.pmod(
                    F.col("doc_id").cast("long") * _KNUTH
                    + F.col("k").cast("long") * _MIX,
                    F.lit(_M32)
                ),
                F.col("n_docs"),
            ).alias("neg_raw"),
            "n_docs",
        )
    )
    resolved = cand.select(
        "doc_id",
        "k",
        F.when(
            F.col("neg_raw") == F.col("doc_id"),
            F.pmod(F.col("neg_raw") + 1, F.col("n_docs")),
        )
        .otherwise(F.col("neg_raw"))
        .alias("neg_id"),
    )
    d2 = _lt(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("neg_id")
    )
    return resolved.join(d2, "neg_id").select("doc_id", "k", "neg_id")


@query(
    "seasonal_naive_backtest",
    oracle="""
WITH daily AS (
    SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders GROUP BY 1, 2
)
SELECT a.pri,
       count(*) AS n_days_scored,
       CAST(sum(abs(a.cents - f.cents)) AS BIGINT) AS sae_cents,
       CAST(sum(a.cents) AS BIGINT) AS actual_cents
FROM daily a JOIN daily f
  ON a.pri = f.pri AND f.d = a.d - INTERVAL 7 DAY
GROUP BY a.pri
""",
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline backtest: seasonal-naive (ŷ(d) = y(d−7), same
    weekday last week) scored over the whole history per order
    priority — the baseline every real forecasting system must beat,
    and the evaluation loop (point forecast → absolute error →
    aggregate) expressed as one self-join on the DATE GRID, not a lag:
    a lag-7-rows window silently misaligns wherever a day is missing,
    the date-shifted join scores exactly the days with a valid
    counterpart. Errors accumulate as integer cents (sum of |Δ|), so
    the WAPE = sae/actual division is left to the consumer and the
    driver hash stays exact.

    Scale: the daily aggregate collapses the fact to (priority × day)
    rows — SF-invariant in width, ~date-range in length; the self-join
    runs on that aggregate, never the fact."""
    o = _lt(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    a = daily.alias("a")
    f = daily.alias("f")
    return (
        a.join(
            f,
            (F.col("a.pri") == F.col("f.pri"))
            & (F.col("f.d") == F.date_sub(F.col("a.d"), 7)),
        )
        .groupBy(F.col("a.pri").alias("pri"))
        .agg(
            F.count(F.lit(1)).alias("n_days_scored"),
            F.sum(F.abs(F.col("a.cents") - F.col("f.cents"))).alias("sae_cents"),
            F.sum(F.col("a.cents")).alias("actual_cents"),
        )
    )


@query(
    "crossval_fold_assign",
    oracle=f"""
SELECT (o_orderkey * {_KNUTH}) % {_M32} % 5 AS fold,
       count(*) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents,
       count(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY 1
""",
)
def crossval_fold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (k=5) by multiplicative hash of
    the example key — the split every training pipeline needs to be
    REPRODUCIBLE: the same row lands in the same fold on every engine,
    every rerun, every backfill, with no persisted assignment table
    and no rand(). The per-fold summary (count, spend mass, distinct
    customers) is the balance check run before trusting a split; a
    skewed fold here means the key is correlated with the hash — swap
    the constant, not the method. randomSplit() is the anti-pattern
    this replaces: it's weight-approximate, plan-sensitive, and
    unreproducible across engines.

    Scale: pure map-side expression + one aggregate; fold count and
    constants are the only state."""
    o = _lt(spark, sf_dir, "orders")
    return (
        o.select(
            F.pmod(
                F.pmod(F.col("o_orderkey").cast("long") * _KNUTH, F.lit(_M32)),
                F.lit(5)
            ).alias("fold"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_custkey",
        )
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@query(
    "passage_chunk_overlap",
    oracle="""
SELECT d.doc_id,
       CAST(u.i AS BIGINT) AS chunk_id,
       substring(d.text, CAST(u.i * 150 + 1 AS INT), 200) AS chunk_text
FROM documents d,
     unnest(range(0, 1 + (greatest(d.n_chars - 200, 0) + 149) // 150))
         AS u(i)
""",
)
def passage_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style passage chunking: every document split into 200-char
    windows with 50-char overlap (stride 150) — the step between raw
    corpus and embedding in every retrieval pipeline. Chunk COUNT is
    computed arithmetically from the stored n_chars (1 + ceil(max(n−C,
    0)/S), positive-int `div` — engine-portable) and the offsets
    exploded from a sequence, so chunking is a pure projection +
    generator: no shuffle, no UDF, and each chunk is sliced with one
    substring. The overlap guarantees no boundary-straddling span
    longer than 50 chars is ever unseen by retrieval.

    Scale: output is ~n_chars/S rows per doc, generated scan-side;
    at 100 TB the only knobs are (C, S) and the usual advice is to
    chunk at WRITE time into a chunks table partitioned like its
    corpus — this query IS that write's SELECT."""
    C, S = 200, 150
    d = _lt(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    k = F.expr(f"1 + ((greatest(n_chars - {C}, 0) + {S - 1}) div {S})")
    return (
        d.withColumn("chunk_id", F.explode(F.sequence(F.lit(0), k - 1)))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.expr(f"substring(text, chunk_id * {S} + 1, {C})").alias(
                "chunk_text"
            ),
        )
    )


@query(
    "interpolate_linear_gaps",
    oracle="""
WITH hourly AS (  -- observed: per-user hourly mean value, in cents
    SELECT user_id,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
           CAST(floor(avg(value) * 100) AS BIGINT) AS cents
    FROM events GROUP BY 1, 2
), grid AS (      -- dense hour grid per user between first/last obs
    SELECT u.user_id, g.h
    FROM (SELECT user_id, min(h) AS h0, max(h) AS h1
          FROM hourly GROUP BY user_id) u,
         unnest(generate_series(u.h0, u.h1, INTERVAL 1 HOUR)) AS g(h)
), joined AS (
    SELECT g.user_id, g.h, o.cents
    FROM grid g LEFT JOIN hourly o
      ON g.user_id = o.user_id AND g.h = o.h
), bounded AS (
    SELECT user_id, h, cents,
           last_value(cents IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_c,
           max(CASE WHEN cents IS NOT NULL THEN h END) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_h,
           first_value(cents IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_c,
           min(CASE WHEN cents IS NOT NULL THEN h END) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_h
    FROM joined
)
SELECT user_id, h,
       CASE WHEN cents IS NOT NULL THEN cents * 3600 ELSE
         prev_c * 3600
         + CAST(floor(
             (next_c - prev_c)
             * CAST(date_diff('second', prev_h, h) AS BIGINT) * 3600
             / CAST(date_diff('second', prev_h, next_h) AS BIGINT)
           ) AS BIGINT)
       END AS interp_num,
       CAST(3600 AS BIGINT) AS interp_den
FROM bounded
""",
)
def interpolate_linear_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing points on a dense per-user
    hourly grid — the M2 completion past LOCF (win_locf_forward_fill):
    gaps are filled on the line between the PREVIOUS and NEXT observed
    hours, weighted by time distance. Four IGNORE-NULLS/conditional
    windows over ONE user-keyed sort deliver (prev, next) value+time
    per gap row; the grid itself is a sequence explode between each
    user's first and last observation (never a global calendar).

    EXACTNESS: the interpolated value is emitted as an integer
    RATIONAL (numerator scaled by den=3600; the slope term is
    floor-of-a-double-quotient of exact int64s — the house-portable
    signed division, since trunc-vs-floor `div` semantics differ
    across engines on negative slopes) instead of a raw double —
    cross-engine float output on arbitrary gap ratios is exactly the
    class of hash-divergence the house rules ban. Consumers divide
    num/den; the driver hashes exact ints.

    Scale: everything partitions on user_id; grid width is bounded by
    each user's observed span, and the four windows share one
    shuffle.

    r14 (guide §2.4, dup-scan sweep): the grid used to be built as a
    separate per-user span aggregate + sequence explode LEFT JOINed
    back onto `hourly` — two consumers of `hourly`, pruned
    differently, so the events scan + hourly aggregate executed twice
    (events×2, 0 ReusedExchange) plus a join shuffle. The same frame
    is now emitted in ONE pass: each observed hour explodes
    `sequence(h, next_observed_h − 1h)` (lead over the user timeline;
    a lone/last observation emits just itself), carrying cents only
    on the observed row. Consecutive observations tile [h0, h1]
    exactly, so the union of these slices IS the old grid, row for
    row. Final plan: 1 events scan, join gone, exchanges 4→2; oracle
    (which still declares the grid + left join) hash-green at 3 SFs."""
    e = _lt(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.floor(F.avg("value") * 100).cast("long").alias("cents"))
    wl = W.partitionBy("user_id").orderBy("h")
    withnext = hourly.select(
        "user_id", "h", "cents", F.lead("h").over(wl).alias("lead_h")
    )
    joined = withnext.select(
        "user_id",
        "cents",
        F.col("h").alias("oh"),
        F.explode(
            F.sequence(
                "h",
                F.coalesce(
                    F.expr("lead_h - INTERVAL 1 HOUR"), F.col("h")
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h"),
    ).select(
        "user_id",
        "h",
        F.when(F.col("h") == F.col("oh"), F.col("cents")).alias("cents"),
    )
    wb = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # "next" values via the REVERSED order with a running frame, not a
    # [currentRow, unboundedFollowing] frame: Spark recomputes
    # unbounded-FOLLOWING aggregates per row (O(rows²) per partition —
    # measured 18s vs 2s at sf0.1 on this very query), while running
    # frames are incremental. last/min over the reversed prefix ==
    # first/min over the forward suffix.
    wf = (
        W.partitionBy("user_id")
        .orderBy(F.col("h").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    obs_h = F.when(F.col("cents").isNotNull(), F.col("h"))
    bounded = joined.select(
        "user_id",
        "h",
        "cents",
        F.last("cents", ignorenulls=True).over(wb).alias("prev_c"),
        F.max(obs_h).over(wb).alias("prev_h"),
        F.last("cents", ignorenulls=True).over(wf).alias("next_c"),
        F.min(obs_h).over(wf).alias("next_h"),
    )
    sec = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    interp = F.col("prev_c") * 3600 + F.floor(
        (F.col("next_c") - F.col("prev_c"))
        * (sec("h") - sec("prev_h"))
        * 3600
        / (sec("next_h") - sec("prev_h"))
    ).cast("long")
    return bounded.select(
        "user_id",
        "h",
        F.when(F.col("cents").isNotNull(), F.col("cents") * 3600)
        .otherwise(interp)
        .alias("interp_num"),
        F.lit(3600).cast("long").alias("interp_den"),
    )


@query(
    "sample_exact_n_per_group",
    oracle=f"""
SELECT o_orderpriority, o_orderkey, rn
FROM (
    SELECT o_orderpriority, o_orderkey,
           row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY (o_orderkey * {_KNUTH}) % {_M32}, o_orderkey
           ) AS rn
    FROM orders)
WHERE rn <= 20
""",
)
def sample_exact_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-N-per-group deterministic sampling: rank each group by
    the multiplicative hash of the row key and keep the first 20 — the
    stratified pull every eval-set builder needs where
    `sampleBy()` gives only approximate fractions and rand() a
    different sample per run. The hash order is uniform-ish but FIXED:
    same 20 rows per group on every engine, rerun, and backfill, and
    growing the sample to N=50 keeps the first 20 stable (hash order
    is a total order per group — samples are PREFIX-monotone, the
    property that lets eval sets grow without churning).

    Scale: one shuffle on the group key; the rank window never crosses
    groups. For very hot groups the same AQE/salting remedies as any
    keyed window apply."""
    o = _lt(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.pmod(F.col("o_orderkey").cast("long") * _KNUTH, F.lit(_M32)),
        "o_orderkey",
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 20)
    )


@query(
    "bloom_runtime_filter_join",
    oracle="""
SELECT l.l_returnflag,
       count(*) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 400000
GROUP BY l.l_returnflag
""",
)
def bloom_runtime_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter RUNTIME join pruning — the third runtime-pruning
    mechanism after dynamic partition pruning (dpp_partitioned_join)
    and bucket pruning (bucket_pruning_scan): when a selective filter
    sits on one join side and neither broadcast nor partition layout
    applies, Catalyst's InjectRuntimeFilter builds a bloom filter from
    the filtered side and pushes `might_contain(xxhash64(key))` into
    the OTHER side's scan — fact rows that cannot match are dropped
    BEFORE the shuffle. The query asserts the might_contain subquery
    is present in its own plan; the oracle is the plain join (a
    probabilistic filter may only pass extra rows into the join, never
    change its result).

    Conditions that gate injection (learned here, session-restored in
    finally): the join must carry NO strategy hint (a merge/shuffle
    hint suppresses the rule), broadcast must not apply (a broadcast
    join IS already a perfect runtime filter), and the application
    side must exceed applicationSideScanSizeThreshold (default 10GB —
    lowered for fixture scale; at 100 TB the defaults fire on their
    own). This is THE shuffle-reduction lever for selective star
    joins too big to broadcast."""
    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        o = (
            _lt(spark, sf_dir, "orders")
            .filter(F.col("o_totalprice") > 400000)
            .select("o_orderkey")
        )
        l = _lt(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_extendedprice"
        )
        out = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100).cast("long")
                ).alias("cents"),
            )
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, (
            "bloom runtime filter was not injected; plan:\n" + plan[:800]
        )
        # Materialize UNDER the lowered thresholds (plan is frozen at
        # action time; restoring confs first would re-plan without the
        # bloom filter on some Spark versions).
        out = out.localCheckpoint(eager=True)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    return out
