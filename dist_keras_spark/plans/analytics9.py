"""Round-9 third wave: two primitives the registry still lacked —
winnowing document fingerprinting (the rolling-hash fingerprint op;
Schleimer, Wilkerson & Aiken 2003, MOSS) and an exact-rational
two-sample Kolmogorov-Smirnov drift test (the distribution-level
sibling of the categorical drift_chi2_daily gate). Association-rule
lift and edit-distance blocking already exist (market_basket_lift,
levenshtein_blocked_pairs) — this wave deliberately adds only what is
genuinely new.

dist-keras has no analogue for any of these — "beyond the reference"
training-data-pipeline surface (brief: dedup / similarity / text
analysis are first-class), mapped in COVERAGE.md.

House rules (see analytics5.py): md5 is the engine-portable
fingerprint; integer micro units via exact `div`; BIGINT `div`
(Spark) == `//` (DuckDB) ONLY while every operand stays integer; fixed
integer headroom bounds documented per query with the rescale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt


# --------------------------------------------------------------------------
# Winnowing document fingerprints (rolling k-gram hash, window minima)
# --------------------------------------------------------------------------

_WIN_K = 8  # k-gram length (noise threshold)
_WIN_W = 4  # winnowing window (guarantee threshold t = k + w - 1 = 11)
_WIN_MAX_DF = 50  # stop-fingerprint valve: drop fps in more docs than this


@query(
    "winnowing_fingerprint_pairs",
    oracle=f"""
WITH kg AS (
    SELECT d.doc_id, i.i,
           ('0x' || substr(md5(substr(d.text, CAST(i.i AS INTEGER), {_WIN_K})),
                           1, 8))::BIGINT AS h,
           length(d.text) - {_WIN_K - 1} AS npos
    FROM documents d,
         unnest(generate_series(1, length(d.text) - {_WIN_K - 1})) AS i(i)
    WHERE length(d.text) >= {_WIN_K}
), wmin AS (
    -- window FIRST over every k-gram position, filter to full windows
    -- AFTER: a WHERE on the same level would drop the tail rows from
    -- the window input and silently truncate the last w-1 windows.
    SELECT doc_id, fp FROM (
        SELECT doc_id, i, npos,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW
                            AND {_WIN_W - 1} FOLLOWING) AS fp
        FROM kg
    ) WHERE i + {_WIN_W - 1} <= npos
), fps AS (SELECT DISTINCT doc_id, fp FROM wmin),
df AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {_WIN_MAX_DF}),
keep AS (SELECT f.doc_id, f.fp FROM fps f JOIN df ON df.fp = f.fp),
pairs AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS shared
    FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT d1, d2, shared FROM pairs
ORDER BY shared DESC, d1, d2 LIMIT 20
""",
)
def winnowing_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    the MOSS algorithm, public knowledge): every k=8 char-gram gets a
    rolling md5-prefix hash; the fingerprint set is the minimum hash
    of each w=4 consecutive-gram window, guaranteeing any shared
    substring of length ≥ k+w-1 = 11 produces at least one shared
    fingerprint. Top-20 document pairs by shared-fingerprint count —
    the plagiarism/near-dup candidates. The paper's positional
    tie-break selects WHICH position carries a repeated minimum; the
    fingerprint SET (distinct values per doc) is identical either
    way, which is what makes the op engine-portable. Fingerprints in
    more than {_WIN_MAX_DF} docs are stop-fingerprints (boilerplate)
    and dropped — same df valve as the shingle inverted index
    (operators/dedup.py). All integer: 32-bit md5-prefix hashes,
    counts.

    Complements the dedup row: MinHash-LSH estimates whole-document
    Jaccard; winnowing localizes SHARED SUBSTRINGS (contiguous
    overlap ≥ 11 chars) — the right primitive for quote/boilerplate
    detection and contamination tracing.

    100 TB shape: k-gram explode and window-min are scan-side,
    partitioned by doc_id (bounded by doc length); the pair join is
    an inverted fingerprint index bounded by the df cap — never
    all-pairs. At true scale the same shape runs per-band like LSH;
    selectivity is tuned with k/w, not plan changes.

    r14 staging A/B (guide §2.4, negative result kept unstaged): the
    4 fingerprint-subtree copies in the static plan (keep ⋈ keep,
    each side also feeding the df valve) ARE runtime-deduped — an
    initial-plan read shows 0 ReusedExchange (which is what the first
    r14 audit measured, via the pre-fix final_plan_audit tool that
    read the un-executed QueryExecution), but localCheckpoint-staging
    fps + keep measured WORSE in a same-load interleaved A/B at
    sf0.1: staged min 4.684s vs lazy min 4.202s over 5 alternated
    rounds (staged lost every round) — the checkpoint job barriers
    cost more than the (already reuse-covered) recompute. The r9
    reuse claim stands; kept fully lazy."""
    d = _lt(spark, sf_dir, "documents").where(F.length("text") >= _WIN_K)
    kg = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - (_WIN_K - 1))
        ).alias("i"),
        (F.length("text") - (_WIN_K - 1)).alias("npos"),
        "text",
    ).select(
        "doc_id",
        "i",
        "npos",
        F.conv(
            F.substring(
                F.md5(F.expr(f"substring(text, i, {_WIN_K})")), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    # Window over EVERY position first, then keep full windows only —
    # filtering first would truncate the last w-1 windows (see oracle).
    wmin = kg.select(
        "doc_id",
        "i",
        "npos",
        F.min("h")
        .over(
            W.partitionBy("doc_id")
            .orderBy("i")
            .rowsBetween(W.currentRow, _WIN_W - 1)
        )
        .alias("fp"),
    ).where(F.col("i") + (_WIN_W - 1) <= F.col("npos")).select("doc_id", "fp")
    fps = wmin.select("doc_id", "fp").distinct()
    df_keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") <= _WIN_MAX_DF)
        .select("fp")
    )
    keep = fps.join(df_keep, "fp")
    a = keep.alias("a")
    b = keep.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.select("d1", "d2", F.col("shared").cast("long").alias("shared"))
        .orderBy(F.desc("shared"), "d1", "d2")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Exact-rational two-sample Kolmogorov-Smirnov test
# --------------------------------------------------------------------------


@query(
    "ks_test_two_sample",
    oracle="""
WITH s AS (
    SELECT CAST(l_quantity AS BIGINT) AS v,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_r
    FROM lineitem WHERE l_returnflag IN ('R', 'A')
), cnt AS (
    SELECT v, CAST(sum(is_r) AS BIGINT) AS n_r,
           CAST(sum(1 - is_r) AS BIGINT) AS n_a
    FROM s GROUP BY v
), cum AS (
    SELECT sum(n_r) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f_r,
           sum(n_a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f_a,
           sum(n_r) OVER () AS n1, sum(n_a) OVER () AS n2
    FROM cnt
), d AS (
    SELECT CAST(max(abs(n2 * f_r - n1 * f_a)) AS BIGINT) AS d_num,
           CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
    FROM cum
)
SELECT n1, n2, d_num,
       CAST((1000000 * d_num) // greatest(n1 * n2, 1) AS BIGINT) AS d_e6,
       CAST(((1000000 * d_num) // greatest(n1 * n2, 1))
            * ((1000000 * d_num) // greatest(n1 * n2, 1)) // greatest(n1 + n2, 1) AS BIGINT)
           AS ks_scaled,
       CAST(1844164000000 // greatest(n1 * n2, 1) AS BIGINT) AS crit_scaled,
       CAST(CASE WHEN ((1000000 * d_num) // greatest(n1 * n2, 1))
                      * ((1000000 * d_num) // greatest(n1 * n2, 1)) // greatest(n1 + n2, 1)
                      > 1844164000000 // greatest(n1 * n2, 1)
                 THEN 1 ELSE 0 END AS BIGINT) AS reject_05
FROM d
""",
)
def ks_test_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test, EXACT-RATIONAL: for
    returned ('R') vs accepted ('A') line items over the integer
    quantity support, D = max_v |F1(v) - F2(v)| is carried as the
    integer numerator d_num = max|n2·cum1(v) - n1·cum2(v)| over the
    common denominator n1·n2 — no float CDFs. The α=0.05 verdict uses
    c(0.05)² = 1.358² = 1.844164 rearranged into pure integer floor
    divisions applied IDENTICALLY on both engines: reject iff
    d_e6²/(n1+n2) > 1.844164e12/(n1·n2) (both sides floored; the
    boundary fuzz is deterministic and engine-identical, which is the
    contract — chi2 drift has the same property in drift_chi2_daily).

    Int64 headroom: d_e6 ≤ 1e6 so d_e6² ≤ 1e12 — SCALE-FREE; the
    binding term is 1e6·d_num with d_num ≤ n1·n2 in the worst case
    (fully disjoint supports), so the query is unconditionally exact
    while n1·n2 ≤ 9.2e12 — n1 = n2 ≈ 3e6, about sf2 for lineitem
    halves. Beyond that, pre-divide both cumulative counts (and the
    totals) by 1e3 before forming d_num — D is a ratio, so uniform
    pre-scaling preserves it to 1e-3 relative (same rescale
    discipline as changepoint_mean_shift).

    100 TB shape: groupBy on the value support (map-side combined to
    |support| rows — here ≤ 50), then ONE window over the bounded
    support grid (bounded_window_key convention); the data-scaling
    pass is a pure scan-aggregate. This is the canonical
    distribution-drift gate a training-data pipeline runs between
    ingestion snapshots."""
    from dist_keras_spark.operators.utils import bounded_window_key

    li = _lt(spark, sf_dir, "lineitem")
    s = li.where(F.col("l_returnflag").isin("R", "A")).select(
        F.col("l_quantity").cast("long").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_r"),
    )
    cnt = s.groupBy("v").agg(
        F.sum("is_r").alias("n_r"),
        F.sum(F.lit(1) - F.col("is_r")).alias("n_a"),
    )
    bk = bounded_window_key(F.col("v"))
    wo = (
        W.partitionBy(bk)
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wp = W.partitionBy(bk)
    cum = cnt.select(
        F.sum("n_r").over(wo).alias("f_r"),
        F.sum("n_a").over(wo).alias("f_a"),
        F.sum("n_r").over(wp).alias("n1"),
        F.sum("n_a").over(wp).alias("n2"),
    )
    d = cum.agg(
        F.max(
            F.abs(F.col("n2") * F.col("f_r") - F.col("n1") * F.col("f_a"))
        ).alias("d_num"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    return d.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("d_num").cast("long").alias("d_num"),
        F.expr("(1000000 * d_num) div greatest(n1 * n2, 1)").cast("long").alias("d_e6"),
        F.expr(
            "((1000000 * d_num) div greatest(n1 * n2, 1))"
            " * ((1000000 * d_num) div greatest(n1 * n2, 1)) div greatest(n1 + n2, 1)"
        )
        .cast("long")
        .alias("ks_scaled"),
        F.expr("1844164000000 div greatest(n1 * n2, 1)").cast("long").alias("crit_scaled"),
        F.expr(
            "CASE WHEN ((1000000 * d_num) div greatest(n1 * n2, 1))"
            " * ((1000000 * d_num) div greatest(n1 * n2, 1)) div greatest(n1 + n2, 1)"
            " > 1844164000000 div greatest(n1 * n2, 1) THEN 1 ELSE 0 END"
        )
        .cast("long")
        .alias("reject_05"),
    )


# --------------------------------------------------------------------------
# Benford first-digit audit (forensic data quality)
# --------------------------------------------------------------------------

# floor(1e6 * log10(1 + 1/d)) for d = 1..9, precomputed so NO engine
# evaluates a transcendental (libm log is not bit-portable across
# engines; fixed literals are). Sums to 999995/1e6 by flooring.
_BENFORD_E6 = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]


@query(
    "benford_first_digit_audit",
    oracle=f"""
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
obs AS (
    SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                       1, 1) AS BIGINT) AS digit,
           CAST(count(*) AS BIGINT) AS n_d
    FROM orders GROUP BY 1
), grid AS (SELECT unnest(generate_series(1, 9)) AS digit),
exp AS (
    SELECT g.digit,
           ({_BENFORD_E6})[g.digit] AS exp_e6
    FROM grid g
)
SELECT CAST(e.digit AS BIGINT) AS digit,
       CAST(coalesce(o.n_d, 0) AS BIGINT) AS n_d,
       CAST((1000000 * coalesce(o.n_d, 0)) // greatest(n.n, 1) AS BIGINT)
           AS obs_e6,
       CAST(e.exp_e6 AS BIGINT) AS exp_e6,
       CAST(abs((1000000 * coalesce(o.n_d, 0)) // greatest(n.n, 1)
                - e.exp_e6) AS BIGINT) AS abs_dev_e6
FROM exp e LEFT JOIN obs o ON o.digit = e.digit, n
""",
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit (Newcomb 1881 / Benford 1938,
    public knowledge — the standard forensic data-quality screen for
    fabricated or truncated amount columns): observed first-digit
    frequency of the order total vs the Benford expectation
    log10(1+1/d), per digit, with the absolute deviation — all in
    integer micro-units. The nine expected shares are PRECOMPUTED
    literals (floor(1e6·log10(1+1/d))) so neither engine evaluates a
    transcendental at query time; the first digit comes from string
    arithmetic on floor(amount) (always ≥ 1 here, so no zero/sign
    digit), and the digit grid is outer-joined so all nine rows
    appear even when a digit never occurs. TPC-H totals are NOT
    Benford-distributed — the audit's point is to MEASURE deviation,
    and the fixture exercises large abs_dev_e6 values.

    Int64 headroom: 1e6·n_d ≤ 1e6·rows — exact through ~9.2e12 rows.

    100 TB shape: one scan-side map to a 9-value key, map-side
    combined count, 9-row grid broadcast; nothing else. The cheapest
    audit in the catalog and the first one a finance-data ingest
    should run.

    r14 (guide §2.4, dup-scan sweep): the row total used to be a
    separate count over orders — a second differently-pruned scan of
    the fact (orders×2, 0 runtime reuse). Every order contributes
    exactly one row to the digit aggregate (groupBy counts a null
    digit group too, were one possible), so count(*) ≡ Σ n_d — the
    total now rides a window sum over the ≤10-row aggregate
    (bounded_window_key, the share_of_total pattern). Plan: orders
    scans 2→1. Scale-crossover keep: alternated A/B loses ~0.17s at
    sf0.1 (two extra tiny window stages vs two concurrent cheap
    scans) and already wins at sf1 (0.565 vs 0.596 min) — the
    structural fact-scan cut is what matters past fixture scale.
    Oracle unchanged, hash-green ×3 SFs."""
    from dist_keras_spark.operators.utils import bounded_window_key

    o = _lt(spark, sf_dir, "orders")
    obs = (
        o.select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_d"))
        .withColumn(
            "n",
            F.sum("n_d").over(
                W.partitionBy(bounded_window_key(F.col("digit")))
            ),
        )
    )
    grid = spark.range(1, 10).select(F.col("id").alias("digit"))
    exp = grid.select(
        "digit",
        F.element_at(
            F.array(*[F.lit(v) for v in _BENFORD_E6]),
            F.col("digit").cast("int"),
        ).alias("exp_e6"),
    )
    return (
        exp.join(obs, "digit", "left")
        # never-occurring digits got NULL n from the left join; a max
        # over the 9-row frame restores the total on every row (some
        # digit always occurs — orders is non-empty at every SF)
        .withColumn(
            "n",
            F.max("n").over(
                W.partitionBy(bounded_window_key(F.col("digit")))
            ),
        )
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.coalesce(F.col("n_d"), F.lit(0)).cast("long").alias("n_d"),
            F.expr("(1000000 * coalesce(n_d, 0)) div greatest(n, 1)")
            .cast("long")
            .alias("obs_e6"),
            F.col("exp_e6").cast("long").alias("exp_e6"),
            F.abs(
                F.expr("(1000000 * coalesce(n_d, 0)) div greatest(n, 1)")
                - F.col("exp_e6")
            )
            .cast("long")
            .alias("abs_dev_e6"),
        )
    )


# --------------------------------------------------------------------------
# Nonparametric trend: Mann-Kendall test + Theil-Sen median slope
# --------------------------------------------------------------------------


@query(
    "trend_mann_kendall_theilsen",
    oracle="""
WITH m AS (
    SELECT CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
                AS BIGINT) AS mi,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders GROUP BY 1
), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
pairs AS (
    SELECT b.cents - a.cents AS num, b.mi - a.mi AS den
    FROM m a JOIN m b ON a.mi < b.mi
), s AS (
    SELECT CAST(sum(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1
                         ELSE 0 END) AS BIGINT) AS s_stat
    FROM pairs
), ties AS (
    SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie18
    FROM (SELECT count(*) AS t FROM m GROUP BY cents HAVING count(*) > 1)
), ranked AS (
    SELECT num, den,
           row_number() OVER (ORDER BY CAST(num AS DOUBLE) / den, num, den)
               AS rn,
           count(*) OVER () AS np
    FROM pairs
)
SELECT n.n AS n_periods, s.s_stat,
       CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie18 AS BIGINT) AS var18,
       CAST(CASE WHEN 180000 * (abs(s.s_stat) - 1) * (abs(s.s_stat) - 1)
                      > 38416 * (n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie18)
                 THEN 1 ELSE 0 END AS BIGINT) AS trend_05,
       r.num AS med_slope_num, r.den AS med_slope_den,
       CAST((1000000 * r.num) // r.den AS BIGINT) AS slope_e6
FROM n, s, ties,
     (SELECT num, den FROM ranked WHERE rn = (np + 1) // 2) r
""",
)
def trend_mann_kendall_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric trend detection on the monthly revenue series:
    the Mann-Kendall test (Mann 1945 / Kendall 1975, public
    knowledge) with its tie-corrected variance, plus the Theil-Sen
    median slope (Theil 1950 / Sen 1968) from the same pairwise
    frame — the robust twin of ols_slope_per_supplier the way
    mad_robust_scale twins stddev. Everything integer: S = Σ sign
    over month pairs; the α=0.05 verdict is the z² > 1.96² inequality
    cross-multiplied into 180000·(|S|−1)² > 38416·var18 (var18 =
    18·Var[S] = n(n−1)(2n+5) − Σt(t−1)(2t+5), exact); the median
    slope is an exact rational (cents, months) picked by rank — the
    rank ORDER uses one engine-consistent IEEE division of exact
    integers (the label_propagation convention), ties broken by
    (num, den), and slope_e6 = (1e6·num) div den truncates toward
    zero identically on both engines (measured r8, negative OLS
    slopes). 1-ulp caveat: two distinct exact rationals within one
    double ulp collapse to the same key and are then ordered by
    (num, den) rather than true value, so the selected "median" can
    be off-by-rank from the exact rational ordering in that corner —
    deterministic and engine-identical either way, which is the
    stated contract; an exact cross-multiplied comparator would
    need an O(pairs²) join the calendar frame doesn't justify.

    Int64 headroom: |S| ≤ n(n−1)/2 so the verdict's 1.8e5·(|S|−1)²
    term is exact through n ≈ 5,000 periods — monthly or daily
    calendar grids at ANY data scale (the pairwise frame is
    calendar-bounded, not data-scaling, which is what makes the
    quadratic safe).

    100 TB shape: the per-month rollup is the only data-scaling pass
    (map-side combined to ~n_months rows); the pair self-join,
    ranking window (bounded_window_key convention), and verdict run
    on a calendar-sized frame a single executor holds regardless of
    SF."""
    from dist_keras_spark.operators.utils import bounded_window_key

    o = _lt(spark, sf_dir, "orders")
    m = o.groupBy(
        (
            (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
        ).cast("long").alias("mi")
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    n = m.agg(F.count(F.lit(1)).alias("n"))
    a = m.alias("a")
    b = m.alias("b")
    pairs = a.join(b, F.col("a.mi") < F.col("b.mi")).select(
        (F.col("b.cents") - F.col("a.cents")).alias("num"),
        (F.col("b.mi") - F.col("a.mi")).alias("den"),
    )
    s = pairs.agg(
        F.sum(
            F.when(F.col("num") > 0, 1).when(F.col("num") < 0, -1).otherwise(0)
        ).alias("s_stat")
    )
    ties = (
        m.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie18")
        )
    )
    wr = W.partitionBy(bounded_window_key(F.col("den"))).orderBy(
        F.col("num").cast("double") / F.col("den"), "num", "den"
    )
    wp = W.partitionBy(bounded_window_key(F.col("den")))
    med = (
        pairs.select(
            "num",
            "den",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wp).alias("np"),
        )
        .where(F.col("rn") == F.expr("(np + 1) div 2"))
        .select("num", "den")
    )
    return (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(med))
        .select(
            F.col("n").cast("long").alias("n_periods"),
            F.col("s_stat").cast("long").alias("s_stat"),
            F.expr("n * (n - 1) * (2 * n + 5) - tie18")
            .cast("long")
            .alias("var18"),
            F.expr(
                "CASE WHEN 180000 * (abs(s_stat) - 1) * (abs(s_stat) - 1)"
                " > 38416 * (n * (n - 1) * (2 * n + 5) - tie18)"
                " THEN 1 ELSE 0 END"
            )
            .cast("long")
            .alias("trend_05"),
            F.col("num").cast("long").alias("med_slope_num"),
            F.col("den").cast("long").alias("med_slope_den"),
            F.expr("(1000000 * num) div den").cast("long").alias("slope_e6"),
        )
    )


# --------------------------------------------------------------------------
# Kruskal-Wallis k-sample rank test (completes the nonparametric trio)
# --------------------------------------------------------------------------

# greatest(n_j, 1) / greatest(nn³-nn, 1) guards: an empty return-flag
# group (or a degenerate single-value input) would otherwise divide by
# zero — BOTH engines return NULL for x/0 here (measured: this
# environment's DuckDB NULLs integer division by zero rather than
# erroring), so the guard is not about cross-engine divergence; it
# keeps the statistic DEFINED (a number, not NULL) on degenerate
# inputs, same as analytics8's bloom/kmv ratio guards. Not reachable
# on the TPC-H fixtures (all three flags always present).
_KW_H_EXPR = (
    "((12.0 / (nn * (nn + 1.0)))"
    " * ((s2_a / 2.0) * (s2_a / 2.0) / greatest(n_a, 1)"
    " + (s2_n / 2.0) * (s2_n / 2.0) / greatest(n_n, 1)"
    " + (s2_r / 2.0) * (s2_r / 2.0) / greatest(n_r, 1))"
    " - 3.0 * (nn + 1.0))"
    " / (1.0 - tie3 / greatest(CAST(nn AS DOUBLE) * nn * nn - nn, 1.0))"
)


@query(
    "kruskal_wallis_quantity",
    oracle=f"""
WITH cnt AS (
    SELECT CAST(l_quantity AS BIGINT) AS v,
           CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS c_a,
           CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
               AS c_n,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS c_r,
           CAST(count(*) AS BIGINT) AS t
    FROM lineitem GROUP BY 1
), ranked AS (
    SELECT *,
           2 * coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                                     PRECEDING AND 1 PRECEDING), 0) + t + 1
               AS d
    FROM cnt
), agg AS (
    SELECT CAST(sum(c_a) AS BIGINT) AS n_a, CAST(sum(c_n) AS BIGINT) AS n_n,
           CAST(sum(c_r) AS BIGINT) AS n_r,
           CAST(sum(d * c_a) AS BIGINT) AS s2_a,
           CAST(sum(d * c_n) AS BIGINT) AS s2_n,
           CAST(sum(d * c_r) AS BIGINT) AS s2_r,
           CAST(sum(t) AS BIGINT) AS nn,
           CAST(sum(t * t * t - t) AS BIGINT) AS tie3
    FROM ranked
)
SELECT n_a, n_n, n_r, s2_a, s2_n, s2_r, nn, tie3,
       round({_KW_H_EXPR}, 4) AS h_corr,
       CAST(CASE WHEN {_KW_H_EXPR} > 5.991465 THEN 1 ELSE 0 END AS BIGINT)
           AS reject_05
FROM agg
""",
)
def kruskal_wallis_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis k-sample rank test (Kruskal & Wallis 1952,
    public knowledge) on line-item quantity across the three return
    flags — completing the nonparametric trio with the two-sample KS
    (ks_test_two_sample) and the Mann-Whitney AUC
    (auc_mann_whitney). The rank machinery is EXACT INTEGER on both
    engines: over the bounded value support, the midrank of a tied
    block is carried as the DOUBLED rank d(v) = 2·cum_prev + t + 1
    (always integer), so the per-group doubled rank sums s2_j, the
    tie term Σ(t³−t), and every count are hash-exact sufficient
    statistics. Only the FINAL scalar H = [12/(N(N+1))·ΣR_j²/n_j −
    3(N+1)] / [1 − Σ(t³−t)/(N³−N)] is floating point — one fixed
    expression tree over those exact integers, written CHARACTER-
    IDENTICAL on both sides (the ab_test_t_stat convention,
    strengthened: its inputs here are exact integers, not
    engine-aggregated floats, so the doubles are bit-identical by
    IEEE determinism and round(·,4)/the verdict comparison cannot
    split).

    Int64 headroom: s2_j ≤ 2N·n_j — exact through N ≈ 2e9 rows; the
    float stage's R² ≈ 1e22 exceeds 2^53 at sf0.1 already, which is
    FINE for the gate (identical doubles) and for the statistic
    (relative error ~1e-16 per op; round-4 absorbs it).

    100 TB shape: one scan → groupBy on the bounded value support
    (map-side combined to |support| rows), one window over that
    bounded grid (bounded_window_key convention), a 1-row scalar
    epilogue. The same shape as ks_test_two_sample with k groups."""
    from dist_keras_spark.operators.utils import bounded_window_key

    li = _lt(spark, sf_dir, "lineitem")
    cnt = li.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("c_n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("c_r"),
        F.count(F.lit(1)).alias("t"),
    )
    wo = (
        W.partitionBy(bounded_window_key(F.col("v")))
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = cnt.withColumn(
        "d", 2 * F.coalesce(F.sum("t").over(wo), F.lit(0)) + F.col("t") + 1
    )
    agg = ranked.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_n").cast("long").alias("n_n"),
        F.sum("c_r").cast("long").alias("n_r"),
        F.sum(F.col("d") * F.col("c_a")).cast("long").alias("s2_a"),
        F.sum(F.col("d") * F.col("c_n")).cast("long").alias("s2_n"),
        F.sum(F.col("d") * F.col("c_r")).cast("long").alias("s2_r"),
        F.sum("t").cast("long").alias("nn"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie3"),
    )
    return agg.select(
        "n_a",
        "n_n",
        "n_r",
        "s2_a",
        "s2_n",
        "s2_r",
        "nn",
        "tie3",
        F.expr(f"round({_KW_H_EXPR}, 4)").alias("h_corr"),
        F.expr(f"CASE WHEN {_KW_H_EXPR} > 5.991465 THEN 1 ELSE 0 END")
        .cast("long")
        .alias("reject_05"),
    )


# --------------------------------------------------------------------------
# Hodges-Lehmann pseudomedian (weighted Walsh averages, all integer)
# --------------------------------------------------------------------------


@query(
    "hodges_lehmann_quantity",
    oracle="""
WITH cnt AS (
    SELECT CAST(l_quantity AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS n
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
), walsh AS (
    SELECT a.v + b.v AS w2,
           CAST(CASE WHEN a.v < b.v THEN a.n * b.n
                     ELSE a.n * (a.n + 1) // 2 END AS BIGINT) AS wt
    FROM cnt a JOIN cnt b ON a.v <= b.v
), g AS (
    SELECT w2, CAST(sum(wt) AS BIGINT) AS wt FROM walsh GROUP BY 1
), c AS (
    SELECT w2, wt,
           sum(wt) OVER (ORDER BY w2 ROWS UNBOUNDED PRECEDING) AS cum,
           sum(wt) OVER () AS tot
    FROM g
)
SELECT CAST(min(CASE WHEN 2 * cum >= tot + 1 THEN w2 END) AS BIGINT) AS hl2,
       CAST(max(tot) AS BIGINT) AS n_walsh
FROM c
""",
)
def hodges_lehmann_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudomedian (Hodges & Lehmann 1963, public
    knowledge) of returned-lineitem quantity — the location estimator
    dual to the Wilcoxon test, closing the robust-location row
    (median, trimmed mean, winsorized mean, MAD scale, Theil-Sen
    slope, THIS). The estimator is the median of all n(n+1)/2 Walsh
    averages (x_i + x_j)/2 for i ≤ j — quadratic in ROWS, but over a
    BOUNDED value support it collapses to |support|² weighted pairs:
    weight n_a·n_b for v_a < v_b and n_a(n_a+1)/2 on the diagonal.
    Everything integer: Walsh values are carried DOUBLED (w2 =
    v_a + v_b), the lower weighted median is the smallest w2 whose
    cumulative weight ≥ (W+1)/2 via the all-integer 2·cum ≥ tot+1
    form, identical on both engines.

    Int64 headroom: W = n(n+1)/2 — exact through n ≈ 4e9 rows.

    100 TB shape: one scan → groupBy on the bounded support
    (map-side combined), a |support|²/2 weighted-pair frame (1275
    rows at |support| = 50 — SF-invariant), one window over that
    bounded grid (bounded_window_key convention). The naive form
    would be a self-join producing n²/2 rows; the support collapse
    IS the operator's scale story."""
    from dist_keras_spark.operators.utils import bounded_window_key

    li = _lt(spark, sf_dir, "lineitem")
    cnt = (
        li.where(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_quantity").cast("long").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = cnt.alias("a")
    b = cnt.alias("b")
    walsh = a.join(b, F.col("a.v") <= F.col("b.v")).select(
        (F.col("a.v") + F.col("b.v")).alias("w2"),
        F.when(
            F.col("a.v") < F.col("b.v"), F.col("a.n") * F.col("b.n")
        )
        .otherwise(F.expr("a.n * (a.n + 1) div 2"))
        .alias("wt"),
    )
    g = walsh.groupBy("w2").agg(F.sum("wt").alias("wt"))
    wo = (
        W.partitionBy(bounded_window_key(F.col("w2")))
        .orderBy("w2")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wp = W.partitionBy(bounded_window_key(F.col("w2")))
    c = g.select(
        "w2",
        F.sum("wt").over(wo).alias("cum"),
        F.sum("wt").over(wp).alias("tot"),
    )
    return c.agg(
        F.min(F.when(2 * F.col("cum") >= F.col("tot") + 1, F.col("w2")))
        .cast("long")
        .alias("hl2"),
        F.max("tot").cast("long").alias("n_walsh"),
    )
