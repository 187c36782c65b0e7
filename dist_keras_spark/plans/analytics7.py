"""Round-9 wave: the completion queries the r8 families pointed at —
t-closeness (finishing the k-anonymity / l-diversity privacy trio),
exact AUC via the Mann-Whitney rank statistic (finishing the
binary-evaluation family), MAD robust scale (finishing winsorize's
robust-stats family), per-node clustering coefficients (fifth
algorithm on the house brand graph), Matryoshka truncation recall and
ColBERT-style MaxSim late interaction (retrieval family), cluster-cap
sampling and incremental batch-vs-corpus dedup (training-data
curation), capped sessionization, a Heaps-law vocabulary growth curve,
and the documents-table profile.

dist-keras has no analogue for any of these — "beyond the reference"
training-data-pipeline surface (brief: dedup / similarity / text
analysis are first-class), mapped in COVERAGE.md.

House rules (see analytics5.py): md5 is the engine-portable
fingerprint; integer micro units via exact `div`; BIGINT `div`
(Spark) == `//` (DuckDB) ONLY while every operand stays integer (one
`/` poisons the chain to DOUBLE and DuckDB `bigint // double` does
not floor — measured r9, verify-skill gotcha); floor(double) then
CAST is portable, bare CAST of a non-integral double is not.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dist_keras_spark.plans.registry import ORACLE, query
from dist_keras_spark.sources.tables import load_table as _lt


# --------------------------------------------------------------------------
# Privacy trio completion: t-closeness
# --------------------------------------------------------------------------


@query(
    "t_closeness_audit",
    oracle="""
WITH base AS (
    SELECT CAST(c_nationkey AS BIGINT) AS qi_nation,
           CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS qi_band,
           c_mktsegment AS seg
    FROM customer
), gseg AS (
    SELECT seg, CAST(count(*) AS BIGINT) AS big_c FROM base GROUP BY seg
), nn AS (SELECT CAST(count(*) AS BIGINT) AS big_n FROM base),
cls AS (
    SELECT qi_nation, qi_band, seg, CAST(count(*) AS BIGINT) AS c
    FROM base GROUP BY 1, 2, 3
), sz AS (
    SELECT qi_nation, qi_band, CAST(sum(c) AS BIGINT) AS n
    FROM cls GROUP BY 1, 2
), dist AS (
    -- variational distance on a common denominator: t = Σ|p−q|/2 with
    -- p = c/n, q = C/N  ⇒  t_e6 = (1e6 · Σ|c·N − C·n|) div (2·n·N).
    -- Segments absent from a class contribute |0·N − C·n| = C·n, so
    -- the glob × sz cross join (segments × classes, domain-bounded)
    -- is the complete support, left-joined with observed counts.
    SELECT s.qi_nation, s.qi_band, s.n,
           CAST(sum(abs(coalesce(c.c, 0) * nn.big_n - g.big_c * s.n))
                AS BIGINT) AS num
    FROM sz s CROSS JOIN gseg g CROSS JOIN nn
    LEFT JOIN cls c ON c.qi_nation = s.qi_nation
                   AND c.qi_band = s.qi_band AND c.seg = g.seg
    GROUP BY 1, 2, 3
)
SELECT d.qi_nation, d.qi_band, d.n AS class_size,
       CAST((1000000 * d.num) // (2 * d.n * nn.big_n) AS BIGINT)
           AS t_e6,
       CAST(CASE WHEN (1000000 * d.num) // (2 * d.n * nn.big_n) > 250000
                 THEN 1 ELSE 0 END AS BIGINT) AS t_violation
FROM dist d CROSS JOIN nn
""",
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit #3 — t-closeness (Li, Li & Venkatasubramanian
    2007, public knowledge), completing the k-anonymity (class size)
    → l-diversity (distinct sensitive values) → t-closeness
    (sensitive-value DISTRIBUTION) escalation on the same QI
    machinery: per (nation, 2000-unit balance band) class, the
    variational distance between the class's market-segment
    distribution and the global one, flagged when t > 0.25. Exact
    integers on a common denominator — t_e6 = (1e6·Σ|c·N − C·n|) div
    (2·n·N) — so the hash has no float to trip on. Absent segments
    contribute their full global mass (the distance a homogeneity
    attack exploits), via the domain-bounded class × segment support.

    100 TB shape: one QI×segment hash aggregation (map-side partial),
    then arithmetic on QI-domain-bounded frames — the global segment
    histogram and total broadcast. INT64 headroom: c·N ≤ n_rows² ⇒
    past ~3e9 rows rescale q to a 1e6 fixed-point global share first
    (the conformal_interval_coverage discipline)."""
    c = _lt(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_nationkey").cast("long").alias("qi_nation"),
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("qi_band"),
        F.col("c_mktsegment").alias("seg"),
    )
    glob = base.groupBy("seg").agg(F.count(F.lit(1)).alias("big_c"))
    nn = base.agg(F.count(F.lit(1)).alias("big_n"))
    cls = base.groupBy("qi_nation", "qi_band", "seg").agg(
        F.count(F.lit(1)).alias("c")
    )
    sz = cls.groupBy("qi_nation", "qi_band").agg(F.sum("c").alias("n"))
    support = sz.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(nn))
    dist = (
        support.join(cls, ["qi_nation", "qi_band", "seg"], "left")
        .groupBy("qi_nation", "qi_band", "n", "big_n")
        .agg(
            F.sum(
                F.abs(
                    F.coalesce(F.col("c"), F.lit(0)) * F.col("big_n")
                    - F.col("big_c") * F.col("n")
                )
            ).alias("num")
        )
    )
    t_e6 = F.expr("(1000000 * num) div (2 * n * big_n)")
    return dist.select(
        "qi_nation",
        "qi_band",
        F.col("n").alias("class_size"),
        t_e6.cast("long").alias("t_e6"),
        F.when(t_e6 > 250000, F.lit(1)).otherwise(F.lit(0)).cast("long").alias(
            "t_violation"
        ),
    )


# --------------------------------------------------------------------------
# Evaluation family completion: exact AUC via Mann-Whitney
# --------------------------------------------------------------------------

# Fixed integer scoring weights for the AUC probe: drawn once
# (RandomState(7), ±9 range) and inlined as literals on BOTH sides so
# the score is exact integer arithmetic. 64 dims · max|w|=9 ·
# max|floor(e·1000)| ≈ 1000 bounds |score| ≤ ~576k — a BOUNDED score
# grid regardless of row count (load-bearing for the window below).
_AUC_W = [int(v) for v in np.random.RandomState(7).randint(-9, 10, 64)]


def _auc_oracle_sql() -> str:
    wlit = "[" + ", ".join(str(v) for v in _AUC_W) + "]"
    return f"""
WITH scored AS (
    SELECT vec_id,
           CAST(list_sum(list_transform(range(1, 65),
               i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                         AS BIGINT) * ({wlit})[i])) AS BIGINT) AS s,
           CAST(CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS pos
    FROM embeddings
), grid AS (
    SELECT s, CAST(sum(pos) AS BIGINT) AS np_s,
           CAST(count(*) - sum(pos) AS BIGINT) AS nn_s
    FROM scored GROUP BY s
), cum AS (
    SELECT s, np_s, nn_s,
           CAST(coalesce(sum(nn_s) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS neg_below
    FROM grid
), tot AS (
    SELECT CAST(sum(np_s) AS BIGINT) AS n_pos,
           CAST(sum(nn_s) AS BIGINT) AS n_neg,
           CAST(sum(np_s * (2 * neg_below + nn_s)) AS BIGINT) AS u2
    FROM cum
)
SELECT n_pos, n_neg, u2,
       CAST((1000000 * u2) // (2 * n_pos * n_neg) AS BIGINT) AS auc_e6
FROM tot
"""


@query("auc_mann_whitney", oracle=_auc_oracle_sql())
def auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney U statistic (public
    knowledge: AUC = P(score⁺ > score⁻) + ½P(tie)), completing the
    binary-evaluation family (confusion → calibration bins → ranking
    MRR/NDCG → THIS). Scores are integer dot products of
    floor(e·1000) against fixed ±9 literal weights, so ties are real
    and handled exactly: U2 = Σ_s n_pos(s)·(2·neg_below(s) + n_neg(s))
    counts each concordant pair twice and each tied pair once —
    auc_e6 = (1e6·U2) div (2·n_pos·n_neg), no float anywhere.

    100 TB shape: scoring is scan-side column math; the only
    aggregation is groupBy(score) with map-side combine onto a grid
    BOUNDED by the score range (|s| ≤ 64·9·1000 ≈ 576k distinct
    values regardless of row count — the quantization is what makes
    the cumulative window bounded-input); the cumulative sum runs on
    that bounded grid, never on rows. The pair-counting join
    formulation would be n_pos·n_neg — this is the rank-statistic
    shape that replaces it."""
    from dist_keras_spark.operators.utils import bounded_window_key

    e = _lt(spark, sf_dir, "embeddings")
    warr = F.array(*[F.lit(v) for v in _AUC_W])
    score = F.aggregate(
        F.zip_with(
            F.transform(
                "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("long")
            ),
            warr,
            lambda a, b: a * b,
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = e.select(
        score.alias("s"),
        ((F.col("label") % 2) == 0).cast("long").alias("pos"),
    )
    grid = scored.groupBy("s").agg(
        F.sum("pos").alias("np_s"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("nn_s"),
    )
    # bounded-input window: the score grid is ≤ ~1.15M rows by
    # construction (see docstring) — reviewed global cumulative
    win = (
        W.partitionBy(bounded_window_key(F.col("s")))
        .orderBy("s")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = grid.select(
        "s",
        "np_s",
        "nn_s",
        F.coalesce(F.sum("nn_s").over(win), F.lit(0)).alias("neg_below"),
    )
    tot = cum.agg(
        F.sum("np_s").alias("n_pos"),
        F.sum("nn_s").alias("n_neg"),
        F.sum(
            F.col("np_s") * (2 * F.col("neg_below") + F.col("nn_s"))
        ).alias("u2"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        "u2",
        F.expr("(1000000 * u2) div (2 * n_pos * n_neg)").cast("long").alias(
            "auc_e6"
        ),
    )


# --------------------------------------------------------------------------
# Robust-stats family completion: median absolute deviation
# --------------------------------------------------------------------------


@query(
    "mad_robust_scale",
    oracle="""
WITH d AS (
    SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS q,
           l_orderkey * 10 + l_linenumber AS rid
    FROM lineitem
), r1 AS (
    SELECT l_suppkey, q,
           row_number() OVER (PARTITION BY l_suppkey ORDER BY q, rid) AS rn,
           count(*) OVER (PARTITION BY l_suppkey) AS n
    FROM d
), med AS (
    SELECT l_suppkey, q AS median_qty, n FROM r1 WHERE rn = (n + 1) // 2
), dev AS (
    SELECT d.l_suppkey, abs(d.q - m.median_qty) AS ad, d.rid, m.median_qty, m.n
    FROM d JOIN med m ON m.l_suppkey = d.l_suppkey
), r2 AS (
    SELECT l_suppkey, ad, median_qty, n,
           row_number() OVER (PARTITION BY l_suppkey ORDER BY ad, rid) AS rn
    FROM dev
)
SELECT l_suppkey AS suppkey, CAST(n AS BIGINT) AS n,
       CAST(median_qty AS BIGINT) AS median_qty,
       CAST(ad AS BIGINT) AS mad_qty
FROM r2 WHERE rn = (n + 1) // 2
""",
)
def mad_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per supplier — the robust scale
    estimator that pairs with winsorize_clamp_stats's robust location
    (public knowledge: MAD = median(|x − median(x)|), breakdown point
    50% vs stddev's 0%). Both medians use the house DISCRETE rank
    selection (the (n+1)//2-th smallest, rid tie-break) so every
    value is an observed integer quantity — no interpolation, no
    float, hash-exact by construction.

    100 TB shape: two supplier-keyed window passes over the same
    shuffle key (Catalyst reuses the partitioning; the second pass
    consumes the first's broadcast-joined median) — the canonical
    two-pass nested-median plan; partitions scale with the supplier
    key, never global. At true scale the inner selection swaps for
    the certified sketch (approx_percentile_certified) per group."""
    li = _lt(spark, sf_dir, "lineitem")
    d = li.select(
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("q"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
    )
    w1 = W.partitionBy("l_suppkey").orderBy("q", "rid")
    r1 = d.select(
        "l_suppkey",
        "q",
        F.row_number().over(w1).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("l_suppkey")).alias("n"),
    )
    med = r1.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "l_suppkey", F.col("q").alias("median_qty"), "n"
    )
    dev = d.join(med, "l_suppkey").select(
        "l_suppkey",
        F.abs(F.col("q") - F.col("median_qty")).alias("ad"),
        "rid",
        "median_qty",
        "n",
    )
    w2 = W.partitionBy("l_suppkey").orderBy("ad", "rid")
    r2 = dev.withColumn("rn", F.row_number().over(w2))
    return r2.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("n").cast("long").alias("n"),
        F.col("median_qty").cast("long").alias("median_qty"),
        F.col("ad").cast("long").alias("mad_qty"),
    )


# --------------------------------------------------------------------------
# Graph family #5: per-node clustering coefficient
# --------------------------------------------------------------------------


@query(
    "clustering_coefficient_nodes",
    oracle="""
WITH baskets AS (
    SELECT DISTINCT l.l_orderkey, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), pairs AS (
    SELECT a.p_brand AS x, b.p_brand AS y, count(*) AS n_ab
    FROM baskets a JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY 1, 2
), thresh AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                     CAST(sum(n_ab) AS BIGINT) AS sum_ab FROM pairs),
und AS (
    SELECT x, y FROM pairs, thresh WHERE n_pairs * n_ab >= sum_ab
), edges AS (
    SELECT x AS src, y AS dst FROM und
    UNION ALL
    SELECT y AS src, x AS dst FROM und
), deg AS (
    SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
    FROM edges GROUP BY src
), tri AS (
    SELECT e1.x AS a, e1.y AS b, e2.y AS c
    FROM und e1
    JOIN und e2 ON e1.y = e2.x
    JOIN und e3 ON e3.x = e1.x AND e3.y = e2.y
), tnode AS (
    SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ) GROUP BY node
)
SELECT d.node AS brand, d.degree,
       CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.degree >= 2
            THEN CAST((2000000 * coalesce(t.n_tri, 0))
                      // (d.degree * (d.degree - 1)) AS BIGINT) END
           AS clustering_e6
FROM deg d LEFT JOIN tnode t ON t.node = d.node
""",
)
def clustering_coefficient_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node clustering coefficient on the house brand graph —
    fifth algorithm on the same edge list (PageRank, triangles, label
    propagation, k-core, THIS): C(v) = 2·tri(v) / (deg(v)·(deg(v)−1))
    (Watts & Strogatz 1998, public knowledge), reported in exact e6
    fixed point; degree-1 nodes get NULL (undefined, the fairness-
    audit guard discipline). Triangles enumerate once in canonical
    a<b<c orientation then explode to their three corners.

    100 TB shape: the wedge join e1⋈e2 is the standard bottleneck —
    on a power-law graph, degree-order each edge first (low endpoint
    first) to bound it, as triangle_count_brands documents; per-node
    counts are one corner-explode aggregation. The brand fixture
    graph is dim-sized; the heavy work is the shared basket
    aggregation, reused by Catalyst across the five algorithms."""
    l = _lt(spark, sf_dir, "lineitem")
    p = _lt(spark, sf_dir, "part")
    baskets = (
        l.join(p, l.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(F.col("a.p_brand").alias("x"), F.col("b.p_brand").alias("y"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    thresh = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("n_ab").alias("sum_ab")
    )
    und = (
        pairs.crossJoin(F.broadcast(thresh))
        .filter(F.col("n_pairs") * F.col("n_ab") >= F.col("sum_ab"))
        .select("x", "y")
    )
    edges = und.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionByName(
        und.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.y") == F.col("e2.x"))
        .join(
            e3,
            (F.col("e3.x") == F.col("e1.x")) & (F.col("e3.y") == F.col("e2.y")),
        )
        .select(
            F.col("e1.x").alias("a"), F.col("e1.y").alias("b"), F.col("e2.y").alias("c")
        )
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    tnode = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
    joined = deg.join(tnode, "node", "left").select(
        F.col("node").alias("brand"),
        "degree",
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_triangles"),
    )
    return joined.select(
        "brand",
        "degree",
        "n_triangles",
        F.when(
            F.col("degree") >= 2,
            F.expr("(2000000 * n_triangles) div (degree * (degree - 1))").cast(
                "long"
            ),
        ).alias("clustering_e6"),
    )


# --------------------------------------------------------------------------
# Text family: Heaps-law vocabulary growth at geometric checkpoints
# --------------------------------------------------------------------------

_VOCAB_CHECKPOINTS = [64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384]


def _vocab_growth_oracle_sql() -> str:
    docs = ", ".join(
        f"CAST(sum(CASE WHEN doc_id < {c} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS d{c}"
        for c in _VOCAB_CHECKPOINTS
    )
    vocab = ", ".join(
        f"CAST(sum(CASE WHEN first_doc < {c} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS v{c}"
        for c in _VOCAB_CHECKPOINTS
    )
    stack = " UNION ALL ".join(
        f"SELECT {c} AS checkpoint, d.d{c} AS n_docs, v.v{c} AS vocab_size"
        f" FROM d, v"
        for c in _VOCAB_CHECKPOINTS
    )
    return f"""
WITH firsts AS (
    SELECT token, CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    WHERE token <> ''
    GROUP BY token
), d AS (SELECT {docs} FROM documents),
v AS (SELECT {vocab} FROM firsts)
SELECT checkpoint, n_docs, vocab_size FROM ({stack})
WHERE n_docs > 0
ORDER BY checkpoint
"""


@query("vocab_growth_curve", oracle=_vocab_growth_oracle_sql())
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth measurement (public knowledge:
    V(n) ≈ K·nᵝ): distinct-token vocabulary size after the first
    64/128/…/16384 documents in ingest (doc_id) order — the curve a
    tokenizer-budget or dedup-saturation decision reads. Key move for
    scale: NO global row ranking — each token reduces to its FIRST
    containing doc (one groupBy min), and every checkpoint is then a
    conditional partial-aggregate over that token frame, all
    checkpoints in ONE pass. Checkpoints with no documents yet are
    dropped (SF-stable output semantics). Everything integer.

    100 TB shape: explode→min-groupBy is the inverted-index build
    (one shuffle on token, map-side combined); checkpoint sums are a
    single 1-row aggregate stacked — the curve costs one index pass
    regardless of how many checkpoints."""
    d = _lt(spark, sf_dir, "documents")
    firsts = (
        d.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    dagg = d.agg(
        *[
            F.sum((F.col("doc_id") < c).cast("long")).alias(f"d{c}")
            for c in _VOCAB_CHECKPOINTS
        ]
    )
    vagg = firsts.agg(
        *[
            F.sum((F.col("first_doc") < c).cast("long")).alias(f"v{c}")
            for c in _VOCAB_CHECKPOINTS
        ]
    )
    stacked = (
        dagg.crossJoin(vagg)
        .select(
            F.expr(
                "stack("
                + str(len(_VOCAB_CHECKPOINTS))
                + ", "
                + ", ".join(
                    f"{c}L, d{c}, v{c}" for c in _VOCAB_CHECKPOINTS
                )
                + ") AS (checkpoint, n_docs, vocab_size)"
            )
        )
        .filter(F.col("n_docs") > 0)
    )
    return stacked.select("checkpoint", "n_docs", "vocab_size")


# --------------------------------------------------------------------------
# Retrieval family: Matryoshka truncation recall + ColBERT-style MaxSim
# --------------------------------------------------------------------------


def _mrl_oracle_sql() -> str:
    return f"""
WITH full_knn AS ({ORACLE["knn_bruteforce_top5"]}),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id % 20 = 0),
tscored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           round(
             list_sum(list_transform(range(1, 17),
                 i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
             / (sqrt(list_sum(list_transform(range(1, 17),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, 17),
                 i -> q.qv[i] * q.qv[i])))), 6) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
),
tranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS knn_rank
            FROM tscored),
trunc_knn AS (SELECT query_id, neighbor_id FROM tranked WHERE knn_rank <= 5)
SELECT f.query_id,
       CAST(count(t.neighbor_id) AS BIGINT) AS n_overlap_at5,
       CAST(200000 * count(t.neighbor_id) AS BIGINT) AS recall_e6
FROM full_knn f
LEFT JOIN trunc_knn t
  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
GROUP BY f.query_id
"""


@query("mrl_truncation_recall", oracle=_mrl_oracle_sql())
def mrl_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation truncation audit (Kusupati et al.
    2022, public knowledge): recall@5 of the FIRST-16-DIMS cosine
    ranking against the full-64-dim exact top-5, per query — the
    measurement that decides whether a truncated (4× cheaper, 4×
    smaller) index is good enough to serve. The full side is the
    REGISTERED knn_bruteforce_top5 oracle wrapped as a CTE, pinning
    this audit to the exact ranking the driver already hash-checks;
    the truncated side is the same machinery over a prefix slice.
    Overlap counting is integer; recall_e6 = overlap·1e6/5.

    100 TB shape: both rankings broadcast the query side and scan the
    corpus once each (the truncated scan reads 4× fewer bytes — at
    scale it reads a separate 16-dim projection column and the
    measured recall justifies or rejects that index)."""
    from dist_keras_spark.operators.similarity import knn_bruteforce

    e = _lt(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 20 == 0)
    full = knn_bruteforce(e, q, "vec_id", "embedding", k=5).select(
        "query_id", "neighbor_id"
    )
    e16 = e.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    q16 = e16.filter(F.col("vec_id") % 20 == 0)
    trunc = knn_bruteforce(e16, q16, "vec_id", "embedding", k=5).select(
        F.col("query_id").alias("t_query_id"),
        F.col("neighbor_id").alias("t_neighbor_id"),
    )
    overlap = full.join(
        trunc,
        (F.col("query_id") == F.col("t_query_id"))
        & (F.col("neighbor_id") == F.col("t_neighbor_id")),
        "left",
    )
    return overlap.groupBy("query_id").agg(
        F.count("t_neighbor_id").alias("n_overlap_at5"),
        (200000 * F.count("t_neighbor_id")).alias("recall_e6"),
    )


_COLBERT_OFFSETS = [0, 16, 32, 48]


def _colbert_oracle_sql() -> str:
    def dot(oq: int, od: int) -> str:
        return (
            f"list_sum(list_transform(range(1, 17),"
            f" i -> q.v[{oq} + i] * d.v[{od} + i]))"
        )

    maxsim = " + ".join(
        "greatest(" + ", ".join(dot(oq, od) for od in _COLBERT_OFFSETS) + ")"
        for oq in _COLBERT_OFFSETS
    )
    return f"""
WITH q8 AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
), scored AS (
    SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
           CAST({maxsim} AS BIGINT) AS maxsim
    FROM q8 q, q8 d
    WHERE q.vec_id % 50 = 0 AND d.vec_id <> q.vec_id
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY maxsim DESC, neighbor_id) AS rk
    FROM scored
)
SELECT query_id, neighbor_id, rk, maxsim FROM ranked WHERE rk <= 3
"""


@query("colbert_maxsim_top3", oracle=_colbert_oracle_sql())
def colbert_maxsim_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia
    2020, public knowledge): each vector is treated as 4 token
    vectors (16-dim slices), score(q,d) = Σ_{query tokens} max_{doc
    tokens} ⟨qt, dt⟩ — MaxSim keeps per-token alignment information a
    single pooled dot product destroys. Token dots are integer
    (floor(e·1000) quantization, the knn_int8 discipline), so the
    4×4 dot grid, the per-query-token max, and the sum are all exact
    int64 and the ranking hash-checks bit-for-bit.

    100 TB shape: the scoring is a pure column expression — the
    query side (every 50th vector) broadcasts with its 4 slices, the
    corpus scans once and never shuffles, ranking is a per-query-key
    window. 256 multiplies/pair in interpreted HOF lambdas is the
    fixture path; at true scale the same 4×4 MaxSim grid moves into
    the Arrow kernel (operators/similarity.py's ivf machinery) with
    this query as its exact oracle."""
    e = _lt(spark, sf_dir, "embeddings")
    q8 = e.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("long")
        ).alias("v"),
    )
    queries = q8.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def tok_dot(oq: int, od: int):
        return F.aggregate(
            F.zip_with(
                F.slice("qv", oq + 1, 16),
                F.slice("v", od + 1, 16),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    maxsim = None
    for oq in _COLBERT_OFFSETS:
        term = F.greatest(*[tok_dot(oq, od) for od in _COLBERT_OFFSETS])
        maxsim = term if maxsim is None else maxsim + term
    scored = (
        q8.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            maxsim.alias("maxsim"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("maxsim"), F.asc("neighbor_id"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select("query_id", "neighbor_id", "rk", "maxsim")
    )
