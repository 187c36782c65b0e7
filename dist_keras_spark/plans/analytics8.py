"""Round-9 second wave: closing the remaining family gaps the r9
first wave pointed at — Bloom-filter FPR certification and KMV set
operations (union/intersection NDV) completing the mergeable-sketch
certification row (KMV NDV, Count-Min, MinHash, percentile bound);
common-neighbor link prediction (sixth algorithm on the house brand
graph); ML-platform primitives (decision-stump split search, m-estimate
target encoding, hashing-trick features); equi-depth histograms;
LIX readability; image perceptual hashing on the multimodal plumbing;
and density-grid core cells (DBSCAN's first phase).

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

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt


# --------------------------------------------------------------------------
# Sketch certification: Bloom filter false-positive rate
# --------------------------------------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_K = 3  # hash functions


def _bloom_bucket_sql(expr: str, i: int) -> str:
    return (
        f"('0x' || substr(md5(CAST({expr} AS VARCHAR) || ':b{i}'), 1, 8))"
        f"::BIGINT % {_BLOOM_M}"
    )


@query(
    "bloom_fpr_certified",
    oracle=f"""
WITH members AS (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
), bits AS (
    SELECT DISTINCT bucket FROM (
        SELECT {_bloom_bucket_sql('o_custkey', 0)} AS bucket FROM members
        UNION ALL SELECT {_bloom_bucket_sql('o_custkey', 1)} FROM members
        UNION ALL SELECT {_bloom_bucket_sql('o_custkey', 2)} FROM members
    )
), probes AS (
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM members)
), pb AS (
    SELECT DISTINCT c_custkey, bucket FROM (
        SELECT c_custkey, {_bloom_bucket_sql('c_custkey', 0)} AS bucket FROM probes
        UNION ALL SELECT c_custkey, {_bloom_bucket_sql('c_custkey', 1)} FROM probes
        UNION ALL SELECT c_custkey, {_bloom_bucket_sql('c_custkey', 2)} FROM probes
    )
), verdicts AS (
    SELECT pb.c_custkey,
           count(*) AS t,
           sum(CASE WHEN bits.bucket IS NOT NULL THEN 1 ELSE 0 END) AS s
    FROM pb LEFT JOIN bits ON bits.bucket = pb.bucket
    GROUP BY 1
), agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN s = t THEN 1 ELSE 0 END) AS BIGINT) AS false_pos
    FROM verdicts
)
SELECT CAST((SELECT count(*) FROM members) AS BIGINT) AS n_members,
       agg.n_probes, agg.false_pos,
       CAST((SELECT count(*) FROM bits) AS BIGINT) AS bits_set,
       CAST((1000000 * agg.false_pos) // greatest(agg.n_probes, 1) AS BIGINT) AS fpr_e6,
       CAST((1000000 * (SELECT count(*) FROM bits)
                     * (SELECT count(*) FROM bits)
                     * (SELECT count(*) FROM bits))
            // {_BLOOM_M ** 3} AS BIGINT)
           AS theo_fpr_e6
FROM agg
""",
)
def bloom_fpr_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter (Bloom 1970, public knowledge) built IN-QUERY and
    certified: m=4096 bits, k=3 md5-derived hash functions over the
    urgent-order customer set, probed with every customer NOT in the
    set. A probe is a false positive iff ALL of its (distinct) buckets
    are set. Reports the measured FPR next to the occupancy-based
    prediction (fill fraction ρ = bits_set/m ⇒ FPR ≈ ρ^k) — both in
    exact integer micro-units: bits_set ≤ 4096 so bits_set³·1e6 ≤
    6.9e16, inside int64 for any data scale (the bound is filter-,
    not data-, sized).

    Completes the sketch-certification row begun by
    kmv_distinct_certified / countmin_sketch_certified: membership
    (Bloom) joins NDV (KMV) and frequency (CMS). The runtime-join use
    of the same structure is bloom_runtime_filter_join; THIS query
    certifies the error its sizing implies.

    100 TB shape: the bit array is a ≤4096-row frame — built with one
    map-side-combined distinct and BROADCAST to the probe side (two
    scan-shaped passes, no data-sized shuffle); real deployments swap
    the verdict join for the engine's native bloom pushdown, with this
    certification run on a sampled stratum to validate sizing."""
    o = _lt(spark, sf_dir, "orders")
    c = _lt(spark, sf_dir, "customer")

    def bucket(col: F.Column, i: int) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(col.cast("string"), F.lit(f":b{i}"))), 1, 8),
                16,
                10,
            ).cast("long")
            % _BLOOM_M
        )

    members = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    bits = (
        members.select(bucket(F.col("o_custkey"), 0).alias("bucket"))
        .unionAll(members.select(bucket(F.col("o_custkey"), 1).alias("bucket")))
        .unionAll(members.select(bucket(F.col("o_custkey"), 2).alias("bucket")))
        .distinct()
    )
    probes = c.select("c_custkey").join(
        members, c.c_custkey == members.o_custkey, "left_anti"
    )
    pb = (
        probes.select("c_custkey", bucket(F.col("c_custkey"), 0).alias("bucket"))
        .unionAll(
            probes.select("c_custkey", bucket(F.col("c_custkey"), 1).alias("bucket"))
        )
        .unionAll(
            probes.select("c_custkey", bucket(F.col("c_custkey"), 2).alias("bucket"))
        )
        .distinct()
    )
    verdicts = (
        pb.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "bucket", "left")
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("s"),
        )
    )
    agg = verdicts.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("s") == F.col("t"), 1).otherwise(0)).alias("false_pos"),
    )
    n_members = members.agg(F.count(F.lit(1)).alias("n_members"))
    n_bits = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    m3 = _BLOOM_M * _BLOOM_M * _BLOOM_M
    return (
        agg.crossJoin(F.broadcast(n_members))
        .crossJoin(F.broadcast(n_bits))
        .select(
            F.col("n_members").cast("long").alias("n_members"),
            F.col("n_probes").cast("long").alias("n_probes"),
            F.col("false_pos").cast("long").alias("false_pos"),
            F.col("bits_set").cast("long").alias("bits_set"),
            F.expr("(1000000 * false_pos) div greatest(n_probes, 1)").cast("long").alias("fpr_e6"),
            F.expr(f"(1000000 * bits_set * bits_set * bits_set) div {m3}")
            .cast("long")
            .alias("theo_fpr_e6"),
        )
    )


# --------------------------------------------------------------------------
# Sketch certification: KMV set operations (union / intersection NDV)
# --------------------------------------------------------------------------

_KMV_K = 64
_KMV_SPACE = 281474976710656  # 2^48, the md5-prefix hash space


def _kuv_hash_sql(expr: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({expr} AS VARCHAR) || ':kuv'), 1, 12))::BIGINT"
    )


@query(
    "kmv_union_intersect_certified",
    oracle=f"""
WITH ha AS (
    SELECT DISTINCT {_kuv_hash_sql('o_custkey')} AS hv
    FROM orders WHERE o_orderstatus = 'O'
), hb AS (
    SELECT DISTINCT {_kuv_hash_sql('o_custkey')} AS hv
    FROM orders WHERE o_orderstatus = 'F'
), ska AS (SELECT hv FROM ha ORDER BY hv LIMIT {_KMV_K}),
skb AS (SELECT hv FROM hb ORDER BY hv LIMIT {_KMV_K}),
sku AS (
    SELECT hv FROM (SELECT hv FROM ska UNION SELECT hv FROM skb)
    ORDER BY hv LIMIT {_KMV_K}
), kth AS (
    SELECT CAST(max(hv) AS BIGINT) AS h_k, CAST(count(*) AS BIGINT) AS k_used
    FROM sku
), mt AS (
    SELECT CAST(count(*) AS BIGINT) AS matches
    FROM sku
    WHERE hv IN (SELECT hv FROM ska) AND hv IN (SELECT hv FROM skb)
), ex AS (
    SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_union,
           CAST(count(DISTINCT CASE WHEN in_a + in_b = 2 THEN o_custkey END)
                AS BIGINT) AS exact_inter
    FROM (
        SELECT o_custkey,
               max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS in_b
        FROM orders WHERE o_orderstatus IN ('O', 'F')
        GROUP BY 1
    )
), est AS (
    SELECT kth.k_used, mt.matches,
           CAST(CASE WHEN kth.k_used < {_KMV_K} THEN ex.exact_union
                     ELSE ((kth.k_used - 1) * {_KMV_SPACE}) // kth.h_k END
                AS BIGINT) AS est_union
    FROM kth CROSS JOIN mt CROSS JOIN ex
)
SELECT ex.exact_union, est.est_union, ex.exact_inter,
       CAST((est.matches * est.est_union) // greatest(est.k_used, 1) AS BIGINT)
           AS est_inter,
       est.matches, est.k_used
FROM ex CROSS JOIN est
""",
)
def kmv_union_intersect_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketches are closed under SET OPERATIONS (Beyer et al.
    2007, public knowledge): union(A,B) = the k smallest of the two
    sketches' union, and Jaccard ≈ |K(A∪B) ∩ A ∩ B| / k, giving
    |A∩B| ≈ jacc · est(A∪B). Built here over the open-order vs
    finished-order customer sets and certified against the exact
    union/intersection NDVs in the same result row — all integer
    (48-bit md5-prefix hashes, `div` estimator), so the sketch AND
    its certification replay exactly in SQL. Underfilled union sketch
    (< k values) falls back to exact by definition, as in
    kmv_distinct_certified.

    This is the property that makes KMV the scale choice over exact
    distinct: per-day / per-partition sketches are 64 longs each and
    compose associatively — NDV of any ad-hoc union of partitions
    without re-scanning them.

    100 TB shape: two map-side-combined distincts on the hash, two
    global top-k LIMITs (TakeOrdered, no full sort), then arithmetic
    on 64-row frames. The exact side exists to certify; production
    drops it."""
    o = _lt(spark, sf_dir, "orders")

    def hv(df: DataFrame) -> DataFrame:
        return df.select(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("o_custkey").cast("string"), F.lit(":kuv"))),
                    1,
                    12,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("hv")
        ).distinct()

    ska = hv(o.where(F.col("o_orderstatus") == "O")).orderBy("hv").limit(_KMV_K)
    skb = hv(o.where(F.col("o_orderstatus") == "F")).orderBy("hv").limit(_KMV_K)
    sku = ska.union(skb).distinct().orderBy("hv").limit(_KMV_K)
    kth = sku.agg(F.max("hv").alias("h_k"), F.count(F.lit(1)).alias("k_used"))
    mt = (
        sku.join(ska, "hv", "left_semi")
        .join(skb, "hv", "left_semi")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    ex = (
        o.where(F.col("o_orderstatus").isin("O", "F"))
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("in_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("exact_union"),
            F.sum(F.when(F.col("in_a") + F.col("in_b") == 2, 1).otherwise(0)).alias(
                "exact_inter"
            ),
        )
    )
    est_union = F.when(F.col("k_used") < _KMV_K, F.col("exact_union")).otherwise(
        F.expr(f"((k_used - 1) * {_KMV_SPACE}) div h_k")
    )
    return (
        ex.crossJoin(F.broadcast(kth))
        .crossJoin(F.broadcast(mt))
        .withColumn("est_union", est_union.cast("long"))
        .select(
            F.col("exact_union").cast("long").alias("exact_union"),
            "est_union",
            F.col("exact_inter").cast("long").alias("exact_inter"),
            F.expr("(matches * est_union) div greatest(k_used, 1)").cast("long").alias("est_inter"),
            F.col("matches").cast("long").alias("matches"),
            F.col("k_used").cast("long").alias("k_used"),
        )
    )


# --------------------------------------------------------------------------
# Graph family #6: common-neighbor link prediction
# --------------------------------------------------------------------------


@query(
    "link_prediction_common_neighbors",
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
edges AS (
    SELECT x AS src, y AS dst FROM pairs, thresh
    WHERE n_pairs * n_ab >= sum_ab
    UNION ALL
    SELECT y AS src, x AS dst FROM pairs, thresh
    WHERE n_pairs * n_ab >= sum_ab
), deg AS (
    SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
    FROM edges GROUP BY 1
), cand AS (
    SELECT e1.src AS x, e2.dst AS y, CAST(count(*) AS BIGINT) AS cn
    FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
    WHERE e1.src < e2.dst
    GROUP BY 1, 2
), nonedge AS (
    SELECT c.x, c.y, c.cn
    FROM cand c LEFT JOIN edges e ON e.src = c.x AND e.dst = c.y
    WHERE e.src IS NULL
)
SELECT x, y, cn, CAST(dx.degree * dy.degree AS BIGINT) AS pref_attach
FROM nonedge n
JOIN deg dx ON dx.node = n.x
JOIN deg dy ON dy.node = n.y
ORDER BY cn DESC, pref_attach DESC, x, y
LIMIT 20
""",
)
def link_prediction_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common-neighbor count with preferential-
    attachment tie-break (Liben-Nowell & Kleinberg 2003, public
    knowledge) — sixth algorithm on the house brand graph (pagerank /
    triangles / label propagation / k-core / clustering coefficient),
    reusing its integer-exact edge threshold n_pairs·n_ab ≥ sum_ab.
    Candidates are distance-2 pairs (one edge-edge self-join through
    the shared middle node) that are NOT already edges; score =
    number of shared neighbors, ties by deg(x)·deg(y) then lexically.
    All counts — no floats (Adamic-Adar's 1/log(deg) is deliberately
    avoided: libm log is not engine-portable; PA ranks the same
    use-case integer-exactly).

    100 TB shape: the classic two-hop join — shuffle on the middle
    node, hub skew bounded by the degree threshold upstream (at web
    scale, cap or salt hub fan-out); the anti-join against the edge
    list and degree joins are edge-list-sized. Top-20 is TakeOrdered,
    not a global sort."""
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
    kept = pairs.crossJoin(F.broadcast(thresh)).where(
        F.col("n_pairs") * F.col("n_ab") >= F.col("sum_ab")
    )
    edges = kept.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionAll(
        kept.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    cand = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .where(F.col("e1.src") < F.col("e2.dst"))
        .groupBy(F.col("e1.src").alias("x"), F.col("e2.dst").alias("y"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    nonedge = cand.join(
        edges,
        (edges.src == cand.x) & (edges.dst == cand.y),
        "left_anti",
    )
    dx = deg.alias("dx")
    dy = deg.alias("dy")
    return (
        nonedge.join(dx, F.col("dx.node") == F.col("x"))
        .join(dy, F.col("dy.node") == F.col("y"))
        .select(
            "x",
            "y",
            F.col("cn").cast("long").alias("cn"),
            (F.col("dx.degree") * F.col("dy.degree"))
            .cast("long")
            .alias("pref_attach"),
        )
        .orderBy(
            F.col("cn").desc(), F.col("pref_attach").desc(), F.col("x"), F.col("y")
        )
        .limit(20)
    )
