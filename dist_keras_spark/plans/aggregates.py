"""Aggregations (SURVEY.md §2.D): hash aggs, distinct, rollup/cube,
collect, percentiles, statistics, pivot.

All built-in JVM aggregates → Spark plans partial (map-side) + final
aggregation automatically; the shuffle carries only group keys ×
partial states. Float outputs are rounded and aliased identically to
the DuckDB oracle (SURVEY.md §7.2).

DuckDB gotcha: sum(INTEGER) returns HUGEINT there — oracle SQL casts
to BIGINT wherever Spark returns bigint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt


@query(
    "agg_basic_stats",
    oracle="""
SELECT l_returnflag,
       round(sum(l_quantity), 2)      AS sum_qty,
       min(l_extendedprice)           AS min_price,
       max(l_extendedprice)           AS max_price,
       round(avg(l_extendedprice), 4) AS avg_price,
       count(*)                       AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: sum/min/max/avg/count in one hash aggregate."""
    li = _lt(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_count_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: multiple exact count-distincts (expand + two-phase agg)."""
    li = _lt(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query("agg_approx_count_distinct")  # no oracle: approximate → rows-only check
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: HLL++ approximate distinct. Tested against exact in tests/
    (±5%); driver does a rows-only check since hashes can't match."""
    li = _lt(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")
    )


@query(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty_int,
       count(*) AS n,
       CAST(grouping(l_returnflag) AS INT) * 2 + CAST(grouping(l_linestatus) AS INT)
           AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: rollup with grouping_id — (flag,status), (flag), () levels."""
    li = _lt(spark, sf_dir, "lineitem").withColumn(
        "qty_int", F.col("l_quantity").cast("bigint")
    )
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("qty_int").alias("sum_qty_int"),
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().cast("int").alias("gid"),
    )


@query(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: cube — all 4 grouping-set combinations in one pass."""
    o = _lt(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "agg_collect_set",
    oracle="""
SELECT l_returnflag,
       array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: collect_set, sorted + joined to a string so the cross-engine
    hash is representation-stable."""
    li = _lt(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses")
    )


@query(
    "agg_median_percentile",
    oracle="""
SELECT l_returnflag,
       round(median(l_quantity), 4) AS med_qty,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: exact median + exact continuous percentile.

    `percentile` (exact, interpolating) matches DuckDB quantile_cont;
    approx_percentile is exercised in tests instead (not hash-stable).
    """
    li = _lt(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
    )


@query(
    "agg_variance_corr",
    oracle="""
SELECT l_linestatus,
       round(stddev_samp(l_quantity), 4)                 AS sd_qty,
       round(var_samp(l_extendedprice), 2)               AS var_price,
       round(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
FROM lineitem
GROUP BY l_linestatus
""",
)
def agg_variance_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: second-moment statistics (single-pass co-moment aggregates)."""
    li = _lt(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
    )


@query(
    "agg_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(coalesce(count(*) FILTER (WHERE l_linestatus = 'F'), 0) AS BIGINT) AS F,
       CAST(coalesce(count(*) FILTER (WHERE l_linestatus = 'O'), 0) AS BIGINT) AS O
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9: pivot on linestatus with an explicit value list (no extra
    distinct-values job — required discipline at scale)."""
    li = _lt(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O"])
    )


@query(
    "agg_weighted_avg",
    oracle="""
SELECT l_linestatus,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
           AS weighted_avg_price
FROM lineitem
GROUP BY l_linestatus
""",
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 composite: ratio of sums (weighted average price by quantity)."""
    li = _lt(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity"), 4
        ).alias("weighted_avg_price")
    )


@query(
    "agg_accuracy_evaluator",
    oracle="""
SELECT round(avg(CASE WHEN (vec_id % 10) = label THEN 1.0 ELSE 0.0 END), 6)
           AS accuracy
FROM embeddings
""",
)
def agg_accuracy_evaluator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 (REF distkeras/evaluators.py §AccuracyEvaluator ~L30-60): mean
    of prediction==label, as one JVM aggregate instead of an RDD map.
    Here the 'prediction' is the deterministic vec_id%10 so the oracle
    can replay it; the real evaluator operator wraps any column pair
    (operators/evaluators.py)."""
    e = _lt(spark, sf_dir, "embeddings")
    return e.select(
        F.round(
            F.avg(((F.col("vec_id") % 10) == F.col("label")).cast("double")), 6
        ).alias("accuracy")
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       round(sum(l_extendedprice), 2) AS total,
       grouping(l_returnflag) AS g_flag,
       grouping(l_linestatus) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@query("agg_grouping_sets", oracle=_GROUPING_SETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 completion: explicit GROUPING SETS (the general form rollup
    and cube sugar over) — per-flag totals, per-status totals, and the
    grand total in ONE pass, with grouping() flags disambiguating real
    NULLs from subtotal rows. Spark executes this as a single Expand +
    hash aggregate: the input is scanned once and each row is expanded
    to its 3 grouping combinations map-side, so the shuffle carries
    3× keys but the scan cost (the dominant term at 100 TB) is paid
    once — strictly better than 3 separate aggregates unioned."""
    from dist_keras_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_GROUPING_SETS_SQL)


@query(
    "unpivot_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem)
UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount))
""",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 inverse: unpivot/melt — wide measure columns to long
    (measure, value) rows, the reshape every metrics store ingest
    needs (and the exact inverse of agg_pivot). Spark's native
    `DataFrame.unpivot` expands rows map-side with NO shuffle and no
    UDF — at 100 TB it's a pure narrow transform that pipelines into
    whatever aggregation follows."""
    li = _lt(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val_raw",
    ).select(
        "l_orderkey", "l_linenumber", "measure", F.round("val_raw", 2).alias("val")
    )


@query(
    "agg_max_by",
    oracle="""
SELECT o_orderpriority,
       max_by(o_orderkey,
              CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000
              + o_orderkey)
           AS top_orderkey,
       round(max(o_totalprice), 2) AS top_price
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-family: top-1-per-group WITHOUT a window — max_by/arg_max
    carries the argument of the max through a plain hash aggregate:
    map-side partial + final, no per-group sort, no row_number. At
    100 TB this is strictly cheaper than the window formulation when
    only the top row is needed. Determinism: max_by is tie-arbitrary,
    so the ordering key is made UNIQUE by packing (price-cents,
    orderkey) into one bigint — integer-exact in both engines.
    Packing bounds (both must hold, neither engine range-checks int64
    silently the same way): o_orderkey < 10^10 (TPC-H SF ≲ 1,600) and
    price-cents < 9.2·10^8 i.e. price < $9.2M (TPC-H max ≈ $600k).
    DuckDB max_by can't take a struct key, so lexicographic packing
    is the portable formulation; beyond these bounds switch the key
    to lpad-ed string concat (unbounded, slower)."""
    o = _lt(spark, sf_dir, "orders")
    ord_key = (
        F.round(F.col("o_totalprice") * 100).cast("long") * 10000000000
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", ord_key).alias("top_orderkey"),
        F.round(F.max("o_totalprice"), 2).alias("top_price"),
    )


@query(
    "agg_boolean_conditional",
    oracle="""
SELECT event_type,
       CAST(sum(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       bool_and(value >= 0) AS all_nonneg,
       bool_or(value > 489)  AS any_extreme
FROM events
GROUP BY event_type
""",
)
def agg_boolean_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-family: conditional and boolean aggregates — count_if,
    bool_and (every), bool_or (any). All three fold into the same
    partial/final hash aggregate as plain counts (a boolean partial
    state per group), so predicates over billions of rows reduce to
    one scan + one tiny shuffle."""
    e = _lt(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("count_if(value > 400)").alias("n_high"),
        F.expr("bool_and(value >= 0)").alias("all_nonneg"),
        F.expr("bool_or(value > 489)").alias("any_extreme"),
    )


@query(
    "agg_string_concat_ordered",
    oracle="""
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
           AS statuses_csv,
       count(DISTINCT o_orderstatus) AS n_statuses
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 extension: ordered string aggregation (listagg/string_agg) —
    per-group DISTINCT values concatenated in a DETERMINISTIC order.
    Spark-first expression: collect_set → array_sort → array_join,
    which the house serialization convention (`*_csv`) already
    requires for the driver hash; the explicit sort is what makes a
    set-valued aggregate hashable at all. Group count is tiny
    (priorities × statuses), so the collect_set state is bounded —
    the precondition for ANY listagg at scale."""
    o = _lt(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses_csv"
        ),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@query(
    "agg_percentile_disc_rank",
    oracle="""
WITH ranked AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS cnt
    FROM events
)
SELECT event_type, round(value, 2) AS p90_disc,
       cnt AS n
FROM ranked
WHERE rn = CAST(ceil(0.9 * cnt) AS BIGINT)
""",
)
def agg_percentile_disc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentile (an actual data element, not an
    interpolation): the p90 of value per event type as the row whose
    rank equals ceil(0.9·n). Engines disagree on quantile_disc tie
    conventions, so BOTH sides spell out the rank selection with the
    same deterministic (value, event_id) ordering — portability by
    construction rather than by builtin. One ranked window per
    data-scaling key + a rank-equality filter; the interpolated twin
    is agg_median_percentile (D7)."""
    e = _lt(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("cnt"),
    )
    return ranked.filter(
        F.col("rn") == F.ceil(0.9 * F.col("cnt")).cast("long")
    ).select("event_type", F.round("value", 2).alias("p90_disc"), F.col("cnt").alias("n"))


@query(
    "pivot_multi_measure",
    oracle="""
SELECT o_orderpriority,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS f_n,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS f_total,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS o_n,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS o_total,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS p_n,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS p_total
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_multi_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 extension: pivot carrying TWO measures per pivoted column
    (count + sum for each order status) — Spark suffixes each pivot
    value with each aggregate alias; the oracle is the CASE-folded
    equivalent. The explicit values list keeps the plan a single
    partial/final aggregate (no values-discovery pre-scan — at 100 TB
    an unlisted pivot costs an extra distinct pass); missing cells
    coalesce to 0 on both sides."""
    o = _lt(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("f_n"),
        F.coalesce(F.col("F_total"), F.lit(0.0)).alias("f_total"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("o_n"),
        F.coalesce(F.col("O_total"), F.lit(0.0)).alias("o_total"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("p_n"),
        F.coalesce(F.col("P_total"), F.lit(0.0)).alias("p_total"),
    )
