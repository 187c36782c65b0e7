"""Relational core queries over the TPC-H-ish fixture star schema.

These exercise scans (SURVEY.md §2.A), filters/projections (§2.B),
joins (§2.C), aggregations (§2.D) and sorts (§2.F) as single Catalyst
plans. The reference engine had no relational surface at all — its
pipelines were single-table RDD maps — so every query here is ENG
surface per SURVEY.md §2.C/§2.D provenance.

Scale notes (100 TB posture):
  - Dimension sides (region/nation/customer/supplier/part) are
    broadcast explicitly; the fact-table side never shuffles for the
    join, only for the final aggregation on the (small) group keys.
  - Aggregates are expressed as built-in hash aggregates → Spark plans
    partial (map-side) + final aggregation automatically; no Python.
  - Float sums are rounded to 2dp *in the plan* only because the
    DuckDB-oracle hash comparison demands cross-engine bit equality
    (SURVEY.md §7.2); at scale you'd drop the round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship (M0): revenue by nation — scan → filter → 3 joins → agg → sort.
# ---------------------------------------------------------------------------

REVENUE_BY_NATION_ORACLE = """
SELECT
    n_name,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
    count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("revenue_by_nation", oracle=REVENUE_BY_NATION_ORACLE)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer ⋈ nation, filtered, grouped, sorted.

    Plan shape: the l_shipdate predicate pushes into the parquet scan;
    customer and nation join broadcast (small dims); the only shuffle
    is the final hash aggregation on n_name (25 groups).
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")

    return (
        lineitem.filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# ---------------------------------------------------------------------------
# Q1-style pricing summary: the canonical multi-aggregate hash agg.
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
SELECT
    l_returnflag,
    l_linestatus,
    round(sum(l_quantity), 2)                                      AS sum_qty,
    round(sum(l_extendedprice), 2)                                 AS sum_base_price,
    round(sum(l_extendedprice * (1 - l_discount)), 2)              AS sum_disc_price,
    round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
    round(avg(l_quantity), 4)                                      AS avg_qty,
    round(avg(l_extendedprice), 4)                                 AS avg_price,
    round(avg(l_discount), 4)                                      AS avg_disc,
    count(*)                                                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single scan, pushed filter, 8-way hash aggregate.

    Whole plan stays in whole-stage codegen; partial aggregation on the
    map side means the shuffle carries ~|groups|×|partitions| rows only.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
