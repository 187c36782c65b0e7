"""Advanced SQL surface (Spark 4): recursive CTEs and correlated
LATERAL subqueries — submitted as SQL TEXT shared verbatim with the
DuckDB oracle (the strongest parity check there is: same query string,
two engines, one hash).

Catalyst handles both without hand-planning: the LATERAL top-n
decorrelates into a ranked window join, and the recursive CTE executes
as an iterative union with AQE sizing each step — SURVEY.md §4.2's
"decorrelation is free" claim extended to the Spark-4 surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt, register_views

# Genuinely sequential state: bal_m = round(bal_{m-1}·1.01 + r_m, 2)
# — the per-step rounding pins floats bit-for-bit in both engines, and
# r_m derives from max() (order-insensitive, exact). A window can
# express geometric-weight sums (events_ewma_last) but not a
# recurrence with INTERIOR rounding; recursion is the honest tool.
_RECURSIVE_SQL = """
WITH RECURSIVE monthly AS (
    SELECT CAST(month(o_orderdate) AS INT) AS m,
           round(max(o_totalprice) / 1000, 2) AS r
    FROM orders WHERE year(o_orderdate) = 1995
    GROUP BY month(o_orderdate)
), bal(m, r, bal) AS (
    SELECT m, r, round(100.0 * 1.01 + r, 2) FROM monthly WHERE m = 1
    UNION ALL
    SELECT x.m, x.r, round(b.bal * 1.01 + x.r, 2)
    FROM bal b JOIN monthly x ON x.m = b.m + 1
)
SELECT m, r, bal FROM bal
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): a compounding balance
    rolled month-over-month through 1995 — state that must flow
    through the recurrence (interior rounding at every step), which no
    window rewrite expresses. The SAME SQL text runs on both engines.
    Scale: each iteration is one dim-sized join (12 months); the
    pattern generalizes to iterative graph/closure queries where the
    per-step frontier, not the corpus, bounds the work (the DataFrame
    twin is operators/dedup.neardup_clusters' min-label loop)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_RECURSIVE_SQL)


_LATERAL_SQL = """
SELECT c.c_mktsegment, l.o_orderkey, l.o_totalprice
FROM (SELECT DISTINCT c_mktsegment FROM customer) c,
LATERAL (
    SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o JOIN customer c2 ON o.o_custkey = c2.c_custkey
    WHERE c2.c_mktsegment = c.c_mktsegment
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 2
) l
"""


@query("sql_lateral_topn", oracle=_LATERAL_SQL)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — top-2 orders
    per market segment, written the way an analyst writes it (a
    per-row subquery) and executed the way an engine must (Catalyst
    decorrelates to a ranked join; DuckDB does the same) — never one
    subquery execution per outer row. Same SQL text on both engines."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


_PIPE_ORACLE = """
SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
"""

_PIPE_SQL = """
FROM orders
|> WHERE o_orderstatus = 'O'
|> AGGREGATE count(*) AS n, round(sum(o_totalprice), 2) AS total
   GROUP BY o_orderpriority
"""


@query("sql_pipe_syntax", oracle=_PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (`|>` operators, SQL:2023-adjacent):
    the same filter→aggregate expressed as a linear pipeline instead
    of inside-out SQL. Catalyst lowers it to the identical logical
    plan as the oracle's classic form — pushdown, partial aggregation
    and AQE all apply unchanged, so the surface is pure ergonomics
    with zero plan cost."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_PIPE_SQL)


_COLLATION_ORACLE = """
SELECT lower(o_orderpriority) AS pri_ci, count(*) AS n
FROM (SELECT CASE WHEN o_orderkey % 2 = 0
                  THEN upper(o_orderpriority)
                  ELSE lower(o_orderpriority) END AS o_orderpriority
      FROM orders)
GROUP BY 1
"""


@query("collation_case_insensitive", oracle=_COLLATION_ORACLE)
def collation_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: grouping under UTF8_LCASE treats 'URGENT'
    and 'urgent' as ONE key natively — no lower() wrapper column. The
    input is deliberately case-scrambled by orderkey parity; the
    oracle normalizes explicitly, Spark groups on the collated value.
    At scale collation-aware grouping keeps the ORIGINAL column for
    pushdown/stats instead of materializing a derived key (the
    lower()-column trick breaks min/max pruning on the source
    column). Output is re-lowered so both engines emit identical key
    strings."""
    from pyspark.sql import functions as F

    o = _lt(spark, sf_dir, "orders")
    scrambled = o.select(
        F.when(
            F.col("o_orderkey") % 2 == 0, F.upper("o_orderpriority")
        ).otherwise(F.lower("o_orderpriority")).alias("pri")
    )
    return (
        scrambled.groupBy(F.expr("collate(pri, 'UTF8_LCASE')").alias("pri_ci"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower(F.col("pri_ci").cast("string")).alias("pri_ci"), "n")
    )


# Modern SQL sugar shared verbatim by both engines: GROUP BY ALL groups
# on every non-aggregate select item, ORDER BY ALL orders by the whole
# select list left-to-right — the dbt-era idiom both Spark 4 and DuckDB
# adopted. Integer cents keep the sums hash-exact.
_GROUP_BY_ALL_SQL = """
SELECT l_returnflag,
       l_linestatus,
       count(*) AS n,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
FROM lineitem
GROUP BY ALL
ORDER BY ALL
"""


@query("sql_group_by_all", oracle=_GROUP_BY_ALL_SQL)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 GROUP BY ALL / ORDER BY ALL — same query text on both
    engines (strongest parity form). Lowering is identical to the
    explicit-keys query: one partial/final hash aggregate; ORDER BY
    ALL is a 4-row sort of the aggregate output."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_GROUP_BY_ALL_SQL)


@query(
    "sql_identifier_clause",
    oracle="""
SELECT event_type, count(*) AS n FROM events GROUP BY event_type
""",
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 IDENTIFIER() clause: table AND column names supplied as
    parameters without string-splicing SQL — the injection-safe way to
    template object names (a dbt/orchestrator staple). Lowering is
    identical to the literal query, which is what the oracle checks."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        "SELECT IDENTIFIER(:col) AS event_type, count(*) AS n "
        "FROM IDENTIFIER(:tab) GROUP BY IDENTIFIER(:col)",
        args={"col": "event_type", "tab": "events"},
    )
