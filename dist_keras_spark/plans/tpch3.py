"""Third TPC-H batch: the partsupp trio (Q2 / Q11 / Q20 shapes).

The fixtures ship no `partsupp` table (VERDICT r3-r5 "TPC-H residue"),
but every (part, supplier) relationship it encodes is recoverable from
`lineitem`: each shipped line names its l_partkey/l_suppkey pair. So
these shapes run over a PSEUDO-PARTSUPP derived honestly from lineitem

    ps_cost_cents := floor(min(l_extendedprice / l_quantity) · 100)
    ps_availqty   := sum(l_quantity)                     (stock proxy)

and are named `*_shape` because the stand-in columns change the
numbers, not the optimizer problem: Q2's correlated min-cost-per-group
join-back, Q11's group-total vs grand-total HAVING, and Q20's
aggregate-predicate semi-join are exactly the plans a real partsupp
would produce. The derivation itself is one groupBy shuffle on the
natural co-location key (partkey, suppkey) — at 100 TB it would be a
bucketed materialized table, here it is a CTE both engines share.

Cross-engine float discipline (STATUS.md gotchas): supply cost flows
as integer CENTS from the derivation on — floor() of a shared binary
double is engine-portable where round(x, 2) is not (see
_pseudo_partsupp), and Q11's HAVING threshold then compares exact
integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_PARTSUPP_CTE = """
partsupp AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           CAST(floor(min(l_extendedprice / l_quantity) * 100) AS BIGINT)
               AS ps_cost_cents,
           CAST(round(sum(l_quantity)) AS BIGINT) AS ps_availqty
    FROM lineitem GROUP BY 1, 2
)
"""


def _pseudo_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared derivation — mirror of _PARTSUPP_CTE. Quantities are
    small integers stored as doubles, so sum() is exact and round()
    only strips representation dust. Supply cost flows as INTEGER
    CENTS via floor(min * 100): floor acts on the identical binary
    double in both engines, where round(x, 2) does not — Spark rounds
    the shortest decimal rendering and DuckDB the binary value, so a
    unit price like 4382.105 rounds to 4382.11 in one and 4382.10 in
    the other (caught at sf0.01 during the Q11 build)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.floor(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 100
        ).cast("long").alias("ps_cost_cents"),
        F.round(F.sum("l_quantity")).cast("long").alias("ps_availqty"),
    )


_Q2_SQL = f"""
WITH {_PARTSUPP_CTE},
eu AS (
    SELECT ps_partkey, ps_cost_cents, s_acctbal, s_name, n_name
    FROM partsupp
    JOIN supplier ON s_suppkey  = ps_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
),
mc AS (SELECT ps_partkey, min(ps_cost_cents) AS min_cost FROM eu GROUP BY 1)
SELECT CAST(floor(e.s_acctbal * 100) AS BIGINT) AS acctbal_cents,
       e.s_name, e.n_name,
       p.p_partkey, e.ps_cost_cents AS supplycost_cents
FROM eu e
JOIN mc ON mc.ps_partkey = e.ps_partkey AND e.ps_cost_cents = mc.min_cost
JOIN part p ON p.p_partkey = e.ps_partkey
WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE'
ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@query("tpch_q2_shape_min_cost_supplier", oracle=_Q2_SQL)
def tpch_q2_shape_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each qualifying part, the EUROPE supplier(s)
    offering the minimum supply cost — the correlated-min join-back
    pattern (aggregate per group, equi-join the detail rows back on
    group + min). No window: the per-part min is a plain aggregate and
    the join back is on the part key, so at 100 TB both sides already
    share partitioning from the partsupp derivation. region/nation are
    the only broadcast dims; supplier scales and is left to AQE.
    LIMIT's ORDER BY carries a full tie-break chain so the selected
    prefix is deterministic across engines."""
    ps = _pseudo_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")
    eu = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_cost_cents", "s_acctbal", "s_name", "n_name")
    )
    mc = eu.groupBy("ps_partkey").agg(F.min("ps_cost_cents").alias("min_cost"))
    pq = p.filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    ).select("p_partkey")
    return (
        eu.join(mc, ["ps_partkey"])
        .filter(F.col("ps_cost_cents") == F.col("min_cost"))
        .join(pq, eu.ps_partkey == pq.p_partkey)
        .select(
            F.floor(F.col("s_acctbal") * 100).cast("long").alias("acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
            F.col("ps_cost_cents").alias("supplycost_cents"),
        )
        .orderBy(
            F.col("acctbal_cents").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


_Q11_SQL = f"""
WITH {_PARTSUPP_CTE},
de AS (
    SELECT ps_partkey, ps_cost_cents * ps_availqty AS v_cents
    FROM partsupp
    JOIN supplier ON s_suppkey = ps_suppkey
    WHERE s_nationkey = 8
)
SELECT ps_partkey, CAST(sum(v_cents) AS BIGINT) AS value_cents
FROM de
GROUP BY ps_partkey
HAVING sum(v_cents) >
       (SELECT sum(v_cents) * 2.0 / count(DISTINCT ps_partkey) FROM de)
"""


@query("tpch_q11_shape_important_stock", oracle=_Q11_SQL)
def tpch_q11_shape_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose stock value at nation-8 suppliers (a nationkey present at every fixture SF) exceeds
    TWICE the mean per-part value — a group aggregate compared against
    a grand-total-derived threshold. (TPC-H's own 0.0001/SF fraction
    makes the cut scale-dependent; the mean-relative form discriminates
    at every fixture SF — a fixed fraction returned 0 rows at sf0.1.)
    The threshold is ONE row cross-joined back (the
    share_of_total_broadcast pattern; a windowed sum over an
    unpartitioned frame would serialize at scale). Money flows as
    integer cents; the threshold itself is one exact-integer total
    scaled by 2/n_parts, identical arithmetic in both engines."""
    ps = _pseudo_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 8)
    de = ps.join(s, ps.ps_suppkey == s.s_suppkey).select(
        "ps_partkey",
        (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v_cents"),
    )
    per_part = de.groupBy("ps_partkey").agg(
        F.sum("v_cents").alias("value_cents")
    )
    total = de.agg(
        (
            F.sum("v_cents") * 2.0 / F.countDistinct("ps_partkey")
        ).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))  # 1-row total: sanctioned
        .filter(F.col("value_cents") > F.col("threshold"))
        .select("ps_partkey", "value_cents")
    )


_Q20_SQL = f"""
WITH {_PARTSUPP_CTE},
recent AS (
    SELECT l_partkey, l_suppkey,
           CAST(round(sum(l_quantity)) AS BIGINT) AS q_recent
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1999-01-01'
    GROUP BY 1, 2
),
excess AS (
    SELECT DISTINCT ps_suppkey
    FROM partsupp
    JOIN part   ON p_partkey = ps_partkey
    JOIN recent ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    WHERE p_name LIKE 'red %'
      AND ps_availqty > 2 * q_recent
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)
"""


@query("tpch_q20_shape_excess_stock", oracle=_Q20_SQL)
def tpch_q20_shape_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers holding excess stock of red parts — total
    stock more than twice what shipped since 1999 (shipdates span
    1995-2001, so the predicate genuinely splits the population). The
    defining plan feature is the aggregate-predicate SEMI-join: the
    excess set reduces to distinct supplier ids before touching
    supplier, so the big derived relations never widen the final join.
    r14 (guide §2.3/§2.4/§3.2): the partsupp derivation and `recent`
    were two SEPARATE full-lineitem aggregations — 2 scans + 2
    (partkey, suppkey) shuffles of the whole fact table (final-plan
    audit: lineitem×2, zero ReusedExchange; the copies differ in
    pushed filters). Both quantities now come out of ONE aggregate
    over lineitem pre-filtered to red parts by a broadcast semi-join
    (the Bloom/semi pre-filter shape, §3.2: only red-part rows reach
    the one remaining shuffle): ps_availqty = sum(qty), q_recent =
    sum(qty) over shipdate ≥ 1999 rows, and the original inner join's
    "group has recent rows" condition becomes q_recent IS NOT NULL.
    Equivalence: the red semi-join commutes with the (partkey,
    suppkey) groupBy because it filters on a grouping key (whole
    groups survive or drop — part is keyed on p_partkey), and the
    conditional sum adds exactly the rows the separate filtered
    aggregate added (small-integer quantities in doubles — exact at
    any fold order). Oracle hash-green at 3 SFs; A/B in
    OPTIMIZATION_r14.md."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    red = p.filter(F.col("p_name").like("red %")).select("p_partkey")
    fused = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(F.sum("l_quantity")).cast("long").alias("ps_availqty"),
            F.round(
                F.sum(
                    F.when(
                        F.col("l_shipdate") >= "1999-01-01",
                        F.col("l_quantity"),
                    )
                )
            )
            .cast("long")
            .alias("q_recent"),
        )
    )
    excess = (
        fused.filter(
            F.col("q_recent").isNotNull()
            & (F.col("ps_availqty") > 2 * F.col("q_recent"))
        )
        .select(F.col("l_suppkey").alias("ps_suppkey"))
        .distinct()
    )
    return (
        s.join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )
