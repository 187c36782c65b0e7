"""As-of join (SURVEY.md §2.C C8): each left row matches the latest
right row with the same key and right_ts <= left_ts.

Scale-first design: the naive formulation (range join + row_number)
explodes to |left| × |matching rights| intermediate rows before the
window prunes them — quadratic per key. Instead we UNION the two
inputs on (key, time) and take `last(right_value, ignorenulls=True)`
over an ordered window: ONE shuffle on the key, linear intermediate
size, no join at all. This is the same trick DuckDB's ASOF JOIN and
kdb's aj use internally (sort-merge by key/time).

At 100 TB both sides shuffle once on `key`; the window sort is local
per key group. No broadcast needed, no skew beyond key skew (salt the
key upstream if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "inner",
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Join each left row to the nearest right row with the same key.

    Args:
        left/right: inputs sharing join key `key` (right key column must
            be named the same; rename upstream if not).
        left_ts/right_ts: event-time columns.
        value_cols: right columns carried to the output (suffixed as-is).
        how: 'inner' drops left rows with no match; 'left' keeps them
            with nulls.
        tiebreak: right column that breaks ties when several right rows
            share right_ts. backward: largest wins (matching
            `row_number() over (order by ts desc, tiebreak desc) = 1`);
            forward: smallest wins.
        direction: 'backward' (default) matches the LATEST right row with
            right_ts <= left_ts; 'forward' matches the EARLIEST right row
            with right_ts >= left_ts (pandas merge_asof directions).
            Both run the same union+window plan — forward just flips the
            frame to [current, +inf) with first() instead of last().

    Returns left columns + value_cols.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # The right row's payload travels as ONE struct. The struct itself is
    # non-null for every right row (even when every value inside it is
    # NULL), so `last(__rvals, ignorenulls=True)` finds the latest right
    # ROW — not the latest non-null VALUE. This keeps two cases correct
    # that per-column last() conflates:
    #   * a matched right row whose value is NULL yields NULL (not some
    #     older right row's stale value);
    #   * how='inner' keeps left rows whose matched value is NULL and
    #     drops only genuinely unmatched left rows.
    rvals_t = right.select(F.struct(*value_cols).alias("__rvals")).schema[
        "__rvals"
    ].dataType
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__lrow"),
        F.lit(None).cast(rvals_t).alias("__rvals"),
        F.lit(None).cast(
            right.schema[tiebreak].dataType if tiebreak else "long"
        ).alias("__tb"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        F.struct(*value_cols).alias("__rvals"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
    )
    if direction == "backward":
        # Right rows sort before left rows at equal timestamps
        # (__is_left asc) so an exactly-simultaneous right row is
        # visible to the left row (<=); last() takes the latest.
        w = (
            W.partitionBy("__k")
            .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__tb").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        fill = F.last("__rvals", ignorenulls=True).over(w)
    else:
        # Forward: the left row takes the EARLIEST right row at-or-after
        # it; at equal timestamps left sorts before right so a
        # simultaneous right row is matchable (>=). Implemented as the
        # REVERSE of the forward total order (__t asc, __is_left desc,
        # __tb asc) with a RUNNING frame + last(): last non-null over
        # the reversed prefix == first non-null over the forward
        # suffix. The naive form — first() over [currentRow,
        # unboundedFollowing] — is what you'd write first, but Spark's
        # UnboundedFollowingWindowFunctionFrame RECOMPUTES the
        # aggregate per row (O(rows²) per key partition): invisible on
        # fixture-sized keys, quadratic on a 100 TB hot key. Running
        # frames are incremental (O(rows)).
        w = (
            W.partitionBy("__k")
            .orderBy(F.col("__t").desc(), F.col("__is_left").asc(), F.col("__tb").desc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        fill = F.last("__rvals", ignorenulls=True).over(w)
    unioned = l_tagged.unionByName(r_tagged)
    filled = unioned.select(
        "__is_left",
        "__lrow",
        fill.alias("__rvals"),
    ).filter(F.col("__is_left") == 1)
    if how == "inner":
        filled = filled.filter(F.col("__rvals").isNotNull())
    return filled.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"__rvals.{c}").alias(c) for c in value_cols],
    )
