"""Runnable tour of the round-6 analytics surface — ten queries a
warehouse/ML-platform user runs daily, each executed and printed with
a one-line result summary.

    python examples/analytics_tour.py [sf_dir]   # default /root/testdata/sf0.001

Every query shown here is oracle-backed (DuckDB differential hash,
tools/verify_local.py) and plan-audited (PLANS.md). This script exists
to be READ: each stop names the scale property that makes the query
safe at 100 TB.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dist_keras_spark.plans import QUERIES  # noqa: E402
from dist_keras_spark.session import get_spark  # noqa: E402

TOUR = [
    ("market_basket_lift", "association rules — order-keyed pair join, ≤300 groups at any SF"),
    ("rfm_segment_quantile", "RFM bands via broadcast exact percentiles — zero global sorts"),
    ("cdc_snapshot_diff", "CDC classify (insert/update/delete) — one co-keyed full-outer join"),
    ("scd2_from_events", "SCD2 history — gaps-and-islands on one user shuffle"),
    ("concurrent_intervals_peak", "peak concurrency — O(n log n) sweep line, no overlap join"),
    ("revenue_mom_growth", "MoM growth — window over the SF-invariant nation×month grid"),
    ("point_in_time_features", "leakage-safe training set — prior-window + as-of on one key"),
    ("kmeans_lloyd_two_iters", "k-means, 2 exact iterations — rational integer centroids"),
    ("pagerank_two_iters", "PageRank, 2 exact iterations — 1e12 fixed point"),
    ("streaming_watermark_late_drop_live", "real watermark late-drops — 3-batch staged stream"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("analytics_tour")
    for name, why in TOUR:
        df = QUERIES[name](spark, sf_dir)
        rows = df.collect()
        head = rows[0].asDict() if rows else {}
        print(f"{name:38s} {len(rows):>7d} rows  | {why}")
        print(f"{'':38s} e.g. {head}")
    spark.stop()


if __name__ == "__main__":
    main()
