"""Execute queries (noop sink) and report FINAL-plan scan counts vs ReusedExchange.

The initial plan overcounts duplicate subtrees when AQE's runtime
ReuseExchange dedupes byte-identical exchanges (the r13 graph-family
finding).  This tool runs each query, then reads the post-execution
adaptive plan: per-table scan counts, ReusedExchange/ReusedSubquery
nodes, Exchange count, and wall seconds.

Usage: python tools/final_plan_audit.py query [query ...]
"""

from __future__ import annotations

import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dist_keras_spark.plans import QUERIES  # noqa: E402
from dist_keras_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("final_plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            t0 = time.monotonic()
            df = QUERIES[name](spark, SF_DIR)
            # Execute the DataFrame's OWN QueryExecution. A noop
            # write would run a *different* QueryExecution (the write
            # command wraps the plan), leaving df's adaptive plan
            # un-executed — its toString then shows the INITIAL plan,
            # where AQE's runtime ReusedExchange can never appear
            # (the r14 winnowing false positive: 'reused_exchange=0'
            # from this tool while the interleaved A/B showed the
            # subtrees were in fact runtime-deduped). collect() is
            # fine here: audited queries return top-k/aggregate-sized
            # results, and this is a measurement tool, not the bench.
            df.collect()
            wall = time.monotonic() - t0
            plan = df._jdf.queryExecution().executedPlan().toString()
            # An executed AdaptiveSparkPlan stringifies BOTH the
            # Final and the Initial plan — count nodes in the Final
            # section only, or every scan double-counts.
            plan = plan.split("== Initial Plan ==")[0]
        except Exception as exc:  # noqa: BLE001
            print(f"{name}\tERROR\t{type(exc).__name__}: {exc}"[:300], flush=True)
            continue
        files = collections.Counter(re.findall(r"/([a-z_0-9]+)\.parquet", plan))
        dups = {t: n for t, n in files.items() if n >= 2}
        reused_x = plan.count("ReusedExchange")
        reused_sq = plan.count("ReusedSubquery")
        exchanges = len(re.findall(r"\bExchange\b", plan))
        print(
            f"{name}\twall={wall:.2f}s\tdup_scans={dups}\t"
            f"reused_exchange={reused_x}\treused_subquery={reused_sq}\t"
            f"exchanges={exchanges}",
            flush=True,
        )


if __name__ == "__main__":
    main()
