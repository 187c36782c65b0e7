"""Count per-table parquet scans in each query's physical plan.

Duplicate-subtree detector for the r13 optimization round (guide
§2.4): a query whose plan scans the SAME parquet file 2+ times is
re-planning a shared subtree (ReuseExchange rarely dedupes — pushed
filters/projections usually differ between the references), which is
exactly the waste class fixed in share_of_total_broadcast / gini /
ppjoin this round.

Usage: python tools/scan_dup_audit.py [query ...]    (default: all)
Prints one line per query with >= min_dup scans of one file.
Queries whose construction itself fails are reported and skipped.
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dist_keras_spark.plans import QUERIES  # noqa: E402
from dist_keras_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    names = sys.argv[1:] or sorted(QUERIES)
    spark = get_spark("scan_dup_audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}\tERROR\t{type(exc).__name__}: {exc}"[:200], flush=True)
            continue
        files = collections.Counter(
            re.findall(r"/([a-z_0-9]+)\.parquet", plan)
        )
        dups = {t: n for t, n in files.items() if n >= 2}
        if dups:
            print(f"{name}\t{dups}", flush=True)


if __name__ == "__main__":
    main()
