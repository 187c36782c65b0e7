"""Same-session A/B timer for individual queries (r13 optimization).

Usage: python tools/ab_time.py <query> [query ...] [--runs N]

Times each query with the bench's exact methodology (warm at sf0.001,
one untimed full-size warm, then min-of-N noop-sink materializations)
and prints one JSON line per query. Used for before/after evidence on
a single query without paying for the whole 22-query suite.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, WARM_DIR, _materialize  # noqa: E402
from dist_keras_spark.plans import QUERIES  # noqa: E402
from dist_keras_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    runs = 5
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--runs":
            if i + 1 >= len(argv):
                raise SystemExit("--runs needs a count")
            runs = int(argv[i + 1])
            i += 1
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--"):
            # a malformed '--runs5' used to fall through and consume
            # the NEXT argv element as the count (ADVICE r13)
            raise SystemExit(f"unknown option: {a}")
        else:
            args.append(a)
        i += 1
    spark = get_spark("ab_time")
    for name in args:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"ab_time warm: {name}")
        _materialize(fn(spark, WARM_DIR))
        _materialize(fn(spark, SF_DIR))
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"ab_time run {i}: {name}")
            t0 = time.perf_counter()
            _materialize(fn(spark, SF_DIR))
            times.append(round(time.perf_counter() - t0, 3))
        times_sorted = sorted(times)
        print(
            json.dumps(
                {
                    "query": name,
                    "min": times_sorted[0],
                    "median": times_sorted[len(times_sorted) // 2],
                    "runs": times,
                    "loadavg": round(os.getloadavg()[0], 2),
                }
            )
        )


if __name__ == "__main__":
    main()
