"""A/B the blocking-certification cost curve (VERDICT r9 #3).

`blocking_quality_sampled` exists ONLY because certifying a banding
scheme on a deterministic stratum is supposed to be cheaper than the
full-corpus certification, quadratically in the sample rate (both the
candidate join and the exact-truth join see pct² of the pair space).
The one previously committed measurement was taken at loadavg ~10 and
showed the opposite (sampled 6.05s vs full 3.81s). This tool measures
the claim properly on a quiet machine: full (100%) vs the registered
50% stratum vs a 10% stratum point, min-of-N each after warm-up, with
the CPU-steal mix over the exact window, and merges the result into
bench_extended_trace.json under "blocking_ab" so the docstring's
"measured" claim points at committed evidence.

Usage: python tools/bench_blocking_ab.py  [reads $SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dist_keras_spark.plans.analytics6 import _blocking_quality_frame  # noqa: E402
from dist_keras_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
RUNS = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "5"))

POINTS = [("full_100pct", None), ("sampled_50pct", 50), ("sampled_10pct", 10)]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from bench import _cpu_mix, _cpu_sample  # repo root is on sys.path

    spark = get_spark("bench_blocking_ab")
    cpu0 = _cpu_sample()
    runs: dict[str, list[float]] = {label: [] for label, _ in POINTS}
    rows: dict[str, dict] = {}
    for label, pct in POINTS:  # warm: codegen + full-size plan, untimed
        _materialize(_blocking_quality_frame(spark, WARM_DIR, sample_pct=pct))
        _materialize(_blocking_quality_frame(spark, SF_DIR, sample_pct=pct))
        # the metric VALUES at each point, so the trace also shows the
        # completeness/reduction estimates staying stable as cost falls
        rows[label] = (
            _blocking_quality_frame(spark, SF_DIR, sample_pct=pct).collect()[0].asDict()
        )
    # Points are INTERLEAVED across passes so a co-tenant steal burst
    # (this box shows 3-6% bursts; see bench.py's steal gate) cannot
    # systematically hit one point: per-point min over all passes is
    # then comparable across points. Early-stop once a whole pass's
    # window measured <1% steal.
    passes = []
    for _ in range(max(RUNS, 2)):
        p0 = _cpu_sample()
        for label, pct in POINTS:
            for _ in range(2):
                t0 = time.perf_counter()
                _materialize(_blocking_quality_frame(spark, SF_DIR, sample_pct=pct))
                runs[label].append(round(time.perf_counter() - t0, 3))
        mix = _cpu_mix(p0, _cpu_sample())
        passes.append(mix)
        if mix["cpu_steal_pct"] < 1.0:
            break
    out = {
        label: {"min_sec": min(r), "runs": r, **rows[label]}
        for label, r in runs.items()
    }
    load1, load5, load15 = os.getloadavg()
    result = {
        "sf_dir": SF_DIR,
        "loadavg": [round(load1, 2), round(load5, 2), round(load15, 2)],
        **_cpu_mix(cpu0, _cpu_sample()),
        "passes": passes,
        "points": out,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_extended_trace.json",
    )
    with open(path) as fh:
        trace = json.load(fh)
    trace["blocking_ab"] = result
    with open(path, "w") as fh:
        json.dump(trace, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
