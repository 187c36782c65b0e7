"""bench.py must COMPLETE — rc=0 and one parseable JSON line.

BENCH_r04 was a DNF: the events fixture drift crashed `join_asof`
during warm-up and the whole bench died before a single timing
(VERDICT r4 #2). This gate runs the real bench entrypoint as a
subprocess at sf0.001 so a crash in ANY warmed query fails the suite
long before the driver's per-round bench run can DNF again.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_bench_completes_and_emits_json():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    # keep the committed sf0.1 trace intact — the gate's tiny-SF trace
    # goes to a scratch file
    env["SPARK_GRAFT_TRACE"] = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "spark_graft_bench_gate_trace.json"
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        f"bench.py rc={proc.returncode}\nstderr tail:\n{proc.stderr[-3000:]}"
    )
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{") and ln.endswith("}")
    ]
    assert json_lines, f"no JSON line in bench stdout:\n{proc.stdout[-2000:]}"
    payload = json.loads(json_lines[-1])
    assert payload["unit"] == "sec"
    assert payload["value"] > 0
    assert payload["queries"], "bench emitted no per-query timings"
