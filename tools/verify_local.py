"""Local replica of the driver's t2 correctness gate.

Runs every `queries()` entry on Spark and, where an `oracle_sql()`
entry exists, the same SQL on DuckDB (fixture parquet registered as
views), then compares row count, column-name set, and an
order-insensitive value hash.

Driver-equivalence requirements (this gate masked driver-visible
failures in r2 AND r3 — see VERDICT r3 "What's wrong" #2):
  1. TYPE-SENSITIVE cells: the driver's hash distinguishes int 68424
     from float 68424.0 (the ceil/floor red row). Every normalized
     cell carries a type tag (i:/f:/s:/d:/b:/y:) so a cross-engine
     type split can never stringify identically here while differing
     at the driver.
  2. ARRAY/MAP CRASH PARITY: the driver canonicalizes through pandas
     `sort_values`, which raises `TypeError: unhashable type: 'list'`
     on raw array/map/struct cells (CORRECTNESS_r03: feature_reshape,
     multimodal_fake_decode, multimodal_frame_sample). We run the same
     pandas canon on BOTH result sets — including rows-only queries,
     which the driver also canonicalizes before counting — so a
     non-hashable result column fails HERE first.

Usage:  python tools/verify_local.py [sf_dir] [query ...]
        python tools/verify_local.py --window-plan [N]

`--window-plan` (VERDICT r6 #6) makes the per-round driver-window
rotation mechanical: it reads every CORRECTNESS_r*.json in the repo
root, orders oracle-backed queries never-driver-checked first (in
registration order) then oldest-checked-round first, and prints a
ready-to-paste `registry.promote(...)` block of N entries (default
50, the driver's window size). oracle=None queries are excluded — the
driver errors on them.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import pathlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from dist_keras_spark.session import get_spark  # noqa: E402
from dist_keras_spark.sources.tables import TABLE_NAMES  # noqa: E402


def _norm_cell(v: object) -> str:
    """Type-tagged canonical cell string. int and float NEVER collide
    (driver hash is type-sensitive); floats keep 12 significant digits
    — strict enough for decimal-rounding bugs (>=1e-7 relative),
    tolerant of fold-order noise (~1e-15) the driver demonstrably
    accepts on double-sum aggregates."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v:.12g}"
    if isinstance(v, dt.datetime):
        return "d:" + v.strftime("%Y-%m-%d %H:%M:%S.") + f"{v.microsecond // 1000:03d}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"y:{bytes(v).hex()}"
    if isinstance(v, decimal.Decimal):
        # own tag: DuckDB returns Decimal for DECIMAL columns (TPC-H
        # aggregates); without this a DECIMAL-vs-VARCHAR split would
        # stringify identically under the generic s: fallback.
        return f"n:{v.normalize()}"
    if isinstance(v, (list, tuple, dict, set)):
        # the driver canon crashes on these; reaching here means the
        # pandas canon below failed to reproduce that — hard error.
        raise TypeError(f"raw container cell reached _norm_cell: {type(v).__name__}")
    return f"s:{v}"


def _driver_canon(cols: list[str], rows: list[tuple]) -> None:
    """Replicate the driver's pandas canonicalization closely enough to
    crash where it crashes: DataFrame → columns sorted by name →
    sort_values over every column. Raw list/dict cells raise
    `TypeError: unhashable type` when sort_values hits the
    lexsort/factorize path — which pandas only takes with >=2 sort
    columns (a single column argsorts by comparison and does NOT
    raise), so we append a synthetic constant column to force the
    multi-column path regardless of the result's column count."""
    pdf = pd.DataFrame(rows, columns=cols)
    pdf = pdf[sorted(cols)]
    pdf["__canon_pad__"] = 0
    pdf.sort_values(by=list(pdf.columns), inplace=False)


def _fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    norm_rows = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    return len(rows), sorted_cols, norm_rows


def window_plan(n_slots: int = 50) -> int:
    """Emit the next round's `registry.promote(...)` block.

    Ordering: (1) oracle-backed queries with NO row in any
    CORRECTNESS_r*.json, in current registration order; (2) re-checks,
    oldest driver-checked round first (ties by registration order).
    The driver checks the first `n_slots` registered queries, so the
    block is exactly that long.
    """
    import json
    import re

    import __spark_entry__ as entrymod

    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    root = pathlib.Path(__file__).resolve().parents[1]
    last_round: dict[str, int] = {}
    rounds = sorted(
        root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    for p in rounds:
        rnum = int(re.search(r"r(\d+)", p.name).group(1))
        for name in json.loads(p.read_text()):
            last_round[name] = rnum
    backed = [q for q in qs if q in oracles]
    never = [q for q in backed if q not in last_round]
    rechecks = sorted(
        (q for q in backed if q in last_round),
        key=lambda q: (last_round[q], backed.index(q)),
    )
    plan = (never + rechecks)[:n_slots]
    print(f"# window plan: {len(never)} never-checked, "
          f"{len(plan) - min(len(never), n_slots)} re-checks "
          f"(oldest round first), {len(backed)} oracle-backed total")
    print("registry.promote(")
    for q in plan:
        tag = "never checked" if q not in last_round else f"last r{last_round[q]}"
        print(f'    "{q}",  # {tag}')
    print(")")
    overflow = (never + rechecks)[n_slots:]
    never_overflow = [q for q in overflow if q not in last_round]
    if never_overflow:
        print(f"# OVERFLOW — {len(never_overflow)} never-checked did not fit; "
              "first in line next round:")
        for q in never_overflow:
            print(f"#   {q}")
    # Rotation horizon (VERDICT r7 #7): with a fixed driver window the
    # re-check debt grows with the registry; keep it visible each round.
    horizon = math.ceil(len(backed) / n_slots)
    oldest = min(last_round.values(), default=None) if last_round else None
    print(
        f"# rotation horizon: {len(backed)} oracle-backed / {n_slots} "
        f"slots = {horizon} rounds to re-check every query once"
        + (f"; oldest standing driver signal: r{oldest}" if oldest else "")
    )
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--window-plan":
        return window_plan(int(sys.argv[2]) if len(sys.argv) > 2 else 50)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # Unmatched name filters fail LOUDLY (VERDICT r11 #6): a typo'd
    # query name used to verify zero queries and exit 0 — a green gate
    # that checked nothing.
    unknown = sorted(only - set(qs))
    if unknown:
        print(f"UNKNOWN QUERY FILTER(S): {unknown}")
        print("  (no such names in the registry — nothing was verified)")
        return 2

    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            _driver_canon(scols, srows)  # crash parity: raw array/map cols die here
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: SPARK/CANON ERROR {type(e).__name__}: {e}")
            print(f"✗ {name}: spark/canon error: {e}")
            continue
        if name not in oracles:
            print(f"◐ {name}: {len(srows)} rows (rows-only, canon ok)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            _driver_canon(dcols, drows)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: DUCKDB/CANON ERROR {type(e).__name__}: {e}")
            print(f"✗ {name}: duckdb/canon error: {e}")
            continue

        try:
            sn, sc, sh = _fingerprint(scols, srows)
            dn, dc, dh = _fingerprint(dcols, drows)
        except Exception as e:  # noqa: BLE001 — one bad query must not mask the rest
            failures.append(f"{name}: FINGERPRINT ERROR {type(e).__name__}: {e}")
            print(f"✗ {name}: fingerprint error: {e}")
            continue
        ok = True
        if sn != dn:
            ok = False
            failures.append(f"{name}: row count {sn} vs oracle {dn}")
        if sc != dc:
            ok = False
            failures.append(f"{name}: columns {sc} vs oracle {dc}")
        if ok and sh != dh:
            ok = False
            diff = [(a, b) for a, b in zip(sh, dh) if a != b][:3]
            failures.append(f"{name}: value mismatch, first diffs: {diff}")
        print(("✓" if ok else "✗") + f" {name}: {sn} rows")

    print()
    if failures:
        print(f"{len(failures)} FAILURE(S):")
        for f in failures:
            print("  -", f)
        return 1
    print("all declared queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
