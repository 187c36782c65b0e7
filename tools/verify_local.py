"""Local replica of the driver's t2 correctness gate.

Runs every `queries()` entry on Spark and, where an `oracle_sql()`
entry exists, the same SQL on DuckDB (fixture parquet registered as
views), then compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted,
values stringified with float rounding). Exit non-zero on mismatch.

Usage:  python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import datetime

import duckdb

sys.path.insert(0, "/root/repo")

from dist_keras_spark.session import get_spark  # noqa: E402
from dist_keras_spark.sources.tables import TABLE_NAMES  # noqa: E402


def _norm_cell(v: object) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: strict enough to catch decimal-rounding
        # cross-engine bugs (>=1e-7 relative, e.g. the price_1dp HALF_UP
        # mismatch the 6-sig-digit normalizer masked in r2) while still
        # tolerating float-sum associativity noise (~1e-15 relative) that
        # the driver's own hash demonstrably tolerates (double-sum
        # aggregates are driver-hash-green).
        return f"{v:.12g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.") + f"{v.microsecond // 1000:03d}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    norm_rows = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    return len(rows), sorted_cols, norm_rows


def main() -> int:
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

    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            print(f"✗ {name}: spark error: {e}")
            continue
        if name not in oracles:
            status = "rows-only"
            ok = True  # rows-only: ran without error
            print(f"◐ {name}: {len(srows)} rows ({status})")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: DUCKDB ERROR {type(e).__name__}: {e}")
            print(f"✗ {name}: duckdb error: {e}")
            continue

        sn, sc, sh = _fingerprint(scols, srows)
        dn, dc, dh = _fingerprint(dcols, drows)
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
