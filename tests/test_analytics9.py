"""Round-9 third-wave gates: every query rederives in pure Python —
winnowing fingerprint sets per the MOSS definition (plus the paper's
structural guarantee: a shared substring of length ≥ k+w-1 yields a
shared fingerprint) and the exact-rational KS statistic against a
pandas-computed D."""

from __future__ import annotations

import hashlib

import pandas as pd

from dist_keras_spark.plans.analytics9 import (
    _WIN_K,
    _WIN_MAX_DF,
    _WIN_W,
    ks_test_two_sample,
    winnowing_fingerprint_pairs,
)


def _kgram_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _winnow_fps(text: str) -> set[int]:
    npos = len(text) - (_WIN_K - 1)
    if npos < _WIN_W:
        return set()
    hs = [_kgram_hash(text[i : i + _WIN_K]) for i in range(npos)]
    return {
        min(hs[i : i + _WIN_W]) for i in range(npos - (_WIN_W - 1))
    }


def test_winnowing_pairs_rederive_in_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    fps = {
        int(r.doc_id): _winnow_fps(r.text)
        for r in docs.itertuples()
        if len(r.text) >= _WIN_K
    }
    df: dict[int, int] = {}
    for s in fps.values():
        for h in s:
            df[h] = df.get(h, 0) + 1
    keep = {d: {h for h in s if df[h] <= _WIN_MAX_DF} for d, s in fps.items()}
    ids = sorted(keep)
    pairs = {}
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            shared = len(keep[d1] & keep[d2])
            if shared:
                pairs[(d1, d2)] = shared
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = [
        ((r["d1"], r["d2"]), r["shared"])
        for r in winnowing_fingerprint_pairs(spark, sf_dir).collect()
    ]
    assert got == want


def test_winnowing_guarantee_on_planted_overlap(spark):
    # MOSS guarantee: any shared substring of length >= k + w - 1
    # produces at least one shared fingerprint.
    t = _WIN_K + _WIN_W - 1
    shared_run = "abcdefghijk"[:t]
    assert len(shared_run) == t
    a = "left-pad-xxxx" + shared_run + "AAAAAA"
    b = "ZZZZ" + shared_run + "other-tail-yyyy"
    assert _winnow_fps(a) & _winnow_fps(b)


def test_ks_statistic_rederives_in_pandas(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li[li["l_returnflag"].isin(["R", "A"])]
    r_counts = (
        li[li["l_returnflag"] == "R"]["l_quantity"].astype(int).value_counts()
    )
    a_counts = (
        li[li["l_returnflag"] == "A"]["l_quantity"].astype(int).value_counts()
    )
    support = sorted(set(r_counts.index) | set(a_counts.index))
    n1 = int(r_counts.sum())
    n2 = int(a_counts.sum())
    f_r = f_a = 0
    d_num = 0
    for v in support:
        f_r += int(r_counts.get(v, 0))
        f_a += int(a_counts.get(v, 0))
        d_num = max(d_num, abs(n2 * f_r - n1 * f_a))

    row = ks_test_two_sample(spark, sf_dir).collect()[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["d_num"] == d_num
    d_e6 = (1_000_000 * d_num) // (n1 * n2)
    assert row["d_e6"] == d_e6
    assert row["ks_scaled"] == d_e6 * d_e6 // (n1 + n2)
    assert row["crit_scaled"] == 1_844_164_000_000 // (n1 * n2)
    assert row["reject_05"] == int(
        d_e6 * d_e6 // (n1 + n2) > 1_844_164_000_000 // (n1 * n2)
    )
    # Same-population samples must not reject at this fixture size.
    assert row["reject_05"] == 0


def test_benford_audit_rederives_in_python(spark, sf_dir):
    import math

    from dist_keras_spark.plans.analytics9 import (
        _BENFORD_E6,
        benford_first_digit_audit,
    )

    # The baked literals ARE floor(1e6*log10(1+1/d)) — guard the table.
    assert _BENFORD_E6 == [
        math.floor(1_000_000 * math.log10(1 + 1 / d)) for d in range(1, 10)
    ]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    digits = (
        orders["o_totalprice"]
        .apply(lambda x: int(str(int(math.floor(x)))[0]))
        .value_counts()
        .to_dict()
    )
    n = len(orders)
    rows = benford_first_digit_audit(spark, sf_dir).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    for r in rows:
        n_d = digits.get(r["digit"], 0)
        assert r["n_d"] == n_d
        assert r["obs_e6"] == (1_000_000 * n_d) // n
        assert r["exp_e6"] == _BENFORD_E6[r["digit"] - 1]
        assert r["abs_dev_e6"] == abs(r["obs_e6"] - r["exp_e6"])


def _mk_ts(series: dict[int, int]):
    """Pure-Python Mann-Kendall + Theil-Sen on {period: value}."""
    ks = sorted(series)
    pairs = []
    for x in range(len(ks)):
        for y in range(x + 1, len(ks)):
            pairs.append((series[ks[y]] - series[ks[x]], ks[y] - ks[x]))
    s = sum((n > 0) - (n < 0) for n, _ in pairs)
    n = len(ks)
    from collections import Counter

    tie18 = sum(
        t * (t - 1) * (2 * t + 5)
        for t in Counter(series.values()).values()
        if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    trend = int(180000 * (abs(s) - 1) * (abs(s) - 1) > 38416 * var18)
    ordered = sorted(pairs, key=lambda p: (p[0] / p[1], p[0], p[1]))
    med = ordered[(len(ordered) + 1) // 2 - 1]
    return n, s, var18, trend, med


def test_mann_kendall_theilsen_rederives_in_python(spark, sf_dir):
    import math

    from dist_keras_spark.plans.analytics9 import trend_mann_kendall_theilsen

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    orders["mi"] = (orders["o_orderdate"].dt.year - 1992) * 12 + (
        orders["o_orderdate"].dt.month - 1
    )
    orders["cents"] = orders["o_totalprice"].apply(
        lambda x: int(math.floor(x * 100))
    )
    series = orders.groupby("mi")["cents"].sum().astype(int).to_dict()
    n, s, var18, trend, (mnum, mden) = _mk_ts(series)

    row = trend_mann_kendall_theilsen(spark, sf_dir).collect()[0]
    assert row["n_periods"] == n
    assert row["s_stat"] == s
    assert row["var18"] == var18
    assert row["trend_05"] == trend
    assert (row["med_slope_num"], row["med_slope_den"]) == (mnum, mden)
    # div truncates toward zero on both engines (measured r8) —
    # Python's // floors, so mirror trunc explicitly for any sign.
    q = abs(1_000_000 * mnum) // mden
    assert row["slope_e6"] == (q if mnum >= 0 else -q)


def test_mann_kendall_detects_planted_trend():
    # a strictly increasing series must reject the no-trend null:
    # S = n(n-1)/2, and the cross-multiplied verdict must fire.
    series = {i: 100 + 7 * i for i in range(24)}
    n, s, var18, trend, (mnum, mden) = _mk_ts(series)
    assert s == n * (n - 1) // 2
    assert trend == 1
    # every pairwise slope is exactly 7 cents/period
    assert mnum == 7 * mden


def _kw(groups: dict[str, list[int]]):
    """Pure-Python tie-corrected Kruskal-Wallis via doubled midranks."""
    from collections import Counter

    allc = Counter()
    for vs in groups.values():
        allc.update(vs)
    support = sorted(allc)
    d = {}
    cum = 0
    for v in support:
        t = allc[v]
        d[v] = 2 * cum + t + 1
        cum += t
    nn = sum(allc.values())
    tie3 = sum(t**3 - t for t in allc.values())
    h = (
        (12.0 / (nn * (nn + 1.0)))
        * sum(
            (sum(d[v] for v in vs) / 2.0) ** 2 / len(vs)
            for vs in groups.values()
        )
        - 3.0 * (nn + 1.0)
    ) / (1.0 - tie3 / (float(nn) * nn * nn - nn))
    return nn, tie3, h


def test_kruskal_wallis_rederives_in_python(spark, sf_dir):
    from dist_keras_spark.plans.analytics9 import kruskal_wallis_quantity

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    groups = {
        f: li.loc[li["l_returnflag"] == f, "l_quantity"].astype(int).tolist()
        for f in "ANR"
    }
    nn, tie3, h = _kw(groups)
    row = kruskal_wallis_quantity(spark, sf_dir).collect()[0]
    assert row["nn"] == nn
    assert row["tie3"] == tie3
    assert (row["n_a"], row["n_n"], row["n_r"]) == tuple(
        len(groups[f]) for f in "ANR"
    )
    assert abs(row["h_corr"] - h) < 1e-3
    assert row["reject_05"] == int(h > 5.991465)


def test_kruskal_wallis_detects_planted_shift():
    # one group shifted far right must reject at alpha = 0.05
    groups = {
        "A": list(range(1, 31)),
        "B": list(range(1, 31)),
        "C": list(range(100, 130)),
    }
    nn, tie3, h = _kw(groups)
    assert h > 5.991465


def test_hodges_lehmann_rederives_in_python(spark, sf_dir):
    from collections import Counter

    from dist_keras_spark.plans.analytics9 import hodges_lehmann_quantity

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    c = Counter(li.loc[li["l_returnflag"] == "R", "l_quantity"].astype(int))
    vals = sorted(c)
    items: dict[int, int] = {}
    for i, a in enumerate(vals):
        items[2 * a] = items.get(2 * a, 0) + c[a] * (c[a] + 1) // 2
        for b in vals[i + 1 :]:
            items[a + b] = items.get(a + b, 0) + c[a] * c[b]
    tot = sum(items.values())
    n = sum(c.values())
    assert tot == n * (n + 1) // 2  # Walsh-average count identity
    cum = 0
    hl2 = None
    for w2 in sorted(items):
        cum += items[w2]
        if 2 * cum >= tot + 1:
            hl2 = w2
            break

    row = hodges_lehmann_quantity(spark, sf_dir).collect()[0]
    assert row["n_walsh"] == tot
    assert row["hl2"] == hl2
