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
