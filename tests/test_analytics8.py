"""Round-9 second-wave gates: semantic properties beyond the oracle
hash — the in-query Bloom filter admits EVERY member (zero false
negatives, the structural guarantee an FPR number can't show) and its
measured FPR rederives from a pure-Python filter; the KMV union/
intersection estimates rederive from Python-built sketches and the
union estimate respects the 5σ bound; link-prediction candidates are
provably non-edges at distance 2 with common-neighbor counts matching
a Python set-intersection rederivation."""

from __future__ import annotations

import hashlib

import pandas as pd

from dist_keras_spark.plans.analytics8 import (
    _BLOOM_K,
    _BLOOM_M,
    _KMV_K,
    _KMV_SPACE,
    bloom_fpr_certified,
    kmv_union_intersect_certified,
    link_prediction_common_neighbors,
)


def _bloom_buckets(key: int) -> set[int]:
    return {
        int(hashlib.md5(f"{key}:b{i}".encode()).hexdigest()[:8], 16) % _BLOOM_M
        for i in range(_BLOOM_K)
    }


def test_bloom_no_false_negatives_and_fpr_rederives(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    customer = pd.read_parquet(f"{sf_dir}/customer.parquet")
    members = set(
        orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_custkey"].astype(int)
    )
    bits: set[int] = set()
    for m in members:
        bits |= _bloom_buckets(m)
    # Structural guarantee: every member's buckets are all set.
    for m in members:
        assert _bloom_buckets(m) <= bits
    probes = set(customer["c_custkey"].astype(int)) - members
    fp = sum(1 for x in probes if _bloom_buckets(x) <= bits)

    r = bloom_fpr_certified(spark, sf_dir).collect()[0]
    assert r["n_members"] == len(members)
    assert r["n_probes"] == len(probes)
    assert r["bits_set"] == len(bits)
    assert r["false_pos"] == fp
    assert r["fpr_e6"] == (1_000_000 * fp) // len(probes)
    assert r["theo_fpr_e6"] == (1_000_000 * len(bits) ** 3) // _BLOOM_M**3


def _kuv_hash(key: int) -> int:
    return int(hashlib.md5(f"{key}:kuv".encode()).hexdigest()[:12], 16)


def test_kmv_setops_rederive_in_python(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    a = set(orders.loc[orders["o_orderstatus"] == "O", "o_custkey"].astype(int))
    b = set(orders.loc[orders["o_orderstatus"] == "F", "o_custkey"].astype(int))
    ska = set(sorted({_kuv_hash(x) for x in a})[:_KMV_K])
    skb = set(sorted({_kuv_hash(x) for x in b})[:_KMV_K])
    sku = sorted(ska | skb)[:_KMV_K]
    k_used = len(sku)
    matches = sum(1 for h in sku if h in ska and h in skb)
    if k_used < _KMV_K:
        est_union = len(a | b)
    else:
        est_union = ((k_used - 1) * _KMV_SPACE) // max(sku)

    r = kmv_union_intersect_certified(spark, sf_dir).collect()[0]
    assert r["exact_union"] == len(a | b)
    assert r["exact_inter"] == len(a & b)
    assert r["k_used"] == k_used
    assert r["matches"] == matches
    assert r["est_union"] == est_union
    assert r["est_inter"] == (matches * est_union) // k_used
    # 5σ certification (σ ≈ NDV/√k), deterministic so a hard gate.
    if k_used == _KMV_K:
        assert abs(r["est_union"] - r["exact_union"]) <= 5 * r["exact_union"] // 8


def test_link_prediction_candidates_are_nonedges_with_exact_cn(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    pt = pd.read_parquet(f"{sf_dir}/part.parquet")
    bk = (
        li.merge(pt, left_on="l_partkey", right_on="p_partkey")[
            ["l_orderkey", "p_brand"]
        ]
        .drop_duplicates()
    )
    grouped = bk.groupby("l_orderkey")["p_brand"].apply(sorted)
    from collections import Counter, defaultdict

    n_ab: Counter = Counter()
    for brands in grouped:
        for i in range(len(brands)):
            for j in range(i + 1, len(brands)):
                n_ab[(brands[i], brands[j])] += 1
    n_pairs, sum_ab = len(n_ab), sum(n_ab.values())
    nbrs: defaultdict = defaultdict(set)
    for (x, y), c in n_ab.items():
        if n_pairs * c >= sum_ab:
            nbrs[x].add(y)
            nbrs[y].add(x)

    rows = link_prediction_common_neighbors(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["y"] not in nbrs[r["x"]], "candidate must be a non-edge"
        cn = len(nbrs[r["x"]] & nbrs[r["y"]])
        assert cn == r["cn"] > 0
        assert r["pref_attach"] == len(nbrs[r["x"]]) * len(nbrs[r["y"]])
