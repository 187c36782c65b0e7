"""Round-11 scale-safe twins for the three ops the sf1→sf2 sweep
measured quadratic (neardup_cluster_assign 2.36, dedup_embedding_cosine
2.21, knn_ivf_persisted_top5 1.95): each twin must (a) equal its exact
/ pinned-parameter baseline at fixture sizes where the schedule clamps,
and (b) have its growth schedule and fixed-layout plane machinery
pinned by direct unit checks — the exponents themselves are measured in
bench_extended_trace "scaling_sf1_sf2"."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import functions as F

from dist_keras_spark.plans.extras import (
    _SCALED_MAXP,
    _scaled_plane_count,
    dedup_embedding_cosine,
    dedup_embedding_scaled_planes,
)
from dist_keras_spark.plans.llm import (
    knn_ivf_scaled_top5,
    knn_ivf_top5,
    neardup_cluster_lsh,
)


def _rows(fn, spark, sf_dir):
    return [r.asDict() for r in fn(spark, sf_dir).collect()]


# ------------------------------------------------------------------ #
# neardup_cluster_lsh: pure-Python union-find over exact Jaccard ≥ 0.8
# ------------------------------------------------------------------ #


def _py_clusters(docs: pd.DataFrame, tau: float = 0.8) -> dict:
    shingles = {}
    for r in docs.itertuples():
        t = r.text.split(" ")
        shingles[r.doc_id] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        }
    post = defaultdict(list)
    for d, s in shingles.items():
        for sh in s:
            post[sh].append(d)
    cand = set()
    for ds in post.values():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                cand.add((a, b))
    parent = {d: d for d in shingles}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in cand:
        sa, sb = shingles[a], shingles[b]
        inter = len(sa & sb)
        if inter / (len(sa) + len(sb) - inter) >= tau:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d in shingles}


def test_neardup_cluster_lsh_matches_union_find(spark):
    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    want = _py_clusters(docs)
    got = {r["doc_id"]: r["cluster_id"] for r in _rows(neardup_cluster_lsh, spark, sf)}
    assert got == want
    # the fixture HAS non-trivial clusters at tau=0.8
    assert any(v != k for k, v in got.items())


# ------------------------------------------------------------------ #
# dedup_embedding_scaled_planes
# ------------------------------------------------------------------ #


def test_scaled_plane_schedule():
    # clamp region: everything the fixtures can produce stays at k=8
    assert _scaled_plane_count(1) == 8
    assert _scaled_plane_count(16384) == 8
    # growth: one bit per doubling past 64·2^8
    assert _scaled_plane_count(16385) == 9
    assert _scaled_plane_count(20000) == 9
    assert _scaled_plane_count(40000) == 10
    assert _scaled_plane_count(64 * (1 << 20)) == _SCALED_MAXP
    # documented ceiling clamps instead of raising
    assert _scaled_plane_count(10**12) == _SCALED_MAXP


def test_layout_planes_prefix_stability():
    """Growing k under the fixed layout must keep every already-used
    plane: table t's first 9 planes at k=9 == its 8 planes at k=8 + 1."""
    import numpy as np

    from dist_keras_spark.operators.similarity import _hyperplanes

    full = _hyperplanes(64, 16 * _SCALED_MAXP, 42)

    def used(k):
        return [
            full[t * _SCALED_MAXP : t * _SCALED_MAXP + k] for t in range(16)
        ]

    u8, u9 = used(8), used(9)
    for t in range(16):
        assert np.array_equal(u9[t][:8], u8[t])
        assert u9[t].shape == (9, 64)


def test_scaled_planes_equals_baseline_at_fixture(spark):
    """At sf0.01 (500 vectors) the schedule clamps to k=8; the twin
    runs different PLANES (fixed 16×20 layout vs the baseline's 16×8
    matrix) but must keep the same survivors — planted dups sit at
    cos ≥ 0.98 where either band scheme's miss probability is ≤ 1e-6,
    and precision is exact (cosine verify) for both."""
    sf = "/root/testdata/sf0.01"
    base = {r["vec_id"] for r in _rows(dedup_embedding_cosine, spark, sf)}
    twin = {r["vec_id"] for r in _rows(dedup_embedding_scaled_planes, spark, sf)}
    assert twin == base


def test_layout_planes_validation(spark):
    import pytest

    from dist_keras_spark.operators.similarity import embedding_neardup_pairs

    df = spark.createDataFrame(
        [(0, [1.0] * 4)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="layout_planes"):
        embedding_neardup_pairs(
            df, dim=4, n_planes=8, layout_planes=4
        )


# ------------------------------------------------------------------ #
# knn_ivf_scaled_top5
# ------------------------------------------------------------------ #


def test_cluster_cap_lsh_rederives(spark):
    """The keep-≤2 epilogue over the LSH clusters must equal the pure
    Python rederivation: same union-find clusters (τ=0.8), ranked by
    n_chars DESC then doc_id, capped at 2."""
    from dist_keras_spark.plans.analytics7 import cluster_cap_sample_lsh

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    clusters = _py_clusters(docs)
    by_cluster = defaultdict(list)
    nchars = dict(zip(docs.doc_id, docs.n_chars))
    for d, c in clusters.items():
        by_cluster[c].append(d)
    want = {}
    for c, ds in by_cluster.items():
        ds.sort(key=lambda d: (-nchars[d], d))
        for rank, d in enumerate(ds[:2], start=1):
            want[d] = (c, rank)
    got = {
        r["doc_id"]: (r["cluster_id"], r["rank_in_cluster"])
        for r in _rows(cluster_cap_sample_lsh, spark, sf)
    }
    assert got == want
    # the cap BIT on the fixture (some cluster had > 2 members)
    assert len(got) < len(clusters)


def test_leakage_split_lsh_cluster_atomicity(spark):
    """Every doc of an LSH cluster lands in the same split, and all
    three splits are populated."""
    from dist_keras_spark.plans.analytics6 import leakage_safe_split_lsh

    sf = "/root/testdata/sf0.01"
    rows = _rows(leakage_safe_split_lsh, spark, sf)
    split_of_cluster = {}
    for r in rows:
        prev = split_of_cluster.setdefault(r["cluster_id"], r["split"])
        assert prev == r["split"]
    assert {r["split"] for r in rows} == {"train", "val", "test"}


def test_fellegi_snm_rederives(spark):
    """Sorted-neighborhood ER: pure-Python rederivation of the score
    histogram — sort within noun by (adj, price_bin, partkey), pair
    each record with its next w neighbors, sum the FS weights."""
    import math

    from dist_keras_spark.plans.analytics10 import (
        _FS_W,
        _SNM_W,
        fellegi_sunter_sorted_neighborhood,
    )

    sf = "/root/testdata/sf0.001"
    part = pd.read_parquet(f"{sf}/part.parquet")
    rows = []
    for r in part.itertuples():
        name = r.p_name.split(" ")
        rows.append(
            (
                r.p_partkey,
                r.p_type,
                name[0],
                name[1],
                int(math.floor(r.p_retailprice / 100)),
            )
        )
    by_noun = defaultdict(list)
    for pk, typ, adj, noun, pb in rows:
        by_noun[noun].append((adj, pb, pk, typ))
    want: dict = defaultdict(int)
    for noun, rs in by_noun.items():
        rs.sort()
        for i, a in enumerate(rs):
            for j in range(1, _SNM_W + 1):
                if i + j >= len(rs):
                    break
                b = rs[i + j]
                s = (
                    (_FS_W["type"][0] if a[3] == b[3] else _FS_W["type"][1])
                    + (_FS_W["adj"][0] if a[0] == b[0] else _FS_W["adj"][1])
                    + _FS_W["noun"][0]  # same noun by construction
                    + (_FS_W["price"][0] if a[1] == b[1] else _FS_W["price"][1])
                )
                want[s] += 1
    got = {
        r["score_milli"]: r["n_pairs"]
        for r in _rows(fellegi_sunter_sorted_neighborhood, spark, sf)
    }
    assert got == dict(want)
    # linear-by-construction pair count: exactly sum over groups of
    # sum_j max(0, n-j)
    n_pairs = sum(got.values())
    expect = sum(
        sum(max(0, len(rs) - j) for j in range(1, _SNM_W + 1))
        for rs in by_noun.values()
    )
    assert n_pairs == expect


def test_ranking_scaled_equals_pinned_ranking_metrics(spark):
    """At fixture sizes the scaled IVF clamps to the pinned 16-cell
    quantizer, so the scaled metric rows must equal the shared metric
    epilogue applied to knn_ivf_top5 — and obey rr/dcg invariants."""
    from dist_keras_spark.plans.analytics6 import (
        _ranking_metrics,
        ranking_mrr_ndcg_scaled,
    )
    from dist_keras_spark.plans.llm import knn_ivf_top5

    sf = "/root/testdata/sf0.01"
    got = {r["query_id"]: r for r in _rows(ranking_mrr_ndcg_scaled, spark, sf)}
    base = knn_ivf_top5(spark, sf)
    lab = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "label")
    )
    want = {
        r["query_id"]: r.asDict()
        for r in _ranking_metrics(base, lab).collect()
    }
    assert got == want
    for r in got.values():
        assert r["dcg_e9"] <= r["idcg_e9"]
        assert r["rr_e9"] == 0 or 200_000_000 <= r["rr_e9"] <= 1_000_000_000


def test_hard_negative_scaled_labels_differ(spark):
    from dist_keras_spark.plans.analytics6 import hard_negative_mining_scaled

    sf = "/root/testdata/sf0.01"
    rows = _rows(hard_negative_mining_scaled, spark, sf)
    assert len(rows) > 0
    assert all(r["query_label"] != r["negative_label"] for r in rows)
    assert all(1 <= r["knn_rank"] <= 5 for r in rows)


def test_quantile_normalize_distributed_identical_output(spark):
    """The distributed-rank twin must reproduce the baseline
    ROW-FOR-ROW at every fixture — same oracle, same output; only the
    rank computation differs (value-histogram prefix vs global sort)."""
    from dist_keras_spark.plans.analytics10 import (
        quantile_normalize_acctbal,
        quantile_normalize_distributed,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        base = {
            r["c_mktsegment"]: r
            for r in _rows(quantile_normalize_acctbal, spark, sf)
        }
        twin = {
            r["c_mktsegment"]: r
            for r in _rows(quantile_normalize_distributed, spark, sf)
        }
        assert twin == base and len(twin) > 0


def test_conformal_128bit_determinant_no_overflow(spark):
    """The r11 sweep crashed the int64 determinant at 12M rows
    (ARITHMETIC_OVERFLOW). The 128-bit form must survive inputs where
    n·Σxy exceeds int64: amplify y so count·sum(x·y) > 9.2e18 on a
    small frame and assert the slope still computes exactly."""
    import pandas as pd

    n = 4000
    df = pd.DataFrame(
        {
            "l_quantity": [float(1 + i % 50) for i in range(n)],
            "l_extendedprice": [
                1e11 + 2.0e11 * (1 + i % 50) for i in range(n)
            ],
            "l_orderkey": list(range(n)),
            "l_linenumber": [1] * n,
        }
    )
    sdf = spark.createDataFrame(df)
    # replicate the fit stage's widened arithmetic on the raw frame
    d = sdf.selectExpr(
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(floor(l_extendedprice / 100) AS BIGINT) AS y",
    )
    fit = d.selectExpr(
        "CAST((CAST(count(*) AS DECIMAL(38,0)) * sum(x * y)"
        " - CAST(sum(x) AS DECIMAL(38,0)) * sum(y)) * 1000000"
        " div (CAST(count(*) AS DECIMAL(38,0)) * sum(x * x)"
        " - CAST(sum(x) AS DECIMAL(38,0)) * sum(x)) AS BIGINT)"
        " AS slope_micro"
    )
    row = fit.collect()[0]
    xs = [1 + i % 50 for i in range(n)]
    ys = [int((1e11 + 2.0e11 * (1 + i % 50)) // 100) for i in range(n)]
    sxy = sum(a * b for a, b in zip(xs, ys))
    num = n * sxy - sum(xs) * sum(ys)
    den = n * sum(a * a for a in xs) - sum(xs) ** 2
    assert n * sxy > 2**63  # the un-widened int64 form would overflow
    assert num > 0
    assert row["slope_micro"] == (num * 1_000_000) // den


def test_knn_ivf_scaled_equals_pinned_at_fixture(spark):
    """At fixture sizes max(16, N div 1000) clamps to 16, so the twin
    must reproduce knn_ivf_top5 row-for-row (same quantizer sample,
    same probes, same re-rank)."""
    sf = "/root/testdata/sf0.01"
    key = lambda r: (r["query_id"], r["knn_rank"])
    base = {key(r): r["neighbor_id"] for r in _rows(knn_ivf_top5, spark, sf)}
    twin = {key(r): r["neighbor_id"] for r in _rows(knn_ivf_scaled_top5, spark, sf)}
    assert twin == base
    assert len(twin) > 0


# ------------------------------------------------------------------ #
# ivf_pq_scaled_top5 / re-pointed rrf_fusion_scaled_top5 (r12)
# ------------------------------------------------------------------ #


def test_ivf_pq_scaled_candidates_and_adc(spark):
    """The r12 PQ-family twin: (a) every output pair must be a
    candidate of the clamped IVF schedule (16 cells, probe 8 — the
    exact knn_ivf candidate set at fixture N), and (b) its adist must
    equal the FULL-corpus ADC distance for that pair — cell pruning
    may drop candidates but must never change a surviving pair's
    integer score."""
    from dist_keras_spark.operators.similarity import knn_ivf
    from dist_keras_spark.plans.analytics5 import (
        _pq_codes_qtab,
        _quant,
        ivf_pq_scaled_top5,
    )
    from dist_keras_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = {
        (r["query_id"], r["neighbor_id"]): (r["ivfpq_rank"], r["adist"])
        for r in _rows(ivf_pq_scaled_top5, spark, sf)
    }
    assert out and all(1 <= v[0] <= 5 for v in out.values())
    emb = load_table(spark, sf, "embeddings")
    allc = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(
            emb,
            emb.filter(F.col("vec_id") % 20 == 0),
            k=10**9,
            n_cells=16,
            n_probe=8,
            seed=42,
        ).collect()
    }
    assert set(out) <= allc
    codes, qtab = _pq_codes_qtab(emb.select("vec_id", _quant().alias("v")))
    full = {
        (r["tq"], r["code_vec"]): r["adist"]
        for r in (
            codes.join(
                qtab,
                (F.col("code_s") == F.col("qs"))
                & (F.col("code") == F.col("qc")),
            )
            .filter(F.col("code_vec") != F.col("tq"))
            .groupBy("tq", "code_vec")
            .agg(F.sum("t").alias("adist"))
            .collect()
        )
    }
    for pair, (_, adist) in out.items():
        assert full[pair] == adist


def test_rrf_scaled_fusion_arithmetic(spark):
    """Re-pointed rrf_fusion_scaled_top5: every fused score must
    decompose as one or two exact-integer reciprocal contributions
    with arm ranks ≤ 20, and per query the fused ranks must be a dense
    1..n prefix ordered by (rrf_nano desc, neighbor_id)."""
    from dist_keras_spark.plans.analytics5 import rrf_fusion_scaled_top5

    sf = "/root/testdata/sf0.001"
    rows = _rows(rrf_fusion_scaled_top5, spark, sf)
    assert rows
    single = {1_000_000_000 // (60 + a) for a in range(1, 21)}
    valid = single | {
        a + b for a in single for b in single
    }
    by_q = defaultdict(list)
    for r in rows:
        assert r["rrf_nano"] in valid
        by_q[r["query_id"]].append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda x: x["fused_rank"])
        assert [x["fused_rank"] for x in rs] == list(range(1, len(rs) + 1))
        nanos = [x["rrf_nano"] for x in rs]
        assert nanos == sorted(nanos, reverse=True)


# ------------------------------------------------------------------ #
# r12 holdout twins: ppjoin_dfcap / mrl scaled panel / blocking √N
# ------------------------------------------------------------------ #


def test_ppjoin_dfcap_structural_precision(spark):
    """The df cap may only DROP pairs, never alter or add one: capped
    output ⊆ lossless baseline with identical exact c/na/nb/jacc_e6 —
    and at fixture scale recall is total (measured 25/25 at sf0.01,
    256/256 at sf0.1, 197/197 at sf1)."""
    from dist_keras_spark.plans.analytics6 import (
        ppjoin_dfcap_pairs,
        ppjoin_prefix_filter_pairs,
    )

    sf = "/root/testdata/sf0.01"
    key = lambda r: (r["id_a"], r["id_b"])
    val = lambda r: (r["c"], r["na"], r["nb"], r["jacc_e6"])
    base = {key(r): val(r) for r in _rows(ppjoin_prefix_filter_pairs, spark, sf)}
    cap = {key(r): val(r) for r in _rows(ppjoin_dfcap_pairs, spark, sf)}
    assert set(cap) <= set(base)
    for k, v in cap.items():
        assert base[k] == v
    assert cap == base and len(cap) > 0


def test_blocking_rootn_equals_sampled_at_fixture(spark):
    """pct = clamp(1..50, ceil(100·40/√N)) clamps to 50 for every
    fixture N ≤ 5000, where the √N twin must equal the fixed-50% form
    cell-for-cell."""
    from dist_keras_spark.plans.analytics6 import (
        blocking_quality_rootn,
        blocking_quality_sampled,
    )

    sf = "/root/testdata/sf0.01"
    base = _rows(blocking_quality_sampled, spark, sf)
    twin = _rows(blocking_quality_rootn, spark, sf)
    assert twin == base and len(twin) == 1


def test_blocking_rootn_schedule():
    """The integer-pct schedule: clamped at fixtures, √N past them."""
    import math

    pct = lambda n: min(50, max(1, math.ceil((100 * 40) / math.sqrt(n))))
    assert pct(500) == 50
    assert pct(5000) == 50
    assert pct(50000) == 18
    assert pct(100000) == 13
    assert pct(4000 ** 2) == 1  # floor of the clamp


def test_mrl_scaled_audit_invariants(spark):
    """Scaled MRL audit: one row per served query, overlap ∈ [0, 5],
    recall_e6 = overlap·2e5, and the query panel is exactly the
    vec_id % 20 == 0 set that gets IVF candidates."""
    from dist_keras_spark.plans.analytics7 import mrl_truncation_recall_scaled
    from dist_keras_spark.plans.llm import knn_ivf_scaled_top5

    sf = "/root/testdata/sf0.001"
    rows = _rows(mrl_truncation_recall_scaled, spark, sf)
    assert rows
    served = {r["query_id"] for r in _rows(knn_ivf_scaled_top5, spark, sf)}
    assert {r["query_id"] for r in rows} == served
    for r in rows:
        assert 0 <= r["n_overlap_at5"] <= 5
        assert r["recall_e6"] == 200000 * r["n_overlap_at5"]


def test_jaccard_lsh_tau06_equals_exact_at_fixture(spark):
    """The threshold-tuned LSH rung must reproduce the exact τ = 0.6
    answer with identical integer c/na/nb/jacc_e6 at fixture scale
    (32×2 banding sized so the worst boundary pair is found; measured
    full recall at sf1/sf2 too — see docstring)."""
    from dist_keras_spark.plans.analytics6 import (
        jaccard_lsh_pairs_tau06,
        ppjoin_prefix_filter_pairs,
    )

    sf = "/root/testdata/sf0.01"
    key = lambda r: (r["id_a"], r["id_b"])
    val = lambda r: (r["c"], r["na"], r["nb"], r["jacc_e6"])
    exact = {key(r): val(r) for r in _rows(ppjoin_prefix_filter_pairs, spark, sf)}
    lsh = {key(r): val(r) for r in _rows(jaccard_lsh_pairs_tau06, spark, sf)}
    assert lsh == exact and len(lsh) > 0


def test_knn_ivf_two_level_invariants(spark):
    """Two-level IVF (knn_ivf_hier_top5): per query ≤ 5 ranked rows
    with contiguous ranks, cosine non-increasing within a query, no
    self-matches, and every query in the vec_id % 20 panel that has a
    non-empty probed region is served. The driver-footprint claim is
    structural: the operator's only collect is the ceil(√cells)
    coarse sample (asserted by reading the plan construction — the
    sub-centroid table is a DataFrame join)."""
    from dist_keras_spark.plans.llm import knn_ivf_hier_top5

    sf = "/root/testdata/sf0.01"
    rows = _rows(knn_ivf_hier_top5, spark, sf)
    assert rows
    per_q = defaultdict(list)
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        per_q[r["query_id"]].append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r["knn_rank"])
        assert [r["knn_rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)
    # the full % 20 == 0 panel is 25 queries at sf0.01; with 4 of 4
    # coarse cells probed every query sees a non-empty region
    assert len(per_q) == 25


def test_knn_ivf_two_level_recall_vs_exact(spark):
    """At the fixture clamp the two-level schedule (16 cells → 4
    coarse × 4 sub, probes 4×2) scans the same expected corpus
    fraction as the flat form's 8/16 — recall against the EXACT
    brute-force top-5 should land in the same band, not collapse.
    Measured at sf0.01: flat 0.752, hier 0.680 (the expected
    hierarchical tax — a sub-cell in an unprobed coarse cell is
    invisible; n_probe_coarse is the dial). Floor at 0.5 so a real
    routing bug (recall ≈ probed-fraction ≈ 0.5 would mean candidates
    are effectively random) fails loudly while quantizer-shape noise
    does not."""
    from dist_keras_spark.plans.llm import (
        knn_bruteforce_top5,
        knn_ivf_hier_top5,
    )

    sf = "/root/testdata/sf0.01"
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in _rows(knn_bruteforce_top5, spark, sf)
    }
    hier = {
        (r["query_id"], r["neighbor_id"])
        for r in _rows(knn_ivf_hier_top5, spark, sf)
    }
    assert brute and hier
    recall = len(brute & hier) / len(brute)
    assert recall >= 0.5, f"hier recall vs exact collapsed: {recall:.2f}"


def test_knn_ivf_hier_persisted_equals_inline(spark):
    """The persisted two-level index (build_ivf_two_level_index →
    search_ivf_two_level_index) must reproduce the inline form
    row-for-row — same coarse sample, same sub-centroid windows, same
    probes, same re-rank; only WHERE the leaf-pruning happens (storage
    vs plan) differs."""
    from dist_keras_spark.plans.llm import (
        knn_ivf_hier_persisted_top5,
        knn_ivf_hier_top5,
    )

    sf = "/root/testdata/sf0.01"
    key = lambda r: (r["query_id"], r["knn_rank"])
    inline = sorted(_rows(knn_ivf_hier_top5, spark, sf), key=key)
    persisted = sorted(_rows(knn_ivf_hier_persisted_top5, spark, sf), key=key)
    assert inline == persisted and len(inline) > 0


def test_knn_ivf_hier_persisted_plan_prunes_leaves(spark):
    """The persisted two-level search must reach the leaf-partitioned
    index scan with dynamic partition pruning on the probe keys — the
    storage-layer cost cut the docstring claims. Asserts the executed
    plan carries a dynamicpruning subquery AND that the index scan is
    NOT preceded by a repartition (the scan's own file splits carry
    the rerank parallelism; a spread here would both shuffle the full
    index and block DPP)."""
    from dist_keras_spark.plans.llm import knn_ivf_hier_persisted_top5

    df = knn_ivf_hier_persisted_top5(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # the index path appears in the plan with its scratch-dir name
    idx_part = [
        seg for seg in plan.split("FileScan parquet")
        if "ivf_hier_index" in seg and "_sub_centroids" not in seg
        and "_coarse_centroids" not in seg
    ]
    assert idx_part, "index scan missing from plan"
    # and the persisted-search plan carries NO repartition anywhere —
    # neither the explicit spread() the inline form needs (its window
    # output is AQE-coalesced) nor any other full-index shuffle; the
    # scan's own file splits carry the rerank parallelism and an
    # Exchange above the scan would also block DPP from reaching it
    # (code-review r13: this was claimed but not asserted)
    assert "REPARTITION_BY_NUM" not in plan, plan[:2000]
    assert "RoundRobinPartitioning" not in plan, plan[:2000]


def test_ivf_hier_base_delta_serves_fresh_vectors(spark):
    """The frozen-structure hierarchical ingest must make DELTA
    vectors first-class: at least one delta vector (md5 bucket ≥ 80)
    appears as a served neighbor, at least one delta query receives
    results, and the full %20 query panel is served — freshness means
    new vectors are findable AND probing without a rebuild."""
    from dist_keras_spark.operators.quality import hash_split
    from dist_keras_spark.plans.llm import (
        _IVF_BASE_PCT,
        ivf_hier_base_delta_top5,
    )
    from dist_keras_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "embeddings")
    delta_ids = {
        r["vec_id"]
        for r in e.filter(hash_split(e, "vec_id", 100) >= _IVF_BASE_PCT)
        .select("vec_id")
        .collect()
    }
    assert delta_ids
    rows = [r.asDict() for r in ivf_hier_base_delta_top5(spark, sf).collect()]
    assert {r["query_id"] for r in rows} == {
        r["vec_id"] for r in e.filter(F.col("vec_id") % 20 == 0)
        .select("vec_id").collect()
    }
    assert any(r["neighbor_id"] in delta_ids for r in rows)
    assert any(r["query_id"] in delta_ids for r in rows)


def test_ivf_hier_occupancy_drift_totals(spark):
    """Leaf occupancies partition the corpus exactly: Σ(n_base +
    n_delta) over all leaves == N, Σ n_delta == the md5-bucket delta
    stratum size, and every delta share is the exact integer ratio of
    its row."""
    from dist_keras_spark.operators.quality import hash_split
    from dist_keras_spark.plans.llm import (
        _IVF_BASE_PCT,
        ivf_hier_occupancy_drift,
    )
    from dist_keras_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "embeddings")
    n = e.count()
    n_delta = e.filter(hash_split(e, "vec_id", 100) >= _IVF_BASE_PCT).count()
    rows = [r.asDict() for r in ivf_hier_occupancy_drift(spark, sf).collect()]
    assert sum(r["n_base"] + r["n_delta"] for r in rows) == n
    assert sum(r["n_delta"] for r in rows) == n_delta
    for r in rows:
        tot = r["n_base"] + r["n_delta"]
        assert r["delta_share_micro"] == (1000000 * r["n_delta"]) // max(tot, 1)


def test_minhash_estimate_rootn_is_stratum_restriction(spark):
    """The √N twin of minhash_estimate_error must equal the full audit
    restricted to pairs whose BOTH endpoints fall in the md5-bucket
    stratum: per-doc signatures and per-pair exact counts don't depend
    on documents outside the pair, so stratifying the corpus first is
    exactly a pair filter. Pins that the twin changes WHAT is sampled,
    never the certified values."""
    from dist_keras_spark.operators.quality import deterministic_sample
    from dist_keras_spark.plans.analytics6 import (
        minhash_estimate_error,
        minhash_estimate_error_rootn,
    )
    from dist_keras_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    # fixture N=500 ⇒ the schedule clamps to pct=50
    strat = {
        r["doc_id"]
        for r in deterministic_sample(
            load_table(spark, sf, "documents"), "doc_id", 50
        )
        .select("doc_id")
        .collect()
    }
    full = _rows(minhash_estimate_error, spark, sf)
    twin = _rows(minhash_estimate_error_rootn, spark, sf)
    expected = [
        r for r in full if r["id_a"] in strat and r["id_b"] in strat
    ]
    key = lambda r: (r["id_a"], r["id_b"])
    assert sorted(twin, key=key) == sorted(expected, key=key)
    assert len(twin) > 0


def test_minhash_estimate_rootn_schedule():
    """Same integer-pct schedule as blocking_quality_rootn (shared
    _BQ_K): clamped at fixtures, √N past them."""
    import math

    from dist_keras_spark.plans.analytics6 import _BQ_K

    pct = lambda n: min(50, max(1, math.ceil((100 * _BQ_K) / math.sqrt(n))))
    assert pct(500) == 50 and pct(5000) == 50
    assert pct(50000) == 18 and pct(100000) == 13


def test_jaccard_lsh_tau06_fixture_in_high_recall_region(spark):
    """ADVICE r12 guard: jaccard_lsh_pairs_tau06 registers the EXACT
    inverted-index join as its driver oracle while the engine side is
    LSH-candidate-based, so a banding miss would surface as a driver
    hash failure indistinguishable from an engine bug. This pins the
    risk at the verification layer: the fixture's true pairs must sit
    where the 32×2 banding's expected total miss mass is negligible.
    Miss prob per pair at jaccard j is (1 − j²)³²; summed over the
    fixture's actual true pairs it must stay below 1e-3 — if a future
    fixture regeneration concentrates mass exactly at j = 0.6, THIS
    fails with a readable message instead of a driver red row."""
    from dist_keras_spark.plans.analytics6 import ppjoin_prefix_filter_pairs

    sf = "/root/testdata/sf0.01"
    jaccs = [
        r["jacc_e6"] / 1e6 for r in _rows(ppjoin_prefix_filter_pairs, spark, sf)
    ]
    assert jaccs, "fixture produced no true pairs at tau=0.6"
    expected_misses = sum((1.0 - j * j) ** 32 for j in jaccs)
    assert expected_misses < 1e-3, (
        f"fixture drifted into the banding's miss region: expected miss "
        f"mass {expected_misses:.2e} over {len(jaccs)} true pairs "
        f"(min jaccard {min(jaccs):.4f}); re-tune bands/rows in "
        f"jaccard_lsh_pairs_tau06 before the driver sees a hash mismatch"
    )


def test_knn_ivf_persisted_scaled_equals_inline(spark):
    """The persisted scaled index (build-once + partition pruning)
    must reproduce the inline scaled form row-for-row — same sample,
    same assignment kernel, same re-rank, different cost location."""
    from dist_keras_spark.plans.llm import knn_ivf_persisted_scaled_top5

    sf = "/root/testdata/sf0.01"
    key = lambda r: (r["query_id"], r["knn_rank"])
    inline = {key(r): r["neighbor_id"] for r in _rows(knn_ivf_scaled_top5, spark, sf)}
    persisted = {
        key(r): r["neighbor_id"]
        for r in _rows(knn_ivf_persisted_scaled_top5, spark, sf)
    }
    assert persisted == inline and len(persisted) > 0


def test_pq_recall_vs_served_invariants(spark):
    """Served-index PQ recall: one row per served query, overlap ∈
    [0,5], recall_micro = floor(overlap/5·1e6), and the panel equals
    the scaled-IVF ranking's query set."""
    from dist_keras_spark.plans.analytics5 import pq_recall_vs_served

    sf = "/root/testdata/sf0.001"
    rows = _rows(pq_recall_vs_served, spark, sf)
    assert rows
    served = {r["query_id"] for r in _rows(knn_ivf_scaled_top5, spark, sf)}
    assert {r["query_id"] for r in rows} == served
    for r in rows:
        assert 0 <= r["n_common"] <= 5
        assert r["recall_micro"] == (r["n_common"] * 1_000_000) // 5


def test_multiprobe_dominates_single_probe(spark):
    """Multi-probe candidates are a strict superset of own-bucket
    candidates (probe set = own bucket + 3 flips), so per query the
    result count and the best cosine can only improve vs probing the
    own bucket alone."""
    from pyspark.sql import functions as F2
    from dist_keras_spark.functions.arrays import cosine_similarity
    from dist_keras_spark.operators.similarity import lsh_bucket_expr
    from dist_keras_spark.plans.llm import _mp_planes, knn_lsh_multiprobe_top5
    from dist_keras_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    mp = {}
    for r in _rows(knn_lsh_multiprobe_top5, spark, sf):
        best, n = mp.get(r["query_id"], (-2.0, 0))
        mp[r["query_id"]] = (max(best, r["cosine"]), n + 1)
    emb = load_table(spark, sf, "embeddings")
    b = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket_expr("embedding", _mp_planes()).alias("bucket"),
    )
    q = b.filter(F2.col("vec_id") % 20 == 0).select(
        F2.col("vec_id").alias("query_id"),
        F2.col("embedding").alias("qvec"),
        "bucket",
    )
    own = (
        b.join(q, "bucket")
        .filter(F2.col("query_id") != F2.col("vec_id"))
        .select(
            "query_id",
            F2.round(cosine_similarity("qvec", "embedding"), 6).alias("cos"),
        )
        .groupBy("query_id")
        .agg(F2.max("cos").alias("best"), F2.count(F2.lit(1)).alias("n"))
        .collect()
    )
    assert mp, "multiprobe returned nothing"
    for r in own:
        assert r["query_id"] in mp  # own bucket non-empty ⇒ mp non-empty
        best_mp, n_mp = mp[r["query_id"]]
        assert best_mp >= r["best"]
        assert n_mp >= min(5, r["n"])


def test_ivf_base_delta_freshness(spark):
    """The base+delta index must make the late 20% both FINDABLE and
    SERVING: delta vectors appear among neighbors AND among queries of
    the search output; the drift audit accounts for every vector and
    reads the fixture's null result (per-cell delta share near the
    global ~20%)."""
    from pyspark.sql import functions as F2
    from dist_keras_spark.operators.quality import hash_split
    from dist_keras_spark.plans.llm import (
        _IVF_BASE_PCT,
        ivf_centroid_occupancy_drift,
        ivf_search_base_delta_top5,
    )
    from dist_keras_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "embeddings")
    n = e.count()
    delta_ids = {
        r["vec_id"]
        for r in e.filter(
            hash_split(e, "vec_id", 100) >= _IVF_BASE_PCT
        ).collect()
    }
    assert delta_ids
    out = _rows(ivf_search_base_delta_top5, spark, sf)
    assert any(r["neighbor_id"] in delta_ids for r in out)
    assert any(r["query_id"] in delta_ids for r in out)
    drift = _rows(ivf_centroid_occupancy_drift, spark, sf)
    assert sum(r["n_base"] + r["n_delta"] for r in drift) == n
    total_delta = sum(r["n_delta"] for r in drift)
    assert abs(total_delta / n - (1 - _IVF_BASE_PCT / 100)) < 0.07
    for r in drift:
        assert 0 <= r["delta_share_micro"] <= 1_000_000
        expected = (1_000_000 * r["n_delta"]) // (r["n_base"] + r["n_delta"])
        assert r["delta_share_micro"] == expected


def test_ivf_refresh_migration_conserves_mass(spark):
    """The migration matrix must account for every vector (Σ n_vecs =
    N), its row sums must equal the frozen-assignment occupancy, and
    at fixture scale most mass stays diagonal (a same-distribution
    corpus shouldn't reshuffle wholesale in one Lloyd step)."""
    from dist_keras_spark.plans.llm import ivf_refresh_migration
    from dist_keras_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    rows = _rows(ivf_refresh_migration, spark, sf)
    n = load_table(spark, sf, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n
    diag = sum(r["n_vecs"] for r in rows if r["cell_before"] == r["cell_after"])
    assert diag > n // 2
    by_before = defaultdict(int)
    for r in rows:
        by_before[r["cell_before"]] += r["n_vecs"]
    assert all(v > 0 for v in by_before.values())


def test_ivf_refresh_budgeted_is_local(spark):
    """Budgeted refresh: moves are LOCAL to the 4 hottest-ingest cells
    — every cell_before AND cell_after is one of at most 4 distinct
    cells, region mass is conserved, and the region's rows agree with
    the full-refresh matrix's row sums for those cells."""
    from dist_keras_spark.plans.llm import (
        ivf_refresh_budgeted,
        ivf_refresh_migration,
    )

    sf = "/root/testdata/sf0.01"
    rows = _rows(ivf_refresh_budgeted, spark, sf)
    assert rows
    befores = {r["cell_before"] for r in rows}
    afters = {r["cell_after"] for r in rows}
    assert len(befores) <= 4 and afters <= befores
    full = _rows(ivf_refresh_migration, spark, sf)
    full_by_before = defaultdict(int)
    for r in full:
        full_by_before[r["cell_before"]] += r["n_vecs"]
    budget_by_before = defaultdict(int)
    for r in rows:
        budget_by_before[r["cell_before"]] += r["n_vecs"]
    for c, n in budget_by_before.items():
        assert full_by_before[c] == n  # same frozen occupancy per cell
