"""Similarity search (recall gates for approximate paths) and text
functions (SURVEY.md §5.2.5 invariants)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dist_keras_spark.functions.arrays import cosine_similarity
from dist_keras_spark.functions.text import doc_fingerprint, shingles, tokens
from dist_keras_spark.operators.dedup import minhash_lsh_pairs
from dist_keras_spark.operators.similarity import knn_bruteforce, knn_lsh


def test_cosine_bounds_and_self_similarity(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = e.select(
        cosine_similarity("embedding", "embedding").alias("self_cos")
    )
    vals = [r["self_cos"] for r in pairs.collect()]
    assert all(abs(v - 1.0) < 1e-9 for v in vals)


def test_knn_ivf_recall_against_bruteforce(spark, sf_dir):
    from dist_keras_spark.operators.similarity import knn_ivf

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(e, q, k=5, n_cells=16, n_probe=8, seed=42).collect()
    }
    recall = len(exact & approx) / len(exact)
    # the fixture is near-orthogonal (top cosine ≈ 0.3-0.45), the
    # hardest regime for any coarse quantizer; measured 0.66 here,
    # same ballpark as the LSH gate (0.5)
    assert recall >= 0.55, f"IVF recall {recall:.2f} too low"
    # probing ALL cells must recover the exact result (IVF-flat is
    # exact when the probe set covers the index)
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(e, q, k=5, n_cells=8, n_probe=8, seed=42).collect()
    }
    assert full == exact


def test_knn_lsh_recall_against_bruteforce(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_lsh(e, q, k=5, n_planes=4, tables=8, seed=42).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"


def test_minhash_lsh_recall_is_total_on_fixture(spark, sf_dir):
    """At the fixture's near-dup similarity (j≥0.9) LSH must find every
    exact-Jaccard pair — this is what licenses the sharp oracle."""
    from dist_keras_spark.operators.dedup import jaccard_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {(r["id_a"], r["id_b"]) for r in jaccard_pairs(d, threshold=0.8).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(d, threshold=0.8).collect()}
    assert lsh == exact


def test_minhash_lsh_runs_without_materialization(spark, sf_dir):
    """materialize=None keeps the whole plan lazy (no localCheckpoint —
    the 100 TB posture where signatures must not pin executor storage)
    and must yield the identical pair set."""
    import pytest

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eager = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(d, threshold=0.8).collect()}
    lazy = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(d, threshold=0.8, materialize=None).collect()
    }
    assert lazy == eager
    with pytest.raises(ValueError, match="materialize"):
        minhash_lsh_pairs(d, materialize="bogus")


def test_shingles_edges(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("a a a a",)], "text string")
    out = df.select(shingles(tokens("text"), 3).alias("s")).collect()
    assert out[0]["s"] == ["a b c", "b c d"]
    assert out[1]["s"] == []           # fewer tokens than shingle width
    assert out[2]["s"] == ["a a a"]    # distinct collapses repeats


def test_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame([("alpha beta",), ("beta alpha",)], "text string")
    fps = [r["fp"] for r in df.select(doc_fingerprint(tokens("text")).alias("fp")).collect()]
    assert fps[0] != fps[1]


def test_minhash_lsh_storage_checkpoint(spark, sf_dir, tmp_path):
    """materialize='storage' (reliable checkpoint dir — the 100 TB
    cluster path) must produce the identical pair set."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    local = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(d, threshold=0.8).collect()}
    stored = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(d, threshold=0.8, materialize="storage").collect()
    }
    assert stored == local


def test_band_fold_hash_properties():
    """The in-kernel band fold: equal band slices ⇒ equal hash
    (recall-preserving), and distinct slices collide only negligibly."""
    import numpy as np

    from dist_keras_spark.operators.dedup import _MINHASH_PRIME, _minhash_udf  # noqa: F401

    bands, r = 16, 4
    mix = (
        np.random.RandomState(7).randint(1, 2**62, size=(bands, r), dtype=np.uint64)
        | np.uint64(1)
    )

    def fold(mins):
        prod = mins.reshape(bands, r, -1) * mix[:, :, None]
        s = prod.sum(axis=1, dtype=np.uint64)
        return (s & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)

    rng = np.random.RandomState(0)
    a = rng.randint(0, _MINHASH_PRIME, size=(64, 1)).astype(np.uint64)
    b = a.copy()
    np.testing.assert_array_equal(fold(a), fold(b))  # determinism / equality
    # flip one value in band 3: only band 3's hash may change, and must
    b[3 * r + 1, 0] += np.uint64(1)
    fa, fb = fold(a)[:, 0], fold(b)[:, 0]
    assert fa[3] != fb[3]
    mask = np.ones(bands, dtype=bool); mask[3] = False
    np.testing.assert_array_equal(fa[mask], fb[mask])
    # distinct random slices: no collisions across 10k trials
    xs = rng.randint(0, _MINHASH_PRIME, size=(64, 10000)).astype(np.uint64)
    hashes = fold(xs)
    assert all(len(np.unique(hashes[i])) > 9990 for i in range(bands))


def test_embedding_neardup_pairs_planted_recall(spark):
    """Planted near-dups (noisy copies, cosine >= ~0.97) must ALL be
    recovered by the banded candidate path — set-equal to the exact
    all-pairs answer, proving the bucketed rewrite of
    dedup_embedding_cosine loses nothing the exact verify would keep."""
    import numpy as np

    from dist_keras_spark.operators.similarity import embedding_neardup_pairs

    rng = np.random.RandomState(7)
    base = rng.randn(60, 64)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant 12 noisy copies: id 100+i duplicates id i
    for i in range(12):
        noisy = base[i] + 0.05 * rng.randn(64)
        rows.append((100 + i, [float(x) for x in noisy]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>").repartition(4)

    got = {
        (r["id_lo"], r["id_hi"])
        for r in embedding_neardup_pairs(df, threshold=0.9).collect()
    }
    # exact reference (driver-side numpy over the 72-vector toy set)
    mat = {i: np.asarray(v) for i, v in rows}
    ids = sorted(mat)
    exact = set()
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            va, vb = mat[ids[a]], mat[ids[b]]
            cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
            if cos >= 0.9:
                exact.add((ids[a], ids[b]))
    assert len(exact) >= 12
    assert got == exact


def test_embedding_neardup_plan_is_bucketed_not_allpairs(spark, sf_dir):
    """100 TB guard: the dedup_embedding_cosine plan must contain no
    cartesian/nested-loop pair scan — candidates come from the banded
    equi-join on (table, bucket)."""
    from dist_keras_spark.plans.registry import QUERIES

    plan = (
        QUERIES["dedup_embedding_cosine"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_empty_corpus_raises_clear_errors(spark):
    """VERDICT r4 #7: plan construction on an empty corpus must fail
    with an explanatory ValueError, not a bare TypeError from
    `.first()[0]`, on every similarity entry point that peeks the
    input."""
    from dist_keras_spark.operators.similarity import (
        embedding_neardup_pairs,
        knn_ivf,
        knn_lsh,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        knn_lsh(empty, empty)
    with pytest.raises(ValueError, match="empty"):
        embedding_neardup_pairs(empty)
    with pytest.raises(ValueError, match="empty"):
        knn_ivf(empty, empty)


def test_injected_params_equal_derived_params(spark, sf_dir):
    """VERDICT r5 #6: `knn_ivf(centroids=...)` and `knn_lsh(dim=...)`
    exist to kill plan-build driver jobs — but the injected path must
    return EXACTLY what the derived path returns, or injection silently
    changes results. Round-trips both."""
    import numpy as np

    from dist_keras_spark.operators.similarity import knn_ivf

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 100 == 0)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # replicate knn_ivf's own deterministic md5-ordered centroid sample
    seed, n_cells = 42, 8
    sample = (
        e.select("vec_id", "embedding")
        .orderBy(
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(f":{seed}"))),
            F.col("vec_id"),
        )
        .limit(n_cells)
        .collect()
    )
    cents = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sample])
    derived = knn_ivf(e, q, k=3, n_cells=n_cells, n_probe=2, seed=seed)
    injected = knn_ivf(e, q, k=3, n_cells=n_cells, n_probe=2, seed=seed, centroids=cents)
    assert rows(derived) == rows(injected)

    dim = len(e.select("embedding").first()[0])
    assert rows(knn_lsh(e, q, k=3, seed=7)) == rows(knn_lsh(e, q, k=3, seed=7, dim=dim))


def test_dim_param_skips_input_peek(spark):
    """With dim= supplied, plan construction must not run a Spark job
    (an empty corpus would otherwise raise) — the lazy path the plans
    use (dim=64)."""
    from dist_keras_spark.operators.similarity import embedding_neardup_pairs, knn_lsh

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    # constructing the plan must succeed; executing it yields zero rows
    assert knn_lsh(empty, empty, dim=8).count() == 0
    assert embedding_neardup_pairs(empty, dim=8).count() == 0


def test_persisted_ivf_equals_inline_ivf(spark, sf_dir, tmp_path):
    """build_ivf_index + search_ivf_index must return exactly what the
    inline knn_ivf returns for the same quantizer params — persistence
    must not change results, only where the probe cost is paid."""
    from dist_keras_spark.operators.similarity import (
        build_ivf_index,
        knn_ivf,
        search_ivf_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 100 == 0)
    path = str(tmp_path / "ivf")
    build_ivf_index(e, path, n_cells=8, seed=7)
    persisted = sorted(
        map(tuple, search_ivf_index(spark, path, q, k=3, n_probe=2).collect())
    )
    inline = sorted(
        map(tuple, knn_ivf(e, q, k=3, n_cells=8, n_probe=2, seed=7).collect())
    )
    assert persisted == inline


def test_ivf_rebuild_param_mismatch_raises(spark, sf_dir, tmp_path):
    """The idempotence short-circuit must VALIDATE the cached index:
    re-calling build_ivf_index at the same path with a different
    n_cells (or a corpus of different dim) raises instead of silently
    serving the stale index (ADVICE r6). Matching params still reuse."""
    import numpy as np
    import pytest

    from dist_keras_spark.operators.similarity import build_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf2")
    built = build_ivf_index(e, path, n_cells=4, seed=7)
    reused = build_ivf_index(e, path, n_cells=4, seed=7)
    assert np.allclose(built, reused)
    with pytest.raises(ValueError, match="n_cells=8"):
        build_ivf_index(e, path, n_cells=8, seed=7)
    bad_dim = e.select(
        "vec_id", F.slice("embedding", 1, 3).alias("embedding")
    )
    with pytest.raises(ValueError, match="vector dim"):
        build_ivf_index(bad_dim, path, n_cells=4, seed=7)


def test_tfidf_dfcap_is_lower_bound_of_full_cosine(spark, sf_dir):
    """tfidf_cosine_pairs_dfcap's structural-precision claim: norms
    are FULL-vocabulary while the dot keeps only df<=64 postings, so
    every emitted cosine_q is a lower bound of the full tf-idf cosine
    — an emitted pair can never be a cap artifact (the failure mode
    the first cut of this twin had: capped norms let 85k spurious
    pairs past the threshold at sf1). Re-derive the full cosine in
    pandas for every emitted pair and check cosine_q <= full and
    full >= 0.6."""
    import math
    from collections import Counter, defaultdict

    import pandas as pd

    from dist_keras_spark.plans.textsim import tfidf_cosine_pairs_dfcap

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n = len(docs)
    tf: dict[int, Counter] = {}
    df: Counter = Counter()
    for _, row in docs.iterrows():
        words = row["text"].split(" ")
        sh = Counter(
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        )
        tf[row["doc_id"]] = sh
        df.update(sh.keys())
    wgt: dict[int, dict[str, int]] = defaultdict(dict)
    for d, sh in tf.items():
        for w, c in sh.items():
            wgt[d][w] = c * ((n * 100) // df[w])
    n2 = {d: sum(v * v for v in ws.values()) for d, ws in wgt.items()}

    out = tfidf_cosine_pairs_dfcap(spark, sf_dir).collect()
    assert out, "no pairs at all — trivial fixture"
    for r in out:
        a, b = wgt[r["doc_lo"]], wgt[r["doc_hi"]]
        full_dot = sum(v * b[w] for w, v in a.items() if w in b)
        full_cos = full_dot / (
            math.sqrt(n2[r["doc_lo"]]) * math.sqrt(n2[r["doc_hi"]])
        )
        assert r["cosine_q"] <= full_cos + 5e-7  # cosine_q is round-6
        assert full_cos >= 0.60 - 1e-9
