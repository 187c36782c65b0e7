"""Round-11 second-wave gates: every query rederives in pure Python
against the fixture parquet — chunking/dup census via dict-of-lists,
Simpson by collections.Counter, embedding norms by numpy quantization,
packing fragmentation by pandas cumsum — plus planted-signal checks
(degenerate repeated text, zero/near-zero vectors) where the statistic
has a verdict."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dist_keras_spark.plans.analytics11 import (
    _CHUNK_W,
    _NEARZERO_Q,
    _NORM2Q,
    _OFFUNIT_TOL,
    _SIMPSON_LOW_E6,
    chunk_dedup_16word,
    cross_source_dup_chunks,
    dup_chunk_cluster_mass,
    embedding_defect_scan,
    packing_fragmentation_rate,
    simpson_word_diversity,
)


def spark_rows(fn, spark, sf_dir):
    return [r.asDict() for r in fn(spark, sf_dir).collect()]


def _py_chunks(docs: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, source, h, chunk_chars) for every FULL 16-token window."""
    rows = []
    for r in docs.itertuples():
        toks = r.text.split(" ")
        for i in range(0, (len(toks) // _CHUNK_W) * _CHUNK_W, _CHUNK_W):
            chunk = " ".join(toks[i : i + _CHUNK_W])
            rows.append(
                (
                    r.doc_id,
                    r.source,
                    hashlib.md5(chunk.encode()).hexdigest(),
                    len(chunk),
                )
            )
    return pd.DataFrame(rows, columns=["doc_id", "source", "h", "chars"])


def test_chunk_dedup_rederives(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ch = _py_chunks(docs)
    docs_per_hash = ch.groupby("h")["doc_id"].nunique()
    got = {r["doc_id"]: r for r in spark_rows(chunk_dedup_16word, spark, sf_dir)}
    # exactly the docs with >=1 full chunk appear
    assert set(got) == set(ch["doc_id"])
    n_dup_docs = 0
    for doc_id, g in ch.groupby("doc_id"):
        n_dup = int((docs_per_hash.loc[g["h"]] > 1).sum())
        row = got[doc_id]
        assert row["n_chunks"] == len(g)
        assert row["n_dup_chunks"] == n_dup
        assert row["dup_e6"] == 1_000_000 * n_dup // max(len(g), 1)
        assert row["dup_heavy"] == int(row["dup_e6"] >= 300_000)
        n_dup_docs += int(n_dup > 0)
    # the fixture has real cross-doc chunk duplication to exercise
    assert n_dup_docs > 0


def test_chunk_dedup_within_doc_repeat_not_counted(spark):
    """A chunk repeated WITHIN one doc is repetition, not duplication:
    count(DISTINCT doc_id)=1 must leave n_dup_chunks at zero."""
    words = " ".join(["w%d" % (i % _CHUNK_W) for i in range(_CHUNK_W)])
    df = spark.createDataFrame(
        [(1, words + " " + words, "s0")], "doc_id long, text string, source string"
    )
    from dist_keras_spark.plans.analytics11 import _chunks_spark

    ch = _chunks_spark(df)
    assert ch.count() == 2  # two identical full windows
    # replicate the query epilogue on the tiny frame
    freq = ch.groupBy("h").agg(F.count_distinct("doc_id").alias("n_docs"))
    joined = ch.join(freq, "h")
    assert joined.where("n_docs > 1").count() == 0


def test_cluster_mass_rederives(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ch = _py_chunks(docs)
    by_h = ch.groupby("h").agg(k=("h", "size"), chars=("chars", "sum"))
    want = {
        int(k): (len(g), int(k) * len(g), int(g["chars"].sum()))
        for k, g in by_h.groupby("k")
    }
    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_instances"], r["chars_mass"])
        for r in spark_rows(dup_chunk_cluster_mass, spark, sf_dir)
    }
    assert got == want
    # mass identity: instances across the histogram == total chunks
    assert sum(v[1] for v in got.values()) == len(ch)


def test_cross_source_rederives(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ch = _py_chunks(docs)
    srcs = defaultdict(set)
    for r in ch.itertuples():
        srcs[r.h].add(r.source)
    want: Counter = Counter()
    for h, ss in srcs.items():
        for a in ss:
            for b in ss:
                if a < b:
                    want[(a, b)] += 1
    got = {
        (r["source_a"], r["source_b"]): r["n_shared_chunks"]
        for r in spark_rows(cross_source_dup_chunks, spark, sf_dir)
    }
    assert got == dict(want)
    assert len(got) > 0  # fixture has cross-source duplication


def test_simpson_rederives_and_planted_degenerate(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_src = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, toks, coll, e6sum, low
    for r in docs.itertuples():
        c = Counter(r.text.split(" "))
        n = sum(c.values())
        coll = sum(v * (v - 1) for v in c.values())
        e6 = 1_000_000 * coll // max(n * (n - 1), 1)
        s = per_src[r.source]
        s[0] += 1
        s[1] += n
        s[2] += coll
        s[3] += e6
        s[4] += int(e6 >= _SIMPSON_LOW_E6)
    got = {r["source"]: r for r in spark_rows(simpson_word_diversity, spark, sf_dir)}
    assert set(got) == set(per_src)
    for src, (nd, nt, coll, e6sum, low) in per_src.items():
        row = got[src]
        assert (
            row["n_docs"],
            row["n_tokens"],
            row["collision_pairs"],
            row["avg_simpson_e6"],
            row["n_low_diversity"],
        ) == (nd, nt, coll, e6sum // nd, low)
    # planted: a doc of ONE word repeated n times has c(c−1)=n(n−1),
    # i.e. collision probability exactly 1 — the e6 ceiling is tight
    c = Counter(("x " * 50).split())
    n = sum(c.values())
    coll = sum(v * (v - 1) for v in c.values())
    assert 1_000_000 * coll // (n * (n - 1)) == 1_000_000


def test_embedding_defect_rederives(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = emb["embedding"].map(
        lambda v: int(
            (np.floor(np.asarray(v, dtype=np.float64) * 1000 + 0.5).astype(np.int64) ** 2).sum()
        )
    )
    emb = emb.assign(norm2q=q)
    got = {r["label"]: r for r in spark_rows(embedding_defect_scan, spark, sf_dir)}
    for label, g in emb.groupby("label"):
        row = got[int(label)]
        assert row["n_vecs"] == len(g)
        assert row["min_norm2q"] == int(g["norm2q"].min())
        assert row["max_norm2q"] == int(g["norm2q"].max())
        assert row["avg_norm2q"] == int(g["norm2q"].sum()) // len(g)
        assert row["n_near_zero"] == int((g["norm2q"] < _NEARZERO_Q).sum())
        assert row["n_off_unit"] == int(
            ((g["norm2q"] - 1_000_000).abs() > _OFFUNIT_TOL).sum()
        )


def test_embedding_defect_planted_zero_vector(spark):
    """A planted all-zero vector must land in n_near_zero (and an
    off-unit one in n_off_unit) through the exact same expression."""
    df = spark.createDataFrame(
        [
            (1, [0.0] * 4, 0),
            (2, [0.5, 0.5, 0.5, 0.5], 0),  # norm2q = 1_000_000 exactly
            (3, [0.6, 0.6, 0.6, 0.6], 0),  # norm2q = 1_440_000 → off-unit
        ],
        "vec_id long, embedding array<float>, label int",
    )
    r = (
        df.select("label", F.expr(_NORM2Q).alias("norm2q"))
        .groupBy("label")
        .agg(
            F.sum(F.when(F.col("norm2q") < _NEARZERO_Q, 1).otherwise(0)).alias("nz"),
            F.sum(
                F.when(F.abs(F.col("norm2q") - 1000000) > _OFFUNIT_TOL, 1).otherwise(0)
            ).alias("off"),
        )
        .collect()[0]
    )
    assert (r["nz"], r["off"]) == (1, 2)  # zero vec is also off-unit


def test_packing_fragmentation_rederives(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").sort_values("doc_id")
    docs["n_tokens"] = docs["text"].map(lambda t: len(t.split(" ")))
    got = {r["lang"]: r for r in spark_rows(packing_fragmentation_rate, spark, sf_dir)}
    for lang, g in docs.groupby("lang"):
        cum = g["n_tokens"].cumsum()
        first_bin = (cum - g["n_tokens"]) // 512
        last_bin = (cum - 1) // 512
        n_frag = int((first_bin != last_bin).sum())
        row = got[lang]
        assert row["n_docs"] == len(g)
        assert row["n_tokens"] == int(g["n_tokens"].sum())
        assert row["n_bins"] == int((cum.iloc[-1] - 1) // 512 + 1)
        assert row["n_fragmented"] == n_frag
        assert row["frag_e6"] == 1_000_000 * n_frag // len(g)
    # with ~60-token docs in 512-token bins, roughly 1 in 8 docs
    # straddles a boundary — the signal must be alive, not zero
    assert sum(r["n_fragmented"] for r in got.values()) > 0
