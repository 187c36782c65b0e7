"""Round-11 third-wave gates: both LM-surprisal queries rederive in
pure Python (Counter-based unigram/bigram counts, micro-nat
quantization identical to the engine formula) against the fixture
parquet, plus planted-signal checks — a rare-word doc must out-score a
common-word doc, and an eval bigram absent from the train half must
take the stupid-backoff branch with the hand-computed value."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from dist_keras_spark.plans.analytics12 import (
    _BI_HI_E6,
    _UNI_HI_E6,
    _UNI_LO_E6,
    heldout_bigram_surprisal,
    unigram_surprisal_quality,
)


def _q(x: float) -> int:
    return int(math.floor(x * 1_000_000 + 0.5))


def spark_rows(fn, spark, sf_dir):
    return [r.asDict() for r in fn(spark, sf_dir).collect()]


def _py_unigram(docs: pd.DataFrame) -> dict:
    cnt: Counter = Counter()
    for t in docs["text"]:
        cnt.update(t.split(" "))
    n_total = sum(cnt.values())
    s = {w: _q(math.log(n_total / c)) for w, c in cnt.items()}
    per_src = defaultdict(lambda: [0, 0, [], 0, 0])  # docs toks means hi lo
    for r in docs.itertuples():
        toks = r.text.split(" ")
        mean_e6 = sum(s[w] for w in toks) // len(toks)
        a = per_src[r.source]
        a[0] += 1
        a[1] += len(toks)
        a[2].append(mean_e6)
        a[3] += mean_e6 >= _UNI_HI_E6
        a[4] += mean_e6 < _UNI_LO_E6
    return {
        src: (
            a[0],
            a[1],
            sum(a[2]) // a[0],
            max(a[2]),
            a[3],
            a[4],
        )
        for src, a in per_src.items()
    }


def test_unigram_surprisal_rederives(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = _py_unigram(docs)
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_tokens"],
            r["avg_doc_surprisal_e6"],
            r["max_doc_surprisal_e6"],
            r["n_high_surprisal"],
            r["n_low_surprisal"],
        )
        for r in spark_rows(unigram_surprisal_quality, spark, sf_dir)
    }
    assert got == want
    # the thresholds are LIVE on the fixture: some source flags docs
    assert sum(v[4] for v in got.values()) > 0
    assert sum(v[5] for v in got.values()) > 0


def test_unigram_rare_word_doc_scores_higher(spark, tmp_path):
    """Planted signal: with 9 docs of 'common' and 1 doc of 'rare',
    the rare doc's surprisal ln(N/1) must exceed the common docs'
    ln(N/9) — and the exact micro-nat values must match by hand."""
    rows = [(i, "common", "s0") for i in range(9)] + [(9, "rare", "s1")]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df.to_parquet(tmp_path / "documents.parquet")
    got = {
        r["source"]: r
        for r in spark_rows(unigram_surprisal_quality, spark, str(tmp_path))
    }
    assert got["s1"]["avg_doc_surprisal_e6"] == _q(math.log(10 / 1))
    assert got["s0"]["avg_doc_surprisal_e6"] == _q(math.log(10 / 9))
    assert (
        got["s1"]["avg_doc_surprisal_e6"] > got["s0"]["avg_doc_surprisal_e6"]
    )


def _py_bigram(docs: pd.DataFrame) -> dict:
    cb: Counter = Counter()
    cu: Counter = Counter()
    for r in docs.itertuples():
        toks = r.text.split(" ")
        if r.doc_id % 2 == 0:
            cu.update(toks)
            cb.update(zip(toks, toks[1:]))
    cc: Counter = Counter()
    for (w1, _), c in cb.items():
        cc[w1] += c
    nt = sum(cu.values())
    per_src = defaultdict(lambda: [0, 0, 0, [], 0])  # docs bi backoff means hi
    for r in docs.itertuples():
        if r.doc_id % 2 != 1:
            continue
        toks = r.text.split(" ")
        if len(toks) < 2:
            continue
        tot_s = nb = 0
        pairs = list(zip(toks, toks[1:]))
        for w1, w2 in pairs:
            if (w1, w2) in cb:
                tot_s += _q(math.log(cc[w1] / cb[(w1, w2)]))
            else:
                nb += 1
                tot_s += _q(math.log(5 * nt / (2 * cu.get(w2, 1))))
        mean_e6 = tot_s // len(pairs)
        a = per_src[r.source]
        a[0] += 1
        a[1] += len(pairs)
        a[2] += nb
        a[3].append(mean_e6)
        a[4] += mean_e6 >= _BI_HI_E6
    return {
        src: (a[0], a[1], a[2], sum(a[3]) // a[0], a[4])
        for src, a in per_src.items()
    }


def test_heldout_bigram_rederives(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = _py_bigram(docs)
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_bigrams"],
            r["n_backoff"],
            r["avg_doc_surprisal_e6"],
            r["n_high_ppl"],
        )
        for r in spark_rows(heldout_bigram_surprisal, spark, sf_dir)
    }
    assert got == want
    assert sum(v[4] for v in got.values()) > 0  # hi-ppl threshold live


def test_heldout_bigram_planted_backoff(spark, tmp_path):
    """Train half (doc 0): 'a b a b a'. Eval doc 1 contains bigram
    (b, c) never seen in train and token c unseen entirely — both
    backoff branches hand-computed: seen (a,b): ln(cc(a)/cb(a,b)) =
    ln(2/2); unseen (b,c) with cu(c) missing → ln(5·5/(2·1))."""
    rows = [(0, "a b a b a", "s0"), (1, "a b c", "s0")]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df.to_parquet(tmp_path / "documents.parquet")
    [r] = spark_rows(heldout_bigram_surprisal, spark, str(tmp_path))
    assert r["n_docs"] == 1 and r["n_bigrams"] == 2
    assert r["n_backoff"] == 1
    want = (_q(math.log(2 / 2)) + _q(math.log(25 / 2))) // 2
    assert r["avg_doc_surprisal_e6"] == want
