"""Fidelity measurements for the r11 scale-safe twins (VERDICT r10 #1).

Approximate production shapes are only honest if their price vs the
exact baseline is MEASURED, not asserted:

  - colbert_rerank_top3 vs colbert_maxsim_top3: top-3 overlap per
    query set (recall@3 of the retrieve-then-rerank pipeline against
    exact all-pairs MaxSim) at each SF.
  - tfidf_cosine_pairs_dfcap vs tfidf_cosine_pairs: pair-set recall of
    the absolute df<=64 valve against the fractional df<=N/10 valve
    (and the reverse, since the cap can also ADD pairs: dropping
    mid-frequency shingles changes norms, so near-threshold cosines
    move in both directions).

Results merge into bench_extended_trace.json under
"colbert_rerank_agreement" and "tfidf_dfcap_recall". All collects here
are result-sized (Q*3 ranking rows / near-dup pair lists), not
data-sized.

Usage: python tools/measure_rerank_agreement.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dist_keras_spark.plans import QUERIES  # noqa: E402
from dist_keras_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_DIRS = [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    os.path.join(REPO, "benchdata", "sf1"),
]


def _pairs(spark, name: str, sf_dir: str, cols: tuple[str, str]) -> set:
    df = QUERIES[name](spark, sf_dir).select(*cols)
    return {(r[0], r[1]) for r in df.collect()}


def _top1(spark, name: str, sf_dir: str) -> dict:
    df = QUERIES[name](spark, sf_dir).filter("rk = 1").select(
        "query_id", "neighbor_id"
    )
    return {r[0]: r[1] for r in df.collect()}


def _ensure_planted(base_dir: str) -> str:
    """Deterministic near-dup-planted embeddings corpus derived from
    sf0.1 (seed 42): for every query row (vec_id % 50 == 0) the NEXT
    row is overwritten with a small-noise copy (cosine ≈ 0.997). The
    unmodified fixture has ZERO true neighbor structure (measured r11:
    0 of 2000·1999/2 pairs over cosine 0.8), so exact-vs-approx
    agreement there is a noise-tail statistic; this corpus is where
    retrieval quality is actually testable."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(REPO, "benchdata", "planted")
    out = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(out):
        return out_dir
    src = pq.read_table(os.path.join(base_dir, "embeddings.parquet"))
    d = src.to_pydict()
    ids = np.asarray(d["vec_id"])
    order = np.argsort(ids)
    ids = ids[order]
    X = np.array([d["embedding"][i] for i in order], dtype=np.float64)
    rng = np.random.RandomState(42)
    for p in np.where(ids % 50 == 0)[0]:
        t = p + 1 if p + 1 < len(X) and ids[p + 1] % 50 != 0 else p - 1
        X[t] = X[p] + rng.randn(X.shape[1]) * 0.08 * np.linalg.norm(X[p]) / 8
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids.tolist(), type=src.schema.field("vec_id").type),
                "embedding": pa.array(
                    [row.tolist() for row in X.astype(np.float32)],
                    type=src.schema.field("embedding").type,
                ),
            }
        ),
        out,
    )
    return out_dir


def main(dirs: list[str]) -> None:
    spark = get_spark("measure_rerank_agreement")
    colbert: dict[str, dict] = {}
    tfidf: dict[str, dict] = {}
    # Planted-corpus fidelity: the fixture corpora are near-orthogonal
    # noise, so run the same agreement on a corpus WITH true neighbors
    # (tagged "planted_sf0.1") — that number says whether the twin
    # finds real near-duplicates; the fixture numbers say how the
    # noise tail ranks.
    planted = _ensure_planted("/root/testdata/sf0.1")
    for sf_dir in [planted] + dirs:
        tag = (
            "planted_sf0.1"
            if sf_dir == planted
            else os.path.basename(sf_dir.rstrip("/"))
        )
        exact = _pairs(
            spark, "colbert_maxsim_top3", sf_dir, ("query_id", "neighbor_id")
        )
        rerank = _pairs(
            spark, "colbert_rerank_top3", sf_dir, ("query_id", "neighbor_id")
        )
        ex1, rr1 = (
            _top1(spark, "colbert_maxsim_top3", sf_dir),
            _top1(spark, "colbert_rerank_top3", sf_dir),
        )
        colbert[tag] = {
            "n_exact_top3": len(exact),
            "n_rerank_top3": len(rerank),
            "n_overlap": len(exact & rerank),
            "recall_at3": round(len(exact & rerank) / max(len(exact), 1), 4),
            "top1_agree": sum(1 for q, v in ex1.items() if rr1.get(q) == v),
            "n_queries": len(ex1),
        }
        if sf_dir == planted:
            continue  # tfidf needs the documents table; planted has none
        frac = _pairs(spark, "tfidf_cosine_pairs", sf_dir, ("doc_lo", "doc_hi"))
        cap = _pairs(
            spark, "tfidf_cosine_pairs_dfcap", sf_dir, ("doc_lo", "doc_hi")
        )
        tfidf[tag] = {
            "n_fractional": len(frac),
            "n_dfcap": len(cap),
            "n_overlap": len(frac & cap),
            "recall_vs_fractional": round(len(frac & cap) / max(len(frac), 1), 4),
            "dfcap_only": len(cap - frac),
        }
        print(f"{tag}: colbert {colbert[tag]}  tfidf {tfidf[tag]}")
    colbert["note"] = (
        "fixture corpora are near-orthogonal noise (0 pairs over cos 0.8 "
        "at sf0.1), so fixture recall@3 ranks the noise tail; "
        "planted_sf0.1 (seed-42 true near-dups) is the retrieval-quality "
        "signal — top1_agree/n_queries is the fraction of true neighbors "
        "found"
    )
    tfidf["note"] = (
        "sf1 generated text has no Zipf tail (median shingle df 92; min "
        "shared-df across its 1401 true pairs p50=75/max=101), so no "
        "constant df cap below cluster size can see those pairs — see "
        "tfidf_cosine_pairs_dfcap docstring for the full diagnosis"
    )
    path = os.path.join(REPO, "bench_extended_trace.json")
    with open(path) as fh:
        trace = json.load(fh)
    trace.setdefault("colbert_rerank_agreement", {}).update(colbert)
    trace.setdefault("tfidf_dfcap_recall", {}).update(tfidf)
    with open(path, "w") as fh:
        json.dump(trace, fh, indent=1)
    print(json.dumps({"colbert": colbert, "tfidf": tfidf}))


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_DIRS)
