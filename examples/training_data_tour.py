"""Runnable tour of the training-data pipeline surface (rounds 7-8) —
the queries an LLM/ML data-engineering team runs to turn a raw corpus
and event stream into reproducible training sets.

    python examples/training_data_tour.py [sf_dir]  # default /root/testdata/sf0.001

Every stop is oracle-backed (DuckDB differential hash,
tools/verify_local.py) and plan-audited (PLANS.md). The common thread:
DETERMINISM — multiplicative-hash sampling instead of rand(), exact
integer arithmetic instead of floats, prefix-monotone samples — so the
same command produces the same dataset on every engine, rerun, and
backfill.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dist_keras_spark.plans import QUERIES  # noqa: E402
from dist_keras_spark.session import get_spark  # noqa: E402

TOUR = [
    ("passage_chunk_overlap", "corpus → 200/50-overlap passages, scan-side arithmetic, no UDF"),
    ("negative_sampling_contrastive", "K=4 contrastive negatives per doc — hash-deterministic, existence-joined"),
    ("next_event_training_examples", "sequence examples (3-event context → next-type label), one user shuffle"),
    ("crossval_fold_assign", "reproducible 5-fold split + balance summary — no rand(), no assignment table"),
    ("sample_exact_n_per_group", "exactly-20-per-group eval pull, prefix-monotone as N grows"),
    ("point_in_time_features", "leakage-safe feature assembly — label spine + backward as-of"),
    ("dedup_exact_priority", "exact dedup keeping the highest-priority copy — one md5 shuffle"),
    ("minhash_lsh_neardup", "near-dedup via MinHash-LSH bands — candidates only, never all-pairs"),
    ("knn_ivf_persisted_top5", "ANN over a persisted cell-partitioned IVF index — build once, probe few"),
    ("linreg_adam_two_steps", "the Adam training loop itself, hash-exact in fixed point"),
    # round 8: curate → measure → budget → compress
    ("quality_gopher_rules", "the 9 published Gopher/C4 rules as ONE scan, per-rule counters"),
    ("quality_filter_effect_by_source", "docs+tokens surviving the gate, per source"),
    ("substring_dedup_50gram", "Lee-et-al exact-substring dup pairs via md5 span fingerprints"),
    ("substring_dedup_survivors", "…and the keep-first drop list a pipeline joins back"),
    ("ngram_novelty_rate", "per-doc novelty vs everything ingested before it"),
    ("vocab_coverage_topn", "token-coverage curve that sizes the tokenizer vocab"),
    ("token_budget_largest_remainder", "Hamilton apportionment of the training-token budget"),
    ("pq_adc_top5", "product-quantized ANN — 8 nibbles per vector, integer ADC"),
    ("pq_recall_vs_exact", "…and its recall@5 certified against the exact ranking"),
    ("poisson_bootstrap_replicas", "deterministic Poisson bootstrap for metric error bars"),
    # round 8 second session: normalize → redact → curate → split → evaluate
    ("text_normalize_canonical", "canonical lower/strip/collapse pass (idempotent) before any fingerprint"),
    ("pii_redact_mask", "email/phone detection + masking, redacted bytes md5-pinned"),
    ("quality_filter", "generic predicate gate (the Gopher suite refines it above)"),
    ("dsir_importance_weights", "DSIR target-domain importance weights, integer micro-units"),
    ("semdedup_cell_prune", "SemDeDup: embedding dedup scoped to coarse cells, all-integer"),
    ("ppjoin_prefix_filter_pairs", "exact similarity join from a prefix-filtered (rarest-token) index"),
    ("mixture_temperature_alloc", "α=0.5 temperature mixture quotas with the UniMax cap"),
    ("leakage_safe_split_assign", "train/val/test keyed on near-dup CLUSTERS — no split straddling"),
    ("hard_negative_mining_top5", "ANN-mined different-label hard negatives for contrastive training"),
    ("ranking_mrr_ndcg_at5", "integer MRR/NDCG@5 of the ANN ranking vs label relevance"),
    ("bootstrap_ci_mean", "…and the 90% percentile CI composed from the bootstrap replicas"),
    # rounds 11-12: the scale-safe production forms of every stop the
    # two-step scaling sweep measured quadratic — same answers (or the
    # served-index variant), sub-quadratic machinery
    ("neardup_cluster_lsh", "near-dup CLUSTERS from MinHash-band candidates — saturation-immune"),
    ("leakage_safe_split_lsh", "…and the cluster-keyed split over those LSH clusters"),
    ("knn_ivf_scaled_top5", "IVF with cells ∝ N, fixed probe — constant per-query fan-out"),
    ("ivf_pq_scaled_top5", "IVF-PQ under the same schedule — the FAISS-shape compressed index"),
    ("rrf_fusion_scaled_top5", "hybrid fusion: exact + PQ arms over ONE pruned candidate pool"),
    ("jaccard_lsh_pairs_tau06", "exact τ=0.6 similarity join from threshold-tuned LSH candidates"),
    ("mrl_truncation_recall_scaled", "Matryoshka truncation audited against the SERVED index"),
    ("blocking_quality_rootn", "blocking certification on a √N stratum — fixed-precision, linear cost"),
    ("unigram_surprisal_quality", "CCNet-style LM surprisal quality score, micro-nat integers"),
    ("knn_lsh_multiprobe_top5", "multi-probe LSH: one table, margin-directed extra probes"),
    ("pq_recall_vs_served", "what PQ compression costs on the index actually served"),
    ("ivf_search_base_delta_top5", "fresh data as a delta segment — search both, rebuild neither"),
    ("ivf_centroid_occupancy_drift", "…and the occupancy drift metric that schedules the re-cluster"),
    ("ivf_refresh_migration", "…and the Lloyd-step migration matrix that prices it"),
    ("ivf_refresh_budgeted", "…refreshing a 4-cell budget per pass — bounded blast radius"),
    # round 13: past the driver ceiling + the training round, whole
    ("knn_ivf_hier_top5", "TWO-LEVEL IVF — √cells driver footprint, sub-centroids stay distributed"),
    ("knn_ivf_hier_persisted_top5", "…materialized by (coarse, sub) leaf, DPP-pruned from disk"),
    ("ivf_hier_base_delta_top5", "…ingesting: delta assigned against the frozen two-level structure"),
    ("ivf_hier_occupancy_drift", "…and the per-LEAF drift monitor that schedules its refresh"),
    ("linreg_minibatch_sgd_ten_steps", "TEN mini-batch SGD steps, the whole history hash-exact"),
    ("sgd_ten_step_final_loss", "…and the epoch-end L1 eval of those weights on the full fact"),
    ("linreg_parallel_sgd_average", "4 shard workers + exact integer weight averaging — the data-parallel round"),
    ("minhash_estimate_error_rootn", "estimator certification on a √N stratum — converging AND linear"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training_data_tour")
    for name, why in TOUR:
        df = QUERIES[name](spark, sf_dir)
        rows = df.collect()
        head = rows[0].asDict() if rows else {}
        print(f"{name:34s} {len(rows):>7d} rows  | {why}")
        print(f"{'':34s} e.g. {head}")
    spark.stop()


if __name__ == "__main__":
    main()
