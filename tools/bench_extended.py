"""Extended benchmark: the round-5 operator families at sf0.1.

NOT part of the driver contract (bench.py is — its query list stays
stable for cross-round comparison). This suite times the new analytics
/ layout / pipeline operators end-to-end (noop sink = full
materialization) and writes bench_extended_trace.json, so plan-shape
claims in the docstrings carry measured numbers.

Usage: python tools/bench_extended.py  [reads $SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dist_keras_spark.plans import QUERIES  # noqa: E402
from dist_keras_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"

EXTENDED = [
    "events_funnel_steps",
    "events_hourly_gapfill",
    "events_ewma_last",
    "events_anomaly_trailing_z",
    "events_transition_matrix",
    "events_session_bounce_rate",
    "grouped_mode_event_type",
    "histogram_fixed_width",
    "sample_stratified_hash",
    "merge_upsert_scd",
    "join_asof_forward",
    "win_cumulative_distinct",
    "win_range_numeric",
    "agg_grouping_sets",
    "agg_max_by",
    "unpivot_measures",
    "knn_int8_quantized_top5",
    "quality_ttr_hapax",
    "zorder_cluster_stats",
    "share_of_total_broadcast",
    "pipeline_curation_end2end",
    "dq_expectations_orders",
    "join_asof_nearest",
    "bpe_first_merges",
    "embedding_centroid_by_label",
    "robust_outliers_mad",
    "user_event_entropy",
    "gini_customer_spend",
    "gini_histogram_binned",
    "ab_test_t_stat",
    "regression_trend_slope",
    "setop_multiset_all",
    "join_shuffle_hash_hint",
    # round 6
    "tpch_q2_shape_min_cost_supplier",
    "tpch_q11_shape_important_stock",
    "tpch_q20_shape_excess_stock",
    "join_asof_left",
    "levenshtein_blocked_pairs",
    "tfidf_cosine_pairs",
    "heavy_hitters_support",
    "drift_chi2_daily",
    "win_reset_running_sum",
    "events_ohlc_daily",
    "events_time_weighted_avg",
    "incremental_rollup_merge",
    # round 6, second/third wave
    "market_basket_lift",
    "cdc_snapshot_diff",
    "scd2_from_events",
    "concurrent_intervals_peak",
    "sequence_pattern_match",
    "revenue_mom_growth",
    "rfm_segment_quantile",
    "weighted_median_by_supplier",
    "pareto_frontier_brand",
    "corr_sufficient_stats",
    "manifest_skipping_scan",
    "events_path_top10",
    "kmeans_lloyd_two_iters",
    "events_funnel_within_24h",
    "triangle_count_brands",
    "udtf_table_arg_summary",
    "arrow_journey_summary",  # mapInArrow twin — the protocol delta, measured
    "win_moving_median",
    "attribution_linear_touch",
    "knn_ivf_persisted_top5",
    # round 7 (arrow_journey_summary already above, next to its twin)
    "linreg_adam_two_steps",
    "linreg_dynsgd_two_steps",
    "linreg_eamsgd_two_steps",
    "join_skew_salted",
    "next_event_training_examples",
    "negative_sampling_contrastive",
    "seasonal_naive_backtest",
    "crossval_fold_assign",
    "passage_chunk_overlap",
    "interpolate_linear_gaps",
    "sample_exact_n_per_group",
    "snapshot_rollback_restore",
    "bloom_runtime_filter_join",
    # round 8
    "substring_dedup_50gram",
    "substring_dedup_50gram_poly",  # rolling-hash twin, measured 4.5x faster
    "substring_dedup_survivors",
    "weight_average_exact",
    "quality_gopher_rules",
    "quality_filter_effect_by_source",
    "power_iteration_two_steps",
    "bigram_pmi_top",
    "vocab_coverage_topn",
    "token_budget_largest_remainder",
    "pq_adc_top5",
    "pq_recall_vs_exact",
    "ivf_pq_top5",
    "ngram_novelty_rate",
    "poisson_bootstrap_replicas",
    "binary_eval_confusion",
    "score_calibration_bins",
    # round 8, second session (compliance / evaluation / dedup wave)
    "pii_redact_mask",
    "k_anonymity_audit",
    "l_diversity_audit",
    "winsorize_clamp_stats",
    "ranking_mrr_ndcg_at5",
    "hard_negative_mining_top5",
    "dsir_importance_weights",
    "semdedup_cell_prune",
    "changepoint_mean_shift",
    "mixture_temperature_alloc",
    "ppjoin_prefix_filter_pairs",
    "label_propagation_two_rounds",
    "text_normalize_canonical",
    "leakage_safe_split_assign",
    "multimodal_audio_energy",
    "fk_orphan_audit",
    "rake_keyword_scores",
    "lorenz_curve_deciles",
    "kcore_peel_two_rounds",
    "minhash_estimate_error",
    "abc_classification_parts",
    "bootstrap_ci_mean",
    "source_vocab_overlap",
    "segment_migration_matrix",
    "fairness_metrics_by_group",
    "conformal_interval_coverage",
    "blocking_quality_metrics",
    "seasonal_strength_dow",
    "hhi_concentration_by_nation",
    "table_profile_orders",
    # round 9
    "blocking_quality_sampled",  # sampled-stratum twin of blocking_quality_metrics
    "t_closeness_audit",
    "auc_mann_whitney",
    "mad_robust_scale",
    "clustering_coefficient_nodes",
    "vocab_growth_curve",
    "mrl_truncation_recall",
    "colbert_maxsim_top3",
    "cluster_cap_sample",
    "incremental_dedup_new_batch",
    "sessionize_with_cap",
    "table_profile_documents",
    "multimodal_video_framestats",
    "cumulative_distinct_users",
    "partition_skew_stats",
    "zipf_rank_frequency",
    "streaming_capped_sessions_live",
    "kmv_distinct_certified",
    "countmin_sketch_certified",
    # round 9 third wave
    "range_join_binned",
    "bloom_fpr_certified",
    "kmv_union_intersect_certified",
    "link_prediction_common_neighbors",
    "winnowing_fingerprint_pairs",
    "ks_test_two_sample",
    "benford_first_digit_audit",
    "trend_mann_kendall_theilsen",
    "kruskal_wallis_quantity",
    "hodges_lehmann_quantity",
    # round 10
    "spearman_rank_corr",
    "cusum_drift_detect",
    "autocorr_ljung_box",
    "chao1_vocab_richness",
    "chapman_capture_recapture",
    "rbo_ranking_overlap",
    "quantile_normalize_acctbal",
    "fellegi_sunter_linkage_score",
    "embedding_mmd_drift",
    # r11 scale-safe twins
    "tfidf_cosine_pairs_dfcap",
    "semdedup_scaled_cells",
    "colbert_rerank_top3",
    # r12 scale-safe twins (PQ family + ppjoin rungs + audits)
    "ivf_pq_scaled_top5",
    "rrf_fusion_scaled_top5",
    "ppjoin_dfcap_pairs",
    "jaccard_lsh_pairs_tau06",
    "mrl_truncation_recall_scaled",
    "blocking_quality_rootn",
    "knn_ivf_persisted_scaled_top5",
    "pq_recall_vs_served",
    "knn_lsh_multiprobe_top5",
    "ivf_search_base_delta_top5",
    "ivf_centroid_occupancy_drift",
    "ivf_refresh_migration",
    "ivf_refresh_budgeted",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main(only: list[str] | None = None) -> None:
    from bench import _cpu_mix, _cpu_sample  # repo root is on sys.path

    # explicit names = re-time just those and MERGE per-query into the
    # committed trace (new ops land without a 12-minute full rerun)
    ops = [n for n in EXTENDED if n in only] if only else list(EXTENDED)
    unknown = [n for n in (only or []) if n not in EXTENDED]
    if unknown:
        raise SystemExit(f"not in EXTENDED: {unknown}")
    spark = get_spark("bench_extended")
    timings: dict[str, float] = {}
    cpu0 = _cpu_sample()
    for name in ops:
        fn = QUERIES[name]
        _materialize(fn(spark, WARM_DIR))  # codegen warm
        _materialize(fn(spark, SF_DIR))  # full-size warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _materialize(fn(spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs)
    load1, load5, load15 = os.getloadavg()
    out = {
        "sf_dir": SF_DIR,
        "loadavg": [round(load1, 2), round(load5, 2), round(load15, 2)],
        **_cpu_mix(cpu0, _cpu_sample()),
        "total_sec": round(sum(timings.values()), 3),
        "queries": timings,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_extended_trace.json",
    )
    # MERGE into the existing trace: other tools park their evidence in
    # the same file under their own keys (blocking_ab, scaling_10x) —
    # a wholesale dump would wipe it (nearly did, r10).
    try:
        with open(path) as fh:
            existing = json.load(fh)
    except (OSError, ValueError):
        existing = {}
    # per-QUERY merge (subset runs must not wipe the other entries);
    # total_sec re-sums the merged map so it stays self-consistent
    merged_q = dict(existing.get("queries", {}))
    merged_q.update(timings)
    out["queries"] = merged_q
    out["total_sec"] = round(sum(merged_q.values()), 3)
    existing.update(out)
    with open(path, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps({**out, "queries_timed_this_run": len(timings)}))


if __name__ == "__main__":
    main(sys.argv[1:] or None)
