"""Query plan library. Importing this package registers every query.

Each query is a `(spark, sf_dir) -> DataFrame` callable registered in
`registry.QUERIES`, optionally paired with a DuckDB oracle SQL string
in `registry.ORACLE` (driver contract, __spark_entry__.py).
"""

from dist_keras_spark.plans import registry
from dist_keras_spark.plans.registry import ORACLE, QUERIES

# Import for side effect: each module registers its queries.
#
# ORDER MATTERS: the driver's correctness harness checks the first 50
# registered queries. Round 1 verified the aggregates/events_time/extras/
# features/llm/ml block (CORRECTNESS_r01.json, 50/50 clean); round 2 the
# core relational engine (49/50 + the scalar_math_funcs round() bug).
from dist_keras_spark.plans import (  # noqa: E402,F401
    relational,
    tpch,
    windows,
    scalars,
    multimodal_stream,
    tpch2,
    aggregates,
    events_time,
    extras,
    features,
    llm,
    ml,
    analytics,
    sqlx,
    tpch3,
    textsim,
    analytics3,
    analytics4,
    analytics5,
    analytics6,
    analytics7,
    analytics8,
    analytics9,
)

# Round-9 window (VERDICT r8 #1): generated MECHANICALLY by
# `python tools/verify_local.py --window-plan` (output committed below
# verbatim) — the first 50 of the 62 oracle-backed round-8 additions the
# driver has never checked (judge-verified a 44-query sample hash-green
# in the r8 session). The 12 overflow never-checked queries
# (kcore_peel_two_rounds, minhash_estimate_error, abc_classification_parts,
# bootstrap_ci_mean, source_vocab_overlap, segment_migration_matrix,
# fairness_metrics_by_group, conformal_interval_coverage,
# blocking_quality_metrics, seasonal_strength_dow,
# hhi_concentration_by_nation, table_profile_orders) are first in line
# for r10. Fixture-drift canary coverage: the three streaming _live
# queries plus event_type_diversity_gini and changepoint_mean_shift read
# `events` directly, so an events encoding drift fails loudly in-window.
# oracle=None queries are never promoted (driver errors on them).
# window plan: 62 never-checked, 0 re-checks (oldest round first), 322 oracle-backed total
registry.promote(
    "streaming_join_then_window_live",  # never checked
    "streaming_dedup_then_window_live",  # never checked
    "substring_dedup_50gram",  # never checked
    "weight_average_exact",  # never checked
    "quality_gopher_rules",  # never checked
    "power_iteration_two_steps",  # never checked
    "bigram_pmi_top",  # never checked
    "substring_dedup_survivors",  # never checked
    "vocab_coverage_topn",  # never checked
    "token_budget_largest_remainder",  # never checked
    "pq_adc_top5",  # never checked
    "pq_recall_vs_exact",  # never checked
    "ngram_novelty_rate",  # never checked
    "poisson_bootstrap_replicas",  # never checked
    "ivf_pq_top5",  # never checked
    "quality_filter_effect_by_source",  # never checked
    "binary_eval_confusion",  # never checked
    "score_calibration_bins",  # never checked
    "approx_percentile_certified",  # never checked
    "rrf_fusion_top5",  # never checked
    "ols_slope_per_supplier",  # never checked
    "event_type_diversity_gini",  # never checked
    "pq_lloyd_refined_sse",  # never checked
    "approx_count_distinct_certified",  # never checked
    "trimmed_mean_supplier",  # never checked
    "substring_dedup_50gram_poly",  # never checked
    "containment_pairs",  # never checked
    "langid_confusion",  # never checked
    "parquet_schema_evolution_scan",  # never checked
    "recursive_cte_rollup",  # never checked
    "lateral_topn_per_group",  # never checked
    "pii_redact_mask",  # never checked
    "k_anonymity_audit",  # never checked
    "winsorize_clamp_stats",  # never checked
    "ranking_mrr_ndcg_at5",  # never checked
    "dsir_importance_weights",  # never checked
    "semdedup_cell_prune",  # never checked
    "changepoint_mean_shift",  # never checked
    "l_diversity_audit",  # never checked
    "mixture_temperature_alloc",  # never checked
    "ppjoin_prefix_filter_pairs",  # never checked
    "label_propagation_two_rounds",  # never checked
    "hard_negative_mining_top5",  # never checked
    "text_normalize_canonical",  # never checked
    "leakage_safe_split_assign",  # never checked
    "multimodal_audio_energy",  # never checked
    "streaming_enrich_then_window_live",  # never checked
    "fk_orphan_audit",  # never checked
    "rake_keyword_scores",  # never checked
    "lorenz_curve_deciles",  # never checked
)

# Rows-only queries (no SQL-expressible oracle): pytest-gated, kept out
# of the driver's 50-slot window permanently.
registry.demote(
    "mllib_minhash_neardup",
    "approx_ntile_buckets",
    "ml_train_ensemble",
    "ml_train_elastic_easgd",
    "scalar_hash_spark_native",
    "agg_approx_count_distinct",
    "ml_train_single",
    "ml_train_averaging",
    "ml_train_distributed_adag",
    "ml_predict_eval",
)

__all__ = ["registry", "QUERIES", "ORACLE"]
