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
)

# Round-7 window (VERDICT r6 #1 + #6): generated MECHANICALLY by
# `python tools/verify_local.py --window-plan` (output committed below
# verbatim) — all 47 oracle-backed queries the driver has never
# checked, in registration order, then the 3 oldest-checked re-checks
# (r1). Fixture-drift canary coverage is inherent: 9+ of the 47 read
# the `events` table directly (events_session_dynamic_gap,
# events_path_top10, scd2_from_events, attribution_linear_touch,
# concurrent_intervals_peak, sequence_pattern_match,
# events_funnel_within_24h, point_in_time_features,
# events_cohort_ltv_triangle), so an events encoding drift fails
# loudly in-window. oracle=None queries are never promoted (driver
# errors on them); they stay demoted at the very end.
# window plan: 47 never-checked, 3 re-checks (oldest round first), 244 oracle-backed total
registry.promote(
    "sort_paginate_offset",  # never checked
    "topk_with_ties",  # never checked
    "win_moving_median",  # never checked
    "win_locf_forward_fill",  # never checked
    "variant_semi_structured",  # never checked
    "scalar_hof_suite",  # never checked
    "scalar_calendar_arithmetic",  # never checked
    "scalar_try_arithmetic",  # never checked
    "streaming_upsert_sink_live",  # never checked
    "streaming_watermark_late_drop_live",  # never checked
    "streaming_left_outer_join_live",  # never checked
    "arrow_blob_stats",  # never checked
    "streaming_full_outer_join_live",  # never checked
    "agg_percentile_disc_rank",  # never checked
    "pivot_multi_measure",  # never checked
    "events_session_dynamic_gap",  # never checked
    "dpp_partitioned_join",  # never checked
    "manifest_skipping_scan",  # never checked
    "events_path_top10",  # never checked
    "custom_datasource_write_roundtrip",  # never checked
    "udtf_table_arg_summary",  # never checked
    "bucket_pruning_scan",  # never checked
    "compaction_roundtrip",  # never checked
    "knn_ivf_persisted_top5",  # never checked
    "kmeans_lloyd_two_iters",  # never checked
    "linreg_gd_two_steps",  # never checked
    "attribution_linear_touch",  # never checked
    "sql_pipe_syntax",  # never checked
    "collation_case_insensitive",  # never checked
    "sql_group_by_all",  # never checked
    "sql_identifier_clause",  # never checked
    "market_basket_lift",  # never checked
    "cdc_snapshot_diff",  # never checked
    "scd2_from_events",  # never checked
    "concurrent_intervals_peak",  # never checked
    "sequence_pattern_match",  # never checked
    "revenue_mom_growth",  # never checked
    "rfm_segment_quantile",  # never checked
    "weighted_median_by_supplier",  # never checked
    "pareto_frontier_brand",  # never checked
    "corr_sufficient_stats",  # never checked
    "events_funnel_within_24h",  # never checked
    "triangle_count_brands",  # never checked
    "pagerank_two_iters",  # never checked
    "logistic_newton_step",  # never checked
    "point_in_time_features",  # never checked
    "events_cohort_ltv_triangle",  # never checked
    "sql_entry_q3",  # last r1
    "grouped_zscore",  # last r1
    "data_quality_summary",  # last r1
)
# Round-7 additions NOT in this window (all verified by
# tools/verify_local.py at 3 SFs; `--window-plan` picks them up first
# for r8 automatically): arrow_journey_summary, linreg_adam_two_steps,
# linreg_dynsgd_two_steps, linreg_eamsgd_two_steps, join_skew_salted,
# next_event_training_examples, negative_sampling_contrastive,
# seasonal_naive_backtest, crossval_fold_assign, passage_chunk_overlap,
# interpolate_linear_gaps, sample_exact_n_per_group,
# snapshot_rollback_restore, streaming_session_dynamic_gap_live,
# streaming_two_level_window_live (chained stateful aggs),
# bloom_runtime_filter_join.

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
