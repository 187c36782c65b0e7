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
    analytics10,
    analytics11,
    analytics12,
)

# Round-13 window (VERDICT r12 #2): generated MECHANICALLY by
# `python tools/verify_local.py --window-plan` (output committed below
# verbatim) — the 7 never-checked r12 post-window additions first (the
# index-freshness family + multiprobe + served-recall, all judge-run
# 7/7 hash-green at sf0.01 in the r12 judge session), then the 43
# oldest re-checks (last driver signal r5/r6). Never-checked debt
# returns to ZERO in this window, per the steady-state rule in
# .claude/skills/verify/SKILL.md. oracle=None queries are never
# promoted (driver errors on them).
# window plan: 7 never-checked, 43 re-checks (oldest round first), 395 oracle-backed total
registry.promote(
    "knn_lsh_multiprobe_top5",  # never checked
    "knn_ivf_persisted_scaled_top5",  # never checked
    "ivf_search_base_delta_top5",  # never checked
    "ivf_centroid_occupancy_drift",  # never checked
    "ivf_refresh_migration",  # never checked
    "ivf_refresh_budgeted",  # never checked
    "pq_recall_vs_served",  # never checked
    "multimodal_frame_sample",  # last r5
    "agg_grouping_sets",  # last r5
    "unpivot_measures",  # last r5
    "events_tumbling_hourly",  # last r5
    "events_sliding_window",  # last r5
    "events_session_window",  # last r5
    "events_dedup_latest",  # last r5
    "events_stream_static_join",  # last r5
    "events_retention_cohort",  # last r5
    "events_type_share",  # last r5
    "events_sessionize_rows",  # last r5
    "stateful_user_totals_live",  # last r5
    "orc_roundtrip",  # last r5
    "text_source_scan",  # last r5
    "bucketed_join_colocated",  # last r5
    "partitioned_sink_prune",  # last r5
    "neardup_cluster_assign",  # last r5
    "pack_docs_into_contexts",  # last r5
    "quality_repetition_ratio",  # last r5
    "dataset_split_assign",  # last r5
    "decontaminate_vs_benchmark",  # last r5
    "data_mix_token_budget",  # last r5
    "bm25_topk_docs",  # last r5
    "simhash_neardup",  # last r5
    "knn_ivf_top5",  # last r5
    "events_signup_conversion",  # last r5
    "quality_ttr_hapax",  # last r5
    "knn_int8_quantized_top5",  # last r5
    "events_funnel_steps",  # last r5
    "events_hourly_gapfill",  # last r5
    "events_ewma_last",  # last r5
    "events_anomaly_trailing_z",  # last r5
    "grouped_mode_event_type",  # last r5
    "histogram_fixed_width",  # last r5
    "sample_stratified_hash",  # last r5
    "merge_upsert_scd",  # last r5
    "join_asof_forward",  # last r5
    "win_cumulative_distinct",  # last r5
    "streaming_session_window_live",  # last r6
    "streaming_sliding_window_live",  # last r6
    "agg_max_by",  # last r6
    "agg_boolean_conditional",  # last r6
    "agg_string_concat_ordered",  # last r6
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
