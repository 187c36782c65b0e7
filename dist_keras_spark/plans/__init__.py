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

# Round-14 window: generated MECHANICALLY by
# `python tools/verify_local.py --window-plan` (output committed below
# verbatim) — the 8 never-checked queries the interrupted r13 build
# session added (two-level IVF quantizer family, SGD replay trio,
# minhash_estimate_error_rootn; all oracle-verified at sf0.01 in that
# session's own gate) first, then the 42 oldest re-checks (last driver
# signal r6). Never-checked debt returns to ZERO in this window, per
# the steady-state rule in .claude/skills/verify/SKILL.md.
# window plan: 8 never-checked, 42 re-checks (oldest round first), 403 oracle-backed total
registry.promote(
    "knn_ivf_hier_top5",  # never checked
    "knn_ivf_hier_persisted_top5",  # never checked
    "ivf_hier_base_delta_top5",  # never checked
    "ivf_hier_occupancy_drift",  # never checked
    "linreg_minibatch_sgd_ten_steps",  # never checked
    "sgd_ten_step_final_loss",  # never checked
    "linreg_parallel_sgd_average",  # never checked
    "minhash_estimate_error_rootn",  # never checked
    "events_ohlc_daily",  # last r6
    "events_time_weighted_avg",  # last r6
    "union_schema_evolution",  # last r6
    "parquet_schema_merge",  # last r6
    "custom_datasource_scan",  # last r6
    "custom_datasource_stream_live",  # last r6
    "incremental_rollup_merge",  # last r6
    "snapshot_time_travel",  # last r6
    "pipeline_curation_end2end",  # last r6
    "bpe_first_merges",  # last r6
    "embedding_centroid_by_label",  # last r6
    "join_asof_left",  # last r6
    "scalar_regex_mask",  # last r6
    "events_transition_matrix",  # last r6
    "zorder_cluster_stats",  # last r6
    "share_of_total_broadcast",  # last r6
    "events_session_bounce_rate",  # last r6
    "ab_test_t_stat",  # last r6
    "regression_trend_slope",  # last r6
    "dq_expectations_orders",  # last r6
    "scalar_try_cast_tolerant",  # last r6
    "join_null_safe_eq",  # last r6
    "win_range_numeric",  # last r6
    "explode_outer_empty_arrays",  # last r6
    "agg_bitmap_event_types",  # last r6
    "join_asof_nearest",  # last r6
    "robust_outliers_mad",  # last r6
    "user_event_entropy",  # last r6
    "gini_customer_spend",  # last r6
    "gini_histogram_binned",  # last r6
    "setop_multiset_all",  # last r6
    "sort_null_ordering",  # last r6
    "join_shuffle_hash_hint",  # last r6
    "observed_scan_metrics",  # last r6
    "grouped_agg_pandas_udaf",  # last r6
    "heavy_hitters_support",  # last r6
    "drift_chi2_daily",  # last r6
    "win_reset_running_sum",  # last r6
    "sql_recursive_cte",  # last r6
    "sql_lateral_topn",  # last r6
    "tpch_q2_shape_min_cost_supplier",  # last r6
    "tpch_q11_shape_important_stock",  # last r6
)
# rotation horizon: 403 oracle-backed / 50 slots = 9 rounds to re-check every query once; oldest standing driver signal: r1

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
