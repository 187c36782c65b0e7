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
)

# Round-5 window (VERDICT r4 #3): (a) the repaired events family — every
# query that reads `events` crashed on the ns→µs fixture drift and must
# re-prove on the new fixtures; (b) oracles added or behavior changed
# this round (IVF md5 quantizer, sha256 byte-map decoders, dim= plumbed
# plans); (c) backfill of queries whose only hash-green evidence is
# r1/r2. oracle=None queries are NEVER promoted — the driver reports
# err:no_oracle for them (8 burned slots in r4), so they live at the
# very end via demote().
registry.promote(
    # (a) repaired events family
    "events_tumbling_hourly",
    "events_sliding_window",
    "events_session_window",
    "events_dedup_latest",
    "events_stream_static_join",
    "events_retention_cohort",
    "events_type_share",
    "win_lag_lead",
    "win_first_last",
    "win_range_frame",
    "join_asof",
    "scalar_json_map",
    "events_signup_conversion",
    "partitioned_sink_prune",
    "streaming_foreachbatch_sink",
    "streaming_tumbling_live",
    "streaming_interval_join_live",
    "stateful_user_totals_live",
    "streaming_dedup_live",
    # (b) oracles that did not exist at the r4 driver run (these three
    # reported err:no_oracle there; knn_lsh_top5/dedup_embedding_cosine
    # hash-passed r4 and rotate OUT to make room)
    "knn_ivf_top5",
    "multimodal_fake_decode",
    "multimodal_frame_sample",
    # (d) new operators this round — every one oracle-backed
    "events_funnel_steps",
    "events_hourly_gapfill",
    "events_ewma_last",
    "events_anomaly_trailing_z",
    "grouped_mode_event_type",
    "histogram_fixed_width",
    "sample_stratified_hash",
    "merge_upsert_scd",
    "orc_roundtrip",
    "text_source_scan",
    "quality_ttr_hapax",
    "agg_grouping_sets",
    "unpivot_measures",
    "knn_int8_quantized_top5",
    "join_asof_forward",
    "win_cumulative_distinct",
    # (e) new last session (never driver-checked — added after the r4
    # driver run; displace r1/r2-evidence backfill, which stays
    # cumulative-green untouched)
    "join_range_binned",
    "join_asof_tolerance",
    "bucketed_join_colocated",
    "simhash_neardup",
    "bm25_topk_docs",
    "events_sessionize_rows",
    "decontaminate_vs_benchmark",
    "data_mix_token_budget",
    "quality_repetition_ratio",
    "dataset_split_assign",
    "neardup_cluster_assign",
    "pack_docs_into_contexts",
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
