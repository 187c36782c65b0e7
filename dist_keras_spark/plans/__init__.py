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
)

# Round-3 window: (a) the 19 oracle-backed queries never yet inside a
# driver window, (b) everything changed or added this round and needing
# (re)proof — the scalar_math_funcs fix, Q5 without the supplier hint,
# the bucketed dedup_embedding_cosine, new TPC-H Q12/Q9, the sharp LSH
# oracle — (c) the 9 never-checked rows-only queries (completes 128/128
# cumulative driver coverage), then r1-verified backfill.
registry.promote(
    # (a) never-checked, oracle-backed
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q17_small_quantity",
    "tpch_q19_disjunctive",
    "tpch_q22_global_sales",
    "csv_roundtrip",
    "json_roundtrip",
    "inmemory_dim_join",
    "parquet_sink_roundtrip",
    "partitioned_sink_prune",
    "cached_scan_reuse",
    "random_shuffle_multiset",
    "salted_join_skew",
    "salted_count_hotkey",
    "udtf_token_explode",
    "barrier_allreduce_dims",
    "multimodal_resize",
    "feature_reshape",
    "streaming_foreachbatch_sink",
    # (b) changed or added this round
    "scalar_math_funcs",
    "tpch_q5_local_supplier",
    "dedup_embedding_cosine",
    "tpch_q12_shipmode_priority",
    "tpch_q9_product_profit",
    "knn_lsh_top5",
    # (c) never-checked rows-only
    "multimodal_fake_decode",
    "mllib_minhash_neardup",
    "multimodal_frame_sample",
    "approx_ntile_buckets",
    "ml_train_ensemble",
    "knn_ivf_top5",
    "ml_train_elastic_easgd",
    "scalar_hash_spark_native",
    "streaming_dedup_live",
    # r1-verified backfill (re-accumulation)
    "agg_basic_stats",
    "agg_count_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_collect_set",
    "agg_median_percentile",
    "agg_variance_corr",
    "agg_pivot",
    "agg_weighted_avg",
    "agg_accuracy_evaluator",
    "events_tumbling_hourly",
    "events_sliding_window",
    "events_session_window",
    "events_dedup_latest",
    "events_stream_static_join",
    "events_retention_cohort",
)

__all__ = ["registry", "QUERIES", "ORACLE"]
