"""Round-8 second-wave gates: semantic properties the oracle hash
alone can't prove — PII masking leaves NO residual match and handles
multiple occurrences; k-anonymity classes partition the table;
winsorize thresholds are actual data elements that bound the clamp
counts at the published tail fractions."""

from __future__ import annotations

import pyspark.sql.functions as F

from dist_keras_spark.plans.analytics6 import (
    _EMAIL_RE,
    _PHONE_RE,
    k_anonymity_audit,
    pii_redact_mask,
    winsorize_clamp_stats,
)


def test_pii_masking_is_global_and_residue_free(spark):
    """Two emails + two phones in one document are ALL masked (Spark
    regexp_replace is global; the oracle's 'g' flag matches), and the
    masked text has zero residual matches for either pattern."""
    txt = (
        "a@b.example.com then +1-555-0001 and second x.y@z.io "
        "plus +1-555-9999 end"
    )
    df = spark.createDataFrame([(txt,)], "text string")
    out = df.select(
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("ne"),
        F.regexp_count("text", F.lit(_PHONE_RE)).alias("np"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        ).alias("masked"),
    ).collect()[0]
    assert out["ne"] == 2 and out["np"] == 2
    assert out["masked"].count("[EMAIL]") == 2
    assert out["masked"].count("[PHONE]") == 2
    residual = spark.createDataFrame(
        [(out["masked"],)], "text string"
    ).select(
        (
            F.regexp_count("text", F.lit(_EMAIL_RE))
            + F.regexp_count("text", F.lit(_PHONE_RE))
        ).alias("n")
    ).collect()[0]["n"]
    assert residual == 0


def test_pii_staged_rows_each_carry_one_email_one_phone(spark, sf_dir):
    rows = pii_redact_mask(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_emails"] == 1 and r["n_phones"] == 1
        assert r["masked_len"] > 0


def test_k_anonymity_classes_partition_customer(spark, sf_dir):
    out = k_anonymity_audit(spark, sf_dir)
    total = out.agg(F.sum("class_size")).collect()[0][0]
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert total == n_cust
    bad = out.filter(
        (F.col("suppressed") == 1) != (F.col("class_size") < 5)
    ).count()
    assert bad == 0


def test_winsorize_thresholds_bound_tails(spark, sf_dir):
    rows = winsorize_clamp_stats(spark, sf_dir).collect()
    assert rows
    cents = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("o_orderpriority")
        .agg(F.collect_list("c").alias("cs"))
        .collect()
    )
    by_prio = {r["o_orderpriority"]: sorted(r["cs"]) for r in cents}
    for r in rows:
        vals = by_prio[r["o_orderpriority"]]
        # thresholds are actual data elements (discrete percentile)
        assert r["p01_cents"] in vals and r["p99_cents"] in vals
        assert r["p01_cents"] <= r["p99_cents"]
        # strictly-below-p01 count < 1% of n (rank-selection bound);
        # same for strictly-above-p99
        assert r["n_clamped_low"] < 0.01 * r["n"]
        assert r["n_clamped_high"] < 0.01 * r["n"] + 1
        assert r["n"] * r["p01_cents"] <= r["wins_sum_cents"]
        assert r["wins_sum_cents"] <= r["n"] * r["p99_cents"]
