"""Runnable end-to-end demo — the dist-keras user's notebook, on this
engine (the script form of examples/workflow.ipynb per SURVEY.md §3.3,
plus the analytics surface the reference never had).

    python examples/workflow.py [sf_dir]      # default /root/testdata/sf0.001

Stages:
  1. ingest + feature pipeline (CSV → string index → assemble →
     min-max rescale) — one Catalyst plan, zero Python
  2. distributed training (ADAG sync-rounds) + Arrow-batched inference
     + accuracy evaluation
  3. the warehouse side the reference lacked: a TPC-H join-agg, an
     as-of join, a streaming replay, and an LLM-pipeline dedup —
     each printed with its row count

The pytest twin (tests/test_reference_workflow.py) asserts the
learning outcome; this script exists to be READ and run by a human
migrating from dist-keras (see README "Migrating from dist-keras").
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dist_keras_spark.operators.evaluators import AccuracyEvaluator
from dist_keras_spark.operators.models import MLP
from dist_keras_spark.operators.predictors import ModelPredictor
from dist_keras_spark.operators.trainers import ADAG
from dist_keras_spark.operators.transformers import (
    LabelIndexTransformer,
    MinMaxTransformer,
    StringIndexTransformer,
    VectorAssembleTransformer,
)
from dist_keras_spark.plans import QUERIES
from dist_keras_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("workflow-demo")

    # ---- 1. features: one declarative plan --------------------------------
    n_feat = 8
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = e.select(
        "vec_id",
        *[F.col("embedding")[i].alias(f"f{i}") for i in range(n_feat)],
        F.concat(F.lit("class_"), (F.col("label") % 3).cast("string")).alias(
            "label_s"
        ),
    )
    df = StringIndexTransformer("label_s", "label").transform(df)
    df = VectorAssembleTransformer(
        [f"f{i}" for i in range(n_feat)], "features_raw"
    ).transform(df)
    df = MinMaxTransformer(0.0, 1.0, -1.0, 1.0, "features_raw", "features").transform(
        df
    )
    df = df.withColumn("label", F.col("label").cast("int"))
    train, test = df.randomSplit([0.8, 0.2], seed=42)

    # ---- 2. train / predict / evaluate ------------------------------------
    dims = (n_feat, 16, 3)
    trainer = ADAG(*dims, num_workers=4, rounds=30, learning_rate=0.2)
    weights = trainer.train(train)
    pred = ModelPredictor(MLP.serialize(weights), *dims).predict(test)
    pred = LabelIndexTransformer(
        input_col="prediction", output_col="prediction_index"
    ).transform(pred)
    acc = AccuracyEvaluator("prediction_index", "label").evaluate(pred)
    print(f"[train] ADAG accuracy on held-out split: {acc:.3f}")

    # ---- 3. the query engine around it ------------------------------------
    for name in (
        "revenue_by_nation",  # broadcast-dim join + agg (the flagship)
        "join_asof",  # one-shuffle union+window as-of
        "events_funnel_steps",  # ordered product-analytics funnel
        "dedup_exact_priority",  # LLM-pipeline exact dedup
        "minhash_lsh_neardup",  # MinHash+LSH near-dedup
    ):
        n = QUERIES[name](spark, sf_dir).count()
        print(f"[query] {name}: {n} rows")

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
