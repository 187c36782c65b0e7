"""End-to-end replay of the reference's flagship pipeline
(examples/workflow.ipynb, SURVEY.md §3.3): CSV ingest → string index →
vector assemble → min-max rescale → randomSplit → distributed train →
batched predict → argmax → accuracy evaluate.

In the reference each arrow is a separate RDD pass with schema
re-inference; here the whole feature prefix is one Catalyst plan and
the ML boundary is two Arrow-batched jobs. This test is the parity
capstone: a dist-keras user's entire notebook, expressed through this
engine's API, runs and learns.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from dist_keras_spark.operators.evaluators import AccuracyEvaluator
from dist_keras_spark.operators.models import MLP
from dist_keras_spark.operators.predictors import ModelPredictor
from dist_keras_spark.operators.trainers import ADAG, SingleTrainer
from dist_keras_spark.operators.transformers import (
    LabelIndexTransformer,
    MinMaxTransformer,
    StringIndexTransformer,
    VectorAssembleTransformer,
)
from dist_keras_spark.sources.readers import read_csv


def test_reference_workflow_end_to_end(spark, sf_dir, tmp_path):
    # --- CSV ingest (A1): embeddings flattened to a wide CSV with a
    # categorical label column, like the reference's atlas_higgs.csv
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_feat = 8  # first 8 dims keep the tiny-model training fast
    wide = e.select(
        "vec_id",
        *[F.col("embedding")[i].alias(f"f{i}") for i in range(n_feat)],
        F.concat(F.lit("class_"), (F.col("label") % 3).cast("string")).alias("label_s"),
    )
    csv_path = str(tmp_path / "higgs_like")
    wide.write.option("header", "true").mode("overwrite").csv(csv_path)
    df = read_csv(spark, csv_path)  # inferSchema path, like the notebook
    assert df.schema["f0"].dataType.typeName() == "double"

    # --- feature pipeline (B11, B12, B6) — ONE Catalyst plan
    df = StringIndexTransformer("label_s", "label").transform(df)
    df = VectorAssembleTransformer([f"f{i}" for i in range(n_feat)], "features_raw").transform(df)
    df = MinMaxTransformer(0.0, 1.0, -1.0, 1.0, "features_raw", "features").transform(df)
    df = df.withColumn("label", F.col("label").cast("int"))

    # --- randomSplit (REF-ex), seeded
    train, test = df.randomSplit([0.8, 0.2], seed=42)
    train.cache(), test.cache()

    dims = (n_feat, 16, 3)
    # --- distributed training (ADAG mode = the reference's recommended
    # default trainer) vs sequential baseline
    dist = ADAG(*dims, num_workers=4, rounds=40, learning_rate=0.2)
    ws_dist = dist.train(train)
    single = SingleTrainer(*dims, num_epoch=10, learning_rate=0.3)
    ws_single = single.train(train)

    def accuracy(ws) -> float:
        pred = ModelPredictor(MLP.serialize(ws), *dims).predict(test)
        indexed = LabelIndexTransformer(
            input_col="prediction", output_col="prediction_index"
        ).transform(pred)
        return AccuracyEvaluator("prediction_index", "label").evaluate(indexed)

    acc_dist, acc_single = accuracy(ws_dist), accuracy(ws_single)
    # 3-class problem: both must beat chance and track each other
    assert acc_single > 0.34, f"single accuracy {acc_single}"
    assert acc_dist > 0.34, f"distributed accuracy {acc_dist}"
    losses = [h["loss"] for h in dist.history]
    # Adam at this lr oscillates near the plateau — assert the best
    # loss improved on the initialization, not strict monotonicity
    assert min(losses) < losses[0]
    train.unpersist(), test.unpersist()
