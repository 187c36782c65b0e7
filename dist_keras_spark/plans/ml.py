"""ML training / inference / evaluation queries (SURVEY.md §2.I).

Training queries return their round-by-round history as a DataFrame
(rows-only driver check — iterative training isn't SQL); the linear
scorer is fully SQL-expressible and carries a sharp oracle, proving
the inference arithmetic end-to-end. Convergence itself is gated in
tests/test_ml.py (distributed-vs-single parity, SURVEY.md §5.2.6).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_keras_spark.operators.evaluators import AccuracyEvaluator
from dist_keras_spark.operators.models import MLP
from dist_keras_spark.operators.predictors import ModelPredictor
from dist_keras_spark.operators.trainers import (
    AveragingTrainer,
    SingleTrainer,
    SyncDistributedTrainer,
)
from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt

_DIMS = (64, 32, 10)  # embeddings: dim 64 → 10 classes


def _train_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lt(spark, sf_dir, "embeddings").select(
        F.col("embedding").alias("features"), F.col("label").alias("label")
    )


@query("ml_train_single")
def ml_train_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1: sequential baseline trainer; returns per-epoch loss history."""
    t = SingleTrainer(*_DIMS, num_epoch=3, batch_size=32, learning_rate=0.1)
    t.train(_train_df(spark, sf_dir))
    return spark.createDataFrame(
        [(h["epoch"], float(round(h["loss"], 6))) for h in t.history],
        "epoch int, loss double",
    )


@query("ml_train_averaging")
def ml_train_averaging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3: per-shard training + n-weighted weight averaging; returns
    per-shard loss rows plus the averaged-model accuracy."""
    t = AveragingTrainer(*_DIMS, num_models=4, num_epoch=2)
    ws = t.train(_train_df(spark, sf_dir))
    pred = ModelPredictor(MLP.serialize(ws), *_DIMS).predict(_train_df(spark, sf_dir))
    acc = AccuracyEvaluator(argmax=True).evaluate(pred)
    rows = [(int(h["part_id"]), float(round(h["loss"], 6)), float(round(acc, 4))) for h in t.history]
    return spark.createDataFrame(rows, "part_id int, shard_loss double, avg_model_acc double")


@query("ml_train_distributed_adag")
def ml_train_distributed_adag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4-I8 capability: synchronous data-parallel rounds with the
    ADAG-mode (Adam-style) center optimizer; returns loss per round —
    the driver checks it runs and yields monotone-ish history rows."""
    t = SyncDistributedTrainer(
        *_DIMS, mode="adag", num_workers=8, rounds=8, learning_rate=0.05
    )
    t.train(_train_df(spark, sf_dir))
    return spark.createDataFrame(
        [(h["round"], float(round(h["loss"], 6))) for h in t.history],
        "round int, loss double",
    )


@query("ml_train_elastic_easgd")
def ml_train_elastic_easgd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5/I6 capability: elastic averaging (easgd mode) with the
    default multi-step local-SGD window — per-partition local models
    drift for communication_window steps, then the center absorbs
    rho-weighted movement. Returns center loss per round plus the
    averaged history (I12 `get_averaged_history` parity helper)."""
    t = SyncDistributedTrainer(
        *_DIMS, mode="easgd", num_workers=8, rounds=8, learning_rate=0.1
    )
    t.train(_train_df(spark, sf_dir))
    avg = float(round(t.get_averaged_history("loss"), 6))
    return spark.createDataFrame(
        [(h["round"], float(round(h["loss"], 6)), avg) for h in t.history],
        "round int, loss double, avg_loss double",
    )


@query("ml_predict_eval")
def ml_predict_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I9+D1: train briefly, batch-predict with the Arrow predictor,
    evaluate accuracy — the full reference pipeline (train → predict →
    LabelIndex → accuracy) as two jobs instead of four RDD passes."""
    df = _train_df(spark, sf_dir)
    tr = SingleTrainer(*_DIMS, num_epoch=5, batch_size=32, learning_rate=0.3)
    ws = tr.train(df)
    pred = ModelPredictor(MLP.serialize(ws), *_DIMS).predict(df)
    acc = AccuracyEvaluator(argmax=True).evaluate(pred)
    n = df.count()
    return spark.createDataFrame(
        [(float(round(acc, 4)), int(n))], "accuracy double, n bigint"
    )


# ---------------------------------------------------------------------------
# Oracle-checked inference arithmetic: fixed-weight logistic scorer.
# ---------------------------------------------------------------------------

_W = np.random.RandomState(7).randn(64).tolist()
_B = -0.05


@query(
    "ml_linear_scorer",
    oracle=f"""
SELECT vec_id,
       round(1.0 / (1.0 + exp(-(list_sum(list_transform(range(1, 65),
             i -> CAST(embedding[i] AS DOUBLE) * ([{", ".join(repr(w) for w in _W)}])[i]))
             + ({_B!r})))), 6) AS score,
       CAST(round(1.0 / (1.0 + exp(-(list_sum(list_transform(range(1, 65),
             i -> CAST(embedding[i] AS DOUBLE) * ([{", ".join(repr(w) for w in _W)}])[i]))
             + ({_B!r})))), 6) > 0.5 AS INT) AS pred
FROM embeddings
""",
)
def ml_linear_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I9 arithmetic parity: a fixed-weight logistic model scored as a
    pure column expression (the JVM fast path for linear/shallow
    models — no Python at all). The identical literal weights live in
    the DuckDB oracle, so the driver verifies the dot-product,
    sigmoid, and thresholding bit-for-bit (at 6dp)."""
    e = _lt(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(float(x)) for x in _W])
    z = (
        F.aggregate(
            F.zip_with("embedding", w, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        + F.lit(_B)
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return e.select(
        "vec_id", score.alias("score"), (score > 0.5).cast("int").alias("pred")
    )
