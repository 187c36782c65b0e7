"""pyspark.ml.Pipeline composition of engine stages + stock MLlib
stages — the reference's workflow.ipynb pipeline shape end-to-end."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.ml import Pipeline
from pyspark.ml.feature import SQLTransformer

from dist_keras_spark.operators.ml_pipeline import PredictorStage, as_stage
from dist_keras_spark.operators.models import MLP
from dist_keras_spark.operators.transformers import (
    LabelIndexTransformer,
    MinMaxTransformer,
    OneHotTransformer,
    VectorAssembleTransformer,
)


def test_full_pipeline_composes_engine_and_mllib_stages(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pipe = Pipeline(
        stages=[
            # stock MLlib stage
            SQLTransformer(
                statement="SELECT *, c_acctbal * 2 AS bal2 FROM __THIS__"
            ),
            # engine stages lifted into the framework
            as_stage(VectorAssembleTransformer(["c_acctbal", "bal2"], "features")),
            # bounds cover both assembled features: acctbal ∈ [-847, 9917],
            # bal2 = 2×acctbal ∈ [-1694, 19833]
            as_stage(MinMaxTransformer(0, 1, -2000, 20000, "features", "features_norm")),
            as_stage(OneHotTransformer(25, "c_nationkey", "nation_oh")),
            as_stage(LabelIndexTransformer(input_col="nation_oh", output_col="nation_back")),
        ]
    )
    model = pipe.fit(c)
    out = model.transform(c)
    rows = out.select("c_custkey", "c_nationkey", "nation_back", "features_norm").collect()
    assert all(r["nation_back"] == float(r["c_nationkey"]) for r in rows)
    assert all(0 <= v <= 1 for r in rows for v in r["features_norm"])


def test_pipeline_with_predictor_stage(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dims = (64, 16, 10)
    model = MLP(*dims)
    pipe = Pipeline(
        stages=[
            as_stage(MinMaxTransformer(0, 1, -1, 1, "embedding", "features")),
            PredictorStage(MLP.serialize(model.get_weights()), *dims),
            as_stage(LabelIndexTransformer(input_col="prediction", output_col="pred_class")),
        ]
    )
    out = pipe.fit(e).transform(e)
    rows = out.select("vec_id", "prediction", "pred_class").limit(5).collect()
    assert all(len(r["prediction"]) == 10 for r in rows)
    assert all(0 <= r["pred_class"] <= 9 for r in rows)


def test_pipeline_of_expressions_is_one_plan(spark, sf_dir):
    """N engine stages must not add N execution boundaries — the
    composed transform is a single Project over the scan."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pipe = Pipeline(
        stages=[
            as_stage(VectorAssembleTransformer(["c_acctbal"], "f1")),
            as_stage(MinMaxTransformer(0, 1, 0, 1000, "f1", "f2")),
            as_stage(OneHotTransformer(25, "c_nationkey", "f3")),
        ]
    )
    out = pipe.fit(c).transform(c)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "pure-expression pipeline must not shuffle"
