"""pyspark.ml.Pipeline integration (north star: 'MLlib pipeline +
distributed training over DataFrame partitions', BASELINE.json).

`as_stage` lifts any engine transformer (operators/transformers.py
contract: `.transform(df) -> df`) into a pyspark.ml.Transformer, so
engine ops compose with stock MLlib stages in one Pipeline — the
reference's examples/workflow.ipynb pipeline (StringIndexer →
VectorAssembler → MinMax → OneHot → train/predict) expressed through
the framework API. `PredictorStage` closes the loop with the Arrow
batch predictor as a terminal stage.

Because every engine transformer is a pure Catalyst expression, a
PipelineModel.transform over N stages still compiles to ONE plan —
the framework API costs nothing at execution time.
"""

from __future__ import annotations

from pyspark.ml import Transformer as MLTransformer
from pyspark.sql import DataFrame


class EngineStage(MLTransformer):
    """Adapter: engine transformer → pyspark.ml.Transformer stage."""

    def __init__(self, inner) -> None:
        super().__init__()
        self._inner = inner

    def _transform(self, df: DataFrame) -> DataFrame:
        return self._inner.transform(df)


def as_stage(transformer) -> EngineStage:
    return EngineStage(transformer)


class PredictorStage(MLTransformer):
    """Terminal inference stage wrapping operators/predictors.py."""

    def __init__(
        self,
        weights: dict,
        n_in: int,
        n_hidden: int,
        n_out: int,
        features_col: str = "features",
        output_col: str = "prediction",
    ) -> None:
        super().__init__()
        from dist_keras_spark.operators.predictors import ModelPredictor

        self._predictor = ModelPredictor(
            weights, n_in, n_hidden, n_out, features_col, output_col
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return self._predictor.predict(df)
