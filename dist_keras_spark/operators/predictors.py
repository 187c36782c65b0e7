"""Batched model inference (SURVEY.md §2.I I9).

Reference: distkeras/predictors.py §ModelPredictor.predict (~L40-90) —
`df.rdd.map(self._predict).toDF()`, i.e. per-ROW pickle round-trip and
`model.predict` with batch size 1, schema re-inferred afterwards.

Here: one Arrow-vectorized pandas UDF with iterator binding — the
model deserializes ONCE per partition, scores whole Arrow batches,
and the output schema is static (`array<double>`). ~100-1000× less
Python overhead per the reference's own anti-pattern analysis
(SURVEY.md §4.1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


class ModelPredictor:
    """Appends per-row class-probability vectors from a broadcastable
    weights dict (operators/models.py contract)."""

    def __init__(
        self,
        weights: dict,
        n_in: int,
        n_hidden: int,
        n_out: int,
        features_col: str = "features",
        output_col: str = "prediction",
        model_factory=None,
    ) -> None:
        self.weights = weights
        self.dims = (n_in, n_hidden, n_out)
        self.features_col = features_col
        self.output_col = output_col
        # pluggable model contract (same as trainers.Trainer): any
        # zero-arg callable whose result honors forward/set_weights.
        self.model_factory = model_factory

    def predict(self, df: DataFrame) -> DataFrame:
        weights, dims, factory = self.weights, self.dims, self.model_factory

        @F.pandas_udf(ArrayType(DoubleType()))
        def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            # deserialize once per partition, not per row/batch
            from dist_keras_spark.operators.models import MLP

            model = factory() if factory is not None else MLP(*dims)
            # decode the payload with the constructed model's OWN class:
            # a factory model with its own serialization format must not
            # be routed through MLP.deserialize
            model.set_weights(type(model).deserialize(weights))
            for s in batches:
                x = np.stack(s.to_numpy())
                p = model.forward(x)
                yield pd.Series(list(p))

        return df.withColumn(self.output_col, score(F.col(self.features_col)))


def predict_with_batch_udf(
    df: DataFrame,
    weights: dict,
    n_in: int,
    n_hidden: int,
    n_out: int,
    features_col: str = "features",
    output_col: str = "prediction",
    batch_size: int = 1024,
) -> DataFrame:
    """I9 via `pyspark.ml.functions.predict_batch_udf` (Spark 3.4+) —
    the framework-blessed inference API: Spark manages model caching
    per python worker and batch sizing. Same contract as
    ModelPredictor; preferred when serving real DL frameworks since
    the make_predict_fn closure can hold GPU state."""
    import numpy as np
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql.types import ArrayType, DoubleType

    def make_predict_fn():
        from dist_keras_spark.operators.models import MLP

        model = MLP(n_in, n_hidden, n_out)
        model.set_weights(MLP.deserialize(weights))

        def predict(inputs: np.ndarray) -> np.ndarray:
            return model.forward(np.asarray(inputs, dtype=np.float64))

        return predict

    udf = predict_batch_udf(
        make_predict_fn,
        return_type=ArrayType(DoubleType()),
        batch_size=batch_size,
        input_tensor_shapes=[[n_in]],
    )
    return df.withColumn(output_col, udf(F.col(features_col)))
