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
    ) -> None:
        self.weights = weights
        self.dims = (n_in, n_hidden, n_out)
        self.features_col = features_col
        self.output_col = output_col

    def predict(self, df: DataFrame) -> DataFrame:
        weights, dims = self.weights, self.dims

        @F.pandas_udf(ArrayType(DoubleType()))
        def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            # deserialize once per partition, not per row/batch
            from dist_keras_spark.operators.models import MLP

            model = MLP(*dims)
            model.set_weights(MLP.deserialize(weights))
            for s in batches:
                x = np.stack(s.to_numpy())
                p = model.forward(x)
                yield pd.Series(list(p))

        return df.withColumn(self.output_col, score(F.col(self.features_col)))
