"""Evaluation (SURVEY.md §2.D D1).

Reference: distkeras/evaluators.py §AccuracyEvaluator (~L30-60) — an
RDD map to 0/1 followed by mean(), a third full pass over the data
after predict + transform. Here it's a single JVM aggregate that
fuses into whatever plan produced the prediction column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class AccuracyEvaluator:
    """Fraction of rows where prediction == label.

    If `prediction_col` holds a probability vector, set `argmax=True`
    to compare its argmax (LabelIndexTransformer semantics) instead.
    """

    def __init__(
        self, prediction_col: str = "prediction", label_col: str = "label", argmax: bool = False
    ) -> None:
        self.prediction_col = prediction_col
        self.label_col = label_col
        self.argmax = argmax

    def evaluate(self, df: DataFrame) -> float:
        pred = F.col(self.prediction_col)
        if self.argmax:
            pred = (F.array_position(pred, F.array_max(pred)) - 1).cast("double")
        acc = df.select(
            F.avg((pred.cast("double") == F.col(self.label_col).cast("double")).cast("double")).alias("acc")
        ).collect()[0]["acc"]
        return float(acc) if acc is not None else 0.0
