"""Feature transformers (SURVEY.md §2.B B6-B12) — API-parity wrappers
over pure Catalyst column expressions.

The reference implements each of these as a full RDD round-trip per
operator (`dataframe.rdd.map(self._transform).toDF()`,
distkeras/transformers.py §Transformer.transform ~L30) with schema
re-inference after every step. Here each `transform` is a single
`withColumn` — chaining N transformers produces ONE Catalyst plan with
N expressions, jointly optimized, whole-stage-codegen'd, and zero
Python in the executor path.

Works on scalar columns and on `array<T>` columns (the engine-native
vector type; SURVEY.md §7.4). MLlib VectorUDT interop is at the edge:
`DenseTransformer` / `SparseTransformer`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dist_keras_spark.operators.utils import bounded_window_key


class Transformer:
    """Base: subclasses define `_expr(df) -> Column`; transform appends it.

    Mirrors distkeras/transformers.py §Transformer (~L20-35) minus the
    RDD map: one withColumn, schema statically known.
    """

    def __init__(self, input_col: str, output_col: str) -> None:
        self.input_col = input_col
        self.output_col = output_col

    def _expr(self, df: DataFrame) -> Column:
        raise NotImplementedError

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.output_col, self._expr(df))


class MinMaxTransformer(Transformer):
    """Affine rescale into [n_min, n_max] given original range [o_min, o_max].

    Parity: distkeras/transformers.py §MinMaxTransformer (~L40-80) —
    same explicit-range signature (no data pass to fit). Applies
    elementwise to array columns, directly to scalars.
    """

    def __init__(
        self,
        n_min: float,
        n_max: float,
        o_min: float,
        o_max: float,
        input_col: str = "features",
        output_col: str = "features_normalized",
    ) -> None:
        super().__init__(input_col, output_col)
        self.n_min, self.n_max = float(n_min), float(n_max)
        self.o_min, self.o_max = float(o_min), float(o_max)

    def _scale(self, x: Column) -> Column:
        scale = (self.n_max - self.n_min) / (self.o_max - self.o_min)
        return (x.cast("double") - self.o_min) * scale + self.n_min

    def _expr(self, df: DataFrame) -> Column:
        dtype = df.schema[self.input_col].dataType.typeName()
        col = F.col(self.input_col)
        if dtype == "array":
            return F.transform(col, self._scale)
        return self._scale(col)


class OneHotTransformer(Transformer):
    """Integer index → dense one-hot array<int> of length output_dim.

    Parity: distkeras/transformers.py §OneHotTransformer (~L150-180).
    Expression: transform(sequence(0, n-1), i -> int(i = x)) — no UDF,
    no OneHotEncoder fit pass.
    """

    def __init__(self, output_dim: int, input_col: str, output_col: str) -> None:
        super().__init__(input_col, output_col)
        self.output_dim = int(output_dim)

    def _expr(self, df: DataFrame) -> Column:
        idx = F.col(self.input_col).cast("int")
        return F.transform(
            F.sequence(F.lit(0), F.lit(self.output_dim - 1)),
            lambda i: (i == idx).cast("int"),
        )


class LabelIndexTransformer(Transformer):
    """Activation vector → index of max activation, as double.

    Parity: distkeras/transformers.py §LabelIndexTransformer
    (~L200-240). The reference iterates the vector in Python per row;
    here it's array_position(arr, array_max(arr)) - 1 (first max wins,
    matching the reference's `>` scan). The reference's
    activation_threshold knob is preserved: below-threshold rows get
    default_index.
    """

    def __init__(
        self,
        output_dim: int = 0,
        input_col: str = "prediction",
        output_col: str = "prediction_index",
        activation_threshold: float = 0.0,
        default_index: int = -1,
    ) -> None:
        super().__init__(input_col, output_col)
        self.output_dim = output_dim
        self.activation_threshold = float(activation_threshold)
        self.default_index = int(default_index)

    def _expr(self, df: DataFrame) -> Column:
        arr = F.col(self.input_col)
        mx = F.array_max(arr)
        idx = (F.array_position(arr, mx) - 1).cast("double")
        if self.activation_threshold > 0.0:
            return F.when(mx >= self.activation_threshold, idx).otherwise(
                F.lit(float(self.default_index))
            )
        return idx


class StringIndexTransformer(Transformer):
    """Categorical string → dense integer index (frequency order,
    ties broken lexically) — StringIndexer semantics without MLlib.

    Parity: REF-ex `pyspark.ml.feature.StringIndexer` usage in
    examples/workflow.ipynb. Two-step: a tiny distinct-count aggregate
    builds the mapping (broadcast), then a broadcast join applies it —
    no Python, no fit object, scales to any cardinality that fits a
    broadcast (beyond that, swap the join to sort-merge).
    """

    def __init__(self, input_col: str, output_col: str) -> None:
        super().__init__(input_col, output_col)

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window as W

        counts = df.groupBy(F.col(self.input_col).alias("__val")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        w = W.partitionBy(bounded_window_key(F.col("__n"))).orderBy(
            F.col("__n").desc(), F.col("__val")
        )
        mapping = counts.select(
            "__val", (F.row_number().over(w) - 1).cast("double").alias(self.output_col)
        )
        return df.join(
            F.broadcast(mapping), df[self.input_col] == mapping["__val"], "left"
        ).drop("__val")


class VectorAssembleTransformer(Transformer):
    """N numeric columns → one array<double> features column.

    Parity: REF-ex VectorAssembler (examples/workflow.ipynb), emitting
    the engine-native array<double> instead of VectorUDT.
    """

    def __init__(self, input_cols: list[str], output_col: str = "features") -> None:
        super().__init__(input_cols[0], output_col)
        self.input_cols = list(input_cols)

    def _expr(self, df: DataFrame) -> Column:
        return F.array(*[F.col(c).cast("double") for c in self.input_cols])


class DenseTransformer(Transformer):
    """MLlib Vector column → engine-native array<double>.

    Parity: distkeras/transformers.py §DenseTransformer (~L110-135),
    reinterpreted for the array-native engine: converts VectorUDT
    (sparse or dense) to array<double> via pyspark.ml.functions.
    """

    def _expr(self, df: DataFrame) -> Column:
        from pyspark.ml.functions import vector_to_array

        return vector_to_array(F.col(self.input_col))


class SparseTransformer(Transformer):
    """array<double> → MLlib Vector column (for MLlib interop, e.g.
    MinHashLSH). Parity: distkeras/transformers.py §SparseTransformer."""

    def _expr(self, df: DataFrame) -> Column:
        from pyspark.ml.functions import array_to_vector

        return array_to_vector(F.col(self.input_col))


class ReshapeTransformer(Transformer):
    """Record a target shape for a flat array column (metadata-only).

    Parity: distkeras/transformers.py §ReshapeTransformer (~L135-150).
    The reference materialized a reshaped ndarray per row; in a
    columnar engine the flat array + shape column is the storage form,
    and the actual reshape happens inside the Arrow batch at the model
    boundary (predictors/trainers reshape with numpy, zero-copy).
    """

    def __init__(self, input_col: str, output_col: str, shape: tuple[int, ...]) -> None:
        super().__init__(input_col, output_col)
        self.shape = tuple(int(s) for s in shape)

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.output_col, F.col(self.input_col)).withColumn(
            f"{self.output_col}_shape",
            F.array(*[F.lit(s) for s in self.shape]),
        )
