"""Feature-transformer queries (SURVEY.md §2.B B6-B12) — each runs the
actual operator class from operators/transformers.py so the DuckDB
oracle differentially checks the operator implementation, not a copy
of its formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_keras_spark.operators.transformers import (
    DenseTransformer,
    LabelIndexTransformer,
    MinMaxTransformer,
    OneHotTransformer,
    SparseTransformer,
    StringIndexTransformer,
    VectorAssembleTransformer,
)
from dist_keras_spark.plans.registry import query
from dist_keras_spark.sources.tables import load_table as _lt

# Render a double as a fixed-point string identically in both engines.
_DEC = "decimal(18,4)"


def _dec_str(c: F.Column) -> F.Column:
    return F.round(c.cast("double"), 4).cast(_DEC).cast("string")


@query(
    "feature_minmax",
    oracle="""
SELECT vec_id,
       array_to_string(
         list_transform(embedding[1:3],
           x -> CAST(CAST(round((CAST(x AS DOUBLE) - (-1.0)) * 0.5 + 0.0, 4)
                          AS DECIMAL(18,4)) AS VARCHAR)), ',') AS first3_norm
FROM embeddings
""",
)
def feature_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 (REF distkeras/transformers.py §MinMaxTransformer ~L40-80):
    rescale [-1,1] → [0,1] elementwise over the embedding array."""
    e = _lt(spark, sf_dir, "embeddings")
    t = MinMaxTransformer(0.0, 1.0, -1.0, 1.0, "embedding", "emb_norm")
    out = t.transform(e)
    return out.select(
        "vec_id",
        F.array_join(
            F.transform(F.slice("emb_norm", 1, 3), _dec_str), ","
        ).alias("first3_norm"),
    )


@query(
    "feature_one_hot",
    oracle="""
SELECT c_custkey,
       array_to_string(
         list_transform(range(0, 25), i -> CAST(i = c_nationkey AS INT)), ',')
           AS nation_onehot
FROM customer
""",
)
def feature_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 (REF §OneHotTransformer ~L150-180): nationkey → 25-dim one-hot."""
    c = _lt(spark, sf_dir, "customer")
    t = OneHotTransformer(25, "c_nationkey", "oh")
    out = t.transform(c)
    return out.select(
        "c_custkey",
        F.array_join(F.transform("oh", lambda x: x.cast("string")), ",").alias(
            "nation_onehot"
        ),
    )


@query(
    "feature_label_index",
    oracle="""
SELECT vec_id,
       CAST(list_position(embedding, list_max(embedding)) - 1 AS DOUBLE)
           AS argmax_free,
       CASE WHEN list_max(embedding) >= 0.3
            THEN CAST(list_position(embedding, list_max(embedding)) - 1 AS DOUBLE)
            ELSE -1.0 END AS argmax_thresh
FROM embeddings
""",
)
def feature_label_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 (REF §LabelIndexTransformer ~L200-240): argmax of the
    activation vector; thresholded variant falls back to default -1."""
    e = _lt(spark, sf_dir, "embeddings")
    free = LabelIndexTransformer(input_col="embedding", output_col="argmax_free")
    thr = LabelIndexTransformer(
        input_col="embedding",
        output_col="argmax_thresh",
        activation_threshold=0.3,
        default_index=-1,
    )
    return thr.transform(free.transform(e)).select(
        "vec_id", "argmax_free", "argmax_thresh"
    )


@query(
    "feature_string_index",
    oracle="""
WITH counts AS (SELECT lang AS v, count(*) AS n FROM documents GROUP BY 1),
ranked AS (SELECT v, CAST(row_number() OVER (ORDER BY n DESC, v) - 1 AS DOUBLE)
                    AS lang_index
           FROM counts)
SELECT doc_id, lang, lang_index
FROM documents JOIN ranked ON lang = ranked.v
""",
)
def feature_string_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 (REF-ex StringIndexer in examples/workflow.ipynb): frequency-
    ordered label encoding via broadcast mapping join."""
    d = _lt(spark, sf_dir, "documents")
    t = StringIndexTransformer("lang", "lang_index")
    return t.transform(d).select("doc_id", "lang", "lang_index")


@query(
    "feature_vector_assemble",
    oracle="""
SELECT c_custkey,
       array_to_string(
         list_transform([c_acctbal, CAST(c_nationkey AS DOUBLE),
                         CAST(c_custkey AS DOUBLE)],
           x -> CAST(CAST(round(x, 4) AS DECIMAL(18,4)) AS VARCHAR)), ',')
           AS features_str
FROM customer
""",
)
def feature_vector_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 (REF-ex VectorAssembler): numeric columns → array<double>."""
    c = _lt(spark, sf_dir, "customer")
    t = VectorAssembleTransformer(["c_acctbal", "c_nationkey", "c_custkey"], "features")
    return t.transform(c).select(
        "c_custkey",
        F.array_join(F.transform("features", _dec_str), ",").alias("features_str"),
    )


@query(
    "feature_onehot_argmax_identity",
    oracle="""
SELECT vec_id, label,
       CAST(list_position(lt, list_max(lt)) - 1 AS DOUBLE) AS oh_argmax,
       CAST(CAST(list_position(lt, list_max(lt)) - 1 AS INT) = label AS INT)
           AS roundtrip_ok
FROM (SELECT vec_id, label,
             list_transform(range(0, 10), i -> CAST(i = label AS INT)) AS lt
      FROM embeddings)
""",
)
def feature_onehot_argmax_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7∘B8 identity: one_hot(label) then argmax == label — the
    transformer-chain property the reference's pipelines rely on,
    compiled to a single projection."""
    e = _lt(spark, sf_dir, "embeddings")
    chained = LabelIndexTransformer(input_col="oh", output_col="oh_argmax").transform(
        OneHotTransformer(10, "label", "oh").transform(e)
    )
    return chained.select(
        "vec_id",
        "label",
        "oh_argmax",
        (F.col("oh_argmax").cast("int") == F.col("label")).cast("int").alias(
            "roundtrip_ok"
        ),
    )


@query(
    "feature_vector_roundtrip",
    oracle="SELECT vec_id, CAST(1 AS INT) AS roundtrip_ok FROM embeddings",
)
def feature_vector_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 (REF §DenseTransformer/§SparseTransformer ~L110-135): MLlib
    VectorUDT round-trip — array → Vector → array preserves values
    exactly. The Spark side really does the conversions; the oracle
    asserts the identity."""
    e = _lt(spark, sf_dir, "embeddings")
    as_vec = SparseTransformer("embedding", "vec").transform(e)
    back = DenseTransformer("vec", "emb_back").transform(as_vec)
    return back.select(
        "vec_id",
        (
            F.col("emb_back")
            == F.transform("embedding", lambda x: x.cast("double"))
        ).cast("int").alias("roundtrip_ok"),
    )


@query(
    "feature_reshape",
    oracle="""
SELECT vec_id,
       array_to_string(
           list_transform(embedding,
                          x -> CAST(CAST(round(CAST(x AS DOUBLE), 4)
                                         AS DECIMAL(10,4)) AS VARCHAR)), ',')
           AS image_csv,
       8 AS d0, 8 AS d1
FROM embeddings
""",
)
def feature_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 hash-verified: ReshapeTransformer records the target shape
    (8×8) for the flat 64-dim embedding — metadata-only in a columnar
    engine (the actual reshape is a zero-copy numpy view inside the
    Arrow batch at the model boundary, see ConvNet1D/trainers). The
    values must pass through untouched and the shape columns must be
    the declared literals.

    The pass-through values are serialized per the repo's array
    convention (round→decimal→string, see scalar_array_funcs) — a raw
    array<float> column crashes the driver canonicalizer
    (CORRECTNESS_r03: unhashable type 'list')."""
    from dist_keras_spark.operators.transformers import ReshapeTransformer

    e = _lt(spark, sf_dir, "embeddings")
    out = ReshapeTransformer("embedding", "image", (8, 8)).transform(e)
    return out.select(
        "vec_id",
        F.array_join(
            F.transform(
                "image",
                lambda x: F.round(x.cast("double"), 4).cast("decimal(10,4)").cast("string"),
            ),
            ",",
        ).alias("image_csv"),
        F.element_at("image_shape", 1).alias("d0"),
        F.element_at("image_shape", 2).alias("d1"),
    )
