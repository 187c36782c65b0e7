"""MLlib-backed approximate similarity (SURVEY.md §2.J J2/J5 alt path).

The custom operators in dedup.py/similarity.py are the engine-native
path (pure expressions, cross-engine verifiable). These wrappers
expose the SAME surfaces through MLlib's MinHashLSH /
BucketedRandomProjectionLSH (`approxSimilarityJoin` /
`approxNearestNeighbors`) for users standardized on ML Pipelines —
conversion at the VectorUDT boundary only (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dist_keras_spark.functions.text import shingles, tokens


def mllib_minhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hash_tables: int = 8,
    jaccard_distance: float = 0.2,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH over hashed shingle sets.

    Returns (id_a, id_b, jaccard_dist) with id_a < id_b. HashingTF
    vectorizes the shingle set (sparse, fixed dim — no vocabulary
    pass); approxSimilarityJoin prunes via OR-amplified hash tables.
    """
    sets = df.select(
        F.col(id_col).alias("id"),
        shingles(tokens(F.col(text_col)), n=n, distinct=True).alias("sh"),
    ).filter(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(sets)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, jaccard_distance, distCol="jdist")
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round("jdist", 4).alias("jaccard_dist"),
        )
    )


def mllib_knn(
    corpus: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Top-k by euclidean distance via BucketedRandomProjectionLSH
    approxNearestNeighbors (single query vector, MLlib contract)."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    feats = corpus.select(
        F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feats)
    return model.approxNearestNeighbors(feats, Vectors.dense(query_vec), k).select(
        "id", F.round("distCol", 4).alias("dist")
    )
