"""Multimodal column plumbing (SURVEY.md §2.J J9, north star).

Pattern: media lives as an opaque `binary` column with a typed
metadata struct beside it; decode / feature-extract / resize /
frame-sample run as Arrow-batched functions over `mapInPandas`.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so `decode_image` raises NotImplementedError by design; the
*deterministic fake* path (`fake_decode_features`) exercises the real
Spark plumbing — schema, batch shape, partitioning — end to end and
is what tests assert on. Swapping in a real codec touches only the
inner numpy function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Metadata contract for a media column.
MEDIA_META_SCHEMA = "struct<kind string, width int, height int, n_frames int>"


def attach_blob(df: DataFrame, text_col: str = "text", blob_col: str = "blob") -> DataFrame:
    """Demo media source: utf-8 bytes of the text column as the opaque
    blob + synthetic metadata (the fixtures ship no real media)."""
    return df.withColumn(blob_col, F.encode(F.col(text_col), "utf-8")).withColumn(
        f"{blob_col}_meta",
        F.struct(
            F.lit("image/fake").alias("kind"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(1).alias("n_frames"),
        ),
    )


def decode_image(blob: bytes) -> np.ndarray:
    """Real decoder stub — image libraries are not in this environment."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not present in this container; "
        "use fake_decode_features for the plumbing path"
    )


def _fake_pixels(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in decode: sha256-seeded pseudo-pixels."""
    h = hashlib.sha256(blob).digest()
    seed = int.from_bytes(h[:4], "big")
    return np.random.RandomState(seed).rand(dim)


def fake_decode_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    dim: int = 8,
) -> DataFrame:
    """mapInPandas decode → fixed-dim feature vector per blob.

    The Spark side is production-shaped: Arrow batches in, explicit
    static output schema, no per-row Python calls outside the batch
    loop. Only `_fake_pixels` is a stand-in.
    """
    schema = f"{id_col} long, n_bytes int, feature array<double>"

    def run(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            blobs = pdf[blob_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "feature": [ _fake_pixels(b, dim) for b in blobs ],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)
