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


def attach_blob(
    df: DataFrame,
    text_col: str = "text",
    blob_col: str = "blob",
    width: int = 8,
    height: int = 8,
    n_frames: int = 1,
) -> DataFrame:
    """Demo media source: utf-8 bytes of the text column as the opaque
    blob + synthetic metadata (the fixtures ship no real media)."""
    return df.withColumn(blob_col, F.encode(F.col(text_col), "utf-8")).withColumn(
        f"{blob_col}_meta",
        F.struct(
            F.lit("image/fake").alias("kind"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(n_frames).alias("n_frames"),
        ),
    )


def decode_image(blob: bytes) -> np.ndarray:
    """Real decoder stub — image libraries are not in this environment."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not present in this container; "
        "use fake_decode_features for the plumbing path"
    )


def _hash_bytes(payload: bytes, n: int) -> np.ndarray:
    """`n` deterministic pseudo-random bytes via counter-mode sha256:
    digest(payload + b":0") ++ digest(payload + b":1") ++ … truncated.
    Byte k/256.0 is an exact binary fraction, so engines agree bit-for-
    bit — this is what makes the fake decoders ORACLE-REPLAYABLE in
    DuckDB (`sha256()` + hex-pair parsing), unlike an RNG stream."""
    out = bytearray()
    block = 0
    while len(out) < n:
        out += hashlib.sha256(payload + f":{block}".encode()).digest()
        block += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8)


def _fake_pixels(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in decode: sha256 byte-map pseudo-pixels in
    [0, 1). SQL replay (dim<=32): byte i of sha256(text || ':0') / 256."""
    return _hash_bytes(blob, dim) / 256.0


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


def _fake_frame(blob: bytes, w: int, h: int, frame: int) -> np.ndarray:
    """Deterministic stand-in decode of ONE frame to an h×w pixel grid.
    SQL replay (w*h<=32): byte i of sha256(text || ':' || frame || ':0')
    / 256 — the frame index rides in the hash payload as ASCII so
    DuckDB can rebuild it with VARCHAR concat (its sha256 is
    VARCHAR-only; NUL-byte payloads would be unrepresentable)."""
    return (_hash_bytes(blob + f":{frame}".encode(), w * h) / 256.0).reshape(h, w)


def resize_media(
    df: DataFrame,
    blob_col: str = "blob",
    meta_col: str | None = None,
    id_col: str = "doc_id",
    out_w: int = 4,
    out_h: int = 4,
) -> DataFrame:
    """J9 resize: decode → nearest-neighbor resample → re-encode.

    The RESIZE math is real (numpy index-mapped nearest-neighbor over
    the pixel grid — swap for cv2/PIL interpolation by replacing one
    line); only the decode of the fake blob is the stand-in. Output is
    the production shape: resized pixels as a binary column (float32
    row-major) plus the new dimensions, one row per input row.
    """
    meta_col = meta_col or f"{blob_col}_meta"
    schema = f"{id_col} long, pixels binary, width int, height int"

    def run(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            out_px = []
            for blob, meta in zip(pdf[blob_col], pdf["__w_h"]):
                w, h = int(meta[0]), int(meta[1])
                px = _fake_frame(blob, w, h, 0)
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                resized = px[np.ix_(rows, cols)]
                out_px.append(resized.astype(np.float32).tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pixels": out_px,
                    "width": np.full(len(pdf), out_w, dtype="int32"),
                    "height": np.full(len(pdf), out_h, dtype="int32"),
                }
            )

    prepped = df.select(
        id_col,
        blob_col,
        F.array(f"{meta_col}.width", f"{meta_col}.height").alias("__w_h"),
    )
    return prepped.mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    blob_col: str = "blob",
    meta_col: str | None = None,
    id_col: str = "doc_id",
    every: int = 2,
    dim: int = 8,
) -> DataFrame:
    """J9 frame sampling: one output row per kept frame (indices
    0, every, 2·every, … below the metadata's n_frames) with a
    per-frame feature vector — the mapInPandas batch loop emits a
    DIFFERENT row count than its input, the shape a video pipeline
    needs. Deterministic fake per-frame decode; real codecs drop into
    `_fake_frame`."""
    meta_col = meta_col or f"{blob_col}_meta"
    schema = f"{id_col} long, frame_idx int, feature array<double>"

    def run(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            ids, fidx, feats = [], [], []
            for rid, blob, nf in zip(pdf[id_col], pdf[blob_col], pdf["__nf"]):
                for fi in range(0, int(nf), every):
                    ids.append(rid)
                    fidx.append(fi)
                    feats.append(_fake_frame(blob, dim, 1, fi)[0])
            yield pd.DataFrame({id_col: ids, "frame_idx": fidx, "feature": feats})

    prepped = df.select(id_col, blob_col, F.col(f"{meta_col}.n_frames").alias("__nf"))
    return prepped.mapInPandas(run, schema)


def fake_audio_samples(blob: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in audio decode: n int8-centered PCM
    samples, sample i = sha256-stream byte i − 128 ∈ [−128, 127].
    SQL replay: byte i lives in counter block i div 32 at hex pair
    i mod 32 — ('0x' || substr(sha256(text || ':' || (i//32)),
    2·(i mod 32)+1, 2))::INT − 128. Integer-valued, so frame energies
    are EXACT integers cross-engine (no /256 fraction needed)."""
    return _hash_bytes(blob, n).astype(np.int64) - 128


def fake_audio_frame_energy(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    n_samples: int = 64,
    frame: int = 16,
) -> DataFrame:
    """mapInPandas audio decode → per-frame energy Σ sample² (int64).

    Arrow batches in, static output schema, vectorized numpy per
    batch — the production shape for an audio feature extractor; only
    the decoder is a stand-in (a real one returns PCM from the codec;
    everything downstream is unchanged)."""
    n_frames = n_samples // frame
    schema = f"{id_col} long, n_samples int, energy array<long>"

    def run(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            blobs = pdf[blob_col]
            mats = np.stack(
                [fake_audio_samples(b, n_samples) for b in blobs]
            ) if len(blobs) else np.zeros((0, n_samples), dtype=np.int64)
            energy = (mats.reshape(-1, n_frames, frame) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_samples": np.full(len(blobs), n_samples, dtype="int32"),
                    "energy": list(energy),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def fake_video_frames(blob: bytes, n_frames: int, frame_px: int) -> np.ndarray:
    """Deterministic stand-in video decode: (n_frames, frame_px) int
    pixels 0..255 from the counter-mode sha256 stream — frame t pixel
    j is stream byte t·frame_px + j, so the SQL replay indexes the
    same flat byte stream the audio decoder documents. A real codec
    (pyav/opencv, absent from this container) is a drop-in returning
    decoded frames; every downstream stat is unchanged."""
    flat = _hash_bytes(blob, n_frames * frame_px).astype(np.int64)
    return flat.reshape(n_frames, frame_px)


def fake_video_frame_stats(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    n_frames: int = 8,
    frame_px: int = 16,
    stride: int = 2,
) -> DataFrame:
    """mapInPandas video decode → FRAME-SAMPLED per-frame stats.

    The video-pipeline shape: decode once per blob inside the Arrow
    batch, keep every `stride`-th frame (temporal subsampling — the
    standard cost lever: a 1 fps sample of 30 fps video is 30× less
    tensor traffic), emit one ROW per sampled frame with exact int64
    stats: pixel sum / min / max and the motion proxy Σ|pₜ − pₜ₋ₛ|
    against the previous SAMPLED frame (0 for the first). Row-per-
    frame output is what a downstream frame-level trainer or
    similarity index joins on — the explode happens at decode time,
    never by shuffling raw blobs."""
    schema = (
        f"{id_col} long, frame_idx int, pixel_sum long, pixel_min long,"
        " pixel_max long, motion long"
    )
    sampled = list(range(0, n_frames, stride))

    def run(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            ids, fidx, psum, pmin, pmax, motion = [], [], [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                frames = fake_video_frames(blob, n_frames, frame_px)
                prev = None
                for t in sampled:
                    f = frames[t]
                    ids.append(rid)
                    fidx.append(t)
                    psum.append(int(f.sum()))
                    pmin.append(int(f.min()))
                    pmax.append(int(f.max()))
                    motion.append(
                        0 if prev is None else int(np.abs(f - prev).sum())
                    )
                    prev = f
            yield pd.DataFrame(
                {
                    id_col: np.array(ids, dtype=np.int64),
                    "frame_idx": np.array(fidx, dtype=np.int32),
                    "pixel_sum": np.array(psum, dtype=np.int64),
                    "pixel_min": np.array(pmin, dtype=np.int64),
                    "pixel_max": np.array(pmax, dtype=np.int64),
                    "motion": np.array(motion, dtype=np.int64),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)
