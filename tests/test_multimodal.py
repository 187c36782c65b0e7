"""Multimodal column plumbing (SURVEY.md §2.J J9): decode /
feature-extract / resize / frame-sample over mapInPandas. Decode is a
deterministic fake (no codecs in this container); the Spark-side
schema, batch shape and row-count semantics are the real thing."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from dist_keras_spark.operators.multimodal import (
    attach_blob,
    fake_decode_features,
    resize_media,
    sample_frames,
)


def _docs(spark, sf_dir):
    return attach_blob(
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20),
        width=8,
        height=6,
        n_frames=5,
    )


def test_decode_features_deterministic(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = {r["doc_id"]: tuple(r["feature"]) for r in fake_decode_features(d).collect()}
    b = {r["doc_id"]: tuple(r["feature"]) for r in fake_decode_features(d).collect()}
    assert a == b and len(a) == 20
    assert all(len(v) == 8 for v in a.values())


def test_resize_shapes_and_determinism(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = resize_media(d, out_w=4, out_h=3).collect()
    assert len(out) == 20
    for r in out:
        assert (r["width"], r["height"]) == (4, 3)
        px = np.frombuffer(r["pixels"], dtype=np.float32)
        assert px.shape == (12,)
        assert np.all((px >= 0) & (px <= 1))
    again = resize_media(d, out_w=4, out_h=3).collect()
    assert {r["doc_id"]: r["pixels"] for r in out} == {
        r["doc_id"]: r["pixels"] for r in again
    }


def test_resize_identity_preserves_pixels(spark, sf_dir):
    """Resizing to the source dimensions must be the identity on the
    decoded grid (nearest-neighbor index map hits every source pixel)."""
    from dist_keras_spark.operators.multimodal import _fake_frame

    d = _docs(spark, sf_dir).limit(3)
    rows = d.select("doc_id", "blob").collect()
    out = {r["doc_id"]: r for r in resize_media(d, out_w=8, out_h=6).collect()}
    for r in rows:
        expect = _fake_frame(bytes(r["blob"]), 8, 6, 0).astype(np.float32)
        got = np.frombuffer(out[r["doc_id"]]["pixels"], dtype=np.float32).reshape(6, 8)
        np.testing.assert_array_equal(got, expect)


def test_sample_frames_row_semantics(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = sample_frames(d, every=2).collect()
    # n_frames=5, every=2 → frames 0,2,4 → 3 rows per doc
    assert len(out) == 60
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 2, 4] for v in by_doc.values())
    # distinct frames of the same doc decode differently
    one = [r for r in out if r["doc_id"] == out[0]["doc_id"]]
    assert len({tuple(r["feature"]) for r in one}) == len(one)


def test_sample_frames_respects_metadata(spark, sf_dir):
    d = attach_blob(
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(4), n_frames=1
    )
    assert sample_frames(d, every=2).count() == 4  # only frame 0
