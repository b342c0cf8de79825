"""Multimodal plumbing + reference image-math parity tests.

The numeric ops mirror the reference's semantics exactly
(conversion.rs / normalize.rs / data_augment.py color jitter); decode
itself is stubbed (no codecs in this container) but the Spark-side
plumbing — binary column, Arrow batches, schema — is exercised for
real.
"""

from __future__ import annotations

import numpy as np
import pytest

from piper_spark.sources.multimodal import (
    color_jitter,
    decode_image,
    fake_decode_meta,
    normalize_imagenet,
    scale_u8_to_f32,
    with_payload,
)


def test_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_fake_decode_meta_deterministic():
    assert fake_decode_meta(b"abc") == fake_decode_meta(b"abc") == (4, 4, 3)


def test_scale_and_normalize_match_reference_constants():
    img = np.full((2, 2, 3), 255, dtype=np.uint8)
    scaled = scale_u8_to_f32(img)
    assert scaled.dtype == np.float32 and scaled.max() == 1.0
    normed = normalize_imagenet(scaled)
    # channel 0: (1 - 0.485) / 0.229  (ImageNet stats, normalize.rs:8-15)
    assert abs(normed[0, 0, 0] - (1 - 0.485) / 0.229) < 1e-6


def test_color_jitter_clamps_like_reference():
    img = np.array([[[0, 128, 250]]], dtype=np.uint8)
    out = color_jitter(img)
    # x*1.2 + 10, clamped to u8 (data_augment.py:21-22)
    assert out.tolist() == [[[10, 164, 255]]]
    assert out.dtype == np.uint8


def test_payload_column_roundtrip(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    row = with_payload(df).collect()[0]
    assert bytes(row.payload) == b"hello"


def test_mapinpandas_batches_are_columnar(spark):
    """The mapInPandas path sees Arrow batches, not pickled Rows."""
    from piper_spark.sources.multimodal import img_meta

    out = img_meta(spark, "/root/testdata/sf0.001").limit(5).collect()
    assert len(out) == 5
    for r in out:
        assert r.width == 1 + r.n_bytes % 64
        assert r.height == 1 + r.n_bytes % 48
