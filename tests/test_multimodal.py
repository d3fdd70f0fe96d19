"""Multimodal plumbing: real image feature/resize path, stub audio/video."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from ndto_spark import codecs, fixtures, multimodal


@pytest.fixture(scope="module")
def images_df(spark):
    return fixtures.synth_images(spark, 60, n_partitions=2, seed=42).cache()


def test_decode_image_features(spark, images_df):
    feats = multimodal.decode_image_features(images_df).collect()
    assert len(feats) == 60
    ok = [f for f in feats if f.ok]
    bad = [f for f in feats if not f.ok]
    assert len(bad) == 1  # row 0: corrupted bytes class
    f1 = next(f for f in ok if f.image_id == fixtures.image_id_str(42, 1))
    px = fixtures.image_pixels(42, 1)
    assert (f1.h, f1.w) == px.shape[:2]


def test_resize_images_roundtrip(spark, images_df):
    out = multimodal.resize_images(images_df, 8, 8).collect()
    assert len(out) == 59  # corrupt row dropped
    for r in out[:5]:
        _, px = codecs.decode(bytes(r.bytes))
        assert px.shape == (8, 8, 3)


def test_audio_stub_features(spark):
    import pandas as pd

    pcm = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype("<i2").tobytes()
    df = spark.createDataFrame([("a", bytearray(pcm))], "clip_id string, bytes binary")
    row = multimodal.extract_audio_features(df).collect()[0]
    assert row.ok and row.n_samples == 1000 and 0 < row.rms < row.peak <= 1.0


def test_audio_strict_raises(spark):
    df = spark.createDataFrame([("a", bytearray(b"xx"))], "clip_id string, bytes binary")
    with pytest.raises(Exception, match="NotImplementedError|audio"):
        multimodal.extract_audio_features(df, strict=True).collect()


def test_video_frame_sampling(spark):
    frames = [
        codecs.png_encode(fixtures.image_pixels(42, i)) for i in range(25)
    ]
    blob = b"".join(struct.pack(">I", len(f)) + f for f in frames)
    df = spark.createDataFrame(
        [("v1", bytearray(blob))], "clip_id string, bytes binary"
    )
    out = multimodal.sample_video_frames(df, every_n=10).collect()
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 10, 20]
    _, px = codecs.decode(bytes(out[0].frame_png))
    assert px.ndim == 3
