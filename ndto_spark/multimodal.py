"""Multimodal column plumbing: image / audio / video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema contracts, Arrow batch shapes, iterator
UDF signatures, partition sizing — is real and tested. The media decoding
itself is environment-gated: this container has no image/audio/video
libraries, so decode steps either use the pure-Python codecs (images, real)
or a clearly-marked deterministic STUB (audio/video), switched to the real
library via import-try when available (see codecs.HAVE_PIL pattern).

Operators:
- ``decode_image_features``: mapInPandas over image bytes → per-image
  feature rows (w, h, mean RGB, phash) using the real pure codec.
- ``resize_images``: batch resize (nearest-neighbor, pure numpy — real).
- ``sample_video_frames`` / ``extract_audio_features``: plumbing-complete
  STUBS — deterministic fake decoders with honest schemas, raising
  NotImplementedError when ``strict=True``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import codecs

IMAGE_FEATURES_SCHEMA = (
    "image_id string, ok boolean, w int, h int, mean_r double, mean_g double, "
    "mean_b double, phash bigint"
)


def decode_image_features(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Arrow-batched image feature extraction (REAL decode, pure codec)."""
    import pandas as pd

    from .fixtures import phash_of

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for iid, payload in zip(pdf[id_col], pdf["bytes"]):
                try:
                    _, px = codecs.decode(bytes(payload))
                    m = px.reshape(-1, 3).mean(axis=0)
                    out.append(
                        dict(
                            image_id=iid, ok=True, w=px.shape[1], h=px.shape[0],
                            mean_r=float(m[0]), mean_g=float(m[1]),
                            mean_b=float(m[2]), phash=phash_of(px),
                        )
                    )
                except Exception:
                    out.append(
                        dict(
                            image_id=iid, ok=False, w=None, h=None, mean_r=None,
                            mean_g=None, mean_b=None, phash=None,
                        )
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, "bytes").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, target_w: int, target_h: int, id_col: str = "image_id"
) -> DataFrame:
    """Nearest-neighbor batch resize → (id, bytes) of re-encoded PNGs (REAL)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, blobs = [], []
            for iid, payload in zip(pdf[id_col], pdf["bytes"]):
                try:
                    _, px = codecs.decode(bytes(payload))
                except Exception:
                    continue
                ys = (np.arange(target_h) * px.shape[0] // target_h).clip(
                    0, px.shape[0] - 1
                )
                xs = (np.arange(target_w) * px.shape[1] // target_w).clip(
                    0, px.shape[1] - 1
                )
                ids.append(iid)
                blobs.append(codecs.png_encode(px[np.ix_(ys, xs)]))
            yield pd.DataFrame({id_col: ids, "bytes": blobs})

    return df.select(id_col, "bytes").mapInPandas(
        run, f"{id_col} string, bytes binary"
    )


AUDIO_FEATURES_SCHEMA = (
    "clip_id string, ok boolean, n_samples int, rms double, peak double"
)
VIDEO_FRAMES_SCHEMA = "clip_id string, frame_idx int, frame_png binary"


def extract_audio_features(
    df: DataFrame, id_col: str = "clip_id", strict: bool = False
) -> DataFrame:
    """STUB decode (no audio libs in this container): treats the payload as
    16-bit PCM little-endian mono — a deterministic fake that keeps the
    Arrow plumbing, schema and batch shape real. strict=True raises
    NotImplementedError, the marker for 'wire in a real decoder here'."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real audio decode requires an audio library (not in env)"
                )
            out = []
            for iid, payload in zip(pdf[id_col], pdf["bytes"]):
                raw = bytes(payload)[: (len(payload) // 2) * 2]
                x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
                ok = x.size > 0
                out.append(
                    dict(
                        clip_id=iid, ok=ok, n_samples=int(x.size),
                        rms=float(np.sqrt((x**2).mean())) if ok else None,
                        peak=float(np.abs(x).max()) if ok else None,
                    )
                )
            yield pd.DataFrame(out)

    return df.select(id_col, "bytes").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "clip_id",
    strict: bool = False,
) -> DataFrame:
    """STUB frame sampling: interprets the payload as a concatenation of the
    pure-codec PNG frames (length-prefixed). Real plumbing (one output row
    per sampled frame, bounded batches); fake container format."""
    import struct

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real video decode requires a video library (not in env)"
                )
            rows = []
            for iid, payload in zip(pdf[id_col], pdf["bytes"]):
                data = bytes(payload)
                pos = idx = 0
                while pos + 4 <= len(data):
                    (ln,) = struct.unpack(">I", data[pos : pos + 4])
                    frame = data[pos + 4 : pos + 4 + ln]
                    if len(frame) != ln:
                        break
                    if idx % every_n == 0:
                        rows.append(
                            dict(clip_id=iid, frame_idx=idx, frame_png=frame)
                        )
                    idx += 1
                    pos += 4 + ln
            yield pd.DataFrame(
                rows, columns=["clip_id", "frame_idx", "frame_png"]
            )

    return df.select(id_col, "bytes").mapInPandas(run, VIDEO_FRAMES_SCHEMA)
