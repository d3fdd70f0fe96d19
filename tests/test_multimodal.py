"""Multimodal plumbing: real image/audio paths, declared video stub."""

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


def test_audio_wav_roundtrip_features(spark):
    """REAL WAV path: encode stereo PCM16 with the pure codec, decode via
    the operator, check rate/channels/duration and vectorized features."""
    sr = 8000
    t = np.linspace(0, 2, 2 * sr, endpoint=False)
    left = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    right = (np.sin(2 * np.pi * 220 * t) * 10000).astype(np.int16)
    wav = codecs.wav_encode(np.stack([left, right], axis=1), sample_rate=sr)
    # also a silent mono clip (zero rms/zcr) and a corrupt payload
    silent = codecs.wav_encode(np.zeros(100, dtype=np.int16), sample_rate=sr)
    df = spark.createDataFrame(
        [("tone", bytearray(wav)), ("silent", bytearray(silent)),
         ("bad", bytearray(b"RIFFxxxxWAVEjunk"))],
        "clip_id string, bytes binary",
    )
    rows = {r.clip_id: r for r in multimodal.extract_audio_features(df).collect()}
    tone = rows["tone"]
    assert tone.ok and tone.sample_rate == sr and tone.n_channels == 2
    assert tone.n_samples == 2 * sr and abs(tone.duration_sec - 2.0) < 1e-9
    assert 0 < tone.rms < tone.peak <= 1.0
    # 440 Hz dominant mix over 2 s → ~880 sign flips/s of 8000 samples
    assert 0.09 < tone.zero_cross_rate < 0.13
    s = rows["silent"]
    assert s.ok and s.rms == 0.0 and s.zero_cross_rate == 0.0
    bad = rows["bad"]
    assert bad.ok is False and bad.err is not None


def test_audio_raw_pcm_fallback(spark):
    pcm = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype("<i2").tobytes()
    df = spark.createDataFrame([("a", bytearray(pcm))], "clip_id string, bytes binary")
    row = multimodal.extract_audio_features(df).collect()[0]
    assert row.ok and row.n_samples == 1000 and 0 < row.rms < row.peak <= 1.0
    assert row.sample_rate is None  # headerless: rate unknown
    row2 = multimodal.extract_audio_features(df, allow_raw_pcm=False).collect()[0]
    assert row2.ok is False


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


def test_avi_codec_roundtrip():
    px = [fixtures.image_pixels(42, 7) for _ in range(6)]  # constant dims
    frames = [codecs.png_encode(p) for p in px]
    blob = codecs.avi_encode(frames, fps=12)
    meta, out = codecs.avi_decode_frames(blob)
    assert out == frames
    assert meta["handler"] == "MPNG" and meta["fps"] == 12
    assert meta["n_frames"] == 6
    assert (meta["h"], meta["w"]) == px[0].shape[:2]
    _, dec = codecs.decode(out[3])
    assert np.array_equal(dec, px[3])


def test_video_frame_sampling_avi(spark):
    frames = [
        codecs.png_encode(fixtures.image_pixels(42, 7)) for _ in range(25)
    ]
    good = codecs.avi_encode(frames, fps=30)
    rows = [
        ("v1", bytearray(good)),
        ("bad", bytearray(b"RIFF\x04\x00\x00\x00AVI ")),  # no hdrl/movi
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = multimodal.sample_video_frames(df, every_n=10).collect()
    # malformed clip skipped (no rows), good clip sampled at 0/10/20
    assert sorted((r.clip_id, r.frame_idx) for r in out) == [
        ("v1", 0), ("v1", 10), ("v1", 20)
    ]
    _, px = codecs.decode(bytes(out[0].frame_png))
    assert np.array_equal(px, fixtures.image_pixels(42, 7))
    with pytest.raises(Exception, match="AVI missing hdrl"):
        multimodal.sample_video_frames(df, every_n=10, strict=True).collect()


def test_avi_encode_rejects_mixed_frames():
    pa = fixtures.image_pixels(42, 7)
    png = codecs.png_encode(pa)
    jpg = codecs.fake_jpeg_encode(pa, quality=90)
    with pytest.raises(ValueError, match="container"):
        codecs.avi_encode([png, jpg])
    pb = fixtures.image_pixels(42, 8)  # different dims than row 7
    assert pb.shape[:2] != pa.shape[:2]
    with pytest.raises(ValueError, match="dims"):
        codecs.avi_encode([png, codecs.png_encode(pb)])


def test_feature_fixture_corrupt_payloads_never_decode():
    # the gate oracles assert ok=False exactly on the seeded residue — a
    # truncated payload that still decodes would silently flip a row
    for i in range(0, 200):
        corrupt = i % fixtures.FEATURE_CORRUPT_EVERY == fixtures.FEATURE_CORRUPT_EVERY - 1
        png = codecs.png_encode(fixtures.feature_image_pixels(i))
        payload = png[: max(8, len(png) // 3)] if corrupt else png
        try:
            codecs.decode(payload)
            assert not corrupt, i
        except Exception:
            assert corrupt, i
        sr, _, _ = fixtures.audio_clip_params(i)
        wav = codecs.wav_encode(fixtures.audio_clip_samples(i), sr)
        wpayload = wav[:20] if corrupt else wav
        try:
            codecs.wav_decode(wpayload)
            assert not corrupt, i
        except ValueError:
            assert corrupt, i


def test_phash_fixture_decodes_to_mask_and_triples_recovered(spark):
    from ndto_spark.dedup import phash_near_dups
    from ndto_spark.multimodal import decode_image_features

    # 8 groups of 3 (base, 1-bit flip, 2-bit flip) — no corrupt row < 24
    df = fixtures.synth_phash_images(spark, 24, n_partitions=2)
    feats = decode_image_features(df).filter(F.col("ok")).collect()
    assert len(feats) == 24
    for r in feats:
        i = int(r.image_id[3:])
        assert r.phash == fixtures.phash_image_mask(i), r.image_id
        assert (r.w, r.h) == (16, 16)
    pairs = phash_near_dups(
        decode_image_features(df).filter(F.col("ok")).select("image_id", "phash"),
        "image_id", "phash", bits=16, bands=4, max_hamming=2,
    ).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    for g in range(8):
        a, b, c = (f"pi_{3 * g + r:08d}" for r in range(3))
        assert got[(a, b)] == 1 and got[(b, c)] == 1 and got[(a, c)] == 2


def test_phash_fixture_corrupt_rows_drop(spark):
    from ndto_spark.multimodal import decode_image_features

    df = fixtures.synth_phash_images(spark, 50, n_partitions=2)
    out = decode_image_features(df).collect()
    bad = {r.image_id for r in out if not r.ok}
    assert bad == {"pi_00000024", "pi_00000049"}


def test_dup_images_fixture_byte_identity_is_residue_partition(spark):
    from ndto_spark.dedup import exact_dedup_groups

    # n=40, G=37: residues 0-2 have two copies (i and i+37), rest one
    df = fixtures.synth_dup_images(spark, 40, group_mod=37, n_partitions=2)
    rows = exact_dedup_groups(df, "image_id", "bytes").collect()
    assert len(rows) == 37  # injective params → one hash per residue
    by_keeper = {r.keeper_id: r.n_copies for r in rows}
    for r in range(37):
        assert by_keeper[f"di_{r:08d}"] == (2 if r < 3 else 1)


def test_dup_images_fixture_rejects_wide_group_mod(spark):
    import pytest

    with pytest.raises(ValueError):
        fixtures.synth_dup_images(spark, 10, group_mod=129)


def test_exposure_verdicts_thresholds_and_undecodable(spark):
    from ndto_spark.images import exposure_verdicts
    from ndto_spark.multimodal import decode_image_features

    df = fixtures.synth_feature_images(spark, 60, n_partitions=2)
    rows = exposure_verdicts(decode_image_features(df)).collect()
    got = {r.image_id: (r.luma_e4, r.exposure) for r in rows}
    assert len(got) == 60
    for i in range(60):
        w, h, c1, _ = fixtures.feature_image_params(i)
        iid = f"fi_{i:08d}"
        if i % fixtures.FEATURE_CORRUPT_EVERY == fixtures.FEATURE_CORRUPT_EVERY - 1:
            assert got[iid] == (None, "undecodable")
            continue
        luma = c1 + 50
        want = "under" if luma < 80 else "over" if luma > 150 else "ok"
        assert got[iid] == (luma * 10000, want), (iid, luma)
    # all three decoded classes appear in the first 60 rows
    assert {v for _, v in got.values()} == {"under", "over", "ok", "undecodable"}


def test_aspect_buckets_assignment_and_tie_break(spark):
    from ndto_spark.images import aspect_buckets
    from ndto_spark.multimodal import decode_image_features

    df = fixtures.synth_feature_images(spark, 60, n_partitions=2)
    rows = aspect_buckets(decode_image_features(df)).collect()
    got = {r.image_id: (r.w, r.h, r.bucket) for r in rows}
    # corrupt rows dropped
    assert "fi_00000024" not in got and len(got) == 58
    # i=13: w=20, h=12 → rational 5/3 is the midpoint of 4:3 and 2:1, but
    # in IEEE doubles fl(5/3)-fl(4/3) > 2-fl(5/3), so 2:1 wins — pinning
    # this asserts the engine-exact double semantics (the oracle agrees)
    assert got["fi_00000013"] == (20, 12, "2:1")
    # full Python-float replay (same IEEE doubles as the JVM): the
    # earliest index whose distance is <= every later distance wins
    from ndto_spark.images import ASPECT_BUCKETS

    for i in range(60):
        if i % fixtures.FEATURE_CORRUPT_EVERY == fixtures.FEATURE_CORRUPT_EVERY - 1:
            continue
        w, h, _, _ = fixtures.feature_image_params(i)
        d = [abs(w / h - r) for _, r in ASPECT_BUCKETS]
        want = next(
            name
            for k, (name, _) in enumerate(ASPECT_BUCKETS)
            if all(d[k] <= d[j] for j in range(k + 1, len(d)))
        )
        assert got[f"fi_{i:08d}"] == (w, h, want), (i, w, h, want)
    # every bucket class is exercised by the first 60 rows
    assert {b for _, _, b in got.values()} >= {"3:4", "1:1", "4:3", "2:1"}


def test_scene_cuts_deltas_and_first_frame(spark):
    from ndto_spark.multimodal import (
        decode_image_features,
        sample_video_frames,
        scene_cuts,
    )
    from pyspark.sql import functions as F

    df = fixtures.synth_video_clips(spark, 8, n_partitions=2)
    frames = sample_video_frames(df, every_n=1)
    feats = decode_image_features(
        frames.select(
            F.concat_ws(
                ":", F.col("clip_id"), F.col("frame_idx").cast("string")
            ).alias("image_id"),
            F.col("frame_png").alias("bytes"),
        )
    ).select(
        F.substring_index("image_id", ":", 1).alias("clip_id"),
        F.substring_index("image_id", ":", -1).cast("int").alias("frame_idx"),
        F.col("mean_r").alias("mean"),
    )
    rows = scene_cuts(feats, threshold=60).collect()
    got = {(r.clip_id, r.frame_idx): (r.mean_i, r.delta, r.is_cut) for r in rows}
    for i in range(8):
        nf = fixtures.video_clip_n_frames(i)
        assert len([1 for (c, _) in got if c == f"vc_{i:08d}"]) == nf
        prev = None
        for f in range(nf):
            mean = ((i * 37 + f * 53 + 11) % 128) + 50
            delta = None if f == 0 else mean - prev
            want_cut = delta is not None and abs(delta) >= 60
            assert got[(f"vc_{i:08d}", f)] == (mean, delta, want_cut)
            prev = mean
    # both delta classes (+53 stay, -75 cut) appear
    deltas = {d for _, d, _ in got.values() if d is not None}
    assert deltas == {53, -75}


def test_audio_quality_verdict_priority(spark):
    from ndto_spark.multimodal import (
        audio_quality_verdicts,
        extract_audio_features,
    )

    df = fixtures.synth_audio_clips(spark, 60, n_partitions=2)
    rows = audio_quality_verdicts(extract_audio_features(df)).collect()
    got = {r.clip_id: (r.dur_e6, r.rms_e6, r.verdict) for r in rows}
    assert len(got) == 60
    seen = set()
    for i in range(60):
        sr, n, amp = fixtures.audio_clip_params(i)
        cid = f"au_{i:08d}"
        if i % fixtures.FEATURE_CORRUPT_EVERY == fixtures.FEATURE_CORRUPT_EVERY - 1:
            want = "undecodable"
            assert got[cid] == (None, None, want)
        else:
            dur, rms = n / sr, amp / 32768
            want = (
                "too_short" if dur < 0.1
                else "too_quiet" if rms < 0.1
                else "near_clipped" if rms > 0.6
                else "ok"
            )
            import math
            assert got[cid] == (
                math.floor(dur * 1e6), math.floor(rms * 1e6), want
            ), (cid, want)
        seen.add(want)
    # amp = 1000 + 37i stays under the quiet threshold for i < 62, so only
    # three classes are reachable here; near_clipped/ok coverage lives in
    # the 600-clip gate oracle (amp sweeps the full residue range there)
    assert seen == {"undecodable", "too_short", "too_quiet"}


def test_color_histograms_counts_skip_undecodable_and_validate(spark):
    import numpy as np
    import pytest

    from ndto_spark import codecs
    from ndto_spark.multimodal import color_histograms

    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[:, :, 0] = 10          # R: all 8 px in bin 0
    px[:, :, 1] = 200         # G: all in bin 3
    px[:, 2:, 2] = 70         # B: 4 px bin 0, 4 px bin 1
    df = spark.createDataFrame(
        [("a", bytearray(codecs.png_encode(px))), ("bad", bytearray(b"nope"))],
        "image_id string, bytes binary",
    )
    rows = color_histograms(df, n_bins=4).collect()
    got = {(r["image_id"], r["channel"], r["bin"]): r["n_px"] for r in rows}
    assert got == {
        ("a", 0, 0): 8,
        ("a", 1, 3): 8,
        ("a", 2, 0): 4,
        ("a", 2, 1): 4,
    }
    with pytest.raises(ValueError, match="n_bins"):
        color_histograms(df, n_bins=3)


def test_embed_images_pooled_cells_and_skips(spark):
    import numpy as np
    import pytest

    from ndto_spark import codecs
    from ndto_spark.multimodal import embed_images

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:, 2:] = 90  # right half bright
    df = spark.createDataFrame(
        [
            ("a", bytearray(codecs.png_encode(px))),
            ("bad", bytearray(b"nope")),
            ("tiny", bytearray(codecs.png_encode(np.zeros((1, 1, 3), np.uint8)))),
        ],
        "image_id string, bytes binary",
    )
    rows = embed_images(df, grid=2).collect()
    got = {r["image_id"]: r["embedding"] for r in rows}
    assert set(got) == {"a"}
    assert got["a"] == [0.0, 90.0, 0.0, 90.0]
    with pytest.raises(ValueError, match="grid"):
        embed_images(df, grid=0)


def test_energy_segments_runs_and_tail_window(spark):
    import numpy as np
    import pytest

    from ndto_spark import codecs
    from ndto_spark.multimodal import energy_segments

    # 10 samples, window 4: 3 windows (tail of 2); pattern loud-quiet-loud
    loud = np.full(4, 16384, dtype=np.int16)     # rms = 0.5
    quiet = np.zeros(4, dtype=np.int16)
    tail = np.full(2, 16384, dtype=np.int16)
    samples = np.concatenate([loud, quiet, tail])
    df = spark.createDataFrame(
        [("a", bytearray(codecs.wav_encode(samples, 8000))),
         ("bad", bytearray(b"xx"))],
        "clip_id string, bytes binary",
    )
    rows = energy_segments(df, window=4, thr_e6=250_000).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_windows"], r["n_active"], r["n_segments"],
            r["longest_run"], r["rms_max_e6"]) == (3, 2, 2, 1, 500_000)
    with pytest.raises(ValueError, match="window"):
        energy_segments(df, window=0)


def test_image_sharpness_exact_moments_and_skips(spark):
    import numpy as np

    from ndto_spark import codecs
    from ndto_spark.multimodal import image_sharpness

    # 4x5 gradient: gray3 = 3 * col value; hand-computed Laplacian moments
    px = np.zeros((4, 5, 3), dtype=np.uint8)
    for c in range(5):
        px[:, c, :] = 10 * c * c  # columns: 0, 10, 40, 90, 160
    g = px.sum(axis=2).astype(np.int64)
    lap = (
        4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
        - g[1:-1, :-2] - g[1:-1, 2:]
    )
    n, s, q = lap.size, int(lap.sum()), int((lap * lap).sum())
    flat = np.full((3, 3, 3), 77, dtype=np.uint8)  # zero Laplacian
    tiny = np.full((2, 2, 3), 5, dtype=np.uint8)   # < 3x3: skipped
    df = spark.createDataFrame(
        [
            ("grad", bytearray(codecs.png_encode(px))),
            ("flat", bytearray(codecs.png_encode(flat))),
            ("tiny", bytearray(codecs.png_encode(tiny))),
            ("bad", bytearray(b"nope")),
        ],
        "image_id string, bytes binary",
    )
    rows = {r["image_id"]: r for r in image_sharpness(df).collect()}
    assert set(rows) == {"grad", "flat"}
    assert rows["flat"]["lap_sum"] == 0
    assert rows["flat"]["lap_sumsq"] == 0
    assert rows["flat"]["lap_var_e6"] == 0
    gr = rows["grad"]
    assert (gr["n_interior"], gr["lap_sum"], gr["lap_sumsq"]) == (n, s, q)
    assert gr["lap_var_e6"] == (1_000_000 * (n * q - s * s)) // (n * n)


def test_caption_alignment_closed_form_cosine(spark):
    import hashlib

    import numpy as np

    from ndto_spark import codecs
    from ndto_spark.multimodal import caption_alignment

    def bucket(word, dim):
        return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % dim

    # grid=2 -> dim=4; emb = [0, 90, 0, 90] (right half bright)
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:, 2:] = 90
    words = [f"w{i}" for i in range(64)]
    hot = next(w for w in words if bucket(w, 4) == 1)   # emb[1] = 90
    cold = next(w for w in words if bucket(w, 4) == 0)  # emb[0] = 0
    payload = bytearray(codecs.png_encode(px))
    df = spark.createDataFrame(
        [
            ("hot", payload, f"{hot} {hot}"),
            ("cold", payload, cold),
            ("nul", payload, None),
            ("empty", payload, ""),
            ("bad", bytearray(b"nope"), hot),
        ],
        "image_id string, bytes binary, caption string",
    )
    out = {r["image_id"]: r for r in caption_alignment(df, grid=2).collect()}
    # undecodable payload emits nothing
    assert set(out) == {"hot", "cold", "nul", "empty"}
    # cos([0,90,0,90], 2*e1) = 90/(90*sqrt(2)) -> floor(1e4/sqrt(2)) = 7071
    assert (out["hot"]["n_tokens"], out["hot"]["align_e4"]) == (2, 7071)
    assert (out["cold"]["n_tokens"], out["cold"]["align_e4"]) == (1, 0)
    # NULL / empty captions: no direction -> NULL score
    assert (out["nul"]["n_tokens"], out["nul"]["align_e4"]) == (0, None)
    assert (out["empty"]["n_tokens"], out["empty"]["align_e4"]) == (0, None)


def test_image_dhash_two_tone_closed_form(spark):
    import numpy as np

    import pytest

    from ndto_spark import codecs
    from ndto_spark.multimodal import image_dhash

    # 4x4, grid=2 -> pooled cells [[lo, hi], [lo, hi]]: each row's single
    # gradient bit fires (left < right) -> dhash = 2^0 + 2^1 = 3
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:, 2:] = 200
    # mirrored image: monotone non-increasing rows -> no bit fires
    rv = px[:, ::-1].copy()
    df = spark.createDataFrame(
        [
            ("step", bytearray(codecs.png_encode(px))),
            ("rstep", bytearray(codecs.png_encode(rv))),
            ("bad", bytearray(b"nope")),
        ],
        "image_id string, bytes binary",
    )
    got = {r["image_id"]: r["dhash"] for r in image_dhash(df, grid=2).collect()}
    assert got == {"step": 3, "rstep": 0}  # undecodable emits nothing

    with pytest.raises(ValueError, match="grid"):
        image_dhash(df, grid=1)


def test_transform_images_exact_pixel_permutations(spark):
    import numpy as np

    import pytest

    from ndto_spark import codecs
    from ndto_spark.multimodal import transform_images

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("a", bytearray(codecs.png_encode(px))), ("bad", bytearray(b"x"))],
        "image_id string, bytes binary",
    )
    want = {"hflip": px[:, ::-1], "vflip": px[::-1, :], "rot180": px[::-1, ::-1]}
    for op, expect in want.items():
        rows = transform_images(df, op).collect()
        assert [r.image_id for r in rows] == ["a"]  # undecodable dropped
        _, got = codecs.decode(bytes(rows[0].bytes))
        assert np.array_equal(got, expect), op

    with pytest.raises(ValueError, match="op must be"):
        transform_images(df, "rot90")


def test_audio_fingerprint_same_pcm_rewrapped_and_null_on_bad(spark):
    import numpy as np

    from ndto_spark import codecs
    from ndto_spark.multimodal import audio_fingerprint, extract_audio_features

    wave = np.where((np.arange(800) // 2) % 2 == 0, 5000, -5000).astype(
        np.int16
    )
    other = np.where((np.arange(900) // 2) % 2 == 0, 5000, -5000).astype(
        np.int16
    )
    df = spark.createDataFrame(
        [
            ("a", bytearray(codecs.wav_encode(wave, 8000))),
            ("a2", bytearray(codecs.wav_encode(wave, 8000))),   # re-export
            ("b", bytearray(codecs.wav_encode(other, 8000))),   # longer
            ("bad", bytearray(codecs.WAV_MAGIC + b"x")),        # truncated
        ],
        "clip_id string, bytes binary",
    )
    got = {
        r.clip_id: r.fingerprint
        for r in audio_fingerprint(extract_audio_features(df)).collect()
    }
    assert got["a"] == got["a2"] is not None
    assert got["b"] != got["a"]
    assert got["bad"] is None
