"""Codec roundtrip + images fixture + batch validation golden tests.

The seeded violation classes (fixtures module docstring) are the oracle:
every expected (row, check) pair must appear in the violations output, and
no clean row may produce one.
"""

from __future__ import annotations

import numpy as np
import pytest

from ndto_spark import codecs, fixtures

N = 400
SEED = 42


# --- pure codec tests (no Spark) ---------------------------------------------


def test_png_roundtrip_exact():
    pixels = fixtures.image_pixels(SEED, 123)
    data = codecs.png_encode(pixels)
    fmt, decoded = codecs.decode(data)
    assert fmt == "png"
    assert np.array_equal(decoded, pixels)


def test_fake_jpeg_lossy_but_close():
    pixels = fixtures.image_pixels(SEED, 7)
    good = codecs.fake_jpeg_encode(pixels, quality=90)
    fmt, dec = codecs.decode(good)
    assert fmt == "jpeg"
    assert not np.array_equal(dec, pixels)  # genuinely lossy
    assert codecs.psnr(pixels, dec) >= 40.0
    bad = codecs.fake_jpeg_encode(pixels, quality=10)
    _, dec_bad = codecs.decode(bad)
    assert codecs.psnr(pixels, dec_bad) < 40.0


def test_corrupt_bytes_raise():
    pixels = fixtures.image_pixels(SEED, 5)
    data = codecs.png_encode(pixels)
    with pytest.raises(ValueError):
        codecs.png_decode(data[: len(data) // 2])
    with pytest.raises(ValueError):
        codecs.decode(b"garbage bytes here!")


def test_make_row_deterministic():
    a, b = fixtures.make_row(SEED, 57), fixtures.make_row(SEED, 57)
    assert a == b
    assert fixtures.make_row(SEED, 58) != a


# --- Spark pipeline -------------------------------------------------------------


@pytest.fixture(scope="module")
def images_result(spark):
    from ndto_spark.images import validate_images

    df = fixtures.synth_images(spark, N, n_partitions=4, seed=SEED).cache()
    res = validate_images(df, seed=SEED)
    viols = res.violations.collect()
    verdicts = res.verdicts.collect()
    df.unpersist()
    return viols, verdicts


def _ids_for(viols, schema_path):
    return sorted(
        fixtures.row_id_of(v.image_id)
        for v in viols
        if v.schema_path == schema_path and v.image_id is not None
    )


def test_seeded_violations_detected(images_result):
    viols, _ = images_result
    exp = fixtures.expected_violation_classes(N)
    assert _ids_for(viols, "$.decode") == exp[0]
    # class 7 (declared w=0) also disagrees with decoded width → dimensions
    assert _ids_for(viols, "$.dimensions") == sorted(exp[1] + exp[7])
    # class 6 (fmt='gif') also disagrees with the detected format
    assert _ids_for(viols, "$.format") == sorted(exp[2] + exp[6])
    assert _ids_for(viols, "$.min_length") == exp[3]  # empty caption
    assert _ids_for(viols, "$.max_length") == exp[4]  # overlong caption
    assert _ids_for(viols, "$.type") == exp[5]  # null caption → type viol
    # fmt='gif' fails the enum (path '$' — bare prefix, ndto parity)
    assert _ids_for(viols, "$") == exp[6]
    assert _ids_for(viols, "$.minimum") == exp[7]  # w = 0
    assert _ids_for(viols, "$.psnr") == exp[11]


def test_null_image_id_flagged(images_result):
    viols, _ = images_result
    null_id_viols = [v for v in viols if v.image_id is None]
    # class 9 rows: null image_id → string type violation on image_id
    exp = fixtures.expected_violation_classes(N)
    assert len([v for v in null_id_viols if v.column == "image_id"]) == len(exp[9])


def test_duplicates_flagged(images_result):
    viols, _ = images_result
    dup_viols = [v for v in viols if v.keyword == "unique"]
    exp = fixtures.expected_violation_classes(N)
    # each duplicated key appears once in the uniqueness output
    assert len(dup_viols) == len(exp[8])
    for v in dup_viols:
        assert "2 times" in v.description


def test_caption_equality_checked(images_result):
    viols, _ = images_result
    # seeded caption mutations (empty / overlong) also fail reference equality
    cap_eq = {fixtures.row_id_of(v.image_id) for v in viols if v.keyword == "caption_equality"}
    exp = fixtures.expected_violation_classes(N)
    assert set(exp[3]) <= cap_eq
    assert set(exp[4]) <= cap_eq


def test_clean_rows_have_no_violations(images_result):
    viols, _ = images_result
    flagged = {
        fixtures.row_id_of(v.image_id) for v in viols if v.image_id is not None
    }
    exp = fixtures.expected_violation_classes(N)
    seeded = set().union(*exp.values())
    # duplicates copy row id-12 → the copied id is flagged by uniqueness
    seeded |= {i - 12 for i in exp[8]}
    clean = set(range(N)) - seeded
    assert flagged & clean == set()


def test_verdicts_account_for_all_rows(images_result):
    viols, verdicts = images_result
    assert sum(v.n_rows for v in verdicts) == N
    total = sum(v.n_violations for v in verdicts)
    assert total == len(viols)
    assert not all(v["pass"] for v in verdicts)


def test_clear_stale_dir_never_deletes_a_complete_cache(tmp_path):
    import os

    from ndto_spark.fixtures import _clear_stale_dir

    # a marker-less (crashed-writer) dir is reclaimed
    stale = tmp_path / "cache_a"
    stale.mkdir()
    (stale / "part-0.parquet").write_bytes(b"x")
    _clear_stale_dir(str(stale), "_SUCCESS")
    assert not stale.exists()

    # a COMPLETE cache (the TOCTOU case: the winner's rename landed
    # between the caller's marker check and the cleanup) survives intact
    done = tmp_path / "cache_b"
    done.mkdir()
    (done / "part-0.parquet").write_bytes(b"x")
    (done / "_SUCCESS").touch()
    _clear_stale_dir(str(done), "_SUCCESS")
    assert done.exists() and (done / "_SUCCESS").exists()
    assert (done / "part-0.parquet").read_bytes() == b"x"

    # a missing dir is a no-op
    _clear_stale_dir(str(tmp_path / "nope"), "_SUCCESS")


def test_pair_quality_filter_priority_and_thresholds(spark):
    from ndto_spark.images import pair_quality_filter

    rows = [
        # id, w, h, fmt, caption, expected reason (None = keep)
        ("a", 100, 100, "png", "a cat", None),
        (None, 100, 100, "png", "x", "missing_id"),          # id beats all
        ("c", 0, 100, "gif", None, "missing_caption"),       # caption beats fmt/dim
        ("d", 100, 100, "png", "", "empty_caption"),
        ("e", 100, 100, "png", "y" * 300, "caption_too_long"),
        ("f", 100, 100, "png", "w " * 70, "caption_too_many_tokens"),
        ("g", 100, 100, "webp", "ok", "bad_format"),
        ("h", 0, 100, "png", "ok", "too_small"),
        ("i", 500, 100, "png", "ok", "extreme_aspect"),
        ("j", 400, 100, "png", "ok", None),                  # 4:1 inclusive
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows],
        "image_id string, w int, h int, fmt string, caption string",
    )
    got = {
        r.image_id: (r.keep, r.fail_reason)
        for r in pair_quality_filter(df).collect()
    }
    for iid, _, _, _, _, want in rows:
        assert got[iid] == (want is None, want), (iid, got[iid], want)


def test_metadata_consistency_verdicts_per_seeded_class(spark):
    from ndto_spark import fixtures
    from ndto_spark.images import metadata_consistency

    # 300 rows: each residue class appears 3x
    df = fixtures.synth_images(spark, 300, n_partitions=4, seed=42)
    rows = metadata_consistency(df).collect()
    assert len(rows) == 300
    by_id = {}
    for r in rows:
        by_id.setdefault(r.image_id, []).append(r)
    # v=0: truncated -> decode fails, matches NULL
    r0 = by_id["img_0000000000000000"][0]
    assert (r0.decode_ok, r0.dims_match, r0.fmt_match) == (False, None, None)
    # v=1: declared w+5 -> dims mismatch, fmt fine
    r1 = by_id["img_0000000000000001"][0]
    assert (r1.decode_ok, r1.dims_match, r1.fmt_match) == (True, False, True)
    # v=2: declared fmt swapped -> fmt mismatch, dims fine
    r2 = by_id["img_0000000000000002"][0]
    assert (r2.decode_ok, r2.dims_match, r2.fmt_match) == (True, True, False)
    # v=6: declared gif -> fmt mismatch
    r6 = by_id["img_0000000000000006"][0]
    assert (r6.decode_ok, r6.dims_match, r6.fmt_match) == (True, True, False)
    # v=7: declared w=0 -> dims mismatch
    r7 = by_id["img_0000000000000007"][0]
    assert (r7.decode_ok, r7.dims_match, r7.fmt_match) == (True, False, True)
    # clean row: everything consistent
    r10 = by_id["img_000000000000000a"][0]
    assert (r10.decode_ok, r10.dims_match, r10.fmt_match) == (True, True, True)
