"""Count-min sketch + sketch-filtered heavy hitters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndto_spark.sketches import (
    MAX_SKETCH_LITERALS,
    cms_collect,
    cms_estimate_col,
    cms_table,
    heavy_hitters,
)


@pytest.fixture()
def skewed(spark):
    # key k appears 2**k times: 1,2,4,8,16,32 → 63 rows, plus NULLs ignored
    rows = [(f"k{k}",) for k in range(6) for _ in range(1 << k)]
    rows += [(None,), (None,)]
    return spark.createDataFrame(rows, "key string")


def _exact_counts(df):
    return {
        r["key"]: r["n"]
        for r in df.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_cms_estimates_exact_when_wide(spark, skewed):
    # width >> keys → no collisions → estimates are the exact counts
    depth, width = 4, 512
    entries = cms_collect(
        cms_table(skewed, "key", depth=depth, width=width),
        depth=depth,
        width=width,
    )
    exact = _exact_counts(skewed)
    keys = spark.createDataFrame([(k,) for k in exact], "key string")
    est = {
        r["key"]: r["est"]
        for r in keys.select(
            "key",
            cms_estimate_col(
                entries, F.col("key"), depth=depth, width=width
            ).alias("est"),
        ).collect()
    }
    assert est == exact


def test_cms_estimate_is_upper_bound_when_narrow(spark, skewed):
    # width 2 forces collisions: estimates must never UNDER-count
    depth, width = 3, 2
    entries = cms_collect(
        cms_table(skewed, "key", depth=depth, width=width),
        depth=depth,
        width=width,
    )
    exact = _exact_counts(skewed)
    keys = spark.createDataFrame([(k,) for k in exact], "key string")
    for r in keys.select(
        "key",
        cms_estimate_col(entries, F.col("key"), depth=depth, width=width).alias(
            "est"
        ),
    ).collect():
        assert r["est"] >= exact[r["key"]], r["key"]


def test_cms_unknown_key_estimates_zero_on_empty_sketch(spark):
    est_col = cms_estimate_col([], F.lit("nope"), depth=4, width=8)
    assert spark.range(1).select(est_col.alias("e")).first()["e"] == 0


def test_heavy_hitters_sketch_path_matches_exact(spark, skewed):
    # narrow sketch (real collisions) must still return the exact heavy set
    for threshold in (4, 16, 33):
        got = {
            (r["key"], r["n"])
            for r in heavy_hitters(
                skewed, "key", threshold, depth=3, width=4
            ).collect()
        }
        want = {
            (k, n) for k, n in _exact_counts(skewed).items() if n >= threshold
        }
        assert got == want, threshold


def test_heavy_hitters_exact_twin_agrees(spark, skewed):
    got = {
        (r["key"], r["n"])
        for r in heavy_hitters(skewed, "key", 8, exact=True).collect()
    }
    assert got == {("k3", 8), ("k4", 16), ("k5", 32)}


def test_sketch_literal_guard():
    with pytest.raises(ValueError, match="MAX_SKETCH_LITERALS"):
        cms_estimate_col([], F.lit("x"), depth=8, width=MAX_SKETCH_LITERALS)
    with pytest.raises(ValueError, match="depth/width"):
        cms_estimate_col([], F.lit("x"), depth=0, width=8)


def test_heavy_hitters_threshold_validation(spark, skewed):
    with pytest.raises(ValueError, match="threshold"):
        heavy_hitters(skewed, "key", 0)
