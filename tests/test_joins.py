"""Hot-key salted join (functions/joins.py)."""

import pytest
from pyspark.sql import functions as F

from ndto_spark.functions.joins import salted_join


def _skewed(spark):
    left = spark.range(0, 300, 1, 6).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 2 == 0, F.lit(5))
        .otherwise(F.col("id") % 10)
        .cast("bigint")
        .alias("k"),
    )
    right = spark.range(0, 9).select(  # key 9 missing on the right
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") * 7).cast("bigint").alias("w"),
    )
    return left, right


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed(spark)
    plain = sorted(
        (r.rid, r.k, r.w) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r.rid, r.k, r.w)
        for r in salted_join(left, right, "k", [5], n_salts=4).collect()
    )
    assert salted == plain and len(plain) > 0


def test_salted_join_matches_plain_left_outer(spark):
    left, right = _skewed(spark)
    plain = sorted(
        (r.rid, r.k, r.w) for r in left.join(right, "k", "left").collect()
    )
    salted = sorted(
        (r.rid, r.k, r.w)
        for r in salted_join(left, right, "k", [5], n_salts=4, how="left").collect()
    )
    assert salted == plain
    # unmatched left keys (k=9) survive exactly once each
    assert sum(1 for _, k, w in salted if k == 9 and w is None) == 30


def test_salted_join_replicates_only_hot_right_rows(spark):
    left, right = _skewed(spark)
    l2_r2 = salted_join(left, right, "k", [5], n_salts=4)
    # internal check via the exploded right side: hot key 5 → 4 replicas,
    # others 1 (observe through a count of the build side the join scans)
    from ndto_spark.functions.joins import _SALT

    r2 = right.withColumn(
        _SALT,
        F.explode(
            F.when(F.col("k").isin([5]), F.sequence(F.lit(0), F.lit(3)))
            .otherwise(F.array(F.lit(0)))
        ),
    )
    per_key = {r.k: r.n for r in r2.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_key[5] == 4 and all(v == 1 for k, v in per_key.items() if k != 5)
    assert l2_r2.count() == left.join(right, "k").count()


def test_salted_join_rejects_outer_and_bad_salts(spark):
    left, right = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", [5], how="full_outer")
    with pytest.raises(ValueError):
        salted_join(left, right, "k", [5], n_salts=1)


def test_salted_join_empty_hot_keys_falls_back(spark):
    left, right = _skewed(spark)
    out = salted_join(left, right, "k", [], n_salts=4)
    assert out.count() == left.join(right, "k").count()
