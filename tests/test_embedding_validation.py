"""group_quantiles and validate_embeddings (table_rules round-5 additions)."""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from ndto_spark import table_rules as tr


def test_group_quantiles_exact_matches_known_values(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 6)] + [("b", 10.0), ("b", 20.0)],
        schema="g string, x double",
    )
    out = {
        (r.g, r.q): r.value
        for r in tr.group_quantiles(df, "g", "x", qs=(0.5,), exact=True).collect()
    }
    assert out[("a", 0.5)] == 3.0
    assert out[("b", 0.5)] == 15.0  # linear interpolation


def test_group_quantiles_approx_bounded_by_group_range(spark):
    df = spark.createDataFrame(
        [("g%d" % (i % 3), float(i)) for i in range(300)], schema="g string, x double"
    )
    for r in tr.group_quantiles(df, "g", "x", qs=(0.25, 0.75), exact=False).collect():
        assert 0.0 <= r.value <= 299.0
        # per-group values are i with i % 3 fixed: quantiles stay in-group
        assert int(r.value) % 3 == int(r.g[1])


def test_validate_embeddings_all_violation_classes(spark):
    nan = float("nan")
    rows = [
        (1, [3.0, 4.0]),        # healthy: norm 5
        (2, [1.0]),             # dim_mismatch
        (3, [nan, 1.0]),        # has_nan
        (4, [0.0, 0.0]),        # zero_vector
        (5, [30.0, 40.0]),      # norm_out_of_range (50 > 10)
        (6, None),              # null_embedding
    ]
    df = spark.createDataFrame(rows, schema="vec_id bigint, embedding array<float>")
    out = {
        r.vec_id: r
        for r in tr.validate_embeddings(
            df, "vec_id", "embedding", expected_dim=2, norm_lo=1.0, norm_hi=10.0
        ).collect()
    }
    assert out[1].viol is None and out[1].norm_e6 == math.floor(5.0 * 1e6)
    assert out[2].viol == "dim_mismatch"
    assert out[3].viol == "has_nan" and out[3].norm_e6 is None
    assert out[3].n_nan == 1
    assert out[4].viol == "zero_vector" and out[4].norm_e6 == 0
    assert out[5].viol == "norm_out_of_range"
    assert out[6].viol == "null_embedding" and out[6].dim is None


def test_validate_embeddings_priority_dim_beats_nan(spark):
    df = spark.createDataFrame(
        [(1, [float("nan")])], schema="vec_id bigint, embedding array<float>"
    )
    r = tr.validate_embeddings(
        df, "vec_id", "embedding", expected_dim=2
    ).collect()[0]
    assert r.viol == "dim_mismatch"  # first failed check wins


def test_unit_norm_embeddings_norms_and_null_path(spark):
    import math

    from pyspark.sql import functions as F

    from ndto_spark.ann import unit_norm_embeddings

    df = spark.createDataFrame(
        [
            (1, [3.0, 4.0]),
            (2, [0.0, 0.0]),
            (3, [1.0]),
            (4, [-2.0, 2.0, 1.0]),
        ],
        "vec_id bigint, v array<double>",
    )
    rows = unit_norm_embeddings(df, "vec_id", "v").collect()
    got = {r.vec_id: (r.dim, r.norm_e9, r.unit) for r in rows}
    assert got[1] == (2, 5_000_000_000, [0.6, 0.8])
    assert got[2] == (2, None, None)  # zero vector → NULL path
    assert got[3] == (1, 1_000_000_000, [1.0])
    dim, n9, unit = got[4]
    assert dim == 3 and n9 == math.floor(3.0 * 1e9)
    assert unit == [-2.0 / 3.0, 2.0 / 3.0, 1.0 / 3.0]
    # post-normalization norms are 1 within one ulp-ish fold error
    for vid in (1, 3, 4):
        u = got[vid][2]
        assert abs(sum(x * x for x in u) - 1.0) < 1e-12
