"""Deequ-style rule families: predicate compliance, histogram profiles,
entropy/mutual information, exact-moment correlation, MAD outliers
(table_rules.py round-5 additions — the cross-column / cross-row constraint
surface the reference's per-value keywords can't express)."""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from ndto_spark import table_rules as tr


def test_compliance_counts_null_predicate_as_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 200.0)], schema="id bigint, x double"
    )
    out = tr.compliance(df, {"x_small": F.col("x") < 100}).collect()
    assert len(out) == 1
    r = out[0]
    assert r.rule_name == "x_small"
    assert r.n_rows == 3
    # NULL x -> predicate NULL -> violation; 200.0 -> violation
    assert r.n_violations == 2
    assert r.compliance_e6 == math.floor(1e6 * 1 / 3)


def test_compliance_empty_table_yields_null_fraction(spark):
    df = spark.createDataFrame([], schema="id bigint, x double")
    r = tr.compliance(df, {"always": F.col("x") > 0}).collect()[0]
    assert r.n_rows == 0 and r.n_violations == 0
    assert r.compliance_e6 is None


def test_compliance_multiple_rules_one_aggregate(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], schema="id bigint, x double"
    )
    out = {
        r.rule_name: r
        for r in tr.compliance(
            df, {"lt5": F.col("x") < 5, "even": F.col("id") % 2 == 0}
        ).collect()
    }
    assert out["lt5"].n_violations == 5
    assert out["even"].n_violations == 5
    assert out["lt5"].compliance_e6 == 500000


def test_histogram_profile_zero_fill_clamp_and_null_exclusion(spark):
    df = spark.createDataFrame(
        [(v,) for v in [-5.0, 0.0, 1.5, 2.5, 99.0, None]], schema="x double"
    )
    out = {
        (r.column_name, r.bucket): r.n
        for r in tr.histogram_profile(df, [("x", 0.0, 10.0, 5)]).collect()
    }
    # 5 buckets all present (zero-filled), width 2
    assert len(out) == 5
    assert out[("x", 0)] == 3  # -5 clamps in, 0.0, 1.5
    assert out[("x", 1)] == 1  # 2.5
    assert out[("x", 2)] == 0
    assert out[("x", 3)] == 0
    assert out[("x", 4)] == 1  # 99 clamps into the top bucket
    # NULL contributes to no bucket
    assert sum(out.values()) == 5


def test_histogram_profile_matches_per_column_histogram(spark):
    df = spark.range(100).select((F.col("id") % 17).cast("double").alias("x"))
    prof = {
        r.bucket: r.n
        for r in tr.histogram_profile(df, [("x", 0.0, 17.0, 17)]).collect()
    }
    single = {r.bucket: r.n for r in tr.histogram(df, "x", 0.0, 17.0, 17).collect()}
    for b in range(17):
        assert prof[b] == single.get(b, 0)


def test_entropy_mi_independent_columns(spark):
    # a and b independent uniform -> MI == 0 exactly in the empirical joint
    # (every cell has cnt == n/(|A||B|), so log p - log pa - log pb == 0
    # up to float; with the balanced construction each term is exactly 0)
    df = spark.range(64).select(
        (F.col("id") % 4).alias("a"),
        (F.floor(F.col("id") / 4).cast("long") % 4).alias("b"),
    )
    out = {r.metric: r.value_e6 for r in tr.entropy_mi(df, "a", "b").collect()}
    assert out["mutual_information"] in (0, -1)  # floor of a ~0 float
    # H(uniform over 4) = ln 4
    assert out["entropy_a"] == math.floor(1e6 * math.log(4))
    assert out["entropy_b"] == math.floor(1e6 * math.log(4))
    assert out["entropy_joint"] == math.floor(1e6 * math.log(16))


def test_entropy_mi_identical_columns(spark):
    # b == a -> I(A;B) = H(A), H(A,B) = H(A)
    df = spark.range(90).select(
        (F.col("id") % 3).alias("a"), (F.col("id") % 3).alias("b")
    )
    out = {r.metric: r.value_e6 for r in tr.entropy_mi(df, "a", "b").collect()}
    h = math.floor(1e6 * math.log(3))
    assert out["entropy_a"] == h
    assert out["entropy_joint"] == h
    assert abs(out["mutual_information"] - h) <= 1


def test_correlation_exact_perfect_and_anti(spark):
    df = spark.range(1000).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2 + 7).cast("double").alias("y"),
        (-F.col("id")).cast("double").alias("z"),
    )
    up = tr.correlation_exact(df, "x", "y").collect()[0]
    assert up.pair == "x~y" and up.n_rows == 1000
    assert up.corr_e6 == 1000000
    dn = tr.correlation_exact(df, "x", "z").collect()[0]
    assert dn.corr_e6 == -1000000


def test_correlation_exact_constant_column_is_null(spark):
    df = spark.range(10).select(
        F.col("id").cast("double").alias("x"), F.lit(3.0).alias("y")
    )
    assert tr.correlation_exact(df, "x", "y").collect()[0].corr_e6 is None


def test_mad_outliers_flags_planted_extremes(spark):
    rows = [(i, 50.0 + (i % 7)) for i in range(100)] + [(1000, 5000.0), (1001, -900.0)]
    df = spark.createDataFrame(rows, schema="k bigint, v double")
    out = tr.mad_outliers(df, "k", "v", k=3.5, exact=True)
    keys = {r.k for r in out.collect()}
    assert keys == {1000, 1001}
    devs = {r.k: r.dev_e4 for r in out.collect()}
    assert devs[1000] > 0 and devs[1001] < 0


def test_mad_outliers_approx_path_agrees_on_clear_outliers(spark):
    rows = [(i, float(i % 10)) for i in range(500)] + [(9999, 1e6)]
    df = spark.createDataFrame(rows, schema="k bigint, v double")
    exact = {r.k for r in tr.mad_outliers(df, "k", "v", exact=True).collect()}
    approx = {r.k for r in tr.mad_outliers(df, "k", "v", exact=False).collect()}
    assert 9999 in exact and 9999 in approx


def test_profile_table_mixed_types_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "x"), (2, None, "y"), (3, 7.25, None), (3, 7.25, None)],
        schema="k bigint, v double, s string",
    )
    out = {r.column_name: r for r in tr.profile_table(df).collect()}
    assert out["k"].dtype == "bigint" and out["k"].n_rows == 4
    assert out["k"].n_distinct == 3 and out["k"].n_null == 0
    assert out["k"].min_norm == "1" and out["k"].max_norm == "3"
    assert out["v"].n_null == 1 and out["v"].null_e6 == 250000
    assert out["v"].min_norm == "25000"  # floor(2.5 * 1e4)
    assert out["s"].n_null == 2 and out["s"].n_distinct == 2


def test_profile_table_approx_distinct_close(spark):
    df = spark.createDataFrame(
        [(i % 100,) for i in range(5000)], schema="k bigint"
    )
    r = tr.profile_table(df, exact_distinct=False).collect()[0]
    assert abs(r.n_distinct - 100) <= 10  # HLL within rsd


def test_profile_table_empty_table(spark):
    df = spark.createDataFrame([], schema="k bigint")
    r = tr.profile_table(df).collect()[0]
    assert r.n_rows == 0 and r.n_distinct == 0 and r.null_e6 is None
    assert r.min_norm is None and r.max_norm is None


def test_count_anomalies_flags_half_loaded_key(spark):
    # 10 keys x 100 rows, key 3 only has 20 rows
    rows = [(k, i) for k in range(10) for i in range(20 if k == 3 else 100)]
    df = spark.createDataFrame(rows, schema="day bigint, i bigint")
    out = tr.count_anomalies(df, "day", k=3.5, exact=True).collect()
    assert len(out) == 1
    assert out[0].day == 3 and out[0].n_rows == 20
    # 9 identical counts -> MAD = 0: the anomaly still flags, but the
    # deviation score is undefined (NULL), not a division error
    assert out[0].dev_e4 is None


def test_count_anomalies_uniform_counts_yield_nothing(spark):
    rows = [(k, i) for k in range(10) for i in range(50 + (k % 3))]
    df = spark.createDataFrame(rows, schema="day bigint, i bigint")
    assert tr.count_anomalies(df, "day", k=3.5, exact=True).count() == 0


def test_count_anomalies_nonzero_mad_scores_deviation(spark):
    # varied counts so MAD > 0; key 9 is a clear outlier
    sizes = {0: 48, 1: 50, 2: 52, 3: 49, 4: 51, 5: 53, 6: 47, 7: 50, 8: 52, 9: 5}
    rows = [(k, i) for k, n in sizes.items() for i in range(n)]
    df = spark.createDataFrame(rows, schema="day bigint, i bigint")
    out = tr.count_anomalies(df, "day", k=3.5, exact=True).collect()
    assert [r.day for r in out] == [9]
    assert out[0].dev_e4 is not None and out[0].dev_e4 < 0


def test_snapshot_diff_statuses_and_null_safety(spark):
    from ndto_spark.table_rules import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, None, 4.0)],
        "k long, t string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0), (5, "e", 5.0)],
        "k long, t string, v double",
    )
    got = {
        r.k: r.status
        for r in snapshot_diff(old, new, ["k"], ["t", "v"]).collect()
    }
    # 1 removed; 2 changed (NULL -> 2.0); 3,4 unchanged (no row, NULLs
    # fingerprint stably); 5 added
    assert got == {1: "removed", 2: "changed", 5: "added"}


def test_snapshot_diff_validates_args(spark):
    import pytest

    from ndto_spark.table_rules import snapshot_diff

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, [], ["v"])
    with pytest.raises(ValueError):
        snapshot_diff(df, df, ["k"], [])


def test_k_anonymity_flags_small_groups_only(spark):
    from ndto_spark.table_rules import k_anonymity

    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)],
        "qa string, qb long",
    )
    rows = k_anonymity(df, ["qa", "qb"], k=3).collect()
    got = {(r.qa, r.qb): r.n_rows for r in rows}
    assert got == {("a", 2): 2, ("b", 1): 1}  # the 5-row group is anonymous


def test_k_anonymity_validates_k(spark):
    import pytest

    from ndto_spark.table_rules import k_anonymity

    df = spark.createDataFrame([("a",)], "qa string")
    with pytest.raises(ValueError):
        k_anonymity(df, ["qa"], k=1)


def test_fd_violations_distinct_and_null_split(spark):
    from ndto_spark.table_rules import fd_violations

    df = spark.createDataFrame(
        [
            ("s1", "en"), ("s1", "en"),            # clean FD
            ("s2", "en"), ("s2", "de"),            # 2 distinct rhs
            ("s3", "en"), ("s3", None),            # value + NULL split
            ("s4", None), ("s4", None),            # all NULL: not flagged
        ],
        "src string, lang string",
    )
    rows = fd_violations(df, ["src"], "lang").collect()
    got = {r.src: r for r in rows}
    assert set(got) == {"s2", "s3"}
    assert (got["s2"].n_rhs, got["s2"].rhs_min, got["s2"].rhs_max) == (
        2, "de", "en")
    assert (got["s3"].n_rhs, got["s3"].n_nulls) == (1, 1)


def test_monotonicity_violations_strict_and_default(spark):
    from ndto_spark.table_rules import monotonicity_violations

    df = spark.createDataFrame(
        # user u: seq 1, 3, 2 (dip), 2 (tie) ordered by t
        [("u", 1, 1), ("u", 2, 3), ("u", 3, 2), ("u", 4, 2), ("v", 1, 9)],
        "user string, t long, seq long",
    )
    loose = monotonicity_violations(df, "user", ["t"], "seq").collect()
    assert [(r.user, r.value, r.prev_value) for r in loose] == [("u", 2, 3)]
    strict = monotonicity_violations(
        df, "user", ["t"], "seq", strict=True
    ).collect()
    assert sorted((r.value, r.prev_value) for r in strict) == [(2, 2), (2, 3)]


def test_join_skew_report_fanout_and_missing_sides(spark):
    from ndto_spark.table_rules import join_skew_report

    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)], "k string"
    )
    right = spark.createDataFrame([("a",)] * 4 + [("b",)], "k string")
    rows = join_skew_report(left, right, ["k"], min_fanout=2).collect()
    got = {r.k: (r.n_left, r.n_right, r.fanout) for r in rows}
    assert got == {"a": (3, 4, 12), "b": (2, 1, 2)}  # c: fanout 0, dropped
    # min_fanout=0 surfaces the anti-joined key too
    all_rows = {r.k for r in
                join_skew_report(left, right, ["k"], min_fanout=0).collect()}
    assert all_rows == {"a", "b", "c"}


def test_completeness_report_fill_rates_and_verdicts(spark):
    from ndto_spark.table_rules import completeness_report

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None), (5, "e")],
        "id bigint, s string",
    )
    rows = completeness_report(df, ["id", "s"], min_fill_e6=700_000).collect()
    got = {r.column_name: (r.n_rows, r.n_nulls, r.fill_e6, r["pass"]) for r in rows}
    assert got == {
        "id": (5, 0, 1_000_000, True),
        "s": (5, 2, 600_000, False),  # floor(3e6/5)
    }


def test_freshness_report_lags_and_stale_flags(spark):
    import datetime as dt

    from ndto_spark.table_rules import freshness_report

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", t0),
        ("a", t0 + dt.timedelta(seconds=100)),
        ("b", t0 + dt.timedelta(seconds=40)),
        ("c", t0 + dt.timedelta(seconds=99, microseconds=900_000)),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = freshness_report(df, "ts", ["g"], max_lag_seconds=30).collect()
    got = {r.g: (r.n_rows, r.lag_seconds, r.stale) for r in out}
    # per-timestamp epoch floor: c's 99.9s floors to 99 → lag 1, fresh
    assert got == {"a": (2, 0, False), "b": (1, 60, True), "c": (1, 1, False)}


def test_robust_outlier_report_hand_values(spark):
    from ndto_spark.table_rules import robust_outlier_report

    # group a: values 1..9 plus a 1000 spike → median 5.5 (even n=10),
    # deviations {0.5..4.5, 994.5} → MAD 2.5; spike is the only outlier
    rows = [("a", v) for v in list(range(1, 10)) + [1000]] + [
        ("b", v) for v in (10, 10, 10)
    ]
    df = spark.createDataFrame(rows, "g string, c bigint")
    got = {
        r.g: (r.median_x2, r.mad_x2, r.n_rows, r.n_outliers)
        for r in robust_outlier_report(df, "c", ["g"], k=5).collect()
    }
    assert got["a"] == (11, 5, 10, 1)  # 5.5*2, 2.5*2
    assert got["b"] == (20, 0, 3, 0)  # constant group: MAD 0, no outliers


def test_coverage_gaps_finds_planted_holes(spark):
    import datetime as dt

    from ndto_spark.temporal import coverage_gaps

    t0 = dt.datetime(2024, 1, 1, 0, 30, 0)
    hours = {"a": [0, 1, 4], "b": [0, 2, 3, 4]}  # a misses 2,3; b misses 1
    rows = [
        (g, t0 + dt.timedelta(hours=h)) for g, hs in hours.items() for h in hs
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = coverage_gaps(df, "ts", ["g"], granularity_seconds=3600).collect()
    got = sorted((r.g, r.bucket_start) for r in out)
    assert got == [
        ("a", "2024-01-01 02:00:00"),
        ("a", "2024-01-01 03:00:00"),
        ("b", "2024-01-01 01:00:00"),
    ]


def test_l_diversity_flags_low_diversity_groups(spark):
    import pytest

    from ndto_spark.table_rules import l_diversity

    rows = (
        [("a", 1, u) for u in (1, 1, 1, 2)]  # 2 distinct < 3 → risky
        + [("b", 1, u) for u in (1, 2, 3)]  # 3 distinct → diverse
        + [("a", 2, 9)]  # singleton → risky
    )
    df = spark.createDataFrame(rows, "q1 string, q2 int, s bigint")
    got = {
        (r.q1, r.q2): (r.n_rows, r.n_sensitive)
        for r in l_diversity(df, ["q1", "q2"], "s", l=3).collect()
    }
    assert got == {("a", 1): (4, 2), ("a", 2): (1, 1)}
    with pytest.raises(ValueError):
        l_diversity(df, ["q1"], "s", l=1)


def test_benford_report_shares_and_expectations(spark):
    import math

    from ndto_spark.table_rules import benford_report

    # 10 ones, 5 twos, 5 nines; zero/negative/NULL excluded from the base
    rows = (
        [(100.2,)] * 10 + [(25.0,)] * 5 + [(9.4,)] * 5 + [(0.2,), (None,)]
    )
    df = spark.createDataFrame(rows, "v double")
    got = {
        r.digit: (r.n_rows, r.share_e6, r.expected_e6, r.deviates)
        for r in benford_report(df, "v", tolerance_e6=100_000).collect()
    }
    # 0.2 rounds to 0 → excluded; NULL excluded → base = 20
    e = lambda d: math.floor(math.log(1 + 1 / d) / math.log(10) * 1e6)
    assert got == {
        1: (10, 500_000, e(1), abs(500_000 - e(1)) > 100_000),
        2: (5, 250_000, e(2), abs(250_000 - e(2)) > 100_000),
        9: (5, 250_000, e(9), True),
    }
    assert got[1][3] is True and got[2][3] is False


def test_rollup_stats_levels_and_grouping_flags(spark):
    from ndto_spark.table_rules import rollup_stats
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", "x", 10), ("a", "y", 20), ("b", "x", 5)],
        "s string, l string, v long",
    )
    out = rollup_stats(df, ["s", "l"], {"sum_v": F.col("v")})
    got = {
        (r["s"], r["l"], r["s_agg"], r["l_agg"]): (r["n_rows"], r["sum_v"])
        for r in out.collect()
    }
    assert got[("a", "x", 0, 0)] == (1, 10)
    assert got[("a", None, 0, 1)] == (2, 30)   # per-s level
    assert got[(None, None, 1, 1)] == (3, 35)  # grand total
    assert len(got) == 3 + 2 + 1

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        rollup_stats(df, [])


def test_rolling_count_spikes_flags_burst_after_warmup(spark):
    import datetime as dt

    from ndto_spark.table_rules import rolling_count_spikes

    rows = []
    base = dt.datetime(2024, 1, 1)
    # 5 quiet days of 2 rows, then a 10-row burst on day 5
    for d in range(5):
        rows += [("g", base + dt.timedelta(days=d, hours=h)) for h in (1, 2)]
    rows += [
        ("g", base + dt.timedelta(days=5, minutes=m)) for m in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = {
        r["bucket"]: (r["n_rows"], r["base_n"], r["base_sum"], r["spike"])
        for r in rolling_count_spikes(
            df, "ts", "k", window=7, mult_e6=2_000_000, min_base=3
        ).collect()
    }
    b0 = min(out)
    # first 3 buckets: cold start (base_n < 3) -> no spike
    assert not out[b0][3] and not out[b0 + 1][3] and not out[b0 + 2][3]
    # burst day: 10 rows vs mean 2 over 5 base buckets -> spike
    assert out[b0 + 5] == (10, 5, 10, True)


def test_winsorize_clamps_tails_exactly(spark):
    from pyspark.sql import functions as F

    from ndto_spark.table_rules import winsorize

    # 11 values 0..1000: p(0.1) = 100, p(0.9) = 900 exactly ((n-1)*p integer)
    df = spark.createDataFrame(
        [(i, i * 100) for i in range(11)], "id long, x long"
    )
    out = {
        r["id"]: (r["clamped"], r["clipped_lo"], r["clipped_hi"])
        for r in winsorize(df, F.col("x"), ["id"], 0.1, 0.9).collect()
    }
    assert out[0] == (100.0, True, False)
    assert out[5] == (500.0, False, False)
    assert out[10] == (900.0, False, True)

    import pytest

    with pytest.raises(ValueError, match="lo < hi"):
        winsorize(df, F.col("x"), ["id"], 0.9, 0.1)


def test_ewma_monitor_sequence_and_flags(spark):
    import datetime as dt

    import pytest

    from ndto_spark.table_rules import ewma_monitor

    base = dt.datetime(2024, 1, 1)
    rows = []
    # counts per day: 4, 4, 4, 4, then a 12-row burst on day 4
    for d in range(4):
        rows += [("g", base + dt.timedelta(days=d, hours=h)) for h in range(4)]
    rows += [("g", base + dt.timedelta(days=4, minutes=m)) for m in range(12)]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = sorted(
        ewma_monitor(df, "ts", "k", warmup=3).collect(),
        key=lambda r: r["bucket"],
    )
    # pre-update baselines: day0 uses itself (4.0), stays 4.0 through day3
    assert [r["ewma_e6"] for r in out[:4]] == [4_000_000] * 4
    # day4: baseline still 4.0; 12 > 2*4 and idx=4 >= warmup -> spike
    assert out[4]["n_rows"] == 12 and out[4]["ewma_e6"] == 4_000_000
    assert out[4]["spike"] is True
    assert all(not r["spike"] for r in out[:4])
    with pytest.raises(ValueError, match="dyadic"):
        ewma_monitor(df, "ts", "k", alpha_num=1, alpha_den=3)


def test_class_prototypes_integer_means_and_null_label(spark):
    from ndto_spark.ann import class_prototypes

    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5], 7),
            (2, [0.5, -0.25], 7),
            (3, [2.0, 2.0], None),
            (4, None, 7),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    out = {
        (r["label"], r["dim"]): (r["n"], r["sum_q"], r["mean_q"])
        for r in class_prototypes(df).collect()
    }
    assert out[(7, 0)] == (2, 1_500_000_000, 750_000_000)
    # negative sum: div truncates toward zero (-750000000, not floor)
    assert out[(7, 1)] == (2, -750_000_000, -375_000_000)
    assert out[(None, 0)] == (1, 2_000_000_000, 2_000_000_000)


def test_group_trend_planted_slope_and_single_bucket(spark):
    from datetime import datetime

    from ndto_spark.table_rules import group_trend

    rows = []
    # type A: 1, 2, 3, 4 rows on 4 consecutive days -> slope exactly 1
    for day in range(4):
        for _ in range(day + 1):
            rows.append(("A", datetime(2024, 1, day + 1, 12, 0, 0)))
    # type B: one bucket only -> den = 0 -> slope NULL
    rows.append(("B", datetime(2024, 1, 1, 6, 0, 0)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["event_type"]: r for r in group_trend(df, "ts", "event_type").collect()}
    a = out["A"]
    assert (a["n_buckets"], a["total_rows"]) == (4, 10)
    # x = 0..3, y = 1..4: num = 4*20 - 6*10 = 20, den = 4*14 - 36 = 20
    assert (a["num"], a["den"], a["slope_e6"]) == (20, 20, 1_000_000)
    b = out["B"]
    assert b["den"] == 0 and b["slope_e6"] is None


def test_distinctness_profile_ratios_and_nulls(spark):
    from ndto_spark.table_rules import distinctness_profile

    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", None), (None, 2)],
        "a string, b int",
    )
    out = {r["column"]: r for r in distinctness_profile(df, ["a", "b"]).collect()}
    ra = out["a"]  # non-null: x, x, y -> distinct 2, unique-values 1
    assert (ra["n_nonnull"], ra["n_distinct"], ra["n_unique"]) == (3, 2, 1)
    assert ra["distinctness_e6"] == 666_666
    assert ra["unique_ratio_e6"] == 500_000
    assert ra["uniqueness_e6"] == 333_333
    rb = out["b"]  # non-null: 1, 2, 2
    assert (rb["n_nonnull"], rb["n_distinct"], rb["n_unique"]) == (3, 2, 1)


def test_gini_concentration_uniform_and_skewed(spark):
    from ndto_spark.table_rules import gini_concentration

    uniform = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "k string"
    )
    r = gini_concentration(uniform, "k").collect()[0]
    assert (r["n_keys"], r["total_rows"], r["gini_e6"]) == (3, 3, 0)
    skew = spark.createDataFrame(
        [("a",)] + [("b",)] * 3, "k string"
    )
    r = gini_concentration(skew, "k").collect()[0]
    # x sorted = [1, 3]: G = (2*7 - 3*4) / (2*4) = 0.25
    assert (r["n_keys"], r["total_rows"], r["gini_e6"]) == (2, 4, 250_000)
