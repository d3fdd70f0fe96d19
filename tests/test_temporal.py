"""Temporal extensions: as-of join, range join, sessionize, time rollup."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ndto_spark.temporal import (
    asof_join,
    range_join,
    session_summary,
    sessionize,
    time_rollup,
)

T = dt.datetime


@pytest.fixture()
def clicks(spark):
    return spark.createDataFrame(
        [
            (1, 1, T(2024, 1, 1, 0, 5), 1.0),
            (2, 1, T(2024, 1, 1, 0, 0, 30), 2.0),
            (3, 2, T(2024, 1, 1, 1, 0), 3.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )


@pytest.fixture()
def purchases(spark):
    return spark.createDataFrame(
        [
            (10, 1, T(2024, 1, 1, 0, 1), 10.0),
            (11, 1, T(2024, 1, 1, 0, 4), 20.0),
            (12, 2, T(2024, 1, 1, 0, 0), 30.0),
        ],
        "p_id long, user_id long, ts timestamp, p_value double",
    )


def _matches(df):
    return {r.event_id: r.p_id for r in df.collect()}


def test_asof_backward_picks_latest_at_or_before(clicks, purchases):
    out = asof_join(clicks, purchases, on="ts", by="user_id")
    assert _matches(out) == {1: 11, 2: None, 3: 12}


def test_asof_equal_timestamp_is_inclusive(spark, purchases):
    l = spark.createDataFrame(
        [(7, 1, T(2024, 1, 1, 0, 4), 0.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = asof_join(l, purchases, on="ts", by="user_id")
    assert _matches(out) == {7: 11}


def test_asof_forward(clicks, purchases):
    out = asof_join(clicks, purchases, on="ts", by="user_id", direction="forward")
    assert _matches(out) == {1: None, 2: 10, 3: None}


def test_asof_tolerance_nulls_far_matches(clicks, purchases):
    out = asof_join(
        clicks, purchases, on="ts", by="user_id", tolerance_s=120
    )
    # user 2's nearest purchase is 1 h back -> nulled; user 1's is 60 s
    assert _matches(out) == {1: 11, 2: None, 3: None}
    row = {r.event_id: r for r in out.collect()}[3]
    assert row.asof_ts_us is None and row.p_value is None


def test_asof_rejects_collisions_and_bad_direction(clicks, purchases):
    with pytest.raises(ValueError, match="collides"):
        asof_join(
            clicks,
            purchases.withColumnRenamed("p_value", "value"),
            on="ts",
            by="user_id",
        )
    with pytest.raises(ValueError, match="direction"):
        asof_join(clicks, purchases, on="ts", by="user_id", direction="nearest")


def _iv(spark, rows):
    return spark.createDataFrame(
        rows, "iv_id long, user_id long, start timestamp, end timestamp"
    )


def test_range_join_boundaries_and_multi_bucket(spark, clicks):
    pr = clicks.withColumnRenamed("ts", "cts")
    iv = _iv(
        spark,
        [
            # [00:00:30, 00:05): includes probes at 00:00:30 (start is
            # inclusive) but not 00:05 (end exclusive); spans 2+ buckets
            (100, 1, T(2024, 1, 1, 0, 0, 30), T(2024, 1, 1, 0, 5)),
            # [00:30, 02:00) catches user 2's 01:00 probe across buckets
            (101, 2, T(2024, 1, 1, 0, 30), T(2024, 1, 1, 2, 0)),
        ],
    )
    out = range_join(
        pr, iv, "user_id", "cts", "start", "end", bucket_s=120
    )
    got = sorted((r.iv_id, r.event_id) for r in out.collect())
    assert got == [(100, 2), (101, 3)]
    # end_inclusive picks up the 00:05 probe too
    out2 = range_join(
        pr, iv, "user_id", "cts", "start", "end", bucket_s=120,
        end_inclusive=True,
    )
    got2 = sorted((r.iv_id, r.event_id) for r in out2.collect())
    assert got2 == [(100, 1), (100, 2), (101, 3)]


def test_range_join_pairs_are_unique_per_interval(spark, clicks):
    # a wide interval covering many buckets still yields each pair once
    pr = clicks.withColumnRenamed("ts", "cts")
    iv = _iv(spark, [(200, 1, T(2024, 1, 1, 0, 0), T(2024, 1, 2, 0, 0))])
    out = range_join(pr, iv, "user_id", "cts", "start", "end", bucket_s=60)
    assert sorted((r.iv_id, r.event_id) for r in out.collect()) == [
        (200, 1),
        (200, 2),
    ]


def test_range_join_max_buckets_guard_raises(spark, clicks):
    pr = clicks.withColumnRenamed("ts", "cts")
    iv = _iv(spark, [(300, 1, T(2024, 1, 1, 0, 0), T(2024, 1, 2, 0, 0))])
    bad = range_join(
        pr, iv, "user_id", "cts", "start", "end", bucket_s=60, max_buckets=10
    )
    with pytest.raises(Exception, match="range_join"):
        bad.collect()


def test_sessionize_splits_on_gap(spark):
    rows = [
        (1, T(2024, 1, 1, 0, 0)),
        (1, T(2024, 1, 1, 0, 10)),
        (1, T(2024, 1, 1, 2, 0)),  # 110 min gap -> new session
        (2, T(2024, 1, 1, 5, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, "user_id", "ts", gap_s=3600)
    got = sorted((r.user_id, r.ts.minute + r.ts.hour * 60, r.session_id)
                 for r in out.collect())
    assert got == [(1, 0, 0), (1, 10, 0), (1, 120, 1), (2, 300, 0)]


def test_session_summary_counts_and_integer_sums(spark):
    rows = [
        (1, T(2024, 1, 1, 0, 0), 1.5),
        (1, T(2024, 1, 1, 0, 10), 2.25),
        (1, T(2024, 1, 1, 2, 0), 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, v double")
    out = session_summary(
        df, "user_id", "ts", gap_s=3600,
        sum_cols={"cents": F.floor(F.col("v") * 100).cast("long")},
    )
    got = {r.session_id: (r.n_events, r.cents) for r in out.collect()}
    assert got == {0: (2, 375), 1: (1, 400)}


def test_time_rollup_cascade_is_exact_and_week_starts_monday(spark):
    # 2024-01-01 is a Monday; 2023-12-31 (Sunday) belongs to the prior week
    rows = [
        (T(2023, 12, 31, 23, 30), "a", 1.0),
        (T(2024, 1, 1, 0, 15), "a", 2.0),
        (T(2024, 1, 1, 0, 45), "b", 3.0),
        (T(2024, 1, 1, 1, 15), "a", 4.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    out = time_rollup(
        df, "ts", ["k"], ("hour", "day", "week"),
        sum_cols={"cents": F.floor(F.col("v") * 100).cast("long")},
    )
    rowsd = {(r.level, r.bucket_us, r.k): (r.n, r.cents) for r in out.collect()}
    us = lambda t: int(t.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    # hour level
    assert rowsd[("hour", us(T(2024, 1, 1, 0)), "a")] == (1, 200)
    assert rowsd[("hour", us(T(2024, 1, 1, 1)), "a")] == (1, 400)
    assert rowsd[("hour", us(T(2024, 1, 1, 0)), "b")] == (1, 300)
    # day re-aggregates hours exactly
    assert rowsd[("day", us(T(2024, 1, 1)), "a")] == (2, 600)
    # week buckets: Monday 2024-01-01 vs Monday 2023-12-25
    assert rowsd[("week", us(T(2024, 1, 1)), "a")] == (2, 600)
    assert rowsd[("week", us(T(2023, 12, 25)), "a")] == (1, 100)
    # every level sums to the same totals (n=4, cents=1000)
    import collections

    tot = collections.Counter()
    for (level, _, _), (n, c) in rowsd.items():
        tot[level] += n
    assert tot == {"hour": 4, "day": 4, "week": 4}


def test_time_rollup_validates_granularities(spark):
    df = spark.createDataFrame([(T(2024, 1, 1), "a")], "ts timestamp, k string")
    with pytest.raises(ValueError, match="finest-first"):
        time_rollup(df, "ts", ["k"], ("day", "hour"))
    with pytest.raises(ValueError, match="unsupported"):
        time_rollup(df, "ts", ["k"], ("month",))


def test_latest_snapshot_keeps_newest_with_tiebreak(spark):
    from ndto_spark.temporal import latest_snapshot

    df = spark.createDataFrame(
        [
            (1, "a", 10, T(2024, 1, 1, 0, 0)),
            (2, "a", 10, T(2024, 1, 2, 0, 0)),   # newer ts wins
            (3, "a", 20, T(2024, 1, 1, 0, 0)),
            (4, "a", 20, T(2024, 1, 1, 0, 0)),   # equal ts: larger id wins
            (5, "b", 10, T(2024, 1, 5, 0, 0)),
        ],
        "event_id long, k string, sub long, ts timestamp",
    )
    out = latest_snapshot(df, ["k", "sub"], "ts", tiebreak="event_id")
    got = {(r["k"], r["sub"], r["event_id"]) for r in out.collect()}
    assert got == {("a", 10, 2), ("a", 20, 4), ("b", 10, 5)}


def test_cohort_retention_matrix(spark):
    import datetime as dt

    from ndto_spark.temporal import cohort_retention

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1, 5)), (1, d(2024, 1, 2, 9)), (1, d(2024, 1, 2, 10)),
        (2, d(2024, 1, 1, 20)), (2, d(2024, 1, 3, 1)),
        (3, d(2024, 1, 2, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = cohort_retention(df, "ts", "user_id").collect()
    c0 = min(r.cohort for r in out)
    got = {(r.cohort - c0, r.offset): r.n_users for r in out}
    # users 1,2 in day-0 cohort; user 3 in day-1 cohort
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}


def test_funnel_stages_strict_order(spark):
    import datetime as dt

    import pytest

    from ndto_spark.temporal import funnel_stages

    d = dt.datetime
    rows = [
        # user 1: full ordered funnel
        (1, d(2024, 1, 1, 0), "view"), (1, d(2024, 1, 1, 1), "click"),
        (1, d(2024, 1, 1, 2), "purchase"),
        # user 2: click BEFORE view → stalls at stage 1
        (2, d(2024, 1, 1, 0), "click"), (2, d(2024, 1, 1, 1), "view"),
        # user 3: view+click same second → strict > rejects the click
        (3, d(2024, 1, 1, 0, 0, 30), "view"),
        (3, d(2024, 1, 1, 0, 0, 30), "click"),
        # user 4: never views
        (4, d(2024, 1, 1, 0), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")
    out = funnel_stages(df, "ts", "user_id", "event_type",
                        ["view", "click", "purchase"]).collect()
    got = {r.stage: (r.step, r.n_users) for r in out}
    assert got == {1: ("view", 3), 2: ("click", 1), 3: ("purchase", 1)}
    with pytest.raises(ValueError):
        funnel_stages(df, "ts", "user_id", "event_type", [])


def test_scd2_intervals_compacts_runs_and_marks_current(spark):
    from ndto_spark.temporal import scd2_intervals

    df = spark.createDataFrame(
        [
            # key "a": x, x (dup run), y, x — 3 intervals after compaction
            (1, "a", "x", T(2024, 1, 1, 0)),
            (2, "a", "x", T(2024, 1, 1, 1)),
            (3, "a", "y", T(2024, 1, 1, 2)),
            (4, "a", "x", T(2024, 1, 1, 3)),
            # key "b": single version, current
            (5, "b", "z", T(2024, 1, 2, 0)),
        ],
        "event_id long, k string, v string, ts timestamp",
    )
    out = scd2_intervals(df, "k", "ts", ["v"], tiebreak="event_id")
    rows = sorted(out.collect(), key=lambda r: (r["k"], r["valid_from_us"]))
    got = [
        (r["k"], r["v"], r["valid_from_us"], r["valid_to_us"], r["is_current"])
        for r in rows
    ]
    h = lambda n: int(
        (T(2024, 1, 1) - T(1970, 1, 1)).total_seconds() + n * 3600
    ) * 1_000_000
    assert got == [
        ("a", "x", h(0), h(2), False),
        ("a", "y", h(2), h(3), False),
        ("a", "x", h(3), None, True),
        ("b", "z", h(24), None, True),
    ]


def test_scd2_intervals_null_safe_and_no_compact(spark):
    from ndto_spark.temporal import scd2_intervals

    df = spark.createDataFrame(
        [
            (1, "a", None, T(2024, 1, 1, 0)),
            (2, "a", None, T(2024, 1, 1, 1)),  # null == null: compacted
            (3, "a", "x", T(2024, 1, 1, 2)),
        ],
        "event_id long, k string, v string, ts timestamp",
    )
    assert scd2_intervals(df, "k", "ts", ["v"]).count() == 2
    raw = scd2_intervals(df, "k", "ts", ["v"], compact=False)
    assert raw.count() == 3
    with pytest.raises(ValueError, match="non-empty"):
        scd2_intervals(df, "k", "ts", [])


def test_transition_matrix_counts_and_probs(spark):
    from ndto_spark.temporal import transition_matrix

    rows = [
        (1, 1, "a", T(2024, 1, 1, 0)),
        (2, 1, "b", T(2024, 1, 1, 1)),
        (3, 1, "a", T(2024, 1, 1, 2)),
        (4, 1, "c", T(2024, 1, 1, 3)),
        (5, 2, "a", T(2024, 1, 1, 0)),
        (6, 2, "b", T(2024, 1, 1, 1)),
        # user 3: single event -> no transition
        (7, 3, "z", T(2024, 1, 1, 0)),
    ]
    df = spark.createDataFrame(rows, "event_id long, u long, s string, ts timestamp")
    out = {
        (r["state"], r["next_state"]): (r["n"], r["p_e6"])
        for r in transition_matrix(df, "u", "ts", "s", tiebreak="event_id").collect()
    }
    assert out == {
        ("a", "b"): (2, 666_666),
        ("a", "c"): (1, 333_333),
        ("b", "a"): (1, 1_000_000),
    }


def test_interval_overlap_join_exactly_once_and_boundaries(spark):
    from ndto_spark.temporal import interval_overlap_join

    left = spark.createDataFrame(
        [
            ("k", 1, T(2024, 1, 1, 0, 0), T(2024, 1, 1, 1, 0)),
            ("k", 2, T(2024, 1, 1, 2, 0), T(2024, 1, 1, 3, 0)),
        ],
        "k string, l_id long, l_s timestamp, l_e timestamp",
    )
    right = spark.createDataFrame(
        [
            # overlaps l1 across many tiny buckets -> must emit ONCE
            ("k", 10, T(2024, 1, 1, 0, 30), T(2024, 1, 1, 2, 30)),
            # touches l1's end exactly: half-open -> NO match with l1
            ("k", 11, T(2024, 1, 1, 1, 0), T(2024, 1, 1, 1, 30)),
            ("x", 12, T(2024, 1, 1, 0, 0), T(2024, 1, 1, 9, 0)),  # other key
        ],
        "k string, r_id long, r_s timestamp, r_e timestamp",
    )
    out = interval_overlap_join(
        left, right, "k", "l_s", "l_e", "r_s", "r_e", bucket_s=60.0
    )
    got = sorted((r["l_id"], r["r_id"]) for r in out.collect())
    assert got == [(1, 10), (2, 10)]

    import pytest

    with pytest.raises(ValueError, match="collision"):
        interval_overlap_join(
            left, left, "k", "l_s", "l_e", "l_s", "l_e", bucket_s=60.0
        )


def test_hopping_windows_fanout_and_sums(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from ndto_spark.temporal import hopping_windows

    df = spark.createDataFrame(
        [
            ("A", datetime(2024, 1, 5, 12, 0, 0), 10),
            ("A", datetime(2024, 1, 6, 1, 0, 0), 5),
        ],
        "k string, ts timestamp, v int",
    )
    out = hopping_windows(
        df, "ts", "k", window_seconds=2 * 86400, hop_seconds=86400,
        value=F.col("v"),
    ).collect()
    day5 = (datetime(2024, 1, 5) - datetime(1970, 1, 1)).days
    got = {r["window_start"] // 86400: (r["n_rows"], r["sum_v"]) for r in out}
    # day-5 event -> windows starting day 4, 5; day-6 event -> 5, 6
    assert got == {day5 - 1: (1, 10), day5: (2, 15), day5 + 1: (1, 5)}

    import pytest

    with pytest.raises(ValueError, match="multiple"):
        hopping_windows(df, "ts", "k", window_seconds=100, hop_seconds=60)
