"""Temporal relational extensions: as-of join, range join, sessionization,
hierarchical time rollup.

These are the time-series operators the reference ecosystem's users reach
for that vanilla Spark SQL lacks as primitives (cf. the task brief's
"as-of join, range join, hypertable rollup"). Each is expressed as a
composition of built-in DataFrame operators — no UDFs, no cartesian
products — so Catalyst/Tungsten keep the whole path in codegen:

- ``asof_join``: the classic point-in-time join. NOT a join at all in the
  physical plan: both sides are unioned and a single running
  ``last(ignorenulls)`` window per key carries the most recent right-side
  payload onto each left row. One Exchange on the key, zero join fan-out,
  no per-row probe — the shape that survives a 100 TB left side. (The
  textbook inequality-join formulation becomes a BroadcastNestedLoopJoin
  or an exploding theta-join at scale; this never does.)
- ``range_join``: points-to-intervals via bucketed equi-join. Intervals
  are exploded into the fixed-width time buckets they cover (bounded
  fan-out, guarded by ``max_buckets``), probes hash to one bucket, and the
  residual range predicate refines the equi-join. Shuffles on
  (key, bucket) like any equi-join — never all-pairs.
- ``sessionize``: gap-based session assignment with one window per key
  (lag + running sum). ``session_summary`` aggregates per session.
- ``time_rollup``: hypertable-style hierarchical rollup. The corpus is
  scanned ONCE at the finest granularity; every coarser level re-aggregates
  the finest partials (count + integer sums are exactly re-aggregable), so
  at 100 TB the hour→day→week cascade costs one corpus scan plus
  aggregations over the (tiny) bucket table.

All time arithmetic is integer microseconds — exact and engine-portable,
so the DuckDB gate oracles compare bit-for-bit. TIMESTAMP_NTZ columns
(what parquet scans usually yield) are converted with wall-clock
``timestamp_diff`` arithmetic, NEVER a cast through TIMESTAMP: the cast
re-interprets the wall clock in the session timezone, so the same parquet
file would produce different epochs under different ``session.timeZone``
settings (and disagree with DuckDB's ``epoch_us``, which reads NTZ as
UTC wall clock). Bucket truncation is likewise integer modulo on µs —
``F.date_trunc`` silently converts NTZ to session-tz TIMESTAMP and would
shift bucket boundaries off UTC.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000

# fixed-width granularities only: calendar units (month/quarter/year) are
# variable-width and would need tz-sensitive date arithmetic
_GRANULARITY_US = {
    "minute": 60 * _US,
    "hour": 3600 * _US,
    "day": 86400 * _US,
    "week": 7 * 86400 * _US,
}
# 1970-01-01 is a Thursday: shift by 3 days so week buckets start Monday
# (date_trunc('week') parity in both Spark and DuckDB)
_EPOCH_MONDAY_SHIFT_US = 3 * 86400 * _US


def _as_list(x: str | Sequence[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def ts_to_us(df: DataFrame, col: str) -> Column:
    """Epoch microseconds (BIGINT) of a timestamp column, timezone-proof:
    TIMESTAMP uses ``unix_micros``; TIMESTAMP_NTZ uses wall-clock
    ``timestamp_diff`` from the NTZ epoch (identical to DuckDB's
    ``epoch_us`` regardless of ``spark.sql.session.timeZone``)."""
    dt = dict(df.dtypes).get(col)
    if dt == "timestamp_ntz":
        return F.timestamp_diff(
            "MICROSECOND",
            F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")),
            F.col(col),
        )
    return F.unix_micros(F.col(col))


def _trunc_us(us: Column, granularity: str) -> Column:
    """Truncate epoch-µs to the start of its bucket (pure integer modulo;
    assumes post-1970 timestamps — negative epochs would round up)."""
    w = _GRANULARITY_US[granularity]
    if granularity == "week":
        return us - ((us + F.lit(_EPOCH_MONDAY_SHIFT_US)) % F.lit(w))
    return us - (us % F.lit(w))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    *,
    tolerance_s: float | None = None,
    direction: str = "backward",
    matched_ts_col: str = "asof_ts_us",
) -> DataFrame:
    """Point-in-time join: attach to each left row the nearest right row
    per key — at-or-before its timestamp (``direction="backward"``, the
    default) or at-or-after (``"forward"``).

    ``on`` must name a timestamp column present in BOTH frames; ``by`` the
    equi-key column(s). Every right column other than ``by``/``on`` is
    carried onto the matched left rows (column names must not collide with
    left's — rename beforehand). ``matched_ts_col`` receives the matched
    right timestamp as BIGINT microseconds (NULL when unmatched). With
    ``tolerance_s``, a nearest match farther than the tolerance nulls the
    payload (tolerance bounds the match, it does not pick a farther one).

    Right rows must be unique per (by, on); equal-timestamp duplicates
    would make "the" nearest row ambiguous (dedupe upstream).

    Plan shape: union + one running-frame window — a single Exchange on
    ``by``, no join operator, no fan-out. Scale note: a pathologically hot
    key serializes its partition through one task (window functions are
    order-dependent and cannot be salted); at 100 TB shard such keys
    upstream if per-key order across shards is not required.

    Two session defaults gut the window stage at scale (measured on a
    40M-row leg, tools/scaling_bench.py):

    - AQE's 64 MB ``advisoryPartitionSizeInBytes`` coalesces this
      operator's narrow unioned rows (~40 B) into multi-million-row sort
      partitions — 2.2x slower than ~750k-row partitions. Lower the
      advisory size (8m) or raise ``spark.sql.shuffle.partitions`` so
      post-shuffle sorts stay cache-sized.
    - ``spark.sql.windowExec.buffer.in.memory.threshold`` (default 4096)
      pushes every key group larger than 4096 rows into a per-group
      UnsafeExternalSorter; raise it when keys carry more rows than that.

    With both set, the window stage scales 0.91 N→4N on the two-size
    harness — as well as the bare sort machinery it sits on (0.85).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = _as_list(by)
    payload = [c for c in right.columns if c not in set(by) | {on}]
    if not payload:
        raise ValueError("right frame has no payload columns beyond by/on")
    collisions = set(payload) & set(left.columns)
    if collisions:
        raise ValueError(f"right payload collides with left columns: {sorted(collisions)}")
    if matched_ts_col in left.columns or matched_ts_col in payload:
        raise ValueError(f"matched_ts_col {matched_ts_col!r} collides")

    p_struct = F.struct(
        ts_to_us(right, on).alias("__m_us"),
        *[F.col(c) for c in payload],
    )
    p_type = right.select(p_struct.alias("p")).schema["p"].dataType.simpleString()

    lcols = left.columns
    ldtypes = dict(left.dtypes)
    lpart = left.select(
        *[F.col(c) for c in lcols],
        ts_to_us(left, on).alias("__t_us"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(p_type).alias("__p"),
    )
    rpart = right.select(
        *[
            (F.col(c) if c in by else F.lit(None).cast(ldtypes[c])).alias(c)
            for c in lcols
        ],
        ts_to_us(right, on).alias("__t_us"),
        F.lit(0).alias("__side"),
        p_struct.alias("__p"),
    )

    # at equal timestamps the right row sorts first (side 0 < 1) in both
    # directions, making the match inclusive — DuckDB ASOF (ts >= / <=)
    # parity.
    order = (
        [F.col("__t_us").asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__t_us").desc(), F.col("__side").asc()]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__p", ignorenulls=True).over(w)
    out = lpart.union(rpart).withColumn("__m", matched).filter(F.col("__side") == 1)

    if tolerance_s is not None:
        tol_us = int(round(tolerance_s * _US))
        delta = (
            F.col("__t_us") - F.col("__m.__m_us")
            if direction == "backward"
            else F.col("__m.__m_us") - F.col("__t_us")
        )
        out = out.withColumn(
            "__m", F.when(delta <= F.lit(tol_us), F.col("__m"))
        )

    return out.select(
        *[F.col(c) for c in lcols],
        F.col("__m.__m_us").alias(matched_ts_col),
        *[F.col(f"__m.{c}").alias(c) for c in payload],
    )


def range_join(
    probe: DataFrame,
    intervals: DataFrame,
    by: str | Sequence[str],
    probe_ts: str,
    start_ts: str,
    end_ts: str,
    *,
    bucket_s: float,
    max_buckets: int = 1 << 12,
    end_inclusive: bool = False,
) -> DataFrame:
    """Join probe rows to every interval [start, end) (or [start, end]
    with ``end_inclusive``) that contains them, per key.

    Physical shape: intervals explode into the fixed-width ``bucket_s``
    time buckets they cover; probes hash to exactly one bucket; the join
    is a plain equi-join on (by…, bucket) refined by the exact range
    predicate. Each qualifying (probe, interval) pair is produced exactly
    once (the probe's single bucket is covered once per interval).

    Pick ``bucket_s`` near the typical interval length: fan-out per
    interval is ``len/bucket_s + 1`` rows. ``max_buckets`` guards against
    a degenerate interval exploding the build side (fails the job loudly
    via ``assert_true`` rather than silently materializing it).

    Output columns are all interval columns followed by all probe columns
    (names must be disjoint). Scale note: shuffles on (by, bucket) — skew
    only if one key×bucket is hot, which salting the probe side + double
    bucket replication would address; at the gate scale AQE's skew-join
    handles it.
    """
    by = _as_list(by)
    dup = (set(intervals.columns) & set(probe.columns)) - set(by)
    if dup:
        raise ValueError(f"interval/probe column collision: {sorted(dup)}")
    w_us = int(round(bucket_s * _US))
    if w_us <= 0:
        raise ValueError("bucket_s must be positive")

    s_us = ts_to_us(intervals, start_ts)
    e_us = ts_to_us(intervals, end_ts)
    last_us = e_us if end_inclusive else e_us - F.lit(1)
    first_b = F.floor(s_us / F.lit(w_us))
    last_b = F.floor(last_us / F.lit(w_us))
    n_b = last_b - first_b + F.lit(1)
    guard = F.assert_true(
        n_b <= F.lit(int(max_buckets)),
        F.concat(
            F.lit(f"range_join: interval covers > {max_buckets} buckets "
                  f"of {bucket_s}s (raise bucket_s or max_buckets); start="),
            F.col(start_ts).cast("string"),
        ),
    )
    iv = intervals.filter(last_us >= s_us).select(
        "*",
        F.when(guard.isNull(), F.sequence(first_b, last_b)).alias("__bs"),
    )
    iv = iv.select(
        *[F.col(c) for c in intervals.columns],
        F.explode("__bs").alias("__b"),
    )

    pr = probe.withColumn(
        "__b", F.floor(ts_to_us(probe, probe_ts) / F.lit(w_us))
    )
    # the joined frame preserves each side's dtypes, so the source frames'
    # dtype maps stay valid for the refinement predicate
    p_us = ts_to_us(probe, probe_ts)
    upper = (p_us <= e_us) if end_inclusive else (p_us < e_us)
    joined = iv.join(pr, on=by + ["__b"], how="inner").filter(
        (p_us >= s_us) & upper
    )
    out_cols = list(intervals.columns) + [
        c for c in probe.columns if c not in by
    ]
    return joined.select(*out_cols)


def sessionize(
    df: DataFrame,
    by: str | Sequence[str],
    ts: str,
    gap_s: float,
    *,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    gap since the key's previous event exceeds ``gap_s``. Session ids are
    0-based, ordered by time within each key.

    One window per key (lag + running sum) — a single Exchange; the
    standard sessionization shape. See ``asof_join`` for the hot-key note.
    """
    by = _as_list(by)
    if session_col in df.columns:
        raise ValueError(f"session_col {session_col!r} collides")
    gap_us = int(round(gap_s * _US))
    t = ts_to_us(df, ts)
    w = Window.partitionBy(*by).orderBy(t.asc())
    prev = F.lag(t).over(w)
    brk = (prev.isNull() | ((t - prev) > F.lit(gap_us))).cast("long")
    run = Window.partitionBy(*by).orderBy(t.asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(brk).over(run) - F.lit(1))


def session_summary(
    df: DataFrame,
    by: str | Sequence[str],
    ts: str,
    gap_s: float,
    *,
    sum_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-session aggregates over ``sessionize``'s assignment: row count,
    first/last event time (BIGINT µs), plus optional integer-valued sums
    (pass pre-quantized expressions — integer sums are order-independent,
    keeping the output engine-exact)."""
    by = _as_list(by)
    s = sessionize(df, by, ts, gap_s)
    t = ts_to_us(df, ts)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(t).alias("start_us"),
        F.max(t).alias("end_us"),
    ]
    for name, col in (sum_cols or {}).items():
        aggs.append(F.sum(col).alias(name))
    return s.groupBy(*by, "session_id").agg(*aggs)


def latest_snapshot(
    df: DataFrame,
    keys: str | Sequence[str],
    ts: str,
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """CDC-style compaction: keep each key's newest row (the
    upsert-stream → current-snapshot collapse a training-data refresh
    needs before dedup/packing).

    Newest = max ``ts`` per key; ``tiebreak`` (a column name, larger wins)
    makes equal-timestamp updates deterministic — required when the
    source can emit several versions in one timestamp tick.

    One window per key (row_number over a single Exchange) — the standard
    top-1-per-group shape; Spark's WindowGroupLimit pushes the rank <= 1
    filter below the sort at scale, so no per-key full sort survives in
    the physical plan."""
    keys = _as_list(keys)
    order = [ts_to_us(df, ts).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def time_rollup(
    df: DataFrame,
    ts: str,
    group_cols: Sequence[str],
    granularities: Sequence[str] = ("hour", "day", "week"),
    *,
    sum_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Hierarchical tumbling-window rollup (hypertable continuous-aggregate
    style): counts + integer sums per (granularity, bucket, group…).

    The input is aggregated ONCE at the finest granularity; every coarser
    level re-aggregates those partials (exact for counts and integer sums
    — pass pre-quantized integer expressions in ``sum_cols``). At 100 TB
    the corpus is scanned a single time; the cascade runs over the bucket
    table (≤ buckets × groups rows).

    Output: ``level`` (granularity name), ``bucket_us`` (BIGINT µs, bucket
    start), the group columns, ``n`` plus one column per ``sum_cols`` key.
    """
    grans = list(granularities)
    if not grans:
        raise ValueError("need at least one granularity")
    for g in grans:
        if g not in _GRANULARITY_US:
            raise ValueError(
                f"unknown/unsupported granularity {g!r} "
                f"(fixed-width only: {sorted(_GRANULARITY_US)})"
            )
    finest = grans[0]
    for g in grans[1:]:
        if _GRANULARITY_US[g] <= _GRANULARITY_US[finest]:
            raise ValueError(
                f"granularities must be finest-first: {g!r} not coarser than {finest!r}"
            )
    sum_cols = sum_cols or {}
    group_cols = list(group_cols)

    base_aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(col).alias(name) for name, col in sum_cols.items()
    ]
    partial = df.groupBy(
        _trunc_us(ts_to_us(df, ts), finest).alias("__bucket_us"), *group_cols
    ).agg(*base_aggs)
    # one Exchange feeds every level's re-aggregation (ReuseExchange);
    # cheap because the partial table is already bucket-sized. Every
    # supported width divides the coarser ones, so re-truncating the
    # finest bucket start is exact.
    measure_names = ["n"] + list(sum_cols)

    levels = [
        partial.select(
            F.lit(finest).alias("level"),
            F.col("__bucket_us").alias("bucket_us"),
            *group_cols,
            *measure_names,
        )
    ]
    for g in grans[1:]:
        lv = partial.groupBy(
            _trunc_us(F.col("__bucket_us"), g).alias("__b2"), *group_cols
        ).agg(*[F.sum(m).alias(m) for m in measure_names])
        levels.append(
            lv.select(
                F.lit(g).alias("level"),
                F.col("__b2").alias("bucket_us"),
                *group_cols,
                *measure_names,
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def coverage_gaps(
    df: DataFrame,
    ts_col: str,
    group_cols: "str | Sequence[str]",
    granularity_seconds: int = 3600,
) -> DataFrame:
    """Time-coverage gap detection: which (group, time-bucket) cells
    between the table's global first and last bucket have NO rows? The
    ingestion-hole probe that freshness_report's tail-lag check can't see
    (a feed that backfilled its newest hour but dropped three in the
    middle is fresh yet gappy).

    Output: (group..., bucket, bucket_start) — one row per missing cell,
    bucket = floor(epoch/granularity) as an exact bigint.

    100 TB shape: the observed set is a partial-agg groupBy of (group,
    bucket) — |groups|·|buckets| rows max, time-bounded not data-bounded;
    the expected grid is a broadcast 1-row bounds frame crossed with the
    distinct groups and exploded (groups × buckets rows); missing cells
    fall out of a left-anti join between two SMALL frames. The corpus is
    scanned twice but only (group, ts) columns survive pruning.
    """
    gc = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    bucket = F.floor(
        F.unix_timestamp(F.col(ts_col)) / F.lit(granularity_seconds)
    ).cast("bigint")
    observed = df.select(*gc, bucket.alias("bucket")).distinct()
    bounds = observed.agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    groups = df.select(*gc).distinct()
    grid = groups.crossJoin(F.broadcast(bounds)).select(
        *gc,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket"),
    )
    missing = grid.join(observed, [*gc, "bucket"], "left_anti")
    return missing.select(
        *gc,
        "bucket",
        F.from_unixtime(
            F.col("bucket") * F.lit(granularity_seconds),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("bucket_start"),
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    granularity_seconds: int = 86400,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by their FIRST-seen period
    (the cohort), then counted per (cohort, offset) where offset = how
    many periods after the cohort's start the user was active again. The
    standard product/feed-health view (and, for training corpora, the
    contributor-churn view).

    Output: (cohort, offset, n_users) with cohort an exact bigint period
    index and n_users = DISTINCT users from that cohort active at that
    offset (offset 0 row == cohort size).

    100 TB shape: two partial-aggregated groupBys — first-seen per user
    (|users| rows), then the (cohort, offset) matrix over the DISTINCT
    (user, period) activity set; the join back is on the user key the
    first aggregate already partitioned by.
    """
    bucket = F.floor(
        F.unix_timestamp(F.col(ts_col)) / F.lit(granularity_seconds)
    ).cast("bigint")
    act = df.select(
        F.col(user_col).alias("u"), bucket.alias("p")
    ).distinct()
    first = act.groupBy("u").agg(F.min("p").alias("cohort"))
    return (
        act.join(first, "u")
        .groupBy("cohort", (F.col("p") - F.col("cohort")).alias("offset"))
        .agg(F.countDistinct("u").cast("bigint").alias("n_users"))
    )


def funnel_stages(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel analysis: how many users completed step k of
    ``steps`` IN ORDER (each step strictly after the previous one in
    event time)? The classic conversion view (view → click → purchase),
    and for pipelines an ordered-milestone audit (ingested → validated →
    published).

    Stage semantics: t₁ = the user's first ``steps[0]`` event; tₖ = the
    first ``steps[k-1]`` event STRICTLY after tₖ₋₁. Timestamps compare as
    exact integer epoch seconds.

    Output: (stage, step, n_users), stage 1-based; n_users is
    monotonically non-increasing by construction.

    100 TB shape: one partial-agg groupBy per stage over the (user, ts,
    type) projection, each joined back on the user key the previous
    aggregate already produced (broadcast-sized once the funnel narrows);
    no windows, no per-user arrays.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.unix_timestamp(F.col(ts_col)).cast("bigint").alias("ep"),
        F.col(type_col).alias("t"),
    )
    prev = None
    outs = []
    for k, step in enumerate(steps):
        if prev is None:
            cur = ev.filter(F.col("t") == step).groupBy("u").agg(
                F.min("ep").alias("tk")
            )
        else:
            cur = (
                ev.filter(F.col("t") == step)
                .join(prev.select("u", F.col("tk").alias("_pt")), "u")
                .filter(F.col("ep") > F.col("_pt"))
                .groupBy("u")
                .agg(F.min("ep").alias("tk"))
            )
        outs.append(
            cur.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
                F.lit(k + 1).cast("bigint").alias("stage"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
        prev = cur
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def scd2_intervals(
    df: DataFrame,
    keys: str | Sequence[str],
    ts: str,
    attrs: Sequence[str],
    *,
    tiebreak: str | None = None,
    compact: bool = True,
) -> DataFrame:
    """SCD Type-2 history build: turn a change/upsert stream into validity
    intervals — one row per (key, version) with ``valid_from_us`` /
    ``valid_to_us`` (NULL = current) and ``is_current``. The companion to
    ``latest_snapshot``: that keeps only the newest version, this keeps
    the full history as half-open intervals [valid_from, valid_to), the
    shape a training-data time-travel join (or ``asof_join``) consumes.

    ``compact=True`` (default) first drops rows whose tracked ``attrs``
    all equal the key's previous row (null-safe compare) — a run of
    identical versions collapses to its first row, so intervals describe
    CHANGES, not raw event cadence.

    Versions order by (event time, ``tiebreak``) — pass a tiebreak column
    when the source can emit several versions in one timestamp tick.

    100 TB shape: ONE Exchange on the key feeds both windows (the lag
    compare and the lead carrying valid_to) — the compaction filter
    preserves the sort order, so the second Window adds no sort. No
    joins, no driver state; per-key state in the window is one row.
    """
    keys = _as_list(keys)
    attrs = list(attrs)
    if not attrs:
        raise ValueError("attrs must be non-empty")
    t = ts_to_us(df, ts)
    order = [t.asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    d = df.withColumn("__vf_us", t)
    if compact:
        changed = F.row_number().over(w) == 1
        for a in attrs:
            changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
        d = d.withColumn("__chg", changed).filter("__chg").drop("__chg")
    # survivors keep the (key, time) ordering through the filter, so this
    # lead re-uses the same Exchange + sort
    d = d.withColumn("valid_to_us", F.lead("__vf_us").over(w))
    return d.select(
        *keys,
        *attrs,
        F.col("__vf_us").alias("valid_from_us"),
        "valid_to_us",
        F.col("valid_to_us").isNull().alias("is_current"),
    )


def transition_matrix(
    df: DataFrame,
    by: str | Sequence[str],
    ts: str,
    state_col: str,
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """First-order Markov transition counts over per-key event sequences:
    for each key, order events by time and count (state → next_state)
    adjacencies — the behavioral-sequence profile (navigation flows,
    pipeline stage hops) and the input to sequence-anomaly scoring.

    Output: (state, next_state, n, p_e6) where p_e6 is the exact integer
    ``(n · 1e6) div row-total`` — a quantized row-stochastic matrix with
    no float division in sight.

    100 TB shape: ONE window Exchange on the key (lead over (key, time)),
    then a partial-aggregated groupBy over the |states|² pair space and a
    broadcast-sized row-total join. The corpus sorts per key once;
    nothing else is data-sized.
    """
    by = _as_list(by)
    order = [ts_to_us(df, ts).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*by).orderBy(*order)
    pairs = (
        df.withColumn("next_state", F.lead(state_col).over(w))
        .filter(F.col("next_state").isNotNull())
        .select(F.col(state_col).alias("state"), "next_state")
    )
    counts = pairs.groupBy("state", "next_state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = counts.groupBy("state").agg(F.sum("n").alias("_tot"))
    return (
        counts.join(F.broadcast(totals), "state")
        .select(
            "state",
            "next_state",
            "n",
            F.expr("(n * 1000000L) div _tot").alias("p_e6"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    by: str | Sequence[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    *,
    bucket_s: float,
    max_buckets: int = 1 << 12,
) -> DataFrame:
    """Interval×interval OVERLAP join per key (half-open [start, end)):
    every (left, right) pair whose spans intersect — ``range_join``'s
    two-sided sibling (sessions × incidents, downtime × experiment
    windows, speech segments × transcript spans).

    Physical shape: BOTH sides explode into the fixed-width buckets they
    cover and equi-join on (by…, bucket) with the exact overlap predicate
    ``l_s < r_e AND r_s < l_e`` as the residual. A pair sharing several
    buckets is emitted EXACTLY once — only in the bucket containing
    ``greatest(l_start, r_start)`` (the overlap's first bucket), a pure
    filter instead of a pair-level dropDuplicates shuffle. Same
    ``max_buckets`` loud-failure guard as range_join, applied per side.

    Output: all left columns then all non-key right columns (names must
    be disjoint). Shuffles on (by, bucket) like any equi-join.
    """
    by = _as_list(by)
    dup = (set(left.columns) & set(right.columns)) - set(by)
    if dup:
        raise ValueError(f"left/right column collision: {sorted(dup)}")
    w_us = int(round(bucket_s * _US))
    if w_us <= 0:
        raise ValueError("bucket_s must be positive")
    # round-robin both sides ahead of the bucket explode (dedup._spread
    # rationale): the sequence+explode and the join's map side otherwise
    # ride the scan's file-layout-bound task count (one compact parquet
    # file = one core); interval rows are a handful of narrow columns
    from .dedup import _spread

    left = _spread(left)
    right = _spread(right)

    def _explode(df: DataFrame, start: str, end: str, cols: list) -> DataFrame:
        s_us = ts_to_us(df, start)
        e_us = ts_to_us(df, end)
        first_b = F.floor(s_us / F.lit(w_us))
        last_b = F.floor((e_us - F.lit(1)) / F.lit(w_us))
        guard = F.assert_true(
            last_b - first_b + F.lit(1) <= F.lit(int(max_buckets)),
            F.concat(
                F.lit(
                    f"interval_overlap_join: interval covers > {max_buckets}"
                    f" buckets of {bucket_s}s; start="
                ),
                F.col(start).cast("string"),
            ),
        )
        d = df.filter(e_us > s_us).select(
            "*",
            F.when(guard.isNull(), F.sequence(first_b, last_b)).alias("__bs"),
        )
        return d.select(*cols, F.explode("__bs").alias("__b"))

    li = _explode(left, l_start, l_end, left.columns)
    ri = _explode(
        right, r_start, r_end, [c for c in right.columns]
    )
    # shuffle_hash with the (usually far smaller) right side as build:
    # sort-merge would sort the full exploded left bucket stream
    joined = li.join(ri.hint("shuffle_hash"), on=by + ["__b"], how="inner")
    l_s, l_e = ts_to_us(left, l_start), ts_to_us(left, l_end)
    r_s, r_e = ts_to_us(right, r_start), ts_to_us(right, r_end)
    once = F.col("__b") == F.floor(F.greatest(l_s, r_s) / F.lit(w_us))
    out_cols = list(left.columns) + [c for c in right.columns if c not in by]
    return joined.filter((l_s < r_e) & (r_s < l_e) & once).select(*out_cols)


def hopping_windows(
    df: DataFrame,
    ts_col: str,
    group_cols: "str | Sequence[str]",
    window_seconds: int = 259200,
    hop_seconds: int = 86400,
    value: "Column | None" = None,
) -> DataFrame:
    """Hopping (sliding) window aggregates — the overlapping-window sibling
    of ``time_rollup``'s tumbling buckets (Flink HOP / Spark streaming
    window(slide) semantics for batch): every event lands in
    ``window_seconds / hop_seconds`` consecutive windows, so a 3-day
    window hopping daily smooths single-day spikes a tumbling day can't.

    ``window_seconds`` must be a multiple of ``hop_seconds``. Output per
    (group…, window_start epoch-seconds): n_rows, and sum_v when ``value``
    (an integer-quantized expression, repo convention) is given. Windows
    are half-open ``[start, start + window)``.

    100 TB shape: one cheap integer-sequence explode (fan-out =
    window/hop, a SMALL constant) followed by a partial-agg groupBy —
    map-side combine reduces each task to (groups × windows) state before
    the shuffle; no per-key sort, no window functions over row data.
    """
    gc = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if window_seconds <= 0 or hop_seconds <= 0:
        raise ValueError("window_seconds and hop_seconds must be positive")
    if window_seconds % hop_seconds:
        raise ValueError(
            f"window_seconds ({window_seconds}) must be a multiple of "
            f"hop_seconds ({hop_seconds})"
        )
    k = window_seconds // hop_seconds
    h = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(hop_seconds)).cast(
        "bigint"
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    cols = [*gc, h.alias("_h")]
    if value is not None:
        cols.append(value.cast("bigint").alias("_v"))
        aggs.append(F.sum("_v").cast("bigint").alias("sum_v"))
    rows = df.select(*cols)
    exploded = rows.withColumn(
        "_w", F.explode(F.sequence(F.col("_h") - F.lit(k - 1), F.col("_h")))
    )
    return (
        exploded.groupBy(*gc, (F.col("_w") * F.lit(hop_seconds)).alias(
            "window_start"
        ))
        .agg(*aggs)
    )
