"""Deterministic sampling for training-data pipelines.

Hash-based keep/drop: a row is kept iff md5_low32(key ":" seed) mod 10^6
falls below fraction * 10^6. Unlike ``df.sample``, the decision is a pure
function of the KEY — reproducible across runs, engines (the DuckDB
oracles replicate it exactly), cluster sizes, and partitionings, and
consistent across tables sharing the key (sample a join consistently by
sampling both sides with the same key). Expression-side, zero shuffle,
zero Python: at 100 TB this is a parquet scan with a pushed-down-ish
filter, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dedup import md5_low32

_DENOM = 1_000_000


def sample_bucket(key: Column, seed: int = 42) -> Column:
    """Deterministic bucket in [0, 10^6) from a key column."""
    return md5_low32(
        F.concat(key.cast("string"), F.lit(f":{seed}"))
    ) % F.lit(_DENOM)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, decided by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(round(fraction * _DENOM))
    return df.filter(sample_bucket(F.col(key_col), seed) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: Column,
    fractions: dict,
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (df.sampleBy, reproducibly).

    ``fractions`` maps stratum value → keep fraction; strata not listed
    keep ``default_fraction``. The keep decision still hashes only the
    key, so the same key is kept or dropped consistently wherever its
    stratum's fraction is the same — upsample/downsample mixtures without
    breaking cross-table consistency.
    """
    thr: Column = F.lit(int(round(default_fraction * _DENOM)))
    for val, frac in sorted(fractions.items(), key=lambda kv: str(kv[0])):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {val!r} must be in [0, 1]")
        thr = F.when(
            stratum_col == F.lit(val), F.lit(int(round(frac * _DENOM)))
        ).otherwise(thr)
    return df.filter(sample_bucket(F.col(key_col), seed) < thr)


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Disjoint deterministic train/val/test assignment: every row lands
    in exactly ONE named split, decided by the same md5-low32 key bucket
    ``deterministic_sample`` uses.

    ``splits`` partitions the [0, 10^6) bucket space into contiguous
    ranges in dict order, so ``{"train": .9, "val": .05, "test": .05}``
    sends bucket < 900000 to train, [900000, 950000) to val, the rest to
    test. Fractions must sum to 1 (±1e-9); the LAST split absorbs the
    integer rounding so the ranges exactly cover the space. The
    assignment is a pure function of the key: the same ``key_col`` value
    lands in the same split across runs, engines, cluster sizes, and
    TABLES — assign both sides of a join with the same key and the split
    never leaks pairs across the train/test boundary.

    100 TB shape: a pure projection — zero shuffle, zero Python; Catalyst
    folds the when-chain into the scan's whole-stage codegen, and a
    downstream ``filter(split = 'train')`` prunes at scan time.
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    for name, frac in splits.items():
        if frac < 0:
            raise ValueError(f"fraction for {name!r} must be >= 0, got {frac}")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if split_col in df.columns:
        raise ValueError(
            f"split_col {split_col!r} collides with an input column"
        )
    names = list(splits)
    bucket = sample_bucket(F.col(key_col), seed)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        thr = F.lit(int(round(cum * _DENOM)))
        expr = (
            F.when(bucket < thr, F.lit(name))
            if expr is None
            else expr.when(bucket < thr, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def sample_k_per_group(
    df: DataFrame,
    group_col: Column | str,
    key_col: str,
    k: int,
    seed: int = 42,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Fixed-size deterministic sample: exactly ``min(k, |group|)`` rows
    per group — the reservoir-sampling analog for eval-set carving,
    per-domain caps, and debugging slices, minus the nondeterminism.

    Rows are ranked inside each group by (md5(key ":" seed), key) — a
    uniform, seed-switchable order that is a pure function of the key, so
    the same keys are picked across runs, engines, and partitionings —
    and rows ranked > k are dropped. ``rank_col`` (1-based) is appended;
    all input columns survive.

    100 TB shape: the standard top-k-per-group window — one Exchange on
    the group; Spark's WindowGroupLimit pushes the rank <= k filter below
    the sort AND to the map side, so each input partition forwards at
    most k rows per group and no full group ever sorts in one task
    (cf. temporal.latest_snapshot, the top-1 instance of this shape).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    group = F.col(group_col) if isinstance(group_col, str) else group_col
    taken = set(df.columns)
    if rank_col in taken:
        raise ValueError(f"rank_col {rank_col!r} collides with an input column")
    tag = 0
    while any(f"_skg{tag}{s}" in taken for s in ("g", "h")):
        tag += 1
    c_g, c_h = f"_skg{tag}g", f"_skg{tag}h"
    hash_order = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))
    )
    w = Window.partitionBy(c_g).orderBy(F.col(c_h), F.col(key_col))
    return (
        df.withColumn(c_g, group)
        .withColumn(c_h, hash_order)
        .withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .filter(F.col(rank_col) <= F.lit(k))
        .drop(c_g, c_h)
    )


def filter_top_fraction(
    df: DataFrame,
    score_col: Column,
    fraction: float,
    id_col: str,
    stratum_col: Column = None,
    approximate: bool = False,
) -> DataFrame:
    """Keep the top ``fraction`` of rows by score (per stratum).

    The quality-filter step of a curation pipeline: score every document,
    keep the best X% — optionally per stratum (language, domain, source)
    so one high-scoring stratum cannot crowd out the rest.

    Exact mode ranks by (score DESC, md5(id)) per stratum — fully
    deterministic (hash tiebreak) and reproducible in SQL, at the cost of
    one sort-shuffle per stratum; this is the small-scale oracle twin.
    ``approximate=True`` is the scale path: a per-stratum
    approx_percentile threshold (tiny sketch aggregate, broadcast back) —
    no global sort, same shape as table_rules.column_quantiles.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    from pyspark.sql import Window

    # collision-free staging names: an input column named _s/_score/etc.
    # must survive (withColumn silently overwrites same-named columns)
    taken = set(df.columns)
    tag = 0
    while any(f"_ntf{tag}{s}" in taken for s in ("s", "score", "thr", "rn", "n")):
        tag += 1
    c_s, c_score, c_thr, c_rn, c_n = (
        f"_ntf{tag}{s}" for s in ("s", "score", "thr", "rn", "n")
    )

    stratum = stratum_col if stratum_col is not None else F.lit(0)
    tagged = df.withColumn(c_s, stratum).withColumn(c_score, score_col)
    if approximate:
        thr = tagged.groupBy(c_s).agg(
            F.percentile_approx(c_score, 1.0 - fraction).alias(c_thr)
        )
        return (
            tagged.join(F.broadcast(thr), c_s)
            .filter(F.col(c_score) >= F.col(c_thr))
            .drop(c_s, c_score, c_thr)
        )
    w = Window.partitionBy(c_s).orderBy(
        F.col(c_score).desc(),
        F.md5(F.col(id_col).cast("string")),
    )
    wn = Window.partitionBy(c_s)
    return (
        tagged.withColumn(c_rn, F.row_number().over(w))
        .withColumn(c_n, F.count(F.lit(1)).over(wn))
        .filter(
            F.col(c_rn)
            <= F.ceil(F.lit(float(fraction)) * F.col(c_n)).cast("bigint")
        )
        .drop(c_s, c_score, c_rn, c_n)
    )


def source_mixing_weights(
    df: DataFrame,
    source_col: str,
    text_col: str,
    target: dict[str, float] | None = None,
) -> DataFrame:
    """Data-mixture rebalancing: per-source token shares and the sampling
    weight that moves the mixture to a target distribution —
    ``(source, n_docs, n_tokens, share_e6, weight_e6)``.

    weight = target_share / current_share (the multiplicative factor a
    sampler applies to reach the target; >1 = upsample). ``target`` maps
    source → share and defaults to uniform over the observed sources;
    missing keys mean 0 (drop the source). Quantized to 1e-6 floors for
    engine portability.

    100 TB shape: one partially-aggregated groupBy(source) over token
    counts (pure expressions), then a broadcast of the 1-row global total
    — sources are few, the corpus is scanned once.
    """
    from ..dedup import tokens as _tokens

    per = (
        df.select(
            F.col(source_col).alias("source"),
            F.size(_tokens(F.col(text_col))).cast("bigint").alias("_tok"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_tok").cast("bigint").alias("n_tokens"),
        )
    )
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_nsrc"),
    )
    joined = per.join(F.broadcast(tot))
    if target is None:
        tgt = F.lit(1.0) / F.col("_nsrc").cast("double")
    else:
        tgt = F.coalesce(
            *[
                F.when(F.col("source") == F.lit(s), F.lit(float(v)))
                for s, v in sorted(target.items())
            ],
            F.lit(0.0),
        )
    share = F.col("n_tokens").cast("double") / F.col("_total")
    return joined.select(
        "source",
        "n_docs",
        "n_tokens",
        F.floor(share * 1e6).cast("bigint").alias("share_e6"),
        # a zero-token source has no defined upsample factor (inf) — NULL
        F.when(share > 0, F.floor(tgt / share * 1e6).cast("bigint")).alias(
            "weight_e6"
        ),
    )


def score_percentiles(
    df: DataFrame,
    id_col: str,
    score_col: Column,
    group_col: Column | None = None,
    n_tiles: int = 10,
) -> DataFrame:
    """Per-group percentile normalization of a quality score — the step
    between raw scoring and threshold filtering (quality cutoffs are set
    in percentile space, per source/domain, so one domain's score scale
    can't starve another's).

    Output (id, grp, score, pct_e6, cume_e6, tile):
      pct_e6  = floor(1e6 * percent_rank)  — (rank-1)/(n-1), ties share
      cume_e6 = floor(1e6 * cume_dist)     — rows ≤ current / n
      tile    = ntile(n_tiles) over the UNIQUE order (score, id), so tile
                edges are deterministic even through ties.

    Both window families are SQL-standard — the DuckDB oracle runs its OWN
    percent_rank/cume_dist/ntile, an independent second implementation.
    Singleton groups get pct_e6 = 0 (both engines define percent_rank = 0
    at n = 1).

    100 TB shape: one hash Exchange on the group key, one sort per group
    partition serving all three windows (same frame). Group by real
    domains (thousands of keys), not a constant — a constant group is a
    single global sort, the same caveat token_stats documents.
    """
    from pyspark.sql import Window

    if n_tiles <= 0:
        raise ValueError(f"n_tiles must be positive, got {n_tiles}")
    grp = (group_col if group_col is not None else F.lit(0)).alias("grp")
    base = df.select(F.col(id_col), grp, score_col.alias("score"))
    w = Window.partitionBy("grp").orderBy("score")
    wu = Window.partitionBy("grp").orderBy("score", id_col)
    return base.select(
        id_col,
        "grp",
        "score",
        F.floor(F.percent_rank().over(w) * F.lit(1e6))
        .cast("bigint")
        .alias("pct_e6"),
        F.floor(F.cume_dist().over(w) * F.lit(1e6))
        .cast("bigint")
        .alias("cume_e6"),
        F.ntile(n_tiles).over(wu).cast("bigint").alias("tile"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    prob_col: Column,
    seed: int = 42,
) -> DataFrame:
    """Per-ROW deterministic Bernoulli sampling with a per-row probability
    column — the resample step that consumes importance weights (DSIR
    weights, quality scores mapped to keep-rates): row kept iff its hash
    bucket falls under floor(clamp(prob, 0, 1) * 10^6).

    Same md5-bucket scheme as deterministic_sample (so a row's fate is a
    pure function of (id, seed) — stable across runs, engines, cluster
    sizes, and re-partitioning), but the threshold varies per row. Returns
    (id, bucket, thr, keep): downstream filters ``keep`` — emitting the
    verdict keeps the operator auditable (expected vs realized keep-rate
    checks come free). Pure projection, zero shuffle, zero Python.
    """
    bucket = sample_bucket(F.col(id_col), seed)
    thr = F.floor(
        F.greatest(F.least(prob_col, F.lit(1.0)), F.lit(0.0)) * F.lit(_DENOM)
    ).cast("bigint")
    return df.select(
        F.col(id_col),
        bucket.cast("bigint").alias("bucket"),
        thr.alias("thr"),
        (bucket < thr).alias("keep"),
    )


def select_until_budget(
    df: DataFrame,
    id_col: str,
    group_col: Column,
    score_col: Column,
    cost_col: Column,
    budget: int,
) -> DataFrame:
    """Per-group budgeted curation — fill each group's budget (tokens,
    bytes, rows) with its best-scored documents: order by (score DESC, id)
    within the group, keep rows while the RUNNING cost after including the
    row stays ≤ ``budget`` — except a group's single best row is always
    kept even if it alone exceeds the budget (a budget that selects
    nothing is never what curation means).

    Output (id, grp, score, cost, cum_cost, selected). The greedy-prefix
    rule (stop at first overflow, don't skip-and-continue) keeps the
    selection a pure window function — deterministic and replayable — and
    is the standard "take the best N tokens per domain" curation shape.

    100 TB shape: one hash Exchange on the group key + one sort per group
    partition (the same plan as any per-domain top-k); no global ordering
    anywhere. Groups are domains/sources — thousands of keys, so the sort
    is per-domain, not per-corpus.
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    base = df.select(
        F.col(id_col),
        group_col.alias("grp"),
        score_col.alias("score"),
        cost_col.cast("bigint").alias("cost"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("cost").over(w)
    rn = F.row_number().over(
        Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col(id_col))
    )
    return base.select(
        id_col,
        "grp",
        "score",
        "cost",
        cum.cast("bigint").alias("cum_cost"),
        ((cum <= F.lit(budget)) | (rn == 1)).alias("selected"),
    )


def grouped_split_summary(
    df: DataFrame,
    group_col: str,
    splits: "dict[str, float]",
    seed: int = 42,
) -> DataFrame:
    """GroupShuffleSplit-style audit: assign train/val/test by the GROUP
    key (every row of a user/session/document-family lands in one split —
    the leakage-safe way to split correlated rows), then REPORT the
    result: per split its row count, group count, and the number of
    groups observed in more than one split.

    ``leaked_groups`` is computed, not assumed — it is the validation
    engine's check that the assignment really is a pure function of the
    group key (0 by construction; a nondeterministic key expression or a
    re-keyed union would surface here). Output one row per split:
    (split, n_rows, n_groups, leaked_groups).

    100 TB shape: the md5-bucket assignment is a pure projection; both
    reports are partial-agg groupBys over (group, split) — the corpus
    collapses to one row per group before any cross-split math.
    """
    assigned = assign_splits(df, group_col, splits, seed=seed)
    per_group = assigned.groupBy(group_col, "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    leaked = per_group.groupBy(group_col).agg(
        F.countDistinct("split").alias("_ns")
    )
    n_leaked = leaked.agg(
        F.coalesce(
            F.sum(F.when(F.col("_ns") > 1, 1).otherwise(0)), F.lit(0)
        ).cast("bigint").alias("leaked_groups")
    )
    per_split = per_group.groupBy("split").agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )
    return per_split.crossJoin(F.broadcast(n_leaked))
