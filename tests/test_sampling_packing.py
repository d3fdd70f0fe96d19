"""Training-pipeline ops: sequence packing + deterministic sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndto_spark.functions.packing import pack_chunks
from ndto_spark.functions.sampling import (
    deterministic_sample,
    filter_top_fraction,
    sample_bucket,
    stratified_sample,
)


def test_pack_chunks_spans_and_splits(spark):
    # tok: 3,4,10,2,0,5  cap=8 → stream laid out [0,24): doc2 spans three
    # chunks, doc4 (zero tokens) is dropped
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate([3, 4, 10, 2, 0, 5])],
        "doc_id int, tok int",
    )
    out = pack_chunks(df, "doc_id", F.col("tok"), cap=8)
    got = sorted(
        (r.doc_id, r.chunk_id, r.begin, r.end) for r in out.collect()
    )
    assert got == [
        (0, 0, 0, 3),
        (1, 0, 3, 7),
        (2, 0, 7, 8),
        (2, 1, 0, 8),
        (2, 2, 0, 1),
        (3, 2, 1, 3),
        (5, 2, 3, 8),
    ]
    # every token lands in exactly one chunk: spans sum to total tokens
    assert out.agg(F.sum("n_tokens")).first()[0] == 24


def test_pack_chunks_streams_are_independent(spark):
    df = spark.createDataFrame(
        [(i, 5) for i in range(8)], "doc_id int, tok int"
    )
    out = pack_chunks(
        df, "doc_id", F.col("tok"), cap=10, stream_col=F.col("doc_id") % 2
    )
    # each stream has 4 docs x 5 tokens = 20 tokens = 2 full chunks
    per_stream = {
        r.stream: r.n for r in
        out.groupBy("stream").agg(
            F.countDistinct("chunk_id").alias("n")
        ).collect()
    }
    assert per_stream == {0: 2, 1: 2}


def test_pack_chunks_rejects_bad_cap(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id int, tok int")
    with pytest.raises(ValueError, match="cap must be positive"):
        pack_chunks(df, "doc_id", F.col("tok"), cap=0)


def test_deterministic_sample_is_stable_and_bounded(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, "k", 0.3).collect()}
    b = {r.k for r in deterministic_sample(df, "k", 0.3).collect()}
    assert a == b  # pure function of the key
    assert 0.25 < len(a) / 2000 < 0.35
    # nested property: a smaller fraction selects a subset
    c = {r.k for r in deterministic_sample(df, "k", 0.1).collect()}
    assert c <= a
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(df, "k", 1.5)


def test_stratified_sample_fractions(spark):
    df = spark.range(0, 4000).withColumnRenamed("id", "k")
    out = stratified_sample(
        df, "k", F.col("k") % 4, {0: 1.0, 1: 0.5, 3: 0.0}, default_fraction=0.25
    )
    counts = {
        r.s: r.n
        for r in out.groupBy((F.col("k") % 4).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts.get(0) == 1000  # fraction 1.0 keeps everything
    assert 400 < counts.get(1, 0) < 600
    assert 150 < counts.get(2, 0) < 350  # default fraction
    assert 3 not in counts  # fraction 0.0 drops the stratum
    # stratum changes don't change the per-key hash
    bucket = df.select(sample_bucket(F.col("k")).alias("b")).first().b
    assert 0 <= bucket < 1_000_000


def test_filter_top_fraction_exact_and_approx(spark):
    from ndto_spark.functions.sampling import filter_top_fraction

    df = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(100)],
        "doc_id bigint, lang bigint, score double",
    )
    kept = filter_top_fraction(
        df, F.col("score"), 0.3, "doc_id", stratum_col=F.col("lang")
    )
    got = {r.doc_id for r in kept.collect()}
    # per stratum of 50 rows, top 30% by score = the 15 highest values
    assert got == set(range(70, 100))
    # approximate mode keeps at least the exact set's score range
    approx = filter_top_fraction(
        df, F.col("score"), 0.3, "doc_id",
        stratum_col=F.col("lang"), approximate=True,
    )
    agot = {r.doc_id for r in approx.collect()}
    assert agot  # non-empty; sketch threshold is near the exact one
    assert max(got) in agot
    with pytest.raises(ValueError, match="fraction"):
        filter_top_fraction(df, F.col("score"), -0.1, "doc_id")


def test_filter_top_fraction_tiebreak_is_deterministic(spark):
    from ndto_spark.functions.sampling import filter_top_fraction

    # all scores equal: the md5(doc_id) tiebreak decides, reproducibly
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(40)], "doc_id bigint, score double"
    )
    a = {r.doc_id for r in
         filter_top_fraction(df, F.col("score"), 0.25, "doc_id").collect()}
    b = {r.doc_id for r in
         filter_top_fraction(df, F.col("score"), 0.25, "doc_id").collect()}
    assert a == b and len(a) == 10


def test_pack_chunks_invariants_random(spark):
    """Randomized invariants (one Spark job for the whole corpus):
    every token lands in exactly one chunk, spans respect chunk bounds,
    and a doc's spans are contiguous across consecutive chunks."""
    import random

    rng = random.Random(23)
    for cap in (1, 7, 64):
        toks = [rng.randint(0, 3 * cap) for _ in range(60)]
        df = spark.createDataFrame(
            list(enumerate(toks)), "doc_id int, tok int"
        )
        out = sorted(
            (r.doc_id, r.chunk_id, r.begin, r.end)
            for r in pack_chunks(df, "doc_id", F.col("tok"), cap=cap).collect()
        )
        # token conservation
        assert sum(e - b for _, _, b, e in out) == sum(toks)
        by_doc: dict[int, list[tuple]] = {}
        for d, c, b, e in out:
            assert 0 <= b < e <= cap
            by_doc.setdefault(d, []).append((c, b, e))
        # zero-token docs emit nothing; others cover their count contiguously
        for d, spans in by_doc.items():
            assert sum(e - b for _, b, e in spans) == toks[d]
            for (c1, _, e1), (c2, b2, _) in zip(spans, spans[1:]):
                assert c2 == c1 + 1 and e1 == cap and b2 == 0
        assert set(by_doc) == {i for i, t in enumerate(toks) if t > 0}


def test_filter_top_fraction_survives_colliding_column_names(spark):
    # staging columns must not clobber same-named input columns
    df = spark.createDataFrame(
        [(i, float(i), f"keep{i}") for i in range(8)],
        "doc_id bigint, _score double, _s string",
    )
    kept = filter_top_fraction(df, F.col("_score"), 0.5, "doc_id")
    rows = {r.doc_id: r for r in kept.collect()}
    assert set(rows) == {4, 5, 6, 7}
    assert rows[7]._s == "keep7" and rows[7]._score == 7.0
    approx = filter_top_fraction(
        df, F.col("_score"), 0.5, "doc_id", approximate=True
    ).columns
    assert approx == ["doc_id", "_score", "_s"]


def test_aspect_bucket_batches_known_values(spark):
    from ndto_spark.functions.packing import aspect_bucket_batches

    # ladder idx: 0=(1,2) 1=(9,16) 2=(3,4) 3=(1,1) 4=(4,3) 5=(16,9) 6=(2,1)
    rows = [
        (1, 100, 100),  # exact square -> bucket 3
        (2, 100, 200),  # exact 1:2 -> bucket 0
        (3, 160, 90),   # exact 16:9 -> bucket 5
        (4, 101, 100),  # near-square -> bucket 3
        (5, 7, 8),      # dist ties between 3:4 and 1:1 -> FIRST entry (2)
    ]
    df = spark.createDataFrame(rows, "img bigint, w int, h int")
    out = {
        r.img: r
        for r in aspect_bucket_batches(
            df, "img", "w", "h", batch_size=2, n_shards=1
        ).collect()
    }
    assert {i: out[i].bucket for i in out} == {1: 3, 2: 0, 3: 5, 4: 3, 5: 2}
    assert (out[3].ratio_w, out[3].ratio_h) == (16, 9)
    assert (out[5].ratio_w, out[5].ratio_h) == (3, 4)
    # single shard: bucket-3 members {1, 4} pack into one full batch of 2
    assert (out[1].batch_id, out[1].slot, out[1].batch_rows) == (0, 0, 2)
    assert (out[4].batch_id, out[4].slot, out[4].batch_rows) == (0, 1, 2)
    # singleton buckets -> partial batches, flagged by batch_rows
    assert (out[2].batch_id, out[2].slot, out[2].batch_rows) == (0, 0, 1)
    with pytest.raises(ValueError, match="batch_size"):
        aspect_bucket_batches(df, "img", "w", "h", batch_size=0)
    with pytest.raises(ValueError, match="n_shards"):
        aspect_bucket_batches(df, "img", "w", "h", n_shards=0)


def test_aspect_bucket_batches_shards_are_deterministic(spark):
    from ndto_spark.functions.packing import aspect_bucket_batches

    df = spark.createDataFrame(
        [(i, 10 + i % 5, 10) for i in range(200)], "img bigint, w int, h int"
    )
    a = aspect_bucket_batches(df, "img", "w", "h", batch_size=8, n_shards=4)
    b = aspect_bucket_batches(df, "img", "w", "h", batch_size=8, n_shards=4)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    # every batch except possibly the last per (bucket, shard) is full
    import collections

    sizes = collections.defaultdict(int)
    last = {}
    for r in a.collect():
        key = (r.bucket, r.shard)
        sizes[(key, r.batch_id)] += 1
        last[key] = max(last.get(key, -1), r.batch_id)
    for (key, bid), n in sizes.items():
        assert n == 8 or bid == last[key]


def test_sample_k_per_group_sizes_and_determinism(spark):
    from ndto_spark.functions.sampling import sample_k_per_group

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(100)] + [(1000, "tiny")],
        "doc_id bigint, grp string",
    )
    out = sample_k_per_group(df, "grp", "doc_id", k=5).collect()
    import collections

    by_grp = collections.defaultdict(list)
    for r in out:
        by_grp[r.grp].append(r)
    # exactly min(k, |group|) rows per group; ranks are 1..n contiguous
    assert {g: len(v) for g, v in by_grp.items()} == {
        "g0": 5, "g1": 5, "g2": 5, "tiny": 1
    }
    for v in by_grp.values():
        assert sorted(r.sample_rank for r in v) == list(range(1, len(v) + 1))
    # determinism: same seed -> same keys; different seed -> different order
    again = sample_k_per_group(df, "grp", "doc_id", k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = sample_k_per_group(df, "grp", "doc_id", k=5, seed=7).collect()
    assert {r.doc_id for r in out} != {r.doc_id for r in other}
    # the sample is the TOP of the full hash order: rank<=k rows are a
    # prefix of the rank ordering over the whole group
    full = sample_k_per_group(df, "grp", "doc_id", k=10**6)
    top = {
        (r.grp, r.doc_id) for r in full.collect() if r.sample_rank <= 5
    }
    assert {(r.grp, r.doc_id) for r in out} == top


def test_sample_k_per_group_validates_args(spark):
    import pytest as _pytest

    from ndto_spark.functions.sampling import sample_k_per_group

    df = spark.createDataFrame([(1, "a", 2)], "doc_id bigint, grp string, sample_rank int")
    with _pytest.raises(ValueError, match="rank_col"):
        sample_k_per_group(df, "grp", "doc_id", k=1)
    with _pytest.raises(ValueError, match="k must be"):
        sample_k_per_group(df.drop("sample_rank"), "grp", "doc_id", k=0)


def test_assign_splits_disjoint_exhaustive(spark):
    from ndto_spark.functions.sampling import assign_splits

    df = spark.createDataFrame([(i,) for i in range(500)], "k int")
    out = assign_splits(
        df, "k", {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    rows = out.collect()
    # every row gets exactly one split; ~90/5/5 at n=500
    assert len(rows) == 500
    counts = {s: 0 for s in ("train", "val", "test")}
    for r in rows:
        counts[r.split] += 1
    assert counts["train"] > 400
    assert counts["val"] > 0 and counts["test"] > 0
    # assignment agrees with the bucket ranges exactly
    from ndto_spark.functions.sampling import sample_bucket

    chk = df.select(
        "k", sample_bucket(F.col("k")).alias("b")
    ).collect()
    buckets = {r.k: r.b for r in chk}
    for r in rows:
        b = buckets[r.k]
        want = "train" if b < 900_000 else ("val" if b < 950_000 else "test")
        assert r.split == want, (r.k, b, r.split)


def test_assign_splits_consistent_with_sample(spark):
    # the same key keeps the same bucket deterministic_sample uses, so a
    # 90% train split equals a deterministic_sample at fraction 0.9
    from ndto_spark.functions.sampling import assign_splits

    df = spark.createDataFrame([(i,) for i in range(300)], "k int")
    train = {
        r.k
        for r in assign_splits(df, "k", {"train": 0.9, "rest": 0.1})
        .filter(F.col("split") == "train")
        .collect()
    }
    sampled = {r.k for r in deterministic_sample(df, "k", 0.9).collect()}
    assert train == sampled


def test_assign_splits_validation(spark):
    from ndto_spark.functions.sampling import assign_splits

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, "k", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="must be >= 0"):
        assign_splits(df, "k", {"a": -0.5, "b": 1.5})
    with pytest.raises(ValueError, match="non-empty"):
        assign_splits(df, "k", {})
    with pytest.raises(ValueError, match="collides"):
        assign_splits(
            df.withColumn("split", F.lit("x")), "k", {"a": 1.0}
        )
    # single split takes everything, no when-chain needed
    out = assign_splits(df, "k", {"all": 1.0})
    assert out.first().split == "all"


def test_sliding_chunks_overlap_and_tail(spark):
    from ndto_spark.functions.packing import sliding_chunks

    df = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # n=10: 2 chunks, 0 and 4
            (2, "a b"),                             # n=2 <= size: one chunk
            (3, ""),                                # 0 tokens: no row
            (4, "u0 u1 u2 u3 u4 u5 u6 u7 u8"),      # n=9: short 5-token tail
        ],
        "doc_id long, text string",
    )
    rows = sliding_chunks(df, "doc_id", "text", size=6, stride=4).collect()
    got = {(r.doc_id, r.chunk_id): r for r in rows}
    assert set(got) == {(1, 0), (1, 1), (2, 0), (4, 0), (4, 1)}
    assert got[(1, 0)].chunk_text == "t0 t1 t2 t3 t4 t5"
    assert got[(1, 1)].chunk_text == "t4 t5 t6 t7 t8 t9"  # 2-token overlap
    assert got[(2, 0)].chunk_text == "a b"
    assert (got[(4, 1)].begin, got[(4, 1)].n_chunk_tokens) == (4, 5)
    assert got[(4, 1)].chunk_text == "u4 u5 u6 u7 u8"  # tail reaches the end


def test_sliding_chunks_validates_stride(spark):
    import pytest

    from ndto_spark.functions.packing import sliding_chunks

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        sliding_chunks(df, "doc_id", "text", size=4, stride=5)
    with pytest.raises(ValueError):
        sliding_chunks(df, "doc_id", "text", size=4, stride=0)


def test_score_percentiles_known_values(spark):
    from ndto_spark.functions.sampling import score_percentiles
    from pyspark.sql import functions as F

    # group g: scores 10, 20, 20, 40 → percent_rank 0, 1/3, 1/3, 1;
    # singleton group h → percent_rank 0, cume_dist 1
    df = spark.createDataFrame(
        [(1, "g", 10), (2, "g", 20), (3, "g", 20), (4, "g", 40), (5, "h", 7)],
        "id long, src string, s long",
    )
    rows = score_percentiles(df, "id", F.col("s"), F.col("src"), n_tiles=2)
    got = {r.id: r for r in rows.collect()}
    assert [got[i].pct_e6 for i in (1, 2, 3, 4)] == [0, 333333, 333333, 1000000]
    assert [got[i].cume_e6 for i in (1, 2, 3, 4)] == [250000, 750000, 750000, 1000000]
    assert [got[i].tile for i in (1, 2, 3, 4)] == [1, 1, 2, 2]  # unique order
    assert (got[5].pct_e6, got[5].cume_e6, got[5].tile) == (0, 1000000, 1)


def test_score_percentiles_validates_tiles(spark):
    import pytest

    from ndto_spark.functions.sampling import score_percentiles
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 1)], "id long, s long")
    with pytest.raises(ValueError):
        score_percentiles(df, "id", F.col("s"), n_tiles=0)


def test_weighted_sample_clamps_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from ndto_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, -0.5), (2, 0.0), (3, 1.0), (4, 2.5), (5, 0.5)],
        "id long, p double",
    )
    rows = weighted_sample(df, "id", F.col("p"), seed=3).collect()
    got = {r.id: r for r in rows}
    assert got[1].thr == 0 and not got[1].keep          # clamped to 0
    assert got[2].thr == 0 and not got[2].keep
    assert got[3].thr == 1_000_000 and got[3].keep      # prob 1 keeps all
    assert got[4].thr == 1_000_000 and got[4].keep      # clamped to 1
    assert got[5].thr == 500_000
    again = {r.id: r.keep for r in
             weighted_sample(df, "id", F.col("p"), seed=3).collect()}
    assert again == {r.id: r.keep for r in rows}        # stable


def test_select_until_budget_prefix_and_best_row_rule(spark):
    from pyspark.sql import functions as F

    from ndto_spark.functions.sampling import select_until_budget

    df = spark.createDataFrame(
        [
            # group g: scores 9,8,7 with costs 5,4,3; budget 9 → rows 1,2
            (1, "g", 9, 5), (2, "g", 8, 4), (3, "g", 7, 3),
            # group h: single row costing 50 > budget → still selected
            (4, "h", 1, 50),
        ],
        "id long, src string, s long, c long",
    )
    rows = select_until_budget(
        df, "id", F.col("src"), F.col("s"), F.col("c"), budget=9
    ).collect()
    got = {r.id: r for r in rows}
    assert [got[i].selected for i in (1, 2, 3)] == [True, True, False]
    assert got[3].cum_cost == 12
    assert got[4].selected and got[4].cum_cost == 50


def test_select_until_budget_validates_budget(spark):
    import pytest
    from pyspark.sql import functions as F

    from ndto_spark.functions.sampling import select_until_budget

    df = spark.createDataFrame([(1, "g", 1, 1)], "id long, src string, s long, c long")
    with pytest.raises(ValueError):
        select_until_budget(df, "id", F.col("src"), F.col("s"), F.col("c"), 0)


def test_grouped_split_summary_integrity_and_counts(spark):
    from ndto_spark.functions.sampling import grouped_split_summary

    rows = [(u, i) for u in range(40) for i in range(3)]  # 3 rows per user
    df = spark.createDataFrame(rows, "user_id long, i long")
    out = grouped_split_summary(
        df, "user_id", {"train": 0.5, "test": 0.5}
    ).collect()
    assert sum(r["n_rows"] for r in out) == 120
    assert sum(r["n_groups"] for r in out) == 40
    for r in out:
        assert r["leaked_groups"] == 0
        assert r["n_rows"] == 3 * r["n_groups"]  # group integrity
