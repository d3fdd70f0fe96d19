"""Two-phase distributed rank + shard manifest (functions/sharding.py)."""

from pyspark.sql import functions as F

from ndto_spark.functions.sharding import (
    sequential_positions,
    shard_manifest,
    unpersist_positions,
)


def test_sequential_positions_is_rank_for_unique_keys(spark):
    # shuffled unique keys across several partitions
    df = spark.range(0, 200, 1, 8).select(
        ((F.col("id") * 77) % 200).alias("k")
    )
    pos = sequential_positions(df, "k", n_partitions=4)
    rows = pos.collect()
    unpersist_positions(pos)
    got = sorted((r.k, r.pos) for r in rows)
    # 77 coprime to 200 → keys are 0..199; pos must equal k+1
    assert got == [(k, k + 1) for k in range(200)]


def test_shard_manifest_counts_and_boundaries(spark):
    df = spark.range(0, 100, 1, 8).select(
        F.format_string("k_%04d", (F.col("id") * 13) % 100).alias("k")
    )
    rows = shard_manifest(df, "k", shard_size=16, n_partitions=4).collect()
    got = {r.shard_id: (r.n_rows, r.first_key, r.last_key) for r in rows}
    assert len(got) == 7  # 6*16 + 4
    for s in range(7):
        lo, hi = 16 * s, min(16 * (s + 1) - 1, 99)
        assert got[s] == (hi - lo + 1, f"k_{lo:04d}", f"k_{hi:04d}")


def test_shard_manifest_duplicate_keys_straddling_cut(spark):
    # every key appears twice; shard_size odd so cuts land inside a tie
    df = spark.range(0, 30, 1, 4).select((F.col("id") % 15).alias("k"))
    rows = shard_manifest(df, "k", shard_size=7, n_partitions=3).collect()
    got = {r.shard_id: (r.n_rows, r.first_key, r.last_key) for r in rows}
    # positions 1..30 over keys [0,0,1,1,...,14,14]: key at pos p = (p-1)//2
    assert got == {
        0: (7, 0, 3),
        1: (7, 3, 6),
        2: (7, 7, 10),
        3: (7, 10, 13),
        4: (2, 14, 14),
    }


def test_shard_manifest_rejects_bad_size(spark):
    import pytest

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        shard_manifest(df, "k", shard_size=0)


def test_grouped_shard_manifest_per_group_sequences(spark):
    from ndto_spark.functions.sharding import grouped_shard_manifest

    # two groups with different sizes; shuffled input order
    df = spark.range(0, 90, 1, 6).select(
        F.when(F.col("id") % 3 == 0, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        ((F.col("id") * 53) % 90).alias("k"),
    )
    rows = grouped_shard_manifest(df, "g", "k", shard_size=10,
                                  n_partitions=4).collect()
    got = {(r.g, r.shard_id): (r.n_rows, r.first_key, r.last_key) for r in rows}
    # group a: ids with (53*id)%90 where id%3==0 → 30 keys; b → 60 keys
    a_keys = sorted((i * 53) % 90 for i in range(0, 90, 3))
    b_keys = sorted((i * 53) % 90 for i in range(90) if i % 3)
    for name, keys in (("a", a_keys), ("b", b_keys)):
        n_shards = (len(keys) + 9) // 10
        assert sum(1 for (g, _) in got if g == name) == n_shards
        for s in range(n_shards):
            chunk = keys[10 * s : 10 * (s + 1)]
            assert got[(name, s)] == (len(chunk), chunk[0], chunk[-1])


def test_epoch_shuffle_matches_reference_rank_and_varies_by_epoch(spark):
    import hashlib

    import pytest

    from ndto_spark.functions.sharding import epoch_shuffle, unpersist_positions

    keys = list(range(1, 41))
    df = spark.createDataFrame([(k,) for k in keys], "doc_id bigint")

    def ref_order(epoch, seed=42):
        def bucket(k):
            return int(
                hashlib.md5(f"{k}:{epoch}:{seed}".encode()).hexdigest()[:8], 16
            )
        return {
            k: i + 1
            for i, k in enumerate(sorted(keys, key=lambda k: (bucket(k), k)))
        }

    out0 = epoch_shuffle(df, "doc_id", epoch=0, n_partitions=4)
    got0 = {r.doc_id: r.pos for r in out0.collect()}
    unpersist_positions(out0)
    assert got0 == ref_order(0)  # exact rank parity with the salted md5

    out1 = epoch_shuffle(df, "doc_id", epoch=1, n_partitions=4)
    got1 = {r.doc_id: r.pos for r in out1.collect()}
    unpersist_positions(out1)
    assert got1 == ref_order(1)
    assert got0 != got1  # epochs permute independently
    assert sorted(got1.values()) == list(range(1, 41))  # bijection

    with pytest.raises(ValueError, match="epoch"):
        epoch_shuffle(df, "doc_id", epoch=-1)
