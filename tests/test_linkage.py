"""Blocked fuzzy matching (functions/linkage.py)."""

import pytest

from ndto_spark.functions.linkage import fuzzy_join, prefix_block, suffix_block


def _frames(spark):
    clean = spark.createDataFrame(
        [(1, "alphabet"), (2, "alphabex"), (3, "zzzzzzzz")],
        "cid bigint, name string",
    )
    dirty = spark.createDataFrame(
        [(10, "alphabez"), (11, "Xlphabet"), (12, "qqqq")],
        "did bigint, dname string",
    )
    return dirty, clean


def test_fuzzy_join_prefix_block_matches_and_misses(spark):
    dirty, clean = _frames(spark)
    rows = fuzzy_join(dirty, clean, "dname", "name", max_dist=1).collect()
    got = sorted((r.did, r.cid, r.dist) for r in rows)
    # 10 matches both alphabet/alphabex at dist 1; 11's edit is INSIDE the
    # 4-char prefix block → missed (the documented recall caveat)
    assert got == [(10, 1, 1), (10, 2, 1)]


def test_fuzzy_join_suffix_block_recovers_prefix_edit(spark):
    dirty, clean = _frames(spark)
    rows = fuzzy_join(
        dirty, clean, "dname", "name", max_dist=1, block=suffix_block(4)
    ).collect()
    got = sorted((r.did, r.cid, r.dist) for r in rows)
    # suffix block catches 11→alphabet; 10's last-char edit now blocks away
    # from 'alphabet' but still shares the suffix with nothing — misses
    assert (11, 1, 1) in got and all(d != 10 or c == 2 for d, c, _ in got)


def test_fuzzy_join_exact_match_dist_zero(spark):
    dirty, clean = _frames(spark)
    d2 = dirty.union(
        dirty.sparkSession.createDataFrame([(13, "alphabet")], dirty.schema)
    )
    rows = fuzzy_join(d2, clean, "dname", "name", max_dist=0).collect()
    assert [(r.did, r.cid, r.dist) for r in rows] == [(13, 1, 0)]


def test_fuzzy_join_rejects_negative_dist(spark):
    dirty, clean = _frames(spark)
    with pytest.raises(ValueError):
        fuzzy_join(dirty, clean, "dname", "name", max_dist=-1)


def test_sorted_neighborhood_pairs_window_and_determinism(spark):
    import pytest

    from ndto_spark.functions.linkage import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alphb"), (3, "beta"), (4, "betb"), (5, "zeta")],
        "id long, k string",
    )
    out = sorted_neighborhood_pairs(df, "id", "k", window=2)
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (ca != cb)
                )
        return d[-1]

    keys = {1: "alpha", 2: "alphb", 3: "beta", 4: "betb", 5: "zeta"}
    # sort order: alpha(1), alphb(2), beta(3), betb(4), zeta(5)
    expected_pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)]
    assert got == {
        (a, b): lev(keys[a], keys[b]) for a, b in expected_pairs
    }
    # deterministic across runs (unique composite sort key)
    out2 = sorted_neighborhood_pairs(df, "id", "k", window=2)
    assert {(r["id_a"], r["id_b"]) for r in out2.collect()} == set(got)
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "id", "k", window=0)
