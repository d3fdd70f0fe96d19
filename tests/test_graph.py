"""Integer-quantized PageRank (ndto_spark.graph)."""

from __future__ import annotations

import pytest

from ndto_spark.graph import pagerank


def _py_pagerank(edges, n_iter=5, damping_e6=850_000, scale=10**12):
    """Exact Python replica of the integer recurrence."""
    verts = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(verts)
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    r = {v: scale // n for v in verts}
    base = (scale * (1_000_000 - damping_e6)) // 1_000_000 // n
    for _ in range(n_iter):
        acc = {v: 0 for v in verts}
        for s, d in edges:
            acc[d] += (r[s] * damping_e6 // 1_000_000) // outd[s]
        r = {v: base + acc[v] for v in verts}
    return r


def test_pagerank_matches_integer_replica(spark):
    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 3),  # parallel edge
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["vertex"]: r["rank_scaled"]
        for r in pagerank(df, n_iter=4).collect()
    }
    assert got == _py_pagerank(edges, n_iter=4)


def test_pagerank_sink_gets_base_only_and_mass_bounded(spark):
    # 4 has no in-edges: rank = teleport base exactly; total mass <= scale
    edges = [(4, 1), (1, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank(df, n_iter=3).collect()
    scale = 10**12
    base = (scale * 150_000) // 1_000_000 // 3  # vertices {1, 2, 4}
    got = {r["vertex"]: r["rank_scaled"] for r in rows}
    assert got[4] == base
    assert sum(got.values()) <= scale
    # symmetric 2-cycle members converge to equal ranks once both have
    # equal inputs (after the first round 1 and 2 feed each other alone
    # plus 4's one-shot — asymmetric, so just check the replica instead)
    assert got == _py_pagerank(edges, n_iter=3)


def test_pagerank_validates_args(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping_e6=1_000_000)


def test_label_propagation_rounds_ties_and_clamping(spark):
    """Path 1-2-3-4-5 with seeds 1→10, 5→20: round 1 labels 2 (from 1)
    and 4 (from 5); round 2 gives 3 BOTH neighbor labels (one vote each)
    — the tie breaks to the SMALLEST label (10). Seed vertices never
    change; the isolated vertex 6 stays NULL."""
    from ndto_spark.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a bigint, id_b bigint"
    )
    seeds = spark.createDataFrame(
        [(1, 10), (5, 20)], "vertex bigint, label int"
    )
    vertices = spark.createDataFrame(
        [(i,) for i in range(1, 7)], "vertex bigint"
    )
    out = label_propagation(edges, seeds, vertices, n_iter=2)
    got = {r.vertex: (r.label, r.is_seed) for r in out.collect()}
    out.unpersist()
    assert got == {
        1: (10, True),
        2: (10, False),
        3: (10, False),   # tie 10-vs-20 → smallest
        4: (20, False),
        5: (20, True),
        6: (None, False),
    }

    one = label_propagation(edges, seeds, vertices, n_iter=1)
    got1 = {r.vertex: r.label for r in one.collect()}
    one.unpersist()
    assert got1[3] is None  # propagation hasn't reached the middle yet

    import pytest

    with pytest.raises(ValueError, match="n_iter"):
        label_propagation(edges, seeds, vertices, n_iter=0)


def test_personalized_pagerank_seed_mass_and_all_seed_equivalence(spark):
    from ndto_spark.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src bigint, dst bigint"
    )
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "v bigint")

    # seeds == all vertices ⇒ identical to the standard recurrence
    std = {r.vertex: r.rank_scaled for r in pagerank(
        edges, n_iter=3, vertices=verts).collect()}
    allseed = {r.vertex: r.rank_scaled for r in pagerank(
        edges, n_iter=3, vertices=verts, personalize=verts).collect()}
    assert std == allseed

    # seed {1}: vertex 4 has no in-edges and is not a seed → rank exactly 0
    seeds = spark.createDataFrame([(1,)], "v bigint")
    ppr = {r.vertex: r.rank_scaled for r in pagerank(
        edges, n_iter=3, vertices=verts, personalize=seeds).collect()}
    assert ppr[4] == 0
    assert ppr[1] > ppr[2] > ppr[3] > 0  # proximity to the seed orders mass

    import pytest

    with pytest.raises(ValueError, match="personalize"):
        pagerank(edges, n_iter=2, vertices=verts,
                 personalize=spark.createDataFrame([(99,)], "v bigint"))
