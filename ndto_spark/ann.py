"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline. The
  query set is broadcast; similarities are computed expression-side
  (zip_with + aggregate, whole-stage codegen) and the per-query top-k is
  taken with an aggregation (slice(sort_array(collect_list))) so the corpus
  never shuffles more than k rows per query per partition after partial
  aggregation.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets shrink the
  candidate set before the exact re-rank. Recall is tunable via
  (num_planes, num_tables).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine_sim), k rows per query,
    self-matches excluded. Ties broken by neighbor id (deterministic).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(q, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cosine_sim"),
        )
    )
    # partial top-k inside the aggregation: collect per query, sort by
    # (-sim, id), keep k. With AQE + partial aggregation the shuffle carries
    # at most one partially-reduced list per (partition, query).
    topk = (
        scored.groupBy("query_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("cosine_sim")).alias("neg"),
                            F.col("neighbor_id").alias("nid"),
                        )
                    )
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.explode("top").alias("t"))
        .select(
            "query_id",
            F.col("t.nid").alias("neighbor_id"),
            (-F.col("t.neg")).alias("cosine_sim"),
        )
    )
    return topk


def _planes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one bit per plane, packed into a long."""
    bits = []
    for j, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in p]),
                lambda v, w: v.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: LSH-bucketed candidates, exact re-rank.

    Each vector lands in ``num_tables`` buckets (one signature per table);
    candidates are corpus vectors sharing any bucket with the query. At
    scale this replaces the full cross join with a bucket-key equi-join.
    """
    tables = [
        _planes(dim, num_planes, seed + t * 1000) for t in range(num_tables)
    ]

    def with_buckets(df: DataFrame, idname: str) -> DataFrame:
        # barrier (repartition) so the num_tables×num_planes projection
        # expressions are evaluated once per row, not re-inlined into the
        # explode generator (cf. dedup.py PLAN NOTEs)
        arr = df.select(
            F.col(id_col).alias(idname),
            F.col(vec_col).alias(f"{idname}_vec"),
            F.array(
                *[
                    F.concat_ws(":", F.lit(t), lsh_bucket(F.col(vec_col), planes))
                    for t, planes in enumerate(tables)
                ]
            ).alias("bks"),
        ).repartition(F.col(idname))
        return arr.select(
            idname, f"{idname}_vec", F.explode("bks").alias("bucket")
        )

    qb = F.broadcast(with_buckets(queries, "query_id"))
    cb = with_buckets(corpus, "neighbor_id")
    cands = (
        cb.join(qb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_id_vec", "neighbor_id_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_id_vec"), F.col("neighbor_id_vec")).alias("cosine_sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse quantize, probe lists.

    Centroids are a deterministic sample of the corpus (hash-selected —
    at real scale you'd k-means them; the IVF mechanics are identical):
    every vector is assigned to its nearest centroid (one 'list'); a query
    scans only its ``n_probe`` nearest lists. The candidate scan becomes an
    equi-join on list id — the 100 TB replacement for the cross join.
    """
    from pyspark.sql.window import Window

    # deterministic centroid pick: smallest crc32(id) values
    cents = (
        corpus.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cvec"),
            F.crc32(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(n_lists)
        .drop("h")
    )
    cents_b = F.broadcast(cents)

    def assign(df: DataFrame, idname: str, n: int) -> DataFrame:
        scored = df.select(
            F.col(id_col).alias(idname),
            F.col(vec_col).cast("array<double>").alias(f"{idname}_vec"),
        ).join(cents_b, F.lit(True))
        sim = cosine(F.col(f"{idname}_vec"), F.col("cvec"))
        w = Window.partitionBy(idname).orderBy(F.desc(sim.alias("s")), F.col("cid"))
        ranked = scored.select(
            idname, f"{idname}_vec", "cid", sim.alias("csim")
        ).withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy(idname).orderBy(F.desc("csim"), "cid")
            ),
        )
        return ranked.filter(F.col("rk") <= n).select(idname, f"{idname}_vec", "cid")

    corpus_lists = assign(corpus, "neighbor_id", 1)  # each vector in 1 list
    query_lists = F.broadcast(assign(queries, "query_id", n_probe))
    cands = corpus_lists.join(query_lists, "cid").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_id_vec"), F.col("neighbor_id_vec")).alias("cosine_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
