"""Sequence packing: lay documents end-to-end and split the token stream
into fixed-size chunks (the standard LLM-pretraining pack step: concat,
then chunk to the context length).

Expression/window-side only — no Python in the hot path. The window runs
per ``stream`` (a shard key), which is what makes this scale: at 100 TB
you pack within shards (files, domains, hash buckets), never one global
ordering, so each window is bounded and streams pack in parallel. A doc
longer than the chunk size spans several chunks (it is split, as in
pretraining), so every token lands in exactly one chunk.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    cap: int,
    stream_col: Optional[Column] = None,
) -> DataFrame:
    """One row per (doc, chunk) overlap under concat-then-chunk packing.

    Docs are ordered by ``id_col`` within each stream; doc i occupies the
    half-open token span [cumsum - tokens_i, cumsum) of its stream, and the
    stream is cut every ``cap`` tokens. Output columns:

      stream, doc_id, chunk_id, begin, end, n_tokens

    where [begin, end) is the doc's span INSIDE chunk ``chunk_id`` (so
    0 <= begin < end <= cap and n_tokens = end - begin). Zero-token docs
    are dropped (they occupy no span). Deterministic given unique ids.
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    stream = (stream_col if stream_col is not None else F.lit(0)).alias(
        "stream"
    )
    base = df.select(
        stream, F.col(id_col).alias("doc_id"), tokens_col.alias("tok")
    ).filter(F.col("tok") > 0)
    w = Window.partitionBy("stream").orderBy("doc_id")
    spans = base.select(
        "stream",
        "doc_id",
        "tok",
        (F.sum("tok").over(w) - F.col("tok")).alias("s"),
        F.sum("tok").over(w).alias("e"),
    )
    # chunks spanned: floor(s/cap) .. floor((e-1)/cap); e > s so the
    # sequence is never empty — explode_outer + post-filter anyway (the
    # rule-safe explode flavor, see CLAUDE.md on InferFiltersFromGenerate)
    spans = spans.select(
        "stream",
        "doc_id",
        "s",
        "e",
        F.explode_outer(
            F.sequence(
                F.expr(f"s DIV {cap}"), F.expr(f"(e - 1) DIV {cap}")
            )
        ).alias("chunk_id"),
    ).filter(F.col("chunk_id").isNotNull())
    off = F.col("chunk_id") * F.lit(cap)
    begin = F.greatest(F.col("s") - off, F.lit(0))
    end = F.least(F.col("e") - off, F.lit(cap))
    return spans.select(
        "stream",
        "doc_id",
        "chunk_id",
        begin.alias("begin"),
        end.alias("end"),
        (end - begin).alias("n_tokens"),
    )
