"""Structured Streaming validation.

The compiled rules are pure Catalyst expressions, so the SAME RuleSet used
for batch binds unchanged to a streaming DataFrame (readStream →
withColumn(violations) → writeStream). This module adds the streaming
shapes around it:

- ``validate_stream``: per-record violation rows (append mode — stateless,
  no shuffle, scales with input rate).
- ``windowed_verdicts``: event-time windowed pass/fail counters with a
  watermark for late data (update/append modes) — the streaming analog of
  per-partition verdicts.

Batch rules that need Python (image batch checks) also work in streaming —
pandas UDFs are supported in Structured Streaming — but table-level rules
(uniqueness, drift) belong in the batch/maintenance path, not per-record
streams.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .runner import RuleSet
from .spec import Schema


def validate_stream(
    stream_df: DataFrame,
    rules: dict[str, Schema] | RuleSet,
    key: str,
) -> DataFrame:
    """Streaming violation rows: (key, column, schema_path, keyword,
    description) — append-mode friendly (stateless projection)."""
    ruleset = rules if isinstance(rules, RuleSet) else RuleSet(rules)
    arr = ruleset.violations_array(stream_df)
    return (
        stream_df.withColumn("violations", arr)
        .select(F.col(key), F.explode("violations").alias("v"))
        .select(
            key,
            F.col("v.column").alias("column"),
            F.col("v.schema_path").alias("schema_path"),
            F.col("v.keyword").alias("keyword"),
            F.col("v.description").alias("description"),
        )
    )


def windowed_verdicts(
    stream_df: DataFrame,
    rules: dict[str, Schema] | RuleSet,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed verdicts with late-data watermark.

    (window, n_rows, n_violations, pass) — the per-partition verdict
    contract re-expressed over event-time windows.
    """
    ruleset = rules if isinstance(rules, RuleSet) else RuleSet(rules)
    arr = ruleset.violations_array(stream_df)
    # watermarks require TIMESTAMP (with timezone); parquet often yields NTZ
    if dict(stream_df.dtypes).get(ts_col) == "timestamp_ntz":
        stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream_df.withColumn("violations", arr)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("window"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.size("violations")).alias("n_violations"),
        )
        .withColumn("pass", F.col("n_violations") == 0)
    )
