"""End-to-end validation pipeline for the image+caption table.

Combines the three rule families over one input:

1. metadata rules — compiled Catalyst predicates over (image_id, fmt, w, h,
   caption); this branch NEVER touches ``bytes`` so the parquet scan prunes
   the heavy column (check `.explain` ReadSchema).
2. batch rules — Arrow pandas-UDF decode/dimension/format/PSNR/caption
   checks over ``bytes`` (see batch.py).
3. table rules — key uniqueness (the only shuffle in the pipeline).

Output: the engine contract violations + per-partition verdicts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import table_rules
from .batch import image_batch_violations
from .runner import RuleSet, validate

IMAGE_METADATA_RULES = {
    "image_id": {"type": "string", "pattern": "^img_[0-9a-f]{16}$"},
    "fmt": {"enum": ["png", "jpeg"]},
    "w": {"type": "integer", "minimum": 1, "maximum": 16384},
    "h": {"type": "integer", "minimum": 1, "maximum": 16384},
    "caption": {"type": "string", "min_length": 1, "max_length": 256},
}


def validate_images_metadata(
    df: DataFrame, key: str = "image_id", check_uniqueness: bool = True
) -> DataFrame:
    """Metadata-half violations only: compiled Catalyst rules over
    (image_id, fmt, w, h, caption) plus key uniqueness — everything in the
    image pipeline that never touches ``bytes``. This half is fully
    SQL-expressible, so the driver gate checks it against an independent
    DuckDB oracle (the Arrow decode half stays rows-only; see
    queries.q_validate_images).

    Output: (key, column, schema_path, keyword, description).
    """
    meta = validate(df, IMAGE_METADATA_RULES, key=key)
    violations = meta.violations.select(
        key, "column", "schema_path", "keyword", "description"
    )
    if check_uniqueness:
        dups = table_rules.uniqueness(df.filter(F.col(key).isNotNull()), key)
        dup_v = dups.select(
            F.col(key),
            F.lit(key).alias("column"),
            F.lit("$.unique").alias("schema_path"),
            F.lit("unique").alias("keyword"),
            F.format_string("Key appears %d times", F.col("n_dups")).alias(
                "description"
            ),
        )
        violations = violations.unionByName(dup_v)
    return violations


@dataclass
class ImagesResult:
    violations: DataFrame  # image_id, column, schema_path, keyword, description, partition_id
    verdicts: DataFrame  # partition_id, n_rows, n_violations, pass


def validate_images(
    df: DataFrame,
    seed: int = 42,
    key: str = "image_id",
    min_psnr: float = 40.0,
    check_uniqueness: bool = True,
    phash_partitions: int | None = None,
) -> ImagesResult:
    """Validate an image+caption table (see module docstring).

    ``phash_partitions``: when set, the input is repartitionByRange'd on
    ``phash`` into that many range buckets before validation (the north
    rule's 'explicit repartitioning on phash ranges to bound skew').
    repartitionByRange samples the key distribution, so hot ranges split
    evenly; column pruning pushes through the exchange, so the metadata
    branch shuffles only its narrow columns while the Arrow branch's
    ``bytes`` shuffle is the price of a skew-balanced decode stage. Leave
    None when the input layout is already balanced (e.g. the bench's
    synthetic table) — checkpoint.run_resumable provides the same bounding
    via stored phash quantile buckets for resumable runs.
    """
    if phash_partitions is not None:
        df = df.repartitionByRange(phash_partitions, F.col("phash"))
    meta = validate(df, IMAGE_METADATA_RULES, key=key)
    batch_v = image_batch_violations(df, seed, key=key, min_psnr=min_psnr)
    violations = meta.violations.unionByName(batch_v)
    if check_uniqueness:
        dups = table_rules.uniqueness(df.filter(F.col(key).isNotNull()), key)
        dup_v = dups.select(
            F.col(key),
            F.lit(key).alias("column"),
            F.lit("$.unique").alias("schema_path"),
            F.lit("unique").alias("keyword"),
            F.format_string("Key appears %d times", F.col("n_dups")).alias(
                "description"
            ),
            F.lit(-1).alias("partition_id"),  # table-level: no single partition
        )
        violations = violations.unionByName(dup_v)
    rows_per_part = df.groupBy(
        F.spark_partition_id().alias("partition_id")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    viols_per_part = violations.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    # full outer: table-level checks (uniqueness) report under partition -1
    verdicts = (
        rows_per_part.join(viols_per_part, "partition_id", "full_outer")
        .select(
            "partition_id",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        )
        .withColumn("pass", F.col("n_violations") == 0)
    )
    return ImagesResult(violations=violations, verdicts=verdicts)
