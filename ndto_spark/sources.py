"""Input sources: Iceberg tables with snapshot lineage, parquet fallback.

The north rule targets Iceberg tables (snapshot-id lineage, partition
specs). This sandbox has no Iceberg runtime jars, so the Iceberg path is
import-gated: when the session has an Iceberg catalog configured the reader
pins a snapshot and the checkpoint header records it; otherwise plain
parquet paths are read and lineage falls back to (path, row-count) — the
same degradation the checkpoint layer documents.

Runtime-jar status (checked round 3): no ``org.apache.iceberg`` artifacts
exist anywhere in this sandbox (no ~/.ivy2 or ~/.m2 cache, nothing in
/opt/spark/jars) and the container is offline, so the Iceberg branch
cannot be smoke-tested here. On a real deployment add
``org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<version>`` (the
Spark-4 runtime artifact line) via ``--packages`` plus a catalog config
(``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog``);
``iceberg_available`` below then flips the reader onto the snapshot-pinned
path with no code change.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class SourceLineage:
    kind: str  # "iceberg" | "parquet"
    location: str  # table identifier or path
    snapshot_id: Optional[int]  # Iceberg snapshot (None for parquet)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession,
    location: str,
    snapshot_id: Optional[int] = None,
) -> tuple[DataFrame, SourceLineage]:
    """Read an input table with lineage.

    ``location`` is an Iceberg table identifier (``catalog.db.table``) when
    an Iceberg runtime is present, else a parquet path. Pinning
    ``snapshot_id`` makes resumed runs read the exact same data the original
    run saw (time travel) — the checkpoint header stores it.
    """
    if iceberg_available(spark) and not location.startswith(("/", "file:", "s3:")):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        df = reader.load(location)
        if snapshot_id is None:
            try:
                snapshot_id = (
                    spark.sql(
                        f"SELECT snapshot_id FROM {location}.snapshots "
                        "ORDER BY committed_at DESC LIMIT 1"
                    ).collect()[0][0]
                )
            except Exception:
                snapshot_id = None
        return df, SourceLineage("iceberg", location, snapshot_id)
    df = spark.read.parquet(location)
    return df, SourceLineage("parquet", location, None)
