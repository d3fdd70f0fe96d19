"""Driver contract for the spark-graft builder (PySpark target).

entry()       — flagship validation run on sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2 +
                training-pipeline ops), each (spark, sf_dir) → DataFrame.
oracle_sql()  — DuckDB-equivalent SQL per query. The approximate ops
                (MinHash/SimHash/LSH/IVF/HLL) carry oracles that REPLICATE
                the algorithm (same embedded plane/centroid/hash constants)
                rather than assuming recall == 1 against an exact twin.
                Only validate_images is rows-only: its Arrow binary-decode
                stage is not SQL-expressible (content pinned by
                tests/test_images_pipeline.py's seeded violation classes);
                the metadata+uniqueness half of the same pipeline is fully
                oracled as validate_images_meta.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: schema-validate the documents table, return violation rows."""
    from ndto_spark.queries import q_validate_documents

    return q_validate_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ndto_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ndto_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
