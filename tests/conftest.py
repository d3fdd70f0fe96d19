from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("ndto_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def one_value_df(spark, value, dtype: str):
    """1-row DataFrame with a single column `v` of the given Spark SQL type."""
    return spark.createDataFrame([(value,)], schema=f"v {dtype}")


def check(spark, schema, value, dtype: str, registry=None, options=None):
    """Validate a single value; returns True or (schema_path, description).

    Mirrors the reference's `Module:is_valid(Value)` contract
    (/root/reference/src/ndto.erl:174-180) so golden tests read like
    ndto_SUITE assertions.
    """
    from pyspark.sql import functions as F

    from ndto_spark.compiler import Compiler

    comp = Compiler(registry=registry, options=options)
    df = one_value_df(spark, value, dtype)
    c = comp.compile(schema, F.col("v"), df.schema["v"].dataType, "$")
    row = df.select(c.pred.alias("p"), c.viol.alias("viol")).collect()[0]
    if row.p:
        return True
    return (row.viol.schema_path, row.viol.description)
