"""JSON string column validation: spec→type derivation + rules + bad JSON."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ndto_spark.json_rules import spec_to_spark_type, validate_json_column


def test_spec_to_spark_type():
    assert spec_to_spark_type({"type": "string"}) == T.StringType()
    assert spec_to_spark_type({"type": "integer"}) == T.LongType()
    assert spec_to_spark_type(
        {"type": "array", "items": {"type": "float"}}
    ) == T.ArrayType(T.DoubleType())
    st = spec_to_spark_type(
        {"type": "object", "properties": {"a": {"type": "integer"}, "b": {"type": "string"}}}
    )
    assert isinstance(st, T.StructType) and [f.name for f in st.fields] == ["a", "b"]
    mt = spec_to_spark_type(
        {"type": "object", "pattern_properties": {"[a-z]+": {"type": "integer"}}}
    )
    assert mt == T.MapType(T.StringType(), T.LongType())
    assert spec_to_spark_type({"enum": ["x", "y"]}) == T.StringType()


def test_validate_json_column(spark):
    rows = [
        (1, '{"k": 50}'),      # valid
        (2, '{"k": 5}'),       # below minimum
        (3, '{"k": 95}'),      # above maximum
        (4, "not json at all"),  # malformed
        (5, '{"other": 1}'),   # missing required k
    ]
    df = spark.createDataFrame(rows, "id bigint, props string")
    schema = {
        "type": "object",
        "properties": {"k": {"type": "integer", "minimum": 10, "maximum": 89}},
        "required": ["k"],
    }
    res = validate_json_column(df, "props", schema, key="id")
    viols = {r.id: (r.schema_path, r.keyword) for r in res.violations.collect()}
    assert 1 not in viols
    assert viols[2] == ("$.properties.k.minimum", "minimum")
    assert viols[3] == ("$.properties.k.maximum", "maximum")
    assert viols[4] == ("$.json", "json")
    assert viols[5] == ("$.required", "required")


def test_single_parse(spark):
    """The physical plan must parse the JSON column exactly once.

    Two regressions are pinned here: (a) compiling the rule tree directly
    against the from_json expression duplicates the parse per keyword check;
    (b) InferFiltersFromGenerate + predicate pushdown expanding the
    violations alias into a pre-Generate filter re-duplicates it (the
    explode_outer fix in runner._result_from_annotated).
    """
    df = spark.createDataFrame([(1, '{"k": 5}')], "id bigint, props string")
    schema = {
        "type": "object",
        "properties": {"k": {"type": "integer", "minimum": 10, "maximum": 89}},
        "required": ["k"],
    }
    res = validate_json_column(df, "props", schema, key="id")
    final = res.violations.select("id", "keyword")
    plan = final._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("from_json") == 1, plan
