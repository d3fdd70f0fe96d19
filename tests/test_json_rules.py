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


def test_mixed_anyof_types_as_variant():
    from ndto_spark.spec import SpecError

    mixed = {"any_of": [{"type": "integer"}, {"type": "string"}]}
    assert spec_to_spark_type(mixed) == T.VariantType()
    # same-typed branches keep the concrete type
    same = {"any_of": [{"type": "integer", "minimum": 1}, {"type": "integer"}]}
    assert spec_to_spark_type(same) == T.LongType()
    # mixed all_of is unsatisfiable; mixed non-scalars unsupported
    with pytest.raises(SpecError, match="unsatisfiable"):
        spec_to_spark_type({"all_of": [{"type": "integer"}, {"type": "string"}]})
    with pytest.raises(SpecError, match="non-scalar"):
        spec_to_spark_type(
            {"any_of": [{"type": "integer"}, {"type": "array", "items": {"type": "integer"}}]}
        )


def test_validate_json_column_mixed_anyof(spark):
    rows = [
        (1, '{"tag": 7}'),        # int branch ok
        (2, '{"tag": 3}'),        # int < 5, string branch type-fails → any_of
        (3, '{"tag": "hello"}'),  # string branch ok
        (4, '{"tag": "hi"}'),     # string too short → any_of
        (5, '{"tag": "7"}'),      # STRING "7": must NOT coerce into the int branch
        (6, '{"tag": 1.5}'),      # float: neither branch → any_of
        (7, '{"tag": null}'),     # JSON null: neither branch → any_of
        (8, '{}'),                # missing → required
    ]
    df = spark.createDataFrame(rows, "id bigint, props string")
    schema = {
        "type": "object",
        "properties": {
            "tag": {
                "any_of": [
                    {"type": "integer", "minimum": 5},
                    {"type": "string", "min_length": 5},
                ]
            }
        },
        "required": ["tag"],
    }
    res = validate_json_column(df, "props", schema, key="id")
    got = {
        r.id: (r.schema_path, r.keyword)
        for r in res.violations.collect()
    }
    anyof = ("$.properties.tag.any_of", "any_of")
    assert got == {
        2: anyof,
        4: anyof,  # len("hi") < 5
        5: anyof,  # "7" stays a string; the int branch must not claim it
        6: anyof,
        7: anyof,
        8: ("$.required", "required"),
    }


def test_heterogeneous_array_unique_items(spark):
    """The reference's heterogeneous unique_items case (ndto_SUITE.erl:
    410-421 dedups a list mixing types): VARIANT elements canonicalized to
    JSON text — 1 and "1" stay distinct, like Erlang term equality."""
    rows = [
        (1, '[1, "1", 2]'),      # unique: the int 1 and the string "1" differ
        (2, '[1, 2, 1]'),        # duplicate int
        (3, '["a", "b", "a"]'),  # duplicate string
    ]
    df = spark.createDataFrame(rows, "id bigint, props string")
    schema = {
        "type": "array",
        "items": {"any_of": [{"type": "integer"}, {"type": "string"}]},
        "unique_items": True,
    }
    res = validate_json_column(df, "props", schema, key="id")
    got = {r.id: r.keyword for r in res.violations.collect()}
    assert got == {2: "unique_items", 3: "unique_items"}


def test_tuple_items_mixed_types_variant(spark):
    """Tuple-typed arrays with heterogeneous positional types parse as
    array<variant>; each position dispatches on its runtime type."""
    rows = [(1, '["ok", 5]'), (2, '[5, "ok"]'), (3, '["ok", 2]')]
    df = spark.createDataFrame(rows, "id bigint, props string")
    schema = {
        "type": "array",
        "items": [
            {"type": "string", "min_length": 2},
            {"type": "integer", "minimum": 3},
        ],
        "additional_items": False,
    }
    res = validate_json_column(df, "props", schema, key="id")
    got = {r.id: (r.keyword, r.description) for r in res.violations.collect()}
    assert set(got) == {2, 3}
    assert got[2][0] == "items" and "Item 0" in got[2][1]
    assert got[3][0] == "items" and "Item 1" in got[3][1]
