"""validate_row_object: the whole row as one object value."""

from __future__ import annotations

from ndto_spark.runner import validate_row_object

ROW_SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string", "min_length": 2},
        "age": {"type": "integer", "minimum": 0},
    },
    "required": ["name"],
}


def test_row_object_validation(spark):
    df = spark.createDataFrame(
        [(1, "ab", 30), (2, "x", 5), (3, None, 1), (4, "ok", -2)],
        "id bigint, name string, age bigint",
    )
    res = validate_row_object(df, ROW_SCHEMA, key="id")
    viols = {r.id: (r.schema_path, r.description) for r in res.violations.collect()}
    assert 1 not in viols
    assert viols[2] == (
        "$.properties.name.min_length",
        'String length "Length" is less than 2',
    )
    assert viols[3] == ("$.required", '$ is missing required property <<"name">>')
    assert viols[4] == (
        "$.properties.age.minimum",
        "Value is not a number greater or equal to 0",
    )
    verdicts = res.verdicts.collect()
    assert sum(v.n_rows for v in verdicts) == 4
    assert sum(v.n_violations for v in verdicts) == 3


def test_row_object_additional_properties_false(spark):
    df = spark.createDataFrame([(1, "ab", "extra")], "id bigint, name string, junk string")
    schema = {
        "type": "object",
        "properties": {"id": True, "name": {"type": "string"}},
        "additional_properties": False,
    }
    res = validate_row_object(df, schema, key="id")
    v = res.violations.collect()[0]
    assert v.schema_path == "$.additional_properties"
    assert v.description == 'Object has unsupported keys: "junk"'
