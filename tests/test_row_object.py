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


def test_violation_summary_counts_and_examples(spark):
    """Rollup: count per rule + the k SMALLEST offender keys, regardless of
    partitioning (two-phase bounded collection)."""
    from pyspark.sql import functions as F

    from ndto_spark.runner import validate, violation_summary

    rows = [(i, -i if i % 3 == 0 else i) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "k bigint, x bigint").repartition(7)
    res = validate(df, {"x": {"type": "integer", "minimum": 0}}, key="k")
    out = violation_summary(res.violations, "k", max_examples=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.column_name, r.keyword) == ("x", "minimum")
    assert r.n_violations == 20  # k = 3, 6, ..., 60
    assert r.example_keys == "3,6,9"  # smallest offenders, sorted
    assert "greater or equal to 0" in r.description
