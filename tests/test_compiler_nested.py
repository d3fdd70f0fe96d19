"""Golden tests for array and object keywords.

Mirrors /root/reference/test/ndto_SUITE.erl:289-421 (pattern_properties, the
four additional_properties scenarios, required, unique_items) and the array
items error format (/root/reference/src/ndto_generator/ndto_generator_array.erl).
"""

from __future__ import annotations

import pytest

from tests.conftest import check


# --- arrays -------------------------------------------------------------------


def test_array_items_single_schema(spark):
    schema = {"type": "array", "items": {"type": "integer", "minimum": 0}}
    assert check(spark, schema, [1, 2, 3], "array<bigint>") is True
    # first failing 0-based index, nested path, nested reason
    assert check(spark, schema, [1, -2, -3], "array<bigint>") == (
        "$.items[*].minimum",
        "Item 1 in $ is invalid. Value is not a number greater or equal to 0",
    )


def test_array_min_max_items(spark):
    schema = {"type": "array", "min_items": 2, "max_items": 3}
    assert check(spark, schema, [1, 2], "array<bigint>") is True
    assert check(spark, schema, [1], "array<bigint>") == (
        "$.min_items",
        "Array does not have at least 2 items",
    )
    assert check(spark, schema, [1, 2, 3, 4], "array<bigint>") == (
        "$.max_items",
        "Array does not have at most 3 items",
    )


def test_array_unique_items(spark):
    schema = {"type": "array", "unique_items": True}
    assert check(spark, schema, [0, 1, 2], "array<bigint>") is True
    assert check(spark, schema, [0, 1, 0], "array<bigint>") == (
        "$.unique_items",
        "Array has non unique items",
    )


def test_array_unique_items_priority_over_items(spark):
    # reverse declaration order [items, min_items, max_items, unique_items]:
    # unique_items is evaluated FIRST
    schema = {
        "type": "array",
        "items": {"type": "integer", "minimum": 0},
        "unique_items": True,
    }
    assert check(spark, schema, [-1, -1], "array<bigint>") == (
        "$.unique_items",
        "Array has non unique items",
    )


def test_array_tuple_items_with_additional(spark):
    schema = {
        "type": "array",
        "items": [
            {"type": "string", "min_length": 2},
            {"type": "string", "pattern": "^x"},
        ],
        "additional_items": {"type": "string", "max_length": 1},
    }
    assert check(spark, schema, ["ab", "xy", "z"], "array<string>") is True
    assert check(spark, schema, ["a", "xy"], "array<string>") == (
        "$.items[0]",
        'Item 0 in $ is invalid. String length "Length" is less than 2',
    )
    assert check(spark, schema, ["ab", "yy"], "array<string>") == (
        "$.items[1]",
        "Item 1 in $ is invalid. String does not match pattern ^x",
    )
    assert check(spark, schema, ["ab", "xy", "zz"], "array<string>") == (
        "$.items",
        'Item 2 in $ is invalid. String length "Length" is greater than 1',
    )
    # shorter arrays are fine: positional items only validate present positions
    assert check(spark, schema, ["ab"], "array<string>") is True


# --- objects over map<string,_> -------------------------------------------------


def test_pattern_properties(spark):
    # ndto_SUITE.erl:289-306
    schema = {"type": "object", "pattern_properties": {"[a-z]+": {"type": "string"}}}
    assert check(spark, schema, {"foo": "bar"}, "map<string,string>") is True
    assert check(spark, schema, {"0": "foo"}, "map<string,string>") is True
    # a non-string value under a matching key → nested type failure
    assert check(
        spark, schema, {"foo": 0}, "map<string,bigint>"
    ) == (
        "$.pattern_properties.[a-z]+.type",
        'Property "foo" failed validation: Value is not a string',
    )


def test_additional_properties_false(spark):
    # ndto_SUITE.erl:374-389 (scenario 4)
    schema = {
        "type": "object",
        "pattern_properties": {"^[A-Z]+$": True},
        "additional_properties": False,
    }
    assert check(spark, schema, {"FOO": "x", "BAR": "y"}, "map<string,string>") is True
    assert check(spark, schema, {"Foo": "x", "BAR": "y"}, "map<string,string>") == (
        "$.additional_properties",
        'Object has unsupported keys: "Foo"',
    )


def test_additional_properties_schema(spark):
    # ndto_SUITE.erl:352-372 (scenario 3)
    schema = {
        "type": "object",
        "properties": {"foo": {}},
        "pattern_properties": {"[a-z]+": {"type": "string"}},
        "additional_properties": {"type": "boolean"},
    }
    assert (
        check(spark, schema, {"foo": "bar", "baz": "qux"}, "map<string,string>")
        is True
    )
    # "1" is not declared and matches no pattern → additional_properties schema
    assert check(spark, schema, {"foo": "bar", "1": "baz"}, "map<string,string>") == (
        "$.additional_properties.type",
        'Property "1" failed validation: Value is not a boolean',
    )


def test_required_map(spark):
    schema = {
        "type": "object",
        "properties": {"foo": {"type": "string"}, "bar": {"type": "integer"}},
        "required": ["foo"],
    }
    assert check(spark, schema, {"foo": "foobar"}, "map<string,string>") is True
    assert check(spark, schema, {"bar": "1"}, "map<string,string>") == (
        "$.required",
        '$ is missing required property <<"foo">>',
    )


def test_min_max_properties_map(spark):
    schema = {"type": "object", "min_properties": 1, "max_properties": 2}
    assert check(spark, schema, {"a": "1"}, "map<string,string>") is True
    assert check(spark, schema, {}, "map<string,string>") == (
        "$.min_properties",
        "Object has less properties than required minimum (1)",
    )
    assert check(spark, schema, {"a": "1", "b": "2", "c": "3"}, "map<string,string>") == (
        "$.max_properties",
        "Object has more properties than allowed maximum (2)",
    )


# --- objects over struct ---------------------------------------------------------


def test_struct_properties_and_required(spark):
    schema = {
        "type": "object",
        "properties": {"foo": {"type": "string", "min_length": 2}, "bar": {"type": "integer"}},
        "required": ["foo"],
    }
    dtype = "struct<foo:string,bar:bigint>"
    assert check(spark, schema, ("ab", 1), dtype) is True
    assert check(spark, schema, ("a", 1), dtype) == (
        "$.properties.foo.min_length",
        'String length "Length" is less than 2',
    )
    # NULL struct field models an absent property → required fails
    assert check(spark, schema, (None, 1), dtype) == (
        "$.required",
        '$ is missing required property <<"foo">>',
    )


def test_struct_property_absent_passes(spark):
    # property not required + NULL field (absent) → optional injected ⇒ pass
    schema = {"type": "object", "properties": {"foo": {"type": "string", "min_length": 2}}}
    assert check(spark, schema, (None,), "struct<foo:string>") is True


def test_struct_additional_properties_false(spark):
    schema = {
        "type": "object",
        "properties": {"foo": {}},
        "additional_properties": False,
    }
    dtype = "struct<foo:string,extra:string>"
    assert check(spark, schema, ("x", None), dtype) is True
    assert check(spark, schema, ("x", "y"), dtype) == (
        "$.additional_properties",
        'Object has unsupported keys: "extra"',
    )


def test_struct_pattern_properties(spark):
    schema = {
        "type": "object",
        "pattern_properties": {"^f": {"type": "string", "max_length": 3}},
    }
    dtype = "struct<foo:string,bar:string>"
    assert check(spark, schema, ("abc", "whatever"), dtype) is True
    assert check(spark, schema, ("abcd", "x"), dtype) == (
        "$.pattern_properties.^f.max_length",
        'Property "foo" failed validation: String length "Length" is greater than 3',
    )


def test_struct_min_properties_counts_non_null(spark):
    schema = {"type": "object", "min_properties": 2}
    dtype = "struct<a:string,b:string>"
    assert check(spark, schema, ("x", "y"), dtype) is True
    assert check(spark, schema, ("x", None), dtype) == (
        "$.min_properties",
        "Object has less properties than required minimum (2)",
    )


def test_nested_object_in_array(spark):
    schema = {
        "type": "array",
        "items": {
            "type": "object",
            "properties": {"name": {"type": "string", "min_length": 1}},
            "required": ["name"],
        },
    }
    dtype = "array<struct<name:string>>"
    assert check(spark, schema, [("a",), ("b",)], dtype) is True
    res = check(spark, schema, [("a",), (None,)], dtype)
    assert res == (
        "$.items[*].required",
        'Item 1 in $ is invalid. $.items[*] is missing required property <<"name">>',
    )
