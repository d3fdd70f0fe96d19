"""Deep nesting: path composition through properties/items/combinators.

The reference threads the JSON-path prefix through every recursion
(ndto_generator.erl:72, '$' accumulator); these tests pin that the compiled
paths compose identically for multi-level schemas, and that the pure-Python
twin agrees exactly.
"""

from __future__ import annotations

from ndto_spark import pyval
from tests.conftest import check


NESTED = {
    "type": "object",
    "properties": {
        "foo": {
            "all_of": [
                {"type": "integer", "minimum": 0},
                {"type": "integer", "minimum": 10},
            ]
        }
    },
}


def test_all_of_inside_property_path(spark):
    dtype = "struct<foo:bigint>"
    want = (
        "$.properties.foo.all_of",
        "Value is not matching all conditions. Condition 1 failed because of "
        "schema path '$.properties.foo.all_of[1].minimum' : "
        "Value is not a number greater or equal to 10",
    )
    assert check(spark, NESTED, (5,), dtype) == want
    assert pyval.is_valid(NESTED, {"foo": 5}) == want
    assert check(spark, NESTED, (15,), dtype) is True
    assert pyval.is_valid(NESTED, {"foo": 15}) is True


def test_items_of_arrays(spark):
    schema = {
        "type": "array",
        "items": {"type": "array", "min_items": 2},
    }
    dtype = "array<array<bigint>>"
    assert check(spark, schema, [[1, 2], [3, 4, 5]], dtype) is True
    want = (
        "$.items[*].min_items",
        "Item 1 in $ is invalid. Array does not have at least 2 items",
    )
    assert check(spark, schema, [[1, 2], [3]], dtype) == want
    assert pyval.is_valid(schema, [[1, 2], [3]]) == want


def test_one_of_inside_items(spark):
    schema = {
        "type": "array",
        "items": {
            "one_of": [
                {"type": "integer", "maximum": 10},
                {"type": "integer", "minimum": 5},
            ]
        },
    }
    dtype = "array<bigint>"
    assert check(spark, schema, [1, 20], dtype) is True
    # 7 matches both branches → many_matched, nested under items[*]
    want = (
        "$.items[*].one_of",
        "Item 1 in $ is invalid. Value is not matching exactly one "
        "condition. More than one (conditions 0 and 1) matched.",
    )
    assert check(spark, schema, [1, 7], dtype) == want
    assert pyval.is_valid(schema, [1, 7]) == want


def test_object_inside_object(spark):
    schema = {
        "type": "object",
        "properties": {
            "outer": {
                "type": "object",
                "properties": {"inner": {"type": "string", "pattern": "^x"}},
                "required": ["inner"],
            }
        },
    }
    dtype = "struct<outer:struct<inner:string>>"
    assert check(spark, schema, (("xy",),), dtype) is True
    want = (
        "$.properties.outer.properties.inner.pattern",
        "String does not match pattern ^x",
    )
    assert check(spark, schema, (("yy",),), dtype) == want
    assert pyval.is_valid(schema, {"outer": {"inner": "yy"}}) == want
    want_req = (
        "$.properties.outer.required",
        '$.properties.outer is missing required property <<"inner">>',
    )
    assert check(spark, schema, ((None,),), dtype) == want_req
    assert pyval.is_valid(schema, {"outer": {}}) == want_req


def test_nullable_inside_combinator(spark):
    schema = {
        "any_of": [
            {"type": "string", "nullable": True},
            {"type": "integer"},
        ]
    }
    # null satisfies the nullable string branch
    assert check(spark, schema, None, "string") is True
    assert pyval.is_valid(schema, None) is True


def test_enum_of_booleans(spark):
    schema = {"enum": [True]}
    assert check(spark, schema, True, "boolean") is True
    assert check(spark, schema, False, "boolean") == (
        "$",
        "Value is not one in the enum",
    )
    assert pyval.is_valid(schema, False) == ("$", "Value is not one in the enum")
    # pyval: booleans never match integer enum members (Erlang atom vs int)
    assert pyval.is_valid({"enum": [1]}, True) == ("$", "Value is not one in the enum")
