"""Golden tests for scalar keywords + combinators.

Each case mirrors an exact expectation from the reference Common Test suite
(/root/reference/test/ndto_SUITE.erl lines cited per test), asserting the
same (schema_path, description) pair the generated Erlang validator returns.
"""

from __future__ import annotations

import pytest

from tests.conftest import check


# --- nullable × type (ndto_SUITE.erl:153-195) -------------------------------


def test_nullable_accepts_null(spark):
    for t, dtype in [
        ("string", "string"),
        ("integer", "bigint"),
        ("float", "double"),
        ("boolean", "boolean"),
    ]:
        assert check(spark, {"type": t, "nullable": True}, None, dtype) is True


def test_nullable_string_still_type_checks(spark):
    assert check(spark, {"type": "string", "nullable": True}, 5, "bigint") == (
        "$.type",
        "Value is not a string",
    )


def test_null_without_nullable_is_type_error(spark):
    cases = [
        ("string", "string", "Value is not a string"),
        ("integer", "bigint", "Value is not an integer"),
        ("float", "double", "Value is not a float"),
        ("boolean", "boolean", "Value is not a boolean"),
        ("array", "array<bigint>", "Value is not an array"),
        ("object", "map<string,string>", "Value is not an object"),
    ]
    for t, dtype, msg in cases:
        assert check(spark, {"type": t}, None, dtype) == ("$.type", msg)


# --- one_of (ndto_SUITE.erl:197-218) ----------------------------------------

ONE_OF = {
    "one_of": [
        {"type": "integer", "minimum": 0},
        {"type": "integer", "minimum": 1},
        {"type": "float", "minimum": 0},
    ]
}


def test_one_of_none_matched(spark):
    assert check(spark, ONE_OF, "0", "string") == (
        "$.one_of",
        "Value is not matching exactly one condition. None matched.",
    )


def test_one_of_many_matched(spark):
    assert check(spark, ONE_OF, 1, "bigint") == (
        "$.one_of",
        "Value is not matching exactly one condition. "
        "More than one (conditions 0 and 1) matched.",
    )


def test_one_of_exactly_one(spark):
    assert check(spark, ONE_OF, 0.0, "double") is True


# --- any_of (ndto_SUITE.erl:220-236) ----------------------------------------

ANY_OF = {
    "any_of": [
        {"type": "integer", "minimum": 0},
        {"type": "integer", "minimum": 1},
        {"type": "float", "minimum": 0},
    ]
}


def test_any_of(spark):
    assert check(spark, ANY_OF, "0", "string") == (
        "$.any_of",
        "Value is not matching at least one condition. None matched.",
    )
    assert check(spark, ANY_OF, 0, "bigint") is True
    assert check(spark, ANY_OF, 0.0, "double") is True


# --- all_of (ndto_SUITE.erl:238-266) ----------------------------------------

ALL_OF = {
    "all_of": [
        {"type": "integer", "minimum": 0},
        {"type": "integer", "minimum": 1},
    ]
}


def test_all_of_type_failure_carries_nested_path(spark):
    assert check(spark, ALL_OF, "1", "string") == (
        "$.all_of",
        "Value is not matching all conditions. Condition 1 failed because of "
        "schema path '$.all_of[1].type' : Value is not an integer",
    )


def test_all_of_minimum_failure(spark):
    assert check(spark, ALL_OF, 0, "bigint") == (
        "$.all_of",
        "Value is not matching all conditions. Condition 1 failed because of "
        "schema path '$.all_of[1].minimum' : Value is not a number greater or equal to 1",
    )


def test_all_of_float_is_not_integer(spark):
    assert check(spark, ALL_OF, 1.0, "double") == (
        "$.all_of",
        "Value is not matching all conditions. Condition 1 failed because of "
        "schema path '$.all_of[1].type' : Value is not an integer",
    )


def test_all_of_valid(spark):
    assert check(spark, ALL_OF, 1, "bigint") is True


# --- not (ndto_SUITE.erl:268-277): bare false, no reason text ----------------


def test_not(spark):
    schema = {"not": {"type": "integer", "minimum": 0}}
    res = check(spark, schema, 0, "bigint")
    assert res == ("$.not", None)  # reason-less like the reference's bare false
    assert check(spark, schema, "0", "string") is True
    assert check(spark, schema, -1, "bigint") is True


# --- pattern (ndto_SUITE.erl:279-287), unanchored partial match --------------


def test_pattern(spark):
    schema = {"type": "string", "pattern": r"[a-z]+@[a-z]+\.[a-z]+"}
    assert check(spark, schema, "test@ndto.erl", "string") is True
    assert check(spark, schema, "nope", "string") == (
        "$.pattern",
        r"String does not match pattern [a-z]+@[a-z]+\.[a-z]+",
    )


# --- README quickstart: min_length 8 + pattern ^hello ------------------------


def test_readme_quickstart(spark):
    schema = {"type": "string", "min_length": 8, "pattern": "^hello"}
    assert check(spark, schema, "hello world", "string") is True
    assert check(spark, schema, "hello", "string") == (
        "$.min_length",
        'String length "Length" is less than 8',
    )
    # pattern evaluates BEFORE min_length (reverse declaration order):
    assert check(spark, schema, "hi", "string") == (
        "$.pattern",
        "String does not match pattern ^hello",
    )


# --- numeric bounds + multiple_of --------------------------------------------


def test_integer_bounds(spark):
    schema = {"type": "integer", "minimum": 0, "maximum": 10}
    assert check(spark, schema, 5, "bigint") is True
    assert check(spark, schema, -1, "bigint") == (
        "$.minimum",
        "Value is not a number greater or equal to 0",
    )
    assert check(spark, schema, 11, "bigint") == (
        "$.maximum",
        "Number is not lower or equal to 10",
    )


def test_integer_exclusive_bounds(spark):
    schema = {
        "type": "integer",
        "minimum": 0,
        "exclusive_minimum": True,
        "maximum": 10,
        "exclusive_maximum": True,
    }
    assert check(spark, schema, 0, "bigint") == (
        "$.minimum",
        "Value is not a number greater than 0",
    )
    assert check(spark, schema, 10, "bigint") == (
        "$.maximum",
        "Number is not lower than 10",
    )
    assert check(spark, schema, 1, "bigint") is True


def test_multiple_of_truncating_semantics(spark):
    # Erlang rem truncates toward zero, identical to Spark % on integers
    schema = {"type": "integer", "multiple_of": 3}
    assert check(spark, schema, 9, "bigint") is True
    assert check(spark, schema, -9, "bigint") is True
    assert check(spark, schema, 10, "bigint") == (
        "$.multiple_of",
        "Value is not multiple of 3",
    )


def test_multiple_of_has_priority_over_bounds(spark):
    # reverse declaration order [minimum, maximum, multiple_of]: multiple_of
    # is evaluated FIRST, so a value failing both reports multiple_of
    schema = {"type": "integer", "minimum": 100, "multiple_of": 3}
    assert check(spark, schema, 10, "bigint") == (
        "$.multiple_of",
        "Value is not multiple of 3",
    )


def test_float_bounds_and_no_multiple_of(spark):
    schema = {"type": "float", "minimum": 0.5, "multiple_of": 0.5}
    # float multiple_of emits NO check (ndto_generator_float.erl:91-92)
    assert check(spark, schema, 0.75, "double") is True
    assert check(spark, schema, 0.25, "double") == (
        "$.minimum",
        "Value is not a number greater or equal to 0.5",
    )


# --- enum ---------------------------------------------------------------------


def test_enum(spark):
    schema = {"enum": ["png", "jpeg"]}
    assert check(spark, schema, "png", "string") is True
    # path is the bare prefix, not $.enum (ndto_generator_enum.erl:41)
    assert check(spark, schema, "gif", "string") == (
        "$",
        "Value is not one in the enum",
    )


def test_enum_with_null_member(spark):
    assert check(spark, {"enum": ["a", None]}, None, "string") is True
    assert check(spark, {"enum": ["a"]}, None, "string") == (
        "$",
        "Value is not one in the enum",
    )


def test_enum_mixed_types_against_typed_column(spark):
    schema = {"enum": [1, "one"]}
    assert check(spark, schema, 1, "bigint") is True
    assert check(spark, schema, "one", "string") is True
    assert check(spark, schema, 2, "bigint") == ("$", "Value is not one in the enum")


# --- formats (ndto_SUITE.erl:423-443) ----------------------------------------


def test_iso8601(spark):
    schema = {"type": "string", "format": "iso8601"}
    assert check(spark, schema, "2024-06-07T10:15:00+00:00", "string") is True
    assert check(spark, schema, "2024-06-07T10:15:00Z", "string") is True
    assert check(spark, schema, "not a date", "string") == (
        "$.format",
        "String is not a valid ISO8601 date",
    )
    assert check(spark, schema, "2024-13-40T99:99:99Z", "string") == (
        "$.format",
        "String is not a valid ISO8601 date",
    )


def test_base64(spark):
    schema = {"type": "string", "format": "base64"}
    assert check(spark, schema, "dGhpcyBpcyBhIHRlc3Q=", "string") is True
    assert check(spark, schema, "abc", "string") == (
        "$.format",
        "String length is not a multiple of 4",
    )
    # invalid alphabet: the reference's generated code yields a bare false
    res = check(spark, schema, "a$c=", "string")
    assert res == ("$.format", None)


def test_unknown_format_is_ignored(spark):
    assert check(spark, {"type": "string", "format": "email"}, "zzz", "string") is True


# --- empty / universal ---------------------------------------------------------


def test_empty_schema(spark):
    assert check(spark, False, "anything", "string") == (
        "$",
        "Unexpected value for false schema",
    )


def test_universal_schema(spark):
    assert check(spark, True, "anything", "string") is True
    assert check(spark, {}, None, "string") is True


# --- ref ------------------------------------------------------------------------


def test_ref(spark):
    registry = {"positive": {"type": "integer", "minimum": 1}}
    schema = {"ref": "positive"}
    assert check(spark, schema, 5, "bigint", registry=registry) is True
    # referenced validator reports paths rooted at its own '$'
    assert check(spark, schema, 0, "bigint", registry=registry) == (
        "$.minimum",
        "Value is not a number greater or equal to 1",
    )


def test_ref_degenerate_cycle_raises(spark):
    """A cycle with no structural descent (a→b→a over the same type) is the
    spec the reference's generated modules would loop forever on — reject."""
    from ndto_spark.compiler import CompileError

    registry = {"a": {"ref": "b"}, "b": {"ref": "a"}}
    with pytest.raises(CompileError, match="structural progress"):
        check(spark, {"ref": "a"}, 1, "bigint", registry=registry)


# linked-list spec: the canonical cyclic $ref shape (the reference's own OAS
# 3.0 meta-schema E2E fixture is cyclic, test/ndto_SUITE.erl:445-483)
_NODE_REGISTRY = {
    "node": {
        "type": "object",
        "properties": {
            "val": {"type": "integer", "minimum": 0},
            "next": {"ref": "node"},
        },
        "required": ["val"],
    }
}
_NODE_DTYPE = (
    "struct<val:bigint,next:struct<val:bigint,next:struct<val:bigint>>>"
)


def test_ref_cycle_unrolls_against_finite_dtype(spark):
    """Cycles that descend the structure unroll to the dtype's depth."""
    ok = {"val": 1, "next": {"val": 2, "next": {"val": 3}}}
    assert check(spark, {"ref": "node"}, ok, _NODE_DTYPE, registry=_NODE_REGISTRY) is True
    # violation two levels deep is found and reported at the ref's own root
    bad_deep = {"val": 1, "next": {"val": 2, "next": {"val": -3}}}
    assert check(
        spark, {"ref": "node"}, bad_deep, _NODE_DTYPE, registry=_NODE_REGISTRY
    ) == ("$.properties.val.minimum", "Value is not a number greater or equal to 0")
    # missing required at an inner level fails closed
    bad_req = {"val": 1, "next": {"next": {"val": 3}}}
    assert check(
        spark, {"ref": "node"}, bad_req, _NODE_DTYPE, registry=_NODE_REGISTRY
    ) == ("$.required", "$ is missing required property <<\"val\">>")


def test_ref_cycle_compiler_agrees_with_pyval(spark):
    from ndto_spark import pyval

    cases = [
        {"val": 1, "next": {"val": 2, "next": {"val": 3}}},
        {"val": 1, "next": {"val": 2, "next": {"val": -3}}},
        {"val": 1, "next": {"next": {"val": 3}}},
        {"val": -1},
        # NOTE: {"next": None} is NOT in the corpus — a Spark struct cannot
        # distinguish explicit-null from absent (NULL field = absent = pass,
        # compiler.py property handling), while pyval sees Python None as an
        # explicit non-object value. Known representational difference.
        {"val": 0},
    ]
    for v in cases:
        spark_res = check(
            spark, {"ref": "node"}, v, _NODE_DTYPE, registry=_NODE_REGISTRY
        )
        py_res = pyval.is_valid({"ref": "node"}, v, registry=_NODE_REGISTRY)
        assert spark_res == py_res, (v, spark_res, py_res)
