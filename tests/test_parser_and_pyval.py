"""Parser structural tests + the petstore E2E golden test.

Mirrors /root/reference/test/ndto_parser_json_schema_SUITE.erl:61-97 and the
end-to-end OAS test at /root/reference/test/ndto_SUITE.erl:445-483: parse
the OAS 3.0 meta-schema (draft-04, $refs + cycles), then validate the
petstore example document → True with the pure-Python twin evaluator.

The reference's own priv JSON files are used READ-ONLY as test inputs; the
tests skip if they are absent.
"""

from __future__ import annotations

import json
import os

import pytest

from ndto_spark import pyval
from ndto_spark.parser import parse, parse_schema

OAS_SPEC = "/root/reference/priv/oas/3.0/specs/oas_3_0.json"
PETSTORE = "/root/reference/priv/oas/3.0/examples/petstore.json"

needs_oas = pytest.mark.skipif(
    not os.path.exists(OAS_SPEC), reason="reference priv fixtures not present"
)


# --- parser structural assertions (parser suite parity) -----------------------


@needs_oas
def test_parse_oas_meta_schema_structure():
    schemas = dict(parse(OAS_SPEC, name="oas_3_0"))
    root = schemas["oas_3_0"]
    assert root["type"] == "object"
    assert root["properties"]["openapi"]["pattern"] == r"^3\.0\.\d(-.+)?$"
    # Schema.not is oneOf [ref Reference, ref Schema]
    sch = schemas["oas_3_0_Schema"]
    one_of = sch["properties"]["not"]["one_of"]
    refs = sorted(s["ref"] for s in one_of)
    assert refs == ["oas_3_0_Reference", "oas_3_0_Schema"]


@needs_oas
def test_parse_handles_ref_cycles():
    # Schema refs itself (properties.not → Schema); parse must terminate and
    # register each ref target exactly once
    schemas = dict(parse(OAS_SPEC, name="oas_3_0"))
    names = list(dict(parse(OAS_SPEC, name="oas_3_0")))
    assert len(names) == len(set(names))
    assert "oas_3_0_Schema" in schemas


# --- E2E: petstore validates against the parsed meta-schema -------------------


@needs_oas
def test_petstore_is_valid_oas_document():
    schemas = dict(parse(OAS_SPEC, name="oas_3_0"))
    registry = dict(schemas)
    with open(PETSTORE) as f:
        doc = json.load(f)
    assert pyval.is_valid(schemas["oas_3_0"], doc, registry) is True


@needs_oas
def test_broken_petstore_is_flagged():
    schemas = dict(parse(OAS_SPEC, name="oas_3_0"))
    registry = dict(schemas)
    with open(PETSTORE) as f:
        doc = json.load(f)
    del doc["info"]  # 'info' is required
    res = pyval.is_valid(schemas["oas_3_0"], doc, registry)
    assert res is not True
    path, desc = res
    assert path == "$.required" and "info" in desc


# --- pyval golden parity with ndto_SUITE (same cases as the Column compiler) --


def test_pyval_scalar_parity():
    assert pyval.is_valid({"type": "string", "nullable": True}, None) is True
    assert pyval.is_valid({"type": "string"}, 5) == (
        "$.type",
        "Value is not a string",
    )
    one_of = {
        "one_of": [
            {"type": "integer", "minimum": 0},
            {"type": "integer", "minimum": 1},
            {"type": "float", "minimum": 0},
        ]
    }
    assert pyval.is_valid(one_of, "0") == (
        "$.one_of",
        "Value is not matching exactly one condition. None matched.",
    )
    assert pyval.is_valid(one_of, 1) == (
        "$.one_of",
        "Value is not matching exactly one condition. "
        "More than one (conditions 0 and 1) matched.",
    )
    assert pyval.is_valid(one_of, 0.0) is True
    all_of = {
        "all_of": [
            {"type": "integer", "minimum": 0},
            {"type": "integer", "minimum": 1},
        ]
    }
    assert pyval.is_valid(all_of, 0) == (
        "$.all_of",
        "Value is not matching all conditions. Condition 1 failed because of "
        "schema path '$.all_of[1].minimum' : Value is not a number greater or equal to 1",
    )
    assert pyval.is_valid({"not": {"type": "integer", "minimum": 0}}, 0) is False
    assert pyval.is_valid({"not": {"type": "integer", "minimum": 0}}, -1) is True
    # pattern_properties error shape (ndto_SUITE.erl:289-306)
    pp = {"type": "object", "pattern_properties": {"[a-z]+": {"type": "string"}}}
    assert pyval.is_valid(pp, {"foo": 0}) == (
        "$.pattern_properties.[a-z]+.type",
        'Property "foo" failed validation: Value is not a string',
    )
    ap = {
        "type": "object",
        "pattern_properties": {"^[A-Z]+$": True},
        "additional_properties": False,
    }
    assert pyval.is_valid(ap, {"Foo": True, "BAR": 1}) == (
        "$.additional_properties",
        'Object has unsupported keys: "Foo"',
    )
    # items failure: nested path + 0-based index
    arr = {"type": "array", "items": {"type": "integer", "minimum": 0}}
    assert pyval.is_valid(arr, [1, -2]) == (
        "$.items[*].minimum",
        "Item 1 in $ is invalid. Value is not a number greater or equal to 0",
    )
    # erlang rem truncation
    assert pyval.is_valid({"type": "integer", "multiple_of": 3}, -9) is True


def test_parse_schema_inline():
    s = parse_schema({"type": "number", "minimum": 1})
    assert "any_of" in s
    assert pyval.is_valid(s, 2) is True
    assert pyval.is_valid(s, 2.5) is True
    assert pyval.is_valid(s, 0) is not True


def test_attempt_type_distributes_keywords():
    s = parse_schema({"minLength": 3})
    # no explicit type → any_of with a typed string schema
    assert pyval.is_valid(s, "abcd") is True
    assert pyval.is_valid(s, "a") is not True
