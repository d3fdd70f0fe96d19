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


def test_parsed_spec_compiles_to_columns(spark, tmp_path):
    """Parser → registry → Column compiler integration (acyclic refs)."""
    import json as _json

    from pyspark.sql import functions as F

    from ndto_spark.compiler import Compiler
    from ndto_spark.parser import parse

    spec = {
        "$schema": "http://json-schema.org/draft-04/schema#",
        "type": "object",
        "properties": {
            "name": {"$ref": "#/definitions/ShortName"},
            "score": {"type": "number", "minimum": 0},
        },
        "required": ["name"],
        "definitions": {
            "ShortName": {"type": "string", "maxLength": 5}
        },
    }
    p = tmp_path / "spec.json"
    p.write_text(_json.dumps(spec))
    schemas = dict(parse(str(p), name="myspec"))
    assert "myspec_ShortName" in schemas

    df = spark.createDataFrame(
        [(1, "bob", 3.0), (2, "toolongname", 1.0), (3, "al", -2.0), (4, None, 1.0)],
        "id bigint, name string, score double",
    )
    comp = Compiler(registry=schemas)
    row = F.struct(F.col("name"), F.col("score"))
    dtype = df.select(row.alias("r")).schema["r"].dataType
    c = comp.compile(schemas["myspec"], row, dtype, "$")
    rows = {r.id: r for r in df.select("id", c.pred.alias("p"), c.viol.alias("v")).collect()}
    assert rows[1].p
    # ref'd validator reports at its own '$' root (module-per-ref parity)
    assert not rows[2].p and rows[2].v.schema_path == "$.max_length"
    # 'number' → any_of[integer, float]; a failing double fails both branches
    assert not rows[3].p and rows[3].v.schema_path == "$.properties.score.any_of"
    assert not rows[4].p and rows[4].v.schema_path == "$.required"


# --- parser registry (ndto_parser:parse/2,3 dispatch parity) ------------------


def test_parser_registry_dispatch(tmp_path):
    import json as _json

    from ndto_spark.parser import (
        DEFAULT_PARSER,
        ParseError,
        parse,
        register_parser,
        registered_parsers,
    )

    assert DEFAULT_PARSER in registered_parsers()
    p = tmp_path / "s.json"
    p.write_text(_json.dumps({"type": "string", "minLength": 2}))
    # default dialect still reachable positionally (backward compatible)
    root_name, root = parse(str(p), name="s")[0]
    assert root_name == "s" and root.get("min_length") == 2

    # a second dialect: trivial "everything is a universal schema" parser
    def universal(path, name=None):
        return [(name or "u", True)]

    register_parser("universal", universal)
    assert parse(str(p), name="x", parser="universal") == [("x", True)]
    with pytest.raises(ParseError, match="unknown spec parser"):
        parse(str(p), parser="no_such_dialect")
