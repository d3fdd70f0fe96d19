"""Property-based tests (triq parity, /root/reference/test/property_test/).

Layer 1 of the reference's test strategy: for each type, generate a random
value, derive a schema FROM the value (pin lengths/bounds/required to it —
ndto_properties.erl:81-231), and assert it validates True. Runs against the
fast pure-Python twin evaluator (pyval) with many examples.

Layer 1b: compiler ↔ pyval agreement on a seeded random corpus, evaluated
in ONE Spark job per column type (cheap), asserting identical verdicts and
identical (schema_path, description) for failures.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ndto_spark import pyval

# --- value generators (ndto_dom parity) ---------------------------------------

texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"), max_size=40
)
ints = st.integers(min_value=-(2**31), max_value=2**31)
floats = st.floats(allow_nan=False, allow_infinity=False, width=64)


@settings(max_examples=150, deadline=None)
@given(texts)
def test_prop_string(v):
    schema = {"type": "string", "min_length": len(v), "max_length": len(v)}
    assert pyval.is_valid(schema, v) is True


@settings(max_examples=150, deadline=None)
@given(ints, st.integers(min_value=1, max_value=9))
def test_prop_integer(v, k):
    # bounds bracketing the product, multiple_of divides it (prop_integer)
    prod = v * k
    schema = {
        "type": "integer",
        "minimum": prod - 1,
        "exclusive_minimum": True,
        "maximum": prod + 1,
        "exclusive_maximum": True,
        "multiple_of": k,
    }
    assert pyval.is_valid(schema, prod) is True


@settings(max_examples=150, deadline=None)
@given(floats)
def test_prop_float(v):
    schema = {"type": "float", "minimum": min(v, v - 1.0), "maximum": max(v, v + 1.0)}
    assert pyval.is_valid(schema, v) is True


@settings(max_examples=50, deadline=None)
@given(st.lists(ints, max_size=10))
def test_prop_array(v):
    schema = {
        "type": "array",
        "items": {"type": "integer"},
        "min_items": len(v),
        "max_items": len(v),
    }
    assert pyval.is_valid(schema, v) is True


@settings(max_examples=50, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=8), texts, max_size=6))
def test_prop_object(v):
    schema = {
        "type": "object",
        "properties": {k: {"type": "string"} for k in v},
        "required": list(v),
        "min_properties": len(v),
        "max_properties": len(v),
    }
    assert pyval.is_valid(schema, v) is True


@settings(max_examples=80, deadline=None)
@given(st.one_of(texts, ints, floats, st.booleans(), st.none()))
def test_prop_enum(v):
    assert pyval.is_valid({"enum": [v]}, v) is True


@settings(max_examples=80, deadline=None)
@given(st.one_of(texts, ints, floats, st.booleans()))
def test_prop_universal_and_ref(v):
    assert pyval.is_valid(True, v) is True
    assert pyval.is_valid({"ref": "any"}, v, {"any": {}}) is True


# --- compiler ↔ pyval agreement corpus ------------------------------------------


def _corpus():
    """Seeded random (schema, value) pairs per scalar dtype."""
    rng = random.Random(7)
    cases: dict[str, list[tuple[dict, object]]] = {"bigint": [], "double": [], "string": []}
    for _ in range(40):
        v = rng.randint(-50, 50)
        schema = {
            "type": "integer",
            "minimum": rng.randint(-30, 10),
            "maximum": rng.randint(-5, 40),
            "multiple_of": rng.randint(1, 6),
        }
        if rng.random() < 0.3:
            schema["exclusive_minimum"] = True
        cases["bigint"].append((schema, v))
        cases["bigint"].append(
            (
                {
                    "one_of": [
                        {"type": "integer", "maximum": rng.randint(-10, 20)},
                        {"type": "integer", "minimum": rng.randint(-20, 10)},
                        {"type": "integer", "multiple_of": rng.randint(1, 4)},
                    ]
                },
                v,
            )
        )
        cases["bigint"].append(
            (
                {
                    "all_of": [
                        {"type": "integer", "minimum": rng.randint(-30, 0)},
                        {"type": "integer", "maximum": rng.randint(0, 30)},
                    ]
                },
                v,
            )
        )
        f = rng.uniform(-10, 10)
        cases["double"].append(
            (
                {
                    "type": "float",
                    "minimum": rng.uniform(-8, 0),
                    "maximum": rng.uniform(0, 8),
                    "exclusive_maximum": rng.random() < 0.5,
                },
                f,
            )
        )
        s = "".join(rng.choice("abcxyz!@ ") for _ in range(rng.randint(0, 12)))
        cases["string"].append(
            (
                {
                    "type": "string",
                    "min_length": rng.randint(0, 6),
                    "max_length": rng.randint(4, 14),
                    "pattern": rng.choice(["a", "^b", "x.z", "[0-9]"]),
                },
                s,
            )
        )
        cases["string"].append(({"not": {"enum": ["abc", s]}}, s))
    return cases


def _nested_corpus():
    """Seeded random (schema, value) pairs for array and struct dtypes."""
    rng = random.Random(11)
    arr_cases, obj_cases = [], []
    for _ in range(30):
        v = [rng.randint(-5, 5) for _ in range(rng.randint(0, 6))]
        arr_cases.append(
            (
                {
                    "type": "array",
                    "items": {"type": "integer", "minimum": rng.randint(-4, 1)},
                    "min_items": rng.randint(0, 3),
                    "max_items": rng.randint(3, 7),
                    **({"unique_items": True} if rng.random() < 0.5 else {}),
                },
                v,
            )
        )
        name = rng.choice(["abc", "a", "zz!", ""])
        num = rng.randint(-10, 10)
        obj_cases.append(
            (
                {
                    "type": "object",
                    "properties": {
                        "name": {"type": "string", "min_length": rng.randint(0, 3)},
                        "num": {"type": "integer", "maximum": rng.randint(-5, 8)},
                    },
                    "required": rng.choice([[], ["name"], ["name", "num"]]),
                },
                {"name": name, "num": num},
            )
        )
    return arr_cases, obj_cases


def test_compiler_matches_pyval_on_nested_corpus(spark):
    from pyspark.sql import functions as F

    from ndto_spark.compiler import Compiler

    arr_cases, obj_cases = _nested_corpus()
    for dtype, pairs, to_py in (
        ("array<bigint>", arr_cases, lambda v: v),
        ("struct<name:string,num:bigint>", obj_cases, lambda v: v),
    ):
        rows = []
        for _, v in pairs:
            rows.append(((v["name"], v["num"]),) if isinstance(v, dict) else (v,))
        df = spark.createDataFrame(rows, schema=f"v {dtype}")
        df = df.withColumn("i", F.monotonically_increasing_id())
        comp = Compiler()
        cols = [
            F.struct(
                c.pred.alias("p"),
                c.viol["schema_path"].alias("sp"),
                c.viol["description"].alias("d"),
            ).alias(f"c{j}")
            for j, c in enumerate(
                comp.compile(s, F.col("v"), df.schema["v"].dataType, "$")
                for s, _ in pairs
            )
        ]
        out = df.select(F.col("i"), *cols).orderBy("i").collect()
        for j, ((schema, value), row) in enumerate(zip(pairs, out)):
            got = row[f"c{j}"]
            want = pyval.is_valid(schema, to_py(value))
            ctx = f"dtype={dtype} case={j} schema={schema} value={value!r}"
            if want is True:
                assert got.p, f"compiler rejected, pyval accepted: {ctx} got={got}"
            else:
                assert not got.p, f"compiler accepted, pyval rejected: {ctx}"
                assert (got.sp, got.d) == want, f"{ctx}: {(got.sp, got.d)} != {want}"


def test_compiler_matches_pyval_on_corpus(spark):
    from pyspark.sql import functions as F

    from ndto_spark.compiler import Compiler

    for dtype, pairs in _corpus().items():
        df = spark.createDataFrame([(v,) for _, v in pairs], schema=f"v {dtype}")
        df = df.withColumn("i", F.monotonically_increasing_id())
        comp = Compiler()
        cols = []
        for j, (schema, _) in enumerate(pairs):
            c = comp.compile(schema, F.col("v"), df.schema["v"].dataType, "$")
            cols.append(
                F.struct(
                    c.pred.alias("p"),
                    c.viol["schema_path"].alias("sp"),
                    c.viol["description"].alias("d"),
                ).alias(f"c{j}")
            )
        rows = df.select(F.col("i"), *cols).orderBy("i").collect()
        for j, ((schema, value), row) in enumerate(zip(pairs, rows)):
            got = row[f"c{j}"]
            want = pyval.is_valid(schema, value)
            ctx = f"dtype={dtype} case={j} schema={schema} value={value!r}"
            if want is True:
                assert got.p, f"compiler rejected, pyval accepted: {ctx} got={got}"
            elif want is False:  # reason-less 'not'
                assert not got.p and got.d is None, ctx
            else:
                assert not got.p, f"compiler accepted, pyval rejected: {ctx}"
                assert (got.sp, got.d) == want, f"{ctx}: {(got.sp, got.d)} != {want}"


def _variant_corpus():
    """Seeded random (schema, value) pairs evaluated over a VARIANT column.

    The runtime-type-dispatch path (Compiler._variant_typed): mixed scalar
    any_of/one_of, single-typed schemas against dynamic values, nullable.
    Values are rendered to JSON and parsed with parse_json, so the Spark
    side sees exactly what a JSON document column would carry.
    """
    import json

    rng = random.Random(13)
    cases: list[tuple[dict, object, str]] = []
    for _ in range(40):
        kind = rng.choice(["int", "str", "float", "bool", "null"])
        if kind == "int":
            v: object = rng.randint(-50, 50)
        elif kind == "str":
            v = "".join(rng.choice("abcxyz0 !") for _ in range(rng.randint(0, 8)))
        elif kind == "float":
            v = round(rng.uniform(-8, 8), 3) + 0.0001  # never integral
        elif kind == "bool":
            v = rng.random() < 0.5
        else:
            v = None
        int_branch = {
            "type": "integer",
            "minimum": rng.randint(-30, 0),
            "maximum": rng.randint(0, 30),
            **({"multiple_of": rng.randint(1, 4)} if rng.random() < 0.4 else {}),
        }
        str_branch = {
            "type": "string",
            "min_length": rng.randint(0, 4),
            "max_length": rng.randint(3, 10),
            **({"pattern": rng.choice(["a", "^b", "[0-9]"])} if rng.random() < 0.4 else {}),
        }
        schema = rng.choice(
            [
                {"any_of": [int_branch, str_branch]},
                {"one_of": [int_branch, str_branch]},
                {
                    "any_of": [
                        {"type": "float", "minimum": rng.uniform(-9, 0)},
                        {"type": "boolean"},
                        str_branch,
                    ]
                },
                int_branch,
                str_branch,
            ]
        )
        if rng.random() < 0.25:
            schema = dict(schema)
            schema["nullable"] = True
        cases.append((schema, v, json.dumps(v)))
    return cases


def test_compiler_matches_pyval_on_variant_corpus(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ndto_spark.compiler import Compiler

    pairs = _variant_corpus()
    df = spark.createDataFrame([(js,) for _, _, js in pairs], schema="s string")
    df = df.withColumn("i", F.monotonically_increasing_id()).withColumn(
        "v", F.parse_json(F.col("s"))
    )
    comp = Compiler()
    cols = [
        F.struct(
            c.pred.alias("p"),
            c.viol["schema_path"].alias("sp"),
            c.viol["description"].alias("d"),
        ).alias(f"c{j}")
        for j, c in enumerate(
            comp.compile(s, F.col("v"), T.VariantType(), "$")
            for s, _, _ in pairs
        )
    ]
    rows = df.select(F.col("i"), *cols).orderBy("i").collect()
    for j, ((schema, value, js), row) in enumerate(zip(pairs, rows)):
        got = row[f"c{j}"]
        want = pyval.is_valid(schema, value)
        ctx = f"case={j} schema={schema} value={value!r} json={js}"
        if want is True:
            assert got.p, f"compiler rejected, pyval accepted: {ctx} got={got}"
        else:
            assert not got.p, f"compiler accepted, pyval rejected: {ctx}"
            assert (got.sp, got.d) == want, f"{ctx}: {(got.sp, got.d)} != {want}"
