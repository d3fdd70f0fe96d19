"""Pure-Python value validator — the driver-side twin of the compiler.

Evaluates a spec against a single Python value with EXACTLY the reference's
semantics: reverse-declaration-order keyword priority, first-failure
reporting, same paths and messages (shared messages module). Returns
``True`` or ``(schema_path, description)`` — and bare ``False`` for the
reason-less ``not`` failure, mirroring ndto_generator_complement.erl:42-46.

Used for: (a) the parser E2E parity test (petstore document vs the parsed
OAS meta-schema, ndto_SUITE.erl:445-483 analog); (b) the Hypothesis
property-test oracle cross-checking the Column compiler; (c) driver-side
spec sanity checks. The distributed path never calls this per row.

Unlike the Column compiler, this evaluator supports CYCLIC refs (recursion
through the registry, like the reference's mutually recursive modules).
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Any, Optional, Union

from . import messages as M
from .spec import Schema, normalize

Result = Union[bool, tuple]


def is_valid(
    schema: Schema, value: Any, registry: Optional[dict[str, Schema]] = None
) -> Result:
    return _eval(normalize(schema), value, "$", registry or {})


_MISSING = object()  # 'undefined' — absent property


def _fail(path: str, desc: str) -> tuple:
    return (path, desc)


def _eval(schema: Schema, value: Any, path: str, reg: dict) -> Result:
    if schema is False:
        return _fail(path, M.EMPTY_MSG)
    if schema is True:
        return True
    assert isinstance(schema, dict)
    if value is _MISSING:
        return True if schema.get("optional") else _eval_core(schema, None, path, reg)
    if value is None and schema.get("nullable"):
        return True
    return _eval_core(schema, value, path, reg)


def _eval_core(schema: dict, value: Any, path: str, reg: dict) -> Result:
    if "ref" in schema:
        name = schema["ref"]
        if name not in reg:
            raise KeyError(f"unresolved ref {name!r}")
        return _eval(normalize(reg[name]), value, "$", reg)
    if "enum" in schema:
        for member in schema["enum"]:
            if _deep_eq(member, value):
                return True
        return _fail(path, M.ENUM_MSG)
    if "type" in schema:
        return _typed(schema, value, path, reg)
    if "one_of" in schema:
        return _one_of(schema, value, path, reg)
    if "any_of" in schema:
        subs = schema["any_of"]
        for i, sub in enumerate(subs):
            if _eval(sub, value, f"{path}.any_of[{i}]", reg) is True:
                return True
        return _fail(f"{path}.any_of", M.ANY_OF_NONE_MSG)
    if "all_of" in schema:
        subs = schema["all_of"]
        # reversed evaluation: highest index reported first
        for i in range(len(subs) - 1, -1, -1):
            r = _eval(subs[i], value, f"{path}.all_of[{i}]", reg)
            if r is not True:
                nested_path, nested_desc = r if isinstance(r, tuple) else ("", "")
                return _fail(
                    f"{path}.all_of",
                    "Value is not matching all conditions. Condition %s failed "
                    "because of schema path '%s' : %s" % (i, nested_path, nested_desc),
                )
        return True
    if "not" in schema:
        r = _eval(schema["not"], value, f"{path}.not", reg)
        return False if r is True else True  # bare false: no reason tuple
    return True  # universal


def _one_of(schema: dict, value: Any, path: str, reg: dict) -> Result:
    subs = schema["one_of"]
    matched = [
        i
        for i, sub in enumerate(subs)
        if _eval(sub, value, f"{path}.one_of[{i}]", reg) is True
    ]
    if len(matched) == 1:
        return True
    if not matched:
        return _fail(f"{path}.one_of", M.ONE_OF_NONE_MSG)
    # the two HIGHEST declaration indices, printed ascending
    a, b = sorted(matched)[-2:]
    return _fail(
        f"{path}.one_of",
        "Value is not matching exactly one condition. "
        "More than one (conditions %s and %s) matched." % (a, b),
    )


def _deep_eq(a: Any, b: Any) -> bool:
    """Erlang-term equality: booleans are atoms (never equal to ints),
    ints and floats are distinct types, deep through lists/maps."""
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_deep_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_deep_eq(v, b[k]) for k, v in a.items())
    return type(a) == type(b) and a == b


def _typed(schema: dict, value: Any, path: str, reg: dict) -> Result:
    t = schema["type"]
    guards = {
        "string": lambda v: isinstance(v, str),
        "integer": lambda v: isinstance(v, int) and not isinstance(v, bool),
        "float": lambda v: isinstance(v, float),
        "boolean": lambda v: isinstance(v, bool),
        "array": lambda v: isinstance(v, list),
        "object": lambda v: isinstance(v, dict),
    }
    if not guards[t](value):
        return _fail(f"{path}.type", M.type_msg(t))
    checks = _keyword_checks(schema, t, path)
    # reverse declaration order (the reference's foldl-prepend + head-first)
    for keyword, check in reversed(checks):
        r = check(value, reg)
        if r is not True:
            return r
    return True


def _keyword_checks(schema: dict, t: str, path: str):
    cs = []
    if t in ("integer", "float"):
        if "minimum" in schema:
            m, ex = schema["minimum"], bool(schema.get("exclusive_minimum"))
            cs.append(
                (
                    "minimum",
                    lambda v, _, m=m, ex=ex: True
                    if (v > m if ex else v >= m)
                    else _fail(f"{path}.minimum", M.minimum_msg(m, ex)),
                )
            )
        if "maximum" in schema:
            m, ex = schema["maximum"], bool(schema.get("exclusive_maximum"))
            cs.append(
                (
                    "maximum",
                    lambda v, _, m=m, ex=ex: True
                    if (v < m if ex else v <= m)
                    else _fail(f"{path}.maximum", M.maximum_msg(m, ex)),
                )
            )
        if "multiple_of" in schema and t == "integer":
            k = schema["multiple_of"]
            cs.append(
                (
                    "multiple_of",
                    lambda v, _, k=k: True
                    if _trunc_rem(v, k) == 0
                    else _fail(f"{path}.multiple_of", M.multiple_of_msg(k)),
                )
            )
    elif t == "string":
        # len() = codepoints, mirroring the compiler's DEFAULT string_length
        # mode (the pyval<->compiler agreement invariant). Erlang
        # string:length/1 counts UAX #29 graphemes — both engines expose
        # that via CompileOptions(string_length="grapheme") /
        # ndto_spark.graphemes.count; identical for the ASCII test corpus.
        if "min_length" in schema:
            n = schema["min_length"]
            cs.append(
                (
                    "min_length",
                    lambda v, _, n=n: True
                    if len(v) >= n
                    else _fail(f"{path}.min_length", M.min_length_msg(n)),
                )
            )
        if "max_length" in schema:
            n = schema["max_length"]
            cs.append(
                (
                    "max_length",
                    lambda v, _, n=n: True
                    if len(v) <= n
                    else _fail(f"{path}.max_length", M.max_length_msg(n)),
                )
            )
        if "format" in schema:
            fmt = schema["format"]
            if fmt == "iso8601":
                cs.append(("format", lambda v, _: _check_iso8601(v, path)))
            elif fmt == "base64":
                cs.append(("format", lambda v, _: _check_base64(v, path)))
        if "pattern" in schema:
            p = schema["pattern"]
            cs.append(
                (
                    "pattern",
                    lambda v, _, p=p: True
                    if re.search(p, v)
                    else _fail(f"{path}.pattern", M.pattern_msg(p)),
                )
            )
    elif t == "array":
        if "items" in schema:
            items = schema["items"]
            if isinstance(items, list):
                cs.append(("items", _tuple_items_check(schema, path)))
            else:
                cs.append(("items", _single_items_check(items, path)))
        if "min_items" in schema:
            n = schema["min_items"]
            cs.append(
                (
                    "min_items",
                    lambda v, _, n=n: True
                    if len(v) >= n
                    else _fail(f"{path}.min_items", M.min_items_msg(n)),
                )
            )
        if "max_items" in schema:
            n = schema["max_items"]
            cs.append(
                (
                    "max_items",
                    lambda v, _, n=n: True
                    if len(v) <= n
                    else _fail(f"{path}.max_items", M.max_items_msg(n)),
                )
            )
        if schema.get("unique_items") is True:
            cs.append(
                (
                    "unique_items",
                    lambda v, _: True
                    if len({_hashable(x) for x in v}) == len(v)
                    else _fail(f"{path}.unique_items", M.UNIQUE_ITEMS_MSG),
                )
            )
    elif t == "object":
        cs.extend(_object_checks(schema, path))
    return cs


def _trunc_rem(a: int, b: int) -> int:
    """Erlang rem: truncating remainder (sign of dividend)."""
    return a - b * int(a / b)


def _check_iso8601(v: str, path: str) -> Result:
    m = re.match(
        r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:?\d{2})?$",
        v,
    )
    ok = False
    if m:
        try:
            datetime.fromisoformat(v.replace("Z", "+00:00").replace("z", "+00:00"))
            ok = True
        except ValueError:
            ok = False
    return True if ok else _fail(f"{path}.format", M.ISO8601_MSG)


def _check_base64(v: str, path: str) -> Result:
    if len(v) % 4 != 0:
        return _fail(f"{path}.format", M.BASE64_LENGTH_MSG)
    if not re.match(r"^[A-Za-z0-9+/]*$", v.rstrip("=")):
        return False  # bare false, mirroring the generated lists:all
    return True


def _single_items_check(items: Schema, path: str):
    def check(v: list, reg: dict) -> Result:
        for i, item in enumerate(v):
            r = _eval(items, item, f"{path}.items[*]", reg)
            if r is not True:
                p, d = r if isinstance(r, tuple) else (f"{path}.items[*]", "")
                return (p, "Item %s in %s is invalid. %s" % (i, path, d))
        return True

    return check


def _tuple_items_check(schema: dict, path: str):
    items = schema["items"]
    add = schema.get("additional_items", True)

    def check(v: list, reg: dict) -> Result:
        for i, item in enumerate(v):
            if i < len(items):
                r = _eval(items[i], item, f"{path}.items[{i}]", reg)
                if r is not True:
                    _, d = r if isinstance(r, tuple) else ("", "")
                    return (
                        f"{path}.items[{i}]",
                        "Item %s in %s is invalid. %s" % (i, path, d),
                    )
            else:
                r = _eval(add, item, f"{path}.items", reg)
                if r is not True:
                    _, d = r if isinstance(r, tuple) else ("", "")
                    return (
                        f"{path}.items",
                        "Item %s in %s is invalid. %s" % (i, path, d),
                    )
        return True

    return check


def _hashable(x: Any):
    if isinstance(x, list):
        return ("__list__", tuple(_hashable(i) for i in x))
    if isinstance(x, dict):
        return ("__map__", frozenset((k, _hashable(v)) for k, v in x.items()))
    return (type(x).__name__, x)


def _object_checks(schema: dict, path: str):
    cs = []
    properties = schema.get("properties", {})
    if properties:

        def check_props(v: dict, reg: dict) -> Result:
            for name, sub in properties.items():
                r = _eval(
                    {**(sub if isinstance(sub, dict) else {}), "optional": True}
                    if isinstance(sub, dict)
                    else sub,
                    v.get(name, _MISSING),
                    f"{path}.properties.{name}",
                    reg,
                )
                if isinstance(sub, (bool,)) and v.get(name, _MISSING) is _MISSING:
                    continue
                if r is not True:
                    return r
            return True

        cs.append(("properties", check_props))
    required = schema.get("required", [])
    if required:

        def check_req(v: dict, reg: dict) -> Result:
            for name in required:
                if name not in v:
                    return _fail(
                        f"{path}.required", M.required_template(path) % name
                    )
            return True

        cs.append(("required", check_req))
    if "min_properties" in schema:
        n = schema["min_properties"]
        cs.append(
            (
                "min_properties",
                lambda v, _, n=n: True
                if len(v) >= n
                else _fail(f"{path}.min_properties", M.min_properties_msg(n)),
            )
        )
    if "max_properties" in schema:
        n = schema["max_properties"]
        cs.append(
            (
                "max_properties",
                lambda v, _, n=n: True
                if len(v) <= n
                else _fail(f"{path}.max_properties", M.max_properties_msg(n)),
            )
        )
    pattern_properties = schema.get("pattern_properties", {})
    if pattern_properties:

        def check_pp(v: dict, reg: dict) -> Result:
            for regex, sub in pattern_properties.items():
                for k, val in v.items():
                    if re.search(regex, k):
                        r = _eval(sub, val, f"{path}.pattern_properties.{regex}", reg)
                        if r is not True:
                            p, d = (
                                r
                                if isinstance(r, tuple)
                                else (f"{path}.pattern_properties.{regex}", "")
                            )
                            return (p, M.PROPERTY_FAILED_TEMPLATE % (k, d))
            return True

        cs.append(("pattern_properties", check_pp))
    if "additional_properties" in schema:
        add = schema["additional_properties"]
        declared = set(properties)
        regexes = list(pattern_properties)

        def extras(v: dict):
            return [
                k
                for k in v
                if k not in declared and not any(re.search(rx, k) for rx in regexes)
            ]

        if add is False:

            def check_ap_false(v: dict, reg: dict) -> Result:
                bad = extras(v)
                if bad:
                    keys = ", ".join(f'"{k}"' for k in bad)
                    return _fail(
                        f"{path}.additional_properties",
                        M.UNSUPPORTED_KEYS_TEMPLATE % keys,
                    )
                return True

            cs.append(("additional_properties", check_ap_false))
        elif add is not True:

            def check_ap_schema(v: dict, reg: dict) -> Result:
                for k in extras(v):
                    r = _eval(add, v[k], f"{path}.additional_properties", reg)
                    if r is not True:
                        p, d = (
                            r
                            if isinstance(r, tuple)
                            else (f"{path}.additional_properties", "")
                        )
                        return (p, M.PROPERTY_FAILED_TEMPLATE % (k, d))
                return True

            cs.append(("additional_properties", check_ap_schema))
    return cs
