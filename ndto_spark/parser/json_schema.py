"""JSON Schema draft-04 → engine spec parser.

Re-implements the reference's parser layer semantics
(/root/reference/src/ndto_parser/ndto_parser_json_schema.erl:73-200 and
ndto_parser_json_schema/ndto_parser_json_schema_draft_04.erl:29-398):

- ``parse(path)`` reads a .json spec and returns ``[(name, schema), ...]``
  where the FIRST entry is the requested root and the rest are schemas
  extracted for every ``$ref`` target (each ref becomes a named schema in
  the registry, exactly like the reference generates one module per ref).
- ref naming: ``<base>_<last-path-segment>`` for local refs, external file
  refs load the other file with its own base name.
- cycle safety: refs already being resolved are emitted as ``{"ref": name}``
  without re-descending (the ``resolved`` list threading of the reference).
- keyword translation table (draft_04.erl):
  ``type: null`` → ``enum [null]``; ``number`` → ``any_of[integer, float]``;
  ``format: byte`` → ``base64``; ``date-time`` → ``iso8601``;
  schemas with keywords but NO type → ``attempt_type``: distribute keywords
  to their plausible types and wrap in any_of.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

from ..spec import normalize

_STRING_KEYS = {"minLength", "maxLength", "pattern", "format"}
_NUMBER_KEYS = {"minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf"}
_ARRAY_KEYS = {"items", "additionalItems", "minItems", "maxItems", "uniqueItems"}
_OBJECT_KEYS = {
    "properties",
    "required",
    "minProperties",
    "maxProperties",
    "patternProperties",
    "additionalProperties",
}


class ParseError(ValueError):
    pass


class _Ctx:
    def __init__(self, base_path: str, base_name: str, spec: dict) -> None:
        self.base_path = base_path
        self.base_name = base_name
        self.spec = spec
        self.resolved: list[str] = []
        self.extracted: list[tuple[str, Any]] = []


def parse(path: str, name: Optional[str] = None) -> list[tuple[str, Any]]:
    """Parse a draft-04 .json file → [(name, normalized schema), ...]."""
    if not path.endswith(".json"):
        raise ParseError("only .json specs are supported")
    with open(path) as f:
        spec = json.load(f)
    declared = spec.get("$schema", "")
    if declared and "draft-04" not in declared:
        raise ParseError(f"unsupported $schema {declared!r} (draft-04 only)")
    base_name = name or os.path.splitext(os.path.basename(path))[0]
    ctx = _Ctx(os.path.dirname(os.path.abspath(path)), base_name, spec)
    root = _parse(spec, ctx)
    return [(base_name, normalize(root))] + [
        (n, normalize(s)) for n, s in ctx.extracted
    ]


def parse_schema(spec: Any) -> Any:
    """Parse an inline draft-04 schema dict (no refs) → normalized spec."""
    ctx = _Ctx(".", "inline", spec if isinstance(spec, dict) else {})
    return normalize(_parse(spec, ctx))


def _json_pointer(doc: Any, pointer: str) -> Any:
    cur = doc
    for seg in pointer.strip("/").split("/"):
        if not seg:
            continue
        seg = seg.replace("~1", "/").replace("~0", "~")
        cur = cur[seg]
    return cur


def _resolve_ref(ref: str, ctx: _Ctx) -> str:
    """Resolve a $ref → registered schema name; extracts the target once."""
    if "#" in ref:
        file_part, pointer = ref.split("#", 1)
    else:
        file_part, pointer = ref, ""
    if file_part:
        ext_path = os.path.join(ctx.base_path, file_part)
        with open(ext_path) as f:
            doc = json.load(f)
        base = os.path.splitext(os.path.basename(file_part))[0]
    else:
        doc = ctx.spec
        base = ctx.base_name
    last = pointer.strip("/").split("/")[-1] if pointer.strip("/") else base
    name = f"{base}_{last}" if pointer.strip("/") else base
    if name in ctx.resolved:
        return name  # cycle: reference the name, do not re-descend
    ctx.resolved.append(name)
    target = _json_pointer(doc, pointer) if pointer else doc
    parsed = _parse(target, ctx)
    ctx.extracted.append((name, parsed))
    return name


def _parse(s: Any, ctx: _Ctx) -> Any:
    if s is True or s is False:
        return s
    if not isinstance(s, dict):
        raise ParseError(f"schema must be dict/bool, got {type(s).__name__}")
    if "$ref" in s:
        return {"ref": _resolve_ref(s["$ref"], ctx)}
    if "enum" in s:
        return {"enum": s["enum"]}
    out: dict[str, Any] = {}
    t = s.get("type")
    if isinstance(t, list):
        # draft-04 type union → any_of of single-typed schemas
        subs = [_parse({**s, "type": tt}, ctx) for tt in t]
        return {"any_of": subs}
    if t == "null":
        return {"enum": [None]}
    if t == "number":
        bounds = {k: s[k] for k in _NUMBER_KEYS & set(s)}
        return {
            "any_of": [
                _parse({"type": "integer", **bounds}, ctx),
                _parse(
                    {"type": "number_float_internal", **{k: v for k, v in bounds.items() if k != "multipleOf"}},
                    ctx,
                ),
            ]
        }
    if t == "number_float_internal":
        out["type"] = "float"
        t = "float"
    elif t is not None:
        out["type"] = t

    for key in ("minimum", "maximum", "multipleOf", "minLength", "maxLength",
                "pattern", "minItems", "maxItems", "uniqueItems",
                "minProperties", "maxProperties", "required"):
        if key in s:
            out[key] = s[key]
    if "exclusiveMinimum" in s:
        out["exclusiveMinimum"] = bool(s["exclusiveMinimum"])
    if "exclusiveMaximum" in s:
        out["exclusiveMaximum"] = bool(s["exclusiveMaximum"])
    if "format" in s:
        fmt = {"byte": "base64", "date-time": "iso8601", "iso8601": "iso8601", "base64": "base64"}.get(s["format"])
        if fmt:
            out["format"] = fmt
    if "items" in s:
        items = s["items"]
        out["items"] = (
            [_parse(i, ctx) for i in items]
            if isinstance(items, list)
            else _parse(items, ctx)
        )
    if "additionalItems" in s and not isinstance(s["additionalItems"], bool):
        out["additionalItems"] = _parse(s["additionalItems"], ctx)
    elif "additionalItems" in s:
        out["additionalItems"] = s["additionalItems"]
    if "properties" in s:
        out["properties"] = {k: _parse(v, ctx) for k, v in s["properties"].items()}
    if "patternProperties" in s:
        out["patternProperties"] = {
            k: _parse(v, ctx) for k, v in s["patternProperties"].items()
        }
    if "additionalProperties" in s:
        ap = s["additionalProperties"]
        out["additionalProperties"] = ap if isinstance(ap, bool) else _parse(ap, ctx)
    for comb, target in (("anyOf", "any_of"), ("allOf", "all_of"), ("oneOf", "one_of")):
        if comb in s:
            out[target] = [_parse(v, ctx) for v in s[comb]]
    if "not" in s:
        out["not"] = _parse(s["not"], ctx)
    if "nullable" in s:
        out["nullable"] = bool(s["nullable"])

    if "type" not in out:
        return _attempt_type(out)
    return out


def _attempt_type(out: dict) -> dict:
    """No explicit type: distribute keywords to plausible typed schemas and
    wrap in any_of (draft_04.erl:287-398)."""
    combinators = {k: v for k, v in out.items() if k in ("any_of", "all_of", "one_of", "not", "nullable")}
    keyword_src = {k: v for k, v in out.items() if k not in combinators}
    typed: list[dict] = []
    groups = [
        ("string", {"minLength", "maxLength", "pattern", "format"}),
        ("integer", {"minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf"}),
        ("float", {"minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum"}),
        ("array", {"items", "additionalItems", "minItems", "maxItems", "uniqueItems"}),
        ("object", {"properties", "required", "minProperties", "maxProperties", "patternProperties", "additionalProperties"}),
    ]
    for tname, keys in groups:
        picked = {k: v for k, v in keyword_src.items() if k in keys}
        if picked:
            typed.append({"type": tname, **picked})
    if typed:
        combinators["any_of"] = combinators.get("any_of", []) + typed
        return combinators
    return out
