"""Spec-parser registry — the ``ndto_parser:parse/2,3`` analog.

The reference dispatches on a parser BEHAVIOUR module
(/root/reference/src/ndto_parser.erl:51-70): ``parse(SpecPath, Name)``
uses the default parser, ``parse(Parser, SpecPath, Name)`` any module
implementing the behaviour. Here the behaviour is a callable
``(path, name) -> [(name, normalized_schema), ...]``; dialects register
under a string key, and ``parse(..., parser=...)`` dispatches. One dialect
ships (draft-04 JSON Schema — the reference also ships exactly one), but a
second spec dialect now needs only a ``register_parser`` call, not an
engine change.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from .json_schema import ParseError, parse_schema
from .json_schema import parse as _parse_json_schema_draft_04

SpecParser = Callable[[str, Optional[str]], list[tuple[str, Any]]]

DEFAULT_PARSER = "json_schema_draft_04"

_PARSERS: dict[str, SpecParser] = {
    DEFAULT_PARSER: _parse_json_schema_draft_04,
}


def register_parser(name: str, fn: SpecParser) -> None:
    """Register a spec dialect: fn(path, name) -> [(name, schema), ...]."""
    _PARSERS[name] = fn


def registered_parsers() -> list[str]:
    return sorted(_PARSERS)


def parse(
    path: str, name: Optional[str] = None, parser: str = DEFAULT_PARSER
) -> list[tuple[str, Any]]:
    """Parse a spec file with the named dialect (default: draft-04)."""
    try:
        fn = _PARSERS[parser]
    except KeyError:
        raise ParseError(
            f"unknown spec parser {parser!r}; registered: "
            f"{registered_parsers()}"
        ) from None
    return fn(path, name)


__all__ = [
    "DEFAULT_PARSER",
    "ParseError",
    "parse",
    "parse_schema",
    "register_parser",
    "registered_parsers",
]
