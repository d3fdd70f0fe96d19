from .json_schema import parse, parse_schema

__all__ = ["parse", "parse_schema"]
