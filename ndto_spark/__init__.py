"""ndto_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of nomasystems/ndto's declarative validation
language as a compiler from schema specs into Spark SQL predicate
expressions and vectorized Arrow batch validators, plus the table-level
analytics the single-value reference lacks (stats, uniqueness, referential
integrity, distribution drift, checkpoint/resume).
"""

from .compiler import Compiled, CompileError, CompileOptions, Compiler
from .runner import RuleSet, ValidationResult, validate
from .spec import Schema, SpecError, normalize

__all__ = [
    "Compiled",
    "CompileError",
    "CompileOptions",
    "Compiler",
    "RuleSet",
    "ValidationResult",
    "validate",
    "Schema",
    "SpecError",
    "normalize",
]

__version__ = "0.1.0"
