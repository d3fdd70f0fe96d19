"""Export compiled validation plans to an inspectable, persistable artifact.

The reference's ``ndto:write/2`` (/root/reference/src/ndto.erl:221-236)
pretty-prints a generated validator module to a reusable source file. The
Spark engine compiles specs to in-memory Column trees each run, so its
exportable artifact is, per column rule: the spec, the bound Spark type,
the compiled predicate's Catalyst expression string, and the violation
struct's expression string — enough to inspect exactly what will run, diff
rule changes across deployments, and persist next to a checkpoint header,
all without a live Spark session at read time.

The artifact is deterministic for a given (rules, input schema, compiler
options): expressions are rendered from the UNRESOLVED Column tree (plain
column names and literals — no per-session expression ids), so two exports
of the same ruleset are byte-identical and ``plan_hash`` is a stable
fingerprint (the checkpoint lineage story: schema_hash pins inputs+rules,
plan_hash pins the compiled form).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

from pyspark.sql import Column, DataFrame

from .compiler import CompileOptions
from .runner import RuleSet
from .spec import Schema


def expr_string(col: Column) -> str:
    """Stable string form of an unresolved Column expression tree."""
    try:
        return col._jc.toString()  # classic (JVM) mode
    except AttributeError:
        return str(col)  # connect mode: proto-based repr


def export_ruleset(
    df: DataFrame,
    rules: dict[str, Schema] | RuleSet,
    registry: Optional[dict[str, Schema]] = None,
    options: Optional[CompileOptions] = None,
) -> dict:
    """Compile ``rules`` against ``df``'s schema and return the plan dict."""
    ruleset = (
        rules if isinstance(rules, RuleSet) else RuleSet(rules, registry, options)
    )
    compiled = ruleset.compile(df)
    cols = {}
    for col, c in compiled.items():
        cols[col] = {
            "spec": ruleset.rules[col],
            "spark_type": df.schema[col].dataType.simpleString(),
            "predicate": expr_string(c.pred),
            "violation": expr_string(c.viol),
        }
    blob = json.dumps(cols, sort_keys=True, default=str).encode()
    return {
        "format": "ndto_spark-plan/1",
        "plan_hash": hashlib.sha256(blob).hexdigest()[:16],
        "columns": cols,
    }


def write_plan(
    path: str,
    df: DataFrame,
    rules: dict[str, Schema] | RuleSet,
    registry: Optional[dict[str, Schema]] = None,
    options: Optional[CompileOptions] = None,
) -> dict:
    """Atomically write the exported plan JSON to ``path``; returns it."""
    plan = export_ruleset(df, rules, registry, options)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(plan, f, indent=1, sort_keys=True, default=str)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
    return plan
