"""DataFrame-level validation runner.

Binds compiled rules to a DataFrame and produces the engine's contract
outputs (SURVEY.md §2.3):

- ``violations``: one row per (input row, column rule) that failed —
  ``(row key, column, schema_path, keyword, description, partition_id)``,
  mirroring the reference's ``{false, {SchemaPath, Description}}`` tuples
  (/root/reference/src/ndto_generator.erl:216-227) with exactly ONE
  violation per (row, rule) chosen by the reference's priority.
- ``verdicts``: per-partition pass/fail + counters (the distributed
  extension the single-value reference does not have).

Everything is a single Catalyst expression per rule — validation adds zero
shuffles and zero Python; violations/verdicts are plain projections and one
partition-local aggregation over the annotated frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .compiler import Compiled, CompileOptions, Compiler, VIOLATION_TYPE
from .spec import Schema

VIOLATIONS_COL = "violations"
PARTITION_COL = "partition_id"


@dataclass
class ValidationResult:
    annotated: DataFrame  # input + violations array<struct> + partition_id
    violations: DataFrame  # key, column, schema_path, keyword, description, partition_id
    verdicts: DataFrame  # partition_id, pass, n_rows, n_violations


class RuleSet:
    """column name → schema spec, compiled against the DataFrame's types."""

    def __init__(
        self,
        rules: dict[str, Schema],
        registry: Optional[dict[str, Schema]] = None,
        options: Optional[CompileOptions] = None,
    ) -> None:
        self.rules = rules
        self.compiler = Compiler(registry=registry, options=options)

    def compile(self, df: DataFrame) -> dict[str, Compiled]:
        out = {}
        for col, schema in self.rules.items():
            dtype = df.schema[col].dataType
            out[col] = self.compiler.compile(schema, F.col(col), dtype, "$")
        return out

    def violations_array(self, df: DataFrame) -> Column:
        """array<struct<column,schema_path,keyword,description>> of failures."""
        compiled = self.compile(df)
        entries = [
            F.when(
                ~c.pred,
                F.struct(
                    F.lit(col).alias("column"),
                    # pred=False ⇒ viol non-null by construction; the coalesce
                    # is a safety net that keeps the row reportable regardless
                    F.coalesce(c.viol["schema_path"], F.lit("$")).alias("schema_path"),
                    F.coalesce(c.viol["keyword"], F.lit("unknown")).alias("keyword"),
                    c.viol["description"].alias("description"),
                ),
            )
            for col, c in compiled.items()
        ]
        return F.array_compact(F.array(*entries))


def validate_row_object(
    df: DataFrame,
    schema: Schema,
    key: str,
    registry: Optional[dict[str, Schema]] = None,
    options: Optional[CompileOptions] = None,
) -> ValidationResult:
    """Validate each ROW as one object value against an object schema.

    The row is packed into a struct (properties = columns), so the object
    keywords (properties / required / min_properties / pattern_properties /
    additional_properties) apply to the row exactly as the reference applies
    them to a map value; paths come out as '$.properties.<col>...'.
    """
    from .compiler import Compiler

    cols = [c for c in df.columns]
    row = F.struct(*[F.col(c).alias(c) for c in cols])
    dtype = df.select(row.alias("_row")).schema["_row"].dataType
    comp = Compiler(registry=registry, options=options)
    compiled = comp.compile(schema, row, dtype, "$")
    entry = F.when(
        ~compiled.pred,
        F.struct(
            F.lit("$row").alias("column"),
            F.coalesce(compiled.viol["schema_path"], F.lit("$")).alias("schema_path"),
            F.coalesce(compiled.viol["keyword"], F.lit("unknown")).alias("keyword"),
            compiled.viol["description"].alias("description"),
        ),
    )
    annotated = df.withColumn(VIOLATIONS_COL, F.array_compact(F.array(entry))).withColumn(
        PARTITION_COL, F.spark_partition_id()
    )
    return _result_from_annotated(annotated, key)


def validate(
    df: DataFrame,
    rules: dict[str, Schema] | RuleSet,
    key: str,
    registry: Optional[dict[str, Schema]] = None,
    options: Optional[CompileOptions] = None,
) -> ValidationResult:
    ruleset = rules if isinstance(rules, RuleSet) else RuleSet(rules, registry, options)
    annotated = df.withColumn(VIOLATIONS_COL, ruleset.violations_array(df)).withColumn(
        PARTITION_COL, F.spark_partition_id()
    )
    return _result_from_annotated(annotated, key)


def _result_from_annotated(annotated: DataFrame, key: str) -> ValidationResult:
    # PLAN NOTE: explode_outer + post-filter, NOT a plain explode. For
    # explode(arr) the optimizer infers Filter(size(arr) > 0) below the
    # Generate (InferFiltersFromGenerate) and then pushes it through the
    # producing projections, EXPANDING the violations alias into the filter
    # predicate — the whole compiled rule tree gets re-evaluated per row a
    # second time, and any parse-once barrier upstream is defeated (measured:
    # from_json ×48 in the filter for a 1-property JSON rule, ~30x slowdown).
    # explode_outer emits one NULL row for empty arrays instead (same row
    # count as the input — a streamed narrow op), the inferred filter never
    # materializes, and the cheap v IS NOT NULL filter cannot cross the
    # Generate, so every rule expression is evaluated exactly once per row.
    violations = (
        annotated.select(
            F.col(key),
            F.explode_outer(VIOLATIONS_COL).alias("v"),
            F.col(PARTITION_COL),
        )
        .filter(F.col("v").isNotNull())
        .select(
            key,
            F.col("v.column").alias("column"),
            F.col("v.schema_path").alias("schema_path"),
            F.col("v.keyword").alias("keyword"),
            F.col("v.description").alias("description"),
            PARTITION_COL,
        )
    )
    verdicts = annotated.groupBy(PARTITION_COL).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.size(VIOLATIONS_COL)).alias("n_violations"),
    ).withColumn("pass", F.col("n_violations") == 0)
    return ValidationResult(annotated=annotated, violations=violations, verdicts=verdicts)


def violation_summary(
    violations: DataFrame, key: str, max_examples: int = 3
) -> DataFrame:
    """Per-rule rollup of a violations frame: counts + example offenders.

    The reporting surface of the engine: one row per (column, schema_path,
    keyword) with the violation count, the (constant-per-rule) message,
    and up to ``max_examples`` example keys — the smallest keys, so the
    sample is deterministic across runs/engines.

    Scale shape: two partial-aggregated groupBys. Phase 1 takes the
    ``max_examples`` smallest keys per (rule, input partition) — each
    group's list is bounded by partition size and sliced BEFORE the
    shuffle; phase 2 merges the ≤k-item survivors. A single
    groupBy(rule).collect_list(key) would hold every offender of a hot
    rule in one reducer (same reasoning as ann.two_phase_topk).
    """
    g = ["column", "schema_path", "keyword"]
    loc = (
        violations.withColumn("_p", F.spark_partition_id())
        .groupBy(*g, "_p")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.slice(
                F.array_sort(F.collect_list(F.col(key))), 1, max_examples
            ).alias("_ex"),
            F.min("description").alias("_d"),
        )
    )
    return (
        loc.groupBy(*g)
        .agg(
            F.sum("_n").cast("bigint").alias("n_violations"),
            F.min("_d").alias("description"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(
                        F.array_sort(F.flatten(F.collect_list("_ex"))),
                        1,
                        max_examples,
                    ),
                    lambda x: x.cast("string"),
                ),
            ).alias("example_keys"),
        )
        .select(
            F.col("column").alias("column_name"),
            "schema_path",
            "keyword",
            "n_violations",
            "description",
            "example_keys",
        )
    )
