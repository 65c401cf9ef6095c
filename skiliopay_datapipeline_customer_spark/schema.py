"""JSON-schema → StructType + constraint-expression compiler.

Reference parity: S14 schema load (src/ingestion/csv_ingestion.py:102-105),
V1 row-wise Cerberus validation (src/utils/data_validation.py:24-78), V2
dtype conformance (:80-111). The reference validates row by row in Python —
the one genuinely row-oriented operator in the codebase. Here every rule
compiles to a native boolean Column, so validation is a single scan inside
whole-stage codegen: per-row error arrays and global counts come from the
same pass, no Python in the loop. That is the 100 TB shape: validation cost
is one full-table map + one tiny aggregate.

Schema dialect (the subset the reference's churn_schema.json uses):
  {"type": "object",
   "properties": {col: {"type": "string|integer|number|boolean",
                         "minimum": x, "maximum": y,
                         "enum": [...], "pattern": "regex"}},
   "required": [col, ...]}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_MAP = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def to_struct_type(schema: dict) -> T.StructType:
    """Declared StructType for spark.read (no inference in the engine)."""
    required = set(schema.get("required", []))
    fields = []
    for name, spec in schema.get("properties", {}).items():
        t = spec.get("type", "string")
        if t not in _TYPE_MAP:
            # a clear contract error, not a KeyError inside a comprehension
            raise ValueError(
                f"to_struct_type: unsupported JSON-schema type {t!r} for "
                f"column {name!r} (supported: {sorted(_TYPE_MAP)})"
            )
        fields.append(T.StructField(name, _TYPE_MAP[t], name not in required))
    return T.StructType(fields)


def compile_constraints(schema: dict) -> dict[str, list[tuple[str, Column]]]:
    """Per column: list of (rule_name, violation_condition Column).

    The condition is True when the rule is VIOLATED (null-safe: a null value
    only violates `required`).
    """
    out: dict[str, list[tuple[str, Column]]] = {}
    required = set(schema.get("required", []))
    for name, spec in schema.get("properties", {}).items():
        col = F.col(name)
        rules: list[tuple[str, Column]] = []
        if name in required:
            rules.append((f"{name}_required", col.isNull()))
        if "minimum" in spec:
            rules.append((f"{name}_min", col.isNotNull() & (col < F.lit(spec["minimum"]))))
        if "maximum" in spec:
            rules.append((f"{name}_max", col.isNotNull() & (col > F.lit(spec["maximum"]))))
        if "enum" in spec:
            rules.append((f"{name}_enum", col.isNotNull() & ~col.isin(*spec["enum"])))
        if "pattern" in spec:
            rules.append(
                (f"{name}_pattern", col.isNotNull() & ~col.cast("string").rlike(spec["pattern"]))
            )
        if rules:
            out[name] = rules
    return out


def validate(df: DataFrame, schema: dict) -> DataFrame:
    """Append `_errors` (array of violated rule names) and `_valid` flag.

    One map-side pass; the caller aggregates or filters as needed.
    """
    all_rules = [r for rules in compile_constraints(schema).values() for r in rules]
    errors = F.array_compact(
        F.array(*[F.when(cond, F.lit(rule)).otherwise(F.lit(None)) for rule, cond in all_rules])
    )
    return df.withColumn("_errors", errors).withColumn(
        "_valid", F.size("_errors") == 0
    )


def validation_counts(df: DataFrame, schema: dict) -> DataFrame:
    """One-row frame: total rows, valid rows, and one violation count per
    rule — the V1 report in a single aggregate pass."""
    all_rules = [r for rules in compile_constraints(schema).values() for r in rules]
    valid = F.lit(True)
    for _, cond in all_rules:
        valid = valid & ~cond
    # coalesce: sum over an EMPTY frame is NULL — the report must say 0
    # valid / 0 violations, not None (the SQL oracle transcription assumes
    # a non-empty table, which every fixture guarantees)
    aggs = [
        F.count("*").alias("n_rows"),
        F.coalesce(F.sum(valid.cast("int")), F.lit(0)).alias("n_valid"),
    ]
    aggs += [
        F.coalesce(F.sum(cond.cast("int")), F.lit(0)).alias(rule)
        for rule, cond in all_rules
    ]
    return df.agg(*aggs)


def conformance_report(df: DataFrame, schema: dict) -> list[dict]:
    """V2 dtype conformance: declared vs actual schema (driver-side, no scan)."""
    declared = {f.name: f.dataType for f in to_struct_type(schema).fields}
    actual = {f.name: f.dataType for f in df.schema.fields}
    report = []
    for name, dtype in declared.items():
        if name not in actual:
            report.append({"column": name, "status": "missing"})
        elif actual[name] != dtype:
            report.append(
                {
                    "column": name,
                    "status": "type_mismatch",
                    "expected": dtype.simpleString(),
                    "actual": actual[name].simpleString(),
                }
            )
    extras = set(actual) - set(declared)
    report += [{"column": c, "status": "unexpected"} for c in sorted(extras)]
    return report
