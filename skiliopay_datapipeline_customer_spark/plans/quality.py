"""Data-quality report operator family (SURVEY §2.9 V4-V10).

Reference parity: src/processing/data_quality.py runs six per-column loops;
this engine fuses each report into ONE multi-aggregate pass and the composite
gate into driver-side scalar math over the collected report (A14 weights
.25/.20/.25/.20/.10, PASS ≥ 0.8 — data_quality.py:51-52,360-374).

Scale: each report = one scan with map-side partial aggregation; the only
collected data is a single metrics row per report. Percentile fences use
exact `percentile` here (oracle parity ≤ sf0.1) with `approx_quantile_rel`
documented as the 100 TB profiler fallback.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEIGHTS = {
    "completeness": 0.25,
    "uniqueness": 0.20,
    "validity": 0.25,
    "consistency": 0.20,
    "outliers": 0.10,
}
PASS_THRESHOLD = 0.8


@dataclass
class QualityReport:
    scores: dict[str, float] = field(default_factory=dict)
    details: dict[str, dict] = field(default_factory=dict)

    @property
    def overall(self) -> float:
        return sum(WEIGHTS[k] * self.scores.get(k, 1.0) for k in WEIGHTS)

    @property
    def passed(self) -> bool:
        return self.overall >= PASS_THRESHOLD


def completeness(df: DataFrame, columns: list[str] | None = None) -> dict:
    cols = columns or df.columns
    row = df.agg(
        F.count("*").alias("n"),
        *[F.sum(F.col(c).isNull().cast("int")).alias(c) for c in cols],
    ).first()
    n = row["n"] or 1
    rates = {c: row[c] / n for c in cols}
    missing_total = sum(row[c] for c in cols)
    return {
        "null_rates": rates,
        "flagged": [c for c, r in rates.items() if r > 0.10],
        "score": 1.0 - missing_total / (n * len(cols)),
        "n_rows": row["n"],
    }


def uniqueness(df: DataFrame, key_columns: list[str]) -> dict:
    row = df.agg(
        F.count("*").alias("n"),
        *[F.countDistinct(c).alias(c) for c in key_columns],
    ).first()
    n = row["n"] or 1
    # dup-row rate over all columns (U1 semantics)
    n_distinct_rows = df.dropDuplicates().count()
    dup_rate = 1.0 - n_distinct_rows / n
    key_uniq = {c: row[c] / n for c in key_columns}
    avg_uniq = sum(key_uniq.values()) / max(len(key_uniq), 1)
    return {
        "key_uniqueness": key_uniq,
        "dup_row_rate": dup_rate,
        "score": avg_uniq * (1.0 - dup_rate),
        "n_rows": row["n"],
    }


def validity(df: DataFrame, rules: dict[str, object]) -> dict:
    """rules: {rule_name: violation Column}. One conditional-sum pass."""
    if not rules:
        return {"violations": {}, "score": 1.0}
    row = df.agg(
        F.count("*").alias("n"),
        *[F.sum(F.when(cond, 1).otherwise(0)).alias(name) for name, cond in rules.items()],
    ).first()
    violations = {name: row[name] for name in rules}
    issues = sum(1 for v in violations.values() if v > 0)
    return {
        "violations": violations,
        "score": 1.0 - issues / len(rules),
        "n_rows": row["n"],
    }


def consistency(df: DataFrame, invariants: dict[str, object]) -> dict:
    """invariants: {name: violated Column} (e.g. 30d > 90d)."""
    return validity(df, invariants)


def outliers(
    df: DataFrame, columns: list[str], k: float = 1.5, approx: bool = False
) -> dict:
    """IQR-fence outlier rate per column — two passes total (fences + rate),
    regardless of column count. approx=True swaps exact percentile for
    approx_percentile (t-digest, fixed memory) — the 100 TB profiler path
    where a fence a few ulps off changes nothing."""
    if not columns:
        return {"outlier_rates": {}, "flagged": [], "score": 1.0}
    pct = (
        (lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(10_000)))
        if approx
        else (lambda c, p: F.percentile(c, F.lit(p)))
    )
    fences_row = df.agg(
        *[pct(c, 0.25).alias(f"{c}_q1") for c in columns],
        *[pct(c, 0.75).alias(f"{c}_q3") for c in columns],
    ).first()
    conds = {}
    for c in columns:
        q1, q3 = fences_row[f"{c}_q1"], fences_row[f"{c}_q3"]
        if q1 is None or q3 is None:
            # all-NULL column / empty frame: no fences, nothing is an
            # outlier — report 0.0 instead of crashing the composite gate
            conds[c] = F.lit(False)
            continue
        iqr = q3 - q1
        conds[c] = (F.col(c) < q1 - k * iqr) | (F.col(c) > q3 + k * iqr)
    row = df.agg(
        F.count("*").alias("n"),
        *[F.sum(F.when(cond, 1).otherwise(0)).alias(c) for c, cond in conds.items()],
    ).first()
    n = row["n"] or 1
    # sum over an EMPTY frame is NULL, not 0 — same degenerate case
    rates = {c: (row[c] or 0) / n for c in columns}
    avg_rate = sum(rates.values()) / max(len(rates), 1)
    return {
        "outlier_rates": rates,
        "flagged": [c for c, r in rates.items() if r > 0.05],
        "score": 1.0 - avg_rate,
        "n_rows": row["n"],
    }


def distribution(df: DataFrame, label_col: str, category_col: str) -> dict:
    """V9: label balance (flag <5% / >50%) + category dominance (>80%)."""
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.col(label_col).cast("int")).alias("pos"),
    ).first()
    n = row["n"] or 1
    label_rate = (row["pos"] or 0) / n
    top = (
        df.groupBy(category_col)
        .count()
        .orderBy(F.desc("count"), category_col)
        .first()
    )
    top_share = (top["count"] / n) if top else 0.0
    return {
        "label_rate": label_rate,
        "label_balanced": 0.05 <= label_rate <= 0.50,
        "top_category": top[category_col] if top else None,
        "top_category_share": top_share,
        "dominated": top_share > 0.80,
    }


def run_quality_checks(
    df: DataFrame,
    key_columns: list[str],
    completeness_columns: list[str] | None = None,
    validity_rules: dict | None = None,
    consistency_invariants: dict | None = None,
    outlier_columns: list[str] | None = None,
    approx: bool = False,
) -> QualityReport:
    """The composite V10 gate: weighted score over the five reports.
    approx=True selects the fixed-memory sketch statistics for profiling
    at scales where exact percentiles would shuffle the column."""
    report = QualityReport()
    report.details["completeness"] = completeness(df, completeness_columns)
    report.details["uniqueness"] = uniqueness(df, key_columns)
    report.details["validity"] = validity(df, validity_rules or {})
    report.details["consistency"] = consistency(df, consistency_invariants or {})
    report.details["outliers"] = outliers(df, outlier_columns or [], approx=approx)
    for k in WEIGHTS:
        report.scores[k] = report.details[k].get("score", 1.0)
    return report
