"""Categorical encoders with stable, reference-compatible naming.

Reference parity: F15 one-hot (`pd.get_dummies`,
src/processing/feature_engineering.py:257-260 — named dummy columns like
``country_VN``), F16 ordinal label encoding (sklearn LabelEncoder's
sorted-classes order, src/processing/feature_engineering.py:246-256).

Scale notes: the category list is either declared (best: no extra scan) or
discovered with ONE distinct aggregation (a tiny shuffle on a low-cardinality
column). The expansion itself is pure Column expressions — no UDF, no pivot
shuffle, stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def one_hot_columns(col: str, categories: list[str], prefix: str | None = None) -> list[Column]:
    """0/1 indicator Column per category, named ``<prefix>_<value>``."""
    prefix = prefix if prefix is not None else col
    return [
        F.when(F.col(col) == cat, 1).otherwise(0).alias(f"{prefix}_{cat}")
        for cat in categories
    ]


def discover_categories(df: DataFrame, col: str) -> list[str]:
    """Distinct values, sorted — LabelEncoder's class order. One small agg."""
    rows = df.select(col).distinct().collect()
    return sorted(r[0] for r in rows if r[0] is not None)


def one_hot_encode(
    df: DataFrame,
    col: str,
    categories: list[str] | None = None,
    prefix: str | None = None,
    drop_input: bool = True,
) -> DataFrame:
    """get_dummies-equivalent: append one 0/1 column per category."""
    cats = categories if categories is not None else discover_categories(df, col)
    keep = [c for c in df.columns if not (drop_input and c == col)]
    return df.select(*keep, *one_hot_columns(col, cats, prefix))


def label_encode(
    df: DataFrame, col: str, categories: list[str] | None = None, out: str | None = None
) -> DataFrame:
    """Ordinal encode by sorted class order (LabelEncoder semantics).

    Implemented as a when-chain over the (small) sorted category list —
    no StringIndexer model fit, no extra job beyond optional discovery.
    """
    cats = categories if categories is not None else discover_categories(df, col)
    out = out or f"{col}_encoded"
    expr = F.lit(None).cast("int")
    chain = F.when(F.col(col) == cats[0], 0) if cats else expr
    for i, cat in enumerate(cats[1:], start=1):
        chain = chain.when(F.col(col) == cat, i)
    return df.withColumn(out, chain.otherwise(F.lit(None).cast("int")))
