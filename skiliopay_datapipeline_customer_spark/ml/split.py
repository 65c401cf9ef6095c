"""Deterministic stratified split / fold assignment (M2, M8).

The reference uses sklearn train_test_split(stratify=y, seed 42) and
StratifiedKFold(5) (src/ml/model_trainer.py:171-191,376-392). ``randomSplit``
is partition-order-dependent and ``sampleBy`` is probabilistic (SURVEY §7.4),
so splits here are exact and reproducible: within each label stratum, rows
are ordered by a seeded hash of the key and assigned by rank thresholds.

Scale notes: one window shuffle partitioned BY LABEL — with few strata this
would bottleneck at 100 TB, so the rank is computed per (label, salt) slice:
the hash order itself is the salt, and we use ntile-free modulo assignment on
the hash for the cluster path (``assign_by_hash``), keeping the exact-rank
variant for reproducibility at test SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_split(
    df: DataFrame,
    label_col: str,
    key_col: str,
    fractions: tuple[float, ...] = (0.6, 0.2, 0.2),
    seed: int = 42,
    out_col: str = "_split",
) -> DataFrame:
    """Exact per-stratum split: split i gets round(fraction_i * n_stratum)
    rows, assigned in seeded-hash order (deterministic for a fixed key set)."""
    w = Window.partitionBy(label_col).orderBy(
        F.xxhash64(F.col(key_col), F.lit(seed)), F.col(key_col)
    )
    ranked = df.withColumn("_r", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy(label_col))
    )
    # cumulative fraction thresholds: rank <= cum_frac * n → split i
    cum = 0.0
    expr = None
    for i, frac in enumerate(fractions[:-1]):
        cum += frac
        cond = F.col("_r") <= F.round(F.lit(cum) * F.col("_n"))
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    expr = (
        expr.otherwise(len(fractions) - 1)
        if expr is not None
        else F.lit(len(fractions) - 1)
    )
    return ranked.withColumn(out_col, expr).drop("_r", "_n")


def stratified_folds(
    df: DataFrame,
    label_col: str,
    key_col: str,
    n_folds: int = 5,
    seed: int = 42,
    out_col: str = "fold",
) -> DataFrame:
    """Stratified k-fold assignment via seeded-hash modulo — shuffle-free
    (no window): fold sizes are near-equal in expectation per stratum and
    the assignment is stable under repartitioning. This is the 100 TB path
    (``pmod(hash, k)`` never materializes a global order)."""
    h = F.xxhash64(F.col(key_col), F.col(label_col).cast("string"), F.lit(seed))
    return df.withColumn(out_col, F.pmod(h, F.lit(n_folds)).cast("int"))
