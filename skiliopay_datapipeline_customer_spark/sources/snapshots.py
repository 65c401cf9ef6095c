"""Date-stamped snapshot discovery (S15).

Reference parity: glob `churn_data_*.parquet` + max() latest-wins
(scripts/run_processing.py:19-22, src/dashboard/data_loader.py:30-35).
The engine keeps the same contract for file interop but the preferred scale
form is a date-PARTITIONED table (ingest_date=YYYYMMDD directories): then
"latest" is a partition-pruned filter, not a listing of every file.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dated_snapshot_path(base_dir: str, prefix: str, date_stamp: str) -> str:
    return os.path.join(base_dir, f"{prefix}_{date_stamp}.parquet")


def latest_snapshot_path(base_dir: str, prefix: str) -> str | None:
    """max() over date-stamped names — lexicographic == chronological for
    YYYYMMDD stamps, exactly the reference's rule."""
    hits = glob.glob(os.path.join(base_dir, f"{prefix}_*.parquet"))
    return max(hits) if hits else None


def write_dated_snapshot(
    df: DataFrame, base_dir: str, prefix: str, date_stamp: str
) -> str:
    path = dated_snapshot_path(base_dir, prefix, date_stamp)
    df.write.mode("overwrite").option("compression", "snappy").parquet(path)
    return path


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of the same keyed table:
    'added' (key only in new), 'removed' (key only in old), 'changed'
    (key in both, any compare column differs null-safely). Unchanged rows
    are dropped — the output is change-capture-sized, not snapshot-sized.

    The daily reconciliation the reference does by COUNTING
    (scripts/check_daily_data.py:12-65) lifted to row granularity. Scale
    posture: one full-outer shuffle join on the key; comparisons are
    null-safe column predicates (`eqNullSafe`), never row-serialized
    hashes, so the filter stays in whole-stage codegen and short-circuits
    on the first differing column.
    """
    # presence LITERALS, not key nullness: a NULL-keyed row is still a row,
    # and using key IS NOT NULL as the row-presence flag would misclassify
    # it (an old-only NULL-keyed row would read as 'added')
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_n_present"),
    )
    cond = None
    for k in key_cols:
        c = o[f"_ok_{k}"] == n[f"_nk_{k}"]
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")

    in_old = F.coalesce(F.col("_o_present"), F.lit(False))
    in_new = F.coalesce(F.col("_n_present"), F.lit(False))
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    keys = [
        F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k)
        for k in key_cols
    ]
    return (
        joined.select(*keys, status.alias("status"))
        .filter(F.col("status") != "same")
    )


def freshness_report(
    spark,
    layers: dict[str, tuple[str, str]],
    expected_stamp: str | None = None,
) -> list[dict]:
    """Layer-freshness check — the engine twin of the reference's daily
    data audit (scripts/check_daily_data.py: does TODAY's file exist in
    raw / processed / warehouse, and how many rows). ``layers`` maps layer
    name -> (base_dir, prefix) of dated snapshots
    (:func:`write_dated_snapshot` layout); each layer reports its newest
    stamp, row count, and — when ``expected_stamp`` is given — whether it
    is fresh (newest stamp >= expected). Driver-side directory listing plus
    one count per layer."""
    import glob as _glob
    import os
    import re

    out = []
    for layer, (base_dir, prefix) in sorted(layers.items()):
        stamps = sorted(
            m.group(1)
            for p in _glob.glob(os.path.join(base_dir, f"{prefix}_*.parquet"))
            if (m := re.search(rf"{re.escape(prefix)}_(\d{{8}})\.parquet$", p))
        )
        if not stamps:
            out.append(
                {"layer": layer, "latest_stamp": None, "rows": 0, "fresh": False}
            )
            continue
        latest = stamps[-1]
        rows = spark.read.parquet(
            dated_snapshot_path(base_dir, prefix, latest)
        ).count()
        out.append(
            {
                "layer": layer,
                "latest_stamp": latest,
                "rows": rows,
                "fresh": expected_stamp is None or latest >= expected_stamp,
            }
        )
    return out
