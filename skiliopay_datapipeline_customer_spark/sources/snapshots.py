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
