"""Write-Audit-Publish: stage a table version, gate it on an audit, then
make it visible atomically — the lakehouse promotion pattern the
reference's DAG approximates with its pre-deploy quality task
(/root/reference/dags/churn_prediction_pipeline.py quality gate before
model deploy), here applied to TABLE publication.

Readers only ever see audited versions: discovery goes through the same
``_versions`` rule as the streaming snapshot sink (a ``v=N`` directory
counts once its ``_SUCCESS`` marker exists), and the publish step is one
same-filesystem ``os.rename`` of the staged directory — atomic, so there
is no window where a reader can list a half-promoted table. A failed
audit leaves the staged version under ``_staging/`` for inspection and
publishes nothing.

At cluster scale the same protocol is Iceberg/Delta's branch-commit (WAP
branch → audit → fast-forward); the directory form keeps the semantics
with no table-format dependency.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..streaming.sinks import _versions, latest_snapshot

STAGING = "_staging"


def _next_version(target_dir: str) -> int:
    """One past the highest version number seen anywhere — published OR
    staged (a staged failure must not be overwritten by the next attempt,
    and a published version must never be re-claimed)."""
    seen = set(_versions(target_dir))
    for base in (target_dir, os.path.join(target_dir, STAGING)):
        if not os.path.isdir(base):
            continue
        for d in os.listdir(base):
            if m := re.fullmatch(r"v=(\d+)", d):
                seen.add(int(m.group(1)))
    return max(seen, default=0) + 1


@dataclass
class WapResult:
    version: int
    published: bool
    path: str
    audit_detail: object | None


def write_audit_publish(
    spark: SparkSession,
    df: DataFrame,
    target_dir: str,
    audit: Callable[[DataFrame], tuple[bool, object]],
    partition_by: list[str] | None = None,
) -> WapResult:
    """Stage ``df`` as the next table version, run ``audit`` over the
    STAGED FILES (what readers would actually see — not the logical plan,
    so a lossy write cannot slip through), and atomically publish on pass.

    ``audit`` receives the staged DataFrame and returns
    ``(passed, detail)`` — compose it from ``plans.quality`` reports or
    any predicate. On failure the staged directory is retained under
    ``_staging/v=N`` and the function returns ``published=False``.
    """
    version = _next_version(target_dir)
    staged = os.path.join(target_dir, STAGING, f"v={version}")
    writer = df.write.mode("overwrite").option("compression", "snappy")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staged)

    staged_df = spark.read.parquet(staged)
    passed, detail = audit(staged_df)
    if not passed:
        return WapResult(version, False, staged, detail)

    final = os.path.join(target_dir, f"v={version}")
    os.rename(staged, final)  # same filesystem: atomic promotion
    return WapResult(version, True, final, detail)


def read_published(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """Latest audited version (None before the first publish) — the same
    committed-only discovery the streaming snapshot sink uses."""
    return latest_snapshot(spark, target_dir)


def vacuum_versions(
    target_dir: str,
    keep_last: int = 2,
    drop_staging: bool = True,
) -> dict:
    """The VACUUM half of table maintenance for the versioned snapshot
    layout (keep the last ``keep_last`` published versions, delete older
    ones and — optionally — failed/abandoned staged writes). Completes the
    maintenance set next to ``compact_small_files`` (OPTIMIZE),
    ``analyze_table`` (ANALYZE) and ``zorder_layout`` (CLUSTER BY).

    Never touches the newest ``keep_last`` committed versions, so
    concurrent readers of :func:`read_published` are safe: they can only
    hold versions this call retains, or versions that were already
    superseded ``keep_last`` publishes ago (time-travel horizon — the same
    contract as Delta's ``VACUUM ... RETAIN``).

    Returns {"removed_versions": [...], "removed_staging": [...]}.
    """
    import shutil

    removed_v: list[int] = []
    removed_s: list[int] = []
    committed = _versions(target_dir)
    for v in committed[:-keep_last] if keep_last > 0 else committed:
        shutil.rmtree(os.path.join(target_dir, f"v={v}"))
        removed_v.append(v)
    staging = os.path.join(target_dir, STAGING)
    if drop_staging and os.path.isdir(staging):
        for d in os.listdir(staging):
            if m := re.fullmatch(r"v=(\d+)", d):
                shutil.rmtree(os.path.join(staging, d))
                removed_s.append(int(m.group(1)))
    return {"removed_versions": removed_v, "removed_staging": removed_s}
