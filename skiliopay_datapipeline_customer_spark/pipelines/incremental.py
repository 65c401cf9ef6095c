"""Incremental medallion processing (SURVEY §4.2: the reference lists
incremental processing as a documented-but-unimplemented optimization —
docs/PERFORMANCE_OPTIMIZATION.md:260, api_ingestion.py `updated_since`).

Realization: a file-stream source watches the bronze landing directory;
each micro-batch runs the SAME clean transform the batch pipeline uses and
latest-wins-merges into the silver snapshot (versioned directories from
streaming/sinks.py). Processing cost per trigger is O(new data), not
O(table) — the property the reference wanted from `updated_since`.

Scale notes: the merge is a keyed window dedup (shuffle on the key only);
with Delta/Iceberg the same foreachBatch body becomes MERGE INTO and only
touched files rewrite. The checkpoint directory carries exactly-once file
tracking across restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..streaming.sinks import latest_snapshot, run_available_now, upsert_snapshot


def incremental_silver(
    spark: SparkSession,
    landing_dir: str,
    silver_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    clean,
    key_cols: list[str],
    order_col: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame | None:
    """Process newly-landed bronze files into the silver snapshot.

    ``clean`` is a pure DataFrame->DataFrame transform (the batch pipeline's
    clean stage works unchanged — streaming-incompatible ops like global
    dedup belong in the merge, which latest-wins-dedups by key anyway).
    Returns the post-run silver snapshot (None if nothing has landed yet).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = clean(reader.parquet(landing_dir))
    run_available_now(
        stream,
        checkpoint_dir=checkpoint_dir,
        output_mode="append",
        foreach_batch=upsert_snapshot(silver_dir, key_cols, order_col),
    )
    return latest_snapshot(spark, silver_dir)


def incremental_agg_refresh(
    spark: SparkSession,
    landing_dir: str,
    view_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    key_cols: list[str],
    sum_cols: list[str],
    max_files_per_trigger: int | None = None,
) -> DataFrame | None:
    """Incrementally-maintained additive aggregate (materialized-view
    refresh): per-key count + sums over EVERYTHING ever landed, updated per
    micro-batch by MERGING batch partials into the stored view —
    new_state = old_state + batch_partial, the classic self-maintainable-
    view rule for additive aggregates (count/sum; avg derives). Cost per
    trigger is O(batch + touched keys), never a rescan of history.

    The view lives in the versioned snapshot layout (`_SUCCESS`-gated, so a
    crashed refresh is invisible and the checkpoint replays it). Merging
    uses an outer union + groupBy-sum on the key — with Delta/Iceberg the
    same body is MERGE INTO ... UPDATE SET n = n + s.n.
    """
    from pyspark.sql import functions as F

    from ..streaming.sinks import latest_snapshot, run_available_now

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(landing_dir)

    aggs = [F.count("*").alias("n")] + [
        F.sum(c).alias(f"sum_{c}") for c in sum_cols
    ]
    val_cols = ["n"] + [f"sum_{c}" for c in sum_cols]

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy(*key_cols).agg(*aggs)
        merge_additive_partials(
            spark, view_dir, partial, batch_id, key_cols, val_cols
        )

    run_available_now(
        stream,
        checkpoint_dir=checkpoint_dir,
        foreach_batch=merge,
    )
    return latest_snapshot(spark, view_dir)


def merge_additive_partials(
    spark: SparkSession,
    view_dir: str,
    partial: DataFrame,
    batch_id: int,
    key_cols: list[str],
    val_cols: list[str],
) -> None:
    """Merge one batch's additive partials into the stored view,
    replay-idempotently: the view version IS the batch id, and the merge
    base is the newest version from a STRICTLY EARLIER batch — a
    crashed-then-replayed batch overwrites its own version computed from
    the same base instead of adding its partials twice (the
    additive-aggregate twin of `upsert_snapshot`'s overwrite rule)."""
    import os

    from pyspark.sql import functions as F

    from ..streaming.sinks import _versions

    prior = [v for v in _versions(view_dir) if v < batch_id]
    prev = (
        spark.read.parquet(os.path.join(view_dir, f"v={prior[-1]}"))
        if prior
        else None
    )
    merged = (
        partial
        if prev is None
        else prev.unionByName(partial)
        .groupBy(*key_cols)
        .agg(*[F.sum(c).alias(c) for c in val_cols])
    )
    merged.write.mode("overwrite").parquet(
        os.path.join(view_dir, f"v={batch_id}")
    )
