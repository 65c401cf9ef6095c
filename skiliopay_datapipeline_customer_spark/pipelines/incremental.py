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
