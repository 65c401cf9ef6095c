"""Catalog / warehouse DDL operators (S9-S13).

Reference parity: create_tables (src/storage/data_warehouse.py:45-62),
backup_table CTAS (:191-218), optimize_table VACUUM/ANALYZE (:220-238),
get_table_info (:154-189), create_indexes (:123-152).

Mapping notes: Postgres btree indexes have no Spark analogue — the same
columns become partition/bucket/sort keys (`index_equivalent_layout`);
VACUUM/ANALYZE becomes `ANALYZE TABLE ... COMPUTE STATISTICS`, which feeds
Catalyst's cost-based optimizer exactly as Postgres stats feed its planner.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def create_table(
    spark: SparkSession,
    name: str,
    ddl_columns: str,
    using: str = "parquet",
    partitioned_by: list[str] | None = None,
    location: str | None = None,
    if_not_exists: bool = True,
) -> None:
    """S9: CREATE TABLE with declared columns (decimal types preserved)."""
    parts = [
        "CREATE TABLE",
        "IF NOT EXISTS" if if_not_exists else "",
        name,
        f"({ddl_columns})",
        f"USING {using}",
    ]
    if partitioned_by:
        parts.append(f"PARTITIONED BY ({', '.join(partitioned_by)})")
    if location:
        parts.append(f"LOCATION '{location}'")
    spark.sql(" ".join(p for p in parts if p))


def backup_table(spark: SparkSession, table: str, suffix: str) -> str:
    """S11: CTAS backup `table_backup_<suffix>` (data_warehouse.py:191-218)."""
    backup_name = f"{table}_backup_{suffix}"
    spark.sql(f"CREATE TABLE {backup_name} AS SELECT * FROM {table}")
    return backup_name


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> None:
    """S12: stats for the CBO — the engine's VACUUM/ANALYZE."""
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}"
        )
    else:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")


@dataclass
class TableInfo:
    name: str
    columns: list[tuple[str, str]]
    row_count: int


def table_info(spark: SparkSession, table: str) -> TableInfo:
    """S13: information_schema probe + COUNT(*) (data_warehouse.py:154-189)."""
    cols = [(c.name, c.dataType) for c in spark.catalog.listColumns(table)]
    n = spark.table(table).count()
    return TableInfo(name=table, columns=cols, row_count=n)


def index_equivalent_layout(
    df: DataFrame,
    filter_cols: list[str],
    path: str,
    max_records_per_file: int = 1_000_000,
) -> str:
    """S10 stand-in: sort-within-partitions by the reference's indexed
    columns before writing, so parquet row-group min/max stats make scans on
    those columns skip whole row groups — the columnar cousin of a btree.
    Partitioning-by-date + this layout covers the reference's index list
    (churn_label, country, timestamps; init.sql:136-141)."""
    (
        df.repartition(*[F.col(c) for c in filter_cols])
        .sortWithinPartitions(*filter_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
    return path


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed table write: the co-located-join primitive (SURVEY §4.4).

    Two tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle — each task reads matching bucket files from both
    sides (verified by the no-Exchange plan assertion in tests). This is the
    Spark replacement for the reference's btree-indexed FK joins at 100 TB:
    the shuffle happens once at write time, then every subsequent join is
    map-side. Requires saveAsTable (bucket metadata lives in the catalog).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def zorder_value(n_cols: int, bits: int = 8):
    """Z-order (Morton) key over quantile-level columns, as one native
    Column expression: the ``_qr_<i>`` level columns (each in
    [0, 2^bits)) are bit-interleaved by a sum of shift/mask terms —
    pure codegen, no UDF. :func:`zorder_layout` produces the levels."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i in range(n_cols):
            bit = F.shiftright(F.col(f"_qr_{i}"), b).bitwiseAND(F.lit(1))
            z = z + (bit.cast("long") * F.lit(1 << (b * n_cols + i)).cast("long"))
    return z


def zorder_layout(
    df: DataFrame,
    zorder_cols: list[str],
    path: str,
    bits: int = 8,
    max_records_per_file: int = 1_000_000,
) -> str:
    """Multi-dimensional data-skipping layout: write the table ordered along
    a Z-curve over ``zorder_cols``, so parquet row-group min/max stats stay
    narrow for EVERY curve column — point/range predicates on any of them
    skip most row groups. A single-column sort gives this for one column
    and destroys it for the others; Z-ordering shares the locality budget.

    Each column is rank-normalized to 2^bits quantile levels using
    boundaries from ONE ``approx_percentile`` pass (mergeable sketch —
    partial per partition, no global sort, no window; the boundary array is
    metadata-sized and rides the plan as a literal). Rank levels rather
    than min/max scaling keep a heavy-tailed column from collapsing into
    one level. The write is repartitionByRange + sortWithinPartitions on
    the interleaved key: one extra shuffle at write time buys row-group
    skipping on every subsequent scan — the 100 TB trade that wins for
    scan-heavy tables.
    """
    levels = 1 << bits
    pcts = F.array(*[F.lit(i / levels) for i in range(1, levels)])
    stats = df.select(
        *[
            F.approx_percentile(F.col(c).cast("double"), pcts, 10_000).alias(c)
            for c in zorder_cols
        ]
    ).first()
    work = df
    for i, c in enumerate(zorder_cols):
        # approx_percentile over zero rows returns NULL: an empty frame
        # still writes an (empty) layout instead of crashing
        vals = stats[c] or []
        bounds = F.array(*[F.lit(float(b)) for b in vals]).cast("array<double>")
        # level = #boundaries <= value: an aggregate over the literal
        # boundary array (255 comparisons/row at the default 8 bits)
        work = work.withColumn(
            f"_qr_{i}",
            F.aggregate(
                bounds,
                F.lit(0),
                lambda acc, b: acc
                + F.when(b <= F.col(c).cast("double"), 1).otherwise(0),
            ),
        )
    (
        work.withColumn("_z", zorder_value(len(zorder_cols), bits=bits))
        .repartitionByRange(
            max(df.sparkSession.sparkContext.defaultParallelism, 8), "_z"
        )
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_qr_{i}" for i in range(len(zorder_cols))])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
    return path


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Lake maintenance: rewrite a parquet directory's many small files into
    few near-target-size files (the OPTIMIZE/compaction half of VACUUM that
    `analyze_table` doesn't cover). Streaming sinks and incremental appends
    leave one file per micro-batch/task; at 100 TB that means millions of
    tiny files whose open/footer costs dominate scans and whose row groups
    are too small for effective stats pruning.

    File count comes from the actual on-disk byte size (not a row guess);
    an optional ``sort_cols`` re-sorts within partitions during the rewrite
    so compaction also restores zone-map locality. The rewrite goes through
    a temp directory then a rename swap — readers see the old layout or the
    new one, never a partial mix. The swap is two renames, not one atomic
    op: a crash in between leaves the data only under ``._compact_old``,
    and the next invocation restores it (stale tmp/old artifacts are
    likewise reclaimed on entry instead of wedging every later run).

    Returns {files_before, files_after, bytes}.
    """
    import glob as _glob
    import os
    import shutil

    old = path.rstrip("/") + "._compact_old"
    tmp = path.rstrip("/") + "._compact_tmp"
    # crash recovery BEFORE reading anything: a previous run that died
    # between its two renames leaves the data only under ._compact_old
    # (restore it), and a run that died before rmtree leaves a stale
    # ._compact_old beside a healthy table (remove it — os.rename onto a
    # non-empty dir would otherwise fail every later compaction). A stale
    # tmp from a crashed write is always safe to discard.
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)
    elif os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    files = [
        f
        for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, round(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    out = df.coalesce(n_out)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    out.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = len(
        [
            f
            for f in _glob.glob(
                os.path.join(path, "**", "*.parquet"), recursive=True
            )
            if os.path.isfile(f)
        ]
    )
    return {
        "files_before": len(files),
        "files_after": files_after,
        "bytes": total_bytes,
    }


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    fpp: float = 0.01,
    ndv: int | None = None,
) -> None:
    """Write parquet with PER-COLUMN BLOOM FILTERS — the point-lookup
    "index" for high-cardinality keys where sorted-row-group min/max
    (:func:`index_equivalent_layout`) can't skip: a reader probes the bloom
    sidecar per row group and skips groups that definitely lack the key
    (false-positive rate ``fpp``, never false negatives). Standard parquet
    metadata — every engine that reads the footer benefits, not just Spark.
    """
    w = df.write.mode("overwrite")
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.fpp#{c}", str(fpp)
        )
        if ndv is not None:
            w = w.option(f"parquet.bloom.filter.expected.ndv#{c}", str(ndv))
    w.parquet(path)


def backfill_partitions(
    df: DataFrame,
    path: str,
    partition_col: str,
) -> None:
    """Backfill a date-partitioned table: rewrite ONLY the partitions
    present in ``df``, leaving every other partition untouched — Spark's
    dynamic partition overwrite (`partitionOverwriteMode=dynamic`), the
    idempotent daily-recompute primitive (re-running a day's job replaces
    that day exactly; a STATIC overwrite would drop the whole table).
    Scoped via the writer's per-operation conf, not a session-level flip.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
