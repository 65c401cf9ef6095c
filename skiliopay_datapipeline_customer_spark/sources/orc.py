"""ORC source + sink — the columnar alternative to parquet (S2/S3 family).

The reference's storage tier is parquet-only (src/ingestion/csv_ingestion.py
converts everything to parquet); warehouses that standardized on ORC
(Hive-lineage deployments) otherwise can't hand files to the engine without
a conversion pass. Spark ships the ORC reader/writer natively (vectorized
scan, predicate pushdown, column pruning — same scan-time properties the
engine relies on for parquet), so supporting it is a format flag, not a new
code path, and every loader guarantee in io.py carries over.

Same declared-schema philosophy as read_csv: schema inference at 100 TB is
a full extra pass plus per-file drift, so the reader takes an explicit
StructType (or JSON schema dict) and trusts ORC's own footer types only
when the caller passes none (ORC embeds a typed schema per file, unlike
CSV, so footer-typed reads are drift-safe within one table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | dict | None = None,
) -> DataFrame:
    """ORC scan. Filters and column selection push down to the stripe
    reader exactly as with parquet (`PushedFilters` in the plan); pass a
    schema to project/validate against a declared contract, or omit it to
    take the file footer's types."""
    if isinstance(schema, dict):
        from ..schema import to_struct_type

        schema = to_struct_type(schema)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> str:
    """ORC sink: zstd by default (ORC's modern default codec; snappy/zlib
    accepted), suffix-free directory layout and optional partition columns —
    mirror of write_parquet so the medallion writers can switch formats per
    table."""
    if path.endswith(".orc"):
        path = path[: -len(".orc")]
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
    return path
