"""CSV source + parquet sink (S1/S3).

Reference parity: _read_csv with configurable delimiter/encoding
(src/ingestion/csv_ingestion.py:89-99) and _convert_to_parquet with snappy +
.parquet suffix normalization (:125-145). The reference lets pandas infer
dtypes then patches drift post-hoc (etl_pipeline.py:216-231); the engine
NEVER infers — a declared StructType reaches the reader so every partition
parses identically (inference at 100 TB = a full extra pass + schema drift
between files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | dict,
    sep: str = ",",
    encoding: str = "utf-8",
    header: bool = True,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Declared-schema CSV scan. ``schema`` may be a StructType or a JSON
    schema dict (compiled via schema.to_struct_type). PERMISSIVE keeps bad
    rows as nulls for the validation operators to report (V1), matching the
    reference's validate-then-decide flow; use FAILFAST for the strict gate.

    ``corrupt_col``: capture each unparseable line VERBATIM in this extra
    string column (Spark's columnNameOfCorruptRecord) — the quarantine
    path then reports WHAT failed, not just that something did; parseable
    rows carry NULL there. Map-only either way.
    """
    if isinstance(schema, dict):
        from ..schema import to_struct_type

        schema = to_struct_type(schema)
    reader = spark.read
    if corrupt_col:
        schema = T.StructType(
            [*schema.fields, T.StructField(corrupt_col, T.StringType())]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return (
        reader.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("encoding", encoding)
        .option("mode", mode)
        .csv(path)
    )


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> str:
    """S3 sink: snappy parquet, suffix-free directory layout, optional
    partition columns (date partitioning at scale, config.yaml:33-36)."""
    if path.endswith(".parquet"):
        path = path[: -len(".parquet")]
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path
