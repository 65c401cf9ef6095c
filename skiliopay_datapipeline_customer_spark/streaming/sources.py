"""Streaming sources (SURVEY §2.11; file-source equivalent of the reference's
daily snapshot arrival, scripts/run_processing.py:19-22).

Scale notes: a file stream source lists the input directory per trigger and
tracks processed files in the checkpoint — the cluster-scale pattern for
"new date-stamped file lands daily". ``maxFilesPerTrigger`` bounds per-batch
work (the reference's chunked-ingest analogue); for Kafka swap
``format("kafka")`` with the same downstream transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Declared schema for the events stream — streaming reads never infer
# (SURVEY §1.3: fixed + declared schema system). Micro-precision timestamps:
# writers normalize nanos upstream (io.table does this for the test parquet).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def events_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded parquet file source over an events directory."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)
