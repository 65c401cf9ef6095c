"""JSONL / raw-text corpus source and sink.

The interchange formats of LLM training-data pipelines: one JSON object per
line (the Common Crawl / RedPajama / Dolma layout) and one-document-per-file
raw text. The reference ingests only CSV/REST/JDBC (src/ingestion/); this
rounds out the source family for the corpus operators
(operators/dedup.py, operators/textops.py, operators/sampling.py).

Scale notes:
- UNCOMPRESSED JSONL is line-splittable: one 100 GB file fans out across
  executors at ``maxPartitionBytes`` granularity — unlike a parquet file,
  whose row-group layout caps its scan parallelism. Gzip is NOT splittable
  (one task per .gz file); at 100 TB store many ~256 MB .gz shards or use a
  splittable codec. Both layouts read through the same call here.
- The schema is DECLARED, never inferred: Spark's JSON inference is a full
  extra pass over the data and drifts between samples. Same policy as the
  CSV source (csv.py).
- Corrupt lines (truncated writes, encoding damage — routine at crawl
  scale) quarantine instead of failing the job or silently nulling:
  PERMISSIVE capture into a corrupt-record column, then one map-only split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | dict,
) -> DataFrame:
    """Declared-schema JSONL scan with corrupt-line capture.

    Returns every input LINE as a row: parseable lines carry their fields
    and NULL in ``_corrupt_record``; unparseable lines carry the raw line
    there and NULL fields. Split with :func:`quarantine_corrupt`. Map-only;
    predicate pushdown does not apply to JSON but column pruning does
    (Jackson skips unprojected fields).
    """
    if isinstance(schema, dict):
        from ..schema import to_struct_type

        schema = to_struct_type(schema)
    if CORRUPT_COL not in schema.fieldNames():
        # build a NEW StructType: StructType.add mutates in place and returns
        # self, which would permanently graft _corrupt_record onto the
        # caller's schema object (breaking a reuse for a second reader,
        # a writer, or a schema comparison)
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def quarantine_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a :func:`read_jsonl` frame into (clean, quarantined).

    The clean side drops the capture column; the quarantine side keeps ONLY
    the raw offending line (its other fields are null by construction).
    The frame is persisted first: Spark refuses a query that filters on the
    corrupt column of an unmaterialized JSON scan (the raw line exists only
    while the parser runs — SPARK-21610), and the two sides would otherwise
    re-parse the input twice anyway.
    """
    df = df.persist()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """JSONL sink. ``compression`` in {None, "gzip", ...}: None keeps the
    output line-splittable for the next reader; gzip trades that for ~5×
    smaller shards (size shards ~256 MB so per-file tasks stay balanced)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_text_docs(
    spark: SparkSession,
    path: str,
    path_col: str = "doc_path",
    text_col: str = "text",
) -> DataFrame:
    """One document per FILE (the raw-dump corpus layout): whole file
    content in ``text_col``, source path in ``path_col``.

    ``wholetext`` makes each file one row/one task — correct for document
    semantics, so keep files document-sized; a directory of 100 TB of
    per-doc text files parallelizes by file count.
    """
    # NB: the wholetext kwarg, not .option("wholetext", ...) — the option
    # form is silently ignored by DataFrameReader.text in PySpark
    return spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias(path_col), F.col("value").alias(text_col)
    )


def read_text_lines(
    spark: SparkSession,
    path: str,
    text_col: str = "line",
) -> DataFrame:
    """One row per LINE across all files — the splittable raw-text scan
    (feeds line-level dedup/quality before document assembly)."""
    return spark.read.text(path).select(F.col("value").alias(text_col))
