"""JDBC scan/sink (S7/S8).

Reference parity: chunked multi-row INSERT loads with replace/append/fail
(src/storage/data_warehouse.py:64-99) and parameterized SQL reads (:101-121).
Spark equivalents: ``df.write.jdbc(batchsize=...)`` (mode maps 1:1) and
``spark.read.jdbc(query=...)`` which pushes the query to the database — the
warehouse's btree indexes (S10) keep serving it there.

Exercised in-container against embedded Apache Derby (on Spark's own
classpath — ``jdbc:derby:<dir>;create=true``): replace/append/fail modes,
batchsize, and query pushdown all round-trip in tests/test_sources.py.
Production databases differ only in URL + driver jar (standard spark.jars
deployment concern, not engine logic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_MODE_MAP = {"replace": "overwrite", "append": "append", "fail": "errorifexists"}


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "replace",
    batchsize: int = 10_000,
    properties: dict | None = None,
    execute: bool = True,
):
    """if_exists semantics of the reference mapped onto writer modes;
    batchsize 10k mirrors data_warehouse.py:70. With execute=False returns
    the configured writer (testable without a database)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(_MODE_MAP.get(mode, mode))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    if execute:
        writer.save()
    return writer


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str | None = None,
    table: str | None = None,
    properties: dict | None = None,
    partition_options: dict | None = None,
    execute: bool = True,
):
    """Pushdown read: `query=` ships the SQL to the database. For big tables
    pass partition_options {partitionColumn, lowerBound, upperBound,
    numPartitions} so executors read range-parallel."""
    reader = spark.read.format("jdbc").option("url", url)
    if query is not None:
        reader = reader.option("query", query)
    elif table is not None:
        reader = reader.option("dbtable", table)
    else:
        raise ValueError("need query or table")
    for k, v in {**(properties or {}), **(partition_options or {})}.items():
        reader = reader.option(k, str(v))
    if execute:
        return reader.load()
    return reader
