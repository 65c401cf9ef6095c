"""SQL entry point: register the star-schema tables as temp views and run
Spark SQL directly.

The reference has no query language (§3 — its IR is a materialized pandas
frame); the Spark engine gets one for free via Catalyst. This module is the
supported surface for users who want `spark.sql` over the test tables —
every declared DataFrame query in queries/ has the same plan it would get
through this path (both compile to Catalyst logical plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import TABLES, table


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> list[str]:
    """Temp views named after the tables (idempotent; replaces existing)."""
    registered = []
    for name in tables:
        try:
            table(spark, sf_dir, name).createOrReplaceTempView(name)
            registered.append(name)
        except Exception:  # missing file at this SF → skip, like the driver
            continue
    return registered


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)
