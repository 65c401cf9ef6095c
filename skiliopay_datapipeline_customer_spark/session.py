"""SparkSession factory.

Reference parity: the reference has no session concept (eager pandas,
``src/processing/etl_pipeline.py``); this is the engine's single entry to a
configured SparkSession. Defaults are chosen for the local[32] test box but
every knob is the one you'd tune on a 1000-executor cluster:

- AQE on (runtime shuffle coalescing, skew-join splitting, broadcast demotion)
- shuffle partitions sized by SPARK_GRAFT_CPUS (cluster: ~2-3x total cores)
- autoBroadcastJoinThreshold 64 MB: the star-schema dims (region/nation/
  customer at test SF; region/nation/supplier at 100 TB) broadcast instead of
  shuffling the fact table
- UTC session timezone so parquet timestamps hash identically to the DuckDB
  oracle
- Arrow enabled for any pandas_udf / toPandas path
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "skiliopay-spark-engine",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = str(shuffle_partitions or max(int(cpus), 8))
    # Driver heap: deliberately LEFT AT SPARK'S DEFAULT unless the caller
    # sizes it via SPARK_GRAFT_DRIVER_MEM. Measured at sf0.1/local[32]
    # (2 runs each): 1g default 31.4/35.5 s bench total, 4g 41.6 s,
    # 16g 39.7 s — the bigger heaps were consistently SLOWER on the
    # shuffle-heavy operators at this working-set size, so "give it more
    # memory" is not a free win and stays opt-in. Real datasets need it
    # (a 1g heap cannot hold sf≥1 broadcast/agg state); on a cluster you
    # size executors instead.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the events table stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert in io.table()
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
    )
    if driver_mem:
        builder = builder.config("spark.driver.memory", driver_mem)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate returns any PRE-EXISTING session with the builder configs
    # silently discarded — re-apply the runtime-settable ones so the
    # documented contract ("single entry to a CONFIGURED session") holds
    # when a harness/test created the session first. Static confs (master,
    # maxResultSize, nanosAsLong) cannot change on a live session; io.table
    # re-forces the read-path ones it depends on.
    runtime = {
        "spark.sql.shuffle.partitions": shuffle,
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        **(extra_conf or {}),
    }
    for k, v in runtime.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — static conf on a live session
            pass
    return spark
