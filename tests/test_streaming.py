"""Structured Streaming tests (SURVEY §2.11): each streaming result must
equal its batch twin on the same input — the transforms are shared code, so
this checks the streaming machinery (source, watermark, state, sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skiliopay_datapipeline_customer_spark.io import table
from skiliopay_datapipeline_customer_spark.streaming import (
    dedup_events,
    events_stream,
    run_available_now,
    session_stats,
    tumbling_counts,
    upsert_snapshot,
)
from skiliopay_datapipeline_customer_spark.streaming.sinks import latest_snapshot


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events written as 3 files — a stream of 3 arrivals."""
    path = str(tmp_path_factory.mktemp("events_in"))
    table(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(path)
    return path


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_tumbling_stream_matches_batch(spark, events_dir, tmp_path):
    stream = tumbling_counts(events_stream(spark, events_dir))
    run_available_now(
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="complete",
        query_name="tumbling_t",
    )
    got = _rows(spark.sql("SELECT * FROM tumbling_t"), "bucket_start")
    want = _rows(tumbling_counts(spark.read.parquet(events_dir)), "bucket_start")
    assert got == want and len(got) > 0


def test_session_stream_matches_batch(spark, events_dir, tmp_path):
    stream = session_stats(events_stream(spark, events_dir))
    run_available_now(
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="complete",
        query_name="sessions_t",
    )
    got = _rows(spark.sql("SELECT * FROM sessions_t"), "user_id", "session_start")
    want = _rows(
        session_stats(spark.read.parquet(events_dir)), "user_id", "session_start"
    )
    assert got == want and len(got) > 0


def test_stateful_dedup(spark, events_dir, tmp_path):
    # input with every event duplicated across two arrivals
    dup_dir = str(tmp_path / "dup_in")
    base = spark.read.parquet(events_dir)
    base.write.mode("overwrite").parquet(dup_dir)
    base.write.mode("append").parquet(dup_dir)

    out = str(tmp_path / "out")
    run_available_now(
        dedup_events(events_stream(spark, dup_dir), keys=["event_id"]),
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="append",
        out_dir=out,
    )
    n_unique = base.select("event_id").distinct().count()
    assert spark.read.parquet(out).count() == n_unique


def test_foreach_batch_upsert_latest_wins(spark, events_dir, tmp_path):
    target = str(tmp_path / "snapshot")
    # one micro-batch per input file → several incremental merges
    stream = events_stream(spark, events_dir, max_files_per_trigger=1)
    run_available_now(
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="append",
        foreach_batch=upsert_snapshot(target, key_cols=["user_id"], order_col="ts"),
    )
    snap = latest_snapshot(spark, target)
    batch = spark.read.parquet(events_dir)
    # one row per user, carrying that user's max ts
    want = batch.groupBy("user_id").agg(F.max("ts").alias("ts"))
    assert _rows(snap.select("user_id", "ts"), "user_id") == _rows(want, "user_id")
    assert snap.count() == batch.select("user_id").distinct().count()
