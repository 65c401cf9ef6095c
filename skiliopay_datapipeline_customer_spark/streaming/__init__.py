"""Structured Streaming layer (SURVEY §2.11).

The reference is strictly daily batch (dags/churn_prediction_pipeline.py:44);
its Kafka → stream design exists only as intent
(docs/CHURN_PREDICTION_PROCESS_LOG.md:499-515). This package implements the
streaming operators that would *produce* the reference's pre-baked windowed
columns (sessions_30d/_90d), as idiomatic Structured Streaming:

- file/rate sources with declared schemas (no inference on a stream)
- watermarked tumbling/sliding/session window aggregates
- stateful dedup via dropDuplicatesWithinWatermark
- foreachBatch incremental upsert of a latest-snapshot table (S15 semantics)

Transforms are pure ``DataFrame -> DataFrame`` and run identically on batch
frames (the batch twins in queries/temporal.py are the correctness oracle).
"""

from .sources import EVENTS_SCHEMA, events_stream
from .transforms import (
    click_purchase_attribution,
    dedup_events,
    running_user_totals,
    running_user_totals_tws,
    session_stats,
    sliding_counts,
    tumbling_counts,
)
from .sinks import run_available_now, upsert_snapshot

__all__ = [
    "EVENTS_SCHEMA",
    "events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_stats",
    "dedup_events",
    "running_user_totals",
    "running_user_totals_tws",
    "click_purchase_attribution",
    "run_available_now",
    "upsert_snapshot",
]
