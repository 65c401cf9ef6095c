"""Event-time transforms shared by batch and streaming (SURVEY §2.11).

Each is pure ``DataFrame -> DataFrame`` so the SAME code path serves the
batch twins in queries/temporal.py (the DuckDB-checked oracle surface) and
the streaming tests. Watermarks are applied here only when the input is
streaming — on a batch frame ``withWatermark`` is a no-op but we skip it to
keep batch plans clean.

Scale notes: windowed aggregates are hash-partitioned by (key, window) —
state per partition is bounded by watermark retention; session windows merge
state per key (user_id, ~50k keys at reference scale) and are the only
unbounded-gap risk, bounded here by the watermark delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, time_col: str, delay: str | None) -> DataFrame:
    if delay is not None and df.isStreaming:
        return df.withWatermark(time_col, delay)
    return df


def tumbling_counts(
    df: DataFrame,
    window_len: str = "1 day",
    time_col: str = "ts",
    watermark: str | None = "1 day",
) -> DataFrame:
    """Daily event counts + value sum — the sessions_30d-style producer.

    Watermark "1 day" mirrors the reference's daily-batch late-arrival
    tolerance (a record from yesterday's file still lands).
    """
    return (
        _maybe_watermark(df, time_col, watermark)
        .groupBy(F.window(time_col, window_len).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "n_events", "total_value")
    )


def sliding_counts(
    df: DataFrame,
    window_len: str = "2 days",
    slide: str = "1 day",
    time_col: str = "ts",
    watermark: str | None = "1 day",
) -> DataFrame:
    """Sliding-window counts — the 90d-window-sliding-daily producer shape."""
    return (
        _maybe_watermark(df, time_col, watermark)
        .groupBy(F.window(time_col, window_len, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("bucket_start"), "n_events")
    )


def session_stats(
    df: DataFrame,
    gap: str = "30 minutes",
    time_col: str = "ts",
    watermark: str | None = "1 day",
) -> DataFrame:
    """Gap-based session windows per user — fact_sessions derivation
    (reference DDL src/storage/data_warehouse.py:509-527)."""
    return (
        _maybe_watermark(df, time_col, watermark)
        .groupBy("user_id", F.session_window(time_col, gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def running_user_totals(
    df: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (St+ beyond
    the built-in windows): per-user LIFETIME counters (event count, value
    total) held in the state store and carried across micro-batches — the
    shape of "documents seen per source" / "tokens emitted per shard"
    counters a training-data pipeline keeps forever (no window bounds them,
    so ``groupBy(window)`` can't express it).

    Emits one row per user per micro-batch that touched the user (update
    mode), carrying the cumulative totals. State is (n, total) per key —
    bounded by key cardinality, not event volume; Arrow-batched transfer.

    The closure is self-contained (imports inside) so executors never need
    this module importable.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "n_events": pd.Series([n], dtype="int64"),
                "total_value": pd.Series([round(total, 4)], dtype="float64"),
            }
        )

    return (
        # project exactly the two inputs (alias, not rename): a frame that
        # already has a 'value'/'user_id' column would otherwise end up with
        # duplicates and kill the stream inside the executor UDF; the
        # projection also prunes unused columns off the state path
        df.select(
            F.col(user_col).alias("user_id"), F.col(value_col).alias("value")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            stateStructType="n bigint, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "30 minutes",
    time_col: str = "ts",
    watermark: str | None = "1 day",
) -> DataFrame:
    """Stream-stream INNER JOIN with event-time bounds: each purchase joins
    the same user's clicks whose timestamp falls in
    ``[purchase_ts - attribution_window, purchase_ts]`` — last-touch-style
    attribution as a continuous join, not a batch backfill.

    On streams BOTH sides carry watermarks and the BETWEEN condition bounds
    event time in both directions, which is exactly what Spark needs to
    expire join state: a buffered click is dropped once the purchase-side
    watermark passes ``click_ts + attribution_window``. State is therefore
    (click rate × window) per partition, independent of stream lifetime.
    On batch frames the same code is a plain equi+range join, the
    DuckDB-checked twin (``click_attribution_window``).
    """
    c = _maybe_watermark(clicks, time_col, watermark).select(
        F.col("user_id").alias("c_user"),
        F.col(time_col).alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = _maybe_watermark(purchases, time_col, watermark).select(
        F.col("user_id").alias("user_id"),
        F.col(time_col).alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    bound = F.expr(f"click_ts + INTERVAL {attribution_window}")
    return p.join(
        c,
        (p.user_id == c.c_user)
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") <= bound),
        "inner",
    ).select(
        "user_id", "purchase_id", "purchase_ts", "purchase_value", "click_id", "click_ts"
    )


def dedup_events(
    df: DataFrame,
    keys: list[str] | None = None,
    time_col: str = "ts",
    within: str | None = "1 day",
) -> DataFrame:
    """Stateful dedup (streaming U1). On a stream, state for each key is
    dropped once the watermark passes ``within`` — bounded memory; on a
    batch frame this is plain dropDuplicates."""
    keys = keys or ["event_id"]
    if df.isStreaming and within is not None:
        return df.withWatermark(time_col, within).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def running_user_totals_tws(
    df: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """The :func:`running_user_totals` contract on Spark 4's
    ``transformWithStateInPandas`` — the successor stateful API
    (StatefulProcessor + named state variables) that adds composite state,
    timers, and state-schema evolution over ``applyInPandasWithState``'s
    single implicit tuple. Same semantics: per-user lifetime (count, total)
    carried across micro-batches in the checkpointed state store, one
    update-mode row per touched user per batch.

    The processor class is defined inside the closure so executors never
    need this module importable.

    Environment gate: the TWS state-server wire protocol requires
    ``protobuf`` at runtime (ships with ``pyspark[connect]``); in
    containers without it the stream fails at initialization — the
    behavioral test skips there rather than faking the path.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([key[0]], dtype="int64"),
                    "n_events": pd.Series([n], dtype="int64"),
                    "total_value": pd.Series([round(total, 4)], dtype="float64"),
                }
            )

        def close(self) -> None:
            pass

    return (
        # project exactly the two inputs (alias, not rename): a frame that
        # already has a 'value'/'user_id' column would otherwise end up with
        # duplicates and kill the stream inside the executor UDF; the
        # projection also prunes unused columns off the state path
        df.select(
            F.col(user_col).alias("user_id"), F.col(value_col).alias("value")
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_Totals(),
            outputStructType="user_id bigint, n_events bigint, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )
