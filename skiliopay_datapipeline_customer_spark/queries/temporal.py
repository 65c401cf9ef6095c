"""Temporal operators: event-time windows + as-of join (SURVEY §2.11 batch
equivalents — the aggregations that would *produce* the reference's
pre-baked sessions_30d/_90d columns, and the streaming windows' batch twins).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from ..operators.joins import asof_join
from . import query

# Tumbling 1-day window counts (F.window ≡ DuckDB time_bucket, both
# epoch-aligned). This is the batch twin of the streaming tumbling agg.


@query(
    "tumbling_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS bucket_start,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def tumbling_window_counts(spark, sf_dir):
    from ..streaming.transforms import tumbling_counts

    # same transform the streaming path runs (streaming/transforms.py)
    return tumbling_counts(table(spark, sf_dir, "events")).orderBy("bucket_start")


# Sliding 2-day/1-day window counts: each event lands in exactly 2 windows.


@query(
    "sliding_window_counts",
    oracle="""
    SELECT bucket_start, count(*) AS n_events
    FROM (
      SELECT time_bucket(INTERVAL '1 day', ts) - (INTERVAL 1 DAY * k.k) AS bucket_start
      FROM events, (SELECT unnest([0, 1]) AS k) k
    )
    GROUP BY 1 ORDER BY 1
    """,
)
def sliding_window_counts(spark, sf_dir):
    from ..streaming.transforms import sliding_counts

    return sliding_counts(table(spark, sf_dir, "events")).orderBy("bucket_start")


# Gap-based session windows (30 min), the fact_sessions derivation
# (src/storage/data_warehouse.py:509-527). Oracle = gaps-and-islands SQL.


@query(
    "session_window_stats",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def session_window_stats(spark, sf_dir):
    from ..streaming.transforms import session_stats

    return session_stats(table(spark, sf_dir, "events")).orderBy(
        "user_id", "session_start"
    )


# Backward as-of join: for each purchase event, the user's latest click
# at-or-before it (union+window form — no range-join blowup; DuckDB oracle
# uses its native ASOF JOIN). Right side pre-deduped per (user, ts).


@query(
    "asof_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id, c.event_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
      SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ) c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def asof_purchase_click(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_payload=["event_id"],
    )
    return joined.select(
        "event_id", "user_id", F.col("_asof.event_id").alias("click_id")
    ).orderBy("event_id")


# P1 global row id under an explicit total order (SURVEY §7.4 hard part:
# range(len(df)) has no distributed meaning; define via an exact rank over a
# declared order). PRIMARY = the range-partitioned two-pass rank
# (operators/ranks.py) — no single-task window; the one-window transcription
# survives as `global_row_number_parity` (tests-only cross-check).


@query(
    "global_row_number",
    oracle="""
    SELECT row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS row_id,
           o_orderkey
    FROM orders
    ORDER BY row_id LIMIT 100
    """,
)
def global_row_number(spark, sf_dir):
    from ..operators.ranks import global_rank_distributed

    ranked = global_rank_distributed(
        table(spark, sf_dir, "orders"),
        ["o_orderdate", "o_orderkey"],
        rank_col="row_id",
    )
    return ranked.select("row_id", "o_orderkey").orderBy("row_id").limit(100)


def global_row_number_parity(spark, sf_dir):
    """Single-window form (tests-only): funnels the table through one task."""
    from pyspark.sql import Window

    w = Window.orderBy("o_orderdate", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select(F.row_number().over(w).alias("row_id"), "o_orderkey")
        .orderBy("row_id")
        .limit(100)
    )


# percent_rank — the scale-friendly quantile-flag alternative to a collected
# percentile scalar (A10 note in SURVEY §2.4). Under a TOTAL order rank =
# row_number, so percent_rank = (rank-1)/(n-1) falls straight out of the
# distributed two-pass rank — PRIMARY form; the one-window transcription is
# `percent_rank_prices_parity` (tests-only).


@query(
    "percent_rank_prices",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS price_pr
    FROM orders
    ORDER BY o_orderkey
    """,
)
def percent_rank_prices(spark, sf_dir):
    from ..operators.ranks import global_rank_distributed

    orders = table(spark, sf_dir, "orders")
    ranked = global_rank_distributed(
        orders,
        ["o_totalprice", "o_orderkey"],
        rank_col="_r",
    )
    # n-1 rides as a broadcast 1-row cross join — no eager .count() job
    nrow = F.broadcast(orders.agg(F.count("*").alias("_n")))
    return (
        ranked.crossJoin(nrow)
        .select(
            "o_orderkey",
            F.round(
                (F.col("_r") - 1) / (F.col("_n") - 1).cast("double"), 6
            ).alias("price_pr"),
        )
        .orderBy("o_orderkey")
    )


def percent_rank_prices_parity(spark, sf_dir):
    """Single-window form (tests-only)."""
    from pyspark.sql import Window

    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderkey", F.round(F.percent_rank().over(w), 6).alias("price_pr")
        )
        .orderBy("o_orderkey")
    )


# The UPSTREAM producer of the reference's pre-baked behavioral columns
# (sessions_30d/_90d, churn_schema.json): windowed conditional counts per
# user relative to the stream head — one scan, one shuffle on user_id.
# This is the query the reference's data vendor ran before the CSV landed.


@query(
    "behavioral_columns_from_events",
    oracle="""
    WITH head AS (SELECT max(ts) AS max_ts FROM events)
    SELECT user_id,
           CAST(sum(CASE WHEN ts >= max_ts - INTERVAL 30 DAY THEN 1 ELSE 0 END)
             AS BIGINT) AS sessions_30d,
           count(*) AS sessions_90d,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4)
             AS gmv_90d,
           CAST(sum(CASE WHEN event_type = 'purchase'
                     AND ts >= max_ts - INTERVAL 30 DAY THEN 1 ELSE 0 END)
             AS BIGINT) AS orders_30d,
           CAST(datediff('day',
                max(CASE WHEN event_type = 'purchase' THEN ts END), max_ts)
             AS BIGINT) AS days_since_last_order
    FROM events CROSS JOIN head
    GROUP BY user_id, max_ts
    ORDER BY user_id
    """,
)
def behavioral_columns_from_events(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    # the corpus head rides the plan as a broadcast 1-row cross join (the
    # oracle's CROSS JOIN head, literally) — no eager .first() job
    head = F.broadcast(events.agg(F.max("ts").alias("_max_ts")))
    recent = F.col("ts") >= F.col("_max_ts") - F.expr("INTERVAL 30 DAYS")
    is_purchase = F.col("event_type") == "purchase"
    return (
        events.crossJoin(head)
        .groupBy("user_id", "_max_ts")
        .agg(
            F.sum(recent.cast("int")).alias("sessions_30d"),
            F.count("*").alias("sessions_90d"),
            F.round(
                F.sum(F.when(is_purchase, F.col("value")).otherwise(0.0)), 4
            ).alias("gmv_90d"),
            F.sum((is_purchase & recent).cast("int")).alias("orders_30d"),
            F.datediff(
                F.col("_max_ts"), F.max(F.when(is_purchase, F.col("ts")))
            ).cast("bigint").alias("days_since_last_order"),
        )
        .drop("_max_ts")
        .orderBy("user_id")
    )


# Cohort retention matrix — the churn dashboard's companion analysis:
# cohort = first-purchase month, cell = active purchasers at each month
# offset. Month arithmetic via integer year*12+month on BOTH sides (DuckDB
# datediff('month') counts boundaries; Spark months_between returns
# fractions — integer month indexes sidestep both).


@query(
    "cohort_retention",
    oracle="""
    WITH purchases AS (
      SELECT user_id, date_trunc('month', ts) AS m
      FROM events WHERE event_type = 'purchase'
    ),
    firsts AS (
      SELECT user_id, min(m) AS cohort FROM purchases GROUP BY user_id
    ),
    activity AS (SELECT DISTINCT user_id, m FROM purchases)
    SELECT f.cohort,
           (year(a.m) * 12 + month(a.m)) - (year(f.cohort) * 12 + month(f.cohort))
             AS month_offset,
           count(*) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort, month_offset
    ORDER BY cohort, month_offset
    """,
)
def cohort_retention(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.date_trunc("month", "ts").alias("m")
    )
    firsts = purchases.groupBy("user_id").agg(F.min("m").alias("cohort"))
    activity = purchases.distinct()
    month_idx = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort",
            (month_idx(F.col("m")) - month_idx(F.col("cohort"))).alias(
                "month_offset"
            ),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort", "month_offset")
    )


# Ordered funnel: users whose first signup precedes their first click
# precedes their first purchase — one conditional-min aggregate pass per
# user, then one global rollup. The standard event-analytics companion to
# cohort retention.


@query(
    "funnel_counts",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS s,
             min(CASE WHEN event_type = 'click' THEN ts END) AS c,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS reached_signup,
           CAST(sum(CASE WHEN s IS NOT NULL AND c > s THEN 1 ELSE 0 END) AS BIGINT)
             AS reached_click,
           CAST(sum(CASE WHEN s IS NOT NULL AND c > s AND p > c THEN 1 ELSE 0 END)
             AS BIGINT) AS reached_purchase
    FROM stages
    """,
)
def funnel_counts(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stages = events.groupBy("user_id").agg(
        first_of("signup").alias("s"),
        first_of("click").alias("c"),
        first_of("purchase").alias("p"),
    )
    s, c, p = F.col("s"), F.col("c"), F.col("p")
    return stages.agg(
        F.count("*").alias("n_users"),
        F.sum(s.isNotNull().cast("int")).alias("reached_signup"),
        F.sum((s.isNotNull() & (c > s)).cast("int")).alias("reached_click"),
        F.sum((s.isNotNull() & (c > s) & (p > c)).cast("int")).alias(
            "reached_purchase"
        ),
    )


# ---------------------------------------------------------------------------
# Interval-containment range join: sessionize clicks (48 h inactivity gap —
# classic lag + cumulative new-session flag), then count purchases falling
# inside each session window. The Spark side runs the bin-bucketed range
# join (operators/joins.py::interval_containment_join): intervals explode to
# covered day-bins, points hash to one bin, the join is equi on (user, bin)
# with the exact BETWEEN filter inside the bucket — no per-key cross
# product at 100 TB. All times integer epoch-micros; session ids are
# cumulative ints — every column is engine-exact.
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 48 * 3600 * 1_000_000


@query(
    "session_purchase_attribution",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click'
    ),
    flagged AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
                                        ORDER BY ts_us, event_id) IS NULL
                  OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                              ORDER BY ts_us, event_id)
                     > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM clicks
    ),
    sess0 AS (
      SELECT user_id, ts_us,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    sess AS (
      SELECT user_id, session_id,
             min(ts_us) AS start_us, max(ts_us) AS end_us,
             count(*) AS n_clicks
      FROM sess0 GROUP BY user_id, session_id
    ),
    purch AS (
      SELECT user_id, epoch_us(ts) AS p_us FROM events
      WHERE event_type = 'purchase'
    ),
    counts AS (
      SELECT s.user_id, s.session_id, count(p.p_us) AS n_purchases
      FROM sess s LEFT JOIN purch p
        ON p.user_id = s.user_id AND p.p_us BETWEEN s.start_us AND s.end_us
      GROUP BY s.user_id, s.session_id
    )
    SELECT s.user_id, CAST(s.session_id AS BIGINT) AS session_id,
           s.start_us, s.end_us,
           CAST(s.n_clicks AS BIGINT) AS n_clicks,
           CAST(c.n_purchases AS BIGINT) AS n_purchases
    FROM sess s JOIN counts c USING (user_id, session_id)
    ORDER BY user_id, session_id
    """,
)
def session_purchase_attribution(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.joins import interval_containment_join

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    flagged = clicks.withColumn(
        "_new",
        (prev.isNull() | ((F.col("ts_us") - prev) > _SESSION_GAP_US)).cast("int"),
    )
    sid = F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        flagged.withColumn("session_id", sid)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.count(F.lit(1)).alias("n_clicks"),
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    hits = interval_containment_join(
        purch, sess, "user_id", "p_us", "start_us", "end_us"
    )
    counts = hits.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_purchases")
    )
    return (
        sess.join(counts, ["user_id", "session_id"], "left")
        .select(
            "user_id",
            "session_id",
            "start_us",
            "end_us",
            "n_clicks",
            F.coalesce("n_purchases", F.lit(0)).cast("long").alias("n_purchases"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# Snapshot diff (row-level change capture between two daily snapshots —
# scripts/check_daily_data.py:12-65 reconciliation lifted from counts to
# rows). The fixture derives two snapshots from the events table: the
# "new" day sees five more days of events plus a value correction on
# 'error' rows (+1.0 — exact IEEE arithmetic, no rounding coin-flips), so
# 'added' and 'changed' are both non-vacuous. Comparisons are null-safe
# column predicates; unchanged rows never leave the join.
# ---------------------------------------------------------------------------


@query(
    "snapshot_diff_events",
    oracle="""
    WITH snap_old AS (
      SELECT event_id, event_type, value FROM events
      WHERE ts < TIMESTAMP '2024-01-20'
    ),
    snap_new AS (
      SELECT event_id, event_type,
             CASE WHEN event_type = 'error' THEN value + 1.0 ELSE value END
               AS value
      FROM events WHERE ts < TIMESTAMP '2024-01-25'
    ),
    j AS (
      SELECT coalesce(n.event_id, o.event_id) AS event_id,
             CASE WHEN o.event_id IS NULL THEN 'added'
                  WHEN n.event_id IS NULL THEN 'removed'
                  WHEN o.value IS DISTINCT FROM n.value
                       OR o.event_type IS DISTINCT FROM n.event_type
                    THEN 'changed'
                  ELSE 'same' END AS status
      FROM snap_old o FULL OUTER JOIN snap_new n ON o.event_id = n.event_id
    )
    SELECT event_id, status FROM j WHERE status <> 'same' ORDER BY event_id
    """,
)
def snapshot_diff_events(spark, sf_dir):
    from ..sources.snapshots import snapshot_diff

    ev = table(spark, sf_dir, "events")
    old = ev.filter(
        F.col("ts") < F.lit("2024-01-20").cast("timestamp")
    ).select("event_id", "event_type", "value")
    new = ev.filter(
        F.col("ts") < F.lit("2024-01-25").cast("timestamp")
    ).select(
        "event_id",
        "event_type",
        F.when(
            F.col("event_type") == "error", F.col("value") + F.lit(1.0)
        )
        .otherwise(F.col("value"))
        .alias("value"),
    )
    return snapshot_diff(
        old, new, key_cols=["event_id"], compare_cols=["event_type", "value"]
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Semi-structured extraction: events.props is a JSON string. The engine path
# is TYPED parsing — from_json with a declared schema keeps the extraction
# inside whole-stage codegen (one parse per row into a struct, pruned to the
# fields used), never per-field regex or a Python UDF. Rollup of the
# extracted field per event type; the oracle extracts with DuckDB's JSON
# operators.
# ---------------------------------------------------------------------------


@query(
    "event_props_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_sum,
           min(CAST(props->>'$.k' AS INTEGER)) AS k_min,
           max(CAST(props->>'$.k' AS INTEGER)) AS k_max
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_props_rollup(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p.k")).cast("long").alias("k_sum"),
            F.min(F.col("p.k")).alias("k_min"),
            F.max(F.col("p.k")).alias("k_max"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Latest-wins compaction as a BATCH aggregate: the newest event per user via
# max_by — the same argmax-by-key the streaming snapshot upsert applies
# per micro-batch (streaming/sinks.py), here as one partial-aggregating
# shuffle (no window, no sort). Key discipline: (user_id, ts) is unique in
# every fixture SF (asserted by the oracle match itself — ties would
# diverge); a composite tiebreak needs a packed scalar key since the oracle
# dialect's arg_max takes scalar keys only.
# ---------------------------------------------------------------------------


@query(
    "latest_event_per_user",
    oracle="""
    SELECT user_id,
           arg_max(event_id, ts) AS last_event_id,
           arg_max(event_type, ts) AS last_event_type,
           arg_max(value, ts) AS last_value,
           epoch_us(max(ts)) AS last_ts_us
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def latest_event_per_user(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by("event_id", "ts").alias("last_event_id"),
            F.max_by("event_type", "ts").alias("last_event_type"),
            F.max_by("value", "ts").alias("last_value"),
            F.unix_micros(F.max("ts")).alias("last_ts_us"),
        )
        .orderBy("user_id")
    )


# Batch twin of the watermarked stream-stream join: purchases joined to the
# same user's clicks within the 30-minute attribution window. The streaming
# path runs the IDENTICAL transform with watermarks on both sides
# (streaming/transforms.py::click_purchase_attribution); this oracle-checked
# form proves the join semantics.


@query(
    "click_attribution_window",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           p.ts AS purchase_ts,
           round(p.value, 4) AS purchase_value,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    ORDER BY purchase_id, click_id
    """,
)
def click_attribution_window(spark, sf_dir):
    from ..streaming.transforms import click_purchase_attribution

    events = table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    return (
        click_purchase_attribution(clicks, purchases)
        .withColumn("purchase_value", F.round("purchase_value", 4))
        .orderBy("purchase_id", "click_id")
    )


# ---------------------------------------------------------------------------
# The same semi-structured rollup through Spark 4's VARIANT type:
# parse_json once into the binary variant encoding, variant_get the typed
# path. Unlike from_json there is NO declared schema — the shredding is
# late-bound per access, which is the right tier when event payloads are
# heterogeneous (the declared-schema from_json twin above stays the fast
# path when the shape IS known). DuckDB's JSON operators are the oracle.
# ---------------------------------------------------------------------------


@query(
    "event_props_variant_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_sum,
           round(avg(CAST(props->>'$.k' AS INTEGER)), 4) AS k_avg
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_props_variant_rollup(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.round(F.avg("k"), 4).alias("k_avg"),
        )
        .orderBy("event_type")
    )


# SCD2-shaped history from the event stream: each user's consecutive
# same-event_type runs become versioned rows (valid_from/valid_to epoch
# micros, open row flagged current) — gaps-and-islands + one lead over the
# runs frame; the query twin of `pipelines/warehouse.scd2_merge`.


@query(
    "user_state_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM ordered
    ),
    grouped AS (
      SELECT user_id, run_id, min(event_type) AS state,
             epoch_us(min(ts)) AS valid_from_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id, state, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us, run_id)
             AS valid_to_us,
           n_events,
           CAST(lead(valid_from_us) OVER (PARTITION BY user_id
                                          ORDER BY valid_from_us, run_id)
                IS NULL AS INT) AS is_current
    FROM grouped
    ORDER BY user_id, valid_from_us, state
    """,
)
def user_state_history(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.withColumn(
        "chg",
        (
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
        ).cast("int"),
    )
    runs = ordered.withColumn(
        "run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    grouped = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("state"),
        F.unix_micros(F.min("ts")).alias("valid_from_us"),
        F.count("*").alias("n_events"),
    )
    # run_id tiebreak: two runs of one user CAN share a start microsecond
    # (same-timestamp events of different types) — without it the lead frame
    # is not a total order and valid_to/is_current become placement-dependent
    wr = Window.partitionBy("user_id").orderBy("valid_from_us", "run_id")
    return (
        grouped.withColumn("valid_to_us", F.lead("valid_from_us").over(wr))
        .select(
            "user_id",
            "state",
            "valid_from_us",
            "valid_to_us",
            "n_events",
            F.col("valid_to_us").isNull().cast("int").alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us", "state")
    )


# Cohort LTV curves — the revenue companion of the retention matrix:
# cumulative purchase value per WEEKLY cohort at each week offset (the
# 30-day events table spans ~5 weeks), normalized per cohort member.
# Revenue in integer cents so distributed sums are exact and
# order-independent; the cumsum runs per cohort (a weeks-sized frame).


@query(
    "cohort_ltv_curves",
    oracle="""
    WITH purchases AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    firsts AS (
      SELECT user_id, min(w) AS cohort FROM purchases GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
      FROM firsts GROUP BY cohort
    ),
    cells AS (
      SELECT f.cohort,
             CAST(datediff('day', f.cohort, p.w) / 7 AS BIGINT) AS week_offset,
             sum(p.cents) AS cents
      FROM purchases p JOIN firsts f ON p.user_id = f.user_id
      GROUP BY f.cohort, week_offset
    )
    SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort, c.week_offset,
           s.cohort_users,
           round(sum(c.cents) OVER (PARTITION BY c.cohort ORDER BY c.week_offset
                                    ROWS UNBOUNDED PRECEDING)
                 / 100.0 / s.cohort_users, 4) AS cum_ltv_per_user
    FROM cells c JOIN sizes s ON c.cohort = s.cohort
    ORDER BY cohort, c.week_offset
    """,
)
def cohort_ltv_curves(spark, sf_dir):
    from pyspark.sql import Window

    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.to_date(F.date_trunc("week", "ts")).alias("w"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    firsts = purchases.groupBy("user_id").agg(F.min("w").alias("cohort"))
    sizes = firsts.groupBy("cohort").agg(F.count("*").alias("cohort_users"))
    cells = (
        purchases.join(firsts, "user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("w"), F.col("cohort")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.sum("cents").alias("cents"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            "week_offset",
            "cohort_users",
            F.round(
                F.sum("cents").over(w) / 100.0 / F.col("cohort_users"), 4
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort", "week_offset")
    )
