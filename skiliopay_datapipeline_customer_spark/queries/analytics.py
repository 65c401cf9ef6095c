"""Event-analytics suite: the time-series / distribution shapes a pandas
analyst leans on (resample, qcut deciles, robust outliers, journeys) that the
reference's churn pipeline implies but never names (pandas resample/ewm/qcut
habits in ``src/processing/feature_engineering.py``), re-expressed as
shuffle-once Spark plans with DuckDB oracles.

Scale posture (every query):
- one shuffle on its natural key (user_id / event_type / lang) — partial
  aggregation map-side; no global single-task window anywhere (the only
  global scalars are 1-row aggregates broadcast back).
- date spines are ``sequence()``-exploded map-side, never driver loops.
- float thresholds are written with IDENTICAL expression shape on both
  engines so IEEE doubles agree bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import table
from . import query

# ---------------------------------------------------------------------------
# ntile + cume_dist deciles per segment (the W-family gap: rfm_quintiles
# covers GLOBAL qcut; this is the grouped decile rank). Window partitioned by
# c_mktsegment — shuffles once on the segment key; within-partition sort is
# the per-group cost, the documented funnel-shape when one group dominates
# (the range-partitioned rank in operators/ranks.py is the escape hatch,
# proven by quality_top_quartile).
# ---------------------------------------------------------------------------


@query(
    "segment_balance_deciles",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           ntile(10) OVER w AS bal_decile,
           round(cume_dist() OVER w, 6) AS bal_cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
)
def segment_balance_deciles(spark, sf_dir):
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(10).over(w).alias("bal_decile"),
            F.round(F.cume_dist().over(w), 6).alias("bal_cume"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Gap-filled daily resample — pandas ``resample('D').count()`` with explicit
# zeros, distributed: the (user × day) spine is a map-side sequence-explode
# over the distinct-user set (no driver loop), counts join onto it with
# zero-coalesce. The spine bounds are the global min/max event DAYS (two
# 1-row scalars — broadcast-sized by construction).
# ---------------------------------------------------------------------------


@query(
    "daily_purchases_gapfilled",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
      FROM events
    ),
    spine AS (
      SELECT u.user_id, CAST(g.d AS DATE) AS day
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN bounds
      CROSS JOIN unnest(generate_series(bounds.d0, bounds.d1,
                                        INTERVAL 1 DAY)) AS g(d)
    ),
    counts AS (
      SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_purchases
    FROM spine s LEFT JOIN counts c USING (user_id, day)
    ORDER BY s.user_id, s.day
    """,
)
def daily_purchases_gapfilled(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # spine bounds ride as a broadcast 1-row cross join (the oracle's
    # CROSS JOIN bounds, literally) — no eager .first() job
    bounds = F.broadcast(
        ev.agg(
            F.min(F.col("ts").cast("date")).alias("_d0"),
            F.max(F.col("ts").cast("date")).alias("_d1"),
        )
    )
    spine = (
        ev.select("user_id")
        .distinct()
        .crossJoin(bounds)
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("_d0"), F.col("_d1"), F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    counts = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        spine.join(counts, ["user_id", "day"], "left")
        .select(
            "user_id",
            # ISO string on both sides: date vs datetime64 round-trips
            # diverge in the compare layer, the calendar day does not
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_purchases"),
        )
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# Robust outlier report — median/MAD fences (the A15 z-score report's
# robust twin; 1.4826·MAD ≈ σ under normality, so 3σ ≡ 4.4478·MAD — the
# literal is pre-multiplied so both engines evaluate the SAME product shape).
# Two exact-median passes per group (percentile shuffles the group's values;
# at 100 TB swap approx_percentile like plans/quality.py documents), then one
# counting pass against the broadcast fences.
# ---------------------------------------------------------------------------


@query(
    "mad_outlier_report",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, m.med, median(abs(e.value - m.med)) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type, m.med
    )
    SELECT e.event_type,
           round(m.med, 4) AS med,
           round(m.mad, 4) AS mad,
           CAST(sum(CASE WHEN abs(e.value - m.med) > 4.4478 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           count(*) AS n
    FROM events e JOIN mad m USING (event_type)
    GROUP BY e.event_type, m.med, m.mad
    ORDER BY e.event_type
    """,
)
def mad_outlier_report(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        ev.join(med, "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
                "mad"
            )
        )
    )
    return (
        ev.join(mad, "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            # when/otherwise(0), not a bare boolean cast: a NULL value (or a
            # group whose values are ALL NULL) must count 0 like the
            # oracle's CASE...ELSE 0 — summing only NULL casts yields NULL
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(4.4478) * F.col("mad"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
            "n",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Burst coalescing (first-of-burst dedup): within (user, event_type), events
# closer than 60 s to their predecessor belong to the same burst; keep each
# burst's FIRST event. Gaps-and-islands — lag + cumulative flag, the same
# shape as sessionization, so it shuffles once on the (user, type) key.
# (This is islands-semantics: a burst extends while consecutive gaps stay
# under the threshold — distinct from recursive debounce-vs-last-kept.)
# ---------------------------------------------------------------------------

_BURST_GAP_US = 60 * 1_000_000


@query(
    "burst_first_events",
    oracle=f"""
    WITH flagged AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_BURST_GAP_US}
                  THEN 1 ELSE 0 END AS new_burst
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id)
    )
    SELECT event_id, user_id, event_type, ts_us
    FROM flagged WHERE new_burst = 1
    ORDER BY event_id
    """,
)
def burst_first_events(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    return (
        ev.withColumn(
            "_new",
            (prev.isNull() | ((F.col("ts_us") - prev) > _BURST_GAP_US)).cast(
                "int"
            ),
        )
        .filter(F.col("_new") == 1)
        .select("event_id", "user_id", "event_type", "ts_us")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Time-to-event: days from first signup to first subsequent purchase, rolled
# into a day-bucket histogram (the activation-latency curve). Integer
# epoch-micros arithmetic end-to-end — `div` on both engines, no float day
# fractions. One conditional-min aggregate per user, one global rollup.
# ---------------------------------------------------------------------------


@query(
    "signup_to_purchase_latency",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s_us,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
      FROM events GROUP BY user_id
    )
    SELECT CAST((p_us - s_us) // 86400000000 AS BIGINT) AS latency_days,
           count(*) AS n_users
    FROM stages
    WHERE s_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= s_us
    GROUP BY 1 ORDER BY 1
    """,
)
def signup_to_purchase_latency(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.unix_micros("ts"))
    )
    stages = ev.groupBy("user_id").agg(
        first_of("signup").alias("s_us"), first_of("purchase").alias("p_us")
    )
    return (
        stages.filter(
            F.col("s_us").isNotNull()
            & F.col("p_us").isNotNull()
            & (F.col("p_us") >= F.col("s_us"))
        )
        .groupBy(
            F.expr("(p_us - s_us) div 86400000000")
            .cast("long")
            .alias("latency_days")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("latency_days")
    )


# ---------------------------------------------------------------------------
# User-journey frequencies: each user's first five events as an ordered
# `a>b>c` path, counted across users (the funnel's free-form twin). The
# per-user top-5 is a partitioned row_number filter (one shuffle); the path
# assembles via sort_array(collect_list(struct(...))) — deterministic under
# the (ts, event_id) total order, never an unordered collect.
# ---------------------------------------------------------------------------


@query(
    "user_journey_frequencies",
    oracle="""
    WITH numbered AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ),
    journeys AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS journey
      FROM numbered WHERE rn <= 5
      GROUP BY user_id
    )
    SELECT journey, count(*) AS n_users
    FROM journeys GROUP BY journey
    ORDER BY n_users DESC, journey
    """,
)
def user_journey_frequencies(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc(), F.col("event_id").asc()
    )
    first5 = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("user_id", "rn", "event_type")
    )
    journeys = first5.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("journey")
    )
    return (
        journeys.groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "journey")
    )


# ---------------------------------------------------------------------------
# Source-mix entropy per language — the corpus-diversity metric curators read
# next to corpus_composition_report: Shannon entropy (nats) of the source
# distribution, plus the effective number of sources exp(H). Counts are
# exact integers; the float expression `(n/total)*ln(n/total)` has identical
# shape on both engines, summed over ≤ |sources| terms, rounded to 6.
# ---------------------------------------------------------------------------


@query(
    "source_entropy",
    oracle="""
    WITH counts AS (
      SELECT lang, source, count(*) AS n
      FROM documents GROUP BY lang, source
    ),
    totals AS (
      SELECT lang, sum(n) AS total, count(*) AS n_sources
      FROM counts GROUP BY lang
    )
    SELECT c.lang,
           CAST(t.n_sources AS BIGINT) AS n_sources,
           round(-sum((c.n / t.total) * ln(c.n / t.total)), 6) AS entropy_nats
    FROM counts c JOIN totals t USING (lang)
    GROUP BY c.lang, t.n_sources
    ORDER BY c.lang
    """,
)
def source_entropy(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("lang").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    p = F.col("n") / F.col("total")
    return (
        counts.join(totals, "lang")
        .groupBy("lang", "n_sources")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"))
        .select(
            "lang", F.col("n_sources").cast("long").alias("n_sources"),
            "entropy_nats",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Equal-width histogram of the value column (the distribution_report's
# numeric companion): 20 bins over the global [min, max], last bin
# right-closed via least(). Bin index arithmetic `(value - mn) / w` keeps the
# same expression shape on both engines; min/max are one 1-row scalar scan
# broadcast into the binning pass.
# ---------------------------------------------------------------------------

_HIST_BINS = 20


@query(
    "value_histogram",
    oracle=f"""
    WITH bounds AS (
      SELECT min(value) AS mn,
             (max(value) - min(value)) / {_HIST_BINS} AS w
      FROM events
    )
    SELECT CAST(least(floor((e.value - b.mn) / b.w),
                      {_HIST_BINS - 1}) AS BIGINT) AS bin,
           count(*) AS n
    FROM events e CROSS JOIN bounds b
    GROUP BY 1 ORDER BY 1
    """,
)
def value_histogram(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # bounds ride as a broadcast 1-row cross join (the oracle's CROSS JOIN
    # bounds, literally; same (mx-mn)/bins expression shape) — no eager job
    bounds = F.broadcast(
        ev.agg(
            F.min("value").alias("_mn"),
            ((F.max("value") - F.min("value")) / _HIST_BINS).alias("_w"),
        )
    )
    return (
        ev.crossJoin(bounds)
        .groupBy(
            F.least(
                F.floor((F.col("value") - F.col("_mn")) / F.col("_w")),
                F.lit(_HIST_BINS - 1),
            )
            .cast("long")
            .alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Collation-aware matching (Spark 4 collations): the predicate compares
# under UTF8_LCASE — collation-aware equality pushed through the plan as a
# first-class string property, not an ad-hoc lower() rewrite at every call
# site (the engine tier for locale/case rules; the oracle dialect spells
# the same semantics with lower()). Mixed-case literal on purpose.
# ---------------------------------------------------------------------------


@query(
    "collated_source_counts",
    oracle="""
    SELECT lang, count(*) AS n
    FROM documents
    WHERE lower(source) = lower('SRC1')
    GROUP BY lang ORDER BY lang
    """,
)
def collated_source_counts(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.filter(
            F.collate(F.col("source"), "UTF8_LCASE") == F.lit("SRC1")
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Forward fill — pandas ``ffill()`` per user over event time: carry the last
# non-null observation forward. The fixture nullifies 'error' readings
# (deterministically, both engines) so the fill path is non-vacuous. One
# partitioned window (single shuffle on user_id); ``last(ignorenulls=True)``
# over ROWS UNBOUNDED PRECEDING is the exact distributed transcription.
# ---------------------------------------------------------------------------


@query(
    "forward_fill_values",
    oracle="""
    WITH masked AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT user_id, event_id,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS UNBOUNDED PRECEDING), 4) AS v_filled
    FROM masked
    ORDER BY event_id
    """,
)
def forward_fill_values(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    masked = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        masked.select(
            "user_id",
            "event_id",
            F.round(F.last("v", ignorenulls=True).over(w), 4).alias("v_filled"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average — pandas ``ewm(alpha=.5).mean()``
# (adjust=True), distributed. The recursion is re-expressed as two prefix
# sums under the per-user (day, row) order:
#     ema_t = (1-a)^t · Σ_{i≤t} x_i·(1-a)^{-i}  /  (1-a)^t · Σ_{i≤t} (1-a)^{-i}
# so it's one partitioned window (single shuffle on user_id), no recursion,
# no UDF. alpha = 0.5 makes every decay weight an exact power of two, so the
# only float freedom is prefix-sum order — identical (sequential per
# partition) on both engines; output rounded to 4 regardless.
# Numerical domain: (1-a)^(-t) overflows double at t ≥ 1024 steps per key
# (≈3 years of daily points) — beyond that this closed form goes inf/inf
# on BOTH engines (parity holds, values don't). The production form for
# unbounded series renormalizes per fixed-size chunk: carry the chunk's
# trailing EMA as the next chunk's seed, so exponents reset every chunk.
# ---------------------------------------------------------------------------


@query(
    "ewm_user_value",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, sum(value) AS x
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    idx AS (
      SELECT user_id, day, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS t
      FROM daily
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           round(
             (power(0.5, t) * sum(x * power(0.5, -t)) OVER w)
             / (power(0.5, t) * sum(power(0.5, -t)) OVER w), 4) AS ewm_value
    FROM idx
    WINDOW w AS (PARTITION BY user_id ORDER BY t
                 ROWS UNBOUNDED PRECEDING)
    ORDER BY user_id, day
    """,
)
def ewm_user_value(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum("value").alias("x"))
    )
    order_w = Window.partitionBy("user_id").orderBy("day")
    idx = daily.withColumn("t", F.row_number().over(order_w) - 1)
    cum_w = order_w.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    decay = F.pow(F.lit(0.5), F.col("t"))
    inv = F.pow(F.lit(0.5), -F.col("t"))
    return (
        idx.select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(
                (decay * F.sum(F.col("x") * inv).over(cum_w))
                / (decay * F.sum(inv).over(cum_w)),
                4,
            ).alias("ewm_value"),
        )
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over event types — the journey
# model behind the funnel: P(next = b | current = a) per user-adjacent event
# pairs. lag per (user) stream (one shuffle), then a tiny (k×k) rollup;
# probabilities are exact-count ratios rounded identically on both engines.
# ---------------------------------------------------------------------------


@query(
    "event_transition_matrix",
    oracle="""
    WITH pairs AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id)
               AS from_type,
             event_type AS to_type
      FROM events
    ),
    counts AS (
      SELECT from_type, to_type, count(*) AS n
      FROM pairs WHERE from_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6)
             AS p
    FROM counts
    ORDER BY from_type, to_type
    """,
)
def event_transition_matrix(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc(), F.col("event_id").asc()
    )
    pairs = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_w = Window.partitionBy("from_type")
    return (
        counts.select(
            "from_type",
            "to_type",
            "n",
            F.round(
                F.col("n") / F.sum("n").over(row_w).cast("double"), 6
            ).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# Time-weighted average value per user (TWAP): each reading holds until the
# next one, so its weight is that interval in micros (the last reading gets
# no forward interval and drops out — standard left-Riemann TWAP). Integer
# interval weights; one lead window per user stream, one aggregate.
# ---------------------------------------------------------------------------


@query(
    "time_weighted_average",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS ts_us,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
               AS next_us
      FROM events
    )
    SELECT user_id,
           round(sum(value * (next_us - ts_us)) / CAST(sum(next_us - ts_us)
                 AS DOUBLE), 4) AS twap
    FROM seq WHERE next_us IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def time_weighted_average(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("ts_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dt = F.col("next_us") - F.col("ts_us")
    return (
        seq.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * dt) / F.sum(dt).cast("double"), 4
            ).alias("twap")
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Null-safe join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH each other —
# the semantics a plain equi-join silently drops. The fixture nullifies one
# segment so the null-key path is non-vacuous; the join stays a hash join
# (null-safe equality is still an equi-key for the planner).
# ---------------------------------------------------------------------------


@query(
    "null_safe_segment_join",
    oracle="""
    WITH c AS (
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
      FROM customer
    ),
    s AS (
      SELECT nullif(seg, 'x') AS seg, count(*) AS seg_total
      FROM c GROUP BY 1
    )
    SELECT c.c_custkey, c.seg, s.seg_total
    FROM c JOIN s ON c.seg IS NOT DISTINCT FROM s.seg
    ORDER BY c.c_custkey
    """,
)
def null_safe_segment_join(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
    )
    totals = cust.groupBy("seg").agg(F.count(F.lit(1)).alias("seg_total"))
    return (
        cust.alias("c")
        .join(
            totals.alias("s"),
            F.col("c.seg").eqNullSafe(F.col("s.seg")),
        )
        .select("c.c_custkey", "c.seg", "s.seg_total")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Longest consecutive-day purchase streak per user — gaps-and-islands at DAY
# granularity (distinct from the micro-gap burst/session ops): day_index −
# row_number is constant within a run of consecutive days. One shuffle on
# user_id; integer day indexes (epoch days) on both engines.
# ---------------------------------------------------------------------------


@query(
    "purchase_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
      FROM events WHERE event_type = 'purchase'
    ),
    runs AS (
      SELECT user_id, d,
             d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, count(*) AS len FROM runs GROUP BY user_id, grp
    )
    SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak_days,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id ORDER BY user_id
    """,
)
def purchase_streaks(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    days = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").cast("long").alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    runs = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    streaks = runs.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("longest_streak_days"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Rolling 7-day active users — the distinct-count-over-sliding-window
# problem. A windowed count(DISTINCT) cannot merge from daily distincts, so
# the scale shape is: dedup to (user, day) pairs, then explode each pair to
# the ≤7 window-end days it contributes to (a BOUNDED ×7 map-side fan-out),
# then one count-distinct shuffle per target day. No day×user cross join,
# no re-scan per window position. (The sketch alternative — sliding HLL —
# trades exactness for a ×1 fan-out; this is the exact tier.)
# ---------------------------------------------------------------------------


@query(
    "rolling_7d_active_users",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
      FROM events
    ),
    bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM pairs),
    contrib AS (
      SELECT p.user_id, p.d + g.k AS target_d
      FROM pairs p
      CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k) g
      CROSS JOIN bounds b
      WHERE p.d + g.k <= b.d1
    )
    SELECT target_d AS d,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
    FROM contrib GROUP BY target_d ORDER BY target_d
    """,
)
def rolling_7d_active_users(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").cast("long").alias("d"),
    ).distinct()
    # the horizon rides as a broadcast 1-row cross join (the oracle's
    # CROSS JOIN bounds, literally) — no eager .first() job
    horizon = F.broadcast(pairs.agg(F.max("d").alias("_d1")))
    contrib = (
        pairs.crossJoin(horizon)
        .select(
            "user_id",
            "_d1",
            F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("target_d"),
        )
        .filter(F.col("target_d") <= F.col("_d1"))
    )
    return (
        contrib.groupBy(F.col("target_d").alias("d"))
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Month-over-month revenue change — the KPI-trend frame: monthly purchase
# revenue, previous month via lag over the month-index order, percent change
# guarded against a zero base. The windowed frame is months-sized
# (metadata), so the global order is harmless — the heavy lifting is the
# one partial-aggregating shuffle from events to months.
# ---------------------------------------------------------------------------


@query(
    "monthly_revenue_mom",
    oracle="""
    WITH monthly AS (
      SELECT (year(ts) * 12 + month(ts)) AS m_idx,
             round(sum(value), 4) AS revenue
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    )
    SELECT m_idx, revenue,
           round(CASE WHEN lag(revenue) OVER (ORDER BY m_idx) = 0 THEN NULL
                 ELSE (revenue - lag(revenue) OVER (ORDER BY m_idx))
                      / lag(revenue) OVER (ORDER BY m_idx) END, 6)
             AS mom_change
    FROM monthly ORDER BY m_idx
    """,
)
def monthly_revenue_mom(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    monthly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy((F.year("ts") * 12 + F.month("ts")).alias("m_idx"))
        .agg(F.round(F.sum("value"), 4).alias("revenue"))
    )
    w = Window.orderBy("m_idx")  # months-sized frame: global order is cheap
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "m_idx",
        "revenue",
        F.round(
            F.when(prev == 0, F.lit(None)).otherwise(
                (F.col("revenue") - prev) / prev
            ),
            6,
        ).alias("mom_change"),
    ).orderBy("m_idx")


# ---------------------------------------------------------------------------
# First vs second purchase per user — first_value / nth_value over the full
# per-user frame (the remaining frame-function family): the repeat-purchase
# comparison behind activation analyses. One shuffle on user_id; DISTINCT
# collapses the per-row window output to one row per user.
# ---------------------------------------------------------------------------


@query(
    "first_second_purchase",
    oracle="""
    WITH p AS (
      SELECT user_id, value, epoch_us(ts) AS ts_us, event_id
      FROM events WHERE event_type = 'purchase'
    )
    SELECT DISTINCT user_id,
           round(first_value(value) OVER w, 4) AS first_value_amt,
           round(nth_value(value, 2) OVER w, 4) AS second_value_amt
    FROM p
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
)
def first_second_purchase(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        p.select(
            "user_id",
            F.round(F.first("value").over(w), 4).alias("first_value_amt"),
            F.round(F.nth_value("value", 2).over(w), 4).alias(
                "second_value_amt"
            ),
        )
        .distinct()
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Linear interpolation of missing readings — pandas
# ``interpolate(method='time' / 'index')`` per user: each null blends its
# nearest non-null neighbors, weighted by event-time distance; leading
# nulls backfill from the next anchor, trailing nulls carry the previous
# one (ffill/bfill at the edges, like pandas limit_direction='both').
# Distributed form: prev anchor = last(ignorenulls) over the backward
# frame, next anchor = first(ignorenulls) over the forward frame — one
# shuffle on user_id, two frames, no recursion. The blend expression has
# identical shape on both engines; output rounded to 4.
# ---------------------------------------------------------------------------


@query(
    "interpolated_values",
    oracle="""
    WITH masked AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    ),
    anchored AS (
      SELECT user_id, event_id, ts_us, v,
             last_value(v IGNORE NULLS) OVER w_back AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
               OVER w_back AS pt,
             first_value(v IGNORE NULLS) OVER w_fwd AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
               OVER w_fwd AS nt
      FROM masked
      WINDOW
        w_back AS (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_fwd AS (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * ((ts_us - pt) / CAST(nt - pt AS DOUBLE))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv END, 4) AS v_interp
    FROM anchored
    ORDER BY event_id
    """,
)
def interpolated_values(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    masked = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    base = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    vt = F.when(F.col("v").isNotNull(), F.col("ts_us"))
    anchored = masked.select(
        "user_id",
        "event_id",
        "ts_us",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(vt, ignorenulls=True).over(w_back).alias("pt"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(vt, ignorenulls=True).over(w_fwd).alias("nt"),
    )
    blend = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("ts_us") - F.col("pt"))
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    return (
        anchored.select(
            "user_id",
            "event_id",
            F.round(
                F.when(F.col("v").isNotNull(), F.col("v"))
                .when(
                    F.col("pv").isNotNull() & F.col("nv").isNotNull(), blend
                )
                .when(F.col("pv").isNotNull(), F.col("pv"))
                .otherwise(F.col("nv")),
                4,
            ).alias("v_interp"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Weekday seasonality profile — event volume and purchase revenue by day of
# week. Day-of-week numbering differs across engines (Spark dayofweek:
# 1=Sunday; the oracle dialect's dayofweek: 0=Sunday), so BOTH sides emit
# ISO day names and sort by an explicit Monday-first index — the semantic,
# not the engine encoding, is the contract.
# ---------------------------------------------------------------------------


@query(
    "weekday_seasonality",
    oracle="""
    SELECT strftime(ts, '%A') AS weekday,
           CAST(isodow(ts) AS BIGINT) AS iso_dow,
           count(*) AS n_events,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END),
                 4) AS purchase_revenue
    FROM events
    GROUP BY 1, 2 ORDER BY iso_dow
    """,
)
def weekday_seasonality(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format("ts", "EEEE").alias("weekday"),
            # ISO day-of-week, Monday=1: Spark's dayofweek is Sunday=1
            F.expr("(dayofweek(ts) + 5) % 7 + 1").cast("long").alias("iso_dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase", F.col("value")
                    ).otherwise(0.0)
                ),
                4,
            ).alias("purchase_revenue"),
        )
        .orderBy("iso_dow")
    )


# ---------------------------------------------------------------------------
# Purchase inter-arrival regularity — the churn-salient cadence feature:
# per user, the mean/std/max of gaps between consecutive purchases (hours).
# Irregular cadence (high std relative to mean) is a disengagement signal
# the RFM recency number alone misses. One lag window per user stream, one
# aggregate; integer micros → float hours only at the output.
# ---------------------------------------------------------------------------


@query(
    "purchase_cadence",
    oracle="""
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT user_id,
             (ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id))
               / 3600000000.0 AS gap_h
      FROM p
    )
    SELECT user_id,
           CAST(count(gap_h) AS BIGINT) AS n_gaps,
           round(avg(gap_h), 4) AS mean_gap_h,
           round(stddev_samp(gap_h), 4) AS std_gap_h,
           round(max(gap_h), 4) AS max_gap_h
    FROM gaps
    WHERE gap_h IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def purchase_cadence(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = p.select(
        "user_id",
        (
            (F.col("ts_us") - F.lag("ts_us").over(w)) / F.lit(3600000000.0)
        ).alias("gap_h"),
    ).filter(F.col("gap_h").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_h").alias("n_gaps"),
            F.round(F.avg("gap_h"), 4).alias("mean_gap_h"),
            F.round(F.stddev_samp("gap_h"), 4).alias("std_gap_h"),
            F.round(F.max("gap_h"), 4).alias("max_gap_h"),
        )
        .orderBy("user_id")
    )


# Seasonal anomaly detection: per-(event_type, hour-of-day) value baseline
# (the seasonality cell), events flagged where |value - cell mean| > 3σ.
# One fused agg over the fact builds the cell-stats frame (types × 24 rows,
# broadcast); the flag pass is map-only — the same two-scan shape as the
# z-score outlier report, but seasonally conditioned.


@query(
    "seasonal_value_anomalies",
    oracle="""
    WITH ev AS (
      SELECT event_id, event_type, CAST(hour(ts) AS BIGINT) AS hr, value,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    cells AS (
      SELECT event_type, hr,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(c) AS HUGEINT) AS s,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
      FROM ev GROUP BY event_type, hr
    )
    SELECT e.event_id, e.event_type, e.hr, e.value,
           round(cells.s / 100.0 / cells.n, 4) AS cell_mean,
           round((cells.n * e.c - cells.s) * 1.0
                 / sqrt((cells.n * cells.s2 - cells.s * cells.s) * 1.0), 4)
             AS zscore
    FROM ev e
    JOIN cells ON e.event_type = cells.event_type AND e.hr = cells.hr
    WHERE cells.n * cells.s2 > cells.s * cells.s
      AND (cells.n * e.c - cells.s) * (cells.n * e.c - cells.s)
          > 9 * (cells.n * cells.s2 - cells.s * cells.s)
    ORDER BY e.event_id
    """,
)
def seasonal_value_anomalies(spark, sf_dir):
    # membership is decided in EXACT integer arithmetic over cents moments —
    # (n·x − S)² > 9·(n·S2 − S²) is |x − μ| > 3σ cross-multiplied — so the
    # flagged row set is bit-identical on any engine/partitioning (a float
    # |x−μ| > 3σ boundary flips rows that land within an ulp of the cutoff);
    # only the DISPLAYED mean/z-score are floats, rounded on both sides.
    # decimal(38,0) == the oracle's HUGEINT: the squared terms pass 2^63
    # once a cell holds ~billions of events. Exactness holds up to the
    # decimal(38,0) ceiling — |n·x − S| < 10^19 and n·S2 − S² < 10^37 —
    # roughly 10^12 events/cell at 10^7-cent values; in non-ANSI mode Spark
    # NULLs an overflowing decimal product (which a bare filter would
    # silently drop), so the filter raises loudly past those magnitudes
    # instead of quietly missing anomalies.
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.hour("ts").cast("long").alias("hr"),
        "value",
        # NULL c for NULL/NaN values: the oracle's NULL comparisons exclude
        # such rows from membership (they still count in n via count(*));
        # without the guard Spark would cast NaN to 0 cents and a NULL value
        # would later masquerade as a decimal overflow.
        F.when(
            F.col("value").isNotNull() & ~F.isnan("value"),
            F.round(F.col("value") * 100).cast("long"),
        ).alias("c"),
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    cells = ev.groupBy("event_type", "hr").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("s"),
        F.sum(dec(F.col("c")) * F.col("c")).alias("s2"),
    )
    dev = F.col("n") * F.col("c") - F.col("s")          # n·x − S
    var_num = F.col("n") * F.col("s2") - F.col("s") * F.col("s")  # n²σ²... (n·S2 − S²)
    # On a non-null c row, n is never null and s/s2 include this row's c, so
    # a NULL dev or var_num can only mean a decimal(38,0) product overflowed
    # (n·c, n·S2, or S²); the magnitude bounds keep the SQUARED terms below
    # 10^38 too. NULL-c rows (NULL/NaN value) are excluded from the overflow
    # test — they drop out of membership like the oracle's NULL comparisons.
    import decimal

    # 10^19 exceeds a JVM long, so the bounds ride in as Decimal literals
    dec38 = lambda v: F.lit(decimal.Decimal(v)).cast("decimal(38,0)")  # noqa: E731
    overflow = F.col("c").isNotNull() & (
        dev.isNull()
        | var_num.isNull()
        | (F.abs(dev) >= dec38(10**19))
        | (var_num >= dec38(10**37))
    )
    return (
        ev.join(F.broadcast(cells), ["event_type", "hr"])
        .filter(
            F.when(
                overflow,
                F.raise_error(
                    F.lit(
                        "seasonal_value_anomalies: cell moments exceed the "
                        "decimal(38,0) exact-integer range — the 3σ membership "
                        "test would silently drop rows; shard the cell or "
                        "rescale the value unit"
                    )
                ).cast("boolean"),
            ).otherwise((var_num > 0) & (dev * dev > 9 * var_num))
        )
        .select(
            "event_id",
            "event_type",
            "hr",
            "value",
            F.round(
                (F.col("s") / 100.0 / F.col("n")).cast("double"), 4
            ).alias("cell_mean"),
            F.round(
                dev.cast("double") / F.sqrt(var_num.cast("double")), 4
            ).alias("zscore"),
        )
        .orderBy("event_id")
    )


# New-vs-returning split per day: a user's first-ever event day marks them
# new that day, returning after. First-seen days come from one groupBy
# (min event time per user); the daily split is a second groupBy — no
# window over the fact.


@query(
    "new_vs_returning_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS first_day FROM events
      GROUP BY user_id
    ),
    daily AS (
      SELECT CAST(e.ts AS DATE) AS day, e.user_id,
             max(CASE WHEN CAST(e.ts AS DATE) = f.first_day THEN 1 ELSE 0 END)
               AS is_new
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      GROUP BY CAST(e.ts AS DATE), e.user_id
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(sum(is_new) AS BIGINT) AS new_users,
           CAST(sum(1 - is_new) AS BIGINT) AS returning_users
    FROM daily GROUP BY day ORDER BY day
    """,
)
def new_vs_returning_users(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "ts"
    )
    firsts = ev.groupBy("user_id").agg(F.to_date(F.min("ts")).alias("first_day"))
    daily = (
        ev.join(firsts, "user_id")
        .groupBy("day", "user_id")
        .agg(
            F.max((F.col("day") == F.col("first_day")).cast("int")).alias(
                "is_new"
            )
        )
    )
    return (
        daily.groupBy("day")
        .agg(
            F.sum("is_new").alias("new_users"),
            F.sum(1 - F.col("is_new")).alias("returning_users"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "new_users",
            "returning_users",
        )
        .orderBy("day")
    )


# Engagement stickiness: daily actives vs the month's actives (DAU/MAU).
# Month actives come from one distinct-count groupBy; each day joins its
# month row — the dashboard's stickiness ratio without a sliding window.


@query(
    "dau_mau_stickiness",
    oracle="""
    WITH dau AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    mau AS (
      SELECT date_trunc('month', CAST(ts AS DATE)) AS month,
             CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM events GROUP BY date_trunc('month', CAST(ts AS DATE))
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, m.mau,
           round(d.dau * 1.0 / m.mau, 4) AS stickiness
    FROM dau d JOIN mau m ON date_trunc('month', d.day) = m.month
    ORDER BY d.day
    """,
)
def dau_mau_stickiness(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    dau = ev.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    mau = (
        ev.select(F.trunc("day", "month").alias("month"), "user_id")
        .groupBy("month")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.withColumn("month", F.trunc("day", "month"))
        .join(F.broadcast(mau), "month")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "mau",
            F.round(F.col("dau") / F.col("mau"), 4).alias("stickiness"),
        )
        .orderBy("day")
    )


# Cumulative unique users (the growth curve): each user counts once, on
# their first-seen day; the running total is a cumsum over the days frame
# (calendar-sized — the global window is metadata-cheap).


@query(
    "cumulative_unique_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS day FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM firsts GROUP BY day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS total_users
    FROM daily ORDER BY day
    """,
)
def cumulative_unique_users(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.to_date(F.min("ts")).alias("day"))
    daily = firsts.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("total_users", F.sum("new_users").over(w))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "new_users",
            "total_users",
        )
        .orderBy("day")
    )


# Pareto / ABC classification: customers sorted by revenue descending,
# classed by inclusive cumulative revenue share (A <= 80%, B <= 95%, C).
# Revenue in integer cents so the distributed cumsum is EXACT and
# order-independent; the running sum itself is the range-partitioned
# two-pass form — no single-task window over the customer frame.


@query(
    "abc_customer_classes",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    c AS (
      SELECT o_custkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cents) OVER () AS tot
      FROM rev
    )
    SELECT o_custkey,
           round(cents / 100.0, 2) AS revenue,
           round(cum * 1.0 / tot, 6) AS cum_share,
           CASE WHEN cum * 20 <= tot * 16 THEN 'A'
                WHEN cum * 20 <= tot * 19 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c ORDER BY o_custkey
    """,
)
def abc_customer_classes(spark, sf_dir):
    from ..operators.ranks import global_cumsum_distributed

    orders = table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    cum = global_cumsum_distributed(
        rev, [("cents", "desc"), "o_custkey"], "cents", out="cum"
    )
    tot = rev.agg(F.sum("cents").alias("tot"))
    # integer cutoff compare (cum/tot <= 0.8 === cum*20 <= tot*16): no float
    # boundary, bit-identical classes on any engine
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "o_custkey",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("cum") / F.col("tot"), 6).alias("cum_share"),
            F.when(F.col("cum") * 20 <= F.col("tot") * 16, "A")
            .when(F.col("cum") * 20 <= F.col("tot") * 19, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .orderBy("o_custkey")
    )


# Revenue concentration (Gini): the single-number inequality metric next to
# the ABC report. G = 2·Σ(rank·x) / (n·Σx) − (n+1)/n over per-customer
# revenue sorted ascending — revenue in integer cents and the rank from the
# range-partitioned two-pass form, so every term before the final division
# is exact integer arithmetic on any engine.


@query(
    "revenue_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS rk
      FROM rev
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(cents) / 100.0, 2) AS total_revenue,
           round(2.0 * sum(CAST(rk AS HUGEINT) * cents)
                 / (count(*) * CAST(sum(cents) AS HUGEINT))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked
    """,
)
def revenue_gini(spark, sf_dir):
    from ..operators.ranks import global_rank_distributed

    orders = table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked = global_rank_distributed(
        rev, [F.col("cents"), F.col("o_custkey")], rank_col="rk"
    )
    # rank*cents sums pass 2^63 around sf10 — accumulate in decimal(38,0)
    # (the oracle's HUGEINT), exact at any corpus size
    return ranked.agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("cents") / 100.0, 2).alias("total_revenue"),
        F.round(
            (
                2.0
                * F.sum(F.col("rk").cast("decimal(38,0)") * F.col("cents"))
                / (F.count("*") * F.sum(F.col("cents").cast("decimal(38,0)")))
                - (F.count("*") + 1.0) / F.count("*")
            ).cast("double"),
            6,
        ).alias("gini"),
    )


# Repeat-purchase rate: the loyalty KPI — among users with any purchase,
# the share with two or more. One conditional aggregate over per-user
# purchase counts; integer ratio rounded identically on both engines.


@query(
    "repeat_purchase_rate",
    oracle="""
    WITH counts AS (
      SELECT user_id, count(*) AS n FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS purchasers,
           CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS repeat_purchasers,
           round(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS repeat_rate
    FROM counts
    """,
)
def repeat_purchase_rate(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    counts = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    return counts.agg(
        F.count("*").alias("purchasers"),
        F.sum((F.col("n") >= 2).cast("int")).alias("repeat_purchasers"),
        F.round(
            F.sum((F.col("n") >= 2).cast("int")) / F.count("*"), 6
        ).alias("repeat_rate"),
    )


# Sketch tier of the rolling 7-day actives: per-day HLL sketches (one
# groupBy over the fact), then each day unions its trailing week's sketches
# — the merge joins DAY-frames (calendar-sized), never re-touching events.
# At 100 TB this replaces the exact tier's ×7 row fan-out with 7 sketch
# merges per day; approximate by construction -> rows-only (no oracle), the
# exact twin `rolling_7d_active_users` carries the hash contract, and the
# pytest asserts the estimate lands within HLL tolerance of it.


@query("rolling_7d_active_users_hll")
def rolling_7d_active_users_hll(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 86400000000").cast("long").alias("d"),
        "user_id",
    )
    daily = ev.groupBy("d").agg(F.hll_sketch_agg("user_id").alias("_hll"))
    a = daily.select(F.col("d").alias("target_d"))
    return (
        a.join(
            daily,
            (F.col("d") <= F.col("target_d"))
            & (F.col("d") >= F.col("target_d") - 6),
        )
        .groupBy(F.col("target_d").alias("d"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("_hll")).alias(
                "active_7d_approx"
            )
        )
        .orderBy("d")
    )


# 7-day trailing moving average of daily revenue — the smoothed KPI line
# next to the MoM trend: one events->days aggregation (integer cents), then
# a day-range frame over the calendar-sized series.


@query(
    "daily_revenue_7d_ma",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY CAST(ts AS DATE)
    ),
    win AS (
      SELECT day, cents,
             sum(cents) OVER (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY
                              PRECEDING AND CURRENT ROW) AS w_cents,
             count(*) OVER (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY
                            PRECEDING AND CURRENT ROW) AS w_days
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(cents / 100.0, 2) AS revenue,
           round(w_cents / 100.0 / w_days, 4) AS ma_7d
    FROM win ORDER BY day
    """,
)
def daily_revenue_7d_ma(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    # integer epoch-day ordering key -> exact 6-day RANGE frame; the series
    # is calendar-sized, so the global window is metadata-cheap
    keyed = daily.withColumn(
        "_d", F.datediff("day", F.lit("1970-01-01")).cast("long")
    )
    w = Window.orderBy("_d").rangeBetween(-6, 0)
    return (
        keyed.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(
                F.sum("cents").over(w) / 100.0 / F.count("*").over(w), 4
            ).alias("ma_7d"),
        )
        .orderBy("day")
    )
