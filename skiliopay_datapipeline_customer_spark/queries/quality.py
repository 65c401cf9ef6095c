"""Data-quality check queries (SURVEY.md §2.9: V3-V9 as metric queries).

The reference's quality checker loops per column (src/processing/
data_quality.py); here every report is ONE fused multi-aggregate pass over
the table — the shape that survives 100 TB (one scan, partial aggregation
map-side, tiny result).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from . import query

# V4 completeness report (data_quality.py:60-89): per-column null rates in a
# single agg.


@query(
    "completeness_report",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS null_rate_status,
           round(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS null_rate_price,
           round(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS null_rate_date
    FROM orders
    """,
)
def completeness_report(spark, sf_dir):
    def null_rate(c):
        return F.round(F.sum(F.col(c).isNull().cast("int")) * 1.0 / F.count("*"), 6)

    return table(spark, sf_dir, "orders").agg(
        F.count("*").alias("n_rows"),
        null_rate("o_orderstatus").alias("null_rate_status"),
        null_rate("o_totalprice").alias("null_rate_price"),
        null_rate("o_orderdate").alias("null_rate_date"),
    )


# V5 uniqueness report (data_quality.py:92-136): key uniqueness + dup-row rate.


@query(
    "uniqueness_report",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_keys,
           round(count(DISTINCT o_orderkey) * 1.0 / count(*), 6) AS key_uniqueness
    FROM orders
    """,
)
def uniqueness_report(spark, sf_dir):
    return table(spark, sf_dir, "orders").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.round(F.countDistinct("o_orderkey") * 1.0 / F.count("*"), 6).alias(
            "key_uniqueness"
        ),
    )


# V6 validity report (data_quality.py:139-201): rule-violation counts in one
# pass (range, enum, non-negativity — the reference's age/label/gmv checks).


@query(
    "validity_report",
    oracle="""
    SELECT
      CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
      CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS bad_discount,
      CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
      CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT)
        AS bad_flag,
      count(*) AS n_rows
    FROM lineitem
    """,
)
def validity_report(spark, sf_dir):
    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    return l.agg(
        viol(F.col("l_quantity") <= 0).alias("bad_quantity"),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("bad_discount"),
        viol(F.col("l_extendedprice") < 0).alias("bad_price"),
        viol(~F.col("l_returnflag").isin("A", "N", "R")).alias("bad_flag"),
        F.count("*").alias("n_rows"),
    )


# V7 consistency report (data_quality.py:210-266): column-vs-column invariants
# — here the lineitem-vs-orders reconciliation |sum(lines) - o_totalprice|.


@query(
    "consistency_report",
    oracle="""
    SELECT count(*) AS n_orders,
           CAST(sum(CASE WHEN abs(line_total - o_totalprice) > 0.01 THEN 1 ELSE 0 END)
                AS BIGINT) AS inconsistent_orders
    FROM (
      SELECT o.o_orderkey, o.o_totalprice,
             sum(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax)) AS line_total
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice
    )
    """,
)
def consistency_report(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    per_order = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("line_total")
        )
    )
    return per_order.agg(
        F.count("*").alias("n_orders"),
        F.sum(
            F.when(F.abs(F.col("line_total") - F.col("o_totalprice")) > 0.01, 1).otherwise(0)
        ).alias("inconsistent_orders"),
    )


# V8 outlier report (data_quality.py:269-314): IQR-fence outlier rate per
# column — exact percentiles + one conditional-sum pass.


@query(
    "outlier_report",
    oracle="""
    WITH fences AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders
    )
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN o_totalprice < q1 - 1.5 * (q3 - q1)
                      OR o_totalprice > q3 + 1.5 * (q3 - q1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(sum(CASE WHEN o_totalprice < q1 - 1.5 * (q3 - q1)
                            OR o_totalprice > q3 + 1.5 * (q3 - q1)
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS outlier_rate
    FROM orders, fences
    """,
)
def outlier_report(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    fences = orders.agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("o_totalprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("o_totalprice") > F.col("q3") + 1.5 * iqr
    )
    return (
        orders.crossJoin(F.broadcast(fences))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
            F.round(
                F.sum(F.when(is_out, 1).otherwise(0)) * 1.0 / F.count("*"), 6
            ).alias("outlier_rate"),
        )
    )


# V9 distribution report (data_quality.py:317-357): class balance + dominance.


@query(
    "distribution_report",
    oracle="""
    SELECT round(sum(CASE WHEN o_orderstatus = 'F' THEN seg_cnt ELSE 0 END) * 1.0
                 / sum(seg_cnt), 6) AS f_share,
           round(max(seg_cnt) * 1.0 / sum(seg_cnt), 6) AS top_status_share
    FROM (
      SELECT o_orderstatus, count(*) AS seg_cnt FROM orders GROUP BY o_orderstatus
    )
    """,
)
def distribution_report(spark, sf_dir):
    counts = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("seg_cnt"))
    )
    return counts.agg(
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "F", F.col("seg_cnt")).otherwise(0))
            * 1.0
            / F.sum("seg_cnt"),
            6,
        ).alias("f_share"),
        F.round(F.max("seg_cnt") * 1.0 / F.sum("seg_cnt"), 6).alias("top_status_share"),
    )


# V3-V7 raw metric probe as ONE declared row — the integer counts the
# composite gate (plans/quality.py) weighs: row/key/distinct-row counts,
# per-column null counts, validity violations, consistency violations.
# All integers → no float-rounding risk in the hash compare.


@query(
    "quality_metrics_probe",
    oracle="""
    SELECT m.n_rows, m.n_keys, d.n_distinct_rows,
           m.null_custkeys, m.neg_price, m.bad_status, m.date_after_2002
    FROM (
      SELECT count(*) AS n_rows,
             count(DISTINCT o_orderkey) AS n_keys,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_custkeys,
             CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS neg_price,
             CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
               AS BIGINT) AS bad_status,
             CAST(sum(CASE WHEN o_orderdate > TIMESTAMP '2002-01-01' THEN 1 ELSE 0 END)
               AS BIGINT) AS date_after_2002
      FROM orders
    ) m
    CROSS JOIN (
      SELECT count(*) AS n_distinct_rows FROM (SELECT DISTINCT * FROM orders)
    ) d
    """,
)
def quality_metrics_probe(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    base = orders.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(F.col("o_custkey").isNull().cast("int")).alias("null_custkeys"),
        F.sum((F.col("o_totalprice") < 0).cast("int")).alias("neg_price"),
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("int")).alias(
            "bad_status"
        ),
        F.sum(
            (F.col("o_orderdate") > F.lit("2002-01-01").cast("timestamp")).cast("int")
        ).alias("date_after_2002"),
    )
    n_distinct = orders.dropDuplicates().agg(
        F.count("*").alias("n_distinct_rows")
    )
    return base.crossJoin(n_distinct)


# The 100 TB profiler tier as a concrete query: sketch-based statistics
# (HLL distinct via datasketches, t-digest percentiles). Approximate by
# design → rows-only check; the exact twins above carry the oracles.


@query("profile_sketches")
def profile_sketches(spark, sf_dir):
    lineitem = table(spark, sf_dir, "lineitem")
    per_flag = lineitem.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("_hll"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10_000)).alias(
            "median_price_approx"
        ),
        F.approx_count_distinct("l_suppkey").alias("suppliers_approx"),
    )
    # sketches MERGE across groups — the property that makes them the
    # distributed profiling primitive (partial per partition, union at top)
    total = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_hll")).alias("parts_total_approx")
    )
    return (
        per_flag.select(
            "l_returnflag",
            F.hll_sketch_estimate("_hll").alias("parts_approx"),
            F.round("median_price_approx", 2).alias("median_price_approx"),
            "suppliers_approx",
        )
        .crossJoin(total)
        .orderBy("l_returnflag")
    )


# V+ quarantine split: the rule-flagged ROWS themselves, with a
# machine-readable reason list — the side output a medallion gate routes to
# a review/quarantine table while the remaining rows continue to silver.
# Hard-validity rules (validity_report) never fire on the clean testdata, so
# this uses business-review rules that DO flag real rows: bulk orders over
# the quantity cap and max-discount lines carrying the top tax band.


@query(
    "quarantine_rows",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           concat_ws(',',
             CASE WHEN l_quantity > 48 THEN 'bulk_order_review' END,
             CASE WHEN l_discount >= 0.1 AND l_tax >= 0.08
                  THEN 'max_discount_top_tax' END
           ) AS reasons
    FROM lineitem
    WHERE l_quantity > 48 OR (l_discount >= 0.1 AND l_tax >= 0.08)
    ORDER BY l_orderkey, l_linenumber
    """,
)
def quarantine_rows(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    rules = [
        ("bulk_order_review", F.col("l_quantity") > 48),
        (
            "max_discount_top_tax",
            (F.col("l_discount") >= 0.1) & (F.col("l_tax") >= 0.08),
        ),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
    )
    any_bad = rules[0][1]
    for _, cond in rules[1:]:
        any_bad = any_bad | cond
    return (
        l.filter(any_bad)
        .select("l_orderkey", "l_linenumber", reasons.alias("reasons"))
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Distribution-drift report (the scenario testing the reference only PLANS,
# docs/CHURN_PREDICTION_PROCESS_LOG.md:572-584): chi-square comparison of
# the event-type mix between a baseline window and the current window.
# Chi-square, not PSI: the statistic is pure rational arithmetic
# ((obs-exp)^2/exp — counts and ratios), so Spark and the oracle agree
# bit-for-bit where a log-based PSI would drift by libm ulps. One
# conditional-sum pass over the fact table + a scalar-totals broadcast.
# ---------------------------------------------------------------------------


@query(
    "drift_report",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_base,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_curr
      FROM events GROUP BY event_type
    ),
    t AS (
      SELECT sum(n_base) AS tb, sum(n_curr) AS tc FROM c
    )
    SELECT c.event_type, c.n_base, c.n_curr,
           round(c.n_base * 1.0 / t.tb, 6) AS base_share,
           round(c.n_curr * 1.0 / t.tc, 6) AS curr_share,
           CASE WHEN c.n_base = 0 THEN NULL
                ELSE round(
                  (c.n_curr - (c.n_base * 1.0 / t.tb) * t.tc)
                  * (c.n_curr - (c.n_base * 1.0 / t.tb) * t.tc)
                  / ((c.n_base * 1.0 / t.tb) * t.tc), 6)
           END AS chi2_term
    FROM c, t
    ORDER BY event_type
    """,
)
def drift_report(spark, sf_dir):
    from ..io import table as _table

    split = F.lit("2024-01-16").cast("timestamp")
    counts = (
        _table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
            .cast("long")
            .alias("n_base"),
            F.sum(F.when(F.col("ts") >= split, 1).otherwise(0))
            .cast("long")
            .alias("n_curr"),
        )
    )
    totals = counts.agg(
        F.sum("n_base").alias("tb"), F.sum("n_curr").alias("tc")
    )
    base_share = F.col("n_base") * 1.0 / F.col("tb")
    expected = base_share * F.col("tc")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "event_type",
            "n_base",
            "n_curr",
            F.round(base_share, 6).alias("base_share"),
            F.round(F.col("n_curr") * 1.0 / F.col("tc"), 6).alias("curr_share"),
            F.when(F.col("n_base") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    (F.col("n_curr") - expected)
                    * (F.col("n_curr") - expected)
                    / expected,
                    6,
                )
            )
            .alias("chi2_term"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# FK referential-integrity report: the constraint set the reference's
# warehouse DDL declares (src/storage/data_warehouse.py:421-530, FK clauses;
# init.sql:12-133) checked distributed — orphan = child key with no parent
# row. Each pair is one left-anti-join count; parents are broadcast when
# dimension-sized, and the counts fuse into a single result row.
# ---------------------------------------------------------------------------


@query(
    "fk_integrity_report",
    oracle="""
    SELECT
      CAST((SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
           AS BIGINT) AS lineitem_orphans,
      CAST((SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
           AS BIGINT) AS order_orphans,
      CAST((SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
           AS BIGINT) AS customer_orphans,
      CAST((SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey))
           AS BIGINT) AS customers_without_orders
    """,
)
def fk_integrity_report(spark, sf_dir):
    from ..io import table as _table

    lineitem = _table(spark, sf_dir, "lineitem")
    orders = _table(spark, sf_dir, "orders")
    customer = _table(spark, sf_dir, "customer")
    nation = _table(spark, sf_dir, "nation")

    li = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("lineitem_orphans"))
    od = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("order_orphans"))
    cu = customer.join(
        F.broadcast(nation),
        customer.c_nationkey == nation.n_nationkey,
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("customer_orphans"))
    # coverage, not a violation: childless parents — non-zero on TPC-H-shaped
    # data, so the report is exercised, not vacuously all-zero
    no_orders = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("customers_without_orders"))
    return li.crossJoin(od).crossJoin(cu).crossJoin(no_orders)


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov drift over a CONTINUOUS column — the numeric complement
# of the chi-square event-mix report above. The statistic stays exact across
# engines: both ecdfs are integer cumulative counts, the sup-distance is
# maximized on the INTEGER cross-multiplied numerator |cb*tc - cc*tb|
# (no float division until the final report row), and cumulative counts
# come from the range-partitioned two-pass cumsum — no single-task global
# window over the distinct-value frame.
# ---------------------------------------------------------------------------


@query(
    "ks_drift_report",
    oracle="""
    WITH c AS (
      SELECT value,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_base,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_curr
      FROM events WHERE value IS NOT NULL
      GROUP BY value
    ),
    t AS (SELECT sum(n_base) AS tb, sum(n_curr) AS tc FROM c),
    e AS (
      SELECT value,
             sum(n_base) OVER (ORDER BY value) AS cb,
             sum(n_curr) OVER (ORDER BY value) AS cc
      FROM c
    ),
    d AS (SELECT e.value, abs(cb * t.tc - cc * t.tb) AS num FROM e, t),
    m AS (SELECT max(num) AS mx FROM d)
    SELECT round(CAST(m.mx AS DOUBLE) / (t.tb * t.tc), 6) AS ks_stat,
           min(d.value) AS at_value
    FROM d, m, t
    WHERE d.num = m.mx
    GROUP BY m.mx, t.tb, t.tc
    """,
)
def ks_drift_report(spark, sf_dir):
    from ..io import table as _table
    from ..operators.ranks import global_cumsums_distributed

    split = F.lit("2024-01-16").cast("timestamp")
    counts = (
        _table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
            .cast("long")
            .alias("n_base"),
            F.sum(F.when(F.col("ts") >= split, 1).otherwise(0))
            .cast("long")
            .alias("n_curr"),
        )
    )
    order = [F.col("value")]
    # BOTH ecdfs in ONE range pass — nesting two single-column cumsums put
    # two repartitionByRange exchanges in the plan, and when a session's
    # planner declined to reuse the inner one, its offsets joined against
    # different range boundaries than its local sums (wrong, session-
    # dependent sup-distance). One exchange → the inconsistency can't exist.
    ecdf = global_cumsums_distributed(
        counts, order, {"n_base": "cb", "n_curr": "cc"}
    )
    totals = counts.agg(F.sum("n_base").alias("tb"), F.sum("n_curr").alias("tc"))
    d = ecdf.crossJoin(F.broadcast(totals)).select(
        "value",
        "tb",
        "tc",
        F.abs(F.col("cb") * F.col("tc") - F.col("cc") * F.col("tb")).alias("num"),
    )
    mx = d.agg(F.max("num").alias("mx"))
    return (
        d.join(F.broadcast(mx), d.num == mx.mx)
        .groupBy("mx", "tb", "tc")
        .agg(F.min("value").alias("at_value"))
        .select(
            F.round(F.col("mx").cast("double") / (F.col("tb") * F.col("tc")), 6)
            .alias("ks_stat"),
            "at_value",
        )
    )


# ---------------------------------------------------------------------------
# Join-key skew report — the ops tooling BEHIND the salting decision
# (operators/joins.py::salted_join treats keys KNOWN to be degenerate; this
# measures which ones are): per-key row counts → heaviest keys + the
# max/mean skew ratio. One partial-aggregating shuffle on the key; the
# report is top-k sized. Ratio arithmetic uses exact integer counts cast
# identically on both engines.
# ---------------------------------------------------------------------------


@query(
    "join_key_skew_report",
    oracle="""
    WITH counts AS (
      SELECT o_custkey AS key, count(*) AS n
      FROM orders GROUP BY o_custkey
    ),
    stats AS (
      SELECT CAST(max(n) AS DOUBLE) AS mx,
             CAST(sum(n) AS DOUBLE) / count(*) AS mean
      FROM counts
    )
    SELECT c.key, c.n,
           round(CAST(c.n AS DOUBLE) / s.mean, 4) AS skew_ratio
    FROM counts c CROSS JOIN stats s
    ORDER BY c.n DESC, c.key
    LIMIT 10
    """,
)
def join_key_skew_report(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = counts.agg(
        F.max("n").cast("double").alias("mx"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mean"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "n",
            F.round(F.col("n").cast("double") / F.col("mean"), 4).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.col("n").desc(), "key")
        .limit(10)
    )
