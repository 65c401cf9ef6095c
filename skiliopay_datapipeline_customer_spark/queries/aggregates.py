"""Aggregation suite (SURVEY.md §2.4: A1-A15).

Exact statistics only — the oracle hash-match forbids approx drift (SURVEY
§7.4). Every multi-metric profile is a SINGLE agg pass (one job, one shuffle)
— the reference's per-column loops (data_quality.py) are fused into one
multi-aggregate, which is also the 100 TB-friendly shape (one scan of the
fact table instead of N).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from . import query

# A1 group-by count+sum with derived rate (churn-by-country,
# src/dashboard/views/pages.py:96-101) on the star schema: per market
# segment, share of customers with negative balance ("at risk").


@query(
    "segment_risk_rate",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS total,
           CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS at_risk,
           round(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS risk_rate
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def segment_risk_rate(spark, sf_dir):
    at_risk = F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0))
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("total"),
            at_risk.alias("at_risk"),
            F.round(at_risk * 1.0 / F.count("*"), 6).alias("risk_rate"),
        )
        .orderBy("c_mktsegment")
    )


# A2 global KPI aggregate (src/dashboard/data_loader.py:239-258).


# gmv/aov accumulate on DECIMAL(18,2) — prices are 2-dp-exact by
# construction (verified losslessly castable across all SFs), so the sum is
# integer-exact and ORDER-INDEPENDENT, then ONE cast to double before the
# display rounding. A double sum rounded to 4 dp broke at sf0.1: ~150k
# values of ~1e5 magnitude put Spark-vs-DuckDB summation-order noise
# (~1e-3 absolute on a ~3.8e10 total) above the rounding grid — caught by
# the r7 SELFCHECK_SF01 sweep, invisible at the driver's sf0.01.


@query(
    "global_kpis",
    oracle="""
    SELECT count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4)
             AS gmv,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS aov,
           round(min(o_totalprice), 4) AS min_price,
           round(max(o_totalprice), 4) AS max_price
    FROM orders
    """,
)
def global_kpis(spark, sf_dir):
    dec_sum = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    return table(spark, sf_dir, "orders").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(dec_sum, 4).alias("gmv"),
        F.round(dec_sum / F.count("*"), 6).alias("aov"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


# A3 frequency distribution (value_counts(normalize=True),
# src/processing/data_quality.py:326-342): single groupBy + scalar total via
# window over the (tiny) aggregated frame — the raw table is scanned once.


@query(
    "frequency_distribution",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS cnt,
           round(count(*) * 1.0 / (SELECT count(*) FROM orders), 6) AS share
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def frequency_distribution(spark, sf_dir):
    from pyspark.sql import Window

    counts = table(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.count("*").alias("cnt")
    )
    total = F.sum("cnt").over(Window.partitionBy())
    return (
        counts.withColumn("share", F.round(F.col("cnt") * 1.0 / total, 6))
        .orderBy("o_orderpriority")
    )


# A4/A5/A6 distinct-count, duplicate-count, null-count — one fused
# profiling pass (data_quality.py:67-111).


@query(
    "profile_counts",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS distinct_orders,
           count(DISTINCT l_partkey) AS distinct_parts,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
           CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_flag
    FROM lineitem
    """,
)
def profile_counts(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    return l.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("distinct_orders"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.sum(F.col("l_quantity").isNull().cast("int")).alias("null_qty"),
        F.sum(F.col("l_returnflag").isNull().cast("int")).alias("null_flag"),
    )


# A5 keyed duplicate detection (groupBy-count>1 form).


@query(
    "duplicate_keys",
    oracle="""
    SELECT l_orderkey, l_linenumber, count(*) AS n
    FROM lineitem
    GROUP BY l_orderkey, l_linenumber
    HAVING count(*) > 1
    ORDER BY l_orderkey, l_linenumber
    """,
)
def duplicate_keys(spark, sf_dir):
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .orderBy("l_orderkey", "l_linenumber")
    )


# A7/A8/A9 exact median / mode / quantiles (etl_pipeline.py:169-205).
# Exact percentile (interpolated) matches DuckDB quantile_cont; mode uses the
# deterministic smallest-value-on-ties rule of pandas mode()[0] (SURVEY §7.4).


@query(
    "median_quantiles",
    oracle="""
    SELECT round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           round(quantile_cont(o_totalprice, 0.25), 6) AS q1_price,
           round(quantile_cont(o_totalprice, 0.75), 6) AS q3_price
    FROM orders
    """,
)
def median_quantiles(spark, sf_dir):
    # ONE percentile buffer for all three points (r13): three separate
    # exact-percentile aggregates each accumulate and merge the full
    # value multiset independently — the array form is the same
    # Percentile evaluator once (values bit-identical; isolated A/B
    # 1.22 → 0.56 s at sf0.1)
    p = F.percentile(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.25), F.lit(0.75))
    )
    return (
        table(spark, sf_dir, "orders")
        .agg(p.alias("_p"))
        .select(
            F.round(F.col("_p")[0], 6).alias("median_price"),
            F.round(F.col("_p")[1], 6).alias("q1_price"),
            F.round(F.col("_p")[2], 6).alias("q3_price"),
        )
    )


@query(
    "mode_priority",
    oracle="""
    SELECT o_orderpriority AS mode_value FROM (
      SELECT o_orderpriority, count(*) AS c
      FROM orders GROUP BY o_orderpriority
      ORDER BY c DESC, o_orderpriority LIMIT 1
    )
    """,
)
def mode_priority(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "o_orderpriority")
        .limit(1)
        .select(F.col("o_orderpriority").alias("mode_value"))
    )


# A11 mean/std per column (z-score params, etl_pipeline.py:242-246).
# stddev = sample stddev in both engines.


@query(
    "mean_std",
    oracle="""
    SELECT round(avg(c_acctbal), 6) AS mean_bal,
           round(stddev_samp(c_acctbal), 6) AS std_bal,
           round(avg(o.o_totalprice), 6) AS mean_price
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def mean_std(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .agg(
            F.round(F.avg("c_acctbal"), 6).alias("mean_bal"),
            F.round(F.stddev_samp("c_acctbal"), 6).alias("std_bal"),
            F.round(F.avg("o_totalprice"), 6).alias("mean_price"),
        )
    )


# A12 correlation (feature_engineering.py:275-279).


@query(
    "correlation",
    oracle="""
    SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(corr(l_discount, l_tax), 6) AS corr_disc_tax
    FROM lineitem
    """,
)
def correlation(spark, sf_dir):
    return table(spark, sf_dir, "lineitem").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_discount", "l_tax"), 6).alias("corr_disc_tax"),
    )


# Full correlation MATRIX — the dashboard's engagement heatmap computes
# df[cols].corr() over k columns at once (src/dashboard/views/pages.py:
# 132-137). Distributed form: ALL k·(k-1)/2 pairwise corr() aggregates fused
# into ONE scan/shuffle (tidy long-format output, one row per pair) — never
# k² passes over the fact table.


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "correlation_matrix",
    oracle="""
    SELECT col_x, col_y, corr_val FROM (
      SELECT 'l_discount' AS col_x, 'l_extendedprice' AS col_y,
             round(corr(l_discount, l_extendedprice), 6) AS corr_val FROM lineitem
      UNION ALL SELECT 'l_discount', 'l_quantity',
             round(corr(l_discount, l_quantity), 6) FROM lineitem
      UNION ALL SELECT 'l_discount', 'l_tax',
             round(corr(l_discount, l_tax), 6) FROM lineitem
      UNION ALL SELECT 'l_extendedprice', 'l_quantity',
             round(corr(l_extendedprice, l_quantity), 6) FROM lineitem
      UNION ALL SELECT 'l_extendedprice', 'l_tax',
             round(corr(l_extendedprice, l_tax), 6) FROM lineitem
      UNION ALL SELECT 'l_quantity', 'l_tax',
             round(corr(l_quantity, l_tax), 6) FROM lineitem
    ) ORDER BY col_x, col_y
    """,
)
def correlation_matrix(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    pairs = [
        (a, b)
        for i, a in enumerate(sorted(_CORR_COLS))
        for b in sorted(_CORR_COLS)[i + 1 :]
    ]
    wide = li.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"{a}|{b}")
            for a, b in pairs
        ]
    )
    # one row per pair via stack — the UNION in the oracle is k scans only
    # because SQL lacks a tidy pivot; the ENGINE pass is single-scan
    stack_args = ", ".join(f"'{a}', '{b}', `{a}|{b}`" for a, b in pairs)
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_x, col_y, corr_val)"
    ).orderBy("col_x", "col_y")


# A13 min/max/avg/stddev probe (docs/ReadData.md:119-125).


@query(
    "stats_probe",
    oracle="""
    SELECT round(avg(p_retailprice), 6) AS avg_price,
           round(stddev_samp(p_retailprice), 6) AS std_price,
           round(min(p_retailprice), 4) AS min_price,
           round(max(p_retailprice), 4) AS max_price,
           min(p_size) AS min_size, max(p_size) AS max_size
    FROM part
    """,
)
def stats_probe(spark, sf_dir):
    return table(spark, sf_dir, "part").agg(
        F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        F.round(F.stddev_samp("p_retailprice"), 6).alias("std_price"),
        F.round(F.min("p_retailprice"), 4).alias("min_price"),
        F.round(F.max("p_retailprice"), 4).alias("max_price"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )


# A10 percentile-threshold flag (is_high_value, feature_engineering.py:224-228):
# scalar q80 computed in a subquery, broadcast into the flag expression —
# no driver round-trip, no second scan shape at scale (tiny scalar crossjoin).


@query(
    "high_value_flag",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >
             (SELECT quantile_cont(o_totalprice, 0.8) FROM orders)
           THEN 1 ELSE 0 END AS is_high_value
    FROM orders
    ORDER BY o_orderkey
    """,
)
def high_value_flag(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    q80 = orders.agg(F.percentile("o_totalprice", F.lit(0.8)).alias("q80"))
    return (
        orders.crossJoin(F.broadcast(q80))
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > F.col("q80"), 1).otherwise(0).alias(
                "is_high_value"
            ),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Weighted median — the A7 exact-median family extended with weights
# (quantity-weighted price: "the price at which half the VOLUME trades").
# No built-in computes this; the distributed form is the range-partitioned
# cumulative-weight pass (operators/ranks.py): order by (price, key), running
# sum of weights, first row where 2·cumweight ≥ total — integer-free
# comparison via the doubled cross-form so no division enters the predicate.
# One range pass + a 1-row total broadcast; never a single-task window.
# ---------------------------------------------------------------------------


@query(
    "weighted_median_price",
    oracle="""
    WITH w AS (
      SELECT l_extendedprice AS p, l_quantity AS wt,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    c AS (
      SELECT p, wt,
             sum(wt) OVER (ORDER BY p, l_orderkey, l_linenumber
                           ROWS UNBOUNDED PRECEDING) AS cw
      FROM w
    ),
    t AS (SELECT sum(wt) AS total FROM w)
    SELECT round(min(c.p), 4) AS weighted_median_price
    FROM c CROSS JOIN t
    WHERE 2 * c.cw >= t.total
    """,
)
def weighted_median_price(spark, sf_dir):
    from ..operators.ranks import global_cumsums_distributed

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("p"),
        F.col("l_quantity").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    cum = global_cumsums_distributed(
        li,
        [F.col("p"), F.col("l_orderkey"), F.col("l_linenumber")],
        {"wt": "cw"},
    )
    total = li.agg(F.sum("wt").alias("total"))
    return (
        cum.crossJoin(F.broadcast(total))
        .filter(2 * F.col("cw") >= F.col("total"))
        .agg(F.round(F.min("p"), 4).alias("weighted_median_price"))
    )


# ---------------------------------------------------------------------------
# GROUPED weighted median — the per-group extension: quantity-weighted
# median price per return flag, all groups in ONE range pass. Order the
# range partitioning by (group, value, key); the global cumulative weight
# minus the group's base offset (sum of prior groups' weights — a
# metadata-sized frame) is the within-group running weight; the answer per
# group is the first value where 2·cw ≥ group total. Never a per-group
# window over a dominant group's full weight stream.
# ---------------------------------------------------------------------------


@query(
    "weighted_median_by_flag",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag, l_extendedprice AS p, l_quantity AS wt,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    c AS (
      SELECT flag, p, wt,
             sum(wt) OVER (PARTITION BY flag
                           ORDER BY p, l_orderkey, l_linenumber
                           ROWS UNBOUNDED PRECEDING) AS cw
      FROM w
    ),
    t AS (SELECT flag, sum(wt) AS total FROM w GROUP BY flag)
    SELECT c.flag, round(min(c.p), 4) AS weighted_median_price
    FROM c JOIN t USING (flag)
    WHERE 2 * c.cw >= t.total
    GROUP BY c.flag ORDER BY c.flag
    """,
)
def weighted_median_by_flag(spark, sf_dir):
    from ..operators.ranks import global_cumsums_distributed

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("p"),
        F.col("l_quantity").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    # one range pass over (group, value, key): global running weight...
    cum = global_cumsums_distributed(
        li,
        [F.col("flag"), F.col("p"), F.col("l_orderkey"), F.col("l_linenumber")],
        {"wt": "gcw"},
    )
    # ...minus each group's base offset = within-group running weight.
    # Group totals/bases are a #groups-sized frame (broadcast). The
    # subtraction is EXACT here because quantities are integer-valued
    # doubles (< 2^53); fractional weights would make gcw - base differ
    # from a direct per-group cumsum by ulps — use integer-scaled weights
    # when the boundary matters.
    totals = li.groupBy("flag").agg(F.sum("wt").alias("total"))
    from pyspark.sql import Window

    base_w = (
        Window.orderBy("flag")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = totals.select(
        "flag",
        "total",
        F.coalesce(F.sum("total").over(base_w), F.lit(0.0)).alias("base"),
    )
    return (
        cum.join(F.broadcast(bases), "flag")
        .filter(2 * (F.col("gcw") - F.col("base")) >= F.col("total"))
        .groupBy("flag")
        .agg(F.round(F.min("p"), 4).alias("weighted_median_price"))
        .orderBy("flag")
    )


# Grouped exact percentile ARRAY: the five-number summary per segment in
# ONE aggregation pass (percentile takes the probability array — never five
# separate sorts). Both engines use the same continuous-interpolation
# definition ((n-1)p index + linear blend), so rounded values hash-match.


@query(
    "segment_price_percentiles",
    oracle="""
    SELECT c_mktsegment,
           round(quantile_cont(o_totalprice, 0.10), 4) AS p10,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def segment_price_percentiles(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    probs = [0.10, 0.25, 0.50, 0.75, 0.90]
    pct = F.percentile(
        "o_totalprice", F.array(*[F.lit(p) for p in probs])
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(pct.alias("_p"))
        .select(
            "c_mktsegment",
            *[
                F.round(F.element_at("_p", i + 1), 4).alias(
                    f"p{int(p * 100)}"
                )
                for i, p in enumerate(probs)
            ],
        )
        .orderBy("c_mktsegment")
    )
