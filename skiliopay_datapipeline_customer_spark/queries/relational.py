"""Scans, filters, joins, sorts, limits, set ops (SURVEY.md §2.1-2.3, 2.6-2.7).

Each query is the Spark-first expression of a reference operator; the oracle
SQL mirrors it exactly (same aliases, same rounding). Scale posture:

- dim⋈fact joins broadcast the dim side explicitly (J1) — at 100 TB the fact
  never shuffles for a dimension lookup;
- fact⋈fact (orders⋈lineitem) relies on sort-merge + AQE skew splitting;
- filters are plain Column predicates so Catalyst pushes them into the
  parquet scan (PushedFilters) before the join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from . import query

# ---------------------------------------------------------------------------
# Flagship: star-schema revenue rollup (SURVEY §7.1; shape of the reference's
# churn-by-country dashboard agg src/dashboard/views/pages.py:96-101 lifted
# onto the test star schema).
# ---------------------------------------------------------------------------


@query(
    "flagship_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_items,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE),
                 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
)
def flagship_revenue_by_nation(spark, sf_dir):
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        # customer is NOT a dimension — it grows with the dataset (billions of
        # rows at 100 TB), so no explicit broadcast: AQE picks the strategy
        # from runtime stats. Only true dims (nation: 25 rows) are broadcast.
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_items"),
            # DECIMAL(12,2) accumulation (the pricing_summary pattern):
            # the double-sum form had 839 ulps of rounding-grid headroom at
            # sf0.1 and ~105 projected at sf1 — under 4× the measured ~33-ulp
            # cross-engine partial-sum band. Decimal sums are integer-exact
            # and order-independent, so the result is identical at sf1000.
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
                ).cast("double"),
                4,
            ).alias("revenue"),
        )
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary (A1 group-agg family at full width).
# ---------------------------------------------------------------------------


# The money sums accumulate on DECIMAL (TPC-H's own column types — the
# testdata stores 2-dp-exact doubles, losslessly castable; products of 2-dp
# decimals are exact at scale 4/6): integer-exact, ORDER-INDEPENDENT sums,
# one cast to double before the display rounding. The double-sum form had
# only ~52 ulps of headroom against the 4-dp grid at sf0.1 (group totals
# ~4.4e9; measured cross-engine partial-sum deltas reach ~33 ulps when
# session parallelism differs — the exact mechanism that broke global_kpis)
# and would drop to single digits at sf1. sum_qty/avg_qty stay double:
# l_quantity is integer-valued, so those sums are exact in ANY order.


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 4)
             AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE), 4)
             AS sum_disc_price,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l_discount AS DECIMAL(4,2))
                          * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE), 4)
             AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    price_dec = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_fac = (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
    tax_fac = (F.lit(1) + F.col("l_tax")).cast("decimal(4,2)")
    base_sum = F.sum(price_dec).cast("double")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(base_sum, 4).alias("sum_base_price"),
            F.round(F.sum(price_dec * disc_fac).cast("double"), 4).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(price_dec * disc_fac * tax_fac).cast("double"), 4
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(base_sum / F.count("*"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# P4 point lookup by key (src/serving/api.py:244-255).
# ---------------------------------------------------------------------------


@query(
    "point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 4) AS acctbal, c_mktsegment
    FROM customer WHERE c_custkey = 42
    """,
)
def point_lookup(spark, sf_dir):
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.round("c_acctbal", 4).alias("acctbal"),
            "c_mktsegment",
        )
    )


# ---------------------------------------------------------------------------
# P5 range/enum predicate filters (src/processing/data_quality.py:152-190).
# ---------------------------------------------------------------------------


@query(
    "range_enum_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 4) AS totalprice
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice >= 1000.0 AND o_totalprice < 5000.0
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    ORDER BY o_orderkey
    """,
)
def range_enum_filter(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderstatus").isin("O", "F")
            & (F.col("o_totalprice") >= 1000.0)
            & (F.col("o_totalprice") < 5000.0)
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 4).alias("totalprice"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# P7 deterministic sample (reference samples with a fixed seed for plots,
# src/dashboard/views/pages.py:118 — made oracle-reproducible via key modulo).
# ---------------------------------------------------------------------------


@query(
    "deterministic_sample",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_custkey % 20 = 0 ORDER BY c_custkey
    """,
)
def deterministic_sample(spark, sf_dir):
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 20 == 0)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# P8 / O4 LIMIT-OFFSET pagination (src/serving/api.py:485-489).
# ---------------------------------------------------------------------------


@query(
    "pagination",
    oracle="""
    SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 20 OFFSET 50
    """,
)
def pagination(spark, sf_dir):
    return (
        table(spark, sf_dir, "customer")
        .orderBy("c_custkey")
        .select("c_custkey", "c_name")
        .offset(50)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# J1 broadcast dim join chain (star-schema FK joins,
# src/storage/data_warehouse.py:486-527).
# ---------------------------------------------------------------------------


@query(
    "broadcast_dim_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    ORDER BY c.c_custkey
    """,
)
def broadcast_dim_join(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# J2 left join key lookup (serving-time feature fetch, src/serving/api.py:244-258):
# every customer left-joined to an aggregate of their orders.
# ---------------------------------------------------------------------------


@query(
    "left_join_lookup",
    oracle="""
    SELECT c.c_custkey,
           coalesce(agg.n_orders, 0) AS n_orders,
           round(coalesce(agg.total_spent, 0.0), 4) AS total_spent
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total_spent
        FROM orders GROUP BY o_custkey
    ) agg ON c.c_custkey = agg.o_custkey
    ORDER BY c.c_custkey
    """,
)
def left_join_lookup(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    agg = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("total_spent"))
    )
    return (
        customer.join(agg, customer.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce("total_spent", F.lit(0.0)), 4).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# J-suite: left-semi (customers WITH orders — the churn predicate's
# existence test, docs/CHURN_PREDICTION_PROCESS_LOG.md:25) and left-anti
# (customers WITHOUT recent orders = churned).
# ---------------------------------------------------------------------------


@query(
    "semi_join_active",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
    ORDER BY c_custkey
    """,
)
def semi_join_active(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "anti_join_churned",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
    ORDER BY c_custkey
    """,
)
def anti_join_churned(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# O2 top-k by metric (src/dashboard/data_loader.py:152-155): top 15 customers
# by total spend. Spark plans orderBy+limit as TakeOrdered (no full sort).
# ---------------------------------------------------------------------------


@query(
    "topk_customers",
    oracle="""
    SELECT o_custkey, round(sum(o_totalprice), 4) AS total_spent, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY total_spent DESC, o_custkey
    LIMIT 15
    """,
)
def topk_customers(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("total_spent"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("total_spent"), "o_custkey")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# U1 distinct rows (etl_pipeline.py:140-143 drop_duplicates).
# ---------------------------------------------------------------------------


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_quantity
    FROM lineitem ORDER BY l_returnflag, l_linestatus, l_quantity
    """,
)
def distinct_rows(spark, sf_dir):
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus", "l_quantity")
    )


# ---------------------------------------------------------------------------
# U4 row union (append-mode load, data_warehouse.py:68-92): two layer slices
# unioned by name — the priority-union/fallback pattern of J3.
# ---------------------------------------------------------------------------


@query(
    "union_append",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey, 'high' AS bucket FROM orders WHERE o_totalprice >= 4000
      UNION ALL
      SELECT o_orderkey, 'low' AS bucket FROM orders WHERE o_totalprice < 1000
    ) ORDER BY o_orderkey, bucket
    """,
)
def union_append(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") >= 4000).select(
        "o_orderkey", F.lit("high").alias("bucket")
    )
    lo = orders.filter(F.col("o_totalprice") < 1000).select(
        "o_orderkey", F.lit("low").alias("bucket")
    )
    return hi.unionByName(lo).orderBy("o_orderkey", "bucket")


# ---------------------------------------------------------------------------
# U-intersect/except (engine capability beyond reference, SURVEY §2.7 note):
# market segments present in both high- and low-balance customer groups.
# ---------------------------------------------------------------------------


@query(
    "intersect_segments",
    oracle="""
    SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT c_mktsegment FROM customer WHERE c_acctbal < 0
    ORDER BY c_mktsegment
    """,
)
def intersect_segments(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    hi = customer.filter(F.col("c_acctbal") > 5000).select("c_mktsegment")
    lo = customer.filter(F.col("c_acctbal") < 0).select("c_mktsegment")
    return hi.intersect(lo).orderBy("c_mktsegment")


# U-family completeness: multiset difference (exceptAll) — layer
# reconciliation shape (silver rows not yet propagated to gold, J3 family).


@query(
    "except_all_pending",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey
    """,
)
def except_all_pending(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    all_keys = orders.select("o_custkey")
    done = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_keys.exceptAll(done).orderBy("o_custkey")


# J1 proper: BI rollup THROUGH the star-schema dims (dim_user =
# customer⋈nation⋈region, dim_date derived calendar) — the fact table
# broadcast-joins both dims; the oracle rebuilds the same dims inline.


@query(
    "star_revenue_rollup",
    oracle="""
    SELECT r_name AS region,
           CAST(year(o_orderdate) AS INT) AS year,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, year(o_orderdate)
    ORDER BY region, year
    """,
)
def star_revenue_rollup(spark, sf_dir):
    from ..pipelines.warehouse import build_dim_date, build_dim_user, build_fact_orders

    fact = build_fact_orders(spark, sf_dir)
    dim_user = build_dim_user(spark, sf_dir)
    # the calendar dimension is a FIXED epoch, not data-derived: deriving
    # start/end from fact.agg(min,max).first() cost an eager full fact scan
    # per call (an extra job before the main query — the rfm_quintiles
    # anti-pattern). A 1970–2099 calendar is static metadata (~47k rows,
    # still broadcast-sized) and covers any date the fact can carry — the
    # standard warehouse contract that the calendar spans the data epoch
    dim_date = build_dim_date(spark, "1970-01-01", "2099-12-31")
    return (
        fact.join(F.broadcast(dim_user), "user_key")
        .join(F.broadcast(dim_date), "date_key")
        .groupBy(F.col("region"), F.col("year"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("gmv"), 2).alias("revenue"),
        )
        .orderBy("region", "year")
    )


# SQL-interface probe: the same rollup through spark.sql over registered
# views — proving the SQL surface compiles to the identical Catalyst plan
# family the DataFrame queries use.


@query(
    "sql_interface_probe",
    oracle="""
    SELECT o_orderstatus AS status, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders GROUP BY o_orderstatus ORDER BY status
    """,
)
def sql_interface_probe(spark, sf_dir):
    from ..sql import run_sql

    return run_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus AS status, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY o_orderstatus ORDER BY status
        """,
    )


# J+ salted skew join as a declared query: events.event_type has a handful of
# values, so a plain hash join hot-spots one task per type at scale. The
# salted form replicates the small side across salt buckets and splits each
# hot key ~evenly. The oracle is the PLAIN join — hash-matching it proves
# salting changes the physical plan, never the result.


@query(
    "salted_skew_join_counts",
    oracle="""
    WITH lookup AS (
      SELECT event_type, count(*) AS type_total FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n_events,
           max(l.type_total) AS type_total,
           round(sum(e.value), 4) AS total_value
    FROM events e JOIN lookup l ON e.event_type = l.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def salted_skew_join_counts(spark, sf_dir):
    from ..operators.joins import salted_join

    events = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    lookup = events.groupBy("event_type").agg(F.count("*").alias("type_total"))
    joined = salted_join(events, lookup, "event_type", salt_buckets=8)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.max("type_total").alias("type_total"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Market-basket pair co-occurrence — which parts ship together: lineitem
# self-joined within the order key (a < b dedups the unordered pair), pair
# counts, top-50. The self-join is equi on l_orderkey, so candidate pairs
# are bounded by items-per-order² (single digits squared — never a corpus
# cross product); the top-k is a sort-limit over the pair-count frame.
# ---------------------------------------------------------------------------


@query(
    "basket_part_pairs",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 50
    """,
)
def basket_part_pairs(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(50)
    )
