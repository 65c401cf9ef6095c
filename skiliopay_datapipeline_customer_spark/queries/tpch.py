"""Classic decision-support shapes (TPC-H Q4/Q13/Q18/Q22 families) — the
relational patterns a warehouse user expects beyond the reference's flat
aggregations: EXISTS semi-joins, left-join count distributions,
HAVING-gated group aggregates, scalar-subquery filters, grouping sets.

Scale posture: every shape is one or two keyed shuffles; EXISTS compiles to
a left-semi hash join, the scalar subquery to a 1-row broadcast, grouping
sets to a single expand+aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from . import query


@query(
    "priority_with_lineitems",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def priority_with_lineitems(spark, sf_dir):
    """Q4 shape: EXISTS → left-semi join, no row duplication."""
    orders = table(spark, sf_dir, "orders")
    big_items = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(
            big_items, orders.o_orderkey == big_items.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "customer_order_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def customer_order_distribution(spark, sf_dir):
    """Q13 shape: count-of-counts over a left join (customers with zero
    orders included via count(col) null-skipping)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@query(
    "large_quantity_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice, sum_qty
    FROM orders JOIN (
      SELECT l_orderkey, round(sum(l_quantity), 4) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    ) big ON o_orderkey = big.l_orderkey
    ORDER BY o_orderkey
    """,
)
def large_quantity_orders(spark, sf_dir):
    """Q18 shape: HAVING-gated aggregate joined back to the fact."""
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter(F.col("_raw_qty") > 150)
        .drop("_raw_qty")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "sum_qty"
        )
        .orderBy("o_orderkey")
    )


@query(
    "wealthy_inactive_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def wealthy_inactive_customers(spark, sf_dir):
    """Q22 shape: scalar subquery (an ACTUAL 1-row broadcast cross join,
    not an eager driver action) + anti join."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_bal = F.broadcast(
        customer.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    )
    return (
        customer.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .drop("_avg")
        .join(orders, F.col("c_custkey") == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# revenue accumulates on DECIMAL(12,2) (r7 float-sum audit, SCALE.md): the
# grand-total grouping set sums the WHOLE orders table, and a double sum
# had 655 ulps of 2-dp-grid headroom at sf0.1 (~40 at sf1) — below the
# 800-ulp keep-on-double threshold.


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY status, priority
    """,
)
def grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS (neither rollup nor cube): per-status,
    per-priority, and grand total in ONE expand+aggregate pass."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
                 AS revenue
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


@query(
    "small_quantity_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS total_price_small_qty,
           count(*) AS n_items
    FROM lineitem l
    JOIN (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    ) t ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.qty_threshold
    """,
)
def small_quantity_revenue(spark, sf_dir):
    """Q17 shape: correlated per-key average subquery → keyed aggregate
    joined back on the same key (one shuffle each side, co-partitioned).
    The threshold is 0.2·avg of integral quantities — identical IEEE ops in
    both engines, so the filter is deterministic. The money sum accumulates
    DECIMAL(12,2) (SCALE.md: the double form had ~1 311 ulps of 2-dp-grid
    headroom at sf1 but only ~164 at sf10 — exact at any SF as decimal;
    reference money semantics are DECIMAL(10,2) DDL, init.sql:21-44)."""
    lineitem = table(spark, sf_dir, "lineitem")
    thresholds = lineitem.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        lineitem.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast(
                    "double"
                ),
                2,
            ).alias("total_price_small_qty"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "significant_parts",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey, sum(l_quantity) AS part_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, round(part_qty, 4) AS part_qty
    FROM per_part
    WHERE part_qty > (SELECT 1.2 * avg(part_qty) FROM per_part)
    ORDER BY l_partkey
    """,
)
def significant_parts(spark, sf_dir):
    """Q11 shape: group aggregate gated by a scalar over the SAME aggregate
    (parts 20% above the mean part — scale-invariant, unlike a fixed
    fraction of the global total, which goes vacuous as part count grows).
    The scalar is a 1-row broadcast crossjoin, no driver round-trip; all
    sums are integral doubles < 2^53, so both engines agree exactly."""
    lineitem = table(spark, sf_dir, "lineitem")
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("_raw")
    )
    cut = per_part.agg((1.2 * F.avg("_raw")).alias("_cut"))
    return (
        per_part.crossJoin(F.broadcast(cut))
        .filter(F.col("_raw") > F.col("_cut"))
        .select("l_partkey", F.round(F.col("_raw"), 4).alias("part_qty"))
        .orderBy("l_partkey")
    )


@query(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark, sf_dir):
    """Q3 shape: segment-filtered 3-way join, revenue-ranked unshipped
    orders. The customer filter prunes before the join; top-k is a
    TakeOrdered, never a full sort."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@query(
    "forecast_revenue_change",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE), 4)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark, sf_dir):
    """Q6 shape: pure scan-side predicates (all pushed into the parquet
    reader) + one global agg — the canonical data-skipping query. The
    revenue sum accumulates DECIMAL(12,2)×DECIMAL(4,2) products (exact at
    scale 4): SCALE.md projected only ~839 ulps of 4-dp-grid headroom at
    sf1 for the double form — the same at-risk class as the flagship;
    reference money semantics are DECIMAL(10,2) DDL, init.sql:21-44."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            ).cast("double"),
            4,
        ).alias("revenue")
    )


@query(
    "returned_item_losses",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def returned_item_losses(spark, sf_dir):
    """Q10 shape: revenue lost to returns per customer — fact⋈fact⋈dim with
    only the true dim (nation) broadcast."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")  # noqa: E741
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("custkey", "name", "revenue", "nation")
        .orderBy(F.desc("revenue"), "custkey")
        .limit(20)
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-07-01'
    """,
)
def promo_revenue_share(spark, sf_dir):
    """Q14 shape: conditional-aggregate ratio over a part lookup join."""
    l = table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_pct")
        )
    )


@query(
    "discounted_brand_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def discounted_brand_revenue(spark, sf_dir):
    """Q19 shape: disjunctive multi-attribute predicate spanning both join
    sides — the optimizer must keep it as a join filter, not a pushdown."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE s.s_nationkey = c.c_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def local_supplier_volume(spark, sf_dir):
    """Q5 shape: the deepest join tree in the suite — two fact⋈fact joins
    plus three dim lookups, with the local-supplier predicate
    (s_nationkey = c_nationkey) spanning both fact branches so it can only
    apply post-join. Only true dims (nation, region) broadcast."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@query(
    "nation_trade_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_name IN ('NATION_1', 'NATION_2')
      AND nc.n_name IN ('NATION_1', 'NATION_2')
      AND ns.n_name <> nc.n_name
    GROUP BY supp_nation, cust_nation, ship_year
    ORDER BY supp_nation, cust_nation, ship_year
    """,
)
def nation_trade_volume(spark, sf_dir):
    """Q7 shape: cross-nation trade — the same dimension (nation) joins
    TWICE under different roles (supplier side, customer side), each
    broadcast independently; the inter-nation predicate prunes inside the
    broadcasts."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    nations = ["NATION_1", "NATION_2"]
    ns = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    nc = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == ns.n_nationkey)
        .join(
            F.broadcast(nc.withColumnRenamed("n_name", "_nc_name")),
            c.c_nationkey == nc.n_nationkey,
        )
        .filter(F.col("n_name") != F.col("_nc_name"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.col("_nc_name").alias("cust_nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "nation_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region r ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      WHERE r.r_name = 'EUROPE'
        AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def nation_market_share(spark, sf_dir):
    """Q8 shape: a nation's share of a region's revenue per year — the
    conditional-fraction aggregate over the deepest dim fan (nation joined
    twice, region gate on the customer side only).

    Scale posture: facts join on their keys (two shuffles AQE may re-plan);
    part/supplier/nation/region are true dims — part and supplier broadcast
    under the default threshold at any SF where they stay dim-sized, and the
    region predicate prunes the customer-side nation broadcast before the
    fact scan. Reference anchor: the revenue rollups in
    /root/reference/src/storage/data_warehouse.py:486-527.
    """
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    nc = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ns = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_ns_key"), F.col("n_name").alias("supp_nation")
    )
    volume = _revenue()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == nc.n_nationkey)
        .join(F.broadcast(r), nc.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("_ns_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - p.p_retailprice * l.l_quantity), 4) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def product_type_profit(spark, sf_dir):
    """Q9 shape: profit by supplier nation and year over a name-matched part
    family. The testdata has no partsupp, so supply cost is proxied by
    p_retailprice (the same substitution min_cost_supplier documents) —
    profit = revenue − retailprice × quantity.

    Scale posture: the part name filter broadcasts a pruned part dim into
    the lineitem scan BEFORE the orders join, so the expensive fact⋈fact
    shuffle only carries matching part families.
    """
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    profit = _revenue() - F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 4).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "ship_delay_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                THEN 'LATE' ELSE 'ONTIME' END AS delay_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY delay_bucket
    ORDER BY delay_bucket
    """,
)
def ship_delay_priority(spark, sf_dir):
    """Q12 shape: per-class conditional line counts. The testdata has no
    l_shipmode/l_receiptdate, so the class is the ship-delay bucket
    (shipdate − orderdate > 90 days = LATE) — the same
    count-by-priority-within-class aggregate.

    Scale posture: one fact⋈fact equi-join shuffle, then a 2-group
    aggregate with map-side partials; everything stays in codegen.
    """
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn(
            "delay_bucket",
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, "LATE"
            ).otherwise("ONTIME"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@query(
    "top_revenue_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(r.rev_e4 / 10000.0, 4) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.rev_e4 = (SELECT max(rev_e4) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def top_revenue_supplier(spark, sf_dir):
    """Q15 shape: the revenue view + scalar-max selection. Revenue
    accumulates in EXACT integer ten-thousandths (cents × discount-points,
    the revenue_gini cents pattern): a float `sum(price*(1-disc))` is
    summation-order-sensitive, so two near-tied suppliers could rank
    differently between engines and the `= max` filter would pick
    different winner rows; on exact integers the selection is
    deterministic at any scale.

    Scale posture: the quarter filter pushes to the scan; ONE groupBy
    shuffle builds the view, and the scalar max comes from an
    unpartitioned window over that view — the window input is the
    supplier-count-sized aggregate (dim-sized), not the fact, so the
    single-task frame is metadata-weight. The scalar-subquery form would
    re-run the fact aggregate in a second lineage (explain showed two
    lineitem scans, no ReusedExchange).
    """
    from pyspark.sql import Window

    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    s = table(spark, sf_dir, "supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("rev_e4")
        )
    )
    top = revenue.withColumn(
        "_max_rev", F.max("rev_e4").over(Window.partitionBy())
    ).filter(F.col("rev_e4") == F.col("_max_rev"))
    return (
        s.join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_e4") / 10000.0, 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT s_suppkey) AS supplier_cnt
    FROM part
    JOIN supplier ON p_partkey % 100 = s_suppkey % 100
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 11, 15, 21, 25, 35, 41, 45, 49)
      AND s_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def part_supplier_counts(spark, sf_dir):
    """Q16 shape: distinct-supplier counts per part attribute triple,
    excluding a supplier denylist (negative account balance proxies the
    complaints subquery) over the synthesized key-residue partsupp.

    Scale posture: the denylist NOT IN compiles to a broadcast anti-join
    (s_suppkey is non-null, so anti == NOT IN); the residue join broadcasts
    the pruned supplier dim; count(DISTINCT) is a two-phase hash aggregate.
    """
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 11, 15, 21, 25, 35, 41, 45, 49)
    )
    s = table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    good = s.join(F.broadcast(bad), "s_suppkey", "left_anti")
    return (
        p.join(F.broadcast(good), p.p_partkey % 100 == good.s_suppkey % 100)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("s_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "volume_part_suppliers",
    oracle="""
    WITH promo_qty AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
      GROUP BY l_partkey, l_suppkey
    ), part_total AS (
      SELECT l_partkey, sum(supp_qty) AS total_qty
      FROM promo_qty GROUP BY l_partkey
    )
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT q.l_suppkey
      FROM promo_qty q JOIN part_total t ON q.l_partkey = t.l_partkey
      WHERE q.supp_qty * 10 > t.total_qty * 3
    )
    ORDER BY s.s_name
    """,
)
def volume_part_suppliers(spark, sf_dir):
    """Q20 shape: suppliers who moved a dominant share (>30%) of some promo
    part's volume — the nested-IN + correlated-threshold selection. The
    availqty correlation is re-expressed over shipped quantities (integral
    doubles, so the ×10 vs ×3 comparison is exact).

    Scale posture: both aggregates reuse the SAME (l_partkey, l_suppkey)
    shuffle (the part total re-aggregates the smaller per-pair frame, not
    the fact); the qualifying-supplier set is id-only and broadcasts into
    a left-semi join against the supplier dim.
    """
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    promo_qty = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    # part totals via an unordered window over the per-pair frame: one extra
    # shuffle of the SMALL frame instead of a second aggregate lineage that
    # would re-scan the fact (explain showed no ReusedExchange for the
    # re-aggregate form — AQE specializes the two branches apart). Partition
    # fan-in is bounded by suppliers-per-part, so no single-task funnel.
    from pyspark.sql import Window

    per_part = Window.partitionBy("l_partkey")
    dominant = (
        promo_qty.withColumn("total_qty", F.sum("supp_qty").over(per_part))
        .filter(F.col("supp_qty") * 10 > F.col("total_qty") * 3)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(dominant), s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


@query(
    "waiting_suppliers",
    oracle="""
    WITH ord AS (
      SELECT l_orderkey, max(l_shipdate) AS mx,
             count(DISTINCT l_suppkey) AS nsupp
      FROM lineitem GROUP BY l_orderkey
    ), at_max AS (
      SELECT l.l_orderkey,
             count(DISTINCT l.l_suppkey) AS cmax,
             min(l.l_suppkey) AS blamed_supp
      FROM lineitem l JOIN ord o
        ON l.l_orderkey = o.l_orderkey AND l.l_shipdate = o.mx
      GROUP BY l.l_orderkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM at_max a
    JOIN ord o ON a.l_orderkey = o.l_orderkey
    JOIN supplier s ON s.s_suppkey = a.blamed_supp
    WHERE a.cmax = 1 AND o.nsupp > 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def waiting_suppliers(spark, sf_dir):
    """Q21 shape: the supplier who kept a multi-supplier order waiting —
    sole owner of the order's latest ship date while other suppliers had
    already shipped (EXISTS earlier-shipper / NOT EXISTS co-latest-shipper,
    re-expressed as per-order aggregates: no commit/receipt dates in the
    testdata, so lateness = owning max(l_shipdate)).

    Scale posture: ONE pass over the fact — pre-aggregate per
    (order, supplier) with map-side partials, then fold each order's
    per-supplier ship dates as an array (fan-in bounded by
    suppliers-per-order, single digits) with native array expressions.
    No join back to the fact, no broadcast of an order-count-sized frame
    (the naive two-aggregate form scanned lineitem twice and AQE
    broadcast ord_stats — wrong at 100 TB).
    """
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    s = table(spark, sf_dir, "supplier")
    per_os = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("smx")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("smx", "l_suppkey")).alias("sl")
    )
    mx = F.array_max(F.transform("sl", lambda x: x["smx"]))
    at_max = F.filter("sl", lambda x: x["smx"] == mx)
    blamed = (
        per_order.select(
            F.size("sl").alias("nsupp"),
            F.size(at_max).alias("cmax"),
            F.array_min(F.transform(at_max, lambda x: x["l_suppkey"])).alias(
                "blamed_supp"
            ),
        )
        .filter((F.col("cmax") == 1) & (F.col("nsupp") > 1))
    )
    return (
        blamed.join(F.broadcast(s), F.col("blamed_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
