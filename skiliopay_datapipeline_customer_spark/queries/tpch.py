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
    """Q22 shape: scalar subquery (1-row broadcast) + anti join."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).first()[0]
    )
    return (
        customer.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           round(sum(o_totalprice), 2) AS revenue
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
               round(sum(o_totalprice), 2) AS revenue
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


@query(
    "small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice), 2) AS total_price_small_qty,
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
    both engines, so the filter is deterministic."""
    lineitem = table(spark, sf_dir, "lineitem")
    thresholds = lineitem.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        lineitem.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_price_small_qty"),
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
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark, sf_dir):
    """Q6 shape: pure scan-side predicates (all pushed into the parquet
    reader) + one global agg — the canonical data-skipping query."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        )
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
