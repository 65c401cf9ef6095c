"""OLAP / analytical shapes beyond the reference's flat group-bys: rollup,
cube, pivot, join-back min-per-group, lateral explode, null semantics,
grouped regression. These round out the "a reference user could run every
query here" claim (SURVEY §2.4/§2.6 extensions) — each is a single-shuffle
shape that scales (rollup/cube expand grouping sets map-side; pivot is a
group-by with a fixed column list; join-back broadcasts the per-group
minima)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from . import query


@query(
    "rollup_revenue",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def rollup_revenue(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
        .orderBy("status", "priority")
    )


@query(
    "cube_counts",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS year,
           count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, year(o_orderdate))
    ORDER BY status, year
    """,
)
def cube_counts(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").withColumn(
        "_year", F.year("o_orderdate").cast("string")
    )
    return (
        orders.cube("o_orderstatus", "_year")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("_year", F.lit("ALL")).alias("year"),
            "n_orders",
        )
        .orderBy("status", "year")
    )


@query(
    "pivot_status_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_P
    FROM orders
    GROUP BY year(o_orderdate)
    ORDER BY year
    """,
)
def pivot_status_by_year(spark, sf_dir):
    # explicit pivot values → no extra distinct-discovery job, stable schema
    pivoted = (
        table(spark, sf_dir, "orders")
        .withColumn("year", F.year("o_orderdate"))
        .groupBy("year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "year",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("bigint").alias(f"status_{s}")
            for s in ("O", "F", "P")
        ],
    ).orderBy("year")


@query(
    "min_cost_supplier",
    oracle="""
    WITH mins AS (
      SELECT ps_partkey, min(ps_supplycost) AS min_cost
      FROM (SELECT s_suppkey AS ps_suppkey, s_nationkey,
                   p_partkey AS ps_partkey,
                   round(s_acctbal + p_retailprice, 2) AS ps_supplycost
            FROM supplier, part
            WHERE p_partkey % 100 = s_suppkey % 100)
      GROUP BY ps_partkey
    ),
    costs AS (
      SELECT s_suppkey AS ps_suppkey, p_partkey AS ps_partkey,
             round(s_acctbal + p_retailprice, 2) AS ps_supplycost
      FROM supplier, part
      WHERE p_partkey % 100 = s_suppkey % 100
    )
    SELECT c.ps_partkey AS partkey, min(c.ps_suppkey) AS suppkey, m.min_cost
    FROM costs c JOIN mins m
      ON c.ps_partkey = m.ps_partkey AND c.ps_supplycost = m.min_cost
    GROUP BY c.ps_partkey, m.min_cost
    ORDER BY partkey
    """,
)
def min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (min-per-group then join back) over a synthesized
    partsupp (testdata has no partsupp: derive a deterministic supplier↔part
    relation by key residue). The join-back + re-group resolves ties exactly
    like the correlated subquery."""
    supplier = table(spark, sf_dir, "supplier")
    part = table(spark, sf_dir, "part")
    costs = (
        part.join(supplier, part.p_partkey % 100 == supplier.s_suppkey % 100)
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.col("s_suppkey").alias("ps_suppkey"),
            F.round(F.col("s_acctbal") + F.col("p_retailprice"), 2).alias(
                "ps_supplycost"
            ),
        )
    )
    c = costs.alias("c")
    mins = (
        costs.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost").alias("min_cost"))
        .select(F.col("ps_partkey").alias("m_partkey"), "min_cost")
        .alias("m")
    )
    return (
        c.join(
            mins,
            (F.col("c.ps_partkey") == F.col("m.m_partkey"))
            & (F.col("c.ps_supplycost") == F.col("m.min_cost")),
        )
        .groupBy(F.col("c.ps_partkey").alias("partkey"), "min_cost")
        .agg(F.min("ps_suppkey").alias("suppkey"))
        .select("partkey", "suppkey", "min_cost")
        .orderBy("partkey")
    )


@query(
    "top_terms",
    oracle="""
    SELECT tok, count(*) AS n
    FROM (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    )
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def top_terms(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


@query(
    "null_semantics",
    oracle="""
    SELECT o_orderkey,
           coalesce(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_mapped,
           (o_orderstatus IS NOT DISTINCT FROM 'P') AS is_pending_nullsafe,
           CASE WHEN o_totalprice IS NULL THEN -1.0
                ELSE round(o_totalprice, 2) END AS price_or_sentinel
    FROM orders
    ORDER BY o_orderkey
    """,
)
def null_semantics(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.coalesce(
                F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")
            ).alias("status_mapped"),
            F.col("o_orderstatus").eqNullSafe("P").alias("is_pending_nullsafe"),
            F.when(F.col("o_totalprice").isNull(), F.lit(-1.0))
            .otherwise(F.round("o_totalprice", 2))
            .alias("price_or_sentinel"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "order_trend_slope",
    oracle="""
    SELECT o_custkey,
           round(regr_slope(o_totalprice, epoch(o_orderdate) / 86400.0), 4)
             AS price_trend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 3
    ORDER BY o_custkey
    """,
)
def order_trend_slope(spark, sf_dir):
    """Per-customer price trend: regr_slope = covar_pop/var_pop — exact
    closed form, native aggregates (no UDF)."""
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_totalprice").alias("y"),
        (F.unix_timestamp("o_orderdate") / 86400.0).alias("x"),
    )
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.round(F.covar_pop("y", "x") / F.var_pop("x"), 4).alias("price_trend"),
            F.count("*").alias("_n"),
        )
        .filter(F.col("_n") >= 3)
        .drop("_n")
        .orderBy("o_custkey")
    )


# Grouped-map tier demo (§2.12 sanctioned UDF ladder): per-customer pandas
# batch computing the same least-squares slope with numpy. r07 oracle
# upgrade: shares the native twin's oracle — the slope is rounded to 4
# decimals on both sides, which absorbs the numpy-vs-SQL float summation
# order (hash-verified identical at sf0.001/sf0.01 on the fixed driver
# corpora; per-group n is small, so the accumulated error is ~1e-10
# relative, far inside the rounding grid).


@query(
    "order_trend_pandas",
    oracle="""
    SELECT o_custkey,
           round(regr_slope(o_totalprice, epoch(o_orderdate) / 86400.0), 4)
             AS price_trend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 3
    ORDER BY o_custkey
    """,
)
def order_trend_pandas(spark, sf_dir):
    import pandas as pd

    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_totalprice").alias("y"),
        (F.unix_timestamp("o_orderdate") / 86400.0).alias("x"),
    )

    def slope(pdf: pd.DataFrame) -> pd.DataFrame:
        # self-contained closure (executors don't import this package)
        import numpy as np

        if len(pdf) < 3:
            return pd.DataFrame(columns=["o_custkey", "price_trend"])
        x = pdf["x"].to_numpy()
        y = pdf["y"].to_numpy()
        xm, ym = x.mean(), y.mean()
        denom = ((x - xm) ** 2).mean()
        # var(x)==0 (all orders on one date): regr_slope is NULL, not 0 —
        # emit None so the Arrow column carries a real null, matching both
        # the oracle and the native twin (Spark double division by zero)
        s = round(float(((x - xm) * (y - ym)).mean() / denom), 4) if denom else None
        return pd.DataFrame(
            {"o_custkey": [int(pdf["o_custkey"].iloc[0])], "price_trend": [s]}
        )

    return (
        orders.groupBy("o_custkey")
        .applyInPandas(slope, schema="o_custkey long, price_trend double")
        .orderBy("o_custkey")
    )


# Unpivot (melt): wide per-customer metrics to tidy (key, metric, value)
# rows — the inverse of pivot, Spark's native `unpivot` (no explode/stack
# UDF detour; DuckDB mirrors with UNPIVOT).


@query(
    "unpivoted_customer_metrics",
    oracle="""
    SELECT c_custkey, metric, round(value, 2) AS value
    FROM (
      SELECT c_custkey,
             round(c_acctbal, 2) AS acctbal,
             CAST(c_nationkey AS DOUBLE) AS nationkey
      FROM customer
    ) UNPIVOT (value FOR metric IN (acctbal, nationkey))
    ORDER BY c_custkey, metric
    """,
)
def unpivoted_customer_metrics(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return (
        cust.unpivot(
            "c_custkey", ["acctbal", "nationkey"], "metric", "value"
        )
        .select("c_custkey", "metric", F.round("value", 2).alias("value"))
        .orderBy("c_custkey", "metric")
    )


# Ties-inclusive top-k: rank() <= k keeps ALL orders tied at the cutoff
# price — different cardinality semantics from row_number top-k
# (topn_per_customer), worth its own declared contract.


@query(
    "topk_orders_with_ties",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC) AS rk
      FROM orders
    )
    WHERE rk <= 3
    ORDER BY o_custkey, rk, o_orderkey
    """,
)
def topk_orders_with_ties(spark, sf_dir):
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        orders.withColumn("rk", F.rank().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk", "o_orderkey")
    )


# Activity heatmap: hour-of-day × day-of-week event counts — the dashboard
# usage-pattern pivot, ISO day numbers on both engines.


@query(
    "activity_heatmap",
    oracle="""
    SELECT CAST(isodow(ts) AS BIGINT) AS dow, CAST(hour(ts) AS BIGINT) AS hr,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY isodow(ts), hour(ts)
    ORDER BY dow, hr
    """,
)
def activity_heatmap(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.expr("(dayofweek(ts) + 5) % 7 + 1").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hr")
    )
