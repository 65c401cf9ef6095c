"""Churn training dataset from the star schema (M1 feature selection).

The reference's churn predicate is "no order in the recent window"
(docs/CHURN_PREDICTION_PROCESS_LOG.md:25); on the TPC-H-ish test data we
realize it as "customer's last order predates the cutoff". Features mirror
the reference's RFM/behavioral family (src/processing/feature_engineering.py):
recency, frequency, monetary, account balance.

Scale notes: one shuffle (groupBy custkey over orders), then a broadcast-able
join back to customer (customer is the smaller side at high SF after the agg
— AQE picks broadcast when it fits). No window functions, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

# testdata orders span 1995-01-01..2001-08-01 (TESTDATA.md); this cutoff
# yields ~36% positives at every SF — comparable to a realistic churn base
CUTOFF = "2000-12-01"
REF_DATE = "2001-08-02"  # max orderdate + 1 day

FEATURE_COLS = [
    "recency_days",
    "frequency",
    "monetary",
    "avg_order_value",
    "acctbal",
]
LABEL_COL = "churn_label"


def churn_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per customer with ≥1 order: RFM features + churn label."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_order_value"),
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "inner")
        .select(
            "c_custkey",
            F.datediff(F.lit(REF_DATE), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary",
            "avg_order_value",
            F.col("c_acctbal").alias("acctbal"),
            (F.col("last_order") < F.lit(CUTOFF)).cast("int").alias(LABEL_COL),
        )
    )
