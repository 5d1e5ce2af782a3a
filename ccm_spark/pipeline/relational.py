"""Star-schema analytics over the TPC-H-ish tables.

The reference has no relational surface (SURVEY.md §2.1), but the engine
ships one anyway: classic scan→filter→join→aggregate→top-k plans over
lineitem/orders/customer/nation, written so Catalyst produces the plan
you'd want at 100 TB — predicate + column pushdown to the parquet scan,
broadcast joins for the small dimensions, partial aggregation before the
shuffle, and rank-based top-k instead of a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ccm_spark.sources.tables import load_table


def pricing_summary(lineitem: DataFrame, cutoff_date: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1-shaped rollup: per (returnflag, linestatus) pricing stats
    for lineitems shipped before the cutoff."""
    return (
        lineitem.where(F.col("l_shipdate") < F.lit(cutoff_date).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


def top_customers_by_nation(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-k customers by total order value within each nation.

    Dimensions (customer, nation) broadcast against the orders fact; top-k
    is a rank window per nation (never a global sort of the fact table).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("total_spend"),
        F.count("*").alias("n_orders"),
    )
    joined = (
        per_cust.join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
            per_cust.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.round(F.col("total_spend"), 6).desc(), F.col("c_custkey").asc()
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            F.col("n_name").alias("nation"),
            F.col("rk").cast("int").alias("rank"),
            "c_custkey",
            "n_orders",
            "total_spend",
        )
    )
