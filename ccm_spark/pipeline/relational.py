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


def customers_no_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation count + balance of customers who never placed a 1-URGENT
    order (left anti join). The priority filter pushes down to the orders
    scan and the key side reduces to distinct custkeys first (map-side
    combine), so the anti join shuffles one row per matching customer, not
    one per order; the nation dim broadcasts."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    urgent_custs = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    calm = customer.join(urgent_custs, "c_custkey", "left_anti")
    return (
        calm.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            calm.c_nationkey == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("c_acctbal").alias("sum_acctbal"),
        )
    )


def parts_no_bulk_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand count + average retail price of parts with no bulk return
    (no lineitem with returnflag 'R' and quantity >= 40) — left anti join
    against the filtered, distinct-keyed lineitem side."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    bulk_returned = (
        lineitem.where((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 40))
        .select(F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    clean = part.join(bulk_returned, "p_partkey", "left_anti")
    return clean.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.avg("p_retailprice").alias("avg_retail"),
    )


def top_customers_by_nation(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-k customers by total order value within each nation.

    The tiny nation dim broadcasts; customer is deliberately NOT
    broadcast-hinted — at TPC-H scale it is 150k rows × sf (15M rows at
    sf100) and a forced broadcast OOMs executors, while the orders side is
    already reduced to one row per custkey, so AQE picks broadcast when
    customer is genuinely small and a shuffle join when it isn't. Top-k is
    a rank window per nation (never a global sort of the fact table).
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
            customer.select("c_custkey", "c_name", "c_nationkey"),
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


def shipping_priority(
    spark: SparkSession,
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-30",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped: top-k not-yet-shipped orders by pending revenue
    for one market segment — the classic 3-way fact⋈fact⋈dim plan.

    Both date predicates push down to the parquet scans (orders placed
    before the cutoff, lineitems shipping after it); the segment filter
    reduces customer to a key relation BEFORE the join so only custkeys
    travel; the revenue aggregate groups on (orderkey, orderdate,
    orderpriority) with map-side combine; the final top-k is the
    two-phase local/global rank (never a global sort), ordered by
    round6(revenue) DESC so the rank is stable across engines, ties by
    orderkey.
    """
    cut = F.lit(cutoff).cast("timestamp_ntz")
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == segment)
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    line = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cut)
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    agg = (
        line.join(orders, line.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev").alias("revenue"))
    )
    order = [
        F.round(F.col("revenue"), 6).desc(),
        F.col("o_orderkey").asc(),
    ]
    local_w = Window.partitionBy("split_id").orderBy(*order)
    survivors = (
        agg.withColumn("split_id", F.spark_partition_id())
        .withColumn("lr", F.row_number().over(local_w))
        .where(F.col("lr") <= k)
    )
    w = Window.orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("rank").cast("int").alias("rank"),
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            # round at the boundary (repo discipline): the raw SUM is
            # addition-order dependent, so the emitted relation would
            # not be cross-engine replay-exact
            (F.round("revenue", 6) + F.lit(0.0)).alias("revenue"),
        )
    )


def local_supplier_volume(
    spark: SparkSession,
    sf_dir: str,
    region: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5-shaped: per-nation revenue from orders where the
    customer and the supplier share the nation, for one region and one
    order-date year — the classic 6-way snowflake join.

    Join order matters at 100 TB and is declared smallest-out: region
    (5 rows) prunes nation (25), both broadcast; customer and supplier
    reduce to (key → nationkey) projections; lineitem⋈orders carries
    the only fact-fact shuffle; the customer-nation == supplier-nation
    predicate applies as a join condition (not a post-filter), so
    mismatched rows never reach the aggregate. Revenue rounds at the
    boundary (cross-engine replay discipline); ties in the ordering
    cannot occur (nation is the group key).
    """
    nation = load_table(spark, sf_dir, "nation")
    region_df = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == region
    )
    nations = F.broadcast(
        nation.join(
            F.broadcast(region_df.select("r_regionkey")),
            nation.n_regionkey == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(nations, F.col("c_nationkey") == nations.n_nationkey)
        .select("c_custkey", F.col("n_nationkey").alias("c_nat"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nations, F.col("s_nationkey") == nations.n_nationkey)
        .select("s_suppkey", F.col("n_nationkey").alias("s_nat"), "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    joined = (
        line.join(orders, line.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (line.l_suppkey == supp.s_suppkey)
            & (F.col("c_nat") == F.col("s_nat")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg((F.round(F.sum("rev"), 6) + F.lit(0.0)).alias("revenue"))
        .select(F.col("n_name").alias("nation"), "revenue")
    )


def promo_revenue(
    spark: SparkSession,
    sf_dir: str,
    date_from: str = "1996-09-01",
    date_to: str = "1996-10-01",
) -> DataFrame:
    """TPC-H Q14-shaped: the share of one month's revenue that shipped
    promotional parts — ``promo_pct`` plus the item count that fed it
    (the non-vacuity witness). One row out.

    100 TB shape: the shipdate window pushes down to the lineitem scan
    (a month of a 7-year table prunes ~99% of row groups on min/max
    stats); ``part`` reduces to a (p_partkey, is_promo) projection and
    broadcasts, so the only wide work is one scan and one partial-agg
    exchange of a single row. Revenue rounds at the boundary (the
    local_supplier_volume discipline; the synthetic prices are
    2-decimal-exact doubles, sums drift ~1e-15·n relative, far inside
    round6 at this magnitude).
    """
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
        )
    )
    line = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
        )
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            ),
        )
    )
    joined = line.join(part, line.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("is_promo"), F.col("rev")).otherwise(0.0))
                / F.sum("rev"),
                6,
            )
            + F.lit(0.0)
        ).alias("promo_pct"),
        F.count("*").alias("n_items"),
    )


def large_volume_customers(
    spark: SparkSession,
    sf_dir: str,
    min_qty: int = 300,
) -> DataFrame:
    """TPC-H Q18-shaped: customers whose single orders moved more than
    ``min_qty`` units — the full qualified set (no LIMIT: the
    threshold itself is the selectivity knob, and an unlimited
    deterministic relation hashes cleanly).

    100 TB shape: the per-order quantity sum partial-aggregates
    map-side (lineitem collapses to one row per order BEFORE its
    exchange), the HAVING filter runs before any join so only the
    rare qualified orders (threshold-tunable; 46 of 30k orders at the
    default) ever reach the fact-fact side, and that tiny relation
    BROADCASTS into orders and then customer — Q18's famous
    three-table join never shuffles orders or customer at all.
    ``total_qty`` is exact: l_quantity is integer-valued throughout
    the synthetic data (verified at sf0.1), so the double sum is
    drift-free and casts losslessly to BIGINT.
    """
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    # filter on the RAW double sum, convert with an explicit floor
    # afterwards — both mirrored in the twin, so the two engines stay
    # in lockstep even if a future data generation makes quantity sums
    # non-integral (double->BIGINT casts diverge: Spark truncates,
    # DuckDB rounds)
    big = (
        line.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_tq"))
        .where(F.col("_tq") > min_qty)
        .select(
            "l_orderkey",
            F.floor("_tq").cast("long").alias("total_qty"),
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    qualified = orders.join(
        F.broadcast(big), orders.o_orderkey == big.l_orderkey
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
             "total_qty")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return cust.join(
        F.broadcast(qualified), cust.c_custkey == qualified.o_custkey
    ).select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "o_totalprice",
        "total_qty",
    )
