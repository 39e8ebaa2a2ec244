"""Headline relational queries over the TPC-H-ish fixture schema.

These exercise the Catalyst-native query surface the reference inherits from
siddhi-core (SURVEY.md §2.5 — joins, aggregations, windows, set ops, top-k):
we deliberately write them as declarative DataFrame plans and let Catalyst
pick the physical strategy. Scale guardrails baked in:

- Dimension joins (region/nation/supplier/customer) are explicitly
  ``broadcast()`` — at 100 TB the fact side never shuffles for them.
- Aggregates are expressed so map-side partial aggregation applies (plain
  ``groupBy().agg``; sums over decimal-cast columns for exact,
  order-independent results).
- Top-k is ``orderBy().limit(k)`` which Spark executes as TakeOrdered
  (per-partition heap + driver merge of k·partitions rows, no global sort).

Money arithmetic is cast to ``decimal(18,2)`` before aggregation: decimal
sums are exact and associative, so results are identical under any partition
order — which is also what makes them hash-comparable against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem (filter → hash agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum((_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(spark: SparkSession, sf_dir: str, segment: str = "BUILDING", top: int = 10) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join, revenue agg, deterministic top-k."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == segment)
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum((_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(top)
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str, region: str = "ASIA") -> DataFrame:
    """TPC-H Q5-shaped: snowflake join with broadcast dims, grouped revenue."""
    region_df = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == region))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    supplier = F.broadcast(_t(spark, sf_dir, "supplier"))
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supplier.s_nationkey))
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region_df, nation.n_regionkey == region_df.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum((_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue")
        )
    )


def top_orders_per_customer(spark: SparkSession, sf_dir: str, k: int = 2) -> DataFrame:
    """Window-function surface: rank orders per customer, keep top-k."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def returnflag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface: rollup counts over (returnflag, linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-aggregation surface."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.approx_count_distinct("l_partkey").alias("n_parts_approx"),
    )


def nations_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: nation keys having customers but no suppliers."""
    cust_n = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp_n = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return cust_n.exceptAll(supp_n)


def nations_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: nation keys having both customers and suppliers."""
    cust_n = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp_n = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return cust_n.intersect(supp_n)


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join surface (TPC-H Q4-shaped): orders with at least one late
    lineitem, counted by priority."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1995-06-01"))
    return (
        orders.join(li.select("l_orderkey").distinct(), orders.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: outer-join surface — how many customers placed k
    orders, including k=0 (the left-outer + double-aggregate shape)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def small_quantity_revenue(spark: SparkSession, sf_dir: str, frac: float = 0.5) -> DataFrame:
    """TPC-H Q17-shaped: correlated-aggregate surface — revenue from
    lineitems whose quantity is below ``frac`` x that part's average
    quantity, grouped by brand.

    The correlated subquery is decorrelated into a per-part aggregate +
    broadcast-friendly equi-join (what Catalyst itself does to Q17). The
    threshold compare is kept in EXACT decimal arithmetic —
    ``2*qty*cnt < sum_qty`` instead of ``qty < 0.5*avg`` — so the boundary
    cannot flip under float rounding (and the result hash-matches any
    engine computing the same rational numbers).
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    inv_frac = int(round(1.0 / frac))  # frac=0.5 → qty * 2 * cnt < sum_qty
    return (
        li.join(per_part, li.l_partkey == F.col("pk"))
        .where(_dec("l_quantity") * inv_frac * F.col("cnt") < F.col("sum_qty"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: suppliers whose revenue equals the GLOBAL maximum
    (the `create view revenue0 ... where total = (select max from view)`
    correlated-max pattern, decorrelated).

    Shape: one hash-aggregate to per-supplier revenue, then a rank-1 filter
    in EXACT decimal (ties all surface, no float boundary), then one
    broadcast join to the supplier dim. The global max never materializes a
    second scan — the window over the aggregated (tiny) per-supplier frame
    costs one single-partition pass over n_suppliers rows, not over
    lineitem.
    """
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.sum(
            (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast(
                "decimal(28,6)"
            )
        ).alias("total_revenue")
    )
    # Global max via an aggregate + broadcast equality join — NOT a global
    # rank window, which would sort every supplier in ONE partition. Exact
    # decimal equality keeps ties intact.
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    best = rev.join(F.broadcast(mx), rev.total_revenue == F.col("__mx"))
    return (
        best.join(F.broadcast(sup), F.col("sk") == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


def supplier_counts_by_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: distinct suppliers per part size, EXCLUDING
    suppliers that touched a flagged order (the NOT IN subquery as a
    broadcast anti-join; the flag predicate is arbitrary — what's exercised
    is the shape). Distinct-count aggregation stacked on an anti-join —
    both sides pruned to two columns before any exchange."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bad = li.where(F.col("l_orderkey") % 4999 == 0).select("l_suppkey").distinct()
    pairs = (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("p_size", "l_suppkey")
    )
    return pairs.groupBy("p_size").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers")
    )


def customers_without_orders(spark: SparkSession, sf_dir: str, priority: str = "1-URGENT") -> DataFrame:
    """Anti-join surface (TPC-H Q22-flavored): customers with no order of
    the given priority, counted per market segment with their total account
    balance. (Filtered to a priority class so the anti-join is non-trivial
    at every scale factor — with no filter, every customer has orders.)"""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == priority)
    return (
        cust.join(orders.select("o_custkey").distinct(), cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )
