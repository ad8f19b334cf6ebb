"""Gold-zone analytics suite (pipeline G5, reference README.md:357-408).

The reference's three showcase Athena queries, re-expressed as DataFrame
dataflows over the driver's tables, plus the wider aggregation/join suite
a production lake needs. Semantics preserved exactly (SURVEY.md §7.4):

- funnel: exact COUNT(DISTINCT), never approx (A1).
- conversion: LEFT join to a DISTINCT subquery, then COUNT(DISTINCT) over
  the nullable right key — NULL-skipping count semantics (J2/A2).
- top-k: orderBy desc + limit -> Spark plans TakeOrderedAndProject (O2).

Scale notes: dimension sides (customer/part/nation) are broadcast — at
100 TB the fact tables shuffle only for their aggregations, never to
co-locate a dim join. All money aggregates round(2) for stable
cross-engine comparison (SURVEY.md §7.4 hard part 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(events: DataFrame) -> DataFrame:
    """Event funnel: distinct users per event type, busiest first
    (reference README.md:363-369; operators A1+O1).

    Exact distinct -> Spark rewrites to a two-phase aggregate (partial
    distinct per partition, then final); one shuffle on event_type.
    """
    return (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("sessions"))
        .orderBy(F.desc("sessions"), "event_type")
    )


def conversion_by_segment(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Conversion rate by customer segment (reference README.md:373-390;
    operators C1+A4+J2+A2).

    The reference computes conversion by traffic source via
    ``fact_events LEFT JOIN (SELECT DISTINCT session_id ... 'purchase')``;
    here the grouping attribute (mktsegment) lives on the customer
    dimension. Shape preserved: LEFT join to the distinct-purchasers
    subquery, COUNT(DISTINCT right-key) skips NULLs — an innocent
    refactor to leftsemi would change the output.

    customer is small relative to events -> broadcast both joins; the only
    shuffles are the two distinct aggregations.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"))
        .distinct()
    )
    return (
        events.join(F.broadcast(customer), events.user_id == customer.c_custkey, "inner")
        .join(F.broadcast(purchases), events.user_id == purchases.p_user_id, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.countDistinct("p_user_id").alias("buyers"),
        )
        .withColumn(
            "conversion_rate_pct",
            F.round(100.0 * F.col("buyers") / F.col("users"), 4),
        )
        .orderBy("c_mktsegment")
    )


def top_categories_by_revenue(lineitem: DataFrame, part: DataFrame, k: int = 10) -> DataFrame:
    """Top product categories by revenue (reference README.md:394-402;
    operators J1+A3+O2).

    fact(lineitem) ⋈ dim(part) -> broadcast hash join, no fact shuffle for
    the join; one shuffle for the category aggregate; top-k planned as
    TakeOrderedAndProject (no global sort materialization).
    """
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey, "inner")
        .groupBy("p_type")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "p_type")
        .limit(k)
    )


def distinct_purchasers(events: DataFrame) -> DataFrame:
    """DISTINCT projection of purchase users (reference README.md:375-379;
    operators P5+A4): filter pushes to the scan, distinct is one shuffle."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .orderBy("user_id")
    )


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): the canonical wide
    aggregate — sum/avg/count per flag pair. Extension beyond the
    reference's SUM-only surface (SURVEY.md §2.4 'absent' list).

    Partial aggregation happens map-side; the shuffle carries only
    (few-groups x few-aggregates) rows — this is the pattern that keeps
    100 TB aggregations cheap.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """Revenue by customer nation: the star-schema multi-join
    (fact_order_items ⋈ fact_orders ⋈ dim_customer ⋈ dim_nation).

    Join order: lineitem ⋈ orders shuffles on the shared order key (the
    only big-big join, co-partitioned); customer and nation broadcast.
    """
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def top_customers_by_spend(orders: DataFrame, customer: DataFrame, k: int = 10) -> DataFrame:
    """Top-k customers by total order value: aggregate-then-join.

    Aggregating orders BEFORE joining the customer dimension shrinks the
    join input from |orders| to |customers| — the aggregate-pushdown
    pattern that matters at scale.
    """
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        F.count(F.lit(1)).alias("order_count"),
    )
    return (
        spend.join(F.broadcast(customer), spend.o_custkey == customer.c_custkey)
        .select("c_custkey", "c_name", "c_mktsegment", "total_spend", "order_count")
        .orderBy(F.desc("total_spend"), "c_custkey")
        .limit(k)
    )


def daily_order_stats(orders: DataFrame) -> DataFrame:
    """Orders per day with min/max/avg value: date derivation (F2/P4)
    feeding a grouped aggregate — the partitioned-write key candidate
    (reference README.md:288 contemplates monthly partitioning)."""
    return (
        orders.withColumn("order_date", F.to_date("o_orderdate"))
        .groupBy("order_date")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("gmv"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_order_value"),
            F.round(F.min("o_totalprice"), 2).alias("min_order_value"),
            F.round(F.max("o_totalprice"), 2).alias("max_order_value"),
        )
        .orderBy("order_date")
    )


def union_event_streams(events_a: DataFrame, events_b: DataFrame) -> DataFrame:
    """UNION ALL of two event streams by column name (operator U1,
    generate_clickstream.py:82/:272 appends two session families)."""
    return events_a.unionByName(events_b)


def priority_late_shipments(orders: DataFrame, lineitem: DataFrame, days: int = 60) -> DataFrame:
    """Orders with at least one slow shipment (> ``days`` after order
    date), counted per priority — the EXISTS-subquery shape (cf. TPC-H
    Q4) planned as a LEFT SEMI join: the probe ships only distinct order
    keys, and order rows are never duplicated by multi-item matches."""
    late = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        lineitem.l_orderkey == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.timestamp_add("DAY", F.lit(days), F.col("o_orderdate")))
    return (
        orders.join(
            late.select(F.col("l_orderkey").alias("k")),
            orders.o_orderkey == F.col("k"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Distribution of customers by order count, INCLUDING zero-order
    customers (cf. TPC-H Q13): left join + count of the nullable right
    key, then a second tiny aggregation over the counts."""
    per_customer = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))  # count skips NULLs
    )
    return (
        per_customer.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


def order_value_histogram(orders: DataFrame, bucket_width: float = 50_000.0) -> DataFrame:
    """Fixed-width histogram of order values: bucket index via floor
    division (pure map-side expression), count per bucket."""
    return (
        orders.select(
            F.floor(F.col("o_totalprice") / bucket_width).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("bucket_low", F.round(F.col("bucket") * bucket_width, 2))
        .select("bucket", "bucket_low", "n_orders")
        .orderBy("bucket")
    )


def monthly_gmv(orders: DataFrame) -> DataFrame:
    """Monthly GMV: date_trunc to month grain, one hash aggregate. The
    natural partition key for the gold zone's optional monthly layout
    (reference README.md:288)."""
    return (
        orders.groupBy(F.date_trunc("MONTH", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("gmv"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("month")
    )


def gmv_day_over_day(orders: DataFrame) -> DataFrame:
    """Daily GMV with the previous day's value and delta (lag window
    over the date-ordered daily aggregate — the aggregate is tiny, so
    the single-partition window runs on day-count rows, not orders)."""
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("gmv")
    )
    w = Window.orderBy("d")
    return (
        daily.withColumn("prev_gmv", F.lag("gmv").over(w))
        .withColumn("delta", F.round(F.col("gmv") - F.col("prev_gmv"), 2))
        .orderBy("d")
    )


def customer_recent_orders(orders: DataFrame, n: int = 3) -> DataFrame:
    """Per customer: total orders and the n most recent order keys as a
    sorted array — collect_list/sort/slice array pipeline (one shuffle
    on the customer key; arrays bounded by slice so driver rows stay
    small even for whale customers)."""
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("o_orderdate").alias("d"),
                                F.col("o_orderkey").alias("k"),
                            )
                        )
                    )
                ),
                1,
                n,
            ).alias("recent"),
        )
        .select(
            "o_custkey",
            "n_orders",
            F.transform("recent", lambda r: r["k"]).alias("recent_orderkeys"),
        )
        .orderBy("o_custkey")
    )


def revenue_by_supplier_region(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Revenue attributed to the supplier's region: fact joined through
    the supplier -> nation -> region dimension chain. All three dims
    broadcast (they are catalog-tiny); the fact table never shuffles
    before the final aggregate."""
    dims = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "r_name")
    )
    return (
        lineitem.join(F.broadcast(dims), lineitem.l_suppkey == dims.s_suppkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "r_name")
    )
