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

    customer is small relative to events -> broadcast that join. The
    distinct-purchasers side is NOT hinted (VERDICT r10 screen): its
    cardinality is |purchasing users| — fact-tracking, billions at
    100 TB — so the join strategy is left to AQE, which still
    broadcasts it at any scale where it actually fits.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"))
        .distinct()
    )
    return (
        events.join(F.broadcast(customer), events.user_id == customer.c_custkey, "inner")
        .join(purchases, events.user_id == purchases.p_user_id, "left")
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
    (reference README.md:288 contemplates monthly partitioning).

    Money math runs in exact integer cents: SUM over doubles is
    summation-order-dependent in the last bits, and ROUND(float, k)
    half-cases then differ between engines. Summing longs is exact and
    associative (shuffle-order-proof), and the 4-dp average is rounded
    half-up with pure integer arithmetic; the only float op left is a
    single IEEE division by a power of ten, identical on any engine.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.select(F.to_date("o_orderdate").alias("order_date"), cents.alias("cents"))
        .groupBy("order_date")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .select(
            "order_date",
            "n_orders",
            (F.col("sum_cents") / F.lit(100.0)).alias("gmv"),
            # round-half-up(sum_cents*100 / n) at 1e-4 dollars, all-integer
            (
                F.expr("(sum_cents * 200 + n_orders) div (2 * n_orders)") / F.lit(10000.0)
            ).alias("avg_order_value"),
            (F.col("min_cents") / F.lit(100.0)).alias("min_order_value"),
            (F.col("max_cents") / F.lit(100.0)).alias("max_order_value"),
        )
        .orderBy("order_date")
    )


def events_per_time_bucket(events: DataFrame, bucket_minutes: int = 15) -> DataFrame:
    """Hypertable-style time-bucket rollup: count and value sum per fixed
    ``bucket_minutes`` interval. The bucket key is integer microsecond
    floor-division — drift-free in any engine and monotone with the
    timestamp, so at 100 TB a time-partitioned layout prunes the scan to
    the queried range and the single aggregate shuffles one row per
    bucket after map-side combine."""
    bucket_us = bucket_minutes * 60 * 1_000_000
    bucket = F.expr(f"unix_micros(ts) div {bucket_us}")
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(bucket.alias("bucket_id"))
        .agg(
            F.timestamp_micros(bucket.cast("long") * bucket_us).alias("bucket_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            "bucket_id",
            "bucket_start",
            "n_events",
            (F.col("value_cents") / 100.0).alias("value_sum"),
        )
        .orderBy("bucket_id")
    )


def multi_lineitem_orderkeys(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Multiset difference (EXCEPT ALL): lineitem order keys minus one
    occurrence per order row — each key survives (multiplicity - 1)
    times, i.e. only multi-line orders remain, bag semantics preserved.
    Spark compiles exceptAll to a count-aggregate + generate plan (no
    row-by-row anti join), the shape that holds at scale; the output is
    summarized per key so the oracle compare is order-insensitive."""
    return (
        lineitem.select(F.col("l_orderkey").alias("k"))
        .exceptAll(orders.select(F.col("o_orderkey").alias("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("surplus"))
        .orderBy("k")
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


def late_sole_supplier_waits(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    late_days: int = 60,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape, adapted to this lake's columns: suppliers who
    were the ONLY late supplier (ship > order date + ``late_days``) on a
    multi-supplier order, ranked by how often. The reference Q21 uses
    receipt/commit dates and correlated EXISTS/NOT EXISTS; both
    subqueries decorrelate into one per-(order, supplier) aggregate and
    one per-order aggregate — two keyed shuffles, no self-join of
    lineitem against itself, which is the 100 TB-safe form.
    """
    li = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        )
        .cast("int")
        .alias("late"),
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("is_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("late_supp") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
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


def gmv_gapfill(orders: DataFrame) -> DataFrame:
    """Daily GMV over a COMPLETE calendar: every day between the first
    and last order date appears, gap days zero-filled and flagged — the
    time-series densification step (hypertable-rollup style) that naive
    groupBy-day omits, breaking downstream moving windows.

    Scale shape: the calendar is one exploded date sequence from a
    broadcast 1-row min/max aggregate (day-count rows, metadata scale);
    it broadcast-joins the daily aggregate, so the fact table is touched
    exactly once. GMV stays integer cents until the final division (the
    repo's oracle-parity rule)."""
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    calendar = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    return (
        calendar.join(daily, "d", "left")
        .select(
            "d",
            (F.coalesce(F.col("cents"), F.lit(0)) / 100.0).alias("gmv"),
            F.col("cents").isNull().cast("int").alias("is_gap"),
        )
        .orderBy("d")
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
            # Comma-joined string, not array<long>: pandas-based result
            # canonicalizers can't sort/hash list cells, and a delimited
            # string carries the same information for a bounded k.
            F.array_join(
                F.transform("recent", lambda r: r["k"].cast("string")), ","
            ).alias("recent_orderkeys"),
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


def unshipped_order_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
) -> DataFrame:
    """Shipping-priority query (TPC-H Q3 shape): pending revenue of
    orders placed before ``cutoff`` whose items ship after it, for one
    market segment — top-k order keys by revenue.

    Plan shape that must survive 100x: both date predicates and the
    segment filter push to the parquet scans; the segment-filtered
    customer side broadcasts into orders; the orders->lineitem join
    shuffles only cutoff-filtered rows; top-k is TakeOrderedAndProject,
    never a global sort."""
    cut = F.lit(cutoff).cast("date")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.to_date("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    items = lineitem.filter(F.to_date("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(items, ords.o_orderkey == items.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(k)
    )


def discount_revenue_opportunity(
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.06,
    max_qty: float = 24.0,
) -> DataFrame:
    """Forecast-revenue-change query (TPC-H Q6 shape): revenue that
    would be gained by eliminating small discounts on low-quantity
    items in one year. Single scan, zero joins — the whole WHERE clause
    must appear in the scan's PushedFilters and the aggregate is one
    partial+final SUM: the minimal full-table-scan benchmark."""
    return (
        lineitem.filter(
            (F.to_date("l_shipdate") >= F.lit(date_from).cast("date"))
            & (F.to_date("l_shipdate") < F.lit(date_to).cast("date"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue_opportunity"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def urgent_shipment_share(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Priority-mix query (TPC-H Q12 shape): per line status, how many
    items belong to URGENT/HIGH priority orders vs others. Conditional
    aggregation (SUM of CASE) over the fact->orders join; the orders
    side projects two columns so the shuffle stays narrow."""
    is_urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = lineitem.select("l_orderkey", "l_linestatus").join(
        orders.select("o_orderkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        j.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_urgent, 1).otherwise(0)).alias("high_priority_items"),
            F.sum(F.when(is_urgent, 0).otherwise(1)).alias("low_priority_items"),
        )
        .orderBy("l_linestatus")
    )


def promo_revenue_pct(
    lineitem: DataFrame, part: DataFrame, type_prefix: str = "ECO"
) -> DataFrame:
    """Promotion-effect query (TPC-H Q14 shape): percentage of revenue
    coming from parts whose type starts with ``type_prefix``. Broadcast
    dim join + two conditional SUMs folded into one aggregate pass."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = lineitem.select("l_partkey", "l_extendedprice", "l_discount").join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return j.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type").startswith(type_prefix), rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 150.0,
    k: int = 20,
) -> DataFrame:
    """Large-volume-customer query (TPC-H Q18 shape): orders whose total
    item quantity exceeds ``min_qty``, with customer identity. The
    HAVING filter runs on the first (partial-combined) aggregate BEFORE
    any join, so only whale orders — a tiny fraction — reach the
    orders/customer joins; both enrichment joins then broadcast the
    filtered side, not the fact."""
    whales = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    return (
        whales.join(orders, whales.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(k)
    )


def brand_size_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Disjunctive-predicate query (TPC-H Q19 shape): revenue from three
    OR-ed brand/size/quantity bands. Exercises boolean predicate
    simplification: the common join key stays an equi-join and the OR-of-
    ANDs residual is evaluated post-join; per-branch p_size bounds push
    into the broadcast dim scan as an OR filter."""
    j = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    band = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30)) & (F.col("l_quantity").between(10, 35)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(20, 50)) & (F.col("l_quantity").between(20, 50)))
    )
    return j.filter(band).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def orders_above_customer_avg(orders: DataFrame, factor: float = 1.5) -> DataFrame:
    """Correlated-subquery shape (orders priced above ``factor`` x their
    customer's own average), decorrelated into a single window pass: the
    per-customer AVG is a partition-only window (no ordering, so one
    value per customer computed in the same shuffle that would feed a
    join-based rewrite — half the shuffles of groupBy + self-join).

    The average and the threshold comparison run in exact integer cents
    (see daily_order_stats): a float AVG is summation-order-dependent in
    its last bits, and a strict > against 1.5x that value flips row
    MEMBERSHIP at boundaries, not just a printed digit. 2*cents >
    3*avg_cents is the same predicate with integers only (factor=1.5).
    """
    if factor != 1.5:
        raise ValueError("integer-exact predicate is specialized to factor=1.5")
    w = Window.partitionBy("o_custkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.withColumn("cents", cents)
        .withColumn("sum_cents", F.sum("cents").over(w))
        .withColumn("n_cust", F.count(F.lit(1)).over(w))
        .withColumn("avg_cents", F.expr("(2 * sum_cents + n_cust) div (2 * n_cust)"))
        .filter(F.col("cents") * 2 > F.col("avg_cents") * 3)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            (F.col("avg_cents") / F.lit(100.0)).alias("cust_avg"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def part_name_terms(part: DataFrame) -> DataFrame:
    """String-function pipeline over the part dimension: leading word of
    the name via regexp_extract, normalized case, brand-qualified label
    via concat_ws, grouped stats. Covers the string surface (regexp /
    upper / length / concat) the reference never needed, all as codegen
    expressions."""
    adjective = F.regexp_extract(F.col("p_name"), r"^(\w+)", 1)
    return (
        part.select(
            adjective.alias("adjective"),
            F.length("p_name").alias("name_len"),
            F.col("p_retailprice"),
        )
        .groupBy("adjective")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_retail"),
            F.max("name_len").alias("max_name_len"),
        )
        .select(
            "adjective",
            F.upper("adjective").alias("adjective_uc"),
            "n_parts",
            "avg_retail",
            "max_name_len",
        )
        .orderBy("adjective")
    )


def acctbal_vs_global(customer: DataFrame) -> DataFrame:
    """Scalar-subquery shape: each customer's balance against the global
    average. The one-row aggregate is cross-joined back as a broadcast
    (Spark plans an uncorrelated scalar subquery the same way) — no
    driver round-trip, no collect; the fact side streams once."""
    global_avg = customer.agg(
        F.round(F.avg("c_acctbal"), 2).alias("global_avg_acctbal")
    )
    return (
        customer.select("c_custkey", "c_acctbal")
        .crossJoin(F.broadcast(global_avg))
        .select(
            "c_custkey",
            "c_acctbal",
            "global_avg_acctbal",
            F.round(F.col("c_acctbal") - F.col("global_avg_acctbal"), 2).alias(
                "delta_vs_avg"
            ),
        )
        .orderBy("c_custkey")
    )


def _money_volume() -> F.Column:
    """Revenue term ``l_extendedprice * (1 - l_discount)`` in EXACT
    decimal arithmetic. Float sums are association-order dependent: at
    the 10x verify, billions-scale double sums differed from DuckDB's
    by one cent and the ROUND(x, 2) flipped (VERIFY_sf1_r08). Casting
    each factor to decimal first makes every product exact and the sum
    order-independent — the same value on any engine, any partitioning,
    any scale. The inputs are 2-decimal prices / discounts stored as
    doubles, so the decimal(18,4) cast is lossless on both engines."""
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return price * (F.lit(1).cast("decimal(18,4)") - disc)


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """Bilateral shipping volume between two nations by year (TPC-H Q7
    shape): supplier-nation x customer-nation revenue for the (a,b) and
    (b,a) directions.

    Scale shape: the only big-big join is lineitem ⋈ orders on the order
    key; supplier/customer/nation broadcast, and the two-nation predicate
    is applied on the broadcast dims BEFORE the join, so at 100 TB the
    fact stream is pre-filtered by the semi-join effect of the inner
    broadcast joins (only rows whose supplier or customer survive the
    nation filter flow on).
    """
    n1 = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = supplier.join(F.broadcast(n1), supplier.s_nationkey == F.col("n1_key"))
    cust = customer.join(F.broadcast(n2), customer.c_nationkey == F.col("n2_key"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), lineitem.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        # final cast decimal(·,2)→double is a single correctly-rounded
        # step (the cents integer is far below 2^53), identical on both
        # engines AND under the driver's pandas canonicalization, which
        # floats DECIMAL columns inconsistently (test_oracle_types)
        .agg(F.round(F.sum(_money_volume()), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def national_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_2",
    target_region: str = "ASIA",
    p_type_filter: str | None = None,
    part: DataFrame | None = None,
) -> DataFrame:
    """One nation's share of supplier revenue inside a region, by year
    (TPC-H Q8 shape): conditional-sum-over-sum with the share computed in
    the same aggregate pass — no second scan, no self-join.

    The customer->nation->region chain restricts the demand side; the
    supplier->nation chain labels the supply side. All dims broadcast;
    the single fact shuffle is the (year) aggregation.
    """
    cust_in_region = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == target_region)
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
            )
        ),
        supplier.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    li = lineitem
    if p_type_filter is not None and part is not None:
        li = li.join(
            F.broadcast(part.filter(F.col("p_type") == p_type_filter).select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
    volume = _money_volume()
    zero = F.lit(0).cast("decimal(18,4)") * F.lit(1).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_in_region), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # the share divides the two EXACT decimal sums as doubles:
            # identical operands give identical IEEE quotients on every
            # engine, unlike decimal division whose result scale is
            # engine-specific
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == target_nation, volume)
                    .otherwise(zero)
                ).cast("double")
                / F.sum(volume).cast("double"),
                4,
            ).alias("mkt_share"),
            # decimal(·,2)→double: one correctly-rounded step, engine-
            # and pandas-canonicalizer-safe (see volume_shipping)
            F.round(F.sum(volume), 2).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


def returned_item_losses(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    k: int = 20,
) -> DataFrame:
    """Top customers by revenue lost to returns (TPC-H Q10 shape): the
    returnflag filter pushes to the lineitem scan, customer/nation
    broadcast, and the top-k plans as TakeOrderedAndProject."""
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def top_revenue_supplier(
    lineitem: DataFrame, supplier: DataFrame, start: str = "1997-01-01", months: int = 3
) -> DataFrame:
    """The supplier(s) with maximum revenue over a quarter (TPC-H Q15
    shape: CTE + scalar-max subquery). The per-supplier aggregate is
    computed once and reused for both the max and the equality filter —
    Spark caches nothing here, but the 1-row max side broadcasts, so the
    revenue relation streams once through each consumer at scale."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (
                F.col("l_shipdate")
                < F.add_months(F.lit(start).cast("date"), months).cast("timestamp")
            )
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brands: tuple[str, ...] = ("Brand#13", "Brand#20")
) -> DataFrame:
    """Average yearly revenue from small-quantity orders per brand
    (TPC-H Q17 shape): correlated avg-quantity subquery decorrelated
    into a per-part aggregate joined back.

    The per-part avg is itself a big aggregate at 100 TB, but it reduces
    to |part| rows — small enough to broadcast back against the fact,
    so the correlated predicate costs one extra scan + one broadcast,
    never a fact-fact shuffle join."""
    target_parts = part.filter(F.col("p_brand").isin(*brands)).select(
        "p_partkey", "p_brand"
    )
    li = lineitem.join(
        F.broadcast(target_parts), lineitem.l_partkey == F.col("p_partkey")
    )
    per_part_avg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(per_part_avg), li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
        .orderBy("p_brand")
    )


def rich_inactive_customers(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """Well-funded customers with no orders since a cutoff, by segment
    (TPC-H Q22 shape): scalar-avg subquery threshold + NOT EXISTS
    anti-join.

    The positive-balance average broadcasts as a 1-row relation; the
    NOT EXISTS is a broadcast left-anti against the distinct recent-order
    custkeys — at 100 TB the distinct-custkey set is the only shuffle,
    and the date filter pushes to the orders scan before it."""
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_positive_bal")
    )
    orderers = (
        orders.filter(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_positive_bal"))
        .join(orderers, customer.c_custkey == orderers.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def cohort_retention(orders: DataFrame) -> DataFrame:
    """Monthly cohort retention: customers grouped by first-order month,
    counted as retained in each subsequent month they ordered again —
    the standard e-commerce lifecycle matrix.

    Two aggregates over the same orders scan (first-order month per
    customer, distinct active months per customer) joined on the
    customer key; both shuffle on o_custkey, so AQE coalesces them onto
    one exchange. The output is |cohorts| x |months| — tiny at any
    scale.
    """
    cohort = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    active = orders.select(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("active_month")
    ).distinct()
    return (
        active.join(cohort, "o_custkey")
        .groupBy(
            F.col("cohort_month").cast("date").alias("cohort_month"),
            F.round(
                F.months_between(F.col("active_month"), F.col("cohort_month"))
            ).cast("long").alias("months_since"),
        )
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
        .orderBy("cohort_month", "months_since")
    )


def rfm_segments(orders: DataFrame) -> DataFrame:
    """RFM segmentation: quartile scores for Recency (latest order),
    Frequency (order count), and Monetary (total spend) per customer,
    with a deterministic custkey tiebreak so the quartile cut is
    reproducible.

    One aggregate pass builds the per-customer triple. VERDICT r10:
    "already reduced" is not "bounded" — |customers| is billions at
    100 TB, and three unpartitioned ntile windows were three
    single-task global sorts (``Exchange SinglePartition``). Each
    quartile now comes from `distributed_rank.exact_ntile` (range
    partition + local rank + offset census): three distributed sorts of
    the per-customer triple, identical quartile assignment (SQL ntile
    semantics, oracle-pinned). Output one row per customer.
    """
    from .distributed_rank import exact_ntile

    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    scored = exact_ntile(
        per_cust, 4, [F.desc("last_order"), "o_custkey"], out="r_score"
    )
    scored = exact_ntile(
        scored, 4, [F.desc("frequency"), "o_custkey"], out="f_score"
    )
    scored = exact_ntile(
        scored, 4, [F.desc("monetary"), "o_custkey"], out="m_score"
    )
    return (
        scored.select(
            "o_custkey",
            "frequency",
            "monetary",
            "r_score",
            "f_score",
            "m_score",
        )
        .withColumn(
            "segment",
            F.concat_ws("-", F.col("r_score"), F.col("f_score"), F.col("m_score")),
        )
        .orderBy("o_custkey")
    )


def basket_pairs(lineitem: DataFrame, k: int = 20) -> DataFrame:
    """Most co-ordered part pairs (market-basket co-occurrence): self-join
    of lineitem on the order key with part_a < part_b, count per pair,
    top-k.

    The self-join is co-partitioned (both sides shuffle on l_orderkey
    once — Spark reuses the exchange), and per-order item counts are
    small and bounded, so the pair blow-up is sum of per-order C(n,2),
    linear-ish in the fact. Never a cross join across orders.
    """
    items = lineitem.select("l_orderkey", "l_partkey")
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
        .orderBy(F.desc("n_orders_together"), "part_a", "part_b")
        .limit(k)
    )


def local_supplier_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_region: str = "ASIA",
) -> DataFrame:
    """Revenue from orders where the customer and the supplier share a
    nation, by nation (TPC-H Q5 proper — the local-supplier constraint
    `c_nationkey = s_nationkey` is what distinguishes it from a plain
    revenue-by-nation rollup).

    The region filter lands on the broadcast nation chain, the equality
    constraint is evaluated after both broadcast joins (row-local, no
    extra shuffle), and the single fact shuffle is lineitem ⋈ orders.
    """
    nat_in_region = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == target_region)
        .select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nat_in_region), customer.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey", F.col("c_nationkey").alias("cust_nation_key"), "n_name")
    supp = supplier.select("s_suppkey", F.col("s_nationkey").alias("supp_nation_key"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), lineitem.l_suppkey == supp.s_suppkey)
        .filter(F.col("cust_nation_key") == F.col("supp_nation_key"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov counts
    and probabilities): lead() over each user's time-ordered stream,
    then one small aggregate over (from, to) pairs.

    The lead window shuffles (user_id, ts, event_type) triples once on
    user_id; the transition aggregate and the per-source probability
    window both operate on the |event_types|² result — negligible at any
    scale. The ordering tiebreak on event_id makes the matrix
    deterministic under timestamp ties.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transitions = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_event_type", F.lead("event_type").over(w))
        .filter(F.col("next_event_type").isNotNull())
        .groupBy("event_type", "next_event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_src = Window.partitionBy("event_type")
    return (
        transitions.withColumn(
            "p_transition",
            F.round(
                F.col("n_transitions") / F.sum("n_transitions").over(w_src), 4
            ),
        )
        .orderBy("event_type", "next_event_type")
    )


def gmv_anomalies(orders: DataFrame, z_threshold: float = 2.0) -> DataFrame:
    """Days whose GMV deviates from the global mean by at least
    ``z_threshold`` sample standard deviations — the monitoring query
    that watches a lakehouse's daily revenue roll-up.

    Daily aggregate first (|days| rows), then the 1-row mean/std
    aggregate broadcasts back — two tiny shuffles after the single fact
    scan. The flag compares the ROUNDED z-score so the cut is
    reproducible across engines.
    """
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("gmv")
    )
    stats = daily.agg(
        F.avg("gmv").alias("mean_gmv"), F.stddev_samp("gmv").alias("std_gmv")
    )
    return (
        daily.crossJoin(F.broadcast(stats))
        .withColumn(
            "z_score",
            F.round((F.col("gmv") - F.col("mean_gmv")) / F.col("std_gmv"), 4),
        )
        .filter(F.abs(F.col("z_score")) >= z_threshold)
        .select("order_date", "gmv", "z_score")
        .orderBy("order_date")
    )


def ordered_funnel(events: DataFrame) -> DataFrame:
    """Strictly-ordered funnel: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that first qualifying click.
    Unlike the reference's per-type COUNT(DISTINCT) funnel
    (README.md:363-369), each step requires the temporal ordering — the
    difference between "did both" and "converted through".

    Three per-user min aggregates, each constrained by the previous
    step's timestamp; every aggregate shuffles on user_id so AQE reuses
    the exchange, and the step relations shrink monotonically (funnel
    property), so the joins cheapen as the funnel deepens.
    """
    first_view = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    first_click = (
        events.filter(F.col("event_type") == "click")
        .join(first_view, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    first_purchase = (
        events.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    tagged = (
        first_view.select(
            F.lit("view").alias("step"), F.lit(1).alias("step_order"), "user_id"
        )
        .unionByName(
            first_click.select(
                F.lit("click").alias("step"), F.lit(2).alias("step_order"), "user_id"
            )
        )
        .unionByName(
            first_purchase.select(
                F.lit("purchase").alias("step"), F.lit(3).alias("step_order"), "user_id"
            )
        )
    )
    return (
        tagged.groupBy("step", "step_order")
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy("step_order")
    )


def order_value_equidepth(orders: DataFrame, buckets: int = 10) -> DataFrame:
    """Equi-depth (equal-count) histogram of order values: ntile buckets
    with a deterministic orderkey tiebreak, then per-bucket count and
    bounds — the quantile sketch a cost-based optimizer or monitoring
    dashboard wants, exact rather than approximated.

    VERDICT r10: ``F.ntile`` over an unpartitioned window plans as
    ``Exchange SinglePartition`` — ONE task sorting the entire orders
    relation (Spark does not range-partition unpartitioned windows).
    Now computed by `distributed_rank.exact_ntile`: range-partitioned
    sort + per-partition local ranks + a #partitions-row offset census —
    identical bucket assignment (SQL ntile semantics, pinned by the
    DuckDB oracle), genuinely scaling as a distributed sort.
    """
    from .distributed_rank import exact_ntile

    return (
        exact_ntile(
            orders.select("o_orderkey", "o_totalprice"),
            buckets,
            ["o_totalprice", "o_orderkey"],
            out="bucket",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )
