"""Join operators beyond the reference's single-key equi-joins.

The reference only ever does 2-table equi-joins (SURVEY.md §2.3, reference
README.md:385-399, generate_clickstream.py:51-52); these are the join
extensions a lakehouse engine needs for event/order analytics at scale:
as-of (time-travel lookup), range (interval containment), and semi/anti
(existence tests that never duplicate rows).

Scale notes per operator are inline; none of them collects to the driver
and every shuffle is keyed on the join key (user/customer), so skew only
arises from genuinely hot users — AQE skew-join handles that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_order_per_customer_day(orders: DataFrame) -> DataFrame:
    """One order row per (customer, order timestamp): highest orderkey
    wins. Deterministic tie-break so the as-of join below is stable."""
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    return (
        orders.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_join_events_orders(events: DataFrame, orders: DataFrame) -> DataFrame:
    """AS-OF JOIN: each event picks the customer's latest order at or
    before the event timestamp.

    Spark has no asof primitive for DataFrames; the scalable form is the
    union-tag trick: tag order rows and event rows, sort each user's
    timeline once (ts asc, orders before events at the same instant),
    and carry the order columns forward with last_value(ignorenulls).
    ONE shuffle on user — same cost as a plain equi-join — versus a
    naive range join whose candidate set explodes with history length.

    Returns one row per event: event_id, user_id, ts, asof_orderkey,
    asof_orderdate, asof_totalprice (NULL when no prior order exists).
    """
    od = latest_order_per_customer_day(orders)
    order_side = od.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        F.lit(1).alias("__is_order"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_orderdate").alias("asof_orderdate"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )
    event_side = events.select(
        "user_id",
        "ts",
        F.lit(0).alias("__is_order"),
        "event_id",
        F.lit(None).cast("long").alias("asof_orderkey"),
        F.lit(None).cast("timestamp").alias("asof_orderdate"),
        F.lit(None).cast("double").alias("asof_totalprice"),
    )
    timeline = order_side.unionByName(event_side)
    # Orders sort before events at the same timestamp (__is_order desc),
    # so an order placed exactly at the event instant is visible to it.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("__is_order").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = timeline.select(
        "event_id",
        "user_id",
        "ts",
        "__is_order",
        F.last("asof_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last("asof_orderdate", ignorenulls=True).over(w).alias("asof_orderdate"),
        F.last("asof_totalprice", ignorenulls=True).over(w).alias("asof_totalprice"),
    )
    return filled.filter(F.col("__is_order") == 0).drop("__is_order")


def activity_after_signup(events: DataFrame, hours: int = 24) -> DataFrame:
    """RANGE JOIN: per user, the events inside the interval
    [first signup, first signup + hours). Returns user_id, n_events,
    sum_value for users with >= 1 event in-window.

    With the user equi-key present, Catalyst plans a hash join on user
    and evaluates the range predicate as the join residual — no
    candidate explosion, one shuffle per side. (For interval joins
    WITHOUT an equi-key, band the time axis into `hours`-wide buckets,
    explode each interval into its touched buckets, and equi-join on
    bucket; same residual.) The interval side is one row per user —
    broadcastable whenever users fit the broadcast threshold.
    """
    signups = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
        .withColumnRenamed("user_id", "s_user_id")
    )
    j = events.join(
        signups,
        (events.user_id == signups.s_user_id)
        & (events.ts >= signups.signup_ts)
        & (events.ts < F.timestamp_add("HOUR", F.lit(hours), signups.signup_ts)),
    )
    return (
        j.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id")
    )


def customers_without_events(customer: DataFrame, events: DataFrame) -> DataFrame:
    """LEFT ANTI join: customers that never produced an event. The anti
    join ships only the distinct key set of the right side."""
    return (
        customer.join(events, customer.c_custkey == events.user_id, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def customers_with_purchases(customer: DataFrame, events: DataFrame) -> DataFrame:
    """LEFT SEMI join: customers with at least one purchase event —
    existence test that cannot duplicate customer rows (unlike an inner
    join + distinct, which shuffles the duplicates first)."""
    purchases = events.filter(F.col("event_type") == "purchase")
    return (
        customer.join(purchases, customer.c_custkey == purchases.user_id, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def purchasers_also_erroring(events: DataFrame) -> DataFrame:
    """INTERSECT: users that both purchased and hit an error."""
    a = events.filter(F.col("event_type") == "purchase").select("user_id")
    b = events.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b).orderBy("user_id")


def order_days_without_shipments(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """EXCEPT (distinct set difference): calendar days that saw an order
    but no shipment. DataFrame.subtract == SQL EXCEPT (distinct)."""
    a = orders.select(F.to_date("o_orderdate").alias("d"))
    b = lineitem.select(F.to_date("l_shipdate").alias("d"))
    return a.subtract(b).orderBy("d")
