"""Aggregation operators beyond the reference's GROUP BY + COUNT(DISTINCT)/
SUM surface (SURVEY.md §2.4 lists rollup/cube/pivot/percentiles as absent
from the reference — these are the lakehouse extensions).

Everything here is a single hash-aggregate pass with map-side partials;
rollup/cube expand the grouping sets before the shuffle, so the shuffle
carries one partial row per (group, grouping-set) — Spark's standard
expansion, no custom work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def revenue_rollup(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """ROLLUP (segment, priority): subtotals per segment and a grand
    total, in one aggregation pass."""
    j = orders.join(customer, orders.o_custkey == customer.c_custkey)
    return (
        j.rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def lineitem_cube(lineitem: DataFrame) -> DataFrame:
    """CUBE (returnflag, linestatus): all 2^2 grouping sets at once."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """PIVOT: one row per user, one count column per event type. The
    explicit value list keeps the output schema static (no extra pass to
    discover pivot values, and a stable schema at any scale)."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("user_id")
    )


def order_value_percentiles(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Exact percentiles (median / p90) of order value per segment,
    defined as nearest-rank cuts: the value at row_number ceil(q*n) under
    (o_totalprice, o_orderkey) ordering. Rank-defined percentiles pick an
    actual data value, so the emitted double is an element of the input —
    bit-identical across engines — where interpolated quantiles
    (F.percentile / quantile_cont) differ in float evaluation order.
    For 100 TB use approx_percentile and accept the documented error
    bound instead (see approx_event_value_stats)."""
    j = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "c_mktsegment", "o_totalprice", "o_orderkey"
    )
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("c_mktsegment")
    r = j.select(
        "c_mktsegment",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return (
        r.groupBy("c_mktsegment")
        .agg(
            F.max(
                F.when(F.col("rn") == F.ceil(F.col("n") * F.lit(0.5)), F.col("o_totalprice"))
            ).alias("p50"),
            F.max(
                F.when(F.col("rn") == F.ceil(F.col("n") * F.lit(0.9)), F.col("o_totalprice"))
            ).alias("p90"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


def approx_event_value_stats(events: DataFrame) -> DataFrame:
    """Sketch aggregates: HLL++ distinct users and t-digest-style
    approximate percentiles per event type. The constant-memory path for
    100 TB cardinality/quantile estimation; NOT oracle-exact by design
    (rows-only correctness check), accuracy is asserted against the
    exact aggregates in tests."""
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.round(
                F.approx_percentile("value", F.lit(0.5), F.lit(10_000)), 2
            ).alias("approx_p50_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def salted_sum(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "total",
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase SUM for skewed group keys: shuffle once on
    (group, salt) so one hot key spreads over ``n_salts`` reducers, then
    combine the n_salts partials per group (a tiny second shuffle).

    Spark's partial aggregation already combines map-side, which handles
    most skew; explicit salting is the tool for the remaining case —
    few distinct groups with enormous reduce-side state (e.g.
    collect_list / exact distinct structures), or a downstream that
    must never see a hot partition. Results are EXACTLY equal to the
    unsalted aggregate (sum is associative)."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(group_col, "__salt")
        .agg(F.sum(value_col).alias("__partial"))
    )
    return (
        partial.groupBy(group_col)
        .agg(F.sum("__partial").alias(out_col))
    )


def revenue_grouping_sets(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS ((segment), (priority)): per-dimension
    subtotals in ONE aggregation pass (vs two scans with a union) —
    the generalization of rollup/cube. Spark expands the sets before
    the shuffle exactly as for rollup; each input row contributes one
    partial per grouping set."""
    j = orders.join(customer, orders.o_custkey == customer.c_custkey)
    return (
        j.groupingSets(
            [["c_mktsegment"], ["o_orderpriority"]],
            "c_mktsegment",
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def salted_event_type_value(events: DataFrame, n_salts: int = 32) -> DataFrame:
    """Per-event-type totals via the two-phase SALTED aggregate — the
    skew tool exercised through the correctness gate: values become
    integer cents first, so the salted partial sums recombine to exactly
    the unsalted result in any engine (float partial sums would not).
    One (type, salt) shuffle spreads any hot event type over ``n_salts``
    reducers; the per-type combine is salt-count sized."""
    cents = events.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    totals = salted_sum(cents, "event_type", "cents", out_col="cents_total",
                        n_salts=n_salts)
    return totals.select(
        "event_type", (F.col("cents_total") / 100.0).alias("value_total")
    ).orderBy("event_type")
