"""Join extensions (as-of / range / semi / anti / set ops) and
aggregation extensions (rollup / cube / pivot / percentiles / sketches)."""

import pytest
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import aggregates, joins
from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string


def test_asof_join_picks_latest_at_or_before(spark):
    orders = spark.createDataFrame(
        [
            (1, 100, "F", 10.0, "2020-01-01 00:00:00", "1-URGENT"),
            (2, 100, "F", 20.0, "2020-02-01 00:00:00", "1-URGENT"),
            (3, 200, "F", 30.0, "2020-03-01 00:00:00", "1-URGENT"),
        ],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    events = spark.createDataFrame(
        [
            (1, "2020-01-15 00:00:00", 100),  # after order 1, before order 2
            (2, "2020-02-01 00:00:00", 100),  # exactly at order 2 -> order 2
            (3, "2019-12-31 00:00:00", 100),  # before any order -> NULL
            (4, "2020-06-01 00:00:00", 200),  # after order 3
            (5, "2020-06-01 00:00:00", 999),  # user with no orders -> NULL
        ],
        ["event_id", "ts", "user_id"],
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: r["asof_orderkey"]
        for r in joins.asof_join_events_orders(events, orders).collect()
    }
    assert got == {1: 1, 2: 2, 3: None, 4: 3, 5: None}


def test_asof_join_tie_break_same_instant(spark):
    """Two orders at the same (customer, timestamp): highest orderkey wins."""
    orders = spark.createDataFrame(
        [
            (7, 100, "F", 10.0, "2020-01-01 00:00:00", "x"),
            (9, 100, "F", 20.0, "2020-01-01 00:00:00", "x"),
        ],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    events = spark.createDataFrame(
        [(1, "2020-01-02 00:00:00", 100)], ["event_id", "ts", "user_id"]
    ).withColumn("ts", F.to_timestamp("ts"))
    [row] = joins.asof_join_events_orders(events, orders).collect()
    assert row["asof_orderkey"] == 9


def test_asof_join_row_count_equals_events(tables):
    ev, orders = tables["events"], tables["orders"]
    assert joins.asof_join_events_orders(ev, orders).count() == ev.count()


def test_activity_after_signup_bounds(tables):
    df = joins.activity_after_signup(tables["events"]).collect()
    assert len(df) > 0
    # every in-window count is at least the signup event itself
    assert all(r["n_events"] >= 1 for r in df)


def test_anti_semi_partition_users(tables):
    customer, events = tables["customer"], tables["events"]
    without = joins.customers_without_events(customer, events)
    with_purch = joins.customers_with_purchases(customer, events)
    n_users = events.select("user_id").distinct().count()
    assert without.count() == customer.count() - n_users
    # semi join result is a subset of event users
    assert with_purch.count() <= n_users
    # plan shape: semi/anti, never inner+distinct
    assert "LeftSemi" in plan_string(with_purch)
    assert "LeftAnti" in plan_string(without)


def test_set_ops(tables):
    ev = tables["events"]
    inter = joins.purchasers_also_erroring(ev)
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    assert inter.count() <= purch.count()
    days = joins.order_days_without_shipments(tables["orders"], tables["lineitem"])
    # set difference: no day in the result ever appears among ship days
    ship_days = {r["d"] for r in tables["lineitem"].select(F.to_date("l_shipdate").alias("d")).distinct().collect()}
    assert all(r["d"] not in ship_days for r in days.collect())


def test_rollup_grand_total(tables):
    roll = aggregates.revenue_rollup(tables["orders"], tables["customer"]).collect()
    grand = [r for r in roll if r["c_mktsegment"] is None and r["o_orderpriority"] is None]
    assert len(grand) == 1
    assert grand[0]["n_orders"] == tables["orders"].count()
    # segment subtotals sum to the grand total
    seg_rows = [r for r in roll if r["c_mktsegment"] is not None and r["o_orderpriority"] is None]
    assert sum(r["n_orders"] for r in seg_rows) == grand[0]["n_orders"]


def test_cube_has_all_grouping_sets(tables):
    cube = aggregates.lineitem_cube(tables["lineitem"]).collect()
    shapes = {(r["l_returnflag"] is None, r["l_linestatus"] is None) for r in cube}
    assert shapes == {(False, False), (False, True), (True, False), (True, True)}


def test_pivot_counts_match_total(tables):
    ev = tables["events"]
    piv = aggregates.event_type_pivot(ev)
    total = piv.select(
        sum(F.sum(c) for c in aggregates.EVENT_TYPES).alias("t")
    ).head()["t"]
    assert total == ev.count()


def test_percentiles_ordered(tables):
    rows = aggregates.order_value_percentiles(tables["orders"], tables["customer"]).collect()
    assert rows and all(r["p50"] <= r["p90"] for r in rows)


def test_approx_stats_accuracy(tables):
    ev = tables["events"]
    approx = {r["event_type"]: r for r in aggregates.approx_event_value_stats(ev).collect()}
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for et, e in exact.items():
        a = approx[et]
        assert abs(a["approx_users"] - e["users"]) <= max(2, 0.05 * e["users"])
        if e["p50"] is not None:
            assert abs(a["approx_p50_value"] - e["p50"]) <= max(0.5, 0.1 * abs(e["p50"]))


def test_priority_late_shipments_semi_semantics(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import analytics

    df = analytics.priority_late_shipments(tables["orders"], tables["lineitem"])
    rows = df.collect()
    assert sum(r["n_late_orders"] for r in rows) <= tables["orders"].count()


def test_customer_order_distribution_total(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import analytics

    df = analytics.customer_order_distribution(tables["customer"], tables["orders"])
    assert df.agg(F.sum("n_customers")).head()[0] == tables["customer"].count()


def test_salted_sum_matches_unsalted(tables):
    exact = {
        r["o_orderpriority"]: r["t"]
        for r in tables["orders"].groupBy("o_orderpriority").agg(F.sum("o_totalprice").alias("t")).collect()
    }
    salted = {
        r["o_orderpriority"]: r["total"]
        for r in aggregates.salted_sum(tables["orders"], "o_orderpriority", "o_totalprice").collect()
    }
    assert set(salted) == set(exact)
    for k in exact:
        assert abs(salted[k] - exact[k]) < 1e-6 * max(1.0, abs(exact[k]))
