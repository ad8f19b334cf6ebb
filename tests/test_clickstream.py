"""G6 generator invariants (FIXTURES.md §B 'generation invariants' +
SURVEY.md §5.2 property tests)."""

import pytest
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import clickstream


@pytest.fixture(scope="module")
def stream(spark, tables):
    df = clickstream.generate_clickstream(
        spark, tables["orders"], tables["lineitem"],
        max_purchase_sessions=200, num_browsing_sessions=100,
    )
    df.cache()
    yield df
    df.unpersist()


def test_funnel_sessions_end_in_one_purchase_with_real_order(stream, tables):
    funnel = stream.filter(F.col("session_id").startswith("fs-"))
    per_session = funnel.groupBy("session_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("purchases")
    )
    assert per_session.filter(F.col("purchases") != 1).count() == 0
    order_keys = {str(r[0]) for r in tables["orders"].select("o_orderkey").collect()}
    for r in funnel.filter(F.col("event_type") == "purchase").select("order_id").collect():
        assert r["order_id"] in order_keys


def test_browsing_sessions_never_convert(stream):
    browsing = stream.filter(F.col("session_id").startswith("bs-"))
    assert browsing.filter(F.col("event_type").isin("checkout", "purchase")).count() == 0
    per_session = browsing.groupBy("session_id").count().collect()
    assert all(2 <= r["count"] <= 6 for r in per_session)


def test_funnel_monotonicity(stream):
    counts = {
        r["event_type"]: r["n"]
        for r in stream.groupBy("event_type")
        .agg(F.countDistinct("session_id").alias("n"))
        .collect()
    }
    assert counts["page_view"] >= counts["view_product"]
    assert counts["add_to_cart"] >= counts["checkout"]
    assert counts["checkout"] >= counts["purchase"]


def test_event_ts_ordered_within_funnel_session(stream):
    funnel = stream.filter(F.col("session_id").startswith("fs-"))
    # purchase must be the max timestamp of its session
    mx = funnel.groupBy("session_id").agg(F.max("event_ts").alias("mx"))
    bad = (
        funnel.filter(F.col("event_type") == "purchase")
        .join(mx, "session_id")
        .filter(F.col("event_ts") != F.col("mx"))
        .count()
    )
    assert bad == 0


def test_unauthenticated_use_empty_string_not_null(stream):
    browsing = stream.filter(F.col("session_id").startswith("bs-"))
    assert browsing.filter(F.col("customer_id").isNull()).count() == 0
    assert browsing.filter(
        (F.col("is_authenticated") == 0) & (F.col("customer_id") != "")
    ).count() == 0


def test_generator_deterministic(spark, tables):
    a = clickstream.generate_clickstream(
        spark, tables["orders"], tables["lineitem"], 50, 30
    ).collect()
    b = clickstream.generate_clickstream(
        spark, tables["orders"], tables["lineitem"], 50, 30
    ).collect()
    assert a == b


def test_schema_is_thirteen_columns(stream):
    assert stream.columns == [
        "event_id", "session_id", "customer_id", "event_type", "event_ts",
        "product_id", "order_id", "device_type", "traffic_source",
        "is_authenticated", "event_date",
    ]


def test_browsing_pool_join_strategy_switches_with_pool_size(spark, tables):
    """VERDICT r5 task 3: the session->pool join must broadcast only
    while the pool fits, and become a shuffle join on the same __idx
    key past the threshold — with identical output either way (a
    10^8-row pool cannot broadcast)."""
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    orders = tables["orders"]
    bcast = clickstream.browsing_sessions(orders, num_sessions=300)
    plan_b = plan_string(bcast)
    assert "BroadcastHashJoin" in plan_b

    # past the threshold: no broadcast HINT from us; with the planner's
    # own auto-broadcast off (as it would be for a genuinely huge pool,
    # where the size estimate exceeds autoBroadcastJoinThreshold), the
    # same key plans as a shuffle join
    auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuf = clickstream.browsing_sessions(
            orders, num_sessions=300, broadcast_pool_max=0
        )
        plan_s = plan_string(shuf)
        assert "SortMergeJoin" in plan_s or "ShuffledHashJoin" in plan_s
        b = sorted(map(tuple, shuf.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto)

    a = sorted(map(tuple, bcast.collect()))
    assert a == b
