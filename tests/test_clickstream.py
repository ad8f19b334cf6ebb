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
