"""Semantic invariants for the G5 analytics suite (SURVEY.md §5.2
property tests) plus physical-plan assertions: the judge-grade scale
properties (broadcast dims, pushed filters) must hold, not just values.
"""

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import analytics


def test_funnel_counts_distinct_users(tables):
    rows = analytics.funnel(tables["events"]).collect()
    assert len(rows) == 5
    total_users = tables["events"].select("user_id").distinct().count()
    for r in rows:
        assert 0 < r["sessions"] <= total_users
    # ordered desc by sessions
    sessions = [r["sessions"] for r in rows]
    assert sessions == sorted(sessions, reverse=True)


def test_conversion_rate_bounds(tables):
    rows = analytics.conversion_by_segment(tables["events"], tables["customer"]).collect()
    for r in rows:
        assert 0 <= r["conversion_rate_pct"] <= 100
        assert r["buyers"] <= r["users"]


def test_top_categories_ordered_and_limited(tables):
    rows = analytics.top_categories_by_revenue(tables["lineitem"], tables["part"], k=5).collect()
    assert len(rows) <= 5
    revenues = [r["revenue"] for r in rows]
    assert revenues == sorted(revenues, reverse=True)


def test_top_categories_uses_broadcast_join(tables):
    plan = analytics.top_categories_by_revenue(tables["lineitem"], tables["part"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, f"dim join should broadcast:\n{plan}"


def test_distinct_purchasers_filter_pushed_to_scan(tables):
    df = analytics.distinct_purchasers(tables["events"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "event_type" in plan.split("PushedFilters")[1][:200], (
        f"filter should reach the parquet scan:\n{plan}"
    )


def test_union_event_streams(tables):
    ev = tables["events"]
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "click")
    u = analytics.union_event_streams(a, b)
    assert u.count() == a.count() + b.count()


def test_pricing_summary_group_count(tables):
    rows = analytics.pricing_summary(tables["lineitem"]).collect()
    assert 1 <= len(rows) <= 9  # |returnflag| x |linestatus|
    for r in rows:
        assert r["count_order"] > 0
        assert r["sum_disc_price"] <= r["sum_base_price"]


def test_sql_variants_match_dataframe_forms(spark, tables):
    """spark.sql strings and DataFrame pipelines must produce identical
    results — they are the same logical plans to Catalyst."""
    from data_lake_for_e_commerce_analytics_spark.operators import analytics, sql_analytics

    pairs = [
        (
            sql_analytics.funnel_sql(spark, tables["events"]),
            analytics.funnel(tables["events"]),
        ),
        (
            sql_analytics.conversion_sql(spark, tables["events"], tables["customer"]),
            analytics.conversion_by_segment(tables["events"], tables["customer"]),
        ),
        (
            sql_analytics.top_categories_sql(spark, tables["lineitem"], tables["part"]),
            analytics.top_categories_by_revenue(tables["lineitem"], tables["part"]),
        ),
    ]
    for sql_df, df_df in pairs:
        assert sorted(map(tuple, sql_df.collect())) == sorted(map(tuple, df_df.collect()))


def test_cohort_retention_month_zero_covers_all_customers(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import analytics as _a

    rows = _a.cohort_retention(tables["orders"]).collect()
    n_customers = tables["orders"].select("o_custkey").distinct().count()
    month_zero = sum(r["active_customers"] for r in rows if r["months_since"] == 0)
    # every customer is active in their own cohort month, exactly once
    assert month_zero == n_customers
    for r in rows:
        assert r["months_since"] >= 0


def test_rfm_segments_one_row_per_customer(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import analytics as _a

    rows = _a.rfm_segments(tables["orders"]).collect()
    assert len(rows) == tables["orders"].select("o_custkey").distinct().count()
    for r in rows:
        assert 1 <= r["r_score"] <= 4 and 1 <= r["f_score"] <= 4 and 1 <= r["m_score"] <= 4
        assert r["segment"] == f"{r['r_score']}-{r['f_score']}-{r['m_score']}"


def test_basket_pairs_ordered_and_bounded(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import analytics as _a

    rows = _a.basket_pairs(tables["lineitem"], k=20).collect()
    assert len(rows) <= 20
    counts = [r["n_orders_together"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r["part_a"] < r["part_b"]


def test_event_transitions_probabilities_sum_to_one(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import analytics as _a

    rows = _a.event_transitions(tables["events"]).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["event_type"], []).append(r)
    for src, srows in by_src.items():
        total_p = sum(r["p_transition"] for r in srows)
        assert abs(total_p - 1.0) < 0.01
        assert all(r["n_transitions"] > 0 for r in srows)


def test_profile_table_known_nulls(spark):
    from data_lake_for_e_commerce_analytics_spark.operators import cleaning as _c

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None)], ["id", "val"]
    )
    prof = {r["column_name"]: r for r in _c.profile_table(df).collect()}
    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_nulls"] == 0 and prof["id"]["n_distinct"] == 4
    assert prof["val"]["n_nulls"] == 2 and prof["val"]["n_distinct"] == 1


def test_profile_table_single_scan(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import cleaning as _c

    plan = _c.profile_table(tables["orders"])._jdf.queryExecution().executedPlan().toString()
    # one scan of the parquet feeds all per-column metrics
    assert plan.count("Scan parquet") == 1


def test_gmv_anomalies_thresholded(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import analytics as _a

    rows = _a.gmv_anomalies(tables["orders"], z_threshold=2.0).collect()
    for r in rows:
        assert abs(r["z_score"]) >= 2.0


def test_ordered_funnel_monotone(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import analytics as _a

    rows = {r["step"]: r["users"] for r in _a.ordered_funnel(tables["events"]).collect()}
    # each ordered step can only lose users
    assert rows["view"] >= rows["click"] >= rows["purchase"]
    # stricter than the unordered funnel: ordered click-through <= users with any click
    any_click = (
        tables["events"].filter(F.col("event_type") == "click").select("user_id").distinct().count()
    )
    assert rows["click"] <= any_click


def test_order_value_equidepth_balanced(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import analytics as _a

    rows = _a.order_value_equidepth(tables["orders"], buckets=10).collect()
    counts = [r["n_orders"] for r in rows]
    assert max(counts) - min(counts) <= 1
    # bucket bounds are non-overlapping and ordered
    for prev, cur in zip(rows, rows[1:]):
        assert prev["hi"] <= cur["lo"]


def test_sql_variants_cohort_and_ordered_funnel(spark, tables):
    from data_lake_for_e_commerce_analytics_spark.operators import analytics as _a
    from data_lake_for_e_commerce_analytics_spark.operators import sql_analytics as _s

    df_cohort = [tuple(r) for r in _a.cohort_retention(tables["orders"]).collect()]
    sql_cohort = [tuple(r) for r in _s.cohort_retention_sql(spark, tables["orders"]).collect()]
    assert df_cohort == sql_cohort

    df_funnel = [tuple(r) for r in _a.ordered_funnel(tables["events"]).collect()]
    sql_funnel = [tuple(r) for r in _s.ordered_funnel_sql(spark, tables["events"]).collect()]
    assert sorted(df_funnel) == sorted(sql_funnel)
