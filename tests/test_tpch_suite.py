"""Tests for the TPC-H-shaped analytics extensions (Q3/Q6/Q12/Q14/Q18/
Q19 shapes), the correlated-subquery decorrelation, string pipeline,
window-frame/ntile queries, and GROUPING SETS — semantic invariants plus
the physical-plan properties that matter at 100 TB (pushdown, broadcast,
pre-join HAVING)."""

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import aggregates, analytics, windows


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_unshipped_order_revenue_shape(tables):
    rows = analytics.unshipped_order_revenue(
        tables["customer"], tables["orders"], tables["lineitem"], cutoff="1998-06-01"
    ).collect()
    assert len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_unshipped_order_revenue_pushdown_and_topk(tables):
    plan = _plan(
        analytics.unshipped_order_revenue(
            tables["customer"], tables["orders"], tables["lineitem"]
        )
    )
    # top-k must be TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan
    # the segment equality filter reaches the customer parquet scan
    assert "c_mktsegment" in plan.split("PushedFilters")[1][:300] or "BUILDING" in plan


def test_discount_revenue_opportunity_filters_pushed(tables):
    df = analytics.discount_revenue_opportunity(tables["lineitem"])
    plan = _plan(df)
    pushed = plan.split("PushedFilters")[1][:400]
    assert "l_discount" in pushed and "l_quantity" in pushed
    row = df.collect()[0]
    assert row["n_items"] >= 0


def test_urgent_shipment_share_partition(tables):
    rows = analytics.urgent_shipment_share(tables["orders"], tables["lineitem"]).collect()
    total = sum(r["high_priority_items"] + r["low_priority_items"] for r in rows)
    assert total == tables["lineitem"].count()


def test_promo_revenue_pct_bounds(tables):
    row = analytics.promo_revenue_pct(tables["lineitem"], tables["part"]).collect()[0]
    assert 0.0 <= row["promo_revenue_pct"] <= 100.0
    assert row["total_revenue"] > 0


def test_large_volume_customers_having_before_join(tables):
    df = analytics.large_volume_customers(
        tables["customer"], tables["orders"], tables["lineitem"], min_qty=50.0
    )
    rows = df.collect()
    for r in rows:
        assert r["sum_qty"] > 50.0
    # the whale filter must run on the aggregate BEFORE the orders join:
    # in the plan text the Filter over sum_qty appears below the joins
    plan = _plan(df)
    assert "Filter" in plan


def test_brand_size_revenue_matches_manual(tables):
    row = analytics.brand_size_revenue(tables["lineitem"], tables["part"]).collect()[0]
    j = tables["lineitem"].join(
        tables["part"], F.col("l_partkey") == F.col("p_partkey")
    )
    manual = (
        j.filter(
            ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
            | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 35))
            | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
        ).count()
    )
    assert row["n_items"] == manual


def test_orders_above_customer_avg_invariant(tables):
    rows = analytics.orders_above_customer_avg(tables["orders"], factor=1.5).collect()
    for r in rows:
        assert r["o_totalprice"] > 1.5 * r["cust_avg"]


def test_orders_above_customer_avg_single_shuffle(tables):
    plan = _plan(analytics.orders_above_customer_avg(tables["orders"]))
    # decorrelated window rewrite: no join in the plan at all
    assert "Join" not in plan


def test_part_name_terms_string_pipeline(tables):
    rows = analytics.part_name_terms(tables["part"]).collect()
    assert sum(r["n_parts"] for r in rows) == tables["part"].count()
    for r in rows:
        assert r["adjective_uc"] == r["adjective"].upper()


def test_gmv_moving_avg_window_frame(tables):
    rows = windows.gmv_moving_avg(tables["orders"], days=7).orderBy("d").collect()
    # trailing average over <=7 rows: recompute for a middle row
    if len(rows) >= 8:
        i = len(rows) // 2
        lo = max(0, i - 6)
        expect = round(sum(r["gmv"] for r in rows[lo : i + 1]) / (i + 1 - lo), 4)
        assert abs(rows[i]["moving_avg"] - expect) < 1e-6


def test_acctbal_quartiles_partitioned(tables):
    df = windows.acctbal_quartile_by_nation(tables["customer"])
    rows = df.collect()
    for r in rows:
        assert 1 <= r["balance_quartile"] <= 4
        assert 0.0 <= r["pct_rank"] <= 1.0
    # quartiles are balanced within each nation (sizes differ by <= 1)
    from collections import Counter

    per_nation = Counter()
    sizes: dict[tuple, int] = Counter()
    for r in rows:
        sizes[(r["c_nationkey"], r["balance_quartile"])] += 1
        per_nation[r["c_nationkey"]] += 1
    for nk, total in per_nation.items():
        if total >= 4:
            counts = [sizes[(nk, q)] for q in range(1, 5)]
            assert max(counts) - min(counts) <= 1


def test_revenue_grouping_sets_subtotals(tables):
    rows = aggregates.revenue_grouping_sets(tables["orders"], tables["customer"]).collect()
    seg_rows = [r for r in rows if r["c_mktsegment"] is not None]
    pri_rows = [r for r in rows if r["o_orderpriority"] is not None]
    # each side partitions the same joined row set
    assert sum(r["n_orders"] for r in seg_rows) == sum(r["n_orders"] for r in pri_rows)
    # no grand-total row (not in the requested sets)
    assert all(
        (r["c_mktsegment"] is None) != (r["o_orderpriority"] is None) for r in rows
    )


def test_volume_shipping_bilateral(tables):
    rows = analytics.volume_shipping(
        tables["lineitem"], tables["orders"], tables["customer"],
        tables["supplier"], tables["nation"],
    ).collect()
    # only the two requested nations appear, never a same-nation pair
    for r in rows:
        assert {r["supp_nation"], r["cust_nation"]} == {"NATION_1", "NATION_2"}
        assert r["revenue"] > 0
    plan = _plan(
        analytics.volume_shipping(
            tables["lineitem"], tables["orders"], tables["customer"],
            tables["supplier"], tables["nation"],
        )
    )
    # dims broadcast: the only sort-merge/shuffle join is lineitem ⋈ orders
    assert plan.count("BroadcastHashJoin") >= 2


def test_national_market_share_bounds(tables):
    rows = analytics.national_market_share(
        tables["lineitem"], tables["orders"], tables["customer"],
        tables["supplier"], tables["nation"], tables["region"],
    ).collect()
    assert rows, "ASIA region should have revenue"
    for r in rows:
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert r["total_volume"] > 0


def test_returned_item_losses_topk(tables):
    df = analytics.returned_item_losses(
        tables["customer"], tables["orders"], tables["lineitem"], tables["nation"]
    )
    rows = df.collect()
    assert len(rows) <= 20
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert "TakeOrderedAndProject" in _plan(df)


def test_top_revenue_supplier_is_argmax(tables, spark):
    rows = analytics.top_revenue_supplier(tables["lineitem"], tables["supplier"]).collect()
    assert len(rows) >= 1
    # every returned supplier carries the same (maximal) revenue
    assert len({r["total_revenue"] for r in rows}) == 1


def test_small_quantity_revenue_threshold(tables):
    rows = analytics.small_quantity_revenue(tables["lineitem"], tables["part"]).collect()
    for r in rows:
        assert r["p_brand"] in ("Brand#13", "Brand#20")
        assert r["n_small_lines"] >= 0
        assert r["avg_yearly"] >= 0


def test_rich_inactive_customers_anti_join(tables):
    df = analytics.rich_inactive_customers(tables["customer"], tables["orders"])
    plan = _plan(df)
    assert "LeftAnti" in plan
    rows = df.collect()
    # every counted customer is above the positive-balance average
    avg_pos = (
        tables["customer"].filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).collect()[0][0]
    )
    # groups aggregate above-threshold balances only -> group avg above threshold
    for r in rows:
        assert r["totacctbal"] / r["numcust"] > avg_pos


def test_local_supplier_revenue_constraint(tables):
    df = analytics.local_supplier_revenue(
        tables["lineitem"], tables["orders"], tables["customer"],
        tables["supplier"], tables["nation"], tables["region"],
    )
    rows = df.collect()
    asia_nations = {
        r["n_name"]
        for r in tables["nation"]
        .join(tables["region"], tables["nation"].n_regionkey == tables["region"].r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .collect()
    }
    for r in rows:
        assert r["n_name"] in asia_nations
        assert r["revenue"] > 0
    # Q5's local constraint strictly reduces revenue vs the unconstrained rollup
    unconstrained = {
        r["n_name"]: r["revenue"]
        for r in analytics.revenue_by_nation(
            tables["customer"], tables["orders"], tables["lineitem"], tables["nation"]
        ).collect()
    }
    for r in rows:
        assert r["revenue"] <= unconstrained[r["n_name"]]
