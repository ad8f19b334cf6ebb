"""Synthetic partsupp relation invariants, the TPC-H Q2/Q11/Q16/Q20
shapes over it, and the integer-grid Lloyd k-means."""

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import partsupp, similarity


def test_partsupp_four_distinct_suppliers_per_part(tables):
    ps = partsupp.synth_partsupp(tables["part"], tables["supplier"])
    per_part = ps.groupBy("ps_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("ps_suppkey").alias("n_supp"),
    )
    bad = per_part.filter((F.col("n") != 4) | (F.col("n_supp") != 4)).count()
    assert bad == 0


def test_partsupp_keys_reference_real_suppliers(tables):
    ps = partsupp.synth_partsupp(tables["part"], tables["supplier"])
    orphans = ps.join(
        tables["supplier"], ps.ps_suppkey == F.col("s_suppkey"), "left_anti"
    ).count()
    assert orphans == 0
    lo, hi = ps.agg(F.min("ps_availqty"), F.max("ps_availqty")).head()
    assert lo >= 1 and hi <= 9999


def test_partsupp_is_deterministic(tables):
    a = partsupp.synth_partsupp(tables["part"], tables["supplier"]).collect()
    b = partsupp.synth_partsupp(tables["part"], tables["supplier"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_min_cost_supplier_is_the_minimum(tables):
    """Every emitted (part, supplier) must hold the true minimum cost among
    that part's in-region suppliers."""
    got = partsupp.min_cost_supplier(
        tables["part"], tables["supplier"], tables["nation"], tables["region"]
    ).collect()
    ps = partsupp.synth_partsupp(tables["part"], tables["supplier"])
    region_sup = (
        tables["supplier"]
        .join(
            tables["nation"], F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            tables["region"].filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    min_by_part = {
        r["ps_partkey"]: r["m"]
        for r in ps.join(region_sup, ps.ps_suppkey == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(F.min("ps_supplycost_cents").alias("m"))
        .collect()
    }
    assert got, "query returned no rows at this SF"
    for r in got:
        assert round(r["supplycost"] * 100) == min_by_part[r["p_partkey"]]


def test_important_stock_threshold(tables):
    rows = partsupp.important_stock(
        tables["part"], tables["supplier"], tables["nation"], fraction_denom=300
    ).collect()
    assert rows, "no parts above threshold at this SF"
    values = [r["stock_value"] for r in rows]
    assert values == sorted(values, reverse=True)


def test_supplier_counts_bounded_by_four(tables):
    rows = partsupp.supplier_counts(tables["part"], tables["supplier"]).collect()
    assert rows
    assert all(1 <= r["supplier_cnt"] for r in rows)
    assert all(r["p_brand"] != "Brand#5" for r in rows)


def test_excess_inventory_runs(tables):
    rows = partsupp.excess_inventory_suppliers(
        tables["part"],
        tables["supplier"],
        tables["nation"],
        tables["lineitem"],
    ).collect()
    names = [r["s_name"] for r in rows]
    assert names == sorted(names)


def test_kmeans_assign_covers_corpus_and_is_deterministic(tables):
    emb = tables["embeddings"]
    a = similarity.kmeans_assign(emb, k=8, iters=2).collect()
    assert len(a) == emb.count()
    clusters = {r["cluster"] for r in a}
    assert clusters <= set(range(8))
    b = similarity.kmeans_assign(emb, k=8, iters=2).collect()
    assert a == b


def test_kmeans_iterations_reduce_distortion(tables):
    """Lloyd's guarantee: total squared distance to the assigned centroid
    never increases across iterations (on the quantized grid, up to the
    floor-rounding of centroid components — allow that slack)."""
    import numpy as np

    emb = tables["embeddings"]
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {
        r["vec_id"]: np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1000)
        for r in rows
    }

    def distortion(assign_rows):
        by_cluster: dict[int, list] = {}
        for r in assign_rows:
            by_cluster.setdefault(r["cluster"], []).append(vecs[r["vec_id"]])
        total = 0.0
        for members in by_cluster.values():
            m = np.stack(members)
            c = np.floor(m.sum(axis=0) / len(members))
            total += ((m - c) ** 2).sum()
        return total

    d1 = distortion(similarity.kmeans_assign(emb, k=8, iters=1).collect())
    d2 = distortion(similarity.kmeans_assign(emb, k=8, iters=2).collect())
    assert d2 <= d1 * 1.001


def test_product_type_profit_groups(tables):
    rows = partsupp.product_type_profit(
        tables["part"], tables["supplier"], tables["nation"],
        tables["orders"], tables["lineitem"],
    ).collect()
    assert rows
    # one row per (nation, year); profit can be negative but must be finite
    keys = [(r["n_name"], r["o_year"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_gmv_gapfill_dense_calendar(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import analytics

    rows = analytics.gmv_gapfill(tables["orders"]).collect()
    days = [r["d"] for r in rows]
    assert len(days) == (max(days) - min(days)).days + 1
    assert days == sorted(days)
    for r in rows:
        if r["is_gap"]:
            assert r["gmv"] == 0.0
        else:
            assert r["gmv"] > 0.0


def test_partsupp_query_plans_broadcast_and_no_cartesian(tables):
    """100 TB posture: every partsupp query broadcasts its dim sides and
    never degrades to a nested-loop/cartesian join."""
    from data_lake_for_e_commerce_analytics_spark.plans.explain import (
        assert_broadcast_join,
        assert_no_cartesian,
    )

    # NOTE: synth_partsupp's supplier-count crossJoin is a broadcast of a
    # 1-row aggregate (the scalar-subquery shape) and legitimately plans
    # as a BroadcastNestedLoopJoin of one row — so no assert_no_cartesian
    # on the queries that embed it; the dim-side broadcasts are asserted.
    q2 = partsupp.min_cost_supplier(
        tables["part"], tables["supplier"], tables["nation"], tables["region"]
    )
    assert_broadcast_join(q2, expected=2)
    q9 = partsupp.product_type_profit(
        tables["part"], tables["supplier"], tables["nation"],
        tables["orders"], tables["lineitem"],
    )
    assert_broadcast_join(q9, expected=2)
    q21 = __import__(
        "data_lake_for_e_commerce_analytics_spark.operators.analytics",
        fromlist=["analytics"],
    ).late_sole_supplier_waits(
        tables["lineitem"], tables["orders"], tables["supplier"]
    )
    assert_no_cartesian(q21)


def test_kmeans_plan_broadcasts_centroids(tables):
    from data_lake_for_e_commerce_analytics_spark.plans.explain import (
        assert_broadcast_join,
        assert_no_cartesian,
    )

    df = similarity.kmeans_assign(tables["embeddings"], k=8, iters=2)
    assert_broadcast_join(df, expected=2)  # one per Lloyd round
    assert_no_cartesian(df)
