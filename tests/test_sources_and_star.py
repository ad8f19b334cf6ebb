"""Source/sink round-trips (S-series) and the gold star-schema build (G4)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_for_e_commerce_analytics_spark.operators import star_schema
from data_lake_for_e_commerce_analytics_spark.sources import catalog, csv_source


def test_csv_roundtrip_inferred(spark, tmp_path):
    df = spark.createDataFrame([(1, "x", 1.5), (2, "y", 2.5)], ["id", "s", "v"])
    path = str(tmp_path / "csv_rt")
    csv_source.write_csv(df, path)
    back = csv_source.read_csv_inferred(spark, path)
    assert back.count() == 2
    assert {f.name for f in back.schema.fields} == {"id", "s", "v"}


def test_csv_declared_schema_preserves_zero_padded_strings(spark, tmp_path):
    """SURVEY.md §7.4 hard part 5: zip-like codes must stay strings."""
    path = str(tmp_path / "sellers")
    spark.createDataFrame([("s1", "01310"), ("s2", "13023")], ["seller_id", "zip"]) \
        .write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType([
        T.StructField("seller_id", T.StringType()),
        T.StructField("zip", T.StringType()),
    ])
    got = {r["zip"] for r in csv_source.read_csv_declared(spark, path, schema).collect()}
    assert got == {"01310", "13023"}
    # inference would have stripped the leading zero
    inferred = csv_source.read_csv_inferred(spark, path)
    assert dict(inferred.dtypes)["zip"] in ("int", "bigint")


def test_csv_declared_malformed_becomes_null(spark, tmp_path):
    path = str(tmp_path / "dirty")
    spark.createDataFrame(
        [("o1", "2017-01-05 10:00:00"), ("o2", "not-a-timestamp")], ["id", "ts"]
    ).write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    rows = {r["id"]: r["ts"] for r in csv_source.read_csv_declared(spark, path, schema).collect()}
    assert rows["o1"] is not None and rows["o2"] is None


def test_event_ts_loader_passes_nulls_and_rejects_micros(spark, tmp_path):
    """The epoch-nanos magnitude guard must not trip on NULL timestamps.

    A NULL ts is a legitimate late/dirty-data value — it should surface as a
    NULL timestamp, keeping the loud raise_error only for non-null values of
    clearly wrong (micros-scale) magnitude.
    """
    from data_lake_for_e_commerce_analytics_spark.sources import load_table

    nanos_2020 = 1_600_000_000_000_000_000  # ~2020-09, valid nanos magnitude
    path = str(tmp_path / "lake")
    spark.createDataFrame(
        [(1, nanos_2020), (2, None), (3, 0)],
        T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
        ]),
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")
    rows = {r["event_id"]: r["ts"] for r in load_table(spark, path, "events").collect()}
    assert rows[2] is None
    assert rows[1] is not None and rows[1].year == 2020
    # micros-magnitude non-null values still fail loudly
    spark.createDataFrame(
        [(1, 1_600_000_000_000_000)],  # micros scale: 1000x too small
        T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
        ]),
    ).write.mode("overwrite").parquet(f"{path}2/events.parquet")
    with pytest.raises(Exception, match="epoch-nanos"):
        load_table(spark, f"{path}2", "events").collect()


def test_partitioned_write_prunes(spark, tables, tmp_path):
    path = str(tmp_path / "events_part")
    ev = tables["events"].withColumn("event_date", F.to_date("ts"))
    catalog.write_parquet_partitioned(ev, path, ["event_date"])
    one_day = ev.select(F.min("event_date")).head()[0]
    back = spark.read.parquet(path).filter(F.col("event_date") == F.lit(one_day))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() > 0
    # partition filter must prune at the scan, not post-filter
    assert "PartitionFilters: [" in plan and "event_date" in plan.split("PartitionFilters")[1][:120]


def test_ctas_and_external_registration(spark, tables, tmp_path):
    catalog.save_as_table(tables["nation"], "test_zone_db", "nation_copy")
    assert spark.table("test_zone_db.nation_copy").count() == tables["nation"].count()
    path = str(tmp_path / "nation_ext")
    catalog.write_parquet(tables["nation"], path)
    catalog.register_external_table(spark, "test_zone_db", "nation_ext", path)
    assert spark.table("test_zone_db.nation_ext").count() == tables["nation"].count()
    catalog.ctas(
        spark, "test_zone_db", "nation_small",
        "SELECT n_nationkey, n_name FROM test_zone_db.nation_copy WHERE n_nationkey < 5",
    )
    assert spark.table("test_zone_db.nation_small").count() == 5


def test_build_gold_star_schema(spark, tables):
    gold = star_schema.build_gold(spark, tables, db="test_gold_db")
    assert set(gold) == {"dim_customer", "dim_product", "fact_orders", "fact_order_items", "fact_events"}
    assert gold["dim_customer"].count() == tables["customer"].count()
    assert gold["fact_order_items"].count() == tables["lineitem"].count()
    # FK integrity (reference README.md:346-352): every fact_orders
    # customer_key resolves in dim_customer
    orphans = (
        gold["fact_orders"]
        .join(gold["dim_customer"], "customer_key", "left_anti")
        .count()
    )
    assert orphans == 0


def test_bucketed_join_is_exchange_free(spark, tables):
    from data_lake_for_e_commerce_analytics_spark.sources import bucketed

    bucketed.write_bucketed(
        tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
        "test_bucket_db", "orders_b", "o_orderkey", num_buckets=4,
    )
    bucketed.write_bucketed(
        tables["lineitem"].select("l_orderkey", "l_extendedprice").withColumnRenamed("l_orderkey", "o_orderkey"),
        "test_bucket_db", "lineitem_b", "o_orderkey", num_buckets=4,
    )
    joined = (
        spark.table("test_bucket_db.orders_b")
        .hint("merge")  # force sort-merge (broadcast would mask the layout win)
        .join(spark.table("test_bucket_db.lineitem_b"), "o_orderkey")
    )
    # co-bucketed layout: sort-merge join with NO shuffle on either side
    bucketed.assert_no_shuffle(joined)
    assert joined.count() == tables["lineitem"].count()


def test_dynamic_partition_pruning_fires(spark, tables, tmp_path):
    """Join a date-partitioned fact to a dimension filtered at runtime:
    Catalyst must inject a dynamicpruning subquery into the fact scan so
    only matching partitions are read — the mechanism that keeps a
    100 TB partitioned fact from full-scanning on every dim-filtered
    join."""
    from pyspark.sql import functions as F
    from data_lake_for_e_commerce_analytics_spark.sources import catalog

    path = str(tmp_path / "ev_part")
    ev = tables["events"].withColumn("event_date", F.to_date("ts"))
    catalog.write_parquet_partitioned(ev, path, ["event_date"])
    fact = spark.read.parquet(path)

    # DPP preconditions: the dim side carries a SELECTIVE predicate (the
    # event_type filter) and is broadcastable, so the fact scan can reuse
    # the broadcast as its partition-pruning subquery.
    dim = (
        tables["events"]
        .filter(F.col("event_type") == "purchase")
        .select(F.to_date("ts").alias("event_date"))
        .distinct()
    )
    joined = fact.join(dim, "event_date")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), f"expected DPP subquery in:\n{plan}"


def test_analyze_table_feeds_cbo(spark, tables):
    """ANALYZE TABLE records row counts the cost-based optimizer uses;
    the logical plan's stats must show the exact row count afterwards
    (not a size-based guess)."""
    from data_lake_for_e_commerce_analytics_spark.sources import catalog as cat

    spark.sql("CREATE DATABASE IF NOT EXISTS stats_db")
    tables["nation"].write.mode("overwrite").saveAsTable("stats_db.nation_stats")
    cat.analyze_table(spark, "stats_db.nation_stats", columns=["n_nationkey", "n_name"])

    stats = cat.table_stats(spark, "stats_db.nation_stats")
    assert "rows" in stats.get("statistics", ""), stats

    n = tables["nation"].count()
    plan_stats = (
        spark.table("stats_db.nation_stats")
        ._jdf.queryExecution()
        .optimizedPlan()
        .stats()
        .toString()
    )
    assert f"rowCount={n}" in plan_stats, plan_stats


def test_compact_parquet_preserves_data(spark, tmp_path, tables):
    from data_lake_for_e_commerce_analytics_spark.sources import maintenance

    path = str(tmp_path / "frag")
    orders = tables["orders"]
    orders.repartition(16).write.parquet(path)
    assert len(maintenance.parquet_files(path)) >= 16
    before = orders.count()
    n_files = maintenance.compact_parquet(spark, path, target_rows_per_file=10**9)
    assert n_files == 1
    after = spark.read.parquet(path)
    assert after.count() == before
    assert sorted(after.columns) == sorted(orders.columns)


def test_zorder_write_narrows_file_spans(spark, tmp_path, tables):
    """Each Z-ordered file should cover a much smaller rectangle of the
    (custkey, totalprice) space than round-robin files do — that span is
    exactly what parquet min/max pruning skips on."""
    import pyarrow.parquet as pq

    from data_lake_for_e_commerce_analytics_spark.sources import maintenance

    orders = tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    orders.repartition(8).write.parquet(plain)
    maintenance.write_zordered(orders, zed, "o_custkey", "o_totalprice", num_files=8)

    def mean_span(path, col):
        spans = []
        for f in maintenance.parquet_files(path):
            t = pq.read_table(f, columns=[col])[col].to_pylist()
            if t:
                spans.append(max(t) - min(t))
        return sum(spans) / len(spans)

    # data preserved
    assert spark.read.parquet(zed).count() == orders.count()
    # both clustered dimensions tighten vs round-robin layout
    assert mean_span(zed, "o_custkey") < 0.8 * mean_span(plain, "o_custkey")
    assert mean_span(zed, "o_totalprice") < 0.8 * mean_span(plain, "o_totalprice")


def test_zorder_key_locality(spark):
    """Points close in both dims get closer z-keys than points far in
    one dim: the interleave actually mixes both columns."""
    from data_lake_for_e_commerce_analytics_spark.sources import maintenance

    df = spark.createDataFrame(
        [(i, float(i % 100), float(i // 100)) for i in range(10_000)], ["id", "x", "y"]
    )
    keyed = maintenance.add_zorder_key(df, "x", "y", bits=8)
    rows = {r["id"]: r["_zkey"] for r in keyed.collect()}
    # same cell -> identical key; opposite corners -> far apart
    assert rows[0] == rows[0]
    near = abs(rows[101] - rows[0])      # (1,1) vs (0,0)
    far = abs(rows[9999] - rows[0])      # (99,99) vs (0,0)
    assert near < far


def test_orc_round_trip_preserves_values_and_pushdown(tables, tmp_path):
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string
    from data_lake_for_e_commerce_analytics_spark.sources import orc_source

    nation = tables["nation"]
    path = str(tmp_path / "nation_orc")
    orc_source.write_orc(nation, path)
    spark = nation.sparkSession
    back = orc_source.read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))
    # predicate must reach the ORC scan, same as parquet
    plan = plan_string(back.filter(back.n_regionkey == 1).select("n_name"))
    assert "PushedFilters" in plan and "n_regionkey" in plan


def test_parquet_schema_evolution_union(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_lake_for_e_commerce_analytics_spark.sources import orc_source

    v1 = spark.createDataFrame([(1, "a")], ["id", "name"])
    v2 = spark.createDataFrame([(2, "b", 9.5)], ["id", "name", "score"])
    v1.write.parquet(str(tmp_path / "t" / "v=1"))
    v2.write.parquet(str(tmp_path / "t" / "v=2"))
    merged = orc_source.read_parquet_merged_schema(spark, str(tmp_path / "t"))
    rows = {r["id"]: r for r in merged.collect()}
    assert set(merged.columns) >= {"id", "name", "score"}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def _chunk_range_sum(rows, key):
    """Sum over 10 contiguous chunks of the (max-min) spread of `key`."""
    n = len(rows)
    size = max(n // 10, 1)
    total = 0
    for i in range(0, n, size):
        chunk = rows[i:i + size]
        vals = [r[key] for r in chunk]
        total += max(vals) - min(vals)
    return total


def test_zorder_interleave_roundtrips_and_clusters(tables, tmp_path):
    from pyspark.sql import functions as F

    from data_lake_for_e_commerce_analytics_spark.sources import zorder

    orders = tables["orders"].withColumn(
        "price_cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    keyed = zorder.zorder_keys(orders, "o_custkey", "price_cents", bits=16)
    sample = keyed.select("zb1", "zb2", "zval").limit(200).collect()
    for r in sample:
        b1 = b2 = 0
        for i in range(16):
            b1 |= ((r["zval"] >> (2 * i + 1)) & 1) << i
            b2 |= ((r["zval"] >> (2 * i)) & 1) << i
        assert (b1, b2) == (r["zb1"], r["zb2"])  # de-interleave inverts
    # locality: chunking the z-sorted order bounds BOTH columns' spreads;
    # a single-column sort leaves the other column's chunk spreads ~full
    zsorted = keyed.orderBy("zval").select("o_custkey", "price_cents").collect()
    csorted = keyed.orderBy("o_custkey").select("o_custkey", "price_cents").collect()
    z_spread = _chunk_range_sum([r.asDict() for r in zsorted], "price_cents")
    c_spread = _chunk_range_sum([r.asDict() for r in csorted], "price_cents")
    assert z_spread < c_spread * 0.75
    # the clustered write round-trips all rows
    path = str(tmp_path / "zorders")
    zorder.cluster_by_zorder(orders, path, "o_custkey", "price_cents", num_files=4)
    spark = orders.sparkSession
    assert spark.read.parquet(path).count() == orders.count()
