"""Runtime row-level join pruning: Catalyst's bloom-filter injection
(SPARK-32268) on fact⋈selective-dim joins.

At 100 TB this is the difference between shuffling the full fact scan
and shuffling only rows whose keys might match the filtered dim — the
row-level complement of partition pruning. The engine relies on the
optimizer for it (no hand-rolled filter), so the test pins that the
plan shape actually triggers injection; local test data sits below
every default size threshold, so the thresholds are forced (they are
plain runtime SQL confs, restored after)."""

import pytest
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.plans.explain import (
    assert_runtime_bloom_filter,
)

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_conf(spark):
    saved = {}
    for k, v in _CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_on_selective_dim_join(bloom_conf, tables):
    li = tables["lineitem"]
    orders = tables["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert_runtime_bloom_filter(j)
    # and the result is still correct
    assert j.collect()[0]["n"] > 0


def test_bloom_filter_result_matches_broadcast_plan(bloom_conf, tables):
    """The injected filter must never change results — compare against
    a plain broadcast-join run of the same query."""
    li = tables["lineitem"]
    orders = tables["orders"].filter(F.col("o_orderstatus") == "F")
    with_bloom = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        .collect()
    )
    plain = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        .collect()
    )
    assert sorted(map(tuple, with_bloom)) == sorted(map(tuple, plain))
