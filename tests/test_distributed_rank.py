"""Property tests for operators/distributed_rank.py: the distributed
global-rank primitives must be EXACTLY equivalent to Spark's own
single-partition window functions on adversarial inputs — heavy ties,
m < n buckets, dominant-group skew, empty relations. The registered
queries pin them against the DuckDB oracle at sf0.01/sf1; these tests
pin the primitives themselves against `Window.orderBy` semantics so a
future edit can't drift the arithmetic while the fixed-data oracles
stay green by luck.
"""

import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators.distributed_rank import (
    exact_ntile,
    grouped_percent_rank,
    grouped_row_number,
)


def _tie_heavy_df(spark, n=500, n_vals=7, n_groups=3, seed=11):
    """Rows with very few distinct order values (maximal ties) plus a
    unique id tiebreak, spread over a skewed group column (group 0
    holds ~80% of rows — the dominant-language shape)."""
    rng = random.Random(seed)
    rows = [
        Row(
            id=i,
            v=rng.randrange(n_vals),
            g=0 if rng.random() < 0.8 else rng.randrange(1, n_groups),
        )
        for i in range(n)
    ]
    # >1 partition and deliberately unsorted input
    rng.shuffle(rows)
    return spark.createDataFrame(rows).repartition(13)


def test_global_row_number_matches_window(spark):
    df = _tie_heavy_df(spark)
    got = {
        (r.id, r.rn)
        for r in grouped_row_number(df, ["v", "id"], out="rn").collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        (r.id, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_grouped_row_number_matches_window(spark):
    df = _tie_heavy_df(spark)
    got = {
        (r.id, r.rn)
        for r in grouped_row_number(
            df, ["v", "id"], out="rn", group_cols=["g"]
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r.id, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("n", [2, 4, 10])
def test_exact_ntile_matches_window(spark, n):
    df = _tie_heavy_df(spark)
    got = {
        (r.id, r.bucket)
        for r in exact_ntile(df, n, ["v", "id"], out="bucket").collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        (r.id, r.bucket)
        for r in df.withColumn("bucket", F.ntile(n).over(w)).collect()
    }
    assert got == want


def test_exact_ntile_desc_order(spark):
    # the rfm_segments shape: descending metric, ascending unique key
    df = _tie_heavy_df(spark, n=97)
    got = {
        (r.id, r.q)
        for r in exact_ntile(df, 4, [F.desc("v"), "id"], out="q").collect()
    }
    w = Window.orderBy(F.desc("v"), "id")
    want = {
        (r.id, r.q)
        for r in df.withColumn("q", F.ntile(4).over(w)).collect()
    }
    assert got == want


def test_exact_ntile_fewer_rows_than_buckets(spark):
    df = spark.createDataFrame([Row(id=i, v=0) for i in range(3)])
    got = sorted(
        (r.id, r.b)
        for r in exact_ntile(df, 10, ["v", "id"], out="b").collect()
    )
    # SQL ntile with m < n: one row per bucket 1..m
    assert got == [(0, 1), (1, 2), (2, 3)]


def test_exact_ntile_empty(spark):
    df = spark.createDataFrame([], "id long, v long")
    assert exact_ntile(df, 4, ["v", "id"], out="b").count() == 0


def test_grouped_percent_rank_matches_window(spark):
    df = _tie_heavy_df(spark)
    got = {
        (r.id, round(r.p, 9))
        for r in grouped_percent_rank(
            df, ["v", "id"], out="p", group_cols=["g"]
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r.id, round(r.p, 9))
        for r in df.withColumn("p", F.percent_rank().over(w)).collect()
    }
    assert got == want


def test_grouped_percent_rank_single_row_group(spark):
    df = spark.createDataFrame(
        [Row(id=0, v=5, g=0), Row(id=1, v=3, g=1), Row(id=2, v=4, g=1)]
    )
    out = {
        r.g: r.p
        for r in grouped_percent_rank(
            df, ["v", "id"], out="p", group_cols=["g"]
        ).collect()
        if r.g == 0
    }
    assert out == {0: 0.0}


def test_no_single_partition_exchange_in_plan(spark):
    """The whole point: the primitive's physical plan must not contain
    Exchange SinglePartition feeding the ranking window."""
    from data_lake_for_e_commerce_analytics_spark.plans.audit import (
        single_partition_window_flags,
    )

    df = _tie_heavy_df(spark)
    ranked = exact_ntile(df, 4, ["v", "id"], out="b")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert single_partition_window_flags(plan) == []
