"""AQE skew-join splitting on a Zipf-keyed shuffle join (VERDICT r6
task 5).

``aggregates.salted_sum`` covers skewed AGGREGATION; this pins the
JOIN half of the 100 TB skew story: when one join key holds most of
the rows, the sort-merge shuffle puts them in one partition and one
straggler task runs as long as the whole stage. AQE's skew-join
splitting (``spark.sql.adaptive.skewJoin.*``) detects the oversized
partition at runtime and splits it into parallel sub-tasks, replicating
the matching build rows — no salting, no code change, results
identical.

Local test data sits below the default 256 MB skew threshold, so the
thresholds are forced down (plain runtime SQL confs, restored after) —
the same approach the bloom-filter injection tests take.
"""

import pytest
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.plans.explain import (
    assert_skew_join_split,
    plan_string,
)

_CONFS = {
    # force the shuffle join (a broadcast would hide the skew entirely —
    # which IS the right fix when the dim fits; this test is about when
    # it doesn't)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    "spark.sql.shuffle.partitions": "8",
}


@pytest.fixture()
def skew_conf(spark):
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


def _zipf_fact(spark, n_rows: int = 300_000, hot_share: float = 0.9):
    """A fact table where one key owns ``hot_share`` of all rows — the
    shape of a bot user in events or a default/placeholder FK."""
    hot_cut = int(n_rows * hot_share)
    return spark.range(0, n_rows).select(
        F.when(F.col("id") < hot_cut, F.lit(0))
        .otherwise(F.col("id") % 997)
        .alias("k"),
        # INCOMPRESSIBLE payload: skew detection reads the compressed
        # shuffle block sizes, and a constant-padded string compresses
        # below any threshold (first draft of this test proved it)
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        (F.col("id") % 101).cast("double").alias("v"),
    )


def _dim(spark):
    return spark.range(0, 997).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("dim_v")
    )


def _agg(joined):
    # GLOBAL aggregate on purpose: a groupBy on the JOIN KEY would let
    # the aggregation reuse the join's output partitioning, and AQE
    # then refuses to split the skewed partitions (splitting breaks the
    # partitioning guarantee the parent requires — the documented
    # skew-join limitation). A global agg has no such requirement.
    return joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 2).alias("sv"),
        F.sum("dim_v").alias("sdv"),
    )


def test_aqe_splits_skewed_join_and_results_match(skew_conf, spark):
    fact = _zipf_fact(spark)
    dim = _dim(spark)

    joined = _agg(fact.join(dim, "k"))
    # the skew marker only exists in the FINAL adaptive plan
    assert_skew_join_split(joined)

    # identical results from the unskewed reference plan (broadcast)
    got = joined.collect()[0]
    want = _agg(fact.join(F.broadcast(dim), "k")).collect()[0]
    assert tuple(got) == tuple(want)
    # the hot key really was skewed: ≥90% of all fact rows on k=0
    # (the cold tail's id % 997 == 0 rows land there too)
    hot = fact.filter("k = 0").count()
    assert hot >= 270_000 and got["n"] == 300_000


def test_skew_split_off_leaves_one_straggler_partition(skew_conf, spark):
    """Negative control: with skewJoin disabled the same join keeps the
    hot key in ONE shuffle partition (no skew=true marker) — proving
    the positive test's marker is AQE's doing, not plan noise."""
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    joined = _agg(_zipf_fact(spark).join(_dim(spark), "k"))
    joined.collect()
    assert "skew=true" not in plan_string(joined)
