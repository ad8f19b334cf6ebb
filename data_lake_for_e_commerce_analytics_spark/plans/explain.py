"""Physical-plan inspection utilities.

The 100 TB posture is enforced here: tests assert on plans, not just
results — a dim join that silently degrades to sort-merge or a filter
that stops pushing to the scan is a perf regression even while values
stay correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """The executed (post-AQE-prep) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def assert_broadcast_join(df: DataFrame, expected: int = 1) -> None:
    plan = plan_string(df)
    got = plan.count("BroadcastHashJoin")
    if got < expected:
        raise AssertionError(f"expected >= {expected} BroadcastHashJoin, got {got}:\n{plan}")


def assert_pushed_filter(df: DataFrame, column: str) -> None:
    plan = plan_string(df)
    for chunk in plan.split("PushedFilters: [")[1:]:
        if column in chunk.split("]")[0]:
            return
    raise AssertionError(f"no pushed filter on {column}:\n{plan}")


def assert_runtime_bloom_filter(df: DataFrame) -> None:
    """Assert Catalyst injected a runtime bloom filter (a
    ``might_contain(...)`` predicate) on the probe side of a shuffle
    join — the row-level runtime pruning that complements dynamic
    partition pruning at 100 TB: the selective build side's keys filter
    the fact scan before the shuffle. Fires under the default configs
    when the creation side is under
    ``spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold``;
    tests force the thresholds since local test data is below every
    default size gate."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    if "might_contain" not in plan:
        raise AssertionError(f"no runtime bloom filter injected:\n{plan}")


def assert_skew_join_split(df: DataFrame) -> None:
    """Materialize ``df`` and assert AQE's runtime skew-join handling
    fired: the FINAL adaptive plan (only available after execution)
    marks the shuffle join ``skew=true``, meaning the oversized
    partitions were split into parallel sub-tasks instead of one
    straggler task — the other half of the 100 TB skew story next to
    salted aggregation (``aggregates.salted_sum``)."""
    df.collect()
    plan = plan_string(df)
    if "skew=true" not in plan:
        raise AssertionError(f"no AQE skew-join split in final plan:\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = plan_string(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in plan:
            raise AssertionError(f"plan contains {bad}:\n{plan}")


def partition_stats(df: DataFrame) -> list[tuple[int, int]]:
    """(partition_id, row_count) per partition — the skew inspector.
    One cheap job; use before sizing shuffle partitions or deciding to
    salt a hot key."""
    from pyspark.sql import functions as F

    rows = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    return sorted((r["__pid"], r["count"]) for r in rows)


def skew_ratio(df: DataFrame) -> float:
    """max/mean partition row count (1.0 = perfectly even). Above ~4-5
    on a shuffle output, consider salting or AQE skew-join tuning.
    Empty partitions count toward the mean (groupBy only surfaces
    non-empty ones; the denominator comes from the RDD partition count)."""
    stats = partition_stats(df)
    n_parts = df.rdd.getNumPartitions() or 1
    counts = [c for _, c in stats]
    total = sum(counts)
    if not total:
        return 1.0
    return max(counts) / (total / n_parts)
