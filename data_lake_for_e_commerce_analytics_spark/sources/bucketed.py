"""Bucketed-table support: the co-located-join storage layout.

The reference leaves join physical strategy to Athena (SURVEY.md §4);
at 100 TB the dominant repeated cost of a lakehouse is re-shuffling the
same fact tables on the same keys for every join. Writing both join
sides bucketed (hash-partitioned into a fixed bucket count) and sorted
by the key lets Spark plan a sort-merge join with NO Exchange on either
side — the shuffle is paid once at write time, then every downstream
join of the bucketed tables is exchange-free.

Spark specifics encoded here:
- bucketBy requires saveAsTable (catalog-managed files + bucket metadata).
- Both sides must share the bucket count (or be integer multiples with
  spark.sql.bucketing.coalesceBucketsInJoin.enabled).
- spark.sql.sources.bucketing.enabled / autoBucketedScan are on by
  default; plans must be checked (assert_no_exchange below) because a
  silent fallback to a non-bucketed scan re-introduces the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.explain import plan_string


def write_bucketed(
    df: DataFrame,
    db: str,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by
    ``bucket_col``. Pays one shuffle-equivalent now; joins/aggregations
    on ``bucket_col`` between co-bucketed tables are exchange-free
    afterwards."""
    spark = df.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    from .catalog import clear_stale_table_location

    clear_stale_table_location(spark, db, table)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(f"{db}.{table}")


def bucketed_join(
    spark: SparkSession, db: str, left: str, right: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key."""
    return spark.table(f"{db}.{left}").join(spark.table(f"{db}.{right}"), on, how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Fail if the physical plan re-partitions data across the cluster
    (hash/range shuffle) — the guard that the bucketed layout is
    actually being exploited. BroadcastExchange is allowed: replicating
    a small side is not a repartition of the bucketed data."""
    plan = plan_string(df)
    if "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan:
        raise AssertionError(f"plan contains a shuffle Exchange:\n{plan}")
