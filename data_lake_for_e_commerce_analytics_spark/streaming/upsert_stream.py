"""Streaming -> gold incremental upsert: the micro-batch CDC apply path.

``foreachBatch`` hands each micro-batch to the batch MERGE operator
(`operators/upsert.merge_into_path`), so the streaming gold table gets
exactly the batch merge semantics (key dedup, version precedence,
dynamic-partition rewrite) — one code path for both modes, which is the
property that matters in a lakehouse: replaying the stream from scratch
and batch-merging the full history must produce identical tables (pinned
by test).

Scale notes: each micro-batch merge reads only the partitions the batch
touches (partition-pruned semi join inside merge_into_path), so steady
state cost tracks the batch size, not the table. The checkpoint location
makes the foreachBatch apply exactly-once per epoch; merge idempotency
(version precedence) additionally makes REPLAYED epochs harmless, which
is the end-to-end effectively-once contract.

The reference is batch-only (Glue jobs, reference README.md ETL zone);
this is the streaming upgrade path SURVEY.md §7 plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.upsert import merge_into_path


def stream_maintain_aggregate(
    stream: DataFrame,
    agg_path: str,
    keys: list[str],
    checkpoint_dir: str,
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
):
    """Start an availableNow stream that folds every CDC micro-batch
    into the running aggregate table at ``agg_path`` via the batch
    `operators/upsert.maintain_aggregate` — one IVM code path for both
    modes, same as the merge route above. Per-epoch cost is the delta
    partial-agg plus a rewrite of the (small) aggregate table; the
    facts are never re-scanned."""

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        from ..operators.upsert import maintain_aggregate

        from ..sources.fs import parquet_table_exists

        # Data-file probe, not try/except: a transient read failure must
        # raise — treating it as "no aggregate yet" would rebuild from
        # this batch alone and overwrite the running totals.
        base = (
            spark.read.parquet(agg_path)
            if parquet_table_exists(spark, agg_path)
            else None
        )
        if base is None:
            sign_cols = sum_cols or {}
            from pyspark.sql import functions as F

            base = (
                batch_df.limit(0)
                .groupBy(*keys)
                .agg(
                    F.count(F.lit(1)).cast("long").alias(count_col),
                    *[F.sum(src).alias(out) for out, src in sign_cols.items()],
                )
            )
        updated = maintain_aggregate(
            base, batch_df, keys, count_col, sum_cols
        ).localCheckpoint(eager=True)
        updated.write.mode("overwrite").parquet(agg_path)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_merge_to_gold(
    stream: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str,
    checkpoint_dir: str,
    partition_cols: list[str] | None = None,
):
    """Start an availableNow stream that MERGEs every micro-batch into
    the parquet gold table at ``path``. Returns the StreamingQuery
    (caller awaits termination)."""

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into_path(
            batch_df.sparkSession,
            path,
            batch_df,
            key_cols,
            version_col,
            partition_cols=partition_cols,
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
