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
