"""Exactly-once streaming appends onto a snapshot-isolated table.

foreachBatch is at-least-once; the snapshot commit log turns that into
exactly-once the same way Delta's txnAppId/txnVersion does: every epoch
commits through ``sources/snapshots.snapshot_write`` with
``txn_id = f"{app_id}/{batch_id}"``. A replayed epoch finds its txn_id
in a retained manifest and the commit is a version-returning no-op —
no duplicate rows, no duplicate version, regardless of where the first
attempt crashed (data files without a manifest are invisible; the
manifest publish is the single atomic commit point).

Contrast ``sources/fs.write_epoch_files`` (used by url_ingest): that
path keeps a plain parquet directory readable by anything, at the cost
of deterministic-name file surgery; this path gives the full snapshot
contract (atomic multi-partition commit, pinned readers, time travel)
on top of one manifest per epoch. Vacuum retirement bounds the txn_id
lookback — size ``keep_last`` to the stream's replay horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.snapshots import snapshot_write


def append_batch_to_snapshot(
    batch_df: DataFrame, root: str, app_id: str, batch_id: int
) -> int:
    """The per-epoch apply: one idempotent snapshot append. Returns the
    committed (or already-committed) version."""
    return snapshot_write(
        batch_df, root, mode="append", txn_id=f"{app_id}/{batch_id}"
    )


def run_snapshot_append(
    stream: DataFrame, root: str, checkpoint_dir: str, app_id: str = "stream"
):
    """Start an availableNow stream appending every micro-batch to the
    snapshot table at ``root`` exactly once. Returns the StreamingQuery
    (caller awaits)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_batch_to_snapshot(batch_df, root, app_id, batch_id)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
