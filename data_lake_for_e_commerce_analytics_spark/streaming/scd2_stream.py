"""Streaming CDC → SCD2 maintenance: fold change-log micro-batches into
a persisted type-2 dimension history WITHOUT re-scanning the full
history each epoch. The rebuild is scoped to the AFFECTED KEYS of the
batch; everything else is untouched on disk.

Layout: the history parquet is partitioned by a hash bucket of the
dimension key (``__kb = pmod(xxhash64(keys), n_buckets)``). Each epoch:

1. read only the buckets the batch touches (partition pruning),
2. within them, split affected keys (left-semi on the batch's keys)
   from bystander keys,
3. replay the affected keys' persisted versions as a change log (their
   opening ``__seq`` values were retained for exactly this) unioned
   with the new rows, through the SAME ``operators/upsert.scd2_history``
   the batch gate runs,
4. dynamic-partition-overwrite ONLY the touched buckets.

So per-epoch cost tracks the batch's key set, not the dimension: a 1%
daily change set reads and rewrites ~1% of buckets.

ORDER CONTRACT: per key, (ts, seq) must be non-decreasing ACROSS
epochs — the persisted history keeps only collapsed versions, so a
change arriving with a timestamp BEFORE an already-collapsed span
cannot resurrect the collapsed rows it should have split (the same
contract a watermarked streaming aggregation makes: late data beyond
the retained state is undefined). In-order epochs are pinned equal to
the one-shot batch build in tests/test_upsert.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.upsert import scd2_history
from ..sources.fs import path_exists

KB = "__kb"


def _bucket(key_cols: list[str], n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets))


def scd2_ingest_batch(
    batch_df: DataFrame,
    history_path: str,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    seq_col: str,
    n_buckets: int = 16,
) -> None:
    """The per-epoch apply (shared by the foreachBatch wrapper and the
    sequential-batch tests)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    # Existence probe, NOT try/except around the read: a transient read
    # failure must raise, never masquerade as "no history yet" — the
    # no-history branch runs mode('overwrite') on history_path, and
    # taking it on an FS hiccup would destroy the persisted dimension.
    exists = path_exists(spark, history_path)
    if exists:
        hist = spark.read.parquet(history_path)

    if not exists:
        out = scd2_history(
            batch_df, key_cols, attr_cols, ts_col, seq_col, keep_seq=True
        ).withColumn(KB, _bucket(key_cols, n_buckets))
        out.write.mode("overwrite").partitionBy(KB).parquet(history_path)
        return

    touched = batch_df.select(_bucket(key_cols, n_buckets).alias(KB)).distinct()
    # Partition pruning: only the touched buckets are ever read.
    pruned = hist.join(F.broadcast(touched), KB, "left_semi")
    keys = batch_df.select(*key_cols).distinct()
    affected = pruned.join(keys, key_cols, "left_semi")
    bystanders = pruned.join(keys, key_cols, "left_anti")
    # The affected keys' versions ARE their collapsed change log — the
    # retained __seq restores deterministic same-ts ordering.
    log_old = affected.select(
        *key_cols,
        *attr_cols,
        F.col("valid_from").alias(ts_col),
        F.col("__seq").alias(seq_col),
    )
    log_new = batch_df.select(*key_cols, *attr_cols, ts_col, seq_col)
    rebuilt = scd2_history(
        log_old.unionByName(log_new),
        key_cols, attr_cols, ts_col, seq_col, keep_seq=True,
    ).withColumn(KB, _bucket(key_cols, n_buckets))
    out = bystanders.unionByName(rebuilt)
    # The overwrite target is also the scan source; materialize first
    # (same staging note as operators/upsert.merge_into_path).
    out = out.localCheckpoint(eager=True)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(KB)
        .parquet(history_path)
    )


def run_scd2_ingest(
    stream: DataFrame,
    history_path: str,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    seq_col: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
):
    """Start an availableNow CDC→SCD2 maintenance stream. Returns the
    StreamingQuery (caller awaits)."""

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        scd2_ingest_batch(
            batch_df, history_path, key_cols, attr_cols, ts_col, seq_col, n_buckets
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
