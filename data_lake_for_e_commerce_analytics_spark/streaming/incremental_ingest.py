"""Streaming corpus ingestion with a standing dedup index: every
micro-batch is (1) internally exact-deduplicated, (2) probed against the
persisted fingerprint+LSH index (`operators/dedup.incremental_dedup`),
and (3) only the `kept` documents are appended to the corpus AND to the
index — so the next batch automatically dedups against everything that
ever survived. One code path with batch (`incremental_dedup_frames` is
the same operator the batch gate runs), which keeps stream and batch
agreeing on what counts as a duplicate.

Scale notes: per-epoch cost tracks the BATCH, not the corpus — the index
probe broadcasts the batch side (plan-pinned in tests/test_dedup.py) and
appends write only the batch's rows. The index's band files are
partitioned by band_idx; compaction of the accumulating small appends is
`sources/maintenance.compact_parquet`'s job, same as any streaming sink.
The checkpoint gives exactly-once appends per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import (
    dedup_index_frames,
    fingerprint_col,
    incremental_dedup,
)


def _batch_exact_dedup(batch_df: DataFrame) -> DataFrame:
    """Within-batch exact dedup on the canonical fingerprint (keep the
    min doc_id) — duplicates ARRIVING TOGETHER must not both pass the
    index probe just because neither is indexed yet."""
    w = Window.partitionBy("__fp").orderBy("doc_id")
    return (
        batch_df.withColumn("__fp", fingerprint_col())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def ingest_batch(batch_df: DataFrame, index_path: str, corpus_path: str) -> None:
    """The per-epoch apply: self-dedup, probe, append survivors to the
    corpus and their fingerprints/signatures/bands to the index."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    batch = _batch_exact_dedup(batch_df)
    verdicts = incremental_dedup(spark, batch, index_path)
    kept = batch.join(
        verdicts.filter(F.col("status") == "kept").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    # localCheckpoint: `kept` feeds three writes below; without it each
    # write re-runs the probe joins (and the corpus append would race
    # the index append's readers on retry).
    kept = kept.localCheckpoint(eager=True)
    kept.write.mode("append").parquet(corpus_path)
    docs, bands = dedup_index_frames(kept)
    docs.write.mode("append").parquet(f"{index_path}/docs")
    bands.write.mode("append").partitionBy("band_idx").parquet(
        f"{index_path}/bands"
    )


def run_incremental_ingest(
    stream: DataFrame,
    index_path: str,
    corpus_path: str,
    checkpoint_dir: str,
):
    """Start an availableNow ingestion stream guarded by the standing
    dedup index. Returns the StreamingQuery (caller awaits)."""

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        ingest_batch(batch_df, index_path, corpus_path)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
