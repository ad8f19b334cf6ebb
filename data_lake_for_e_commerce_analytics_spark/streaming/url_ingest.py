"""Streaming crawl ingestion guarded by the standing seen-URL index:
every micro-batch of (doc_id, url, ...) rows is canonical-URL-deduped
within the batch, probed against the persisted seen set
(`operators/urls.url_incremental_dedup` — the SAME operator the batch
gate runs), and only first-seen pages are appended to the corpus AND
their canonical digests to the index — so the next epoch automatically
skips every page any earlier epoch kept.

Scale notes: per-epoch cost tracks the BATCH — the index probe joins
the batch side in (broadcast), the index never reshuffles, and the
appended state is 16 bytes per new page. Compaction of the
accumulating digest files is `sources/maintenance.compact_parquet`'s
job; the checkpoint gives exactly-once appends per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.urls import url_incremental_dedup


def _read_seen(spark, seen_path: str) -> DataFrame:
    try:
        return spark.read.parquet(seen_path)
    except Exception:
        return spark.createDataFrame([], "ck string")


def ingest_url_batch(batch_df: DataFrame, seen_path: str, corpus_path: str) -> None:
    """The per-epoch apply: canonical self-dedup, seen-set probe, append
    survivors to the corpus and their digests to the index."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    verdicts = url_incremental_dedup(batch_df, _read_seen(spark, seen_path))
    kept = batch_df.join(
        verdicts.filter(F.col("status") == "kept").select("doc_id", "canon_url"),
        "doc_id",
    )
    # `kept` feeds two writes; truncate so the probe doesn't re-run and
    # the corpus append can't race the digest append's readers on retry.
    kept = kept.localCheckpoint(eager=True)
    kept.drop("canon_url").write.mode("append").parquet(corpus_path)
    kept.select(F.md5("canon_url").alias("ck")).distinct().write.mode(
        "append"
    ).parquet(seen_path)


def run_url_ingest(
    stream: DataFrame, seen_path: str, corpus_path: str, checkpoint_dir: str
):
    """Start an availableNow crawl-ingestion stream guarded by the
    standing seen-URL index. Returns the StreamingQuery (caller
    awaits)."""

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        ingest_url_batch(batch_df, seen_path, corpus_path)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
