"""Streaming corpus-quality monitoring: per-micro-batch drift against a
persisted reference histogram.

The batch pipeline snapshots a reference token histogram of the blessed
corpus (`write_reference_histogram`); the ingest stream then scores every
arriving micro-batch against it (same KL/TV math as the batch
`operators/text.corpus_drift` gate — one shared code path via
`drift_from_histograms`) and appends a one-row metric record per batch.
Alerting tails the metrics table; a sudden KL spike means the crawl
changed under you BEFORE the bad batch pollutes training data.

Scale shape: the reference is ``n_buckets`` rows (broadcast), the batch
histogram is one partial aggregation over the micro-batch, and the
metric append is one row — per-epoch cost tracks the BATCH, never the
corpus, the same discipline as incremental_ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import drift_from_histograms, token_histogram


def write_reference_histogram(
    documents: DataFrame, path: str, n_buckets: int = 256
) -> None:
    """Snapshot the blessed corpus's token histogram (n_buckets rows)."""
    token_histogram(documents, n_buckets).write.mode("overwrite").parquet(path)


def batch_drift_record(
    batch_df: DataFrame, reference_path: str, batch_id: int, n_buckets: int = 256
) -> DataFrame:
    """One metric row for a micro-batch: doc/token counts + summed KL
    (batch||reference) and TV micro-units over the bucket terms."""
    spark = batch_df.sparkSession
    ref = spark.read.parquet(reference_path)
    terms = drift_from_histograms(
        token_histogram(batch_df, n_buckets), ref, n_buckets
    )
    return terms.agg(
        F.lit(batch_id).alias("batch_id"),
        F.sum(F.col("c_a")).alias("n_tokens"),
        F.sum("kl_ab_micro").alias("kl_micro"),
        F.sum("tv_micro").alias("tv_micro"),
    )


def run_drift_monitor(
    stream_df: DataFrame,
    reference_path: str,
    metrics_path: str,
    checkpoint_path: str,
    n_buckets: int = 256,
):
    """foreachBatch monitor: score each micro-batch against the
    reference and append the metric row. availableNow-compatible; the
    checkpoint gives exactly-once metric appends per epoch."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_drift_record(
            batch_df, reference_path, batch_id, n_buckets
        ).write.mode("append").parquet(metrics_path)

    return (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
