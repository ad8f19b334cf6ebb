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
job (it preserves the epoch-file naming contract no further: run it
only between streams, as with any non-transactional layout rewrite).

Delivery contract: foreachBatch is AT-LEAST-ONCE — the checkpoint
replays an epoch whose apply did not finish. Both appends are therefore
idempotent per epoch (`sources/fs.write_epoch_files`: deterministic
batchId-derived file names, staged then renamed), so a replay converges
to exactly one copy of the epoch in BOTH the corpus and the index —
effectively-once end to end, without a transactional table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.urls import url_incremental_dedup
from ..sources.fs import epoch_file_prefix, list_files, write_epoch_files


def _read_seen(spark, seen_path: str, exclude_batch_id: int | None = None) -> DataFrame:
    """The standing index as of BEFORE ``exclude_batch_id``: reads the
    index's files by explicit list, skipping the excluded epoch's own
    deterministically-named files. On a replay the first attempt may
    already have appended this epoch's digests — probing against them
    would mark the whole batch 'seen' and the retry would commit an
    EMPTY epoch (silent data loss). Excluding the epoch's own files
    makes the replay re-derive the exact first-attempt verdicts.

    No try/except around the read: a transient index read failure must
    raise — swallowing it would make every batch row look unseen and
    re-admit the whole batch."""
    skip = (
        epoch_file_prefix(exclude_batch_id) if exclude_batch_id is not None else None
    )
    files = [
        f
        for f in list_files(spark, seen_path, suffix=".parquet")
        if skip is None or not f.rsplit("/", 1)[-1].startswith(skip)
    ]
    if not files:
        return spark.createDataFrame([], "ck string")
    return spark.read.parquet(*files)


def ingest_url_batch(
    batch_df: DataFrame, seen_path: str, corpus_path: str, batch_id: int = 0
) -> None:
    """The per-epoch apply: canonical self-dedup, seen-set probe, then
    two epoch-idempotent appends (survivors to the corpus, their digests
    to the index). A retry of the same ``batch_id`` probes the index AS
    OF the prior epoch (its own digest files excluded) and rewrites the
    same deterministic file names — same verdicts, same files, no
    duplicates — which is what makes the at-least-once replay safe even
    if a crash lands between the two appends."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    verdicts = url_incremental_dedup(
        batch_df, _read_seen(spark, seen_path, exclude_batch_id=batch_id)
    )
    kept = batch_df.join(
        verdicts.filter(F.col("status") == "kept").select("doc_id", "canon_url"),
        "doc_id",
    )
    # `kept` feeds two writes; truncate so the probe doesn't re-run and
    # the corpus append can't race the digest append's readers on retry.
    kept = kept.localCheckpoint(eager=True)
    write_epoch_files(kept.drop("canon_url"), corpus_path, batch_id)
    write_epoch_files(
        kept.select(F.md5("canon_url").alias("ck")).distinct(), seen_path, batch_id
    )


def run_url_ingest(
    stream: DataFrame, seen_path: str, corpus_path: str, checkpoint_dir: str
):
    """Start an availableNow crawl-ingestion stream guarded by the
    standing seen-URL index. Returns the StreamingQuery (caller
    awaits)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        ingest_url_batch(batch_df, seen_path, corpus_path, batch_id)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
