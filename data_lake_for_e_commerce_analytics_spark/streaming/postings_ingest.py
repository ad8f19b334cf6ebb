"""Streaming document ingest into the AT-REST lexical (BM25 postings)
index — the foreachBatch glue that gives the segmented inverted index
(operators/retrieval.py r13 lifecycle) the same continuous-ingest life
the ANN index has (streaming/ann_ingest.py):

- every micro-batch of documents becomes its own postings SEGMENT via
  `retrieval.append_postings_segment` (batch 0 initializes the index);
- optional auto-merge: when the segment count exceeds ``merge_every``,
  the epoch additionally runs `compact_postings_segments` under the
  composite batch id (Lucene's background-merge policy reduced to a
  deterministic size trigger — probe cost grows with segment COUNT, so
  bounding the count bounds per-query scan fan-out).

Delivery contract: foreachBatch is AT-LEAST-ONCE; every effect here is
the batch lifecycle's, which is already idempotent — segment dirs are
written with overwrite under batchId-derived names and the sidecar swap
(recording ``last_batch_id``) is the commit point, so a replayed epoch
no-ops and a pre-swap crash replays overwrite-idempotently. Streaming
batch ids and lifecycle batch ids share one monotone stream by
construction (`_epoch_base` spaces them so the in-epoch merge gets its
own id), which also means an index root is bound to ONE streaming
checkpoint lineage — the same constraint as the ANN tier.

Scale notes: per-epoch cost tracks the BATCH (one tokenize + tf groupBy
over new docs); the only corpus-order work is the explicit merge, whose
cadence ``merge_every`` controls. Correctness of the resulting index is
gated upstream: the bm25_index_lifecycle / _delete / _update oracle
gates replay the identical batch operators this wrapper calls.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators import retrieval


def _epoch_base(batch_id: int) -> int:
    """Two lifecycle batch ids per streaming epoch: the append at
    2*batch_id, an optional in-epoch merge at 2*batch_id + 1 — keeping
    the sidecar's single monotone id stream while letting one epoch
    carry both effects idempotently."""
    return 2 * int(batch_id)


def apply_postings_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    merge_every: int = 8,
) -> dict:
    """The foreachBatch body, callable directly for batch replays and
    tests. Returns the sidecar after this epoch."""
    base = _epoch_base(batch_id)
    if not os.path.exists(
        os.path.join(index_path.rstrip("/"), retrieval.POSTINGS_SIDECAR)
    ):
        sc = retrieval.init_postings_index(batch_df, index_path, batch_id=base)
    else:
        sc = retrieval.append_postings_segment(
            batch_df, index_path, batch_id=base
        )
    if merge_every and len(sc["segments"]) > merge_every:
        spark = batch_df.sparkSession
        if retrieval._read_tombstones(spark, index_path) is not None:
            # pending deletes: the delete-aware full merge (physical
            # drop + stats rebase + tombstone retirement) — the plain
            # merge would resurrect killed docs and now refuses
            sc = retrieval.compact_postings_segments(
                spark, index_path, batch_id=base + 1
            )
        else:
            # no deletes: the size-tiered merge (r14) — only the
            # smallest size tier collapses, settled large segments stay
            # physically untouched, so an N-epoch stream rewrites each
            # byte O(log N) times instead of O(N). Segment count is
            # then bounded by tier structure (O(tier_factor * log N)),
            # not merge_every exactly — merge_every is the TRIGGER
            # cadence. A tier with nothing to merge bumps the sidecar
            # id and no-ops.
            sc = retrieval.merge_postings_segments(
                spark, index_path, batch_id=base + 1
            )
    return sc


def start_postings_ingest(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    merge_every: int = 8,
    trigger_available_now: bool = True,
):
    """Attach the ingest to a streaming documents source. The stream
    must carry (doc_id, text) with doc_ids UNIQUE across the lineage
    (append contract; re-index via the delete+append flow)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_postings_batch(
            batch_df, batch_id, index_path, merge_every=merge_every
        )

    writer = docs_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
