"""Streaming ANN index maintenance: continuous embedding ingest into
the at-rest IVF+SQ8 index with the measured re-train trigger in the
loop (SCALING.md r10, retrain_trigger_r10.json).

Per micro-batch (foreachBatch):

1. `operators/similarity.batch_drift_metrics` scores the batch against
   the FROZEN geometry — mean assignment distance (÷ the sidecar's
   base value = QDR) and SQ8 out-of-range clip fraction; both are
   map-side aggregates riding along with the ingest;
2. under the trigger (QDR <= `qdr_max` AND clip <= `clip_max`) the
   batch APPENDS: assigned + encoded with the stored geometry into its
   own epoch SEGMENT — FAISS-shard / Lucene-segment style, a
   cell-partitioned parquet dir per epoch, listed in the sidecar;
3. over the trigger the index REBUILDS from the raw corpus (seed +
   every kept epoch + this batch): fresh Lloyd centroids, fresh SQ8
   stats, one new base segment replacing the list, sidecar swapped;
4. either way the batch's raw vectors append to the corpus zone (the
   float vectors a rebuild needs never live in the index itself), and
   a metrics row (epoch, n, qdr, clip, action) appends to the log.

Probing unions the per-segment directory-pruned scans — every segment
shares the sidecar geometry by construction (appends reuse it; a
rebuild collapses to one segment), so ranking is the exact
`ivf_sq8_knn_pruned` integer contract across segments.

Delivery contract: foreachBatch is AT-LEAST-ONCE. Every epoch effect is
idempotent — the epoch segment is written with overwrite under a
batchId-derived name, corpus/metrics rows go through
`sources/fs.write_epoch_files` (deterministic names, staged-then-
renamed), and a rebuild recomputes deterministically from the same
corpus prefix (its segment name is batchId-derived too), so a replay
converges to the first attempt's state. The sidecar is REWRITTEN last
and records ``last_batch_id``: a replayed epoch (batch_id <= recorded)
is a pure no-op. Without that guard the REBUILD path double-applied
under replay (ADVICE r10): a crash after the rebuild's sidecar swap but
before the streaming checkpoint commit replays the epoch against the
NEW geometry, measures QDR ~1, takes the append branch, and adds a
segment whose vectors already live in the rebuild segment — duplicate
vec_ids in top-k plus a contradictory metrics row. Ordering per epoch:
corpus append -> segment/rebuild write -> metrics write -> sidecar swap
(so a pre-swap crash replays everything overwrite-idempotently, and a
post-swap replay no-ops with ALL effects already durable). Consequence
of batch_id-keyed idempotency: an index root is bound to ONE streaming
checkpoint lineage — restarting with a fresh checkpoint (batch ids
reset to 0) against an existing index would silently skip batches.

Superseded segment directories are DELETED after the sidecar swap that
drops them (rebuild collapses the list; compaction swaps in one
segment): they are unreferenced by construction once the swap is
durable, and keeping them leaked disk proportional to ingest history
(ADVICE r10). They survive only across the swap itself for crash
safety.

Scale notes: per-epoch cost tracks the batch (assign/encode are
map-side literal folds; the only full-corpus work is the explicit
rebuild, whose cadence the trigger controls); probes stay
directory-pruned per segment, so query cost grows with segment COUNT,
not corpus size — compaction = letting the next rebuild collapse the
list (or lowering the trigger).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..sources.fs import write_epoch_files

SIDECAR = "sidecar.json"


def _normalized(df: DataFrame) -> DataFrame:
    """Corpus-zone schema: (vec_id, label, embedding array<double>).

    Invariant: vec_ids must be globally unique across the corpus
    lineage (seed + every epoch) — the rebuild's cell assignment joins
    on vec_id, so a duplicated id double-joins into the new segment
    (caught by the gate's compaction row count, r11)."""
    return df.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def _write_sidecar(root: str, payload: dict) -> None:
    """Atomic-ish local JSON swap (tmp + rename). A real deployment
    CASes this through the object store like snapshots.py manifests."""
    tmp = os.path.join(root, SIDECAR + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(root, SIDECAR))


def read_sidecar(root: str) -> dict:
    with open(os.path.join(root, SIDECAR)) as f:
        s = json.load(f)
    s["stats"] = {int(k): tuple(v) for k, v in s["stats"].items()}
    return s


def _base_metrics(vectors: DataFrame, centroids, stats) -> float:
    row = similarity.batch_drift_metrics(vectors, centroids, stats).head()
    return float(row["mean_assign_dist"])


def init_ann_index(
    spark: SparkSession,
    embeddings: DataFrame,
    root: str,
    n_cells: int = 16,
    lloyd_iters: int = 2,
    qdr_max: float = 1.2,
    clip_max: float = 0.01,
) -> dict:
    """Seed the streaming index: corpus zone, one base segment, sidecar
    (geometry + base drift metric + trigger thresholds + segment list)."""
    os.makedirs(root, exist_ok=True)
    corpus = os.path.join(root, "corpus")
    # corpus zone normalizes to array<double>: batches may arrive float
    # or double and mixed-physical-type parquet fails the rebuild read
    _normalized(embeddings).write.mode("overwrite").parquet(
        os.path.join(corpus, "seed")
    )
    seg = os.path.join(root, "seg_base")
    centroids, stats = similarity.write_ivf_sq8_index(
        embeddings, seg, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    sidecar = {
        "centroids": [[float(x) for x in row] for row in centroids],
        "stats": {str(k): [float(v[0]), float(v[1])] for k, v in stats.items()},
        "base_mean_dist": _base_metrics(embeddings, centroids, stats),
        "segments": ["seg_base"],
        "n_cells": n_cells,
        "lloyd_iters": lloyd_iters,
        "qdr_max": qdr_max,
        "clip_max": clip_max,
        "last_batch_id": -1,
    }
    _write_sidecar(root, sidecar)
    return sidecar


def _read_corpus(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "corpus", "*"))


def _write_metrics(
    spark: SparkSession,
    root: str,
    batch_id: int,
    n: int,
    mean_assign_dist: float | None,
    qdr: float | None,
    clip: float | None,
    action: str,
    n_segments: int,
) -> None:
    metrics = spark.createDataFrame(
        [
            (
                int(batch_id),
                int(n),
                mean_assign_dist,
                qdr,
                clip,
                action,
                int(n_segments),
            )
        ],
        "epoch long, n long, mean_assign_dist double, qdr double, "
        "clip_frac double, action string, n_segments int",
    )
    write_epoch_files(metrics, os.path.join(root, "metrics"), batch_id)


def _gc_segments(root: str, dropped: list[str]) -> None:
    """Delete segment directories no longer referenced by the sidecar.
    Called strictly AFTER the sidecar swap: the dirs are unreferenced by
    construction, and a pre-swap crash leaves them for the replay."""
    import shutil

    for seg in dropped:
        shutil.rmtree(os.path.join(root, seg), ignore_errors=True)


def ingest_ann_batch(batch_df: DataFrame, root: str, batch_id: int = 0) -> str:
    """The per-epoch apply. Returns the action taken ('append' |
    'rebuild' | 'empty' | 'replayed') — foreachBatch discards it; tests
    assert it. 'replayed' = batch_id <= the sidecar's last_batch_id:
    the first attempt's sidecar swap committed, so every epoch effect
    is already durable and the apply is a pure no-op (see the module
    delivery contract)."""
    if batch_df.isEmpty():
        return "empty"
    spark = batch_df.sparkSession
    s = read_sidecar(root)
    if batch_id <= s.get("last_batch_id", -1):
        return "replayed"
    batch_df = _normalized(batch_df).localCheckpoint(eager=True)
    import numpy as np

    centroids = np.asarray(s["centroids"], dtype=np.float64)
    stats = s["stats"]
    m = similarity.batch_drift_metrics(batch_df, centroids, stats).head()
    qdr = float(m["mean_assign_dist"]) / s["base_mean_dist"]
    clip = float(m["clip_frac"])
    # corpus append FIRST (epoch-idempotent): both branches need the
    # raw vectors durable before the index reflects them
    write_epoch_files(batch_df, os.path.join(root, "corpus", "epochs"), batch_id)

    dropped: list[str] = []
    if qdr <= s["qdr_max"] and clip <= s["clip_max"]:
        action = "append"
        seg = os.path.join(root, f"seg_epoch_{batch_id:08d}")
        # same assign/encode as append_to_ivf_sq8_index, into an
        # overwrite-idempotent epoch segment instead of a shared append
        _write_segment(batch_df, centroids, stats, seg)
        segments = s["segments"] + [os.path.basename(seg)]
        s["segments"] = sorted(set(segments))
    else:
        action = "rebuild"
        corpus = _read_corpus(spark, root)
        seg = os.path.join(root, f"seg_rebuild_{batch_id:08d}")
        centroids2, stats2 = similarity.write_ivf_sq8_index(
            corpus, seg, n_cells=s["n_cells"], lloyd_iters=s["lloyd_iters"]
        )
        dropped = [x for x in s["segments"] if x != os.path.basename(seg)]
        s.update(
            {
                "centroids": [[float(x) for x in row] for row in centroids2],
                "stats": {
                    str(k): [float(v[0]), float(v[1])] for k, v in stats2.items()
                },
                "base_mean_dist": _base_metrics(corpus, centroids2, stats2),
                "segments": [os.path.basename(seg)],
            }
        )

    # metrics BEFORE the sidecar swap: a post-swap replay no-ops, so
    # every effect (including this row) must already be durable by then
    _write_metrics(
        spark, root, batch_id, int(m["n"]), float(m["mean_assign_dist"]),
        round(qdr, 6), clip, action, len(s["segments"]),
    )
    s["last_batch_id"] = max(int(s.get("last_batch_id", -1)), int(batch_id))
    _write_sidecar(root, s)
    _gc_segments(root, dropped)
    return action


def _write_segment(batch_df: DataFrame, centroids, stats, seg_path: str) -> None:
    """Frozen-geometry encode of one batch into its own cell-partitioned
    segment — the epoch-idempotent (overwrite) form of
    `append_to_ivf_sq8_index`, sharing its exact assign/encode kernel
    (`similarity.encode_frozen_geometry`)."""
    (
        similarity.encode_frozen_geometry(batch_df, centroids, stats)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(seg_path)
    )


def probe_ann_index(
    spark: SparkSession,
    root: str,
    query_vec,
    k: int = 10,
    n_probe: int = 4,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Union of per-segment directory-pruned probes under the ONE
    sidecar geometry — the exact `ivf_sq8_knn_pruned` integer ranking
    over however many segments the trigger has accumulated."""
    import numpy as np

    s = read_sidecar(root)
    centroids = np.asarray(s["centroids"], dtype=np.float64)
    out = None
    for seg in s["segments"]:
        part = similarity.ivf_sq8_knn_pruned(
            spark,
            os.path.join(root, seg),
            centroids,
            s["stats"],
            [float(x) for x in query_vec],
            k=k,
            n_probe=n_probe,
            exclude_vec_id=exclude_vec_id,
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("sqdist", "vec_id").limit(k)


def run_ann_ingest(stream: DataFrame, root: str, checkpoint_dir: str):
    """Start an availableNow embedding-ingest stream maintaining the
    segmented index under the drift trigger. Returns the StreamingQuery
    (caller awaits)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        ingest_ann_batch(batch_df, root, batch_id)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_segments(spark: SparkSession, root: str, batch_id: int) -> int:
    """Collapse all current segments into one WITHOUT retraining — the
    cheap maintenance between trigger-fired rebuilds. Every segment was
    encoded under the same sidecar geometry (appends freeze it; a
    rebuild starts a fresh list), so compaction never touches a vector:
    it moves (vec_id, label, code, cell) rows verbatim into one new
    cell-partitioned segment and swaps the sidecar list. Probe cost
    returns to one directory-pruned scan; ranking is bit-identical
    before and after (pytest-pinned — codes are copied, not recomputed).

    Idempotent under replay like every other epoch effect: the target
    segment name derives from ``batch_id`` and is written with
    overwrite; re-running swaps in the same state (a replay that finds
    one segment is a no-op — the first attempt's metrics row is already
    durable, written before the swap). Superseded segment dirs are
    deleted after the swap; the maintenance metrics log records the
    decision (action='compact', drift columns NULL — no batch was
    scored) and the post-compaction segment count. ``last_batch_id`` is
    NOT advanced: compaction is index maintenance, not ingest, and may
    run outside the stream's batch-id sequence. Returns the number of
    compacted rows."""
    s = read_sidecar(root)
    if len(s["segments"]) <= 1:
        return 0
    parts = None
    for seg in s["segments"]:
        df = spark.read.parquet(os.path.join(root, seg)).select(
            "vec_id", "label", "code", "cell"
        )
        parts = df if parts is None else parts.unionByName(df)
    target = f"seg_compact_{batch_id:08d}"
    parts = parts.localCheckpoint(eager=True)  # sever lineage from dirs we keep
    n = parts.count()
    parts.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(root, target)
    )
    dropped = [x for x in s["segments"] if x != target]
    _write_metrics(spark, root, batch_id, n, None, None, None, "compact", 1)
    s["segments"] = [target]
    _write_sidecar(root, s)
    _gc_segments(root, dropped)
    return n
