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

Deletes (r11) complete the lifecycle as TOMBSTONES, the Lucene
liveness-doc design — EPOCH-SCOPED since r13: every corpus and
segment row carries its ``ingest_epoch`` (seed rows -1, batch rows
their batch_id — provenance survives rebuild/compact/vacuum because
the column rides the rows, not the directory names), and
`delete_ann_ids` records ``(vec_id, del_before=batch_id)``. A row is
live iff ``ingest_epoch >= del_before`` of its id's LATEST delete, so
a delete kills only versions ingested BEFORE it and the re-index
(update) flow is simply delete -> re-ingest — the same
``(id, del_before)`` semantics the lexical index uses at segment
granularity (operators/retrieval.py), here at row granularity because
rebuild/compact mix epochs inside one segment. Probes apply the
liveness filter INSIDE each segment scan (before any top-k, so a
deleted vector can neither appear nor shrink the result); a rebuild
leaves killed rows out of the new segment and geometry; a compaction
physically drops their code rows (and fires on a single segment when
it still holds killed rows). The tombstone relation is bounded by
distinct delete history, not corpus size. `vacuum_corpus` is the
storage-reclamation half: it folds the live corpus (sidecar-listed
membership minus killed rows) into one consolidated dir, swaps the
sidecar (the commit point — corpus reads follow the membership list
plus an epoch-file watermark, never a glob), GCs the consumed
dirs/files, and retires the tombstone log once neither store holds a
killed row.

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
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..sources.fs import (
    epoch_file_prefix,
    sniff_local_parquet_fields,
    write_epoch_files,
    write_local_epoch_table,
)

#: writer-controlled layouts, field order as written. Readers pass the
#: matching explicit schema to spark.read (r14 opt): schema inference is
#: a Spark job per read (~0.15 s) and the lifecycle gates issue dozens.
#: Optional fields (the pre-r13 shim columns) are included only when a
#: driver-side footer sniff confirms them — mixed/unknown layouts fall
#: back to Spark's own inference so legacy semantics stay untouched.
_CORPUS_FIELDS = (
    ("vec_id", "long"),
    ("label", "int"),
    ("embedding", "array<double>"),
    ("ingest_epoch", "int"),
)
_SEGMENT_FIELDS = (
    ("vec_id", "long"),
    ("label", "int"),
    ("code", "array<tinyint>"),
    ("ingest_epoch", "int"),
)
_OPTIONAL_FIELDS = {"ingest_epoch", "del_before"}


def _known_ddl(sniffed: dict | None, fields, partition_cols="") -> str | None:
    """Explicit read DDL iff the footer sniff confirms the writer layout
    by NAME and TYPE (r15, ADVICE r14: the name-only gate let a layout
    with drifted stored types — double embeddings, long labels — pass
    and then fail the narrowing read instead of falling back)."""
    if sniffed is None:
        return None
    declared = {n: t for n, t in fields}
    if not set(sniffed).issubset(declared):
        return None
    if not (set(declared) - _OPTIONAL_FIELDS).issubset(sniffed):
        return None
    from pyspark.sql.types import _parse_datatype_string

    for name, stored_t in sniffed.items():
        want = _parse_datatype_string(declared[name]).simpleString()
        if stored_t != want:
            return None  # type drift: let Spark infer the real layout
    ddl = ", ".join(f"{n} {t}" for n, t in fields if n in sniffed)
    return ddl + partition_cols


def _read_layout(spark: SparkSession, paths, fields, partition_cols="") -> DataFrame:
    """spark.read with the writer's explicit schema when a local footer
    sniff confirms the layout (names AND types); plain inference
    otherwise."""
    ddl = _known_ddl(sniff_local_parquet_fields(paths), fields, partition_cols)
    reader = spark.read if ddl is None else spark.read.schema(ddl)
    return reader.parquet(*paths)

SIDECAR = "sidecar.json"

#: liveness sentinel for PRE-r13 rows (no ingest_epoch column): strictly
#: below every legal epoch (-1 = seed, >= 0 = batches), so under the
#: del_before = 2**31 - 1 tombstone shim a pre-r13 delete still kills
#: every pre-r13 row — exactly the old id-scoped kill-everything
#: semantics (ADVICE r13).
PRE_EPOCH = -(2**31)


def _with_epoch_default(df: DataFrame) -> DataFrame:
    """Default a missing ``ingest_epoch`` column to the PRE_EPOCH
    sentinel. Pre-r13 roots wrote segment/corpus rows without the
    provenance column; every reader that touches it (probe, rebuild,
    compact, vacuum) routes through this shim so a legacy root with
    deletes keeps working instead of failing AnalysisException
    (ADVICE r13)."""
    if "ingest_epoch" in df.columns:
        return df
    return df.withColumn("ingest_epoch", F.lit(PRE_EPOCH).cast("int"))


def _normalized(df: DataFrame, ingest_epoch: int | None = None) -> DataFrame:
    """Corpus-zone schema: (vec_id, label, embedding array<double>,
    ingest_epoch int). ``ingest_epoch`` stamps the given literal (a
    writer recording provenance); None PRESERVES the column already on
    the rows (vacuum relaying live rows — provenance must survive the
    fold or epoch-scoped tombstones stop distinguishing versions).

    Invariant: vec_ids must be globally unique across the LIVE corpus
    lineage (seed + every epoch, minus killed versions) — the rebuild's
    cell assignment joins on vec_id, so a duplicated live id
    double-joins into the new segment (caught by the gate's compaction
    row count, r11). A re-ingested id is legal precisely because the
    tombstone kills every earlier version first."""
    epoch_col = (
        F.col("ingest_epoch").cast("int")
        if ingest_epoch is None
        else F.lit(int(ingest_epoch)).cast("int")
    )
    return df.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        epoch_col.alias("ingest_epoch"),
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
    # or double and mixed-physical-type parquet fails the rebuild read.
    # Seed rows get ingest_epoch -1 — strictly before every batch id,
    # so any future delete kills them (epoch-scoped tombstones, r13)
    seeded = _normalized(embeddings, ingest_epoch=-1)
    seeded.write.mode("overwrite").parquet(os.path.join(corpus, "seed"))
    seg = os.path.join(root, "seg_base")
    centroids, stats = similarity.write_ivf_sq8_index(
        seeded, seg, n_cells=n_cells, lloyd_iters=lloyd_iters,
        extra_cols=("ingest_epoch",),
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
        # corpus membership (r11 vacuum): the listed dirs plus every
        # epochs/ file whose batch id exceeds the vacuum watermark
        "corpus_dirs": ["seed"],
        "vacuumed_upto": -1,
        # how run_ann_ingest maps STREAM batch ids to lifecycle ids
        # (r14, ADVICE r13): "spaced2" = ingest at 2*b, in-epoch
        # compaction at 2*b + 1. Recording the scheme in the commit
        # record lets a resume detect a pre-r13 (unspaced) lineage
        # instead of relying on the monotone replay guard, which an
        # upgraded replay (2b > b) silently slips past.
        "id_scheme": "spaced2",
    }
    _write_sidecar(root, sidecar)
    return sidecar


_EPOCH_RE = re.compile(r"^epoch(\d{10})-")


def _epoch_batch_id(name: str) -> int | None:
    m = _EPOCH_RE.match(name)
    return int(m.group(1)) if m else None


def _corpus_snapshot(root: str, sidecar: dict) -> tuple[list[str], int]:
    """ONE filesystem listing of the live corpus membership: returns
    (paths, max_epoch_batch_id_included). Any maintenance op that
    derives a watermark from "what was read" must share the read's
    snapshot — vacuum previously listed epochs/ twice (once for the
    watermark, once inside the corpus read), and an ingest epoch file
    landing between the two listings was folded into the vacuum dir AND
    kept above the watermark: duplicate vec_ids that double-join at the
    next rebuild (ADVICE r11).

    A sidecar-listed dir missing on disk RAISES: the sidecar is the
    commit record, so a listed dir can only be absent through
    corruption or an interrupted external mutation — silently skipping
    it (the pre-r12 behavior) shrank the rebuild/vacuum input, i.e.
    masked data loss (ADVICE r11)."""
    corpus = os.path.join(root, "corpus")
    paths: list[str] = []
    for d in sidecar["corpus_dirs"]:
        p = os.path.join(corpus, d)
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"sidecar-listed corpus dir missing on disk: {p} — the "
                "sidecar is the commit record; absence means corruption "
                "or an external mutation, never a legitimate replay state"
            )
        paths.append(p)
    upto = sidecar.get("vacuumed_upto", -1)
    max_seen = upto
    epochs = os.path.join(corpus, "epochs")
    if os.path.isdir(epochs):
        for name in sorted(os.listdir(epochs)):
            b = _epoch_batch_id(name)
            if b is not None and b > upto:
                paths.append(os.path.join(epochs, name))
                max_seen = max(max_seen, b)
    return paths, max_seen


def _read_corpus(
    spark: SparkSession, root: str, sidecar: dict | None = None
) -> DataFrame:
    """Corpus = the sidecar-listed dirs + every epochs/ file above the
    vacuum watermark (one snapshot via `_corpus_snapshot`). Pre-r11
    sidecars (no corpus membership keys) fall back to the original
    corpus/* glob."""
    s = sidecar if sidecar is not None else read_sidecar(root)
    if "corpus_dirs" not in s:
        return _with_epoch_default(
            spark.read.parquet(os.path.join(root, "corpus", "*"))
        )  # glob fallback: membership unknown, let Spark list + infer
    paths, _ = _corpus_snapshot(root, s)
    return _with_epoch_default(_read_layout(spark, paths, _CORPUS_FIELDS))


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
    """Append one decision row to the batch_id-keyed metrics log
    (collision-guarded — see `_guard_batch_id`).

    The row's values are already plain driver scalars (they come off
    the 1-row drift aggregate / maintenance counters), so the commit
    record is written DRIVER-SIDE with pyarrow under the same
    epoch-file naming protocol — a 1-row manifest write is metadata,
    not data, and scheduling a Spark job for it cost ~1 s per epoch
    (r14 opt, guide §5: the driver should do no data work, but a 1-row
    commit record is not data work)."""
    _guard_batch_id(spark, root, batch_id, action)
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "epoch": pa.array([int(batch_id)], pa.int64()),
            "n": pa.array([int(n)], pa.int64()),
            "mean_assign_dist": pa.array([mean_assign_dist], pa.float64()),
            "qdr": pa.array([qdr], pa.float64()),
            "clip_frac": pa.array([clip], pa.float64()),
            "action": pa.array([action], pa.string()),
            "n_segments": pa.array([int(n_segments)], pa.int32()),
        }
    )
    write_local_epoch_table(table, os.path.join(root, "metrics"), batch_id)


def _guard_batch_id(
    spark: SparkSession, root: str, batch_id: int, action: str
) -> None:
    """Refuse a batch_id already used for a DIFFERENT operation
    (ADVICE r11). The metrics log (and, for deletes, the tombstone log)
    is keyed by batch_id with epoch-idempotent overwrite, so an id
    reused across operations — an ingest epoch vs a later
    delete/compact/vacuum, or two distinct maintenance calls — silently
    overwrites the earlier row. A prior row for this batch_id with a
    DIFFERENT action raises; the SAME action is a legitimate
    at-least-once replay (every epoch effect is an idempotent
    overwrite) and proceeds. Maintenance ops call this BEFORE their
    first durable effect so a refused call leaves no partial state;
    `_write_metrics` re-checks for every writer."""
    metrics_dir = os.path.join(root, "metrics")
    prefix = epoch_file_prefix(batch_id)
    if not os.path.isdir(metrics_dir):
        return
    hits = [
        n_
        for n_ in os.listdir(metrics_dir)
        if n_.startswith(prefix) and n_.endswith(".parquet")
    ]
    if not hits:
        return
    # driver-side footer read (r14 opt): the guard inspects one column
    # of a 1-row commit record — a pyarrow read, not a Spark job
    import pyarrow.parquet as pq

    prior = None
    for h in hits:
        t = pq.read_table(os.path.join(metrics_dir, h), columns=["action"])
        if t.num_rows:
            prior = {"action": t.column("action")[0].as_py()}
            break
    if prior is not None and prior["action"] != action:
        raise ValueError(
            f"batch_id {batch_id} already holds a '{prior['action']}' row "
            f"in the metrics log; refusing to overwrite it with '{action}' "
            "— maintenance ids must be disjoint from every id already in "
            "the log"
        )


def _gc_segments(root: str, dropped: list[str]) -> None:
    """Delete segment directories no longer referenced by the sidecar.
    Called strictly AFTER the sidecar swap: the dirs are unreferenced by
    construction, and a pre-swap crash leaves them for the replay."""
    import shutil

    for seg in dropped:
        shutil.rmtree(os.path.join(root, seg), ignore_errors=True)


def _tombstones(spark: SparkSession, root: str) -> DataFrame | None:
    """Tombstones as ``(vec_id, del_before)`` — one row per deleted id
    with its LATEST delete batch — or None when no delete was ever
    recorded. Read per maintenance op — the relation is bounded by
    delete HISTORY (distinct deleted ids), not corpus size. Pre-r13
    logs (no del_before column) are read as del_before = +inf-ish
    (kills every version — the old id-scoped semantics they recorded)."""
    path = os.path.join(root, "tombstones")
    if not os.path.isdir(path):
        return None
    raw = _read_layout(
        spark, [path], (("vec_id", "long"), ("del_before", "int"))
    )
    if "del_before" not in raw.columns:
        raw = raw.withColumn("del_before", F.lit(2**31 - 1))
    return raw.groupBy("vec_id").agg(F.max("del_before").alias("del_before"))


def _apply_tombstones(df: DataFrame, tomb: DataFrame | None) -> DataFrame:
    """Drop rows killed by the epoch-scoped tombstone relation: a row
    dies iff its id was deleted AFTER its ingest (ingest_epoch <
    del_before). Broadcast left join + keep — the exact shape of the
    lexical tier's `retrieval._apply_tombstones`, at row granularity.
    Pre-r13 rows without the column get the PRE_EPOCH default."""
    if tomb is None:
        return df
    df = _with_epoch_default(df)
    return (
        df.join(F.broadcast(tomb), "vec_id", "left")
        .filter(
            F.col("del_before").isNull()
            | (F.col("del_before") <= F.col("ingest_epoch"))
        )
        .drop("del_before")
    )


def delete_ann_ids(
    spark: SparkSession, root: str, vec_ids, batch_id: int
) -> int:
    """Record streaming deletes as TOMBSTONES (Lucene liveness-doc
    shape), EPOCH-SCOPED since r13: each id lands as
    ``(vec_id, del_before=batch_id)`` in an epoch-idempotent parquet
    log, killing only row versions with ``ingest_epoch < del_before``
    — so a later re-ingest of the same id (the update flow) is live by
    construction. Probes filter killed rows out BEFORE any top-k
    (deleted vectors can never displace live ones), the next REBUILD
    leaves them out of the new segment entirely, and the next
    COMPACTION physically drops their code rows. The raw corpus zone
    keeps the floats — the tombstone relation is the liveness filter
    over it until a vacuum physically purges killed versions.

    ``vec_ids`` is a list of ints or a DataFrame with a ``vec_id``
    column. Replay-idempotent: the tombstone files are batch_id-derived
    overwrites and the read side takes max(del_before) per id, so
    re-deletes and replayed epochs converge. ``last_batch_id`` is NOT
    advanced —
    deletes are maintenance, valid outside the ingest stream's batch-id
    sequence (same contract as compact_segments). CAUTION shared by all
    maintenance ops (delete/compact/vacuum): the metrics log and the
    tombstone log are KEYED by batch_id (epoch-idempotent overwrite),
    so a maintenance id that collides with a past ingest epoch or
    another maintenance call would silently overwrite that row — give
    maintenance ops ids disjoint from everything already in the log.
    Enforced at runtime (r12, `_guard_batch_id`): a colliding id whose
    prior row carries a different action raises BEFORE any effect
    lands; a same-action reuse is an at-least-once replay and proceeds.
    Returns the number of ids recorded this call; the metrics log gets
    an action='delete' row (drift columns NULL — nothing was scored)."""
    uniq: list[int] | None = None
    if isinstance(vec_ids, DataFrame):
        ids_df = (
            vec_ids.select(F.col("vec_id").cast("long"))
            .distinct()
            .withColumn("del_before", F.lit(int(batch_id)).cast("int"))
            .localCheckpoint(eager=True)
        )
        n = ids_df.count()
    else:
        # list input: dedupe driver-side — the count, the emptiness
        # verdict AND the log write are driver work on driver data
        # (r14 opt — a Lucene-style term-delete set is metadata; the
        # relation path above keeps its distributed distinct + write)
        uniq = sorted({int(v) for v in vec_ids})
        n = len(uniq)
    if n == 0:
        return 0
    # guard BEFORE the tombstone write: a colliding id must leave no
    # partial state (a recorded delete with no metrics row)
    _guard_batch_id(spark, root, batch_id, "delete")
    tomb_dir = os.path.join(root, "tombstones")
    if uniq is not None:
        import pyarrow as pa

        write_local_epoch_table(
            pa.table(
                {
                    "vec_id": pa.array(uniq, pa.int64()),
                    "del_before": pa.array([int(batch_id)] * n, pa.int32()),
                }
            ),
            tomb_dir,
            batch_id,
        )
    else:
        write_epoch_files(ids_df, tomb_dir, batch_id)
    s = read_sidecar(root)
    _write_metrics(
        spark, root, batch_id, n, None, None, None, "delete",
        len(s["segments"]),
    )
    return n


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
    batch_df = _normalized(batch_df, ingest_epoch=batch_id)
    import numpy as np

    centroids = np.asarray(s["centroids"], dtype=np.float64)
    stats = s["stats"]
    # corpus append FIRST (epoch-idempotent): both branches need the
    # raw vectors durable before the index reflects them. The durable
    # epoch files then SERVE AS the batch materialization for the drift
    # score, the re-ingest guard and the segment encode below (r14 opt:
    # one pass over the incoming batch instead of localCheckpoint +
    # write).
    epochs_dir = os.path.join(root, "corpus", "epochs")
    write_epoch_files(batch_df, epochs_dir, batch_id)
    import glob as _glob

    batch_df = spark.read.schema(
        ", ".join(f"{n} {t}" for n, t in _CORPUS_FIELDS)
    ).parquet(
        *_glob.glob(os.path.join(epochs_dir, epoch_file_prefix(batch_id) + "*"))
    )
    # RE-INGEST GUARD (r13): epoch-scoped tombstones make re-ingesting
    # a deleted id the LEGAL update flow — the new rows carry
    # ingest_epoch = batch_id >= del_before, so they are live while
    # every earlier version stays killed, in both the index and the
    # corpus zone (the rebuild's kill-filter keeps exactly one live
    # version). The only illegal shape left is a re-ingest whose
    # batch_id PRECEDES the id's latest delete — the new rows would be
    # dead on arrival, which can only happen when a caller violates the
    # monotone shared batch-id keyspace. Refuse that loudly. The guard
    # runs against the RE-READ epoch files (r15, ADVICE r14): it must
    # validate exactly the rows that persisted, not an independent
    # re-execution of the raw batch lineage — a non-deterministic
    # source could otherwise persist rows the guard never saw. A raise
    # here leaves only the durable epoch files (no segment, metrics or
    # sidecar advance); the rows it refused are killed by the very
    # tombstones that triggered it, so every corpus reader filters
    # them, and a corrected retry overwrites the files idempotently.
    tomb = _tombstones(spark, root)
    if tomb is not None:
        doa = (
            batch_df.join(F.broadcast(tomb), "vec_id")
            .filter(F.col("del_before") > F.lit(int(batch_id)))
            .select("vec_id")
            .head(3)
        )
        if doa:
            ids = [r["vec_id"] for r in doa]
            raise ValueError(
                f"batch {batch_id} re-ingests vec_ids {ids}… whose latest "
                "delete has del_before > this batch_id — the rows would be "
                "dead on arrival; maintenance and ingest ids share one "
                "monotone keyspace, so a re-ingest must use a batch_id "
                "AFTER the delete that killed the old version"
            )
    m = similarity.batch_drift_metrics(batch_df, centroids, stats).head()
    qdr = float(m["mean_assign_dist"]) / s["base_mean_dist"]
    clip = float(m["clip_frac"])

    dropped: list[str] = []
    if qdr <= s["qdr_max"] and clip <= s["clip_max"]:
        action = "append"
        seg = os.path.join(root, f"seg_epoch_{batch_id:08d}")
        # same assign/encode as append_to_ivf_sq8_index, into an
        # overwrite-idempotent epoch segment instead of a shared append
        _write_segment(batch_df, centroids, stats, seg, ingest_epoch=batch_id)
        segments = s["segments"] + [os.path.basename(seg)]
        s["segments"] = sorted(set(segments))
    else:
        action = "rebuild"
        corpus = _read_corpus(spark, root, s)
        # killed versions stay out of the new segment AND out of the
        # fresh geometry/base-metric: a rebuild is the index-level
        # physical purge (the corpus zone keeps the raw floats until a
        # vacuum — see delete_ann_ids). The kill-filter is per-VERSION
        # (ingest_epoch < del_before), so a re-ingested id contributes
        # exactly its one live version to the rebuild.
        tomb = _tombstones(spark, root)
        corpus = _apply_tombstones(corpus, tomb)
        seg = os.path.join(root, f"seg_rebuild_{batch_id:08d}")
        centroids2, stats2 = similarity.write_ivf_sq8_index(
            corpus, seg, n_cells=s["n_cells"], lloyd_iters=s["lloyd_iters"],
            extra_cols=("ingest_epoch",),
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


def _write_segment(
    batch_df: DataFrame, centroids, stats, seg_path: str, ingest_epoch: int
) -> None:
    """Frozen-geometry encode of one batch into its own cell-partitioned
    segment — the epoch-idempotent (overwrite) form of
    `append_to_ivf_sq8_index`, sharing its exact assign/encode kernel
    (`similarity.encode_frozen_geometry`). Rows are stamped with their
    ``ingest_epoch`` (one literal — an append segment is one batch) so
    epoch-scoped tombstones can judge their liveness forever after."""
    (
        similarity.encode_frozen_geometry(batch_df, centroids, stats)
        .withColumn("ingest_epoch", F.lit(int(ingest_epoch)).cast("int"))
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
    predicate=None,
    allowed_ids: DataFrame | None = None,
) -> DataFrame:
    """Union of per-segment directory-pruned probes under the ONE
    sidecar geometry — the exact `ivf_sq8_knn_pruned` integer ranking
    over however many segments the trigger has accumulated. Killed row
    versions (delete_ann_ids — epoch-scoped: ingest_epoch < del_before)
    are filtered out INSIDE each segment probe, before its top-k, so a
    deleted vector can neither appear nor shrink the result below k
    while live candidates exist — and a re-ingested id's live version
    ranks normally.

    Filtered search (r12): ``predicate`` (Column over vec_id/label/cell)
    and ``allowed_ids`` (vec_id allow-relation) ride the same
    inside-the-probe placement as the tombstone anti-join — PRE-filter
    semantics per segment, so a streaming index serves metadata-
    constrained top-k without post-filter under-fill."""
    import numpy as np

    s = read_sidecar(root)
    centroids = np.asarray(s["centroids"], dtype=np.float64)
    tomb = _tombstones(spark, root)
    if tomb is not None:
        tomb = tomb.localCheckpoint(eager=True)  # one read, t segment reuses
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
            tombstones=tomb,
            predicate=predicate,
            allowed_ids=allowed_ids,
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("sqdist", "vec_id").limit(k)


def probe_ann_index_multi(
    spark: SparkSession,
    root: str,
    queries: dict[int, tuple[int | None, list]],
    k: int = 10,
    n_probe: int = 4,
    predicate=None,
    allowed_ids: DataFrame | None = None,
) -> DataFrame:
    """Batched probe of the streaming segmented index — the QPS serving
    shape: per segment ONE directory-pruned scan serves the whole query
    batch via `similarity.ivf_sq8_knn_pruned_multi` (broadcast
    (qid, cell) probe pairs + (qid, qcode) query codes), per-qid
    partial top-k per segment, one final qid-partitioned top-k over the
    tiny union. Liveness (epoch-scoped tombstones), ``predicate`` and
    ``allowed_ids`` land inside each segment scan exactly like the
    single-query `probe_ann_index`, whose per-qid relation this equals
    (pytest-pinned). ``queries``: {qid: (exclude_vec_id | None,
    query_vec)}."""
    from pyspark.sql import Window

    s = read_sidecar(root)
    import numpy as np

    centroids = np.asarray(s["centroids"], dtype=np.float64)
    tomb = _tombstones(spark, root)
    if tomb is not None:
        tomb = tomb.localCheckpoint(eager=True)  # one read, every segment reuses
    out = None
    for seg in s["segments"]:
        part = similarity.ivf_sq8_knn_pruned_multi(
            spark,
            os.path.join(root, seg),
            centroids,
            s["stats"],
            queries,
            k=k,
            n_probe=n_probe,
            tombstones=tomb,
            predicate=predicate,
            allowed_ids=allowed_ids,
        )
        out = part if out is None else out.unionByName(part)
    w = Window.partitionBy("qid").orderBy("sqdist", "vec_id")
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "label", "sqdist")
        .orderBy("qid", "sqdist", "vec_id")
    )


def vacuum_corpus(spark: SparkSession, root: str, batch_id: int) -> int:
    """Physically reclaim the corpus zone (the missing half of a
    delete, r11): fold every live corpus row — sidecar-listed dirs plus
    epochs files above the vacuum watermark, MINUS killed row versions
    (epoch-scoped tombstones: ingest_epoch < del_before) — into one
    consolidated ``corpus/vacuum_{batch_id}`` dir, swap the sidecar to
    it, and GC the consumed dirs/files. After a vacuum the killed
    versions exist nowhere in the corpus zone, so a rebuild can never
    resurrect them even without the tombstone filter; a re-ingested
    id's live version survives the fold with its provenance intact.

    Crash/replay contract (same shape as every other epoch effect):
    the vacuum dir is a batch_id-derived overwrite; the sidecar swap is
    the commit point (corpus reads ignore an uncommitted vacuum dir —
    membership is sidecar-listed, not globbed); consumed epoch files
    are excluded by the ``vacuumed_upto`` watermark the moment the swap
    lands, so the post-swap GC is pure space reclamation and a crash
    anywhere replays convergently. The metrics log records
    action='vacuum' with the LIVE corpus row count.

    Tombstone retirement: when, after the swap, no segment holds a
    KILLED row version either (i.e. a purge compaction or rebuild
    already ran), the tombstone log itself is deleted — both stores are
    clean, so the liveness filter has nothing left to guard. A live
    re-ingested version of a once-deleted id does NOT block retirement.
    If segments still hold killed rows the log stays, and probes keep
    filtering. Returns the live row count."""
    s = read_sidecar(root)
    _guard_batch_id(spark, root, batch_id, "vacuum")
    # migrate pre-r11 sidecars in-memory BEFORE reading: the glob
    # fallback would double-count a crashed earlier vacuum attempt's
    # uncommitted dir; the membership list never can
    s.setdefault("corpus_dirs", ["seed"])
    s.setdefault("vacuumed_upto", -1)
    corpus_root = os.path.join(root, "corpus")
    epochs = os.path.join(corpus_root, "epochs")
    # ONE snapshot feeds both the read and the watermark: an ingest
    # epoch landing between two separate listings would be folded into
    # the vacuum dir AND kept above the watermark — duplicate vec_ids
    # at the next rebuild (ADVICE r11)
    paths, consumed_upto = _corpus_snapshot(root, s)
    live = _with_epoch_default(_read_layout(spark, paths, _CORPUS_FIELDS))
    tomb = _tombstones(spark, root)
    live = _apply_tombstones(live, tomb)
    # ingest_epoch=None: PRESERVE each surviving row's provenance —
    # a vacuum relays versions, it must not re-stamp them
    live = _normalized(live)
    target = f"vacuum_{batch_id:08d}"
    target_path = os.path.join(corpus_root, target)
    # one pass (r14 opt): write from the source dirs (deleted only after
    # the sidecar swap below), count from the written parquet metadata —
    # replaces localCheckpoint + count + write (two materializations).
    # EXCEPT on a replay, where the committed vacuum dir is itself a
    # source: overwriting a dir the plan reads from loses the data, so
    # that (rare, recovery-only) path keeps the materialize-first shape.
    if any(os.path.abspath(p) == os.path.abspath(target_path) for p in paths):
        live = live.localCheckpoint(eager=True)
    live.write.mode("overwrite").parquet(target_path)
    n = spark.read.schema(
        ", ".join(f"{n_} {t}" for n_, t in _CORPUS_FIELDS)
    ).parquet(target_path).count()
    _write_metrics(
        spark, root, batch_id, n, None, None, None, "vacuum",
        len(s["segments"]),
    )
    old_dirs = [d for d in s.get("corpus_dirs", ["seed"]) if d != target]
    s["corpus_dirs"] = [target]
    s["vacuumed_upto"] = consumed_upto
    _write_sidecar(root, s)
    # --- post-swap space reclamation (replay-safe: all excluded) ---
    import shutil

    for d in old_dirs:
        shutil.rmtree(os.path.join(corpus_root, d), ignore_errors=True)
    if os.path.isdir(epochs):
        for name in os.listdir(epochs):
            # local-FS writes leave .{name}.crc checksum siblings —
            # reclaim those with their data files
            data_name = (
                name[1:-4] if name.startswith(".") and name.endswith(".crc")
                else name
            )
            b = _epoch_batch_id(data_name)
            if b is not None and b <= consumed_upto:
                os.remove(os.path.join(epochs, name))
    if tomb is not None:
        index_dirty = False
        for seg in s["segments"]:
            seg_scan = _with_epoch_default(
                _read_layout(
                    spark, [os.path.join(root, seg)], _SEGMENT_FIELDS,
                    partition_cols=", cell int",
                )
            )
            # dirty = holds a KILLED row version (a live re-ingested
            # version of a once-deleted id needs no tombstone guard)
            t = F.broadcast(tomb)
            killed = seg_scan.join(
                t,
                (seg_scan["vec_id"] == t["vec_id"])
                & (seg_scan["ingest_epoch"] < t["del_before"]),
                "left_semi",
            )
            if not killed.isEmpty():
                index_dirty = True
                break
        if not index_dirty:
            shutil.rmtree(os.path.join(root, "tombstones"), ignore_errors=True)
    return n


def apply_ann_batch(
    batch_df: DataFrame,
    batch_id: int,
    root: str,
    compact_every: int | None = None,
) -> None:
    """The foreachBatch body of `run_ann_ingest`, callable directly for
    batch replays and tests (the postings_ingest.apply_postings_batch
    precedent). Maps the STREAM batch id to lifecycle ids per the
    root's recorded ``id_scheme`` (see `run_ann_ingest` for the
    pre-r13 resume semantics), runs the ingest, and fires the optional
    in-epoch compaction."""
    s = read_sidecar(root)
    scheme = s.get("id_scheme")
    if scheme is None:
        if int(s.get("last_batch_id", -1)) <= -1:
            # fresh legacy root (init predates the scheme field but
            # nothing ingested): adopt spaced ids and record it
            s["id_scheme"] = scheme = "spaced2"
            _write_sidecar(root, s)
        else:
            scheme = "unspaced"
    if scheme == "spaced2":
        base = 2 * int(batch_id)
    else:
        # pre-r13 lineage: keep ITS id mapping so batch b replays
        # compare against the ids the root actually recorded
        if compact_every is not None:
            raise ValueError(
                "pre-r13 (unspaced-id) index root: in-epoch "
                "compaction has no reserved id slot in the unspaced "
                "keyspace — resume with compact_every=None and run "
                "compact_segments out-of-band with a disjoint "
                "batch_id, or re-initialize the root"
            )
        base = int(batch_id)
    ingest_ann_batch(batch_df, root, base)
    if compact_every is not None:
        s = read_sidecar(root)
        if len(s["segments"]) > compact_every:
            compact_segments(batch_df.sparkSession, root, base + 1)


def run_ann_ingest(
    stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
):
    """Start an availableNow embedding-ingest stream maintaining the
    segmented index under the drift trigger. Returns the StreamingQuery
    (caller awaits).

    ``compact_every`` bounds probe fan-out the way the lexical glue's
    ``merge_every`` does (streaming/postings_ingest.py): probe cost
    grows with segment COUNT, so when an epoch leaves more than
    ``compact_every`` segments, an in-epoch `compact_segments` collapses
    them. Lifecycle ids are spaced 2x per streaming epoch — the ingest
    at 2*batch_id, the optional compaction at 2*batch_id + 1 — keeping
    one monotone id stream while both effects stay replay-idempotent.

    The mapping is recorded in the sidecar as ``id_scheme`` (r14,
    ADVICE r13): a pre-r13 root recorded UNSPACED ids, so resuming it
    under the spaced scheme would let an at-least-once replay of stream
    batch b slip the monotone guard (2b > recorded b) and ingest twice
    — duplicate live vec_ids, the module's own corruption invariant.
    Resume behavior per root: scheme "spaced2" (every root initialized
    since r14) runs spaced; a legacy root with NO recorded scheme and
    no ingest history is stamped "spaced2" and proceeds; a legacy root
    WITH history is TRANSLATED — it keeps running unspaced (exactly its
    recorded keyspace, so the replay guard stays sound) and refuses
    ``compact_every`` (the unspaced keyspace has no in-epoch slot for
    the compaction id; run compact_segments out-of-band with a disjoint
    id instead)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_ann_batch(batch_df, batch_id, root, compact_every=compact_every)

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
    it moves (vec_id, label, code, cell, ingest_epoch) rows verbatim
    into one new cell-partitioned segment and swaps the sidecar list. Probe cost
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
    compacted rows.

    Compaction is also where deletes become PHYSICAL in the index:
    killed row versions (delete_ann_ids — ingest_epoch < del_before)
    are dropped during the relayout, so the returned row count is the
    LIVE count; a re-ingested id's live version is carried through. A
    single-segment index still compacts when that segment holds killed
    rows (the purge case); it no-ops only when there is genuinely
    nothing to do."""
    s = read_sidecar(root)
    _guard_batch_id(spark, root, batch_id, "compact")
    tomb = _tombstones(spark, root)
    if len(s["segments"]) <= 1:
        if tomb is None:
            return 0
        only = _with_epoch_default(
            _read_layout(
                spark, [os.path.join(root, s["segments"][0])], _SEGMENT_FIELDS,
                partition_cols=", cell int",
            )
        )
        t = F.broadcast(tomb)
        killed = only.join(
            t,
            (only["vec_id"] == t["vec_id"])
            & (only["ingest_epoch"] < t["del_before"]),
            "left_semi",
        )
        if killed.isEmpty():
            return 0  # one segment, already purged — nothing to do
    parts = None
    for seg in s["segments"]:
        df = _with_epoch_default(
            _read_layout(
                spark, [os.path.join(root, seg)], _SEGMENT_FIELDS,
                partition_cols=", cell int",
            )
        ).select("vec_id", "label", "code", "cell", "ingest_epoch")
        parts = df if parts is None else parts.unionByName(df)
    parts = _apply_tombstones(parts, tomb)
    target = f"seg_compact_{batch_id:08d}"
    # ONE pass (r14 opt, guide §1.2): write the relayout straight from
    # the source segments (still on disk until _gc_segments below), then
    # count from the written files' parquet metadata — replaces the
    # localCheckpoint + count + write triple, which materialized the
    # union twice and scheduled three jobs for one relayout. On a
    # replay the committed compact dir is itself a source (segments ==
    # [target]); overwriting a dir the plan reads loses the data, so
    # that recovery-only path keeps the materialize-first shape.
    if target in s["segments"]:
        parts = parts.localCheckpoint(eager=True)
    parts.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(root, target)
    )
    n = spark.read.schema(
        ", ".join(f"{n_} {t}" for n_, t in _SEGMENT_FIELDS) + ", cell int"
    ).parquet(os.path.join(root, target)).count()
    dropped = [x for x in s["segments"] if x != target]
    _write_metrics(spark, root, batch_id, n, None, None, None, "compact", 1)
    s["segments"] = [target]
    _write_sidecar(root, s)
    _gc_segments(root, dropped)
    return n
