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

ORDER CONTRACT AND THE LATE-DATA QUARANTINE: within an epoch, arrival
order is irrelevant — the rebuild sorts by (ts, seq), so shuffled
per-key change order replays identically (pinned in tests). ACROSS
epochs the persisted history keeps only COLLAPSED versions, so a
change arriving at-or-below a key's high-watermark — the max (ts, seq)
EVER SEEN for that key — is unsafe to apply: collapse may have dropped
an unchanged row after the late instant, and replaying without it
would erase a genuine reversion (e.g. A@t1, A@t2 collapsed to [A@t1];
late B@t1.5 must yield A,B,A — but the replay could only see A,B).
Such rows are REJECTED from the apply and, when ``quarantine_path`` is
given, appended there epoch-idempotently for out-of-band reprocessing.
Note the watermark is the frontier of ROWS SEEN, not of versions
retained: collapse-dropped rows advance it too.

REPLAY (at-least-once foreachBatch): each key persists
(watermark, previous watermark, advancing batch id). A retried epoch
finds its own ``batch_id`` recorded and evaluates lateness against the
PREVIOUS watermark — exactly the frontier the first attempt saw — so
the retry re-derives the identical late/on-time split: on-time rows
re-apply through the rebuild (idempotent: identical (ts,seq,attrs)
rows collapse away) and the quarantine files rewrite under the same
deterministic epoch names. Without the previous-watermark column a
replay would judge its own already-applied rows "late" and quarantine
the whole batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.upsert import scd2_history
from ..sources.fs import parquet_table_exists, write_epoch_files

KB = "__kb"
HWM_TS = "__hwm_ts"
HWM_SEQ = "__hwm_seq"
HWM_PTS = "__hwm_prev_ts"
HWM_PSEQ = "__hwm_prev_seq"
HWM_BATCH = "__hwm_batch"
_HWM_COLS = (HWM_TS, HWM_SEQ, HWM_PTS, HWM_PSEQ, HWM_BATCH)
#: watermark-batch tag for legacy rows (never equals a real epoch tag)
LEGACY_BATCH = "legacy"


def _bucket(key_cols: list[str], n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets))


def _scope_tag(scope: str) -> str:
    """Short stable digest of a scope string, used to namespace both the
    stored epoch tags and the quarantine file names. Hash (not the raw
    string) because scopes are checkpoint paths — long, and full of
    characters that must not reach file names."""
    import hashlib

    return hashlib.sha256(scope.encode("utf-8")).hexdigest()[:12]


def _row_struct(ts_col: str, seq_col: str) -> F.Column:
    return F.struct(F.col(ts_col).alias("t"), F.col(seq_col).alias("s"))


def _attach_hwm(hist: DataFrame, hwm: DataFrame, key_cols: list[str]) -> DataFrame:
    """Replicate each key's watermark record onto its history rows (a
    per-key constant; stored denormalized so the next epoch's frontier
    read needs no extra table). ``hwm``: key cols + __cur (struct),
    __prev (nullable struct), __hb (string epoch tag)."""
    return (
        hist.join(hwm, key_cols)
        .withColumn(HWM_TS, F.col("__cur.t"))
        .withColumn(HWM_SEQ, F.col("__cur.s"))
        .withColumn(HWM_PTS, F.col("__prev.t"))
        .withColumn(HWM_PSEQ, F.col("__prev.s"))
        .withColumn(HWM_BATCH, F.col("__hb"))
        .drop("__cur", "__prev", "__hb")
    )


def _frontier_of(pruned: DataFrame, key_cols: list[str], ts_col: str, seq_col: str) -> DataFrame:
    """Per-key watermark record out of the stored history rows.
    Histories written before the watermark columns existed fall back to
    the collapsed frontier (max retained opening) — the legacy, weaker
    contract — with no previous watermark and an impossible batch id."""
    legacy_cur = F.struct(
        F.col("valid_from").alias("t"), F.col("__seq").alias("s")
    )
    if HWM_TS in pruned.columns:
        # Rows with NULL watermark fields are LEGACY rows that slipped
        # into a partially-upgraded layout (mixed files after an epoch
        # that only touched some buckets): fall back to their collapsed
        # frontier per row — otherwise the null struct would poison the
        # lateness comparison and silently drop those keys' changes.
        # A NULL previous watermark is stored as null FIELDS; rebuild
        # it as a null STRUCT so isNotNull()/comparisons behave.
        cur = F.when(
            F.col(HWM_TS).isNotNull(),
            F.struct(F.col(HWM_TS).alias("t"), F.col(HWM_SEQ).alias("s")),
        ).otherwise(legacy_cur)
        prev_struct = F.when(
            F.col(HWM_PTS).isNotNull(),
            F.struct(F.col(HWM_PTS).alias("t"), F.col(HWM_PSEQ).alias("s")),
        )
        hb = F.when(
            F.col(HWM_TS).isNotNull(), F.col(HWM_BATCH)
        ).otherwise(F.lit(LEGACY_BATCH))
        return pruned.groupBy(*key_cols).agg(
            F.max(cur).alias("__cur"),
            F.max_by(prev_struct, cur).alias("__prev"),
            F.max_by(hb, cur).alias("__hb"),
        )
    return pruned.groupBy(*key_cols).agg(
        F.max(legacy_cur).alias("__cur"),
        # typed NULL of the same struct shape (when with no otherwise)
        F.max(F.when(F.lit(False), legacy_cur)).alias("__prev"),
        F.max(F.lit(LEGACY_BATCH)).alias("__hb"),
    )


def scd2_ingest_batch(
    batch_df: DataFrame,
    history_path: str,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    seq_col: str,
    n_buckets: int = 16,
    batch_id: int = 0,
    quarantine_path: str | None = None,
    scope: str = "",
) -> None:
    """The per-epoch apply (shared by the foreachBatch wrapper and the
    sequential-batch tests). Late rows — at-or-below their key's
    effective watermark — never reach the rebuild; see the module
    docstring for the corruption they would cause and for the replay
    contract.

    ``scope`` namespaces the replay detection: the stored epoch tag is
    ``{scope}#{batch_id}``, so a NEW stream (fresh checkpoint, its own
    scope) over an existing history can never mistake its first-time
    batch ids for replays and judge lateness against the weaker
    previous watermark. run_scd2_ingest scopes by checkpoint dir."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    # Data-file probe, NOT try/except around the read: a transient read
    # failure must raise, never masquerade as "no history yet" — the
    # no-history branch runs mode('overwrite') on history_path, and
    # taking it on an FS hiccup would destroy the persisted dimension.
    # (Data-file, not bare-path: a crashed initial write leaves only
    # _temporary debris and must re-take the initial build.)
    if not parquet_table_exists(spark, history_path):
        hwm = batch_df.groupBy(*key_cols).agg(
            F.max(_row_struct(ts_col, seq_col)).alias("__cur"),
            # typed NULL struct (when with no otherwise)
            F.max(F.when(F.lit(False), _row_struct(ts_col, seq_col))).alias(
                "__prev"
            ),
            F.max(F.lit(f"{scope}#{batch_id}")).alias("__hb"),
        )
        out = _attach_hwm(
            scd2_history(
                batch_df, key_cols, attr_cols, ts_col, seq_col, keep_seq=True
            ),
            hwm,
            key_cols,
        ).withColumn(KB, _bucket(key_cols, n_buckets))
        out.write.mode("overwrite").partitionBy(KB).parquet(history_path)
        return

    hist = spark.read.parquet(history_path)
    touched = batch_df.select(_bucket(key_cols, n_buckets).alias(KB)).distinct()
    # Partition pruning: only the touched buckets are ever read.
    pruned = hist.join(F.broadcast(touched), KB, "left_semi")

    bkeys = batch_df.select(*key_cols).distinct()
    frontier = _frontier_of(
        pruned.join(bkeys, key_cols, "left_semi"), key_cols, ts_col, seq_col
    )
    # Replay detection: if THIS batch already advanced the key, judge
    # lateness against the frontier the first attempt saw. The legacy
    # UNSCOPED tag ('#<batch_id>', written before scoping existed) also
    # counts as a same-stream match: an in-flight stream restarting
    # mid-upgrade with the SAME checkpoint must still recognize its own
    # pre-upgrade epoch, else the replay is judged against the advanced
    # watermark and its already-applied rows spuriously quarantine.
    # Pre-upgrade ALL tags were unscoped, so honoring them reproduces
    # exactly the pre-upgrade behavior for legacy rows; tags written
    # from now on are scoped and don't collide across streams.
    same_epoch = F.col("__hb") == F.lit(f"{scope}#{batch_id}")
    if scope:
        same_epoch = same_epoch | (
            F.col("__hb") == F.lit(f"#{batch_id}")
        )
    eff = F.when(same_epoch, F.col("__prev")).otherwise(F.col("__cur"))
    frontier = frontier.select(*key_cols, eff.alias("__eff"))

    b = batch_df.join(F.broadcast(frontier), key_cols, "left")
    # coalesce to False: a NULL comparison (e.g. a NULL ts in a
    # malformed row) must land the row in ontime, never drop it from
    # BOTH filters
    is_late = F.coalesce(
        F.col("__eff").isNotNull()
        & (_row_struct(ts_col, seq_col) <= F.col("__eff")),
        F.lit(False),
    )
    late = b.filter(is_late).drop("__eff")
    ontime = b.filter(~is_late)
    if quarantine_path is not None and not late.isEmpty():
        # Scope the epoch file names too: two streams sharing one
        # quarantine dir must not overwrite each other's batch files
        # when their independent batch-id counters collide.
        qprefix = "epoch" if not scope else f"epoch-{_scope_tag(scope)}-"
        write_epoch_files(late, quarantine_path, batch_id, prefix=qprefix)
    if ontime.isEmpty():
        return

    # From here on, only keys with at least one ON-TIME row take part —
    # fully-late keys stay byte-identical on disk.
    touched2 = ontime.select(_bucket(key_cols, n_buckets).alias(KB)).distinct()
    pruned2 = pruned.join(F.broadcast(touched2), KB, "left_semi")
    keys = ontime.select(*key_cols).distinct()
    affected = pruned2.join(keys, key_cols, "left_semi")
    bystanders = pruned2.join(keys, key_cols, "left_anti")
    # The affected keys' versions ARE their collapsed change log — the
    # retained __seq restores deterministic same-ts ordering. On a
    # replay the already-applied rows re-enter as exact duplicates of
    # retained versions or collapse-dropped rows and vanish in the
    # unchanged-row collapse — idempotent by construction.
    log_old = affected.select(
        *key_cols,
        *attr_cols,
        F.col("valid_from").alias(ts_col),
        F.col("__seq").alias(seq_col),
    )
    log_new = ontime.select(*key_cols, *attr_cols, ts_col, seq_col)
    new_hwm = (
        ontime.groupBy(*key_cols)
        .agg(F.max(_row_struct(ts_col, seq_col)).alias("__m"))
        .join(frontier, key_cols, "left")
        .select(
            *key_cols,
            F.greatest(F.col("__m"), F.col("__eff")).alias("__cur"),
            F.col("__eff").alias("__prev"),
            F.lit(f"{scope}#{batch_id}").alias("__hb"),
        )
    )
    rebuilt = _attach_hwm(
        scd2_history(
            log_old.unionByName(log_new),
            key_cols, attr_cols, ts_col, seq_col, keep_seq=True,
        ),
        new_hwm,
        key_cols,
    ).withColumn(KB, _bucket(key_cols, n_buckets))
    if HWM_TS not in hist.columns:
        # legacy-layout upgrade: bystander rows gain their collapsed
        # frontier as the initial watermark record
        bystanders = _attach_hwm(
            bystanders,
            _frontier_of(bystanders, key_cols, ts_col, seq_col).select(
                *key_cols, "__cur", "__prev", "__hb"
            ),
            key_cols,
        )
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
    quarantine_path: str | None = None,
    scope: str | None = None,
):
    """Start an availableNow CDC→SCD2 maintenance stream. Returns the
    StreamingQuery (caller awaits). Late rows (below their key's
    effective watermark) go to ``quarantine_path`` when given, else are
    rejected.

    Replay detection is SCOPED BY CHECKPOINT (``scope`` defaults to
    ``checkpoint_dir``): a new stream with a fresh checkpoint restarting
    at the same ``batch_id`` as a prior stream must NOT be treated as a
    replay of that stream's epoch — it would judge lateness against the
    weaker previous watermark and apply rows that must be quarantined.
    The same scope also namespaces the quarantine epoch file names."""
    eff_scope = checkpoint_dir if scope is None else scope

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        scd2_ingest_batch(
            batch_df, history_path, key_cols, attr_cols, ts_col, seq_col,
            n_buckets, batch_id=batch_id, quarantine_path=quarantine_path,
            scope=eff_scope,
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
