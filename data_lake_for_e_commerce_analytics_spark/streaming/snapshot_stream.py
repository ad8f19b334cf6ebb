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


def _read_consumer_state(spark, state_path: str) -> dict:
    """Consumer state file as a dict; {} when absent. Keys: ``version``
    (last acked source version) and optionally ``pending`` (a range
    upper bound pinned by ``pump_snapshot_pipeline`` before its sink
    commit — see the pinning discussion there)."""
    import json as _json

    from ..sources.fs import path_exists
    from ..sources.snapshots import _read_text

    if not path_exists(spark, state_path):
        return {}
    return _json.loads(_read_text(spark, state_path))


def _write_consumer_state(spark, state_path: str, state: dict) -> None:
    """Atomically persist the consumer state dict."""
    import json as _json

    from ..sources.fs import _fs_and_path, delete_path, rename
    from ..sources.snapshots import _write_text

    body = _json.dumps(state)
    fs, jpath = _fs_and_path(spark, state_path)
    if fs.getUri().getScheme() == "file":
        # atomic overwrite: rename-over (os.replace) — a crash can
        # never lose the consumer position, only leave the previous
        # one (safe: at-least-once re-consume)
        import os

        local = jpath.toUri().getPath()
        tmp = local + ".tmp"
        with open(tmp, "w") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, local)
        return
    # non-local fallback: delete+rename (HDFS rename won't overwrite);
    # the delete->rename window can lose the state file, which
    # re-consumes from scratch — at-least-once, as documented, never a
    # skipped version
    tmp = state_path + ".tmp"
    _write_text(spark, tmp, body)
    delete_path(spark, state_path, recursive=False)
    if not rename(spark, tmp, state_path):
        raise IOError(f"consumer state publish failed: {state_path}")


def append_batch_to_snapshot(
    batch_df: DataFrame, root: str, app_id: str, batch_id: int
) -> int:
    """The per-epoch apply: one idempotent snapshot append. Returns the
    committed (or already-committed) version."""
    return snapshot_write(
        batch_df, root, mode="append", txn_id=f"{app_id}/{batch_id}"
    )


def consume_snapshot_changes(
    spark,
    root: str,
    state_path: str,
    key_cols: list[str] | None = None,
    compare_cols: list[str] | None = None,
    pin_to_version: int | None = None,
):
    """Incremental consumption OUT of a snapshot table (the Delta
    streaming-source pull shape): returns (DataFrame, ack) where the
    frame holds everything committed since the last acknowledged
    version, and calling ``ack()`` persists the new consumer position
    (atomically, via staged rename) so the next call starts after it.
    Consume-then-ack gives at-least-once; an idempotent downstream
    (e.g. `append_batch_to_snapshot` keyed by the version range) makes
    it exactly-once.

    Two read paths, chosen per commit:

    - APPEND commits: the new rows ARE the files the child manifest
      added — a manifest set-difference, zero joins, cost O(new data).
    - OVERWRITE/MERGE commits need row diffing: requires ``key_cols``/
      ``compare_cols`` and emits the row-level CDF
      (`operators/upsert.snapshot_changes`) against the previously
      consumed version. Without key columns such commits raise rather
      than silently re-emitting the world.

    Output schema: when ``key_cols``/``compare_cols`` are given, BOTH
    paths emit the same CDF shape (key cols, change_type, old_*, new_*
    — appends as change_type='added' with NULL old columns), so
    consecutive pulls union cleanly into one sink. Without them the
    append path returns the raw rows plus change_type (and non-append
    commits raise).

    ``pin_to_version`` caps the consumed range at a specific source
    version: the pull behaves as if nothing later exists. Pipeline
    replay uses this (``pump_snapshot_pipeline``) so a range whose sink
    commit may already have happened is re-derived EXACTLY, even when
    the source gained commits in between — otherwise the replay's
    txn_id (keyed on the range's upper bound) would differ and the
    already-committed rows would re-append as duplicates.

    Returns (None, ack) when nothing new is committed.
    """
    from ..sources.snapshots import (
        read_manifest,
        snapshot_read,
        snapshot_versions,
    )

    last = int(_read_consumer_state(spark, state_path).get("version", 0))
    all_versions = snapshot_versions(spark, root)
    if (
        pin_to_version is not None
        and pin_to_version > last
        and pin_to_version not in all_versions
    ):
        raise ValueError(
            f"pinned version v{pin_to_version} (state file {state_path}) "
            f"was vacuumed from {root}; retained: {all_versions}. Size "
            "vacuum keep_last above the slowest consumer's lag."
        )
    if last and last not in all_versions:
        # The acked version has been vacuumed: neither the append
        # fast-path (manifest set-difference) nor the row-diff path
        # (snapshot_read of `last`) can reconstruct the consumer's
        # baseline. A raw py4j file-not-found here would wedge the
        # consumer with no explanation — raise the contract instead.
        raise ValueError(
            f"consumer position v{last} (state file {state_path}) was "
            f"vacuumed from {root}; retained versions: {all_versions}. "
            "Size vacuum keep_last above the slowest consumer's lag. "
            "To recover, delete the state file and re-consume from "
            "scratch (downstream must be idempotent)."
        )
    versions = [
        v
        for v in all_versions
        if v > last
        and (pin_to_version is None or v <= pin_to_version)
    ]

    def make_ack(to_version: int):
        def ack() -> None:
            # a plain {"version": N} body — no "pending" key — also
            # CLEARS any pending range pin the pipeline driver wrote
            _write_consumer_state(
                spark, state_path, {"version": to_version}
            )

        # expose the position this ack will persist: pipeline drivers
        # key their sink txn_id on it (pump_snapshot_pipeline)
        ack.to_version = to_version
        return ack

    if not versions:
        return None, make_ack(last)

    # append fast path applies when every commit in the range only adds
    # files (the initial load counts as all-added whatever its mode)
    all_append = True
    prev_files = (
        set(read_manifest(spark, root, last)["files"]) if last else set()
    )
    new_files: list[str] = []
    for v in versions:
        m = read_manifest(spark, root, v)
        initial_load = last == 0 and v == versions[0]
        if not initial_load and m["operation"] != "append":
            all_append = False
            break
        cur = set(m["files"])
        new_files.extend(sorted(cur - prev_files))
        prev_files = cur

    to_v = versions[-1]
    if all_append:
        from pyspark.sql import functions as F

        if not new_files:
            return None, make_ack(to_v)
        from ..sources.snapshots import _read_manifest_files

        raw = _read_manifest_files(
            spark, root, read_manifest(spark, root, to_v), new_files
        )
        if key_cols is not None and compare_cols is not None:
            # unify to the CDF shape so pulls union with the diff path
            df = raw.select(
                *key_cols,
                F.lit("added").alias("change_type"),
                *[
                    F.lit(None).cast(raw.schema[c].dataType).alias(f"old_{c}")
                    for c in compare_cols
                ],
                *[F.col(c).alias(f"new_{c}") for c in compare_cols],
            )
        else:
            df = raw.withColumn("change_type", F.lit("added"))
        return df, make_ack(to_v)

    if key_cols is None or compare_cols is None:
        raise ValueError(
            "non-append commits in the consumed range need key_cols/"
            "compare_cols for row-level diffing"
        )
    from ..operators.upsert import snapshot_changes

    old = (
        snapshot_read(spark, root, last)
        if last
        else snapshot_read(spark, root, versions[0]).limit(0)
    )
    df = snapshot_changes(
        old, snapshot_read(spark, root, to_v), key_cols, compare_cols
    )
    return df, make_ack(to_v)


def pump_snapshot_pipeline(
    spark,
    source_root: str,
    sink_root: str,
    state_path: str,
    transform,
    app_id: str = "pipeline",
    key_cols: list[str] | None = None,
    compare_cols: list[str] | None = None,
):
    """One PULL → TRANSFORM → COMMIT epoch of a snapshot-to-snapshot
    pipeline, exactly-once end to end. Returns the sink version
    committed, or None when the source had nothing new.

    The four-step protocol and why each crash point converges:

    1. pull: ``consume_snapshot_changes`` reads everything committed to
       the source since the last ACKED position (crash here: nothing
       happened; the next pump re-pulls);
    2. PIN: before touching the sink, the intended range upper bound is
       persisted atomically as ``pending`` in the consumer state file
       (the WAL-pins-offsets-before-processing shape of Spark
       Structured Streaming). Without the pin, a crash after the sink
       commit but before the ack, followed by a SOURCE commit, would
       make the replay pull a WIDER range (upto{N+1}), derive a
       different txn_id, and re-append the already-committed rows as
       duplicates. With it, the replay consumes exactly up to the
       pinned version, re-derives the same txn_id, and the commit
       no-ops; the newer source commits wait for the next pump.
    3. transform + commit: the curated batch appends to the sink via
       ``snapshot_write`` with ``txn_id = {app_id}/upto{to_version}`` —
       keyed on the pinned range, so replays dedup (the Delta txnAppId
       shape);
    4. ack: persists the consumer position and clears the pin; a crash
       before it only re-runs 1-3, which 1-3 already tolerate.

    ``transform`` must be DETERMINISTIC over its input batch (a replay
    re-derives the same rows; the txn_id dedups the commit as a whole
    either way, but determinism keeps replays byte-identical).
    The ``change_type`` column the source feed carries is dropped
    before transform — appends feed rows, not CDF records; pass
    ``key_cols``/``compare_cols`` if the source sees overwrite/merge
    commits and the transform wants the CDF shape instead."""
    state = _read_consumer_state(spark, state_path)
    pending = state.get("pending")
    df, ack = consume_snapshot_changes(
        spark, source_root, state_path, key_cols, compare_cols,
        pin_to_version=pending,
    )
    if df is None:
        ack()
        return None
    if pending is None:
        _write_consumer_state(
            spark,
            state_path,
            {"version": int(state.get("version", 0)),
             "pending": ack.to_version},
        )
    if key_cols is None:
        df = df.drop("change_type")
    out = transform(df)
    version = snapshot_write(
        out, sink_root, mode="append",
        txn_id=f"{app_id}/upto{ack.to_version}",
    )
    ack()
    return version


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
