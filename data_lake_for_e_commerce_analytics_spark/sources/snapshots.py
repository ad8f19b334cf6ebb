"""Snapshot-isolated parquet tables via a manifest-swap commit log —
the minimal transactional layer the MERGE/SCD2/compaction family needs
(VERDICT r5 task 4) over the existing parquet layout, shaped after the
published Delta/Iceberg commit protocols (Armbrust et al., VLDB'20
"Delta Lake: High-Performance ACID Table Storage over Cloud Object
Stores"; Iceberg spec) without importing either.

Layout:

    table_root/
      _commits/v0000000001.json   # one manifest per committed version
      data/v0000000001-part*.parquet

A manifest names the EXACT data files of its version. Commit protocol:

1. write the new data files under ``data/`` with version-prefixed names
   (immutable once written; a crashed writer leaks unreferenced files,
   never a visible half-state),
2. stage the manifest JSON beside the log, then atomically RENAME it to
   ``v{n}.json``.

Readers resolve a snapshot by listing ``_commits/`` and pinning ONE
manifest (latest, or an explicit ``version`` for time travel), then
scan exactly its file list — so a reader holds a consistent snapshot
for as long as it keeps the handle: a concurrent commit adds a new
manifest and new files but never mutates referenced ones. Appends and
overwrites are therefore atomic across any number of partitions, and
every prior version stays queryable until `vacuum` retires it.

Concurrency: optimistic, single-winner-per-version. On local
filesystems the publish is a genuine CAS (write-temp + hard-link:
atomic content AND exclusive creation — see ``_publish_manifest``);
on HDFS the rename fallback is equally single-winner
(rename-to-existing fails); object stores implement the pluggable
``ManifestPublisher`` CAS with the store's conditional PUT — a mock
conditional-PUT impl ships here and the race tests run against both
primitives, so the protocol is proven independent of which one backs
it.

LIVE-WRITER CONFLICT PROTOCOL (the Delta/Iceberg optimistic-
concurrency shape): a loser of the CAS detects ``CommitConflict``
and RETRIES ON THE NEW BASE — its data files are already on disk and
immutable, so a retry is a manifest-only re-derivation. Which retries
are safe is a semantic question, resolved per conflict class:

- append ∥ append: always safe — the loser re-reads the winner's
  manifest, carries the new parent's file list forward plus its own
  files, and republishes at the next version. Both commits land;
  history stays linear. (``snapshot_write`` retries this itself.)
- append ∥ overwrite: the loser's append re-checks schema drift
  against the NEW parent and rebases onto the overwritten table —
  its rows append to the winner's world, matching Delta
  WriteSerializable.
- plain overwrite ∥ anything: safe to retry — an overwrite replaces
  the table regardless of parent (last writer wins, documented).
- merge ∥ merge, DISJOINT keys: safe — the loser recomputes the merge
  against the winner's result and republishes. Handled by
  ``snapshot_merge``'s rebase loop.
- merge ∥ merge, OVERLAPPING keys: REJECTED with
  ``SnapshotConflictError`` — the loser's merged frame was computed
  against a base that no longer reflects those keys, and a blind
  rebase could silently reorder updates the caller believed
  serialized. The caller must re-read and re-issue (Delta's
  ConcurrentAppend/ConcurrentDeleteRead analog).
- copy-on-write merge (``_carry_files``) losing the CAS never
  self-retries inside ``snapshot_write``: its carried-file list was
  chosen against the stale base. ``snapshot_merge`` catches the
  conflict and redoes file selection from scratch on the new base.

Scale: manifests hold file paths, not row data — O(files) driver-side
JSON. At 100 TB the file list per version is ~10^5 entries; the data
path never moves through Python.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from .fs import _fs_and_path, delete_path, list_files, mkdirs, path_exists, rename

COMMITS = "_commits"
DATA = "data"


class CommitConflict(IOError):
    """A concurrent writer won the CAS for the version this commit
    targeted. Data files are already published (immutable, invisible
    until referenced); callers retry the MANIFEST derivation on the new
    base when their conflict class allows it (see module docstring)."""


class SnapshotConflictError(RuntimeError):
    """The conflict is semantic, not mechanical: retrying on the new
    base could silently lose or reorder a concurrent commit's effects
    (e.g. two merges touching the same keys). The caller must re-read
    the table and re-issue the operation."""


def _commit_dir(root: str) -> str:
    return root.rstrip("/") + "/" + COMMITS


def _data_dir(root: str) -> str:
    return root.rstrip("/") + "/" + DATA


def _manifest_path(root: str, version: int) -> str:
    return _commit_dir(root) + f"/v{version:010d}.json"


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, jpath = _fs_and_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    fs, jpath = _fs_and_path(spark, path)
    stream = fs.open(jpath)
    try:
        # read fully via the JVM-side utility (manifests are small)
        jvm = spark._jvm
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def snapshot_versions(spark: SparkSession, root: str) -> list[int]:
    """Committed versions, ascending. [] for a not-yet-created table."""
    out = []
    for f in list_files(spark, _commit_dir(root), suffix=".json"):
        name = f.rsplit("/", 1)[-1]
        if name.startswith("v"):
            out.append(int(name[1:-5]))
    return sorted(out)


def read_manifest(spark: SparkSession, root: str, version: int) -> dict:
    return json.loads(_read_text(spark, _manifest_path(root, version)))


def snapshot_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Scan one pinned snapshot (latest by default; any committed
    ``version`` for time travel). The returned DataFrame reads exactly
    the manifest's file list — concurrent commits cannot change what it
    sees."""
    versions = snapshot_versions(spark, root)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not committed at {root}")
    m = read_manifest(spark, root, v)
    return _read_manifest_files(spark, root, m, m["files"])


def _read_manifest_files(
    spark: SparkSession, root: str, m: dict, names: list[str]
) -> DataFrame:
    """Read a subset of a manifest's files under ITS schema contract —
    shared by snapshot_read, the CoW merge's touched-file read, and
    snapshot_scan, so every reader honors the mixed_schema flag (a
    plain spark.read over mixed pre/post-evolution files would infer
    from one random file and nondeterministically drop the evolved
    columns)."""
    from pyspark.sql.types import StructType

    want = StructType.fromJson(json.loads(m["schema"]))
    files = [_data_dir(root) + "/" + f for f in names]
    if not files:
        return spark.createDataFrame([], want)
    if m.get("mixed_schema"):
        # per-file schema union null-fills the added columns for
        # pre-evolution files; then pin set/order to the manifest
        df = spark.read.option("mergeSchema", "true").parquet(*files)
        return df.select(*[f.name for f in want.fields])
    return spark.read.parquet(*files)


def committed_txn_ids(spark: SparkSession, root: str) -> set[str]:
    """txn_ids recorded by retained manifests (vacuum shrinks this with
    the history it retires — size retention to the replay horizon, the
    same contract Delta's txnAppId/txnVersion makes)."""
    out = set()
    for v in snapshot_versions(spark, root):
        t = read_manifest(spark, root, v).get("txn_id")
        if t is not None:
            out.add(t)
    return out


def _check_append_schema(
    spark: SparkSession, root: str, base_version: int, df: DataFrame,
    merge_schema: bool,
) -> bool:
    """Append drift gate against a specific base version. Returns True
    when the append ADDS columns under merge_schema (schema evolution);
    raises on drops/retypes or un-opted-in adds. Re-run on every commit
    retry: the conflicting winner may have changed the table schema."""
    from pyspark.sql.types import StructType

    prev = StructType.fromJson(
        json.loads(read_manifest(spark, root, base_version)["schema"])
    )
    prev_fields = {f.name: f.dataType for f in prev.fields}
    cur_fields = {f.name: f.dataType for f in df.schema.fields}
    retyped = [
        n for n, t in cur_fields.items()
        if n in prev_fields and prev_fields[n] != t
    ]
    dropped = [n for n in prev_fields if n not in cur_fields]
    added = [n for n in cur_fields if n not in prev_fields]
    if retyped or dropped or (added and not merge_schema):
        raise ValueError(
            f"append schema drift at {root}: added={added} "
            f"dropped={dropped} retyped={retyped} — pass "
            "merge_schema=True for add-column evolution; drops/"
            "retypes need an explicit overwrite"
        )
    return bool(added)


def snapshot_write(
    df: DataFrame,
    root: str,
    mode: str = "overwrite",
    txn_id: str | None = None,
    merge_schema: bool = False,
    max_commit_retries: int = 5,
    _carry_files: list[str] | None = None,
    _operation: str | None = None,
) -> int:
    """Commit ``df`` as the table's next version and return it.

    ``overwrite`` publishes a manifest naming only the new files;
    ``append`` carries the parent manifest's files forward plus the new
    ones. Either way the commit is ONE manifest publish — atomic across
    every partition the write touched, which the dynamic-partition
    rewrite in plain parquet could never give — and prior versions stay
    readable (time travel) until vacuumed.

    ``txn_id`` makes the commit IDEMPOTENT: if any retained manifest
    already records it, the write is a no-op returning that version —
    the primitive an at-least-once stream sink needs for exactly-once
    appends (see ``streaming/snapshot_stream.py``).

    Appends REFUSE schema drift by default (a silently narrower or
    retyped frame corrupting a table is the classic lake accident);
    ``merge_schema=True`` opts into ADD-COLUMN evolution: the manifest
    records the union schema and reads null-fill the new columns for
    pre-evolution files (Delta mergeSchema semantics). Type changes and
    column drops still refuse.

    ``_carry_files`` (internal, used by the copy-on-write MERGE):
    specific parent files to carry into the new version unchanged, in
    addition to the files this ``df`` writes.

    On losing the publish CAS to a live concurrent writer, plain
    appends and overwrites transparently RE-DERIVE the manifest on the
    winner's base and retry (up to ``max_commit_retries`` — the data
    files are already on disk, so a retry is metadata-only). A
    copy-on-write commit (``_carry_files``) instead raises
    ``CommitConflict``: its carried-file selection is stale; the
    caller (``snapshot_merge``) redoes selection on the new base.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    spark = df.sparkSession
    versions = snapshot_versions(spark, root)
    pre_evolved = False
    if mode == "append" and versions:
        pre_evolved = _check_append_schema(
            spark, root, versions[-1], df, merge_schema
        )
    if txn_id is not None:
        for v in versions:
            if read_manifest(spark, root, v).get("txn_id") == txn_id:
                return v
    version = (versions[-1] + 1) if versions else 1
    mkdirs(spark, _data_dir(root))

    # 1. immutable data files under version-prefixed names (the prefix
    # is the FIRST-ATTEMPT version — purely cosmetic; the manifest's
    # explicit file list is the source of truth, so a commit retried at
    # a later version keeps its file names)
    salt = uuid.uuid4().hex[:8]
    staging = _data_dir(root) + f"/.stage-v{version:010d}-{salt}"
    df.write.mode("overwrite").parquet(staging)
    new_files = []
    for i, staged in enumerate(list_files(spark, staging, suffix=".parquet")):
        name = f"v{version:010d}-{salt}-part{i:05d}.parquet"
        if not rename(spark, staged, _data_dir(root) + "/" + name):
            raise IOError(f"data publish failed: {staged}")
        new_files.append(name)
    delete_path(spark, staging)

    # per-file footer stats for manifest-level data skipping
    # (snapshot_scan). Stats are best-effort: a file without them is
    # always kept by pruning. Computed once — retries reuse them.
    new_stats = _collect_file_stats(spark, _data_dir(root), new_files)
    mkdirs(spark, _commit_dir(root))

    # 2. atomic manifest publish, rebased-and-retried on conflict
    attempt = 0
    while True:
        parent = versions[-1] if versions else None
        # attempt 0's parent is the same version the pre-write check
        # already validated — reuse its verdict; only a conflict-driven
        # version refresh warrants re-reading the parent manifest
        evolved = (
            (
                pre_evolved
                if attempt == 0
                else _check_append_schema(
                    spark, root, parent, df, merge_schema
                )
            )
            if mode == "append" and parent is not None
            else False
        )
        if txn_id is not None and attempt > 0:
            # the conflicting winner might have been our own replay
            for v in versions:
                if read_manifest(spark, root, v).get("txn_id") == txn_id:
                    return v
        version = (parent + 1) if parent is not None else 1
        files = list(new_files)
        stats: dict = {}
        pm = read_manifest(spark, root, parent) if parent is not None else {}
        # once a version mixes pre- and post-evolution files, reads need
        # per-file schema merging until an overwrite homogenizes the layout
        mixed = evolved or (
            bool(pm.get("mixed_schema"))
            and (mode == "append" or bool(_carry_files))
        )
        if mode == "append" and parent is not None:
            files = pm["files"] + files
            stats.update(pm.get("stats", {}))
        elif _carry_files:
            files = list(_carry_files) + files
            stats.update(
                {
                    f: s
                    for f, s in pm.get("stats", {}).items()
                    if f in set(_carry_files)
                }
            )
        stats.update(new_stats)
        manifest = {
            "version": version,
            "parent": parent,
            "operation": _operation or mode,
            "files": files,
            "schema": df.schema.json(),
            "txn_id": txn_id,
            "stats": stats,
            "mixed_schema": mixed,
        }
        try:
            _publish_manifest(spark, root, version, manifest, salt)
            return version
        except CommitConflict:
            attempt += 1
            if _carry_files or attempt > max_commit_retries:
                # CoW merges never self-retry (stale file selection —
                # snapshot_merge rebases); exhausted retries propagate
                raise
            versions = snapshot_versions(spark, root)


class ManifestPublisher:
    """The commit-point CAS as a pluggable primitive (VERDICT r7 task
    7): ``publish_if_absent`` must atomically (a) fail with
    ``CommitConflict`` when the target already exists — exactly one
    winner per version under any interleaving — and (b) expose only
    COMPLETE content — a reader may never observe a truncated manifest.
    Everything else in the snapshot protocol (rebase-retry, conflict
    classes, exactly-once txn_ids) is built on these two guarantees, so
    swapping the primitive swaps the storage backend: POSIX link(2)
    locally, rename-no-overwrite on HDFS, conditional PUT
    (If-None-Match: *) on object stores."""

    def publish_if_absent(
        self, local_path: str, body: bytes, salt: str, version: int
    ) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class HardLinkPublisher(ManifestPublisher):
    """Classic POSIX CAS-with-content: fully write a hidden temp, then
    hard-LINK it to the manifest name — link(2) is atomic AND fails
    with EEXIST, so readers can never see a truncated manifest and two
    racing writers get exactly one winner."""

    def publish_if_absent(
        self, local_path: str, body: bytes, salt: str, version: int
    ) -> None:
        import os

        tmp_local = os.path.join(
            os.path.dirname(local_path),
            f".tmp-{salt}-v{version:010d}.json",
        )
        with open(tmp_local, "wb") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp_local, local_path)
        except FileExistsError:
            raise CommitConflict(
                f"version {version} already committed (concurrent writer)"
            )
        finally:
            os.unlink(tmp_local)


class ConditionalPutPublisher(ManifestPublisher):
    """Mock of an object-store CONDITIONAL PUT (S3 PutObject with
    If-None-Match: *, GCS x-goog-if-generation-match: 0, Azure
    If-None-Match: *): the service makes existence-check + create one
    atomic server-side operation, and the object becomes visible
    all-or-nothing. The mock stands in the service-side atomicity with
    a process-wide mutex (check + publish under one lock) and the
    all-or-nothing visibility with a temp-write + rename. A real
    deployment implements this class with the store SDK's conditional
    write; the protocol above it is identical — which is what the
    shared conflict tests pin."""

    def __init__(self) -> None:
        import threading

        self._lock = threading.Lock()

    def publish_if_absent(
        self, local_path: str, body: bytes, salt: str, version: int
    ) -> None:
        import os

        tmp_local = os.path.join(
            os.path.dirname(local_path),
            f".tmp-{salt}-v{version:010d}.json",
        )
        with self._lock:  # service-side atomicity stand-in
            if os.path.exists(local_path):
                raise CommitConflict(
                    f"version {version} already committed "
                    "(concurrent writer)"
                )
            with open(tmp_local, "wb") as f:
                f.write(body)
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp_local, local_path)


#: The publisher used for LOCAL (file:) roots. Tests swap in
#: ConditionalPutPublisher to prove the protocol holds over the
#: object-store primitive too.
_LOCAL_PUBLISHER: ManifestPublisher = HardLinkPublisher()


def _publish_manifest(
    spark: SparkSession, root: str, version: int, manifest: dict, salt: str
) -> None:
    """Single-winner-per-version commit point. On a LOCAL filesystem
    this delegates to the pluggable ``ManifestPublisher`` CAS (default:
    write-temp + hard-link). On other filesystems it falls back to
    exists-check + rename — atomic on HDFS (rename-to-existing fails
    there), best-effort on object stores without a conditional-PUT
    binding (the protocol slot for one is ``ManifestPublisher``)."""
    target = _manifest_path(root, version)
    body = json.dumps(manifest, indent=1)
    # resolve the ACTUAL filesystem: a scheme-less absolute path on a
    # cluster whose fs.defaultFS is HDFS must take the Hadoop branch,
    # not be mistaken for driver-local POSIX
    fs, jpath = _fs_and_path(spark, target)
    scheme = fs.getUri().getScheme()
    if scheme == "file":
        local = jpath.toUri().getPath()
        _LOCAL_PUBLISHER.publish_if_absent(
            local, body.encode("utf-8"), salt, version
        )
        return
    if path_exists(spark, target):
        raise CommitConflict(
            f"version {version} already committed (concurrent writer)"
        )
    tmp = _commit_dir(root) + f"/.tmp-{salt}-v{version:010d}.json"
    _write_text(spark, tmp, body)
    if not rename(spark, tmp, target):
        delete_path(spark, tmp, recursive=False)
        raise IOError(f"manifest publish failed for version {version}")


def snapshot_merge(
    delta: DataFrame,
    root: str,
    key_cols: list[str],
    version_col: str,
    prune_col: str | None = None,
    max_prune_keys: int = 2_000_000,
    max_commit_retries: int = 3,
) -> int:
    """Snapshot-isolated MERGE: merge ``delta`` into the latest
    snapshot (same keep-newest semantics as `operators/upsert
    .merge_keep_latest`) and commit the result as a new version. A
    concurrent reader sees the pre-merge or post-merge table, never a
    half-rewritten one, and the pre-merge version stays addressable —
    the two properties the plain-parquet merge path documents as
    missing.

    Concurrency (module docstring, conflict classes): on losing the
    commit CAS to a live writer, the merge inspects what changed
    between its base and the winner's result. If any of the DELTA'S
    KEYS were touched by the interleaved commits, it raises
    ``SnapshotConflictError`` — a blind rebase could silently reorder
    updates. Otherwise it REBASES: recomputes file selection and the
    merged frame against the new latest version and retries (up to
    ``max_commit_retries``).

    ``prune_col`` turns the merge into file-level COPY-ON-WRITE (the
    Delta MERGE shape): the delta's distinct values of that key column
    are tested against each base file's footer min/max — files that
    provably hold no delta key are CARRIED into the new version
    unchanged (a manifest entry, zero I/O), and only the overlapping
    files rewrite. A 1% delta then rewrites ~1% of files instead of
    the table. Requires the key-uniqueness the merge itself maintains
    (a key duplicated across carried and rewritten files would escape
    dedup — appends that might violate this must merge without
    pruning). Falls back to the full rewrite when the delta's key set
    exceeds ``max_prune_keys`` or stats are missing."""
    from ..operators.upsert import merge_keep_latest

    spark = delta.sparkSession
    attempt = 0
    while True:
        versions = snapshot_versions(spark, root)
        base_v = versions[-1] if versions else None
        try:
            if not versions:
                return snapshot_write(
                    merge_keep_latest(
                        delta.limit(0), delta, key_cols, version_col
                    ),
                    root,
                    mode="overwrite",
                    max_commit_retries=0,
                    _operation="merge",
                )

            m = read_manifest(spark, root, base_v)
            carry: list[str] = []
            touched = m["files"]
            if prune_col is not None:
                raw = [
                    r[0]
                    for r in delta.select(prune_col)
                    .distinct()
                    .limit(max_prune_keys + 1)
                    .collect()
                ]
                # NULL keys can't be range-tested: parquet footer
                # min/max exclude nulls, so a null-keyed delta row can
                # never be proven to overlap any file — and
                # sorted()/bisect would TypeError on None anyway. Any
                # null key forces the full rewrite (a carried file
                # could hold null-keyed rows that would escape dedup).
                keys = [k for k in raw if k is not None]
                has_null_key = len(keys) < len(raw)
                stats = m.get("stats", {})
                if (
                    not has_null_key
                    and keys
                    and len(keys) <= max_prune_keys
                    and all(
                        stats.get(f, {}).get("cols", {}).get(prune_col)
                        for f in m["files"]
                    )
                ):
                    skeys = sorted(keys)
                    import bisect

                    def overlaps(f: str) -> bool:
                        lo, hi = stats[f]["cols"][prune_col]
                        i = bisect.bisect_left(skeys, lo)
                        return i < len(skeys) and skeys[i] <= hi

                    touched = [f for f in m["files"] if overlaps(f)]
                    carry = [f for f in m["files"] if not overlaps(f)]

            base = _read_manifest_files(spark, root, m, touched)
            merged = merge_keep_latest(base, delta, key_cols, version_col)
            # max_commit_retries=0: snapshot_write must NEVER blindly
            # republish a merge result on a new base — even the
            # no-carry shape was COMPUTED against base_v; rebasing is
            # this loop's job, after the key-overlap safety check.
            return snapshot_write(
                merged,
                root,
                mode="overwrite",
                max_commit_retries=0,
                _carry_files=carry,
                _operation="merge",
            )
        except CommitConflict:
            attempt += 1
            if attempt > max_commit_retries:
                raise
            _raise_if_merge_conflict(spark, root, base_v, delta, key_cols)


def _raise_if_merge_conflict(
    spark: SparkSession,
    root: str,
    base_version: int | None,
    delta: DataFrame,
    key_cols: list[str],
) -> None:
    """After losing the commit CAS, decide whether the merge may rebase:
    compute the keys whose row set changed between the merge's base and
    the current latest version (the interleaved winners' effects) and
    reject if any of them is also a delta key. Full-row exceptAll both
    ways — catches updates, inserts, AND deletes of a key.

    Schema gate first: if an interleaved commit EVOLVED the table
    schema (merge_schema add-column append), base and latest have
    different column sets and exceptAll/union would die with an opaque
    AnalysisException instead of the documented conflict contract. An
    evolved interleave cannot be safely rebased by merge_keep_latest
    anyway (the merge's frame lacks the new column), so it is a
    semantic conflict by definition — raise SnapshotConflictError
    directly and let the caller re-read and re-issue."""
    from pyspark.sql.types import StructType

    latest = snapshot_versions(spark, root)[-1]
    if base_version is not None:
        # structural compare (name -> type), NOT the raw JSON: an
        # interleaved merge legitimately flips nullability without
        # changing the column set, and that must still rebase
        def fields(v: int) -> dict:
            s = StructType.fromJson(
                json.loads(read_manifest(spark, root, v)["schema"])
            )
            return {f.name: f.dataType for f in s.fields}

        if fields(base_version) != fields(latest):
            raise SnapshotConflictError(
                f"concurrent commit(s) v{base_version}->v{latest} at "
                f"{root} changed the table schema — a rebase cannot "
                "preserve the evolved columns; re-read the table and "
                "re-issue the merge against the new schema"
            )
    new = snapshot_read(spark, root, latest)
    old = (
        snapshot_read(spark, root, base_version).select(*new.columns)
        if base_version is not None
        else new.limit(0)
    )
    changed_keys = (
        new.exceptAll(old)
        .select(*key_cols)
        .union(old.exceptAll(new).select(*key_cols))
        .distinct()
    )
    dkeys = delta.select(*key_cols).distinct()
    n = changed_keys.join(dkeys, key_cols, "inner").count()
    if n:
        raise SnapshotConflictError(
            f"concurrent commit(s) v{base_version}->v{latest} at {root} "
            f"touched {n} of this merge's keys — rebase would reorder "
            "updates; re-read the table and re-issue the merge"
        )


def _collect_file_stats(
    spark: SparkSession,
    data_dir: str,
    names: list[str],
    distribute_over: int = 64,
) -> dict:
    """Footer stats for a commit's new files. Small commits read the
    footers on the driver; past ``distribute_over`` files the reads fan
    out over the cluster (one task per footer chunk) so a 10^5-file
    commit costs seconds of parallel metadata I/O, not minutes of
    driver loop — executors only need the same filesystem visibility
    the scan itself needs. Per-file failures degrade to 'no stats'
    (kept by pruning), never to a failed commit."""

    def safe(name: str):
        try:
            return name, _file_column_stats(data_dir + "/" + name)
        except Exception:
            return name, None

    if len(names) <= distribute_over:
        pairs = [safe(n) for n in names]
    else:
        # The per-file try/except above runs INSIDE the task; a job-level
        # failure (executors can't import this package or pyarrow, task
        # deserialization error) would escape it and fail the commit.
        # Stats are best-effort by contract, so degrade to the driver
        # loop — slower, but 'never a failed commit' holds.
        try:
            sc = spark.sparkContext
            pairs = (
                sc.parallelize(names, max(1, len(names) // 32))
                .map(safe)
                .collect()
            )
        except Exception:
            pairs = [safe(n) for n in names]
    return {n: s for n, s in pairs if s is not None}


def _file_column_stats(uri: str) -> dict:
    """Per-file parquet footer statistics: row count plus min/max per
    primitive column (aggregated across row groups). Driver-side pyarrow
    footer read — O(footer), no data pages. Values are stored
    JSON-native (int/float/str/bool); other types (timestamps,
    decimals) are skipped — pruning simply keeps files it has no stats
    for, so skipped types cost coverage, never correctness."""
    import pyarrow.parquet as pq

    path = uri[5:] if uri.startswith("file:") else uri
    md = pq.ParquetFile(path).metadata
    cols: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            st = c.statistics
            if st is None or not st.has_min_max:
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                except UnicodeDecodeError:
                    continue
            if not isinstance(lo, (int, float, str, bool)):
                continue
            name = c.path_in_schema
            if name in cols:
                cols[name][0] = min(cols[name][0], lo)
                cols[name][1] = max(cols[name][1], hi)
            else:
                cols[name] = [lo, hi]
    return {"rows": md.num_rows, "cols": cols}


def snapshot_scan(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    prune: dict[str, tuple] | None = None,
):
    """Stats-pruned snapshot scan (Iceberg-style manifest file
    skipping): ``prune`` maps column -> (lo, hi) inclusive bounds; any
    data file whose footer min/max provably misses the range is dropped
    from the scan BEFORE Spark ever opens it — at 100 TB this is the
    difference between listing 10^5 files and scanning the 10^2 whose
    ranges overlap, on top of (not instead of) the row-group pruning
    the parquet reader does once a file is open. Files without stats
    for a pruned column are kept (skipping is an optimization, never a
    filter — compose with a real .filter for semantics).

    Returns (DataFrame, kept_files, total_files)."""
    versions = snapshot_versions(spark, root)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    v = versions[-1] if version is None else version
    m = read_manifest(spark, root, v)
    stats = m.get("stats", {})
    kept = []
    for f in m["files"]:
        ok = True
        for col, (lo, hi) in (prune or {}).items():
            cs = stats.get(f, {}).get("cols", {}).get(col)
            if cs is None:
                continue
            fmin, fmax = cs
            if fmax < lo or fmin > hi:
                ok = False
                break
        if ok:
            kept.append(f)
    df = _read_manifest_files(spark, root, m, kept)
    return df, len(kept), len(m["files"])


def compact_snapshot(
    spark: SparkSession, root: str, target_rows_per_file: int = 1_000_000
) -> int:
    """OPTIMIZE inside the snapshot protocol: rewrite the latest
    version's data into ceil(rows/target) evenly-sized files and commit
    the layout as a NEW version — readers of the old version are
    untouched (its files are immutable), and a crash mid-compaction
    publishes nothing. Contrast `sources/maintenance.compact_parquet`,
    which must swap the live directory in place. Returns the new
    version number."""
    import math

    df = snapshot_read(spark, root)
    n_files = max(1, math.ceil(df.count() / target_rows_per_file))
    return snapshot_write(df.repartition(n_files), root, mode="overwrite")


def snapshot_version_diff(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Time-travel CDC audit: what changed between two committed
    versions of the same table — `operators/upsert.snapshot_diff`'s
    added/removed/changed/unchanged census, addressed by version number
    instead of by two physical paths. The audit a lake runs after every
    merge commit, for free once versions are retained."""
    from ..operators.upsert import snapshot_diff

    return snapshot_diff(
        snapshot_read(spark, root, v_old),
        snapshot_read(spark, root, v_new),
        key_cols,
        compare_cols,
    )


def snapshot_row_changes(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level change feed between two committed versions (the Delta
    CDF read shape) — `operators/upsert.snapshot_changes` addressed by
    version number. With versions retained, every consumer can replay
    any commit range without the writer having logged changes
    explicitly."""
    from ..operators.upsert import snapshot_changes

    return snapshot_changes(
        snapshot_read(spark, root, v_old),
        snapshot_read(spark, root, v_new),
        key_cols,
        compare_cols,
    )


def vacuum(
    spark: SparkSession,
    root: str,
    keep_last: int = 2,
    min_age_seconds: float = 3600.0,
) -> list[str]:
    """Retire history: drop all but the last ``keep_last`` manifests and
    delete data files no surviving manifest references. Returns the
    deleted file names. Time travel contracts shrink accordingly —
    exactly Delta/Iceberg ``VACUUM`` semantics.

    ``min_age_seconds`` is the in-flight-writer guard (Delta's retention
    window): a committer renames its data files into ``data/`` BEFORE
    its manifest publishes, so an unreferenced-but-young file may belong
    to a commit that is about to appear — deleting it would leave that
    committed version pointing at nothing. Only files older than the
    window (by FS modification time) are eligible; size it well above
    the longest plausible commit duration."""
    import time

    versions = snapshot_versions(spark, root)
    keep = versions[-keep_last:] if keep_last > 0 else []
    referenced: set[str] = set()
    for v in keep:
        referenced.update(read_manifest(spark, root, v)["files"])
    now_ms = time.time() * 1000.0
    deleted = []
    for f in list_files(spark, _data_dir(root), suffix=".parquet"):
        name = f.rsplit("/", 1)[-1]
        if name in referenced:
            continue
        fs, jpath = _fs_and_path(spark, f)
        age_s = (now_ms - fs.getFileStatus(jpath).getModificationTime()) / 1000.0
        if age_s < min_age_seconds:
            continue  # possible in-flight commit; next vacuum gets it
        delete_path(spark, f, recursive=False)
        deleted.append(name)
    for v in versions:
        if v not in keep:
            delete_path(spark, _manifest_path(root, v), recursive=False)
    return deleted
