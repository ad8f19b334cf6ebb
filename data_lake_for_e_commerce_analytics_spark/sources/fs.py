"""Driver-side filesystem coordination via the Hadoop FileSystem API.

Every lake-maintenance operator that probes or swaps table directories
(SCD2 history bootstrap, crawl-index reads, epoch-idempotent appends,
snapshot commits) needs three primitives that plain ``spark.read`` +
``except Exception`` cannot give safely:

- **existence** that distinguishes "table not created yet" from a
  transient read failure (permissions, corrupt footer, FS hiccup) — a
  bare ``except Exception`` around ``spark.read.parquet`` treats an
  outage as "no history" and then *overwrites* persisted state;
- **atomic rename**, the only commit primitive HDFS/local FS guarantee
  (object stores emulate it; a transactional format is the real answer
  there — see ``sources/snapshots.py`` for the manifest-swap protocol
  built on this);
- **prefix-scoped delete/list** for idempotent per-epoch file naming.

All calls run on the DRIVER against FS metadata only — no data moves
through Python. Uses the JVM gateway (classic PySpark); under Spark
Connect these would be a tiny server-side helper instead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on its filesystem. Unlike a try/except
    around ``spark.read``, a *failure* here (FS down, no permission)
    raises — callers must never mistake an outage for an empty table."""
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def parquet_table_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists AND holds at least one parquet data
    file (recursive, so partitioned layouts count). The distinction
    from `path_exists` matters for bootstrap branches: a writer that
    crashed mid-first-write leaves a directory with only _temporary/
    debris — plain existence would route every retry into the
    read-existing branch, which then fails UNABLE_TO_INFER_SCHEMA
    forever (a wedged pipeline), while "no data files yet" correctly
    re-takes the initial-build path. Transient FS failures still raise
    (never swallowed into 'does not exist')."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return False
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            return True
    return False


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, jpath = _fs_and_path(spark, path)
    fs.mkdirs(jpath)


def delete_path(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Delete ``path`` if present; False when it did not exist."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic rename (same-FS). The HDFS/local-FS commit primitive: a
    reader sees the old name or the new name, never a half state."""
    fs, jsrc = _fs_and_path(spark, src)
    _, jdst = _fs_and_path(spark, dst)
    return bool(fs.rename(jsrc, jdst))

def list_files(spark: SparkSession, path: str, suffix: str = "") -> list[str]:
    """Non-recursive file listing (full URIs), name-sorted."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        if st.isFile() and st.getPath().getName().endswith(suffix):
            out.append(st.getPath().toString())
    return sorted(out)


def compact_epoch_files(
    spark: SparkSession,
    root: str,
    keep_epochs_from: int,
    prefix: str = "epoch",
    target_rows_per_file: int = 5_000_000,
) -> int:
    """Small-file compaction that PRESERVES the epoch-idempotency
    contract: epochs >= ``keep_epochs_from`` (the stream's replay
    horizon — anything the checkpoint could still re-deliver) keep
    their deterministic per-epoch names untouched; everything older is
    merged into ``compacted-*`` files and the originals removed. A
    replayed old epoch would be a checkpoint-contract violation anyway;
    a replayed RECENT epoch still finds and rewrites its own files.

    Crash-safe by GENERATIONS: each compaction writes a fresh
    ``compacted-{gen}-*`` generation (monotonic id) and only AFTER the
    write completes deletes its inputs (old epoch files + prior
    generations). A crash anywhere leaves the old files, the new files,
    or BOTH — never less: inputs are not touched until the replacement
    is fully on disk (write-then-delete; the earlier delete-then-rename
    shape could lose previously-compacted rows when a retry rebuilt
    from a listing that no longer saw them). The both-state means
    duplicate rows until a retry finishes the deletes: exactly right
    for set-semantics state (the seen-URL digest index this exists for,
    where readers probe membership); row-count-sensitive data should
    compact through the snapshot protocol instead
    (sources/snapshots.compact_snapshot, whose manifest swap has no
    both-state). Returns the number of compacted data files written."""
    old_files = []
    max_gen = 0
    for f in list_files(spark, root, suffix=".parquet"):
        name = f.rsplit("/", 1)[-1]
        if name.startswith("compacted-"):
            old_files.append(f)
            try:
                max_gen = max(max_gen, int(name[len("compacted-"):].split("-", 1)[0]))
            except ValueError:
                pass
        elif name.startswith(prefix):
            try:
                eid = int(name[len(prefix):].split("-", 1)[0])
            except ValueError:
                continue
            if eid < keep_epochs_from:
                old_files.append(f)
    if not old_files:
        return 0
    import math

    df = spark.read.parquet(*old_files)
    n = max(1, math.ceil(df.count() / target_rows_per_file))
    merged = df.repartition(n)
    written = write_epoch_files(merged, root, max_gen + 1, prefix="compacted-")
    # inputs deleted only now, after the new generation is fully live
    for f in old_files:
        delete_path(spark, f, recursive=False)
    return written


def epoch_file_prefix(batch_id: int, prefix: str = "epoch") -> str:
    """The deterministic file-name prefix all of epoch ``batch_id``'s
    committed files share (shared by the writer and by readers that must
    exclude a replaying epoch's own earlier attempt)."""
    return f"{prefix}{batch_id:010d}-"


def sniff_local_parquet_columns(paths) -> set[str] | None:
    """Column-name union of the parquet files under local ``paths`` via
    DRIVER-SIDE footer reads (pyarrow) — lets readers of writer-
    controlled layouts pass an explicit schema to ``spark.read.schema``
    instead of paying a schema-inference Spark job per read (~0.15 s
    each; the index lifecycle gates issue dozens). Returns None when a
    path is non-local, no footer exists, or the files DISAGREE on
    columns (mixed legacy layout) — callers must then fall back to
    Spark's own inference so legacy-shim semantics stay untouched."""
    import glob as _glob
    import os

    import pyarrow.parquet as _pq

    cols: set[str] | None = None
    for p in paths:
        if not os.path.exists(p):
            return None
        if os.path.isdir(p):
            files = sorted(
                f
                for f in _glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
                if not os.path.basename(f).startswith(".")
            )
        else:
            files = [p]
        if not files:
            return None
        for f in files:
            try:
                names = set(_pq.read_schema(f).names)
            except Exception:
                return None
            if cols is None:
                cols = names
            elif names != cols:
                return None  # mixed layouts: let Spark decide
    return cols


def spark_schema_of_local_parquet(paths, partition_cols: str = ""):
    """Exact Spark schema of the parquet files under local ``paths``,
    derived DRIVER-SIDE from one footer read (pyarrow) — None when the
    files are non-local/missing/mixed (callers fall back to Spark's own
    inference job). ``partition_cols`` appends directory-partition
    columns ("name type, ...") the footer cannot see."""
    import glob as _glob
    import os

    import pyarrow.parquet as _pq

    first_schema = None
    for p in paths:
        if not os.path.exists(p):
            return None
        files = (
            sorted(
                f
                for f in _glob.glob(
                    os.path.join(p, "**", "*.parquet"), recursive=True
                )
                if not os.path.basename(f).startswith(".")
            )
            if os.path.isdir(p)
            else [p]
        )
        if not files:
            return None
        for f in files:
            try:
                s = _pq.read_schema(f)
            except Exception:
                return None
            if first_schema is None:
                first_schema = s
            elif not s.equals(first_schema):
                return None
    if first_schema is None:
        return None
    try:
        from pyspark.sql.pandas.types import from_arrow_schema

        struct = from_arrow_schema(first_schema)
    except Exception:
        return None
    if partition_cols:
        from pyspark.sql.types import _parse_datatype_string

        for f in _parse_datatype_string(partition_cols).fields:
            if f.name not in struct.fieldNames():
                struct = struct.add(f)
    return struct


def sniff_local_parquet_fields(paths) -> dict[str, str] | None:
    """{column name: Spark ``simpleString`` type} of the parquet files
    under local ``paths`` via driver-side footer reads — the TYPE-aware
    companion of `sniff_local_parquet_columns` (r15, ADVICE r14: a
    name-only sniff let a layout whose stored types drifted — double
    embeddings where the reader pins float, long labels where it pins
    int — pass the gate and then fail or silently narrow at read time).
    None when any path is non-local/missing/empty, a footer is
    unreadable, or the files disagree on (name, type) — callers fall
    back to Spark's own inference. Nullability is deliberately ignored
    (``simpleString`` carries none): an explicit schema only mis-reads
    when the physical TYPE differs."""
    struct = spark_schema_of_local_parquet(paths)
    if struct is None:
        # files may agree on (name, type) but differ in field order or
        # nullability, which spark_schema_of_local_parquet treats as
        # mixed; re-derive the loose comparison here
        import glob as _glob
        import os

        import pyarrow.parquet as _pq

        fields: dict[str, str] | None = None
        try:
            from pyspark.sql.pandas.types import from_arrow_schema
        except Exception:
            return None
        for p in paths:
            if not os.path.exists(p):
                return None
            files = (
                sorted(
                    f
                    for f in _glob.glob(
                        os.path.join(p, "**", "*.parquet"), recursive=True
                    )
                    if not os.path.basename(f).startswith(".")
                )
                if os.path.isdir(p)
                else [p]
            )
            if not files:
                return None
            for f in files:
                try:
                    s = from_arrow_schema(_pq.read_schema(f))
                except Exception:
                    return None
                got = {fl.name: fl.dataType.simpleString() for fl in s.fields}
                if fields is None:
                    fields = got
                elif got != fields:
                    return None
        return fields
    return {f.name: f.dataType.simpleString() for f in struct.fields}


def write_local_epoch_table(
    table, root: str, batch_id: int, prefix: str = "epoch"
) -> str:
    """`write_epoch_files` for a DRIVER-LOCAL pyarrow table on a local
    filesystem root — the metadata-row fast path (r14): 1-row commit
    records (metrics decisions, list-form tombstones) are driver
    scalars, and scheduling a Spark job to persist one row cost ~1 s
    per epoch. Same idempotent protocol: hidden staging file, sweep any
    earlier attempt's files under the deterministic prefix (including
    Hadoop ``.{name}.crc`` siblings a Spark-written attempt left —
    a stale checksum next to a replaced file fails every later read),
    atomic rename. Returns the committed path."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    ep = epoch_file_prefix(batch_id, prefix)
    staged = os.path.join(root, f".staging-{ep}part00000.parquet")
    pq.write_table(table, staged)
    for old in os.listdir(root):
        if old.startswith(ep) or old.startswith(f".{ep}"):
            os.remove(os.path.join(root, old))
    dst = os.path.join(root, f"{ep}part00000.parquet")
    os.replace(staged, dst)
    return dst


def write_epoch_files(
    df, root: str, batch_id: int, prefix: str = "epoch"
) -> int:
    """Idempotent per-epoch append: materialize ``df`` under ``root``
    as files named ``{prefix}{batch_id:010d}-part*.parquet``.

    foreachBatch is at-least-once — on an epoch retry the same
    ``batch_id`` arrives again, so the append must converge rather than
    duplicate. Protocol (plain-parquet analog of a manifest commit):

    1. write to a hidden staging dir (``.`` prefix: invisible to every
       parquet reader, so a crash mid-write leaks nothing visible),
    2. delete any files a previous attempt of THIS epoch left under the
       deterministic name prefix (covers attempts that wrote more
       partitions than this one),
    3. move the staged files to their deterministic names (per-file
       rename; each is atomic, and name determinism makes the overall
       move idempotent),
    4. drop the staging dir.

    A retry at any crash point re-runs 1-4 and converges to exactly one
    copy of the epoch. Readers of ``root`` need no options — it stays a
    flat parquet directory. Returns the number of data files committed.
    """
    spark = df.sparkSession
    fs, jroot = _fs_and_path(spark, root)
    fs.mkdirs(jroot)
    epoch_prefix = epoch_file_prefix(batch_id, prefix)
    staging = root.rstrip("/") + f"/.staging-{prefix}{batch_id:010d}"
    df.write.mode("overwrite").parquet(staging)

    for old in list_files(spark, root):
        name = old.rsplit("/", 1)[-1]
        if name.startswith(epoch_prefix):
            delete_path(spark, old, recursive=False)

    n = 0
    for i, staged in enumerate(list_files(spark, staging, suffix=".parquet")):
        dst = root.rstrip("/") + f"/{epoch_prefix}part{i:05d}.parquet"
        delete_path(spark, dst, recursive=False)
        if not rename(spark, staged, dst):
            raise IOError(f"rename failed: {staged} -> {dst}")
        n += 1
    delete_path(spark, staging)
    return n
