"""Upsert / merge for parquet-backed tables.

The reference's zones are write-once or full-overwrite (reference
README.md:193-196, :424-430); an engine run continuously needs MERGE
semantics. Without a transactional table format, the scalable pattern is
merge-by-rewrite: union the base with the delta, keep the newest row per
key, overwrite. The dedup is one shuffle on the key — the same cost as
the join a transactional MERGE would do — and the rewrite is restricted
to touched partitions when a partition column is given (dynamic
partition overwrite), which is the 100 TB lever: a 1 % daily delta
rewrites 1 % of files, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fs import parquet_table_exists


def merge_keep_latest(
    base: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """SCD-type-1 merge: one row per key, the highest ``version_col``
    wins; delta beats base on ties (row_number over (key) ordered by
    version desc, source priority). Exactly one shuffle, on the key."""
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        delta.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def merge_into_path(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    key_cols: list[str],
    version_col: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Merge ``delta`` into the parquet table at ``path`` and rewrite.

    With ``partition_cols`` the write uses dynamic partition overwrite:
    only partitions present in the merged output of TOUCHED partitions
    are rewritten. The base is pre-filtered to the delta's partitions
    (partition pruning at the scan), so both read and write scale with
    the delta, not the table.
    """
    # Data-file probe, not try/except around the read: the missing-table
    # branch overwrites `path`, so a transient read failure must raise
    # rather than be mistaken for "table not created yet" — while a
    # crashed first write (dir with only _temporary debris) correctly
    # re-takes the initial build instead of wedging on schema inference.
    exists = parquet_table_exists(spark, path)
    if exists:
        base = spark.read.parquet(path)

    if not exists:
        out = merge_keep_latest(delta.limit(0), delta, key_cols, version_col)
        writer = out.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(path)
        return spark.read.parquet(path)

    if partition_cols:
        touched = delta.select(*partition_cols).distinct()
        pruned_base = base.join(F.broadcast(touched), partition_cols, "left_semi")
        merged = merge_keep_latest(pruned_base, delta, key_cols, version_col)
        # Overwriting a path that the (lazy) merged plan still reads from
        # would corrupt the scan mid-write; localCheckpoint materializes
        # the merged rows first. At real scale this staging belongs to a
        # transactional format (Delta/Iceberg) — the dataflow is the same.
        merged = merged.localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    else:
        merged = merge_keep_latest(base, delta, key_cols, version_col)
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def maintain_aggregate(
    base: DataFrame,
    cdc: DataFrame,
    keys: list[str],
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Incremental view maintenance for additive aggregates: fold a CDC
    batch (rows tagged ``op`` = 'I'nsert or 'D'elete; updates arrive as
    D+I pairs) into a running (keys -> count, sums) aggregate WITHOUT
    re-scanning the fact table — the standard way a 100 TB gold
    aggregate stays fresh when re-aggregating the base facts per batch
    would cost hours.

    Deletes contribute negated deltas; groups whose maintained count
    reaches zero are dropped (a group only the CDC batch ever saw
    cancels out entirely). One shuffle on the keys for the delta
    partial-agg, one for the merge union — both map-side-combined, and
    the base side is the (small) aggregate, never the facts.

    ``sum_cols`` maps output column -> source value column in the CDC
    rows (e.g. {"revenue": "price"}); the base must carry the output
    columns.
    """
    sum_cols = sum_cols or {}
    sign = F.when(F.col("op") == "D", F.lit(-1)).otherwise(F.lit(1))
    delta = cdc.groupBy(*keys).agg(
        F.sum(sign).cast("long").alias(count_col),
        *[
            F.sum(sign * F.col(src)).alias(out)
            for out, src in sum_cols.items()
        ],
    )
    merged = (
        base.select(*keys, count_col, *sum_cols.keys())
        .unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum(count_col).cast("long").alias(count_col),
            *[F.sum(out).alias(out) for out in sum_cols],
        )
        .filter(F.col(count_col) > 0)
    )
    return merged


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two table snapshots: per change type
    (added / removed / changed / unchanged), the row count — the audit a
    lake runs after every merge to know what a load actually did.

    One full-outer join on the key; change classification is column-wise
    null-safe comparison (``eqNullSafe``), never a concat-and-hash — hash
    classification would depend on engine-specific value formatting and
    break cross-engine parity. At 100 TB both snapshots shuffle once on
    the key (or zero times if both are bucketed on it); the output is
    4 rows.
    """
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols],
        *[F.col(c).alias(f"_ov_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in key_cols],
        *[F.col(c).alias(f"_nv_{c}") for c in compare_cols],
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"_o_{c}") == F.col(f"_n_{c}")
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    old_present = F.col(f"_o_{key_cols[0]}").isNotNull()
    new_present = F.col(f"_n_{key_cols[0]}").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}"))
        same = eq if same is None else same & eq
    change_type = (
        F.when(~old_present, F.lit("added"))
        .when(~new_present, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.select(change_type.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("change_type")
    )


def snapshot_changes(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level change-data-feed between two snapshots (the Delta
    CDF shape): one row per added / removed / changed key, carrying the
    old and new tracked values side by side — what an incremental
    consumer actually replays, where ``snapshot_diff`` only reports the
    4-row census. Unchanged keys are dropped (the feed is the delta).

    Same join algebra as ``snapshot_diff``: one full-outer join on the
    key, column-wise ``eqNullSafe`` classification — no concat-and-hash
    (cross-engine parity rule). At 100 TB: one co-partitioned shuffle
    per side (zero if both are bucketed on the key); output is bounded
    by the true change set.
    """
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"_o_{c}") == F.col(f"_n_{c}")
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    old_present = F.col(f"_o_{key_cols[0]}").isNotNull()
    new_present = F.col(f"_n_{key_cols[0]}").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else same & eq
    change_type = (
        F.when(~old_present, F.lit("added"))
        .when(~new_present, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"_n_{c}"), F.col(f"_o_{c}")).alias(c)
                for c in key_cols
            ],
            change_type.alias("change_type"),
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
        .filter(F.col("change_type") != "unchanged")
    )


def scd2_history(
    change_log: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    seq_col: str,
    keep_seq: bool = False,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    log: per key, consecutive rows whose tracked attributes did not
    change are collapsed, and each surviving version gets
    ``valid_from`` / ``valid_to`` (null-open for the current row),
    ``version``, and ``is_current``.

    ``seq_col`` is a unique per-row tiebreaker (an order key, a CDC
    offset) so same-timestamp changes order deterministically — without
    it the history would be layout-dependent, which this repo's
    determinism rule forbids.

    Scale shape: two windows, both partitioned by the dimension key —
    the shuffle is one exchange on the key and every partition holds
    single-key change sequences (bounded by per-entity change counts,
    never corpus-sized). Change detection is column-wise ``lag``
    comparison with ``eqNullSafe`` — no concat-and-hash, same
    cross-engine-parity rule as ``snapshot_diff``.

    ``keep_seq=True`` additionally carries each version's opening
    ``seq_col`` value as ``__seq`` — the incremental maintainer
    (streaming/scd2_stream.py) needs it to re-order a persisted history
    against newly arriving changes; the public query shape omits it.
    """
    order_cols = [F.col(ts_col), F.col(seq_col)]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    changed = None
    with_lags = change_log
    for c in attr_cols:
        with_lags = with_lags.withColumn(f"__prev_{c}", F.lag(c).over(w))
        diff = ~F.col(c).eqNullSafe(F.col(f"__prev_{c}"))
        changed = diff if changed is None else (changed | diff)
    versions = (
        with_lags.withColumn("__first", F.row_number().over(w))
        .withColumn("__changed", changed)
        .filter((F.col("__first") == 1) | F.col("__changed"))
        .drop("__first", "__changed", *[f"__prev_{c}" for c in attr_cols])
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    extra = [F.col(seq_col).alias("__seq")] if keep_seq else []
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("version", F.row_number().over(w2))
        .withColumn(
            "is_current", F.when(F.lead(ts_col).over(w2).isNull(), 1).otherwise(0)
        )
        .select(
            *key_cols, *attr_cols,
            "valid_from", "valid_to", "version", "is_current", *extra,
        )
    )


def scd2_as_of(
    history: DataFrame, key_cols: list[str], at_ts
) -> DataFrame:
    """Point-in-time dimension snapshot from an SCD2 history: the row
    version valid at ``at_ts`` per key (``valid_from <= at <
    valid_to``, null-open current rows included). A pure filter — no
    shuffle; at scale the history table is partitioned/bucketed by key
    and this runs at scan speed."""
    at = F.lit(at_ts)
    return history.filter(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at))
    )
