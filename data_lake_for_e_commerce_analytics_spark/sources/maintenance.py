"""Lakehouse table-maintenance operators: small-file compaction and
Z-order clustering — the OPTIMIZE pass a parquet lake runs between
ingestion and query serving.

Neither changes table contents; both change LAYOUT, which is the lever
that matters at 100 TB: fewer/larger files amortize scan setup and S3
requests, and Z-ordered row groups let min/max pruning skip data for
multi-column predicates that no single sort order could serve.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_files(path: str) -> list[str]:
    """The parquet data files of a (possibly partitioned) table dir."""
    out: list[str] = []
    for root, _dirs, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
    return sorted(out)


def compact_parquet(
    spark: SparkSession, path: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Rewrite a parquet directory into ceil(rows/target) files (small-file
    compaction). Returns the new file count.

    Uses repartition (round-robin) rather than coalesce: coalesce(n)
    narrows the upstream plan to n tasks (no shuffle, but no rebalance of
    skewed inputs either); compaction wants evenly-sized outputs, which
    is worth the one shuffle it costs. The rewrite goes through a temp
    dir + swap so a crash mid-write never leaves a half-written table in
    place of the original.
    """
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    tmp = path.rstrip("/") + "__compact_tmp"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(parquet_files(path))


def add_zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16, key_col: str = "_zkey"
) -> DataFrame:
    """Morton (Z-order) key: bit-interleave two numeric columns' scaled
    integer images so rows close in BOTH dimensions land close in the
    linear order. Pure JVM bit arithmetic (shiftleft/or) — no UDF, no
    global window.

    Columns are scaled to [0, 2^bits) linearly between their min and max,
    obtained from a 1-row broadcast aggregate — one extra scan, never a
    single-task sort (a percent_rank scaling would be skew-robust but
    funnels every row through one task; for skewed columns, pre-bucket
    with approxQuantile boundaries instead)."""
    scale = (1 << bits) - 1
    stats = df.agg(
        F.min(col_a).alias("_a_min"),
        F.max(col_a).alias("_a_max"),
        F.min(col_b).alias("_b_min"),
        F.max(col_b).alias("_b_max"),
    )
    span_a = F.when(F.col("_a_max") > F.col("_a_min"), F.col("_a_max") - F.col("_a_min")).otherwise(F.lit(1))
    span_b = F.when(F.col("_b_max") > F.col("_b_min"), F.col("_b_max") - F.col("_b_min")).otherwise(F.lit(1))
    ra = ((F.col(col_a) - F.col("_a_min")) / span_a * scale).cast("long")
    rb = ((F.col(col_b) - F.col("_b_min")) / span_b * scale).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(ra.bitwiseAND(F.lit(1 << i)), i + 1)
        ).bitwiseOR(F.shiftleft(rb.bitwiseAND(F.lit(1 << i)), i))
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(key_col, key)
        .drop("_a_min", "_a_max", "_b_min", "_b_max")
    )


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, num_files: int = 8
) -> None:
    """Write ``df`` Z-ordered on (col_a, col_b): range-partition by the
    Morton key, sort within partitions, write parquet. Each output file
    then covers a compact rectangle of the 2-D key space, so parquet
    footer min/max stats on BOTH columns prune effectively — the
    multi-column data-skipping layout a single-column sort cannot give.
    """
    (
        add_zorder_key(df, col_a, col_b)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
