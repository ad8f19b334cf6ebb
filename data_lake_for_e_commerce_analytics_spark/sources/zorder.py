"""Z-order (Morton) clustering for multi-column data skipping.

A table sorted by ONE column gives tight per-file min/max ranges for that
column only; filters on any other column scan everything. Interleaving
the bits of two (bucketized) sort keys — the Delta/Iceberg ``OPTIMIZE
ZORDER BY`` layout — makes every file a small rectangle in (c1, c2)
space, so parquet row-group/file stats prune scans filtered on EITHER
column. All math below is integer and engine-exact: bucketization uses
floor division against broadcast min/max scalars, and the interleave is
an unrolled shift/or expression that runs inside whole-stage codegen.

At 100 TB: one pass for min/max (partial agg), one range exchange on the
z-value (the same cost as any sort-for-write), then
``sortWithinPartitions`` keeps files internally ordered for row-group
pruning. No driver materialization beyond the two scalar bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(b1: Column, b2: Column, bits: int = 16) -> Column:
    """Morton-interleave two ``bits``-wide non-negative ints: bit i of
    ``b1`` lands at position 2i+1, bit i of ``b2`` at 2i. Unrolled to
    2*bits shift/and/or terms — pure codegen, no loops at runtime."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b1.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b2.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def zorder_keys(
    df: DataFrame, c1: str, c2: str, bits: int = 16
) -> DataFrame:
    """Attach bucketized keys and the z-value for (c1, c2). Bounds come
    from one partial-aggregated pass, broadcast as scalars."""
    bounds = df.agg(
        F.min(c1).cast("long").alias("min1"),
        F.max(c1).cast("long").alias("max1"),
        F.min(c2).cast("long").alias("min2"),
        F.max(c2).cast("long").alias("max2"),
    )
    top = (1 << bits) - 1
    with_b = df.join(F.broadcast(bounds)).select(
        "*",
        F.expr(
            f"CAST((CAST({c1} AS BIGINT) - min1) * {top}"
            f" div greatest(max1 - min1, 1) AS BIGINT)"
        ).alias("zb1"),
        F.expr(
            f"CAST((CAST({c2} AS BIGINT) - min2) * {top}"
            f" div greatest(max2 - min2, 1) AS BIGINT)"
        ).alias("zb2"),
    )
    return with_b.withColumn(
        "zval", interleave_bits(F.col("zb1"), F.col("zb2"), bits)
    ).drop("min1", "max1", "min2", "max2")


def cluster_by_zorder(
    df: DataFrame, path: str, c1: str, c2: str, bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` z-order-clustered on (c1, c2): range-partition on the
    z-value (each output file covers one contiguous z-range = one small
    rectangle in key space) and sort within partitions so row-group
    stats stay tight too."""
    keyed = zorder_keys(df, c1, c2, bits)
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(parts, "zval")
        .sortWithinPartitions("zval")
        .drop("zb1", "zb2", "zval")
        .write.mode("overwrite")
        .parquet(path)
    )
