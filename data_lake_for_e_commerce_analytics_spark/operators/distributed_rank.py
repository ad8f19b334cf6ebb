"""Distributed global ranking primitives — exact row_number / ntile /
percent_rank over a total order WITHOUT a single-partition window.

``Window.orderBy(...)`` with no partition key plans as
``Exchange SinglePartition`` -> one task sorts the ENTIRE relation
(Spark does NOT range-partition an unpartitioned window — WindowExec
itself warns about it). Fine for a bounded census; a non-starter for a
fact table at 100 TB. These helpers compute the same ranks as a sort
does:

1. ``repartitionByRange`` on the full ordering key (Spark's own
   distributed-sort partitioner: sampled range boundaries, every
   partition holds a contiguous key range);
2. per-partition local ``row_number`` — the window is partitioned by
   ``spark_partition_id()``, so each task ranks only its own slice;
3. a per-partition row-count census (#partitions rows — metadata
   scale), cumulative-summed into per-partition offsets;
4. ``global rank = offset(partition) + local rank``, attached by a
   broadcast join against the tiny offsets relation.

The range-shuffled relation is localCheckpoint-ed before fanning out to
steps 2 and 3: the two consumers MUST observe the same sampled range
boundaries, and a re-executed exchange re-samples. (A distributed rank
is inherently a materialized sort — the checkpoint is the sort output,
not an extra pass.)

Exactness contract: callers supply a TOTAL order (a unique tiebreak
column last), so ranks are engine-independent — equal-key rows never
straddle a boundary ambiguously because there are no equal keys. The
ntile/percent_rank arithmetic stays exact through the double division
for relations below 2^53 rows (IEEE division of exactly-representable
integers is correctly rounded, so ceil/compare never flips).

These back `analytics.order_value_equidepth`, `analytics.rfm_segments`
and `text.quality_percentile_filter` — the three queries VERDICT r10
flagged for single-partition / skewed windows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_exprs(order_cols: Sequence) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def grouped_row_number(
    df: DataFrame,
    order_cols: Sequence,
    out: str = "rn",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """1-based global row_number per ``group_cols`` (empty = one global
    group) under ``order_cols`` — the range-partition + offset plan
    described in the module docstring. ``order_cols`` must end in a
    unique tiebreak within each group.

    Skew note: the range partitioner keys on (group, order) — a
    dominant group (90%-English corpora) spreads across many contiguous
    partitions instead of hammering one hash bucket, which is exactly
    why this replaces ``Window.partitionBy(group)`` for skewed groups.
    """
    orders = _order_exprs(order_cols)
    sort_exprs = [*_order_exprs(group_cols), *orders]
    part = (
        df.repartitionByRange(*sort_exprs)
        .withColumn("__pid", F.spark_partition_id())
        # pin ONE boundary sampling: the census and the local-rank
        # branches below must see identical partition ids
        .localCheckpoint(eager=True)
    )
    w_local = Window.partitionBy("__pid", *group_cols).orderBy(*orders)
    local = part.withColumn("__lrn", F.row_number().over(w_local))
    census = part.groupBy("__pid", *group_cols).agg(
        F.count(F.lit(1)).alias("__c")
    )
    # cumulative offsets over the census: #partitions x #groups rows —
    # metadata scale, the one place a bounded global window is correct
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = census.withColumn(
        "__off", F.coalesce(F.sum("__c").over(w_off), F.lit(0))
    ).select("__pid", *group_cols, "__off")
    return (
        local.join(F.broadcast(offsets), ["__pid", *group_cols])
        .withColumn(out, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def exact_ntile(
    df: DataFrame,
    n: int,
    order_cols: Sequence,
    out: str = "bucket",
) -> DataFrame:
    """Global ``ntile(n)`` with exact SQL semantics (first ``m mod n``
    buckets take ``ceil(m/n)`` rows, the rest ``floor(m/n)``), computed
    from the distributed global rank — no single-partition window.
    ``order_cols`` must end in a unique tiebreak."""
    ranked = grouped_row_number(df, order_cols, out="__rn")
    total = ranked.agg(F.count(F.lit(1)).alias("__m"))
    big = F.floor(F.col("__m") / n) + 1  # rows in each of the first `rem` buckets
    rem = F.col("__m") % n
    cut = big * rem  # ranks 1..cut live in the big buckets
    small = F.greatest(F.floor(F.col("__m") / n), F.lit(1))
    bucket = F.when(
        F.col("__rn") <= cut, F.ceil(F.col("__rn") / big)
    ).otherwise(rem + F.ceil((F.col("__rn") - cut) / small))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out, bucket.cast("int"))
        .drop("__rn", "__m")
    )


def grouped_percent_rank(
    df: DataFrame,
    order_cols: Sequence,
    out: str = "pct_rank",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group ``percent_rank`` = (rank-1)/(rows-1), exact SQL
    semantics under a TOTAL order (the unique tiebreak makes rank ==
    row_number — no tie plateaus), 0.0 for single-row groups. Replaces
    ``Window.partitionBy(group)`` where a dominant group would put most
    of the relation through one task."""
    ranked = grouped_row_number(df, order_cols, out="__rn", group_cols=group_cols)
    # group sizes come off the ranked relation (it reads the checkpoint,
    # not the input lineage — one corpus scan total, not two)
    if group_cols:
        sizes = ranked.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
        joined = ranked.join(F.broadcast(sizes), list(group_cols))
    else:
        joined = ranked.crossJoin(
            F.broadcast(ranked.agg(F.count(F.lit(1)).alias("__n")))
        )
    pct = F.when(
        F.col("__n") > 1, (F.col("__rn") - 1) / (F.col("__n") - 1)
    ).otherwise(F.lit(0.0))
    return joined.withColumn(out, pct).drop("__rn", "__n")
