"""Window-function operators: sessionization, per-group ranking, running
aggregates.

The reference needs no window operator for parity (SURVEY.md §2.5) — its
sessions exist only by construction in the generator. Query-side
sessionization is the natural extension: assign session ids from
inactivity gaps with lag + a running sum, the classic
``Window.partitionBy(user).orderBy(ts)`` pattern.

Scale note: every window here partitions by a high-cardinality key
(user_id / order key), so state per partition stays small and the sort
inside each partition is bounded — no single-partition global window
anywhere (that would serialize 100 TB through one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SESSION_GAP_MIN = 30


def sessionize(events: DataFrame, gap_minutes: int = DEFAULT_SESSION_GAP_MIN) -> DataFrame:
    """Assign per-user session numbers: a new session starts when the gap
    since the previous event exceeds ``gap_minutes``.

    lag -> boundary flag -> running sum of boundaries = session index.
    One shuffle on user_id; both window functions share the same
    partitioning/ordering so Spark evaluates them in a single Window node.
    """
    # Unique (ts, event_id) ordering keeps lag/sum deterministic under ts
    # ties; integer microsecond arithmetic avoids cross-engine float/
    # truncation drift at exact-gap boundaries.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.unix_micros("ts") - F.unix_micros(prev_ts) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn("session_seq", F.sum(is_new).over(w))


def session_stats(events: DataFrame, gap_minutes: int = DEFAULT_SESSION_GAP_MIN) -> DataFrame:
    """Per-user session summary: session count, events per session."""
    sessions = sessionize(events, gap_minutes)
    return (
        sessions.groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.count(F.lit(1)) / F.max("session_seq"), 4).alias("avg_events_per_session"),
        )
        .orderBy("user_id")
    )


def top_n_per_group(
    df: DataFrame, group_col: str, order_col: str, n: int, tiebreak_col: str
) -> DataFrame:
    """Top-n rows per group via row_number (deterministic with the
    tiebreak column; rank/dense_rank would leak ties past n)."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.col(tiebreak_col))
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= n).drop("rn")


def running_user_spend(events: DataFrame) -> DataFrame:
    """Cumulative per-user value over time: running SUM with the default
    rows-unbounded-preceding frame, plus event index via row_number."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("event_seq"),
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )
