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
    """Per-user session summary: session count, events per session.

    The events/sessions ratio is rounded half-up at 4 dp with integer
    arithmetic (not ROUND on a float division) so the emitted double is
    bit-identical on any engine computing the same counts.
    """
    sessions = sessionize(events, gap_minutes)
    return (
        sessions.groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "avg_events_per_session",
            F.expr("(n_events * 20000 + n_sessions) div (2 * n_sessions)") / F.lit(10000.0),
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


def gmv_moving_avg(orders: DataFrame, days: int = 7) -> DataFrame:
    """Daily GMV with a trailing ``days``-row moving average: explicit
    rowsBetween frame over the date-ordered daily aggregate. The window
    runs AFTER the aggregate, so the unpartitioned sort touches
    day-count rows (bounded by the calendar, ~10^3-10^4 at any data
    scale), never the order table."""
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("gmv")
    )
    w = Window.orderBy("d").rowsBetween(-(days - 1), 0)
    return (
        daily.withColumn("moving_avg", F.round(F.avg("gmv").over(w), 4))
        .orderBy("d")
    )


def acctbal_quartile_by_nation(customer: DataFrame) -> DataFrame:
    """Rank-family windows partitioned by nation: ntile quartile and
    percent_rank of account balance within each nation. Partitioned by
    the nation key so every window state is one nation's customers —
    the scalable shape (a global ntile would serialize the table
    through one task)."""
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return customer.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    ).orderBy("c_custkey")


def gmv_trailing_week(orders: DataFrame) -> DataFrame:
    """Daily GMV with a calendar-aware trailing-7-day sum: a RANGE frame
    over integer day numbers, so missing days genuinely shrink the
    window (a ROWS frame would silently span gaps — the bug this
    operator exists to avoid). Completes the frame-type coverage next to
    gmv_moving_avg's ROWS frame.

    Parity: GMV stays integer cents inside the frame sum (order-free
    exact addition), one display division at the end. The window runs on
    the day-level aggregate — calendar-bounded rows, never the fact
    table.
    """
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    day_num = F.datediff(F.col("d"), F.lit("1995-01-01").cast("date"))
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return (
        daily.withColumn("day_num", day_num)
        .select(
            "d",
            (F.col("cents") / 100.0).alias("gmv"),
            (F.sum("cents").over(w) / 100.0).alias("trailing_7d_gmv"),
            F.count(F.lit(1)).over(w).alias("days_present"),
        )
        .orderBy("d")
    )


def event_value_ffill(events: DataFrame) -> DataFrame:
    """Per-user forward fill: click/view events carry no monetary value
    (masked to NULL), so each event inherits the most recent valued
    event's amount — last_value IGNORE NULLS over a running frame, the
    standard LOCF (last-observation-carried-forward) gap repair.

    Partitioned by user_id with a (ts, event_id) tiebreaker: per-user
    state only, no global sort; at 100 TB this is one hash shuffle on
    the user key.
    """
    masked = F.when(
        F.col("event_type").isin("click", "view"), F.lit(None).cast("double")
    ).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.select(
            "event_id",
            "user_id",
            "event_type",
            masked.alias("masked_value"),
            F.last(masked, ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("event_id")
    )


def behavior_sequences(
    events: DataFrame, gap_minutes: int = DEFAULT_SESSION_GAP_MIN
) -> DataFrame:
    """Session-to-document conversion: each user session becomes one
    training example — the time-ordered event-type sequence as a
    space-joined string (the "behavior sentence" sequence-model /
    session-recommendation training data is built from), with event
    count and total value-in-cents.

    Composition: the gap sessionizer (one shuffle on user_id) followed
    by a per-(user, session) partial aggregate. The sequence string is
    assembled by sorting each session's collected (ts, event_id, type)
    structs IN the aggregate row — never a second global sort — so the
    operator costs exactly one exchange beyond the sessionizer's, and
    per-group memory is bounded by session length (hundreds of events),
    not user history.

    Integer cents (not a float SUM) keep the total independent of
    summation order — the cross-engine parity rule.
    """
    sessions = sessionize(events.filter(F.col("ts").isNotNull()), gap_minutes)
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                " ",
            ).alias("sequence"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .orderBy("user_id", "session_seq")
    )
