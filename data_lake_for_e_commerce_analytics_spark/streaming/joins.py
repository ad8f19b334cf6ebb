"""Stream-stream joins and streaming deduplication — the two stateful
streaming shapes sessionize.py doesn't cover.

The reference is batch-only (SURVEY.md §2.10); these are the upgrade
paths for its clickstream ingestion. Both operators bound their state
with watermarks: the join buffers each side only within the time-range
condition plus the watermark delay, and dedup keeps a key only until
the watermark passes it — without those bounds, 100 TB of stream history
would accumulate in the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_to_purchases_join(
    events: DataFrame,
    ts_col: str = "ts",
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each click joined to the same user's
    purchases that happen within ``max_gap`` AFTER it.

    Both sides are watermarked and the join condition carries an explicit
    time range (purchase_ts in [click_ts, click_ts + max_gap]) — that
    range is what lets Spark evict buffered rows: a click older than
    watermark + max_gap can never match a future purchase and is dropped
    from state. Equi-key (user_id) keeps the join a hash partition on
    both sides; state per key is the user's in-window events only.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col(ts_col).alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col(ts_col).alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")


def streaming_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key.

    ``dropDuplicatesWithinWatermark`` expires a key's state once the
    watermark passes its last-seen timestamp, so the state store holds
    only the active window of keys — the streaming analog of the batch
    ``dropDuplicates`` in clean_orders (reference README.md:190), with
    the documented trade: a duplicate arriving later than the watermark
    delay is NOT suppressed.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
