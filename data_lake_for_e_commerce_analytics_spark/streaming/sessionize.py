"""Structured Streaming extension (SURVEY.md §2.10/§7: the reference is
batch-only; streaming ingestion of the clickstream is the planned
upgrade path).

Pipelines here mirror the batch G2/G5 semantics on an unbounded source:
``readStream`` -> watermark on the event timestamp -> windowed /
session-window aggregation. State stays bounded by the watermark — late
events beyond it are dropped, which is the documented trade against the
batch path's exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_events_from_parquet(spark, path: str, schema) -> DataFrame:
    """File-source streaming scan of an events directory: each new parquet
    file becomes a micro-batch (the S3-drop ingestion pattern of the
    reference's raw zone, reference README.md:417-418)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts per type with late-data handling."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization via session_window — the native stateful
    equivalent of the batch gap-based sessionize (operators/windows.py):
    sessions close when no event arrives within ``gap``."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
