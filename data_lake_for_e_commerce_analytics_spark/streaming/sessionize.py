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


def funnel_state_tracker(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    timeout_minutes: int = 60,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    funnel progression (signup -> view -> purchase), emitting one row per
    user when the funnel completes or the state times out.

    This is the operator shape session_window CANNOT express: the state
    is an arbitrary per-key record (furthest funnel stage + counts), the
    transition function is user code over Arrow batches, and emission is
    event-driven (on completion) rather than window-driven. State is
    dropped via processing-time timeout, so memory stays bounded by
    |active users|, not history length.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    STAGES = {"signup": 1, "view": 2, "purchase": 3}

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("max_stage", T.IntegerType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("completed", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("max_stage", T.IntegerType()),
            T.StructField("n_events", T.LongType()),
        ]
    )

    def track(key, pdfs, state: GroupState):
        (user_id,) = key
        max_stage, n_events = state.get if state.exists else (0, 0)
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "max_stage": [max_stage],
                 "n_events": [n_events], "completed": [False]}
            )
            return
        for pdf in pdfs:
            n_events += len(pdf)
            stages = pdf["event_type"].map(STAGES).dropna()
            if len(stages):
                max_stage = max(max_stage, int(stages.max()))
        if max_stage >= STAGES["purchase"]:
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "max_stage": [max_stage],
                 "n_events": [n_events], "completed": [True]}
            )
        else:
            state.update((max_stage, n_events))
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
            yield pd.DataFrame(
                {"user_id": [], "max_stage": [], "n_events": [], "completed": []}
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def enrich_stream_with_dim(
    stream_events: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """Stream-static join: enrich a streaming fact with a batch
    dimension. Spark re-plans the static side per micro-batch, so the
    dim may be refreshed between batches; with a small dim this is a
    broadcast join per batch — no state, no watermark needed (unlike
    stream-stream joins)."""
    return stream_events.join(
        F.broadcast(dim), stream_events[stream_key] == dim[dim_key], "left"
    )
