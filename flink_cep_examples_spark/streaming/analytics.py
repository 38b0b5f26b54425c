"""Streaming analytics twins of the batch catalog: event-time windowed
aggregation and session windows under Structured Streaming.

These are the "windows (tumbling/session)" streaming concerns of
SURVEY §2.5 — absent from the reference (its 1-hour constraint is a
per-match deadline, not a window) but part of the engine surface, and
deliberately thin: the SAME ``window()`` / ``session_window()``
expressions drive batch (queries/relational.py) and streaming, so the
batch DuckDB oracles pin the semantics and streaming tests only need
to show stream/batch agreement.

Late data: rows later than the watermark are dropped by Spark's
streaming aggregation state manager — the same bounded-out-of-orderness
contract as the CEP operator. Append mode emits a window only when the
watermark passes its end, so results are final (no retractions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_by_type_stream(
    events: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Tumbling 1-hour counts per event_type (streaming twin of
    queries/relational.py::events_hourly_by_type)."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Sliding 1-hour/15-min counts per event_type (streaming twin of
    queries/relational.py::events_sliding_counts). A window finalizes
    (append mode) when the watermark passes its end; each event
    contributes to 4 overlapping windows, all handled inside Spark's
    windowed-aggregation state."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def sessions_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-user session windows with a 30-min inactivity gap (streaming
    twin of queries/relational.py::events_sessions). Session state
    merges across micro-batches and finalizes when the watermark passes
    session end + gap."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )
