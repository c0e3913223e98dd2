"""Streaming event-time semantics (SURVEY.md §2.7 T5-T9, T11).

Builders return unbounded DataFrames ready for ``writeStream``; tests drive
them with file-source fixtures and ``availableNow`` triggers. The reference
has no event-time layer at all (its ``timestamp`` stays a string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "event_ts",
    key: str = "vehicle_id",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T5+T6: watermarked tumbling-window counts per key (append-able)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), key, "n")
    )


def sliding_avg(
    events: DataFrame,
    ts_col: str = "event_ts",
    value_col: str = "speed_kmh",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T7: sliding-window average."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.round(F.avg(value_col), 6).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "avg_value")
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "event_ts",
    key: str = "vehicle_id",
    gap: str = "30 seconds",
    watermark: str = "1 minute",
) -> DataFrame:
    """T8: session windows by inactivity gap."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T9: streaming dedup — state bounded by the watermark (unbounded-state
    ``dropDuplicates`` is the classic 100 TB streaming footgun)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
