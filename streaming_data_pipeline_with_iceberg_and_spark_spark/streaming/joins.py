"""Streaming joins (SURVEY.md §2.3 J8/J9).

The reference joins nothing (single-relation pipeline,
/root/reference/spark-data-pipeline/spark_job.py:156-164); these are the two
join shapes Structured Streaming supports natively, declared so state stays
bounded at scale:

- stream ⋈ static: the static side behaves like a broadcast dim — no state,
  re-resolved per micro-batch (picks up dim-table updates between triggers).
- stream ⋈ stream: BOTH sides watermarked + an event-time bound in the join
  condition; without the bound Spark must buffer every row forever (the
  unbounded-state footgun at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """J8: enrich a stream with a static dimension table.

    The dim side must be a batch DataFrame; the explicit broadcast hint
    keeps this a per-batch broadcast hash join with no streaming state.
    The hint is load-bearing: AQE's runtime broadcast conversion does NOT
    apply to streaming plans, and the session disables static
    estimate-based broadcasts (see session.py) — without it every
    micro-batch would sort-merge-join the dim. The dim side is bounded by
    this function's contract (a dimension table); for a static side too
    big to broadcast, pre-bucket both sides instead."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "event_ts",
    right_ts: str = "event_ts_r",
    watermark: str = "10 minutes",
    max_delay: str = "5 minutes",
) -> DataFrame:
    """J9: inner stream-stream join on ``key`` where the right event arrives
    within [left_ts, left_ts + max_delay].

    Both sides carry watermarks and the condition bounds event time in both
    directions, so each side's buffered state expires deterministically."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[f"{key}_r"])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner")
