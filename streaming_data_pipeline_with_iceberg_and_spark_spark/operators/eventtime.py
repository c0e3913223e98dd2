"""Event-time window aggregations in batch mode (SURVEY.md §2.7 T6/T7).

Same ``F.window`` / ``F.session_window`` operators Structured Streaming uses,
run over the bounded events table so they are oracle-checkable; the streaming
variants (with watermarks) live in ``streaming/windowed.py`` and are tested
with fixture micro-batches. Window bounds are emitted as epoch seconds
(bigint) — engine-neutral and hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load


# events.value carries exactly 2 decimals; summing through integer cents
# makes the aggregate independent of float accumulation ORDER — a different
# partitioning (or engine) must produce the bit-identical result. Plain
# SUM/AVG(double) diverges in the last rounded digit once enough rows land in
# one group (observed at sf0.1 in the sliding window's 6-decimal avg).
# (Built lazily: Column construction needs an active SparkContext.)
def _cents() -> F.Column:
    return F.round(F.col("value") * 100).cast("long")


def window_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: 5-minute tumbling window counts per event type."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(_cents()) / 100.0).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


WINDOW_TUMBLING_SQL = """
SELECT CAST(floor(epoch(time_bucket(INTERVAL 5 MINUTE, ts))) AS BIGINT) AS window_start,
       event_type,
       COUNT(*) AS n,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY 1, 2
"""


def window_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: 10-minute windows sliding every 5 minutes (each event lands in 2)."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            # avg in integer micro-units via floor division — fully exact.
            # A rounded float avg can land on a .5 half-boundary where
            # HALF_UP (Spark) and the oracle disagree by 1 ulp.
            F.expr("(sum(cast(round(value * 100) as bigint)) * 10000) div count(*)")
            .alias("avg_value_e6"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n",
            "avg_value_e6",
        )
    )


# each event belongs to windows starting at bucket(ts) and bucket(ts) - 300;
# express the two memberships as a UNION ALL then aggregate
WINDOW_SLIDING_SQL = """
WITH memb AS (
  SELECT CAST(floor(epoch(time_bucket(INTERVAL 5 MINUTE, ts))) AS BIGINT) AS window_start, value
  FROM events
  UNION ALL
  SELECT CAST(floor(epoch(time_bucket(INTERVAL 5 MINUTE, ts))) AS BIGINT) - 300, value
  FROM events
)
SELECT window_start, COUNT(*) AS n,
       (CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) * 10000) // COUNT(*) AS avg_value_e6
FROM memb
GROUP BY 1
"""


def window_session_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: session windows (30-min gap) per user via F.session_window —
    the built-in operator counterpart of the manual ``sessionize`` query
    (operators/windows.py), which doubles as its cross-check."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(_cents()) / 100.0).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


# oracle: replicate gap-sessionization; session end extends 30min past last
# event, but session_start = first event ts (same as manual sessionize)
WINDOW_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS session_value
FROM sess
GROUP BY user_id, sid
"""


def resample_ffill_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: resample each user's events to a 1-minute grid,
    forward-filling the last observed value (LOCF) — the standard telemetry
    densification the reference's GPS domain implies but never builds.

    Scale shape: instead of generating a calendar grid and left-joining
    observations onto it (a join + a full-history window), each observation
    emits its own validity interval — ``lead(minute)`` then explode a
    minute sequence carrying the value. One window pass + one explode, no
    join, and a user's output is proportional to their gap span only."""
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir).filter(
        (F.col("user_id") < 5)
        & (F.col("ts") >= F.lit("2024-01-02"))
        & (F.col("ts") < F.lit("2024-01-03"))
    )
    # one observation per (user, minute): latest arrival (max event_id) wins
    per_min = ev.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("minute")
    ).agg(F.max_by("value", "event_id").alias("obs_value"))
    w = Window.partitionBy("user_id").orderBy("minute")
    return (
        per_min.withColumn("next_min", F.lead("minute").over(w))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("minute"),
                    F.coalesce(
                        F.col("next_min") - F.expr("interval 1 minute"),
                        F.col("minute"),
                    ),
                    F.expr("interval 1 minute"),
                )
            ).alias("minute"),
            "obs_value",
        )
        .select(
            "user_id",
            F.col("minute").cast("long").alias("minute_ts"),
            F.col("obs_value").alias("value_ffill"),
        )
    )


RESAMPLE_FFILL_SQL = """
WITH per_min AS (
  SELECT user_id, date_trunc('minute', ts) AS minute,
         arg_max(value, event_id) AS obs_value
  FROM events
  WHERE user_id < 5 AND ts >= '2024-01-02' AND ts < '2024-01-03'
  GROUP BY 1, 2
), nxt AS (
  SELECT *, LEAD(minute) OVER (PARTITION BY user_id ORDER BY minute) AS next_min
  FROM per_min
)
SELECT user_id,
       CAST(floor(epoch(u.m)) AS BIGINT) AS minute_ts,
       obs_value AS value_ffill
FROM nxt, UNNEST(generate_series(minute,
                                 COALESCE(next_min - INTERVAL 1 MINUTE, minute),
                                 INTERVAL 1 MINUTE)) AS u(m)
"""


def rollup_multi_granularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: event counts and value
    totals at minute / hour / day granularities in ONE grouping-sets pass
    (one shuffle produces all three granularities; three separate groupBys
    would scan and shuffle the fact three times). At 100 TB this is the
    materialized-rollup shape: compute once, serve every zoom level."""
    ev = load(spark, "events", sf_dir).select(
        F.date_trunc("minute", "ts").alias("m"),
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        _cents().alias("cents"),
    )
    return (
        ev.groupingSets([["m"], ["h"], ["d"]], "m", "h", "d")
        .agg(
            F.count("*").alias("n"),
            (F.sum("cents") / 100.0).alias("total_value"),
        )
        .select(
            F.when(F.col("m").isNotNull(), "minute")
            .when(F.col("h").isNotNull(), "hour")
            .otherwise("day")
            .alias("granularity"),
            F.coalesce("m", "h", "d").cast("long").alias("bucket_start"),
            "n",
            "total_value",
        )
    )


ROLLUP_MULTI_SQL = """
SELECT CASE WHEN GROUPING(m) = 0 THEN 'minute'
            WHEN GROUPING(h) = 0 THEN 'hour'
            ELSE 'day' END AS granularity,
       CAST(floor(epoch(COALESCE(m, h, d))) AS BIGINT) AS bucket_start,
       COUNT(*) AS n,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM (SELECT date_trunc('minute', ts) AS m,
             date_trunc('hour', ts) AS h,
             date_trunc('day', ts) AS d,
             value
      FROM events)
GROUP BY GROUPING SETS ((m), (h), (d))
"""


QUERIES = {
    "window_tumbling_5min": window_tumbling_5min,
    "rollup_multi_granularity": rollup_multi_granularity,
    "window_sliding_10m_5m": window_sliding_10m_5m,
    "window_session_30min": window_session_30min,
    "resample_ffill_1min": resample_ffill_1min,
}

ORACLES = {
    "window_tumbling_5min": WINDOW_TUMBLING_SQL,
    "rollup_multi_granularity": ROLLUP_MULTI_SQL,
    "window_sliding_10m_5m": WINDOW_SLIDING_SQL,
    "window_session_30min": WINDOW_SESSION_SQL,
    "resample_ffill_1min": RESAMPLE_FFILL_SQL,
}
