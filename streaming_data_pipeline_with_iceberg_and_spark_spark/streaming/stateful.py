"""Arbitrary stateful streaming (SURVEY.md §2.7 T10): per-vehicle trip
segmentation with ``applyInPandasWithState``.

A trip = consecutive GPS readings for one vehicle with gaps < GAP_SECONDS.
State per vehicle: current trip's start/end/count/distance-proxy. When the
watermark passes a trip's end + gap, the trip is emitted and state dropped —
state size is O(active vehicles), not O(events): the property that keeps
this runnable on an unbounded 100 TB stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.text import mg_fold

GAP_SECONDS = 120

TRIP_SCHEMA = T.StructType(
    [
        T.StructField("vehicle_id", T.StringType()),
        T.StructField("trip_start", T.TimestampType()),
        T.StructField("trip_end", T.TimestampType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("max_speed", T.DoubleType()),
    ]
)

# state tuple: (trip_start_epoch_us, trip_end_epoch_us, n_points, max_speed)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("max_speed", T.DoubleType()),
    ]
)


def _segment(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for one vehicle into trip state; emit
    trips closed by a gap (or by processing-time timeout for idle vehicles)."""
    vehicle_id = key[0]
    if state.hasTimedOut:
        if state.exists:
            s, e, n, mx = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "vehicle_id": [vehicle_id],
                    "trip_start": [pd.Timestamp(s, unit="us")],
                    "trip_end": [pd.Timestamp(e, unit="us")],
                    "n_points": [n],
                    "max_speed": [mx],
                }
            )
        return

    rows = pd.concat(list(batches), ignore_index=True)
    rows = rows.sort_values("event_ts")
    ts_us = rows["event_ts"].astype("int64") // 1000  # ns → µs
    speeds = rows["speed_kmh"].astype(float)

    completed: list[tuple[str, int, int, int, float]] = []
    if state.exists:
        start_us, end_us, n, mx = state.get
    else:
        start_us = end_us = -1
        n = 0
        mx = 0.0

    for t, sp in zip(ts_us, speeds):
        if start_us < 0:
            start_us, end_us, n, mx = t, t, 1, sp
        elif t - end_us > GAP_SECONDS * 1_000_000:
            completed.append((vehicle_id, start_us, end_us, n, mx))
            start_us, end_us, n, mx = t, t, 1, sp
        else:
            end_us = t
            n += 1
            mx = max(mx, sp)

    state.update((int(start_us), int(end_us), int(n), float(mx)))
    state.setTimeoutDuration(GAP_SECONDS * 1000)

    if completed:
        yield pd.DataFrame(
            {
                "vehicle_id": [c[0] for c in completed],
                "trip_start": [pd.Timestamp(c[1], unit="us") for c in completed],
                "trip_end": [pd.Timestamp(c[2], unit="us") for c in completed],
                "n_points": [c[3] for c in completed],
                "max_speed": [c[4] for c in completed],
            }
        )


def trip_segments(events: DataFrame) -> DataFrame:
    """events(vehicle_id, event_ts, speed_kmh, ...) → closed-trip stream."""
    return (
        events.select("vehicle_id", "event_ts", "speed_kmh")
        .groupBy("vehicle_id")
        .applyInPandasWithState(
            _segment,
            outputStructType=TRIP_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# --- transformWithStateInPandas (Spark 4.x successor API) -----------------

RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("vehicle_id", T.StringType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("max_speed", T.DoubleType()),
        T.StructField("total_speed", T.DoubleType()),
    ]
)


def running_vehicle_stats(events: DataFrame) -> DataFrame:
    """Per-vehicle running aggregates via ``transformWithStateInPandas`` —
    the Spark 4.x arbitrary-stateful API (typed state handles, RocksDB state
    store). Emits the updated running (count, max, sum of speed) per vehicle
    per micro-batch; state is one small ValueState row per active vehicle.

    Requires ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider (the TWS operator rejects the default HDFS
    provider) and the ``protobuf`` package (the TWS Python state-server
    protocol is protobuf-framed; without it the driver worker exits at
    init). Environments lacking protobuf should use :func:`trip_segments`
    (applyInPandasWithState) — same stateful capability, no extra deps."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats",
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("mx", T.DoubleType()),
                        T.StructField("total", T.DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            n, mx, total = (
                self._stats.get() if self._stats.exists() else (0, 0.0, 0.0)
            )
            for pdf in rows:
                speeds = pdf["speed_kmh"].astype(float)
                n += len(pdf)
                mx = max(mx, float(speeds.max()))
                total += float(speeds.sum())
            self._stats.update((int(n), float(mx), float(total)))
            yield pd.DataFrame(
                {
                    "vehicle_id": [key[0]],
                    "n_points": [n],
                    "max_speed": [mx],
                    "total_speed": [total],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("vehicle_id", "speed_kmh")
        .groupBy("vehicle_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningStats(),
            outputStructType=RUNNING_STATS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# --- streaming heavy hitters (sharded Misra-Gries state) ------------------

#: constant per-shard state bound and per-batch emission size
HH_CAP = 1000
HH_EMIT = 20

HH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("token", T.StringType()),
        T.StructField("est_count", T.LongType()),
    ]
)

#: MG summary as parallel arrays — the whole shard state is ≤ HH_CAP entries
HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("toks", T.ArrayType(T.StringType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
    ]
)


def _update_heavy_hitters(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one shard's micro-batch tokens into its Misra-Gries summary
    (exact batch counts merged, then the batched decrement on overflow) and
    emit the shard's current top ``HH_EMIT``. State never exceeds
    ``HH_CAP`` counters regardless of stream length or vocabulary."""
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        return
    if state.exists:
        toks, cnts = state.get
        cnt = pd.Series(list(cnts), index=list(toks), dtype="int64")
    else:
        cnt = pd.Series(dtype="int64")
    for pdf in batches:
        cnt = mg_fold(cnt, pdf["token"].value_counts(), HH_CAP)
    cnt = cnt.astype("int64")
    state.update((list(cnt.index.astype(str)), [int(v) for v in cnt.values]))
    top = cnt.nlargest(HH_EMIT)
    yield pd.DataFrame(
        {
            "shard": [int(key[0])] * len(top),
            "token": top.index.astype(str),
            "est_count": top.values.astype("int64"),
        }
    )


def streaming_heavy_hitters(tokens_stream: DataFrame, n_shards: int = 16) -> DataFrame:
    """Continuously-maintained top tokens over an unbounded stream — the
    streaming twin of ``operators.textops.text_heavy_hitters``. Tokens are
    sharded by hash (a token always lands on the same shard, so per-token
    counts never split); each shard folds its share of every micro-batch
    into a constant-size Misra-Gries summary held in keyed state and emits
    its current top list. The global view is the union of ≤ 16·HH_EMIT tiny
    rows per batch; total state is n_shards · HH_CAP counters — CONSTANT in
    stream length and vocabulary, which is what makes this runnable forever
    on an unbounded feed where exact streaming word count would grow state
    without bound.

    ``tokens_stream`` needs one ``token`` string column."""
    from pyspark.sql import functions as F

    return (
        tokens_stream.withColumn(
            "shard", F.pmod(F.xxhash64("token"), F.lit(n_shards)).cast("int")
        )
        .groupBy("shard")
        .applyInPandasWithState(
            _update_heavy_hitters,
            outputStructType=HH_OUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
