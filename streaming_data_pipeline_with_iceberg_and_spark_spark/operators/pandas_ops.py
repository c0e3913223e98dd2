"""Vectorized Python surface (SURVEY.md §2.9): pandas_udf + applyInPandas.

The reference defines no UDFs (all logic is built-in SQL,
/root/reference/spark-data-pipeline/spark_job.py:156-164); this module is the
engine's sanctioned slow path for semantics the built-ins can't express:
Arrow-batched ``pandas_udf`` (never row-at-a-time Python UDFs) and grouped
``applyInPandas`` (the batch-mode UDAF shape; its streaming sibling is
``streaming.stateful.applyInPandasWithState``).

Scale notes: pandas_udf transfers columns as Arrow batches and evaluates with
numpy — ~10-100x over row UDFs, still a JVM→Python hop, so the hot path stays
built-in (see functions/vector.py). applyInPandas shuffles once on the group
key; each group must fit in one worker's memory (user_id groups here are tiny;
a skewed key would need salting upstream).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..io import load, load_spread

_EARTH_RADIUS_KM = 6371.0


def _haversine_udf():
    """Great-circle distance (km) from (0, 0), vectorized over Arrow batches.

    Built lazily — pandas_udf resolves its return type against the active
    SparkSession, so decorating at import time would require one."""

    def _haversine_from_origin(lat: pd.Series, lon: pd.Series) -> pd.Series:
        import numpy as np

        rlat, rlon = np.radians(lat.astype(float)), np.radians(lon.astype(float))
        a = np.sin(rlat / 2) ** 2 + np.cos(rlat) * np.sin(rlon / 2) ** 2
        return pd.Series(
            2 * _EARTH_RADIUS_KM * np.arcsin(np.sqrt(a)), index=lat.index
        )

    return pandas_udf(_haversine_from_origin, T.DoubleType())


def pandas_udf_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: haversine distance for pseudo-coordinates derived
    from the events table (the GPS lat/lon columns of the reference's record
    schema, producer/gps-tracking-simulation.py:54-55, re-expressed on
    testdata). Oracle: same closed form in SQL."""
    # filter BEFORE the spread so the parallelizing shuffle moves only
    # surviving rows (the single-split scan would serialize the Arrow path)
    ev = (
        load(spark, "events", sf_dir)
        .filter(F.col("event_id") % 20 == 0)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    coords = ev.select(
        "event_id",
        (F.pmod(F.col("value"), F.lit(180.0)) - 90.0).alias("lat"),
        (F.pmod(F.col("user_id").cast("double") * 7.0, F.lit(360.0)) - 180.0).alias(
            "lon"
        ),
    )
    return coords.select(
        "event_id",
        F.round(_haversine_udf()("lat", "lon"), 4).alias("dist_km"),
    )


PANDAS_HAVERSINE_SQL = f"""
SELECT event_id,
       ROUND(2 * {_EARTH_RADIUS_KM} * ASIN(SQRT(
           POW(SIN(RADIANS(lat) / 2), 2)
           + COS(RADIANS(lat)) * POW(SIN(RADIANS(lon) / 2), 2))), 4) AS dist_km
FROM (
  SELECT event_id,
         ((value % 180.0) + 180.0) % 180.0 - 90.0 AS lat,
         ((user_id * 7.0 % 360.0) + 360.0) % 360.0 - 180.0 AS lon
  FROM events WHERE event_id % 20 = 0
)
"""


_OLS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("slope", T.DoubleType()),
        T.StructField("intercept", T.DoubleType()),
    ]
)


def _ols(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group OLS of value on event time (seconds since epoch)."""
    x = pdf["ts"].astype("int64") / 1e9  # ns → s
    y = pdf["value"].astype(float)
    n = len(pdf)
    mx, my = x.mean(), y.mean()
    sxx = ((x - mx) ** 2).sum()
    slope = ((x - mx) * (y - my)).sum() / sxx if sxx > 0 else math.nan
    intercept = my - slope * mx if sxx > 0 else math.nan
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n": [n],
            "slope": [round(slope, 6)],
            "intercept": [round(intercept, 2)],
        }
    )


def grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: per-user OLS trend of event value over time — the
    grouped-map UDAF shape (one shuffle on the group key, numpy math inside).
    Oracle: DuckDB regr_slope/regr_intercept."""
    ev = load(spark, "events", sf_dir).filter(F.col("user_id") < 100)
    return (
        ev.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_ols, schema=_OLS_SCHEMA)
        .orderBy("user_id")
    )


GROUPED_OLS_SQL = """
SELECT user_id, COUNT(*) AS n,
       ROUND(REGR_SLOPE(value, EPOCH(ts)), 6) AS slope,
       ROUND(REGR_INTERCEPT(value, EPOCH(ts)), 2) AS intercept
FROM events
WHERE user_id < 100
GROUP BY user_id
ORDER BY user_id
"""


def text_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (§2.9 table-function surface, Spark 4): split each
    document into fixed 16-token chunks via ``LATERAL chunk_doc(text)`` —
    one input row expands to a variable number of output rows with its own
    schema, the shape a lateral explode of a built-in expression can't
    carry custom per-row logic into.

    UDTFs are row-at-a-time Python — the slow path. This entry exists to
    cover the surface; the equivalent hot path is a sequence/slice
    higher-order expression (see ``pack_sequences`` / ``shingles`` for the
    builtin-first pattern). Oracle: DuckDB lateral unnest over list slices."""
    from pyspark.sql.functions import udtf

    import re

    @udtf(returnType="chunk_idx int, chunk string, n_tokens int")
    class ChunkDoc:
        def eval(self, text: str):
            # Mirror the oracle's string_split_regex(lower(trim(text)), '\s+')
            # exactly: trim() strips SPACES only (a trailing \n survives and
            # yields a trailing empty token), and str.split() would drop
            # empty tokens — "" tokenizes to [''] on both sides here — and
            # split on Unicode spaces the RE2/Java '\s' never matches.
            toks = re.split(r"[ \t\n\r\f\v]+", (text or "").lower().strip(" "))
            n_chunks = max((len(toks) + 15) // 16, 1)
            for i in range(n_chunks):
                chunk = toks[i * 16 : (i + 1) * 16]
                yield i, " ".join(chunk), len(chunk)

    spark.udtf.register("chunk_doc", ChunkDoc)
    load(spark, "documents", sf_dir).select("doc_id", "text").filter(
        F.col("doc_id") % 10 == 0
    ).createOrReplaceTempView("_docs_to_chunk")
    return spark.sql(
        "SELECT doc_id, c.chunk_idx, c.chunk, c.n_tokens "
        "FROM _docs_to_chunk, LATERAL chunk_doc(text) AS c"
    )


TEXT_CHUNK_UDTF_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents WHERE doc_id % 10 = 0
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       array_to_string(t[i*16+1 : (i+1)*16], ' ') AS chunk,
       CAST(least(len(t) - i*16, 16) AS INT) AS n_tokens
FROM toks, UNNEST(range(0, greatest(CAST(ceil(len(t) / 16.0) AS BIGINT), 1))) AS u(i)
"""


def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` the events
    props payload once into a VARIANT and extract typed fields with
    ``variant_get`` — the schema-on-read layout for heterogeneous JSON at
    scale (binary-encoded, no per-query re-parse, no rigid StructType).
    Oracle: DuckDB json_extract."""
    ev = load(spark, "events", sf_dir)
    v = F.parse_json("props")
    return (
        ev.withColumn("k", F.variant_get(v, "$.k", "int"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


JSON_VARIANT_SQL = """
SELECT event_type, COUNT(*) AS n,
       ROUND(AVG(CAST(json_extract(props, '$.k') AS INT)), 6) AS avg_k,
       MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
"""


QUERIES = {
    "pandas_udf_haversine": pandas_udf_haversine,
    "grouped_ols_trend": grouped_ols_trend,
    "text_chunk_udtf": text_chunk_udtf,
    "json_variant_extract": json_variant_extract,
}

ORACLES = {
    "pandas_udf_haversine": PANDAS_HAVERSINE_SQL,
    "grouped_ols_trend": GROUPED_OLS_SQL,
    "text_chunk_udtf": TEXT_CHUNK_UDTF_SQL,
    "json_variant_extract": JSON_VARIANT_SQL,
}
