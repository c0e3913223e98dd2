"""Explicit StructType schemas.

The reference re-infers JSON schema on every micro-batch
(/root/reference/spark-data-pipeline/spark_job.py:109 — no schema argument),
which is both an extra pass over the data and a drift hazard (an all-EV batch
types ``fuel_level`` as null/string). The engine pins schemas explicitly —
also required by ``readStream`` (file sources cannot infer).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The reference producer's record schema
# (/root/reference/producer/gps-tracking-simulation.py:50-82).
# ``timestamp`` is intentionally StringType: the producer emits
# '%Y-%m-%d %H:%M:%S' strings (:58); parsing to TimestampType is an engine
# responsibility (operators/etl enrichment), not an ingest assumption.
GPS_EVENT = T.StructType(
    [
        T.StructField("vehicle_id", T.StringType(), False),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("speed_kmh", T.DoubleType(), True),
        T.StructField("direction", T.StringType(), True),
        T.StructField("fuel_level", T.DoubleType(), True),  # NULL iff EV
        T.StructField("battery_level", T.DoubleType(), True),
        T.StructField("seat_belt_status", T.StringType(), True),
        T.StructField("collision_detected", T.BooleanType(), True),
        T.StructField("sudden_braking", T.BooleanType(), True),
        T.StructField("timestamp", T.StringType(), True),
    ]
)

# S3 ObjectCreated event-notification envelope as delivered via SQS; the
# reference parses it driver-side in Python (spark_job.py:90-100). We model it
# as a nested struct so the parse is a Spark ``from_json`` (P12/P13).
S3_EVENT_ENVELOPE = T.StructType(
    [
        T.StructField(
            "Records",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "s3",
                            T.StructType(
                                [
                                    T.StructField(
                                        "bucket",
                                        T.StructType([T.StructField("name", T.StringType())]),
                                    ),
                                    T.StructField(
                                        "object",
                                        T.StructType([T.StructField("key", T.StringType())]),
                                    ),
                                ]
                            ),
                        )
                    ]
                )
            ),
            True,
        )
    ]
)

# Driver-generated testdata tables (/root/testdata/sf*/<name>.parquet).
# Schemas match the parquet files on disk (see FIXTURES.md §B); loaders pass
# them explicitly so scans skip footer-merge inference and column pruning is
# stable.
TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            # on disk: timestamp[us] (Spark-native). io.load sniffs the parquet
            # footer and, only if a file is TIMESTAMP(NANOS), falls back to a
            # nanosAsLong read + µs conversion — never assumed, always detected.
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = list(TESTDATA)
