"""Array / map / nested-struct function battery (SURVEY.md §2.2 P13/P14).

The reference's one nested structure (the SQS S3-event envelope,
spark_job.py:90-100) is parsed driver-side in Python; here nested data is a
first-class column type manipulated by higher-order functions. Map-valued
results are always reduced to scalars/sorted arrays before output so the
driver's value-hash is order-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..schemas import S3_EVENT_ENVELOPE


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: size / element_at / slice / contains / higher-order transform,
    filter, aggregate over the embedding arrays."""
    emb = load(spark, "embeddings", sf_dir)
    vec = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(vec, 1), 5).alias("first_elem"),
        F.round(F.element_at(vec, -1), 5).alias("last_elem"),
        F.round(
            F.aggregate(F.slice(vec, 1, 8), F.lit(0.0), lambda a, x: a + x), 5
        ).alias("sum_first8"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(
                F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            ),
            5,
        ).alias("sq_norm"),
        F.round(F.array_max(vec), 5).alias("max_elem"),
        F.round(F.array_min(vec), 5).alias("min_elem"),
    )


ARRAY_FUNCS_SQL = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
SELECT vec_id,
       CAST(len(v) AS INT) AS dim,
       ROUND(v[1], 5) AS first_elem,
       ROUND(v[-1], 5) AS last_elem,
       ROUND(list_sum(v[1:8]), 5) AS sum_first8,
       CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_positive,
       ROUND(list_sum(list_transform(v, x -> x * x)), 5) AS sq_norm,
       ROUND(list_max(v), 5) AS max_elem,
       ROUND(list_min(v), 5) AS min_elem
FROM e
"""


def array_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: posexplode — flatten the first 4 dims of each embedding with
    positions (bounded output)."""
    emb = load(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 100)
    return emb.select(
        "vec_id",
        F.posexplode(
            F.transform(F.slice("embedding", 1, 4), lambda x: F.round(x.cast("double"), 5))
        ).alias("pos", "val"),
    )


ARRAY_EXPLODE_SQL = """
SELECT vec_id,
       CAST(i - 1 AS INT) AS pos,
       ROUND(CAST(embedding[i] AS DOUBLE), 5) AS val
FROM embeddings, unnest(range(1, 5)) AS t(i)
WHERE vec_id < 100
"""


def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: map construction + key/value extraction, reduced to scalars.
    Builds an event_type→count map per user, then extracts sorted keys and
    specific lookups (maps never leave the query as raw columns)."""
    ev = load(spark, "events", sf_dir)
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    return mapped.select(
        "user_id",
        F.array_join(F.array_sort(F.map_keys("type_counts")), ",").alias(
            "types_seen"
        ),
        F.aggregate(
            F.map_values("type_counts"), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("total_events"),
        F.coalesce(F.element_at("type_counts", "purchase"), F.lit(0)).alias(
            "n_purchases"
        ),
        F.size("type_counts").alias("n_types"),
    )


MAP_FUNCS_SQL = """
WITH per_type AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
)
SELECT user_id,
       array_to_string(list_sort(list(event_type)), ',') AS types_seen,
       CAST(SUM(n) AS BIGINT) AS total_events,
       CAST(COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN n END), 0) AS BIGINT) AS n_purchases,
       CAST(COUNT(*) AS INT) AS n_types
FROM per_type
GROUP BY user_id
"""


def nested_envelope_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12/P13: the reference's SQS S3-event envelope parsed IN-ENGINE with
    from_json + explode (vs driver-side Python, spark_job.py:90-100).

    Envelope JSON is synthesized from events rows so the query is
    oracle-checkable; the schema is the real S3 notification shape."""
    ev = load(spark, "events", sf_dir)
    envelope = F.concat(
        F.lit('{"Records": [{"s3": {"bucket": {"name": "bkt-'),
        F.col("event_type"),
        F.lit('"}, "object": {"key": "data/'),
        F.col("event_id").cast("string"),
        F.lit('.json"}}}]}'),
    )
    parsed = ev.select(
        "event_id", F.from_json(envelope, S3_EVENT_ENVELOPE).alias("env")
    )
    rec = parsed.select(
        "event_id", F.explode("env.Records").alias("record")
    )
    return rec.select(
        "event_id",
        F.col("record.s3.bucket.name").alias("bucket"),
        F.col("record.s3.object.key").alias("key"),
        F.concat(
            F.lit("s3a://"), "record.s3.bucket.name", F.lit("/"), "record.s3.object.key"
        ).alias("uri"),
    )


NESTED_ENVELOPE_SQL = """
SELECT event_id,
       'bkt-' || event_type AS bucket,
       'data/' || CAST(event_id AS VARCHAR) || '.json' AS key,
       's3a://bkt-' || event_type || '/data/' || CAST(event_id AS VARCHAR) || '.json' AS uri
FROM events
"""


QUERIES = {
    "array_funcs": array_funcs,
    "array_explode_posexplode": array_explode_posexplode,
    "map_funcs": map_funcs,
    "nested_envelope_parse": nested_envelope_parse,
}

ORACLES = {
    "array_funcs": ARRAY_FUNCS_SQL,
    "array_explode_posexplode": ARRAY_EXPLODE_SQL,
    "map_funcs": MAP_FUNCS_SQL,
    "nested_envelope_parse": NESTED_ENVELOPE_SQL,
}
