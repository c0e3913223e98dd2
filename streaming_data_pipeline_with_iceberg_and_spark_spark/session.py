"""SparkSession factory.

Mirrors the intent of the reference's ``create_spark_session``
(/root/reference/spark-data-pipeline/spark_job.py:126-145: Iceberg runtime
jars + a ``glue`` catalog) but built for local-first development with a
cluster-ready configuration surface:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing).
- ``spark.sql.shuffle.partitions`` sized for the local core count; on a real
  cluster this is overridden by AQE coalescing + initial partition num.
- UTC session timezone so event-time semantics are deployment-independent.
- Arrow enabled for the Pandas-UDF slow path.
- Iceberg catalog configured ONLY if the runtime jar is actually on the
  classpath (this container ships none); otherwise the engine's table layer
  (``sources.tables``) falls back to a parquet warehouse with the same
  append/overwrite semantics.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def iceberg_runtime_available() -> bool:
    """True if an iceberg-spark-runtime jar is on the Spark classpath."""
    spark_home = os.environ.get("SPARK_HOME")
    candidates = []
    if spark_home:
        candidates += glob.glob(os.path.join(spark_home, "jars", "iceberg-spark-runtime*.jar"))
    try:  # pyspark pip layout
        import pyspark

        candidates += glob.glob(
            os.path.join(os.path.dirname(pyspark.__file__), "jars", "iceberg-spark-runtime*.jar")
        )
    except ImportError:  # pragma: no cover
        pass
    return bool(candidates)


def get_spark(
    app_name: str = "spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = master or (f"local[{cpus}]" if cpus else "local[*]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Static auto-broadcast is OFF; broadcasts happen only via explicit
        # F.broadcast hints (used where boundedness is proven: dims, capped
        # query sets, clamped centroids) or AQE's runtime conversion below.
        # Rationale (measured, round 6 scale proof): Catalyst's static size
        # estimates do not model Generate/explode blowup, and at 100x data it
        # chose to broadcast a 113M-row candidate-pair aggregate (~4.5 GiB)
        # in the Jaccard pipeline, OOMing the driver. AQE converts
        # shuffle joins to broadcast from EXACT post-shuffle sizes instead.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(32 * 1024 * 1024),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
        # INT64 micros instead of legacy INT96: INT96 carries no parquet
        # min/max statistics, which would blind manifest-level file skipping
        # (snapshots.read_where) and row-group skipping on every timestamp
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # escape hatch for TIMESTAMP(NANOS) parquet inputs (unreadable as a
        # Spark timestamp): io.load sniffs the footer unit and only for nanos
        # files reads ts as long + converts to µs. No effect on micros files.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if iceberg_runtime_available():
        wh = warehouse or os.path.join(os.getcwd(), ".warehouse")
        b = (
            b.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config("spark.sql.catalog.local.warehouse", wh)
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
