"""NDJSON sources — the reference's ingest format.

The reference reads NDJSON with per-batch schema inference
(/root/reference/spark-data-pipeline/spark_job.py:109,
``spark.read.option("multiline","false").json(batch_files)``) driven by an
SQS poll loop (poller.py:16-37). Here:

- batch: same read, but with an explicit schema (no inference pass, no
  all-null type drift — SURVEY.md §1.2).
- stream: Structured Streaming file source with ``maxFilesPerTrigger``
  replacing the SQS batch cap (spark_job.py:173) and checkpointing replacing
  delete-after-commit at-least-once (poller.py:39-47) with exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import GPS_EVENT


def read_batch(
    spark: SparkSession,
    paths: list[str] | str,
    schema: T.StructType = GPS_EVENT,
) -> DataFrame:
    """Bounded NDJSON read over an explicit file list (the reference's
    per-micro-batch read, minus the inference pass)."""
    return spark.read.schema(schema).option("multiLine", "false").json(paths)


def read_stream(
    spark: SparkSession,
    directory: str,
    schema: T.StructType = GPS_EVENT,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """Unbounded NDJSON file-source stream over a directory.

    ``maxFilesPerTrigger=10`` mirrors the reference's 10-message SQS poll cap
    (spark_job.py:173); new files are discovered by listing (the S3→SQS
    notification chain collapses into the file source at the engine level).
    """
    return (
        spark.readStream.schema(schema)
        .option("multiLine", "false")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(directory)
    )
