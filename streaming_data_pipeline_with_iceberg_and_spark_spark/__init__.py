"""PySpark-native analytics engine with the capabilities of the reference
``Sanjay-dev-ds/streaming-data-pipeline-with-iceberg-and-spark`` pipeline
(vehicle-GPS streaming ETL -> Iceberg), re-architected Spark-first, plus the
LLM-data-pipeline extension operators (dedup, similarity search, multimodal
columns, text analysis).

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, tuned shuffle partitions)
- ``schemas``    : explicit StructType schemas (ref infers per batch; we don't)
- ``io``         : parquet loaders / view registration for /root/testdata
- ``operators/`` : relational, join, window, agg, set-op, dedup, similarity,
                   text, multimodal query builders (each exposes QUERIES +
                   ORACLES consumed by ``__spark_entry__``)
- ``sources/``   : NDJSON batch+stream sources (reference ETL parity)
- ``streaming/`` : Structured Streaming ingest, windows, stateful ops
- ``plans/``     : explain/plan-inspection helpers

Design rules (100 TB target):
- DataFrame/SQL only; Catalyst plans everything. No driver-side loops.
- Broadcast dimension tables; sort-merge for fact-fact; AQE handles skew.
- Pandas UDFs (Arrow) only where built-ins can't express the op.
"""

__version__ = "0.1.0"
