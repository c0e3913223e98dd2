"""Operator library.

Each module exposes two module-level dicts consumed by ``__spark_entry__``:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — DuckDB-runnable ANSI SQL twins; a key present
  in QUERIES but absent here is intentionally rows-only (non-SQL-expressible).

Conventions that make the driver's order-insensitive value-hash compare pass:

- Every computed column is aliased identically in Spark and SQL.
- Floating aggregates are rounded identically on both sides (sum order across
  partitions is otherwise not bit-stable).
- DuckDB ``SUM(INTEGER)`` returns HUGEINT — oracles cast to BIGINT/DOUBLE to
  match Spark result types.
- Top-k queries always order by a unique tiebreaker so LIMIT is deterministic.
"""

from __future__ import annotations
