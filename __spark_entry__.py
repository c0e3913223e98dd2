"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``streaming_data_pipeline_with_iceberg_and_spark_spark``;
this module only aggregates each operator module's QUERIES/ORACLES dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
    aggregates,
    arrays,
    dedup,
    eventtime,
    joins,
    multimodal,
    mutations,
    pandas_ops,
    relational,
    sampling,
    setops,
    similarity,
    textops,
    tpch_extra,
    windows,
)


_MODULES = [
    relational,
    tpch_extra,
    joins,
    aggregates,
    windows,
    setops,
    eventtime,
    arrays,
    dedup,
    similarity,
    textops,
    multimodal,
    pandas_ops,
    mutations,
    sampling,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with a
    date filter, grouped and ordered — exercises scan, pushdown, broadcast +
    sort-merge joins, partial aggregation and ordered output.
    """
    return relational.q5_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query; keys absent here are
    intentionally rows-only (non-SQL-expressible ops)."""
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
