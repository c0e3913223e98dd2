"""Fixture-ingest sanity gate.

Round 3 shipped 203 green tests while 8 driver rows were red, because the
loader silently mis-parsed the regenerated events.parquet timestamp unit
(micros read as nanos → every event time shrunk 1000×) and nothing asserted
the loaded fixtures carry sane absolute values. These tests compare the
engine's `io.load` output against DuckDB reading the *same files* — any
unit/encoding drift between a regenerated fixture and the pinned schemas
fails here before it can reach the driver's correctness gate.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
from tests.conftest import SF_DIR


def _duck_minmax(table: str, col: str):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    return duckdb.sql(
        f"select min({col}), max({col}), count(*) from '{path}'"
    ).fetchone()


@pytest.mark.parametrize(
    "table,col",
    [
        ("events", "ts"),
        ("orders", "o_orderdate"),
        ("lineitem", "l_shipdate"),
    ],
)
def test_temporal_columns_match_duckdb(spark, table, col):
    """min/max/count of every temporal column must equal DuckDB's on the
    same parquet file — catches any unit, timezone, or logical-type drift."""
    import pyspark.sql.functions as F

    row = (
        load(spark, table, SF_DIR)
        .agg(F.min(col).alias("mn"), F.max(col).alias("mx"), F.count("*").alias("n"))
        .collect()[0]
    )
    omn, omx, on = _duck_minmax(table, col)
    assert (row["mn"], row["mx"], row["n"]) == (omn, omx, on), (
        f"{table}.{col}: spark=({row['mn']}, {row['mx']}, {row['n']}) "
        f"duckdb=({omn}, {omx}, {on})"
    )


def test_events_ts_in_generation_epoch(spark):
    """Event times must be plausible absolute dates (the generation era),
    not epoch-1970 artifacts of a unit mix-up."""
    import pyspark.sql.functions as F

    row = load(spark, "events", SF_DIR).agg(
        F.min(F.year("ts")).alias("y0"), F.max(F.year("ts")).alias("y1")
    ).collect()[0]
    assert 2000 <= row["y0"] <= row["y1"] <= 2100, row


def test_oracle_types_hashable():
    """No oracle column may come back from DuckDB as HUGEINT/DECIMAL — those
    stringify differently from Spark's BIGINT/DOUBLE and fail the driver's
    value-hash even when numerically equal (q12 was lost to this in r2).
    Schema-only (LIMIT 0), so it is cheap."""
    from tools.selfcheck import lint_oracle_types

    assert lint_oracle_types(SF_DIR) == []


def test_events_family_selfcheck(spark):
    """Run the driver-style Spark-vs-DuckDB compare over the event-time
    query family — the rows that went red in round 3.  Uses the same
    canonicalization as tools/selfcheck.py (order-insensitive multiset of
    stringified cells, columns sorted by name)."""
    import __spark_entry__ as entrymod
    from tools.selfcheck import canon_rows

    family = [
        "sessionize",
        "window_tumbling_5min",
        "window_session_30min",
        "cohort_retention",
        "resample_ffill_1min",
        "join_asof",
    ]
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    from streaming_data_pipeline_with_iceberg_and_spark_spark.schemas import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    failures = []
    for name in family:
        sdf = qs[name](spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        if len(srows) != len(orows):
            failures.append(f"{name}: rows spark={len(srows)} oracle={len(orows)}")
            continue
        if canon_rows(sdf.columns, srows) != canon_rows(ocols, orows):
            failures.append(f"{name}: values differ")
    assert not failures, failures
