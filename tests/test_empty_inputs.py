"""Empty-input robustness: every declared query must run on zero-row tables.

At 100 TB, empty inputs are not an edge case — a filter can eliminate every
row of a partition, a new table starts empty, a stream's first trigger can be
an empty batch. An operator that crashes on zero rows (typically driver-side
numpy on an empty collect, or a UDF assuming non-empty Arrow batches) is a
production outage, not a test artifact. This sweep runs the FULL queries()
surface against schema-identical zero-row copies of the testdata tables.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        src = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        src.limit(0).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    rows = QUERIES[name](spark, empty_sf_dir).collect()
    # global (no-group) aggregates may legitimately emit one all-null/zero
    # row on empty input; everything else must return cleanly (usually [])
    assert rows is not None
