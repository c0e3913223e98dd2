"""Driver-contract smoke tests: entry(), queries()/oracle_sql() consistency."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns and "n_name" in df.columns


def test_queries_oracles_keys_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must be non-empty"
    # every oracle key must have a query; queries without oracle are allowed
    # (rows-only ops) but should be rare
    assert set(oracles) <= set(qs)


def test_all_queries_run_and_have_stable_schema(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        # column names must be duplicate-free for the driver's sorted compare
        assert len(df.columns) == len(set(df.columns)), name
