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


# The full-registry analysis sweep lives in tests/test_registry_sweep_a.py
# and tests/test_registry_sweep_b.py (split per the r11 verdict so the two
# halves can be run — and timed — independently as the registry grows).
