"""Registry analysis sweep, first half (names sorted, even indices).

Every declared query must build a valid plan with duplicate-free column
names (the driver's compare sorts columns by name). Split into two files
(_a/_b) per the round-11 verdict so the halves can be run and timed
independently as the registry grows; together they cover EVERY entry —
test_registry_halves_cover_everything pins the partition.
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def _half(idx: int) -> list[str]:
    return sorted(entrymod.queries())[idx::2]


def test_registry_halves_cover_everything():
    assert set(_half(0)) | set(_half(1)) == set(entrymod.queries())
    assert not set(_half(0)) & set(_half(1))


def test_registry_first_half_analyzes(spark, sf_dir):
    qs = entrymod.queries()
    for name in _half(0):
        df = qs[name](spark, sf_dir)
        assert df.columns, name
        # column names must be duplicate-free for the driver's sorted compare
        assert len(df.columns) == len(set(df.columns)), name
