"""Registry analysis sweep, second half (names sorted, odd indices).

See tests/test_registry_sweep_a.py for the split rationale and the
covering-partition pin.
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_registry_second_half_analyzes(spark, sf_dir):
    qs = entrymod.queries()
    for name in sorted(qs)[1::2]:
        df = qs[name](spark, sf_dir)
        assert df.columns, name
        assert len(df.columns) == len(set(df.columns)), name
