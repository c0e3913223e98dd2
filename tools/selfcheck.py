"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value representation. Strict by default: values are
stringified (floats via repr of float64) and multisets compared, so anything
that would flip a hash shows up here first.

Usage:
    python tools/selfcheck.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from streaming_data_pipeline_with_iceberg_and_spark_spark.io import TABLE_NAMES
from streaming_data_pipeline_with_iceberg_and_spark_spark.session import get_spark

import __spark_entry__ as entrymod


def canon_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x01".join(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# DuckDB result types that hash differently from Spark's output even when
# values are numerically equal: HUGEINT (SUM of integers), DECIMAL (literal
# arithmetic).  Three rounds lost a query each to this class (q12 most
# recently) — every aggregate in an oracle must be cast to BIGINT/DOUBLE.
_ORACLE_TYPE_BLOCKLIST = ("HUGEINT", "DECIMAL")


def lint_oracle_types(sf_dir: str, only: list[str] | None = None) -> list[str]:
    """Return 'query: column TYPE' for every oracle column whose DuckDB type
    would value-hash differently from Spark. Schema-only: each oracle runs
    wrapped in LIMIT 0, so the lint is cheap at any SF."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    problems = []
    oracles = entrymod.oracle_sql()
    for name in only or list(oracles):
        sql = oracles[name]
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:  # broken SQL shows up in the value check instead
            problems.append(f"{name}: oracle failed to parse: {e}")
            continue
        for col, typ in zip(rel.columns, rel.types):
            if any(b in str(typ).upper() for b in _ORACLE_TYPE_BLOCKLIST):
                problems.append(f"{name}: column {col} is {typ} — cast to BIGINT/DOUBLE")
    return problems


def run(sf_dir: str, only: list[str]) -> int:
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(qs)
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            a, b = canon_rows(scols, srows), canon_rows(ocols, orows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y]
                problems.append(
                    f"values differ in {len(diff)}/{len(a)} rows; first: "
                    f"spark={diff[0][0][:200]!r} oracle={diff[0][1][:200]!r}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok   {name}: match ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(names) - n_fail}/{len(names)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--lint-types", action="store_true",
                    help="schema-only lint: flag HUGEINT/DECIMAL oracle columns")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    if args.lint_types:
        problems = lint_oracle_types(args.sf, args.queries)
        for p in problems:
            print(f"LINT {p}")
        print(f"{len(problems)} type problems")
        sys.exit(1 if problems else 0)
    sys.exit(run(args.sf, args.queries))
