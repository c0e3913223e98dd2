"""Physical-plan inspection helpers.

The engine's scale guarantees (pushdown reaching the scan, broadcast of
fixed-cardinality dims, ordered-limit instead of global sort, no accidental
cartesian products) live in the Catalyst plan, not the results — these
helpers expose the plan text so tests can regress on it. The reference never
inspects its plans (spark_job.py runs blind); here the plan IS the product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The string ``df.explain(mode)`` would print.

    Frames returned through ``io.checkpoint_release`` are eager
    localCheckpoints whose own plan is an opaque ``Scan ExistingRDD`` —
    the real computation already ran. Those frames carry the source frame
    as ``_spark_graft_source`` so plan audits (and the plan regression
    tests) keep seeing the computation's actual shape rather than the
    checkpoint scan."""
    df = getattr(df, "_spark_graft_source", df)
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


def has_operator(df: DataFrame, op: str) -> bool:
    return op in explain_string(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters lists in the plan's scans."""
    out = []
    for line in explain_string(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip()
            if body and body != "[]":
                out.append(body)
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries — what each parquet scan actually reads."""
    return [
        line.strip().split(":", 1)[1].strip()
        for line in explain_string(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]
