"""Property-based spot checks (SURVEY.md §5.5, hypothesis).

Invariants that must hold for ANY input, not just the testdata: partial-sum
composition (the algebra that makes map-side combine correct), dedup
idempotence, and join cardinality bounds. Examples are kept small — each runs
a real local Spark job.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

_settings = settings(max_examples=8, deadline=None)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # group key
        st.integers(min_value=-1000, max_value=1000),  # value (int: exact sums)
    ),
    min_size=1,
    max_size=40,
)


@given(data=rows)
@_settings
def test_partial_sum_composition(spark, data):
    """sum of per-group sums == global sum — the invariant behind Spark's
    partial (map-side) aggregation."""
    df = spark.createDataFrame(data, ["k", "v"])
    per_group = df.groupBy("k").agg(F.sum("v").alias("s"))
    total_from_groups = per_group.agg(F.sum("s")).collect()[0][0]
    total_direct = df.agg(F.sum("v")).collect()[0][0]
    assert total_from_groups == total_direct


@given(data=rows)
@_settings
def test_dedup_idempotent(spark, data):
    df = spark.createDataFrame(data, ["k", "v"])
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    assert sorted(once.collect()) == sorted(twice.collect())
    assert once.count() == df.distinct().count()


@given(left=rows, right=rows)
@_settings
def test_join_cardinality_bounds(spark, left, right):
    a = spark.createDataFrame(left, ["k", "v"])
    b = spark.createDataFrame(right, ["k", "w"])
    n_a = a.count()
    assert a.join(b.select("k").distinct(), "k", "left_semi").count() <= n_a
    assert a.join(b.select("k").distinct(), "k", "left_anti").count() <= n_a
    # semi + anti partition A exactly
    assert (
        a.join(b.select("k").distinct(), "k", "left_semi").count()
        + a.join(b.select("k").distinct(), "k", "left_anti").count()
        == n_a
    )


@given(data=rows)
@_settings
def test_union_except_roundtrip(spark, data):
    df = spark.createDataFrame(data, ["k", "v"]).distinct()
    half = df.filter(F.col("v") % 2 == 0)
    rest = df.exceptAll(half)
    assert sorted(half.unionAll(rest).collect()) == sorted(df.collect())
