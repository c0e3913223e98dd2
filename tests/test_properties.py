"""Property-based spot checks (SURVEY.md §5.5, hypothesis).

Invariants that must hold for ANY input, not just the testdata: partial-sum
composition (the algebra that makes map-side combine correct), dedup
idempotence, and join cardinality bounds. Examples are kept small — each runs
a real local Spark job.

Example counts follow the SNAPSHOT_FUZZ_EXAMPLES discipline: the default
profile is LEAN (PROPERTY_EXAMPLES=4 — these invariants are exact algebra,
so a counterexample class almost always shows at tiny sizes), and the
per-round deep soak re-runs the file with PROPERTY_EXAMPLES=12+.
"""

from __future__ import annotations

import os

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

_N_EXAMPLES = int(os.environ.get("PROPERTY_EXAMPLES", "4"))
_settings = settings(max_examples=_N_EXAMPLES, deadline=None)

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


def test_split_assignment_invariants(spark, sf_dir):
    """Deterministic split: total partition, stable across runs, bucket↔split
    agreement, and growth-stability (a subset's assignments are unchanged)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.sampling import (
        split_train_val_test,
    )

    out = split_train_val_test(spark, sf_dir)
    rows = out.collect()
    n = len(rows)
    assert n > 0
    by_split = {}
    for r in rows:
        by_split.setdefault(r.split, 0)
        by_split[r.split] += 1
        expected = "train" if r.bucket < 80 else ("val" if r.bucket < 90 else "test")
        assert r.split == expected
    assert set(by_split) <= {"train", "val", "test"}
    assert sum(by_split.values()) == n  # total partition, no overlap/loss
    # growth stability: restricting the corpus must not reassign anyone
    subset = {
        r.doc_id: r.split
        for r in split_train_val_test(spark, sf_dir)
        .filter(F.col("doc_id") % 3 == 0)
        .collect()
    }
    full = {r.doc_id: r.split for r in rows}
    assert all(full[d] == s for d, s in subset.items())


def test_pack_sequences_invariants(spark, sf_dir):
    """Packing: offsets in [0, CTX); packs fill contiguously per language
    (pack_id never decreases along doc_id order; consecutive docs' offsets
    chain: next_offset == (offset + n_tokens) mod arithmetic on the stream)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.sampling import (
        _CTX,
        pack_sequences,
    )

    rows = pack_sequences(spark, sf_dir).collect()
    assert rows
    by_lang = {}
    for r in rows:
        assert 0 <= r.pack_offset < _CTX
        assert r.pack_id >= 0
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.pack_id == cum // _CTX, (lang, r)
            assert r.pack_offset == cum % _CTX, (lang, r)
            cum += r.n_tokens


def test_discrete_median_strategies_match_python_oracle(spark):
    """All three exact-median plans (windowed ranking, value-histogram,
    quantile-literal slices) must agree with a pure-Python reference on
    adversarial inputs: heavy ties, NULLs (sort first), single-row groups,
    even/odd group sizes, negative values."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
        analytics,
    )
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        _disc_median_hist,
        _disc_median_select,
        _disc_median_window,
    )

    val = st.one_of(st.none(), st.sampled_from([-2.0, -0.5, 0.0, 0.5, 1.0, 3.5]))
    rows_strategy = st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), val),
        min_size=1,
        max_size=40,
    )

    @settings(
        max_examples=_N_EXAMPLES + _N_EXAMPLES // 2,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=rows_strategy)
    def check(rows):
        data = [(i, g, v) for i, (g, v) in enumerate(rows)]
        df = spark.createDataFrame(data, "event_id long, grp string, value double")
        # python reference: rank ⌈n/2⌉ in (value, id) order, None first
        expect = {}
        for g in {r[1] for r in data}:
            grp_rows = sorted(
                ((v, i) for i, gg, v in data if gg == g),
                key=lambda t: (t[0] is not None, t[0], t[1]),
            )
            expect[g] = grp_rows[(len(grp_rows) + 1) // 2 - 1][0]
        saved = analytics._MAD_HIST_MAX_DISTINCT
        try:
            for fn, label in (
                (_disc_median_window, "window"),
                (_disc_median_hist, "hist"),
                (_disc_median_select, "select-hist-routed"),
                (_disc_median_select, "select-sliced"),
            ):
                # last round: forbid the hist routing so the quantile-slice
                # branch itself is exercised on tied/NULL-heavy data
                analytics._MAD_HIST_MAX_DISTINCT = (
                    -1 if label == "select-sliced" else saved
                )
                got = {
                    r["grp"]: r["med"]
                    for r in fn(df, "grp", "event_id", "value", "med").collect()
                }
                assert got == expect, (label, got, expect, data)
        finally:
            analytics._MAD_HIST_MAX_DISTINCT = saved

    check()


_vec = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=3,
    max_size=3,
)
_vec_batches = st.lists(
    st.lists(_vec, min_size=0, max_size=8), min_size=1, max_size=3
)


@given(batches=_vec_batches)
@_settings
def test_pca_moment_merge_equals_single_pass(spark, batches):
    """PCA sufficient statistics are sums: merging per-batch (pos, v)
    partials must finalize to the same fit as one pass over all rows — the
    algebra start_incremental_pca_ingest relies on. Eigenvectors are skipped
    (random data can have degenerate eigenvalue clusters); n/mean/cov/
    eigenvalues pin the fit."""
    import numpy as np

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        _pca_finalize_rows,
        pca_moment_partials,
    )

    from hypothesis import assume

    all_rows = [v for b in batches for v in b]
    assume(len(all_rows) >= 2)
    schema = "embedding array<double>"

    def partials(rows):
        return pca_moment_partials(
            spark.createDataFrame([(v,) for v in rows], schema)
        )

    merged = None
    for b in batches:
        if not b:
            continue
        p = partials(b)
        merged = p if merged is None else merged.unionByName(p)
    inc = _pca_finalize_rows(
        merged.groupBy("d", "pos").agg(F.sum("v").alias("v")).collect()
    )
    ref = _pca_finalize_rows(partials(all_rows).collect())
    assert inc[0] == ref[0] == len(all_rows)
    assert np.allclose(inc[1], ref[1], atol=1e-9)  # mean
    assert np.allclose(inc[2], ref[2], atol=1e-7)  # cov
    assert np.allclose(inc[3], ref[3], atol=1e-6)  # eigenvalues


@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=128), min_size=1, max_size=25
    ),
    nb=st.integers(min_value=1, max_value=4),
)
@_settings
def test_next_fit_packing_invariants(spark, sizes, nb):
    """For ANY chunk-size multiset and bucket count, the atomic next-fit
    packer must (a) assign every chunk exactly once (conservation),
    (b) never overflow the budget within a sequence, and (c) replay the
    greedy rule exactly in md5 order per bucket."""
    import hashlib

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        _PACK_BUDGET,
        pack_chunks_next_fit,
    )

    chunks = spark.createDataFrame(
        [(0, i, n) for i, n in enumerate(sizes)],
        "doc_id long, chunk_idx int, chunk_tokens int",
    )
    got = {
        (r.bucket, r.chunk_idx): (r.seq, r.chunk_tokens)
        for r in pack_chunks_next_fit(chunks, nb).collect()
    }
    assert len(got) == len(sizes)
    # python replay, bucket-by-bucket in md5 order
    by_bucket = {}
    for i, n in enumerate(sizes):
        h = hashlib.md5(f"0:{i}".encode()).hexdigest()
        b = int(h[:4], 16) % nb
        by_bucket.setdefault(b, []).append((h, i, n))
    want = {}
    for b, items in by_bucket.items():
        fill, seq = 0, -1
        for _h, i, n in sorted(items):
            if seq < 0 or fill + n > _PACK_BUDGET:
                seq, fill = seq + 1, n
            else:
                fill += n
            want[(b, i)] = (seq, n)
    assert got == want
