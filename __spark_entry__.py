"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``streaming_data_pipeline_with_iceberg_and_spark_spark``;
this module only aggregates each operator module's QUERIES/ORACLES dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
    aggregates,
    analytics,
    arrays,
    dedup,
    eventtime,
    joins,
    multimodal,
    mutations,
    pandas_ops,
    relational,
    sampling,
    setops,
    similarity,
    textops,
    tpch_extra,
    windows,
)


_MODULES = [
    relational,
    tpch_extra,
    joins,
    aggregates,
    windows,
    setops,
    eventtime,
    arrays,
    dedup,
    similarity,
    textops,
    multimodal,
    pandas_ops,
    mutations,
    sampling,
    analytics,
]

# The driver's correctness gate checks roughly the first 50 registry entries
# per round.  Rotated each round so every entry eventually gets a driver row.
# Round 6's window = (a) the 8 entries whose only driver row is r01-era
# (pre-fixture-regeneration) — with these green, every registry entry's
# latest driver row post-dates the regeneration and the stale-signal ledger
# closes; (b) dedup_minhash_lsh and ann_lsh_hyperplane, both upgraded this
# round from rows-only to full value-exact DuckDB oracles (VERDICT r5 #3;
# every hash in each pipeline now md5-derived with pinned seeds) — in-window
# so the driver witnesses the new oracles — plus dedup_semantic, which stays
# rows-only by contract (learned k-means quantizer; impossibility note in
# COVERAGE.md) but gets a fresh row; (c) refresh of the r3-era entries
# (oldest post-regeneration rows), minus agg_hll_mergeable and ann_pq
# (rows-only by contract; a refresh row carries the least new signal),
# window_running_sum and set_union (their families have later green
# sibling rows), to fill the window to exactly 50. NOTE: the op added late
# this round (train_quality_classifier, rows-only by contract) is NOT in
# this window — it has no driver row yet and goes at the head of the
# round-7 window.
_PRIORITY = [
    # (a) last r01-era rows — closing the stale-signal ledger
    "agg_global",
    "agg_conditional",
    "agg_cube",
    "agg_unpivot",
    "join_cross",
    "scalar_math_funcs",
    "hash_funcs",
    "case_when_banding",
    # (b) rows-only -> digest-oracle upgrades this round
    "dedup_minhash_lsh",
    "ann_lsh_hyperplane",
    "mm_feature_extract",
    "dedup_semantic",
    # (c) r3-era refresh (oldest post-regeneration driver rows)
    "agg_collect",
    "array_explode_posexplode",
    "array_funcs",
    "decontaminate_eval_overlap",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "delete_update_orders",
    "distinct_rows",
    "funnel_conversion",
    "join_salted_skew",
    "knn_bruteforce",
    "knn_bruteforce_vectorized",
    "knn_dot_topk",
    "merge_upsert_orders",
    "mm_binary_metadata",
    "mm_content_dedup",
    "mm_frame_sample",
    "mm_patch_token_budget",
    "nested_envelope_parse",
    "pandas_udf_haversine",
    "pii_redact",
    "q12_shipdelay_priority",
    "sample_hash_fraction",
    "sample_stratified_by_lang",
    "sample_temperature_by_lang",
    "set_intersect",
    "sort_limit_topk",
    "split_leakage_free",
    "split_train_val_test",
    "text_chunk_udtf",
    "text_gopher_quality",
    "text_quality_score",
    "text_repeated_ngrams",
    "text_tfidf_top_terms",
    "text_token_stats",
    "text_unigram_logprob",
    "window_topk_per_group",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with a
    date filter, grouped and ordered — exercises scan, pushdown, broadcast +
    sort-merge joins, partial aggregation and ordered output.
    """
    return relational.q5_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, priority first."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    missing = [n for n in _PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"priority entries not implemented: {missing}")
    out = {name: merged[name] for name in _PRIORITY}
    out.update((n, f) for n, f in merged.items() if n not in out)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query; keys absent here are
    intentionally rows-only (non-SQL-expressible ops)."""
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
