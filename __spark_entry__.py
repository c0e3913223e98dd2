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
    retrieval,
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
    retrieval,
    multimodal,
    pandas_ops,
    mutations,
    sampling,
    analytics,
]

# The driver's correctness gate checks roughly the first 50 registry entries
# per round.  Rotated each round so every entry eventually gets a driver row.
# Round 9's window closes the ledger: after round 8 the latest-row histogram
# was r5:23, r6:49, r7:50, r8:50, never:6 — so this window is
# (a) the SIX entries that have never had a driver row (late round-8 adds,
#     oracle-green in the full-registry selfcheck): vocab_coverage,
#     session_stats, ann_recall_eval, user_behavior_surprisal,
#     quality_classifier_eval, classifier_calibration.  ann_recall_eval's
#     scratch-index build is now shared with ann_ivf_index via the
#     per-session pinned-index memo (similarity._pinned_ivf_index), per the
#     r8 verdict's cost-containment order;
# (b) the TWENTY-THREE r5-era entries (the whole set deferred across r7/r8
#     — after this window no entry's latest row predates r6), including
#     kmeans_cluster_profile which this round upgrades rows-only -> oracle
#     via the pinned-seed quantizer precedent;
# (c) new round-9 entries, inserted at the head as they land;
# (d) the remaining slots filled with the OLDEST r6 rows, preferring
#     families with no fresher same-shape sibling: the TPC-H completion
#     q12, the skew/cross join pair, the agg family (global/unpivot/
#     collect/conditional/cube), set ops, arrays/nested parsing, the whole
#     exact+near-dup dedup family, and cohort_retention (its r7 row went
#     stale this round: the op now rides activity_pairs, excluding
#     anonymous/NULL-ts events, and COHORT_SQL changed in lockstep).
# r6 rows deferred to round 10 (each with a same-shape sibling green in
# r7/r8 or in this window): knn_dot_topk + ann_lsh_hyperplane (<-
# knn_bruteforce in-window, ann_ivf_index r8), pii_redact +
# decontaminate_eval_overlap + text_unigram_logprob + text_gopher_quality +
# text_repeated_ngrams + text_token_stats + text_quality_score +
# text_tfidf_top_terms (<- bm25/prf/perplexity/vocab family r8 + in-window
# classifier trio), mm_* x5 (<- curate_multimodal_corpus r7), pandas_udf_
# haversine + text_chunk_udtf (<- chunk_documents r8), merge_upsert_orders +
# delete_update_orders (<- snapshot mutation rows r8), split/sample x5
# (<- sample family shares the hash-bucket idiom with split_train_val_test,
# timed every round in bench), funnel_conversion (<- funnel_latency r8 and
# the funnel serving faces share its state machine; also timed every round
# in bench), knn_bruteforce (<- knn_bruteforce_vectorized shares the SAME
# oracle string and has an r7 row; timed every round in bench — displaced
# by cohort_retention, whose oracle changed this round), and the five
# displaced by the round-9 head additions: agg_collect + agg_conditional
# (<- agg_cube and agg_global stay in-window; agg_histogram_quantiles r7),
# set_intersect + distinct_rows + sort_limit_topk (<- set_except /
# union_by_name / sort_within_partitions / top_customers all r8),
# agg_unpivot + array_explode_posexplode (<- agg_pivot and array_funcs /
# nested_envelope_parse stay in-window — displaced by the text
# entropy/Zipf pair), agg_global (<- the r8-green TPC-H global aggs
# q6/q14 share the shape — displaced by events_hourly_anomalies),
# join_cross (<- join_theta_band, the other J5 face, heads this window —
# displaced by train_quality_classifier's re-earn row),
# nested_envelope_parse (<- json_extraction in-window, json_variant_
# extract r7 — displaced by domain_mixture_weights), agg_cube
# (<- agg_rollup + agg_grouping_sets in-window, rollup_multi_granularity
# r7 — displaced by corpus_source_report), window_topk_per_group
# (<- top_customers r8 shares the WindowGroupLimit shape + dedicated plan
# test — displaced by corpus_novelty_curve).
_PRIORITY = [
    # (c) new round-9 entries (all value-exact oracles; kmeans_cluster_
    # profile, upgraded this round, is already below among the r5 rows)
    "matryoshka_recall_eval",
    "item_jaccard_similarity",
    "events_hourly_seasonality",
    "events_hourly_anomalies",
    "events_power_users_curve",
    "sessions_peak_concurrency",
    "text_char_entropy",
    "text_zipf_fit",
    "domain_mixture_weights",
    "corpus_source_report",
    "corpus_novelty_curve",
    # train_quality_classifier: upgraded rows-only -> oracle this round
    # with a CHANGED training trajectory (per-epoch parameter rounding),
    # so its r7 row is stale — re-earns a value-hash row here
    "train_quality_classifier",
    # (a) never-driver-checked late round-8 adds
    "vocab_coverage",
    "session_stats",
    "ann_recall_eval",
    "user_behavior_surprisal",
    "quality_classifier_eval",
    "classifier_calibration",
    "filter_project",
    "scalar_date_funcs",
    "json_extraction",
    "join_broadcast_dims",
    "join_left_outer",
    "join_anti",
    "join_theta_band",
    "join_range_shipdelay",
    "histogram_doc_length",
    "agg_count_distinct",
    "agg_stats",
    "agg_percentiles",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_approx_distinct",
    "window_rank",
    "map_funcs",
    "ann_ivfpq",
    "kmeans_cluster_profile",
    "text_linear_quality_classifier",
    "snapshot_schema_evolution_orders",
    "curate_pretraining_corpus",
    "q12_shipdelay_priority",
    "join_salted_skew",
    "array_funcs",
    "dedup_exact",
    "dedup_semantic",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "cohort_retention",
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
