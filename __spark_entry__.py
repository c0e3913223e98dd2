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
    quality,
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
    quality,
]

# The driver's correctness gate checks roughly the first 50 registry entries
# per round.  Rotated each round so every entry eventually gets a driver row.
# After round 13 the latest-row histogram (recomputed from the
# CORRECTNESS_r* ledger at round-14 start) is r9:50, r10:50, r11:50,
# r12:50, r13:50 — zero failures ever recorded as latest state — PLUS six
# entries that landed after the r13 window filled and have NEVER had a
# driver row (cdc_chunk_dedup, events_fano_factor, events_sequence_support,
# events_type_dow_chisq, recommend_ppr, scd2_asof_lookup — all judge-green
# in the r13 verdict's 256/256 selfcheck, recommend_ppr restored to the
# queue per VERDICT r13 "What's wrong" #1 / ADVICE item 1).
# ROUND-14 WINDOW:
# (a) new round-14 entries, inserted at the head as they land;
# (b) the SIX never-driver-checked late-r13 entries — first driver row at
#     the earliest possible window, ahead of everything re-checkable;
# (c) the 50 r9-era rows (now the oldest), ordered so one-of-a-kind
#     surfaces come FIRST and rows whose surface has the strongest
#     fresher same-surface sibling come LAST — each new head entry
#     evicts from the tail, justification inline at the tail block.
# Rows-only entries keep their standing impossibility contracts
# (agg_hll_mergeable: sketch internals; ann_pq / ann_ivf: learned
# quantizers, pinned twins oracle-green; pca_embeddings_project: driver-side
# eigensolver, its distributed input IS the oracle-checked pca_covariance).
#
# ROUND-15 ROTATION PLAN (write the r15 window from this, then recompute
# from the CORRECTNESS_r* ledger as always): head = new r15 ops + any
# entry still without a driver row, then ALL 50 r10-era rows (they become
# the oldest); overflow defers r10 rows with the freshest same-surface
# sibling, justified inline per the r12/r13/r14 discipline.
_PRIORITY = [
    # (a) new round-14 entries land here, at head (uncommented as each
    # lands — queries() hard-fails on names with no implementation)
    "dedup_exact_substr",
    "events_hw_forecast",
    "events_hw_backtest",
    "dedup_clusters_lsh",
    "mix_selection_report",
    "assemble_training_mix",
    "dedup_exact_substr_apply",
    "ql_search",
    "dedup_containment",
    # (b) the six never-driver-checked entries (landed post-r13-window)
    "recommend_ppr",
    "scd2_asof_lookup",
    "cdc_chunk_dedup",
    "events_type_dow_chisq",
    "events_sequence_support",
    "events_fano_factor",
    # (c) the 50 r9-era rows.  One-of-a-kind surfaces first: the agg
    # family (rollup/grouping-sets/pivot/percentiles/stats/count-distinct
    # have no fresher same-surface row), scalar/array/map/json function
    # surfaces, the join-strategy set (broadcast/outer/anti/theta/range/
    # salted-skew — plan-shape surfaces nothing newer covers), schema
    # evolution, cohort retention, and the seasonality/concurrency
    # dashboard trio.
    "filter_project",
    "scalar_date_funcs",
    "json_extraction",
    "array_funcs",
    "map_funcs",
    "join_broadcast_dims",
    "join_left_outer",
    "join_anti",
    "join_theta_band",
    "join_range_shipdelay",
    "join_salted_skew",
    "agg_count_distinct",
    "agg_stats",
    "agg_percentiles",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_approx_distinct",
    "window_rank",
    "histogram_doc_length",
    "q12_shipdelay_priority",
    "cohort_retention",
    "snapshot_schema_evolution_orders",
    "events_hourly_seasonality",
    "events_hourly_anomalies",
    "events_power_users_curve",
    "sessions_peak_concurrency",
    "user_behavior_surprisal",
    "domain_mixture_weights",
    "corpus_source_report",
    "vocab_coverage",
    "session_stats",
    "text_char_entropy",
    "text_zipf_fit",
    "curate_pretraining_corpus",
    # (c)-tail, eviction order for new head entries — strongest fresh
    # same-surface siblings evict first (bottom of this list goes first):
    # matryoshka_recall_eval shares the recall-eval frame machinery with
    # r12-green quantization_recall_eval; item_jaccard_similarity shares
    # the taste-graph edge definition with r12-green item_pagerank and
    # the exact set-overlap math with r13-green dedup_prefix_jaccard;
    # corpus_novelty_curve shares the shingle/first-seen definitions
    # with r12-green decontaminate_split;
    # ann_recall_eval / ann_ivfpq / kmeans_cluster_profile share the
    # pinned-IVF machinery with r13-green label_purity_monitor and
    # r12-green quantization_recall_eval; the dedup family
    # (exact/minhash/simhash/ngram-jaccard/semantic) shares shingle +
    # LSH machinery with r13-green dedup_prefix_jaccard,
    # cdc_chunk_dedup and the r14-head ExactSubstr/containment/
    # clusters-LSH entries; the classifier faces
    # (train/eval/calibration + text_linear_quality_classifier) share
    # the trained-model definition with r12-green classifier_auc_eval
    # and the r14-head mix_selection_report (which scores with the same
    # pinned classifier).
    "matryoshka_recall_eval",
    "item_jaccard_similarity",
    "corpus_novelty_curve",
    "ann_recall_eval",
    "ann_ivfpq",
    "kmeans_cluster_profile",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_semantic",
    "train_quality_classifier",
    "quality_classifier_eval",
    "classifier_calibration",
    "text_linear_quality_classifier",
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
