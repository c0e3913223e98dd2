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
# After round 12 the latest-row histogram (recomputed from the
# CORRECTNESS_r* ledger at round-13 start) is r8:35, r9:50, r10:50, r11:50,
# r12:50 — zero failures ever recorded as latest state, no never-checked
# entries.  ROUND-13 WINDOW (executes the written r13 rotation plan):
# (a) new round-13 entries, inserted at the head as they land;
# (b) ALL 35 remaining r8-era rows — every row the r12 head displaced
#     (q9/q10/q13/q14/q15/q18/q19/q22, recommend_items, session_top_paths,
#     the three snapshot rows, basket_association_rules,
#     events_item_cooccurrence, null_handling, attribution_last_touch,
#     chunk_documents, mine_triplets), the six rows deferred outright since
#     r12 (q5_revenue_by_nation, set_except, union_by_name,
#     sort_within_partitions, bm25_prf_search, window_first_last), and the
#     ten earlier r11-eviction deferrals (scalar_string_funcs,
#     q6_forecast_revenue, top_customers, events_rfm_segments,
#     item_communities, item_triangles, mmr_search, retrieval_eval,
#     quantize_embeddings_int8, text_perplexity_bigram).
#     35 + up to 15 new head entries = the 50-slot window; after r13 NO
#     entry's latest driver row predates r9.  Ordering within (b): the
#     displaced TPC-H family and one-of-a-kind surfaces FIRST (no fresh
#     sibling covers them), rows whose surface has an r10+-green sibling
#     LAST so a 16th+ new head entry evicts the row with the strongest
#     fresher same-surface sibling (eviction justifications inline below).
# Rows-only entries keep their standing impossibility contracts
# (agg_hll_mergeable: sketch internals; ann_pq / ann_ivf: learned
# quantizers, pinned twins oracle-green; pca_embeddings_project: driver-side
# eigensolver, its distributed input IS the oracle-checked pca_covariance).
#
# ROUND-14 ROTATION PLAN (write the r14 window from this, then recompute
# from the CORRECTNESS_r* ledger as always): after r13's window the
# latest-row histogram is r9:50, r10:50, r11:50, r12:50, r13:50 — head =
# new r14 ops as they land, then ALL 50 r9-era rows (they become the
# oldest); new-op overflow defers r9 rows whose surface has the freshest
# same-surface sibling, justified inline per the r12/r13 discipline.
_PRIORITY = [
    # (a) new round-13 entries land here, at head (uncommented as each
    # lands — queries() hard-fails on names with no implementation)
    "pack_training_sequences",
    "train_unigram_lm",
    "unigram_lm_segment",
    "label_purity_monitor",
    "write_training_shards",
    "user_survival_km",
    "text_textrank_keywords",
    "experiment_did_eval",
    "chunk_cdc",
    "events_daily_autocorr",
    "tokenizer_fertility_compare",
    "dedup_prefix_jaccard",
    "text_keyphrase_rake",
    # (b) the 35 r8-era rows.  One-of-a-kind surfaces + the displaced
    # TPC-H family first:
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "top_customers",
    "null_handling",
    "scalar_string_funcs",
    "set_except",
    "union_by_name",
    "sort_within_partitions",
    "window_first_last",
    "bm25_prf_search",
    "chunk_documents",
    "text_perplexity_bigram",
    "attribution_last_touch",
    "session_top_paths",
    "basket_association_rules",
    "events_item_cooccurrence",
    "events_rfm_segments",
    "recommend_items",
    "mine_triplets",
    "item_communities",
    "item_triangles",
    "snapshot_bloom_point_lookup",
    "snapshot_positional_delete_orders",
    "snapshot_update_constrained_orders",
    "quantize_embeddings_int8",
    "mmr_search",
    "retrieval_eval",
    # (c) the 50th window slot: 14 head entries + 35 r8 rows = 49, so
    # exactly one more r13 op fits without evicting any rotation row
    "events_holt_forecast",
    # r14-queue: landed post-window, self-verified green at 3 SFs; the
    # r14 rotation picks these up first
    "markov_entropy_rate",
    "scd2_asof_lookup",
    "cdc_chunk_dedup",
    "events_type_dow_chisq",
    "events_sequence_support",
    "events_fano_factor",
    # (b)-tail displacement order, for a 16th+ new head entry: the last
    # rows above have the strongest fresh same-surface siblings —
    # retrieval_eval / mmr_search (retrieval family, hybrid_search_rrf
    # r12-green on the shared top-k frames), quantize_embeddings_int8
    # (its quantizer expressions ARE the r12-green
    # quantization_recall_eval's shared definition), the three snapshot
    # rows (snapshot_changelog_orders r12-green + snapshot_time_travel
    # r11-green on the same table machinery), item_triangles /
    # item_communities (taste-graph family, item_pagerank r12-green on
    # the shared edge definition).
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
