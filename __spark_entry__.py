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
# Round 5's window = (a) the two entries whose array-typed outputs crashed the
# driver's pandas canonicalizer in every prior window, now scalarized
# (VERDICT r4 #1); (b) the 9 round-4 entries that have never had a driver row
# (added after the r4 window was fixed); (c) 39 of the 47 entries whose last
# green driver row predates the fixture regeneration (the r1/r2-era
# relational/TPC-H/join/agg families).  The 8 stale entries that don't fit —
# agg_global, agg_conditional, agg_cube, agg_unpivot, join_cross,
# scalar_math_funcs, hash_funcs, case_when_banding, each family-covered by an
# in-window sibling — carry to round 6 (list restated in COVERAGE.md).
_PRIORITY = [
    # (a) canon-fix re-verifications — ERR in every window they appeared in
    "map_funcs",
    "quantize_embeddings_int8",
    # (b) never driver-checked (added late in round 4)
    "snapshot_positional_delete_orders",
    "snapshot_schema_evolution_orders",
    "snapshot_update_constrained_orders",
    "snapshot_bloom_point_lookup",
    "curate_pretraining_corpus",
    "text_linear_quality_classifier",
    "ann_ivfpq",
    "ann_ivf_index",
    "kmeans_cluster_profile",
    # (c) stale-signal sweep: last driver row r1/r2, fixtures since
    # regenerated.  TPC-H family first (all 17 stale shapes), then agg, join,
    # relational-scalar and misc families.
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "agg_approx_distinct",
    "agg_count_distinct",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_pivot",
    "agg_rollup",
    "agg_stats",
    "join_anti",
    "join_broadcast_dims",
    "join_full_outer",
    "join_left_outer",
    "join_range_shipdelay",
    "join_semi",
    "join_theta_band",
    "filter_project",
    "null_handling",
    "scalar_date_funcs",
    "scalar_string_funcs",
    "histogram_doc_length",
    "json_extraction",
    "top_customers",
    "window_rank",
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
