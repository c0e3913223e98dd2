#!/usr/bin/env python
"""Benchmark harness: times the engine's headline queries at one scale factor.

Contract (driver): run on ``local[$SPARK_GRAFT_CPUS]`` against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) and print exactly
ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {"q1": s, ...}, "sf": 0.1}

Each query is forced with a ``noop``-format write so the full plan executes on
executors without driver-side collect overhead — the same way throughput would
be measured on a real cluster. A warm-up run of the flagship query amortizes
JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# Headline set: one representative per operator family (scan+agg, joins incl.
# as-of, windows, sessionization, rollup, dedup incl. MinHash, similarity,
# text, arrays). Keep this list stable across rounds so BENCH_r{N}.json files
# are comparable.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_volume_orders",
    "join_broadcast_dims",
    "join_asof",
    "agg_rollup",
    "window_moving_avg",
    "window_topk_per_group",
    "sessionize",
    "window_tumbling_5min",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "knn_bruteforce_vectorized",
    "text_tfidf_top_terms",
    # Appended round 2 (append-only so earlier BENCH_r{N}.json stay
    # comparable): the iterative CC path, IVF ANN, MERGE/CoW mutation,
    # sampling/split projection.
    "dedup_clusters",
    "ann_ivf",
    "merge_upsert_orders",
    "split_train_val_test",
    "ann_pq",
    "funnel_conversion",
    "decontaminate_eval_overlap",
    # Appended round 4: mergeable quantile sketch, robust anomaly scan,
    # int8 embedding compression.
    "agg_histogram_quantiles",
    "events_anomaly_mad",
    "quantize_embeddings_int8",
    "text_heavy_hitters",
    "q21_waiting_suppliers",
    "ann_ivfpq",
    "kmeans_cluster_profile",
    # Appended round 4, second segment: the partsupp-free TPC-H completions
    # and the end-to-end curation capstone.
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q20_excess_share_suppliers",
    "curate_pretraining_corpus",
    # Appended round 7: BM25 ranked retrieval and the distributed-PCA pair
    # (moment-pass covariance + GEMM projection).
    "bm25_search",
    "pca_covariance",
    "pca_embeddings_project",
    # Appended round 7, second segment: the rest of the TPC-H-22 shape set,
    # so every round's BENCH times the full 22-query suite.
    "q4_order_priority",
    "q9_product_profit",
    "q12_shipdelay_priority",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    # Appended round 7, third segment: the media-curation capstone.
    "curate_multimodal_corpus",
    # Appended round 8: hybrid BM25+dense RRF retrieval capstone, the
    # bigram-LM perplexity scorer, and the RAG/pretraining chunker.
    "hybrid_search_rrf",
    "text_perplexity_bigram",
    "chunk_documents",
    "mine_triplets",
    "events_item_cooccurrence",
    "events_markov_transitions",
    "item_pagerank",
    "events_rfm_segments",
    "item_communities",
    # Appended round 8, second segment: journey-path mining, last-touch
    # attribution, rolling engagement, and association-rule mining.
    "session_top_paths",
    "attribution_last_touch",
    "events_dau_wau_mau",
    "basket_association_rules",
    # Appended round 8, third segment: MMR-diversified retrieval,
    # item-based collaborative-filtering recommendations, and the
    # retrieval-quality eval harness.
    "mmr_search",
    "recommend_items",
    "retrieval_eval",
    "item_triangles",
    "funnel_latency",
    "bm25_prf_search",
    "vocab_coverage",
    "session_stats",
    "user_behavior_surprisal",
    "quality_classifier_eval",
    "classifier_calibration",
    # Appended round 9: truncated-dim retrieval eval, Jaccard item
    # similarity, the seasonality/concentration/concurrency dashboard
    # trio. (kmeans_cluster_profile, already timed above, switched to the
    # fold-exact pinned fit this round — its series steps up ~2×.)
    "matryoshka_recall_eval",
    "item_jaccard_similarity",
    "events_hourly_seasonality",
    "events_power_users_curve",
    "sessions_peak_concurrency",
    "text_char_entropy",
    "text_zipf_fit",
    "events_hourly_anomalies",
    "train_quality_classifier",
    "domain_mixture_weights",
    "corpus_source_report",
    "corpus_novelty_curve",
    # Appended round 10: quality-based cluster representative pick,
    # quality-proportional sampling, signed feature hashing.
    "dedup_representative_pick",
    "quality_weighted_sample",
    "text_hashing_vectorizer",
    # Appended round 11: data-quality audits, growth accounting, CUSUM
    # changepoint, PMI collocations.
    "table_profile",
    "referential_integrity_audit",
    "events_user_lifecycle",
    "events_cusum_changepoint",
    "text_pmi_collocations",
    "events_value_quantiles",
    "lang_id_confusion",
    "embedding_norm_audit",
    "abc_pareto_parts",
    "data_freshness_audit",
    "events_coverage_audit",
    "dedup_cluster_size_histogram",
    "dedup_lsh_recall_eval",
    "curation_waterfall",
    # Appended round 12: in-engine BPE merge training + its learned-table
    # apply face (one shared memoized training run), and the dataset
    # decontamination/leakage pair.
    "train_bpe_merges",
    "bpe_apply_merges",
    "decontaminate_split",
    "split_leakage_audit",
    # Appended round 12, second segment: the quantization leg of the
    # recall-budget triad and the merge-table compression curve.
    "quantization_recall_eval",
    "bpe_compression_curve",
    # Appended round 12, third segment: training-data assembly faces —
    # leakage-safe point-in-time features and deterministic negatives.
    "point_in_time_features",
    "negative_sampling_uniform",
    "label_balance_audit",
    "embedding_drift_audit",
    # Appended round 12, fourth segment: threshold-free classifier AUC,
    # chance-corrected lang-ID agreement, per-source unigram drift, and
    # the sampled kNN label-noise audit.
    "classifier_auc_eval",
    "lang_id_kappa",
    "source_unigram_divergence",
    "label_knn_purity",
    # Appended round 12, fifth segment: readability, the seasonal-naive
    # forecast backtest, and linear multi-touch attribution.
    "text_readability",
    "events_forecast_backtest",
    "attribution_linear",
    # Appended round 12, sixth segment: blocked record linkage.
    "entity_match_candidates",
    # Appended round 12, seventh segment: shuffle-skew diagnosis and
    # header-vs-lines reconciliation.
    "join_key_skew_audit",
    "order_reconciliation_audit",
    # Appended round 12, eighth segment: transitive entity clusters.
    "entity_resolution_groups",
    # Appended round 12, ninth segment: experimentation readouts.
    "experiment_ab_eval",
    "touch_conversion_intervals",
    "experiment_cuped_eval",
    # Appended round 12, eleventh segment: SCD2 dimension versioning.
    "scd2_from_events",
    # Appended round 12, twelfth segment: full-corpus IVF label purity.
    "label_purity_ivf_audit",
    # Appended round 12, thirteenth segment: cohort LTV triangle.
    "customer_ltv_cohorts",
    # Appended round 12, fourteenth segment: exact-median data repair.
    "impute_events_value",
    # Appended round 12, fifteenth segment: weekly categorical mix drift.
    "events_type_mix_drift",
    # Appended round 13: dataset-assembly tail (packing, shards), the
    # unigram tokenizer family + the bake-off face, the capped purity
    # monitor, survival/DiD/autocorr analytics, CDC chunking, the
    # prefix-filtered exact similarity join, RAKE/TextRank keywords and
    # personalized-PageRank recs.
    "pack_training_sequences",
    "train_unigram_lm",
    "unigram_lm_segment",
    "tokenizer_fertility_compare",
    "label_purity_monitor",
    "write_training_shards",
    "user_survival_km",
    "experiment_did_eval",
    "events_daily_autocorr",
    "chunk_cdc",
    "dedup_prefix_jaccard",
    "text_textrank_keywords",
    "text_keyphrase_rake",
    "recommend_ppr",
    "events_holt_forecast",
    "markov_entropy_rate",
    "scd2_asof_lookup",
    "cdc_chunk_dedup",
    "events_type_dow_chisq",
    "events_sequence_support",
    "events_fano_factor",
    # Appended round 14: ExactSubstr maximal repeated-span manifest (the
    # exactness twin of the CDC chunk dedup), and the Holt-Winters
    # weekly-seasonal pair completing the ETS family.
    "dedup_exact_substr",
    "events_hw_forecast",
    "events_hw_backtest",
    # Appended round 14, second segment: the signature-agreement cluster
    # batch face (twin of the seventeenth incremental path).
    "dedup_clusters_lsh",
    # Appended round 14, third segment: the end-to-end training-mix
    # assembly capstone and its selection-stage report.
    "mix_selection_report",
    "assemble_training_mix",
    # Appended round 14, fourth segment: the ExactSubstr trim executor.
    "dedup_exact_substr_apply",
    # Appended round 14, fifth segment: Dirichlet query-likelihood
    # retrieval from the shared materialized index.
    "ql_search",
    # Appended round 14, sixth segment: asymmetric containment pairs.
    "dedup_containment",
    # Appended round 15 (the interrupted build wave's entries, added in the
    # optimization round so the driver's scaling runs see them; the stdout
    # line still carries only the frozen 39-query prefix): span-level
    # decontamination trio, Hamming kNN pair, robust trend/CI/topic/
    # sampling/similarity/retrieval faces, burst detection, attribution
    # pair, proximity ranking, Welch/Benford audits, PPMI, interval join.
    "decontaminate_spans",
    "decontamination_report",
    "decontaminate_spans_apply",
    "knn_hamming",
    "ann_hamming_rerank",
    "events_theil_sen_trend",
    "bootstrap_ci_order_value",
    "text_topic_plsa",
    "topic_mixture_by_source",
    "sample_neyman_allocation",
    "item_simrank",
    "bm25_champion_search",
    "events_forecast_conformal",
    "events_burst_kleinberg",
    "attribution_markov_removal",
    "attribution_shapley",
    "proximity_min_window",
    "experiment_welch_ttest",
    "benford_digit_audit",
    "text_ppmi_similarity",
    "join_session_overlap",
]

# The cross-round-comparable stdout set: the stable-21 anchor subset plus the
# r4-era extension, FROZEN as an explicit literal (r9 advice: the old
# HEADLINE[:39] slice would silently redefine the comparable series if a
# future edit inserted rather than appended). The assert below makes any
# reordering of the frozen prefix fail loudly instead.
STABLE_QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_volume_orders",
    "join_broadcast_dims",
    "join_asof",
    "agg_rollup",
    "window_moving_avg",
    "window_topk_per_group",
    "sessionize",
    "window_tumbling_5min",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "knn_bruteforce_vectorized",
    "text_tfidf_top_terms",
    "dedup_clusters",
    "ann_ivf",
    "merge_upsert_orders",
    "split_train_val_test",
    "ann_pq",
    "funnel_conversion",
    "decontaminate_eval_overlap",
    "agg_histogram_quantiles",
    "events_anomaly_mad",
    "quantize_embeddings_int8",
    "text_heavy_hitters",
    "q21_waiting_suppliers",
    "ann_ivfpq",
    "kmeans_cluster_profile",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q20_excess_share_suppliers",
    "curate_pretraining_corpus",
)
assert list(STABLE_QUERIES) == HEADLINE[: len(STABLE_QUERIES)], (
    "the frozen stdout prefix no longer matches HEADLINE — HEADLINE must "
    "stay append-only to keep BENCH_r{N}.json series comparable"
)


def _force(df) -> None:
    """Execute the full plan without materializing rows on the driver."""
    df.write.format("noop").mode("overwrite").save()


# Ambient-load self-qualification (r13 verdict: BENCH_r13.json shipped
# ~1.3×-inflated under hypervisor noise and the caveat lived only in
# COVERAGE.md prose).  The bench now measures the box itself and stamps
# the result INTO the JSON so a noisy artifact can't masquerade as a
# regression — or as the absence of one.
_AMBIENT_LOAD1_MAX = 2.0  # 1-min load tolerated on a 32-core box pre-run
_STEAL_PCT_MAX = 2.0  # hypervisor steal over the bench interval


def _cpu_times() -> tuple[int, int]:
    """(steal jiffies, total jiffies) from /proc/stat; (0, 0) if absent.

    Total sums only user..steal (fields 1-8): guest/guest_nice are
    already folded into user/nice on Linux, so including them would
    double-count and understate steal_pct, loosening the clean_run
    gate."""
    try:
        with open("/proc/stat") as f:
            fields = f.readline().split()
        vals = [int(x) for x in fields[1:9]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def _ambient_gate() -> float:
    """Wait briefly for ambient load to settle; return the load1 we start at.

    Bounded: at most two 15 s waits, then proceed regardless (the flag in
    the JSON, not the wait, is the contract)."""
    load1 = os.getloadavg()[0]
    for _ in range(2):
        if load1 <= _AMBIENT_LOAD1_MAX:
            break
        print(
            f"bench: ambient load1={load1:.1f} > {_AMBIENT_LOAD1_MAX}; "
            "waiting 15s for the box to settle",
            file=sys.stderr,
        )
        time.sleep(15)
        load1 = os.getloadavg()[0]
    return load1


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from streaming_data_pipeline_with_iceberg_and_spark_spark.session import get_spark
    import __spark_entry__ as entry_mod

    load1_before = _ambient_gate()
    load_before = os.getloadavg()
    steal0, total0 = _cpu_times()

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # Warm-up: JVM, codegen, parquet footer caches.
    _force(qs["q5_revenue_by_nation"](spark, sf_dir))
    # Warm Python workers: the per-core worker fork + Arrow init is cluster
    # startup cost, not per-query cost — a long-lived cluster holds warm
    # workers. Touch every core once with a no-op mapInPandas.
    cores = spark.sparkContext.defaultParallelism
    _force(
        spark.range(cores * 4, numPartitions=cores).mapInPandas(
            lambda it: it, "id long"
        )
    )

    # Steady-state timing: run each query once unmeasured (Catalyst analysis
    # + whole-stage codegen JIT compile happen on first execution and are
    # per-PLAN, not per-data — on a long-lived cluster crunching 100 TB they
    # amortize to zero), then time the second run. Cold first-run totals are
    # reported alongside for transparency.
    timings: dict[str, float] = {}
    cold = 0.0
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        cold += time.perf_counter() - t0
        # min of three warm runs: single-run numbers on a shared box swing
        # 2-3× on sub-second queries from GC/scheduler/ambient-load noise
        # (round-3's 1.6× "regression" was exactly this); the minimum is
        # the standard steady-state estimator for a fixed plan
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    load_after = os.getloadavg()
    steal1, total1 = _cpu_times()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (total1 - total0), 2)
        if total1 > total0
        else 0.0
    )
    clean_run = (
        load1_before <= _AMBIENT_LOAD1_MAX and steal_pct <= _STEAL_PCT_MAX
    )
    if not clean_run:
        print(
            f"bench: NOT a clean run — ambient load1 {load1_before:.1f} "
            f"(limit {_AMBIENT_LOAD1_MAX}), steal {steal_pct:.1f}% "
            f"(limit {_STEAL_PCT_MAX}%); timings may be inflated",
            file=sys.stderr,
        )
    payload = {
        "metric": "headline_query_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_total": round(cold, 3),
        "sf": sf,
        "load_before": [round(x, 2) for x in load_before],
        "load_after": [round(x, 2) for x in load_after],
        "steal_pct": steal_pct,
        "clean_run": clean_run,
    }
    # Round 8's driver bench came back `parsed: null`: the harness keeps only
    # a ~2 KB tail of stdout and parses the last JSON line in it, and the
    # 76-query map pushed the line's HEAD outside that window.  Fix per the
    # r8 verdict: the full per-query map goes to BENCH_DETAIL.json next to
    # this script, and the stdout line carries the totals plus only the
    # frozen 39-query prefix (the cross-round-comparable set — stable-21 and
    # the r4-era extension; the prefix is append-only so this line's length
    # is now bounded forever).
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_DETAIL.json"),
            "w",
        ) as f:
            json.dump(payload, f)
            f.write("\n")
    except OSError:
        pass  # detail file is best-effort; the stdout line is the contract
    stable = {n: timings[n] for n in STABLE_QUERIES if n in timings}
    line = dict(payload)
    line["queries"] = stable
    line["n_queries"] = len(timings)
    line["detail"] = "BENCH_DETAIL.json"
    print(json.dumps(line, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
