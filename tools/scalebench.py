#!/usr/bin/env python
"""Runtime-vs-size scale proof for the expensive dedup/ANN/text queries
(VERDICT r5 order #2).

Materializes an m×-replicated corpus from a base SF dir and times the most
expensive bench queries at 1× and m×, so the "survives a scale-up" claims
rest on measured ratios instead of plan-shape reading. Replication is
designed so the workload grows honestly:

- ``documents``: replica i shifts doc_id by i·(max_id+1) and prefixes every
  token with ``r{i}x`` — all shingles/tokens are distinct across replicas,
  so the corpus grows m× with the SAME per-replica duplicate structure
  (planted near-dups still collide within their replica; no artificial
  cross-replica near-dup blowup that the 200-member LSH bucket cap would
  mask). n_chars is recomputed from the rewritten text.
- ``embeddings``: replica i shifts vec_id and rotates the vector by i
  positions — norm-preserving, genuinely distinct directions, same label
  distribution.

Usage::

    python tools/scalebench.py [--base /root/testdata/sf0.1] [--mult 10]
        [--out /tmp/scalebench] [--runs 2] [query ...]

Prints one JSON line per (query, size) plus a summary with 1×→m× runtime
ratios and the python-driver peak-RSS high-water mark after each size
(driver-collected state is constant-bounded by construction — capped query
sets, clamped centroid counts, capped LSH buckets — so the high-water mark
should barely move between sizes).
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_data_pipeline_with_iceberg_and_spark_spark.session import get_spark

# The 6-8 most expensive bench queries (BENCH_r05 ordering) — all read only
# documents/embeddings, which is what the replicator materializes.
DEFAULT_QUERIES = [
    "dedup_clusters",
    "kmeans_cluster_profile",
    "ann_ivf",
    "dedup_minhash_lsh",
    "ann_ivfpq",
    "text_heavy_hitters",
    "curate_pretraining_corpus",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# FK-consistent key shifts for the relational/events tables: replica i adds
# i × (max referenced key + 1) to every key column, so each replica is a
# self-contained copy of the original join graph (joins stay 1:1 per
# replica; group counts, session counts and window key counts grow m×).
# Non-key attributes (dates, amounts, flags) are untouched, so per-replica
# selectivity is identical to the base corpus.
_BASES = {
    "cust": ("customer", "c_custkey"),
    "ord": ("orders", "o_orderkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ev": ("events", "event_id"),
    "usr": ("events", "user_id"),
}
_SHIFT_SPECS = {
    "customer": [("c_custkey", "cust")],
    "orders": [("o_orderkey", "ord"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "ord"),
        ("l_partkey", "part"),
        ("l_suppkey", "supp"),
    ],
    "supplier": [("s_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "events": [("event_id", "ev"), ("user_id", "usr")],
}
_COPY_TABLES = ["nation", "region"]  # constant dims: never replicated


def materialize_relational(spark, base: str, out: Path, mult: int) -> None:
    """Write m×-replicated TPC-H fact/events parquet (plus 1× dims)."""
    bases = {
        name: spark.read.parquet(f"{base}/{tbl}.parquet")
        .agg(F.max(col))
        .first()[0]
        + 1
        for name, (tbl, col) in _BASES.items()
    }
    for tbl, shifts in _SHIFT_SPECS.items():
        src = spark.read.parquet(f"{base}/{tbl}.parquet")
        reps = []
        for i in range(mult):
            rep = src
            for col, bname in shifts:
                rep = rep.withColumn(col, F.col(col) + F.lit(i * bases[bname]))
            reps.append(rep)
        df = reps[0]
        for rep in reps[1:]:
            df = df.unionByName(rep)
        df.write.mode("overwrite").parquet(str(out / f"{tbl}.parquet"))
    for tbl in _COPY_TABLES:
        spark.read.parquet(f"{base}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(str(out / f"{tbl}.parquet"))


def materialize(spark, base: str, out: Path, mult: int) -> None:
    """Write m×-replicated documents/embeddings parquet under ``out``."""
    docs = spark.read.parquet(f"{base}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    doc_reps = []
    for i in range(mult):
        rep = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
        if i:
            tagged = F.concat_ws(
                " ",
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    lambda t, _i=i: F.concat(F.lit(f"r{_i}x"), t),
                ),
            )
            rep = rep.withColumn("text", tagged).withColumn(
                "n_chars", F.length("text")
            )
        doc_reps.append(rep)
    out_docs = doc_reps[0]
    for rep in doc_reps[1:]:
        out_docs = out_docs.unionByName(rep)
    out_docs.write.mode("overwrite").parquet(str(out / "documents.parquet"))

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    dim = emb.select(F.size("embedding")).first()[0]
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    emb_reps = []
    for i in range(mult):
        rep = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_vec))
        if i:
            rot = i % dim
            rep = rep.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", rot + 1, dim - rot),
                    F.slice("embedding", 1, rot),
                ),
            )
        emb_reps.append(rep)
    out_emb = emb_reps[0]
    for rep in emb_reps[1:]:
        out_emb = out_emb.unionByName(rep)
    out_emb.write.mode("overwrite").parquet(str(out / "embeddings.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scalebench")
    ap.add_argument("--runs", type=int, default=2, help="min-of-N warm runs")
    ap.add_argument(
        "--keep", action="store_true", help="keep the materialized corpora"
    )
    ap.add_argument(
        "--relational",
        action="store_true",
        help="also replicate the TPC-H fact tables + events (FK-consistent "
        "key shifts) so relational/event-time queries can be swept",
    )
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    registry = entry_mod.queries()
    names = args.queries or DEFAULT_QUERIES

    spark = get_spark("scalebench")
    out1 = Path(args.out) / "x1"
    outm = Path(args.out) / f"x{args.mult}"
    for d, m in ((out1, 1), (outm, args.mult)):
        if not (d / "documents.parquet").exists():
            d.mkdir(parents=True, exist_ok=True)
            materialize(spark, args.base, d, m)
        if args.relational and not (d / "lineitem.parquet").exists():
            materialize_relational(spark, args.base, d, m)

    results: dict[str, dict[int, float]] = {}
    rss: dict[int, int] = {}
    for d, m in ((out1, 1), (outm, args.mult)):
        for name in names:
            fn = registry[name]
            try:
                _force(fn(spark, str(d)))  # warm-up: codegen + file listing
                best = float("inf")
                for _ in range(args.runs):
                    t0 = time.perf_counter()
                    _force(fn(spark, str(d)))
                    best = min(best, time.perf_counter() - t0)
            except Exception as e:  # report and keep scaling the rest
                results.setdefault(name, {})[m] = None
                print(
                    json.dumps(
                        {"query": name, "mult": m, "error": str(e)[:200]}
                    ),
                    flush=True,
                )
                continue
            results.setdefault(name, {})[m] = round(best, 3)
            print(
                json.dumps({"query": name, "mult": m, "sec": round(best, 3)}),
                flush=True,
            )
        rss[m] = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    summary = {
        "mult": args.mult,
        "ratios": {
            n: round(t[args.mult] / t[1], 2)
            if t.get(1) and t.get(args.mult)
            else None
            for n, t in results.items()
        },
        "sec": results,
        "driver_peak_rss_kb": rss,
    }
    print(json.dumps(summary), flush=True)
    if not args.keep:
        shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
