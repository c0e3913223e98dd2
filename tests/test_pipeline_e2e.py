"""End-to-end curation pipeline: the LLM-data operators composed the way a
real training-data run chains them — quality filter → exact dedup →
decontamination → deterministic split — with the result committed to a
snapshot table a trainer can time-travel and incrementally consume. Each
stage is individually oracle-checked elsewhere; this test gates the
COMPOSITION: flags join on the same keys, filters compose without row
explosion, and the final corpus is reproducible run-over-run."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
from streaming_data_pipeline_with_iceberg_and_spark_spark.sources.snapshots import (
    SnapshotTable,
)

SF = "/root/testdata/sf0.001"


def _curate(spark):
    q = entrymod.queries()
    docs = load(spark, "documents", SF)
    quality = q["text_gopher_quality"](spark, SF).select("doc_id", "keep")
    survivors = q["dedup_exact"](spark, SF).select(
        F.col("survivor_doc_id").alias("doc_id")
    )
    contam = q["decontaminate_eval_overlap"](spark, SF).select(
        "doc_id", "contaminated"
    )
    split = q["split_train_val_test"](spark, SF).select("doc_id", "split")
    return (
        docs.join(quality, "doc_id")
        .join(survivors, "doc_id", "left_semi")  # canonical copies only
        .join(contam, "doc_id")
        .join(split, "doc_id")
        .filter(F.col("keep") & ~F.col("contaminated"))
        .select("doc_id", "lang", "source", "n_chars", "split")
    )


def test_curation_pipeline_end_to_end(spark, tmp_path):
    docs_n = load(spark, "documents", SF).count()
    curated = _curate(spark)
    rows = curated.collect()
    # composition sanity: no row explosion, strictly filtering
    assert 0 < len(rows) < docs_n
    assert len({r["doc_id"] for r in rows}) == len(rows)  # one row per doc
    # every emitted doc carries a split assignment
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # commit to a snapshot table; a second run reproduces version 1 exactly
    table = SnapshotTable(spark, str(tmp_path / "corpus"))
    v1 = table.append(curated)
    again = {(r["doc_id"], r["split"]) for r in _curate(spark).collect()}
    assert {(r["doc_id"], r["split"]) for r in rows} == again  # deterministic
    assert table.read(version=v1).count() == len(rows)
    # the trainer's incremental feed sees the corpus exactly once
    feed = table.incremental_feed(str(tmp_path / "cursor.json"), start_version=0)
    delta, v = feed.poll()
    assert delta.count() == len(rows) and v == v1
    feed.commit(v)
    assert feed.poll() is None
