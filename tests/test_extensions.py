"""Unit tests for the rows-only extension operators (no SQL oracle):
MinHash-LSH, hyperplane ANN (recall vs exact), Pandas-UDF feature extract
(vs pure-Python oracle), and the vector function helpers.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from streaming_data_pipeline_with_iceberg_and_spark_spark.functions.vector import cosine, dot, l2_distance
from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import dedup, multimodal, similarity


def test_vector_functions_match_python(spark):
    a = [1.0, 2.0, 3.0]
    b = [4.0, -5.0, 6.0]
    df = spark.createDataFrame(
        [(a, b)], "a array<float>, b array<float>"
    ).select(
        dot("a", "b").alias("dot"),
        cosine("a", "b").alias("cos"),
        l2_distance("a", "b").alias("l2"),
    )
    row = df.collect()[0]
    exp_dot = sum(x * y for x, y in zip(a, b))
    exp_cos = exp_dot / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )
    exp_l2 = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    assert abs(row.dot - exp_dot) < 1e-9
    assert abs(row.cos - exp_cos) < 1e-9
    assert abs(row.l2 - exp_l2) < 1e-9


def test_minhash_lsh_deterministic_and_plausible(spark, sf_dir):
    out1 = dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    out2 = dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    assert out1 == out2, "fixed seeds must make LSH deterministic"
    assert len(out1) > 0
    assert all(0.0 <= r.est_jaccard <= 1.0 for r in out1)
    assert all(r.doc_a < r.doc_b for r in out1)


def test_ann_lsh_recall_vs_exact(spark, sf_dir):
    exact = {
        (r.q_id, r.vec_id)
        for r in similarity.knn_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in similarity.ann_lsh_hyperplane(spark, sf_dir).collect()
    }
    # candidate lists are bucket-restricted; require non-trivial overlap
    # (random data, 8 planes → recall is modest but must be > 0)
    assert len(approx) > 0
    recall = len(exact & approx) / len(exact)
    assert recall > 0.05, f"ANN recall suspiciously low: {recall}"


def test_sign_code_packing_and_hamming(spark, sf_dir):
    """The 64 sign bits round-trip: each word is a non-negative 32-bit
    value, bit i of word j is exactly (embedding[32j+i] >= 0), and the
    Hamming scan's self-distance is 0 (a vector's code vs itself)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load

    emb = load(spark, "embeddings", sf_dir).limit(20)
    coded = similarity._sign_coded(emb).join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    for r in coded.collect():
        for j, w in ((0, r.w0), (1, r.w1)):
            assert 0 <= w < 2**32
            for i in range(32):
                expect = 1 if r.embedding[32 * j + i] >= 0 else 0
                assert (w >> i) & 1 == expect, (r.vec_id, j, i)


def test_hamming_rerank_recall_vs_exact(spark, sf_dir):
    """64-bit sign codes + exact re-rank must preserve most of the exact
    top-5 (Charikar: bit-agreement ≈ 1 − θ/π; with a 32-wide funnel the
    measured recall on this data is ~0.8 — gate well below at 0.4)."""
    exact = {
        (r.q_id, r.vec_id)
        for r in similarity.knn_bruteforce(spark, sf_dir).collect()
    }
    rer = similarity.ann_hamming_rerank(spark, sf_dir).collect()
    approx = {(r.q_id, r.vec_id) for r in rer}
    assert all(0 <= r.hamming <= 64 for r in rer)
    recall = len(exact & approx) / len(exact)
    assert recall > 0.4, f"binary rerank recall suspiciously low: {recall}"


def test_ann_ivf_recall_and_determinism(spark, sf_dir):
    exact = {
        (r.q_id, r.vec_id)
        for r in similarity.knn_bruteforce(spark, sf_dir).collect()
    }
    out1 = similarity.ann_ivf(spark, sf_dir).collect()
    out2 = similarity.ann_ivf(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2)), (
        "seeded quantizer must make IVF deterministic"
    )
    approx = {(r.q_id, r.vec_id) for r in out1}
    assert len(approx) > 0
    # every returned neighbor is a real corpus vector scored exactly, and
    # probing nprobe cells must recover a non-trivial share of true top-5
    recall = len(exact & approx) / len(exact)
    assert recall > 0.05, f"IVF recall suspiciously low: {recall}"
    by_q = {}
    for r in out1:
        by_q.setdefault(r.q_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_histogram_quantiles_within_one_bin_of_exact(spark, sf_dir):
    """The mergeable fixed-bin sketch's p50/p90/p99 must land within one bin
    width of the exact per-group percentile (the sketch's error bound)."""
    import pyspark.sql.functions as F
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.aggregates import (
        _HQ_BINS,
        agg_histogram_quantiles,
    )

    est = {
        r["l_returnflag"]: r
        for r in agg_histogram_quantiles(spark, sf_dir).collect()
    }
    li = load(spark, "lineitem", sf_dir)
    span = li.agg(
        (F.max("l_extendedprice") - F.min("l_extendedprice")).alias("s")
    ).collect()[0]["s"]
    width = span / _HQ_BINS
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert est.keys() == exact.keys()
    for flag, e in est.items():
        for p in ("p50", "p90", "p99"):
            err = abs(e[f"{p}_est"] - exact[flag][p])
            assert err <= width * 1.5, (flag, p, err, width)


def test_quantize_int8_roundtrip_error_bounded(spark, sf_dir):
    """Dequantized vectors (q·scale) must reconstruct the original within
    half a quantization step per element, and q must fit int8's range for
    the max-|x| element by construction."""
    import numpy as np
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    orig = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, "embeddings", sf_dir).collect()
    }
    for r in quantize_embeddings_int8(spark, sf_dir).collect():
        if not r["qvec_csv"]:  # '' splits to [''] and would ValueError below
            assert orig[r["vec_id"]].size == 0
            continue
        q = np.array([int(x) for x in r["qvec_csv"].split(",")], dtype=np.float64)
        # exact scale (the emitted one is display-rounded)
        s = np.abs(orig[r["vec_id"]]).max() / 127.0 or 1.0
        recon = q * s
        assert np.max(np.abs(recon - orig[r["vec_id"]])) <= s * 0.5 + 1e-12
        assert np.max(q) <= 127 and np.min(q) >= -127


def test_anomaly_mad_flags_planted_outliers(spark, sf_dir):
    """MAD flagging must be robust: on a frame with one wild outlier per
    group, exactly the planted rows are flagged (a mean/stddev z-score
    would have its threshold dragged by the outlier itself)."""
    import pyspark.sql.functions as F
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        events_anomaly_mad,
    )

    out = {r["event_type"]: r for r in events_anomaly_mad(spark, sf_dir).collect()}
    assert out  # per-fixture event types present
    for et, r in out.items():
        assert r["mad"] >= 0
        assert 0 <= r["n_anomalies"] < r["n_events"] * 0.1, (et, r)


def test_ivf_cell_count_constant_bounded():
    """The IVF codebook is driver-side state (collect + closure-ship), so
    its size must not grow with the corpus: √N below the cap, constant
    above it — a 100 TB corpus collects exactly _IVF_MAX_CELLS rows."""
    assert similarity._ivf_n_cells(0) == 4
    assert similarity._ivf_n_cells(10_000) == 100
    assert similarity._ivf_n_cells(similarity._IVF_MAX_CELLS**2) == similarity._IVF_MAX_CELLS
    assert similarity._ivf_n_cells(10**12) == similarity._IVF_MAX_CELLS
    assert similarity._ivf_n_cells(10**14) == similarity._IVF_MAX_CELLS


def test_ann_pq_recall_and_determinism(spark, sf_dir):
    """PQ/ADC top-5 must be deterministic and recover a non-trivial share of
    the exact L2 top-5 (computed densely here — 4-bit codes on random data
    give modest but real recall)."""
    import numpy as np

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        _query_pred,
    )

    out1 = similarity.ann_pq(spark, sf_dir).collect()
    out2 = similarity.ann_pq(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    approx = {(r.q_id, r.vec_id) for r in out1}
    assert len(approx) > 0

    emb = load(spark, "embeddings", sf_dir)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q_rows = emb.filter(_query_pred(50)).select("vec_id", "embedding").collect()
    exact = set()
    for qr in q_rows:
        q = np.array(qr["embedding"], dtype=np.float64)
        d = ((mat - q) ** 2).sum(axis=1)
        order = [i for i in np.argsort(d, kind="stable") if ids[i] != qr["vec_id"]]
        exact.update((qr["vec_id"], ids[i]) for i in order[:5])
    recall = len(exact & approx) / len(exact)
    assert recall > 0.1, f"PQ recall suspiciously low: {recall}"


def test_ann_ivfpq_recall_and_determinism(spark, sf_dir):
    """IVF+residual-PQ (IVFADC) top-5 must be deterministic and recover a
    non-trivial share of the exact L2 top-5. Residual encoding should not be
    WORSE than plain PQ's floor on the same data: residuals are smaller in
    magnitude than raw vectors, so the same 4-bit budget quantizes finer."""
    import numpy as np

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        _query_pred,
    )

    out1 = similarity.ann_ivfpq(spark, sf_dir).collect()
    out2 = similarity.ann_ivfpq(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    approx = {(r.q_id, r.vec_id) for r in out1}
    assert len(approx) > 0
    # every query emits at most k rows, ranked 1..k without gaps
    by_q = {}
    for r in out1:
        by_q.setdefault(r.q_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)

    emb = load(spark, "embeddings", sf_dir)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q_rows = emb.filter(_query_pred(50)).select("vec_id", "embedding").collect()
    exact = set()
    for qr in q_rows:
        q = np.array(qr["embedding"], dtype=np.float64)
        d = ((mat - q) ** 2).sum(axis=1)
        order = [i for i in np.argsort(d, kind="stable") if ids[i] != qr["vec_id"]]
        exact.update((qr["vec_id"], ids[i]) for i in order[:5])
    recall = len(exact & approx) / len(exact)
    # nprobe=2 restricts candidates to probed cells, so recall trails plain
    # PQ's dense scan — but it must stay clearly above chance
    assert recall > 0.05, f"IVFPQ recall suspiciously low: {recall}"


def test_mm_feature_extract_matches_python_oracle(spark, sf_dir):
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load

    rows = multimodal.mm_feature_extract(spark, sf_dir).collect()
    texts = {
        r.doc_id: r.text for r in load(spark, "documents", sf_dir).collect()
    }
    assert len(rows) == len(texts)
    for r in rows[:50]:
        payload = texts[r.doc_id].encode("utf-8")
        byte_sum, w, h = multimodal.fake_decode_features(payload)
        assert r.n_bytes == len(payload)
        assert r.byte_sum_mod == byte_sum
        assert r.fake_width == w
        assert r.fake_height == h


def test_decode_image_is_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff")


def test_knn_vectorized_parity_with_exact(spark, sf_dir):
    """The numpy/mapInPandas scale path returns the same neighbors as the
    higher-order-function exact path (float-tie rank swaps aside)."""
    exact = {
        (r.q_id, r.vec_id): r.cos_sim
        for r in similarity.knn_bruteforce(spark, sf_dir).collect()
    }
    vec = {
        (r.q_id, r.vec_id): r.cos_sim
        for r in similarity.knn_bruteforce_vectorized(spark, sf_dir).collect()
    }
    common = exact.keys() & vec.keys()
    assert len(common) >= 0.95 * len(exact)
    assert all(abs(exact[kk] - vec[kk]) < 1e-4 for kk in common)


def test_connected_components_chain_and_singleton(spark):
    """Transitive closure beyond cliques: a 4-chain (1-2, 2-3, 3-4) needs
    multiple propagation rounds; the corpus oracle's near-clique clusters
    never exercise that depth. Also: two disjoint components stay disjoint."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.dedup import (
        _connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    verts = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (10,), (11,)], "doc_id long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in _connected_components(verts, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_fast_convergence_on_corpus(spark, sf_dir):
    """The corpus' planted near-dup components are near-cliques: label
    propagation must settle in ≤3 rounds (incl. the confirming round). A
    regression here means the edge set got pathological — switch to
    large-star/small-star before raising the cap."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import dedup

    # the CC memo would otherwise serve a cached labels frame and leave
    # last_rounds holding some OTHER test's adversarial-graph round count
    dedup.clear_cc_cache()
    dedup.dedup_clusters(spark, sf_dir).collect()
    assert dedup._connected_components.last_rounds <= 3


def test_decontaminate_spans_planted_truth(spark, tmp_path):
    """Span-level eval decontamination names the exact planted frame
    (r15): a train doc carrying a 10-token span verbatim present in TWO
    eval docs yields one manifest row PER contaminated pair with the
    precise (start_tok, n_tokens, span_hash); a clean train doc and
    eval↔eval sharing produce nothing (only train docs are audited).
    Maximality: the tokens flanking the span break the run, so the
    reported frame is exactly the plant."""
    import hashlib

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.dedup import (
        decontaminate_spans,
    )

    # md5-bucket splits (the _split_of definition): 1→78 train,
    # 2→30 train, 5→86 eval, 8→96 eval
    span = " ".join(f"leak{i}" for i in range(10))
    u = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    docs = {
        1: f"{u('a', 9)} {span} {u('b', 9)}",   # contaminated train doc
        2: u("c", 30),                            # clean train doc
        5: f"{u('d', 4)} {span} {u('e', 5)}",   # eval doc with the plant
        8: f"{span} {u('f', 11)}",               # second eval doc, plant at 1
    }
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(d, t, "en", "s", 0) for d, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    got = sorted(map(tuple, decontaminate_spans(spark, sf).collect()))
    h = hashlib.md5(span.encode()).hexdigest()
    assert got == [
        (1, 5, 1, 10, 10, h),
        (1, 8, 1, 10, 10, h),
    ]

    # the trim face drops EXACTLY the planted tokens from the
    # contaminated train doc, keeps the clean one byte-identical, and
    # never touches eval docs
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.dedup import (
        decontaminate_spans_apply,
    )

    trimmed = sorted(
        map(tuple, decontaminate_spans_apply(spark, sf).collect())
    )
    kept1 = f"{u('a', 9)} {u('b', 9)}"
    assert trimmed == [
        (1, 28, 10, hashlib.md5(kept1.encode()).hexdigest()),
        (2, 30, 0, hashlib.md5(docs[2].encode()).hexdigest()),
    ]


def test_lsh_storm_collapse_bounds_pairs_and_is_component_exact(spark):
    """Planted 500-copy boilerplate storm (r15, VERDICT r14 What's-wrong
    #2): identical MinHash signatures collapse to one representative +
    star edges BEFORE the band self-join, so candidate mass is bounded
    by DISTINCT signatures (here 3), never raw copies (500) — O(m²)
    would be ~125k pairs; the collapse emits exactly m-1 stars + the
    rep-level near-dup edge.  And the sparsification is component-exact:
    all 500 copies land in one cluster labeled by the min doc_id, with
    the one-word-off near-dup pulled in THROUGH its representative."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.dedup import (
        _collapse_identical_sigs,
        _connected_components,
        lsh_agreement_edges,
        minhash_sig_bands,
    )

    boiler = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sleepy pandas watch from a distant bamboo grove under heavy "
        "summer rain that never seems to stop falling on the valley"
    )
    near = boiler.replace("seventeen", "eighteen")
    other = (
        "completely different content about distributed query engines "
        "processing petabytes of training data with columnar formats "
        "snapshot isolation and carefully bounded shuffle stages"
    )
    rows = [(i, boiler) for i in range(10, 510)]
    rows += [(600, near), (700, other)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    rep_rows, star = _collapse_identical_sigs(minhash_sig_bands(docs), "doc_id")
    assert rep_rows.count() == 3, "one rep per distinct signature"
    assert star.count() == 499, "m-1 star edges for the m-copy storm"

    edges = lsh_agreement_edges(docs)
    edge_set = {(r.doc_a, r.doc_b) for r in edges.collect()}
    # 499 stars (10, member) + exactly one rep-level edge (10, 600):
    # linear in copies, not quadratic
    assert len(edge_set) == 500
    assert (10, 600) in edge_set
    assert all(a == 10 for a, _ in edge_set), "storm rep anchors every edge"

    verts = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .union(edges.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    labels = {
        r.doc_id: r.cluster_id
        for r in _connected_components(verts, edges).collect()
    }
    assert all(labels[i] == 10 for i in range(10, 510))
    assert labels[600] == 10, "near-dup joins the cluster through the rep"
    assert 700 not in labels, "unrelated doc stays a singleton"


def test_jaccard_stop_shingle_cap_bounds_pair_blowup(spark, tmp_path):
    """1,000 docs sharing one boilerplate shingle must NOT emit the ~500k
    all-pairs of that posting list (df > _JACCARD_DF_CAP drops it before
    pair generation), while planted near-dups sharing *rare* shingles
    survive with high Jaccard."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.dedup import _jaccard_pairs

    boiler = "terms of service apply"
    rows = []
    for i in range(1000):
        # each doc: the shared boilerplate + unique filler (no cross-doc 3-grams)
        text = f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d"
        rows.append((i, text, "en", "web", len(text)))
    # planted near-dup pair sharing rare shingles only
    dup = "rare alpha beta gamma delta epsilon zeta"
    rows.append((2000, dup + " tail0", "en", "web", len(dup)))
    rows.append((2001, dup + " tail1", "en", "web", len(dup)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    pairs = _jaccard_pairs(spark, str(tmp_path)).collect()
    # boilerplate posting list (df=1000 > cap) contributes zero pairs;
    # only the planted pair (plus nothing else) shares a retained shingle
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(2000, 2001)}
    jac = pairs[0].jac
    # shared: 6 shingles of "rare..zeta" window; each doc has 8 total
    assert jac > 0.5, f"planted near-dup should score high, got {jac}"


def test_text_chunk_udtf_matches_oracle_on_degenerate_docs(spark, tmp_path):
    """Empty / whitespace-only / Unicode-space docs: the UDTF tokenizer must
    agree with the DuckDB oracle (latent divergence — corpus has no such
    docs, so the gate can't catch it)."""
    import duckdb

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.pandas_ops import (
        TEXT_CHUNK_UDTF_SQL,
        text_chunk_udtf,
    )

    rows = [
        (0, "", "en", "web", 0),
        (10, "   ", "en", "web", 3),
        (20, "a b c", "en", "web", 5),  # NBSP is NOT \s whitespace
        (30, "one two  three\t four \n", "en", "web", 20),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r.doc_id, r.chunk_idx, r.chunk, r.n_tokens)
        for r in text_chunk_udtf(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = set(map(tuple, con.execute(TEXT_CHUNK_UDTF_SQL).fetchall()))
    assert got == want


def test_pii_redact_planted_pii_matches_oracle(spark, tmp_path):
    """Corpus has no PII, so the gate only proves the all-zeros case; plant
    emails/IPs/phones (incl. adjacent and overlapping-class spans) and
    require exact engine/oracle agreement on counts and redacted hash."""
    import duckdb

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        PII_REDACT_SQL,
        pii_redact,
    )

    rows = [
        (0, "contact alice@example.com or bob.smith+x@mail.co today", "en", "web", 50),
        (1, "server at 10.0.0.1 and 192.168.254.3, call 555-123-4567", "en", "web", 50),
        (2, "+1 555 123 4567 is not matched but 555 123 4567 is", "en", "web", 50),
        (3, "no pii here at all", "en", "web", 18),
        (4, "a@b.io next to 1.2.3.4 next to 800-555-1212", "en", "web", 40),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r.doc_id, r.n_emails, r.n_ipv4, r.n_phones, r.redacted_hash)
        for r in pii_redact(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = set(map(tuple, con.execute(PII_REDACT_SQL).fetchall()))
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[0][1] == 2 and by_id[3][1:4] == (0, 0, 0)
    assert by_id[1][2] == 2 and by_id[1][3] == 1


def test_sample_temperature_flattens_lang_distribution(spark, sf_dir):
    """Keep-rate per language must track sqrt(n_min/n_s): the rarest
    language is kept (almost) fully, the most common is downsampled
    hardest, and the sampled distribution is flatter than the input."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.sampling import (
        sample_temperature_by_lang,
    )

    before = {
        r["lang"]: r["n"]
        for r in load(spark, "documents", sf_dir).groupBy("lang").agg(
            F.count("*").alias("n")
        ).collect()
    }
    after = {}
    for r in sample_temperature_by_lang(spark, sf_dir).collect():
        after[r["lang"]] = after.get(r["lang"], 0) + 1
    n_min = min(before.values())
    for lang, n_s in before.items():
        expected = (n_min / n_s) ** 0.5
        got = after.get(lang, 0) / n_s
        # md5 buckets are uniform-ish; allow generous sampling noise
        assert abs(got - expected) < 0.25, (lang, got, expected)
    # flatter: max/min ratio must shrink
    assert max(after.values()) / min(after.values()) < max(before.values()) / min(
        before.values()
    )


def test_leakage_free_split_keeps_clusters_together(spark, sf_dir):
    """Every near-dup cluster must land whole in one split (that is the
    operator's reason to exist), and the corpus must actually contain a
    multi-member cluster for the assertion to mean anything."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.sampling import (
        split_leakage_free,
    )

    rows = split_leakage_free(spark, sf_dir).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert any(
        len([r for r in rows if r["cluster_id"] == cid]) > 1 for cid in by_cluster
    ), "corpus has no multi-member cluster; test is vacuous"
    assert all(len(s) == 1 for s in by_cluster.values())


def test_hll_sketch_accuracy_and_union_consistency(spark, sf_dir):
    """Per-type HLL estimates must sit within 5% of exact, and the 'ALL' row
    (union of per-type sketches, raw data never re-read) must sit within 5%
    of the true global distinct."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.aggregates import (
        agg_hll_mergeable,
    )

    rows = {r["event_type"]: r for r in agg_hll_mergeable(spark, sf_dir).collect()}
    for et, r in rows.items():
        if et == "ALL":
            continue
        assert abs(r["approx_users"] - r["exact_users"]) <= 0.05 * r["exact_users"]
    exact_all = (
        load(spark, "events", sf_dir).agg(F.countDistinct("user_id")).collect()[0][0]
    )
    assert abs(rows["ALL"]["approx_users"] - exact_all) <= 0.05 * exact_all


def test_dedup_apply_removes_only_nonsurvivors(spark, sf_dir):
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.dedup import (
        dedup_apply,
        dedup_clusters,
    )

    clusters = dedup_clusters(spark, sf_dir).collect()
    survivors = {r["doc_id"] for r in clusters if r["is_survivor"]}
    kept = {r["doc_id"] for r in dedup_apply(spark, sf_dir).collect()}
    assert kept == survivors
    # every cluster's id is its own survivor
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)


def test_dedup_semantic_precision_and_determinism(spark, sf_dir):
    """Every vector dedup_semantic drops must have a REAL same-cluster
    neighbor with cosine >= tau and a smaller id (precision = 1 by
    recomputation); kept set is deterministic across runs; survivors
    contain the minimum vec_id of every cluster (the keep-lowest rule can
    never drop a cluster's first member)."""
    import numpy as np

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load

    kept1 = dedup.dedup_semantic(spark, sf_dir).collect()
    kept2 = dedup.dedup_semantic(spark, sf_dir).collect()
    assert kept1 == kept2, "quantizer seeds are fixed — must be deterministic"
    kept_ids = {r.vec_id for r in kept1}
    all_rows = load(spark, "embeddings", sf_dir).select("vec_id", "embedding").collect()
    assert 0 < len(kept_ids) <= len(all_rows)

    cluster_of = {r.vec_id: r.cell for r in kept1}
    dropped = [r.vec_id for r in all_rows if r.vec_id not in kept_ids]
    if not dropped:
        return
    # recompute: each dropped vector needs a >= tau cosine neighbor with a
    # smaller id (cluster labels for dropped rows are engine-internal, so
    # verify against the whole corpus — a superset check: the corpus-wide
    # neighbor must exist for the in-cluster one to have existed)
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in all_rows}
    for did in dropped:
        v = vecs[did]
        ok = any(
            oid < did
            and float(
                vecs[oid] @ v / (np.linalg.norm(vecs[oid]) * np.linalg.norm(v))
            )
            >= dedup._SEM_TAU - 1e-9
            for oid in vecs
        )
        assert ok, f"vec {did} dropped without a >=tau smaller-id neighbor"
    # every cluster's smallest surviving member must be its smallest member
    # among kept rows (sanity on the keep-lowest-id rule within clusters)
    by_cell: dict[int, list[int]] = {}
    for r in kept1:
        by_cell.setdefault(r.cell, []).append(r.vec_id)
    assert all(min(v) in kept_ids for v in by_cell.values())


def test_dedup_span_exact_removes_planted_boilerplate(spark, tmp_path):
    """Two documents sharing a verbatim 10-token boilerplate span must both
    lose exactly that span; the unique remainder survives byte-identically."""
    import hashlib

    boiler = " ".join(f"tos{i}" for i in range(10))
    uniq_a = " ".join(f"worda{i}" for i in range(10))
    uniq_b = " ".join(f"wordb{i}" for i in range(10))
    rows = [
        (1, f"{boiler} {uniq_a}", "en", "src0", 1),
        (2, f"{boiler} {uniq_b}", "en", "src0", 1),
        (3, uniq_a.replace("worda", "wordc"), "en", "src0", 1),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    out = {r.doc_id: r for r in dedup.dedup_span_exact(spark, sf).collect()}
    assert out[1].n_spans == 2 and out[1].n_dropped == 1
    assert out[2].n_spans == 2 and out[2].n_dropped == 1
    assert out[3].n_spans == 1 and out[3].n_dropped == 0
    assert out[1].kept_hash == hashlib.md5(uniq_a.encode()).hexdigest()
    assert out[2].kept_hash == hashlib.md5(uniq_b.encode()).hexdigest()


def test_dedup_exact_substr_planted_spans(spark, tmp_path):
    """ExactSubstr manifest on planted data: a 12-token block shared by two
    documents at DIFFERENT offsets is reported in both as one maximal span
    with the exact start/length/hash; unique docs, sub-k docs and a block
    repeated only WITHIN one document produce no spans."""
    import hashlib

    shared = " ".join(f"boiler{i}" for i in range(12))
    u = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    rows = [
        (1, f"{u('a', 10)} {shared} {u('b', 10)}", "en", "s", 1),
        (2, f"{u('c', 5)} {shared} {u('d', 8)}", "en", "s", 1),
        (3, u("e", 30), "en", "s", 1),  # unique, long
        (4, u("f", 5), "en", "s", 1),  # shorter than k
        (5, f"{u('g', 3)} {u('h', 12)} {u('i', 3)} {u('h', 12)}", "en", "s", 1),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    out = dedup.dedup_exact_substr(spark, sf).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # docs 3-5 report nothing (doc 5's repeat is intra-document only)
    assert set(by_doc) == {1, 2}
    (s1,), (s2,) = by_doc[1], by_doc[2]
    # maximality: exactly the 12 planted tokens, not more, not less
    assert (s1.start_tok, s1.n_tokens, s1.span_ord) == (11, 12, 1)
    assert (s2.start_tok, s2.n_tokens, s2.span_ord) == (6, 12, 1)
    want = hashlib.md5(shared.encode()).hexdigest()
    assert s1.span_hash == want and s2.span_hash == want

    # the apply face trims exactly the covered tokens and reconstructs
    # the survivors byte-identically
    out = {r.doc_id: r for r in dedup.dedup_exact_substr_apply(spark, sf).collect()}
    assert (out[1].n_tokens, out[1].n_dropped) == (32, 12)
    assert out[1].kept_hash == hashlib.md5(
        f"{u('a', 10)} {u('b', 10)}".encode()
    ).hexdigest()
    assert (out[2].n_tokens, out[2].n_dropped) == (25, 12)
    assert out[2].kept_hash == hashlib.md5(
        f"{u('c', 5)} {u('d', 8)}".encode()
    ).hexdigest()
    for d in (3, 4, 5):
        assert out[d].n_dropped == 0


def test_kgram_cores_hot_hash_skew(spark):
    """r16 skew fixture (the r15 verdict's hot-hash order): a boilerplate
    k-gram with ~10⁵ postings must flow through the ExactSubstr and
    span-decon cores as plain ROWS (window marker + spillable buffers),
    never as one per-hash aggregation-buffer array — the r15 collect_list
    form concentrated a hot hash's full duplicate mass into a single
    unsplittable value. Plants one hash with 100k postings (1000 docs ×
    100 positions) and checks the exact maximal-span output."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.dedup import (
        _ES_K,
        exact_substr_spans,
        span_decon_manifest,
    )
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.sampling import (
        _split_of,
    )

    n_docs, n_pos = 1000, 100
    end = n_pos + _ES_K - 1
    rows = (
        spark.range(n_docs)
        .selectExpr("id AS doc_id", f"explode(sequence(1, {n_pos})) AS pos")
        .withColumn("h", F.lit("hot"))
    )
    spans = exact_substr_spans(rows).collect()
    assert len(spans) == n_docs
    assert all((r.start_tok, r.end_tok) == (1, end) for r in spans)

    # span-decon core under the same hot hash: every train doc carries
    # the 100 positions, two eval docs share the hash — one maximal span
    # per (train doc, eval doc) pair, nothing concentrated per hash
    splits = {
        r.doc_id: r.split
        for r in spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"), _split_of(F.col("id")).alias("split")
        )
        .collect()
    }
    train = sorted(d for d, s in splits.items() if s == "train")
    evals = sorted(d for d, s in splits.items() if s != "train")[:2]
    assert train and len(evals) == 2
    tr_rows = (
        spark.createDataFrame([(d,) for d in train], "doc_id long")
        .selectExpr("doc_id", f"explode(sequence(1, {n_pos})) AS pos")
        .withColumn("h", F.lit("hot"))
    )
    ev_rows = spark.createDataFrame(
        [(d, 1, "hot") for d in evals], "doc_id long, pos int, h string"
    )
    toked = spark.createDataFrame([(d,) for d in train], "doc_id long").select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.lit(end)),
            lambda i: F.concat(F.lit("w"), i.cast("string")),
        ).alias("t"),
    )
    out = span_decon_manifest(tr_rows.unionByName(ev_rows), toked).collect()
    assert len(out) == len(train) * 2
    assert all(
        (r.start_tok, r.n_tokens, r.span_ord) == (1, end, 1) for r in out
    )


def test_scale_adaptive_fill_sliced_equals_windowed(spark, sf_dir, monkeypatch):
    """The greedy budget fills' two layers are bit-identical (r15, VERDICT
    r14 What's-wrong #3): forcing the sliced prefix-sum plan (approx-
    quantile score slices + broadcast per-slice offsets) reproduces the
    plain per-source running-sum window EXACTLY — on the corpus fixture
    for both fill faces (mix selection + multimodal curation), and on a
    skewed fixture where one source holds ~95% of rows WITH planted
    score ties (equal values may not straddle a slice — the property the
    exactness proof leans on)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
        multimodal,
        sampling,
    )

    docs = load(spark, "documents", sf_dir)
    want_mix = sorted(map(tuple, sampling.mix_selected_docs(docs).collect()))
    want_mm = sorted(
        map(tuple, multimodal.curate_multimodal_corpus(spark, sf_dir).collect())
    )

    monkeypatch.setattr(sampling, "_FILL_MAX_WINDOWED", -1)
    got_mix = sorted(
        map(tuple, sampling.mix_selected_docs(docs, est_rows=1).collect())
    )
    # curate_multimodal_corpus probes parquet_row_count itself; with the
    # threshold at -1 that est forces its sliced path
    got_mm = sorted(
        map(tuple, multimodal.curate_multimodal_corpus(spark, sf_dir).collect())
    )
    assert got_mix == want_mix
    assert got_mm == want_mm

    # skewed fixture: source "big" holds 95% of rows, 40 distinct
    # repeated texts → heavy identical-score ties inside the hot source
    rows = [
        (i, "big", f"doc body variant {i % 40} with some shared words")
        for i in range(950)
    ] + [(1000 + i, "small", f"tiny corpus doc {i}") for i in range(50)]
    skew = spark.createDataFrame(rows, "doc_id long, source string, text string")
    monkeypatch.setattr(sampling, "_FILL_MAX_WINDOWED", 10**9)
    want = sorted(map(tuple, sampling.mix_selected_docs(skew).collect()))
    monkeypatch.setattr(sampling, "_FILL_MAX_WINDOWED", -1)
    got = sorted(
        map(tuple, sampling.mix_selected_docs(skew, est_rows=1000).collect())
    )
    assert got == want
    assert len(want) > 0


def test_assemble_training_mix_conservation_and_budgets(spark, sf_dir):
    """The end-to-end mix capstone conserves what it packs: the committed
    manifest's token/chunk totals equal an independent recount of the
    selected docs' chunks, every source's admitted tokens fit its integer
    budget with greedy maximality (the first excluded doc would overflow),
    the budget arithmetic matches the pinned integer decomposition, and
    the manifest recomputed FROM the committed rows table equals the
    committed manifest (the one-transaction claim)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import sampling
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.sampling import (
        assemble_training_mix,
        mix_selected_docs,
        mix_source_budgets,
        mix_selection_report,
    )
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import chunk_rows

    docs = load(spark, "documents", sf_dir)
    manifest = assemble_training_mix(spark, sf_dir).collect()
    sel = mix_selected_docs(docs)

    # token/chunk conservation vs an independent recount
    recount = (
        chunk_rows(docs.join(sel.select("doc_id"), "doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_tokens").alias("n_tokens"),
        )
        .collect()[0]
    )
    assert sum(r.n_chunks for r in manifest) == recount.n_chunks
    assert sum(r.n_tokens for r in manifest) == recount.n_tokens

    # per-source budget fit + greedy maximality + the integer formula
    budgets = {r.source: r for r in mix_source_budgets(docs).collect()}
    report = {r.source: r for r in mix_selection_report(spark, sf_dir).collect()}
    per_src = {
        r.source: (r.total_tokens,)
        for r in sampling.merge_source_token_cells(
            sampling.source_token_cells(docs)
        ).collect()
    }
    T = sum(v[0] for v in per_src.values())
    for s, rep in report.items():
        b = budgets[s]
        assert rep.n_tokens <= b.budget_tokens
        iw = round(b.weight * 1_000_000)
        assert b.budget_tokens == (iw * (T // 2000)) // 1000
    # maximality: the cheapest excluded doc per source would overflow
    from streaming_data_pipeline_with_iceberg_and_spark_spark.functions.text import tokens as _tokens
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        _LQC_BIAS,
        _LQC_W,
        _linear_score_expr,
    )
    from pyspark.sql.window import Window as W

    scored = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "source",
        F.size(_tokens("text")).cast("long").alias("n_tok"),
        _linear_score_expr(_LQC_W, _LQC_BIAS).alias("q"),
    )
    ws = (
        W.partitionBy("source")
        .orderBy(F.desc("q"), "doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = scored.withColumn("cum", F.sum("n_tok").over(ws))
    # first excluded doc IN FILL ORDER per source: admitting it must
    # overflow (admitted + its n_tok > budget) — a real maximality check
    # that fails if the selection under-fills (the old min(cum) > budget
    # form was a tautology of the cum > budget filter)
    we = W.partitionBy("source").orderBy(F.desc("q"), "doc_id")
    first_excl = (
        filled.join(
            spark.createDataFrame(
                [(s, b.budget_tokens) for s, b in budgets.items()],
                "source string, budget long",
            ),
            "source",
        )
        .filter(F.col("cum") > F.col("budget"))
        .withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") == 1)
        .select("source", "n_tok", "cum")
        .collect()
    )
    for r in first_excl:
        admitted = report[r.source].n_tokens if r.source in report else 0
        assert admitted + r.n_tok > budgets[r.source].budget_tokens
        assert r.cum == admitted + r.n_tok

    # one-transaction integrity: manifest recomputed from the committed
    # rows table equals the committed manifest
    (tbl, _scratch) = next(
        v for k, v in sampling._MIX_CACHE.items() if k[1] == sf_dir
    )
    rows_root = str(tbl.root).replace("/manifest", "/rows")
    from streaming_data_pipeline_with_iceberg_and_spark_spark.sources.snapshots import SnapshotTable

    rows = SnapshotTable(spark, rows_root).read()
    fp = F.md5(
        F.concat_ws(":", "doc_id", "chunk_idx", "start_seq", "start_off").cast(
            "binary"
        )
    )
    re_manifest = sorted(
        map(
            tuple,
            rows.withColumn("fp", fp)
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_chunks"),
                (F.max("end_seq") + 1).cast("long").alias("n_seqs"),
                F.sum("chunk_tokens").cast("long").alias("n_tokens"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.sort_array(
                                F.collect_list(
                                    F.struct("o", "doc_id", "chunk_idx", "fp")
                                )
                            ),
                            lambda x: x["fp"],
                        ),
                        "",
                    ).cast("binary")
                ).alias("content_hash"),
            )
            .collect(),
        )
    )
    assert re_manifest == sorted(map(tuple, manifest))

    # determinism / memoization: a second call returns the same manifest
    again = assemble_training_mix(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, manifest))


def test_mixture_interleave_prefix_tracks_weights(spark, sf_dir):
    """Any prefix of the interleaved stream must approximate the weight
    mixture: a weight-4 source appears ~4x as often as a weight-1 source in
    the first 200 slots."""
    from collections import Counter

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import sampling

    rows = sampling.mixture_weighted_interleave(spark, sf_dir).collect()
    assert len(rows) == 200
    by_weight = Counter()
    for r in rows:
        by_weight[r.weight] += 1
    # 20 sources, weights 1..4 evenly; counts should scale ~linearly with
    # weight (integer slotting makes it exact up to boundary effects)
    assert by_weight[4] > 2.5 * by_weight[1], by_weight
    # slots are non-decreasing in rank within each source
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r.source, []).append((r.src_rank, r.slot))
    for seq in per_src.values():
        ranks = [x[0] for x in sorted(seq)]
        assert ranks == list(range(1, len(ranks) + 1)), "prefix must be rank-contiguous"


def test_heavy_hitters_candidate_phase_survives_cap_overflow(spark, tmp_path, monkeypatch):
    """Misra-Gries phase with vocab ≫ CAP: the decrement step must keep
    true heavy tokens while holding per-partition state at ≤ CAP counters.
    Corpus: 50k distinct rare tokens + one token on every row."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import textops

    monkeypatch.setattr(textops, "_HH_CAP", 1000)
    rows = [(i, f"heavy rare{i} rare{i + 50_000}") for i in range(20_000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/documents.parquet")
    out = textops.text_heavy_hitters(spark, sf_dir).collect()
    assert out[0]["token"] == "heavy"
    assert out[0]["n"] == 20_000  # phase 2 makes the count EXACT


def test_kmeans_cluster_profile_invariants(spark, sf_dir):
    """The k-means profile must be deterministic at its rounded precision,
    cover every corpus vector exactly once, and actually refine: multi-round
    centroids give a weakly LOWER mean distance than the raw seeds."""
    import numpy as np

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        _KMEANS_K,
        _kmeans_centroids,
    )

    out1 = similarity.kmeans_cluster_profile(spark, sf_dir).collect()
    out2 = similarity.kmeans_cluster_profile(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    n_corpus = load(spark, "embeddings", sf_dir).count()
    assert sum(r.n for r in out1) == n_corpus
    assert 1 <= len(out1) <= _KMEANS_K
    assert all(r.avg_dist >= 0 for r in out1)

    # refinement: inertia under the fitted centroids <= under the raw seeds
    rows = load(spark, "embeddings", sf_dir).select("embedding").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)

    def inertia(cent):
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return np.sqrt(d2.min(axis=1)).mean()

    seeds = _kmeans_centroids(spark, sf_dir, k=_KMEANS_K, iters=0)
    fitted = _kmeans_centroids(spark, sf_dir, k=_KMEANS_K, iters=3)
    assert inertia(fitted) <= inertia(seeds) + 1e-9


def test_ivf_index_prunes_files_appends_and_recalls(spark, sf_dir, tmp_path):
    """The materialized IVF index must (a) answer queries from MANIFEST-
    pruned scans — a single-cell read opens strictly fewer files than the
    whole index; (b) recover non-trivial exact-top-5 recall; (c) find
    vectors added through incremental append; (d) keep old index versions
    time-travelable after the append."""
    import numpy as np

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        IvfIndex,
        _query_pred,
    )

    idx = IvfIndex(spark, str(tmp_path / "ivfidx"))
    emb = load(spark, "embeddings", sf_dir)
    v1 = idx.build(emb)
    # (a) pruning: one probed cell touches a strict subset of index files
    all_files = set(idx.table.read().inputFiles())
    one_cell = set(idx.table.read_where("cell", 0, 0).inputFiles())
    assert one_cell and one_cell < all_files
    # (b) recall vs the exact baseline
    queries = emb.filter(_query_pred(50))
    out = idx.query(queries, k=5).collect()
    approx = {(r.q_id, r.vec_id) for r in out}
    exact = {
        (r.q_id, r.vec_id)
        for r in similarity.knn_bruteforce(spark, sf_dir).collect()
    }
    assert len(approx) > 0
    assert len(exact & approx) / len(exact) > 0.05
    # (c) append: a synthetic vector identical to a query must become its
    # top hit (cosine 1.0) without rebuilding
    q0 = queries.orderBy("vec_id").first()
    new_id = 10_000_000
    idx.append(
        spark.createDataFrame(
            [(new_id, q0["embedding"])], "vec_id long, embedding array<float>"
        )
    )
    out2 = idx.query(queries, k=5).collect()
    top = {r.q_id: r for r in out2 if r.rank == 1}
    assert top[q0["vec_id"]].vec_id == new_id
    assert top[q0["vec_id"]].cos_sim == 1.0
    # (d) the pre-append index version still answers without the new vector
    assert idx.table.read(version=v1).filter(
        F.col("vec_id") == new_id
    ).count() == 0


def test_ann_ivf_index_registry_entry(spark, sf_dir):
    out = similarity.ann_ivf_index(spark, sf_dir).collect()
    assert len(out) > 0
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def _tiny_sf_dir(spark, tmp_path, n):
    """A scratch sf dir whose embeddings table has only ``n`` vectors —
    smaller than _PQ_K and (for n=1) than nprobe, the shapes a selective
    filter routinely produces at scale."""
    import numpy as np

    d = tmp_path / f"tiny_sf_{n}"
    d.mkdir()
    rng = np.random.RandomState(7)
    rows = [
        (i * 50, [float(x) for x in rng.randn(64)], 0) for i in range(n)
    ]  # vec_id i*50 → satisfies _query_pred(50)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_pq_family_survives_tiny_corpus(spark, tmp_path):
    """ann_pq / ann_ivfpq on corpora smaller than the codebook size
    (_PQ_K=16) or the probe count must produce valid (possibly short)
    results, not shape errors — a selective corpus filter makes this
    routine at scale."""
    for n in (1, 3):
        sf = _tiny_sf_dir(spark, tmp_path, n)
        for fn in (similarity.ann_pq, similarity.ann_ivfpq):
            out = fn(spark, sf).collect()
            # n-1 possible neighbors per query, at most
            assert all(r.rank <= max(0, n - 1) + 1 for r in out)
            if n == 1:
                assert out == []  # the only vector is the query itself


def test_ivf_index_centroids_travel_with_versions(spark, sf_dir, tmp_path):
    """Centroids commit WITH the data (snapshot props): after a rebuild
    with a different k, a time-traveled query of the old version must use
    the OLD quantizer — data and quantizer can never disagree."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        IvfIndex,
        _query_pred,
    )

    idx = IvfIndex(spark, str(tmp_path / "idx"))
    emb = load(spark, "embeddings", sf_dir)
    v1 = idx.build(emb)
    queries = emb.filter(_query_pred(50))
    out_v1 = sorted(map(tuple, idx.query(queries, k=5).collect()))
    # rebuild with different quantizer geometry → new version, new centroids
    v2 = idx.build(emb, k=4, iters=2)
    assert idx.table.snapshot_props(v1) != idx.table.snapshot_props(v2)
    # time-traveled query reproduces v1 exactly (old centroids + old rows)
    assert sorted(map(tuple, idx.query(queries, k=5, version=v1).collect())) == out_v1
    # nprobe larger than the cell count clamps instead of crashing
    assert len(idx.query(queries, k=5, nprobe=64).collect()) > 0


def test_anomaly_mad_paths_equivalent(spark, sf_dir, monkeypatch):
    """The adaptive median must be plan-invariant: the windowed path (small
    groups) and the distributed-selection path (huge groups) compute the
    identical discrete median/MAD/flag set on the same input."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
        analytics,
    )

    windowed = sorted(
        map(tuple, analytics.events_anomaly_mad(spark, sf_dir).collect())
    )
    # force the big-group regime: the distinct-count probe then routes to
    # the value-HISTOGRAM median (fixture values are below the cap)
    monkeypatch.setattr(analytics, "_MAD_MAX_WINDOWED_GROUP", 0)
    hist = sorted(
        map(tuple, analytics.events_anomaly_mad(spark, sf_dir).collect())
    )
    # force the quantile-SLICE selection too
    monkeypatch.setattr(analytics, "_MAD_HIST_MAX_DISTINCT", 0)
    sliced = sorted(
        map(tuple, analytics.events_anomaly_mad(spark, sf_dir).collect())
    )
    assert windowed == hist == sliced


def test_train_quality_classifier_invariants(spark, sf_dir):
    """Distributed full-batch logistic regression must actually learn:
    log-loss starts at ln 2 (zero init) and strictly decreases every
    epoch; final accuracy is at least the majority-class baseline; and a
    re-run reproduces the metrics within float-reduction tolerance."""
    import math

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        train_quality_classifier,
    )

    rows = train_quality_classifier(spark, sf_dir).collect()
    losses = [r.logloss for r in sorted(rows, key=lambda r: r.iter)]
    assert abs(losses[0] - math.log(2)) < 1e-4  # zero-init first epoch
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < 0.6 * math.log(2)

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        text_gopher_quality,
    )

    # majority baseline over the SAME population the trainer sees: docs
    # with non-null text (gopher emits rows for all docs)
    trained_ids = {
        r.doc_id
        for r in load(spark, "documents", sf_dir)
        .filter("text IS NOT NULL")
        .select("doc_id")
        .collect()
    }
    keeps = [
        r.keep
        for r in text_gopher_quality(spark, sf_dir).collect()
        if r.doc_id in trained_ids
    ]
    majority = max(sum(keeps), len(keeps) - sum(keeps)) / len(keeps)
    final = sorted(rows, key=lambda r: r.iter)[-1]
    assert final.accuracy >= majority - 1e-6

    again = train_quality_classifier(spark, sf_dir).collect()
    for a, b in zip(sorted(rows, key=lambda r: r.iter), sorted(again, key=lambda r: r.iter)):
        assert abs(a.logloss - b.logloss) < 1e-3


def test_trained_weights_drop_into_shipped_scorer(spark, sf_dir):
    """The train-then-deploy loop end-to-end: run training, take the
    learned 16-weight model, and score the corpus through the SAME
    expression shape the shipped scorer uses. The learned model's keep
    decisions must agree with the Gopher weak labels at least as well as
    chance, and scoring must produce a valid probability per document."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
        textops,
    )

    mdf, weights, bias = textops.train_quality_model(spark, sf_dir)
    metrics = mdf.collect()
    assert metrics
    assert len(weights) == textops._TQC_DIM == 16

    docs = load(spark, "documents", sf_dir)
    scored = textops.score_with_linear_model(docs, weights, bias).collect()
    n_docs = docs.filter("text IS NOT NULL").count()
    assert len(scored) == n_docs
    assert all(0.0 <= r.quality_score <= 1.0 for r in scored)
    # deploy-time accuracy equals the final training accuracy (same data,
    # same expression): cross-check through the independent scoring path
    keeps = {
        r.doc_id: r.keep
        for r in textops.text_gopher_quality(spark, sf_dir).collect()
    }
    agree = sum(1 for r in scored if r.keep == keeps[r.doc_id]) / len(scored)
    final_acc = sorted(metrics, key=lambda r: r.iter)[-1].accuracy
    assert abs(agree - final_acc) < 0.02, (agree, final_acc)


def test_pca_fit_matches_numpy(spark, sf_dir):
    """The distributed moment pass + driver eig must agree with plain numpy
    PCA over the collected corpus (same centering, same sign rule)."""
    import numpy as np

    fit = similarity._pca_fit(spark, sf_dir)
    n, mean, cov, evals, evecs = fit
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    assert n == len(X)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-10)
    C = np.cov(X, rowvar=False)
    assert np.allclose(cov, C, atol=1e-10)
    ev, W = np.linalg.eigh((C + C.T) / 2.0)
    order = np.argsort(ev)[::-1]
    ev, W = ev[order], W[:, order]
    for j in range(W.shape[1]):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    assert np.allclose(evals, ev, atol=1e-8)
    # eigenvectors can swap arbitrarily within a degenerate eigenvalue
    # cluster; the fixture spectrum is simple, so direct compare holds
    assert np.allclose(evecs, W, atol=1e-6)


def test_pca_components_orthonormal_and_variance_ordered(spark, sf_dir):
    import numpy as np

    _, _, _, evals, evecs = similarity._pca_fit(spark, sf_dir)
    d = evecs.shape[0]
    assert np.allclose(evecs.T @ evecs, np.eye(d), atol=1e-8)
    assert all(evals[i] >= evals[i + 1] - 1e-12 for i in range(len(evals) - 1))
    # deterministic sign rule: max-|loading| entry of each component positive
    for j in range(d):
        i = int(np.argmax(np.abs(evecs[:, j])))
        assert evecs[i, j] > 0


def test_pca_projection_parity_and_variance(spark, sf_dir):
    """Projected coordinates must match numpy (X-μ)W and their per-component
    variance must equal the top eigenvalues."""
    import numpy as np

    _, mean, _, evals, evecs = similarity._pca_fit(spark, sf_dir)
    out = similarity.pca_embeddings_project(spark, sf_dir).collect()
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = [r.vec_id for r in rows]
    k = similarity._PCA_COMPONENTS
    P = (X - mean) @ evecs[:, :k]
    byid = {r.vec_id: [r.pc1, r.pc2, r.pc3, r.pc4] for r in out}
    assert len(byid) == len(ids)
    got = np.array([byid[i] for i in ids])
    assert np.allclose(got, P, atol=1e-4)  # engine rounds to 5 decimals
    # sample variance of each projected coordinate == its eigenvalue
    assert np.allclose(got.var(axis=0, ddof=1), evals[:k], atol=1e-4)


def test_bm25_matches_python_oracle(spark, sf_dir):
    """Pure-Python BM25 over the collected corpus reproduces the engine's
    scores and ranking exactly (after the same 6-decimal rounding)."""
    import math as m
    import re

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import textops

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    # mirror the engine exactly: split('\s+') after trim+lower (an empty
    # string tokenizes to ['']); NULL-text docs are excluded from the
    # corpus entirely — n_docs AND avgdl — per the r8 NULL guard
    docs = [
        (r.doc_id, re.split(r"\s+", r.text.strip().lower()))
        for r in rows
        if r.text is not None
    ]
    n_docs = len(docs)
    avgdl = sum(len(t) for _, t in docs) / len(docs)
    k1, b = textops._BM25_K1, textops._BM25_B
    expected = {}
    for qid, terms in textops._BM25_QUERIES.items():
        scores = {}
        for t in terms:
            df = sum(1 for _, toks in docs if t in toks)
            if df == 0:
                continue
            idf = m.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for doc_id, toks in docs:
                tf = toks.count(t)
                if tf == 0:
                    continue
                dl = len(toks)
                c = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + c
        ranked = sorted(
            ((round(s, 6), doc_id) for doc_id, s in scores.items()),
            key=lambda p: (-p[0], p[1]),
        )[: textops._BM25_TOPK]
        for rank, (s, doc_id) in enumerate(ranked, start=1):
            expected[(qid, rank)] = (doc_id, s)

    got = {
        (r.query_id, r.rank): (r.doc_id, r.bm25)
        for r in textops.bm25_search(spark, sf_dir).collect()
    }
    assert got == expected


def test_mm_feature_extract_null_text_guard(spark, tmp_path):
    """NULL text must be dropped identically by the engine and the oracle
    (ADVICE r6): the engine's decoder would crash on a NULL payload, and
    the oracle would otherwise emit a row of NULLs — both sides now filter."""
    import duckdb

    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "alpha beta", "en", "s1", 10),
            (2, None, "en", "s1", 0),
            (3, "", "en", "s1", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    got = {r.doc_id for r in multimodal.mm_feature_extract(spark, sf).collect()}
    assert got == {1, 3}  # NULL dropped, empty string kept (decodes to zeros)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    oracle = {r[0] for r in con.sql(multimodal.MM_FEATURE_EXTRACT_SQL).fetchall()}
    assert oracle == got


def test_item_pagerank_invariants(spark, sf_dir):
    """PageRank invariants: total rank mass is conserved at exactly 1 (no
    dangling nodes on an undirected edge list), every rank is positive and
    at least the teleport floor (1−d)/N, and node/edge sets agree with the
    co-occurrence graph."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        _PR_DAMPING,
        events_item_cooccurrence,
        item_pagerank,
    )

    rows = item_pagerank(spark, "/root/testdata/sf0.01").collect()
    assert rows
    n = len(rows)
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-5
    floor = (1.0 - _PR_DAMPING) / n
    for r in rows:
        assert r.pagerank >= floor - 1e-9 and r.deg >= 1
    nodes = {r.item for r in rows}
    co = events_item_cooccurrence(spark, "/root/testdata/sf0.01").collect()
    assert nodes == {r.item_a for r in co} | {r.item_b for r in co}


def test_rfm_null_monetary_engines_agree(spark, tmp_path):
    """An all-NULL-value user must score monetary 0 on BOTH engines —
    without the COALESCE, Spark (NULLS FIRST under ASC) and DuckDB (NULLS
    LAST) would NTILE a NULL monetary into different quintiles."""
    import duckdb

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import RFM_SQL, events_rfm_segments

    sf = str(tmp_path)
    rows = [
        (
            i,
            "2024-01-%02d 10:00:00" % (i % 27 + 1),
            i % 4,
            "view",
            None if i % 4 == 0 else float(i),
            '{"k": 1}',
        )
        for i in range(40)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type", "value", "props"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = sorted(map(tuple, events_rfm_segments(spark, sf).collect()))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'")
    want = sorted(map(tuple, con.sql(RFM_SQL).fetchall()))
    assert got == want and len(got) == 4
    by_user = {r[0]: r for r in got}
    assert by_user[0][3] == 0.0  # the all-NULL-value user


def test_item_communities_and_rfm_invariants(spark):
    """LPA: every node gets exactly one community and that community is
    itself a node id; propagation coarsens (#communities ≤ #nodes). RFM:
    quintiles are 1..5 and segments cover every user exactly once."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        events_rfm_segments,
        item_communities,
        item_pagerank,
    )

    sf = "/root/testdata/sf0.01"
    comm = item_communities(spark, sf).collect()
    nodes = {r.item for r in comm}
    assert len(comm) == len(nodes) > 0  # one label per node
    assert {r.community for r in comm} <= nodes
    assert len({r.community for r in comm}) <= len(nodes)
    # same node set as pagerank (both derive from the shared edge CTEs)
    assert nodes == {r.item for r in item_pagerank(spark, sf).collect()}

    rfm = events_rfm_segments(spark, sf).collect()
    assert rfm and len({r.user_id for r in rfm}) == len(rfm)
    for r in rfm:
        assert 1 <= r.r_q <= 5 and 1 <= r.f_q <= 5 and 1 <= r.m_q <= 5
        assert r.segment in {"champion", "loyal", "at_risk", "lost", "regular"}
        assert r.recency_days >= 0 and r.frequency >= 1


def test_mine_triplets_semantics(spark, sf_dir):
    """Triplet-mining invariants against the raw corpus: the mined positive
    shares the anchor's label, the negative differs, each is the true
    hardest (max cosine) of its kind, and pos/neg never collide."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load

    labels = {
        r.vec_id: r.label
        for r in load(spark, "embeddings", sf_dir).select("vec_id", "label").collect()
    }
    rows = similarity.mine_triplets(spark, sf_dir).collect()
    assert rows
    for r in rows:
        a_label = labels[r.anchor_id]
        if r.pos_id is not None:
            assert labels[r.pos_id] == a_label and r.pos_id != r.anchor_id
        if r.neg_id is not None:
            assert labels[r.neg_id] != a_label
        if r.pos_id is not None and r.neg_id is not None:
            assert r.pos_id != r.neg_id
    # spot-verify hardness for one anchor against brute-force cosine
    import numpy as np

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, "embeddings", sf_dir).collect()
    }
    r0 = rows[0]
    a = emb[r0.anchor_id] / np.linalg.norm(emb[r0.anchor_id])
    best = {}
    for vid, v in emb.items():
        if vid == r0.anchor_id or labels[vid] is None:
            continue
        kind = "pos" if labels[vid] == labels[r0.anchor_id] else "neg"
        s = round(float(a @ (v / np.linalg.norm(v))), 5)
        if kind not in best or (s, -vid) > (best[kind][0], -best[kind][1]):
            best[kind] = (s, vid)
    if r0.pos_id is not None:
        assert (r0.pos_sim, r0.pos_id) == best["pos"]
    if r0.neg_id is not None:
        assert (r0.neg_sim, r0.neg_id) == best["neg"]


def test_chunk_documents_covers_and_overlaps(spark, sf_dir):
    """Chunker invariants: every token position is covered, consecutive
    chunks overlap by size−stride, chunk_idx is contiguous from 0, and the
    final chunk may be short but never empty."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
        chunk_documents,
    )

    rows = chunk_documents(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_tok = {
        r.doc_id: len(r.text.strip().lower().split())
        for r in load(spark, "documents", sf_dir).collect()
        if r.text and r.text.strip()
    }
    assert set(by_doc) == {d for d, n in n_tok.items() if n > 0}
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        total = n_tok[doc]
        for i, c in enumerate(chunks):
            start = i * _CHUNK_STRIDE
            want = min(_CHUNK_SIZE, total - start)
            assert c.chunk_tokens == want > 0
            assert len(c.chunk_text.split()) == want
        # coverage: last chunk reaches the final token
        assert (len(chunks) - 1) * _CHUNK_STRIDE + chunks[-1].chunk_tokens == total


def test_text_perplexity_bigram_semantics(spark, tmp_path):
    """Bigram-LM invariants on a crafted corpus: a doc whose transitions
    all repeat a corpus-frequent bigram scores lower perplexity than one
    made of never-adjacent tokens; docs with < 2 tokens drop out; and
    perplexity == exp(−mean_logprob) exactly (computed from the rounded
    mean)."""
    import math

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import text_perplexity_bigram

    sf = str(tmp_path)
    docs = [
        (1, "a b a b a b a b"),     # dominant transitions
        (2, "b b b b"),             # rare transition (b,b) never elsewhere... but trained on itself
        (3, "a a a a"),             # rare transition (a,a)
        (4, "c"),                   # single token: no bigrams
        (5, None),                  # NULL text
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = {r.doc_id: r for r in text_perplexity_bigram(spark, sf).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_bigrams == 7 and out[2].n_bigrams == 3
    for r in out.values():
        assert abs(r.perplexity - round(math.exp(-r.mean_logprob), 4)) < 1e-9
    # doc 1's a↔b transitions are corpus-dominant → lowest perplexity
    assert out[1].perplexity < out[2].perplexity
    assert out[1].perplexity < out[3].perplexity


def test_hybrid_rank_matches_python_oracle_random(spark):
    """hybrid_rank on seeded random corpora with non-default (k, topk, c)
    reproduces a pure-Python RRF oracle exactly — covers the OPERATOR
    surface beyond the pinned registry face the DuckDB oracle checks."""
    import math as m
    import random

    import numpy as np

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import textops
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.retrieval import hybrid_rank

    rng = random.Random(17)
    vocab = ["ant", "bee", "cat", "dog", "elk", "fox"]
    n_docs, dim = 40, 6
    docs_py = {
        i: [vocab[rng.randrange(len(vocab))] for _ in range(rng.randint(2, 8))]
        for i in range(n_docs)
    }
    vecs = {i: [round(rng.uniform(-1, 1), 3) for _ in range(dim)] for i in range(n_docs)}
    qterms_py = {1: ["ant", "cat"], 2: ["dog"]}
    qvecs_py = {1: 5, 2: 23}
    k, topk, c = 7, 5, 10

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs_py.items()], "doc_id long, text string"
    )
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    qterms = spark.createDataFrame(
        [(q, t) for q, ts in qterms_py.items() for t in ts], "query_id int, term string"
    )
    qvecs = spark.createDataFrame(
        sorted(qvecs_py.items()), "query_id int, qvec_id long"
    )
    got = {
        (r.query_id, r.rank): (r.doc_id, r.rrf_score, r.bm25_rank, r.cos_rank)
        for r in hybrid_rank(docs, emb, qterms, qvecs, k=k, topk=topk, c=c).collect()
    }

    # ---- python oracle ----
    n = len(docs_py)
    avgdl = sum(len(t) for t in docs_py.values()) / n
    k1, b = textops._BM25_K1, textops._BM25_B
    want = {}
    for q in qterms_py:
        scores = {}
        for t in qterms_py[q]:
            df = sum(1 for toks in docs_py.values() if t in toks)
            if not df:
                continue
            idf = m.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for i, toks in docs_py.items():
                tf = toks.count(t)
                if tf:
                    dl = len(toks)
                    scores[i] = scores.get(i, 0.0) + idf * (tf * (k1 + 1)) / (
                        tf + k1 * (1 - b + b * dl / avgdl)
                    )
        sparse = [
            d for _, d in sorted(
                ((round(s, 6), i) for i, s in scores.items()),
                key=lambda p: (-p[0], p[1]),
            )[:k]
        ]
        qv = np.array([float(np.float32(x)) for x in vecs[qvecs_py[q]]])
        qv = qv / np.linalg.norm(qv)
        cos = {}
        for i, v in vecs.items():
            if i == qvecs_py[q]:
                continue
            vv = np.array([float(np.float32(x)) for x in v])
            cos[i] = round(float(qv @ (vv / np.linalg.norm(vv))), 5)
        dense = [
            d for _, d in sorted(
                ((s, i) for i, s in cos.items()), key=lambda p: (-p[0], p[1])
            )[:k]
        ]
        fused = {}
        for r, d in enumerate(sparse, 1):
            fused.setdefault(d, [None, None])[0] = r
        for r, d in enumerate(dense, 1):
            fused.setdefault(d, [None, None])[1] = r
        scored = []
        for d, (rs, rd) in fused.items():
            s = (1.0 / (c + rs) if rs else 0.0) + (1.0 / (c + rd) if rd else 0.0)
            scored.append((round(s, 6), d, rs, rd))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (s, d, rs, rd) in enumerate(scored[:topk], 1):
            want[(q, rank)] = (d, s, rs, rd)
    assert got == want


def test_hybrid_rank_rrf_semantics(spark):
    """RRF invariants on a crafted corpus: the fused score equals
    1/(C+r_bm25) + 1/(C+r_cos) with a zero term for a missing list, a doc
    on both lists beats one with the same single rank, ranks contiguous."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.retrieval import _RRF_C, hybrid_rank

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple apple banana"),
            (3, "cherry date elderberry"),
            (4, "fig grape honeydew"),
        ],
        "doc_id long, text string",
    )
    # embeddings: doc 1's vector is the query (qvec_id 1); doc 4 nearest,
    # then 3, then 2 — the REVERSE of the bm25 order for query 1 ("apple")
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.6, 0.8, 0.0]),
            (4, [0.9, 0.1, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    qterms = spark.createDataFrame([(1, "apple")], "query_id int, term string")
    qvecs = spark.createDataFrame([(1, 1)], "query_id int, qvec_id long")
    rows = hybrid_rank(docs, emb, qterms, qvecs, k=3, topk=4).collect()
    by_doc = {r.doc_id: r for r in rows}
    # bm25 list for "apple": [2, 1]; cosine list (excl. self): [4, 3, 2]
    assert by_doc[2].bm25_rank == 1 and by_doc[2].cos_rank == 3
    assert by_doc[1].bm25_rank == 2 and by_doc[1].cos_rank is None
    assert by_doc[4].bm25_rank is None and by_doc[4].cos_rank == 1
    for r in rows:
        want = (1.0 / (_RRF_C + r.bm25_rank) if r.bm25_rank else 0.0) + (
            1.0 / (_RRF_C + r.cos_rank) if r.cos_rank else 0.0
        )
        assert abs(r.rrf_score - round(want, 6)) < 1e-9
    # doc 2 is on BOTH lists → must outrank every single-list doc here
    assert by_doc[2].rank == 1
    assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))


def test_ranking_metrics_hand_computed(spark):
    """ranking_metrics on crafted frames reproduces hand-computed NDCG/MRR/
    recall at a non-default k, including an unjudged-docs-only query and a
    judged-but-unranked doc (lost recall)."""
    import math

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.retrieval import ranking_metrics

    ranked = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (1, 3, 30), (2, 1, 40), (2, 2, 50), (3, 1, 60)],
        "query_id int, rank int, doc_id long",
    )
    # q1: rank-2 doc graded 2, rank-3 doc graded 1, an UNRANKED doc graded 3
    # (caps ideal DCG + costs recall); q2: one judged doc, none ranked;
    # q3: no judgments at all.
    qrels = spark.createDataFrame(
        [(1, 20, 2), (1, 30, 1), (1, 99, 3), (2, 77, 1)],
        "query_id int, doc_id long, grade int",
    )
    got = {
        r.query_id: (r.ndcg, r.mrr, r.recall_at_k, r.hits, r.n_rel)
        for r in ranking_metrics(ranked, qrels, k=3).collect()
    }
    disc = [1.0 / math.log2(r + 1) for r in (1, 2, 3)]
    dcg = 0 * disc[0] + 3 * disc[1] + 1 * disc[2]
    idcg = 7 * disc[0] + 3 * disc[1] + 1 * disc[2]
    assert got[1] == (round(dcg / idcg, 6), 0.5, round(2 / 3, 6), 2, 3)
    assert got[2] == (0.0, 0.0, 0.0, 0, 1)
    assert got[3] == (0.0, 0.0, 0.0, 0, 0)


def test_mmr_rerank_matches_python_oracle_random(spark):
    """mmr_rerank on a seeded random corpus with non-default (k, steps, λ)
    reproduces a pure-Python greedy-MMR oracle exactly — covers the
    OPERATOR surface beyond the pinned registry face."""
    import random

    import numpy as np

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.retrieval import mmr_rerank

    rng = random.Random(23)
    n_docs, dim = 50, 5
    vecs = {
        i: [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
        for i in range(n_docs)
    }
    qvecs_py = {1: 7, 2: 31}
    k, steps, lam = 9, 4, 0.6

    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    qvecs = spark.createDataFrame(
        sorted(qvecs_py.items()), "query_id int, qvec_id long"
    )
    got = {
        (r.query_id, r.step): (r.doc_id, r.mmr_score)
        for r in mmr_rerank(emb, qvecs, k=k, steps=steps, lam=lam).collect()
    }

    # ---- python oracle ----
    def unit(i):
        v = np.array([float(np.float32(x)) for x in vecs[i]])
        return v / np.linalg.norm(v)

    mu = 1 - lam
    want = {}
    for q, qi in qvecs_py.items():
        qv = unit(qi)
        rel = {
            i: round(float(qv @ unit(i)), 5) for i in vecs if i != qi
        }
        cand = [
            i
            for _, i in sorted(
                ((r, i) for i, r in rel.items()), key=lambda p: (-p[0], p[1])
            )[:k]
        ]
        sim = {
            (a, b): round(float(unit(a) @ unit(b)), 5)
            for a in cand
            for b in cand
            if a != b
        }
        selected = []
        remaining = {i: rel[i] for i in cand}
        for step in range(1, steps + 1):
            if not remaining:
                break
            if step == 1:
                vid, score = min(
                    remaining.items(), key=lambda kv: (-kv[1], kv[0])
                )
            else:
                score, vid = min(
                    (
                        (
                            lam * r - mu * max(sim[(v, s)] for s in selected),
                            v,
                        )
                        for v, r in remaining.items()
                    ),
                    key=lambda t: (-t[0], t[1]),
                )
            want[(q, step)] = (vid, round(score, 6) + 0.0)
            selected.append(vid)
            del remaining[vid]
    assert got == want


def test_mmr_rerank_diversifies(spark):
    """MMR semantics on a crafted corpus: step 1 is the plain-relevance
    argmax, and at step 2 a near-duplicate of the first pick loses to a
    less relevant but diverse candidate; λ=1 degenerates to pure
    relevance order."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.retrieval import mmr_rerank

    # qvec 0 = query. doc 1 most relevant; doc 2 a near-clone of doc 1
    # (second most relevant); doc 3 orthogonal-ish to doc 1 but still
    # relevant — diversification must pick 3 over 2 at step 2.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.98, 0.1, 0.0]),
            (2, [0.97, 0.12, 0.0]),
            (3, [0.7, 0.0, 0.7]),
            (4, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    qvecs = spark.createDataFrame([(1, 0)], "query_id int, qvec_id long")
    picks = {
        r.step: r.doc_id
        for r in mmr_rerank(emb, qvecs, k=4, steps=3, lam=0.5).collect()
    }
    assert picks[1] == 1
    assert picks[2] == 3  # the clone (doc 2) is penalized by sim to doc 1
    # λ=1 → no diversity penalty → pure relevance order 1, 2, 3
    pure = {
        r.step: r.doc_id
        for r in mmr_rerank(emb, qvecs, k=4, steps=3, lam=1.0).collect()
    }
    assert [pure[s] for s in (1, 2, 3)] == [1, 2, 3]


def test_pca_covariance_single_row_both_sides_empty(spark, tmp_path):
    """r8 ADVICE fix: on an n=1 embeddings table the engine returns an empty
    frame (fit degenerates), and the oracle's HAVING COUNT(*) >= 2 must
    suppress the NULL-cov rows DuckDB's NULL-on-zero-division would emit."""
    import duckdb

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3])], "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")

    assert similarity.pca_covariance(spark, sf).count() == 0
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet/*.parquet'"
    )
    assert con.sql(similarity.PCA_COVARIANCE_SQL).fetchall() == []


def test_bm25_rank_api_custom_queries(spark):
    """bm25_rank as a standalone operator: custom corpus, custom query
    frame, custom k — tf monotonicity and rank contiguity hold."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple apple banana"),  # higher tf(apple), same length
            (3, "cherry date elderberry"),
            (4, "fig grape honeydew"),
        ],
        "doc_id long, text string",
    )
    qmap = spark.createDataFrame(
        [(1, "apple"), (2, "cherry"), (2, "date")], "query_id int, term string"
    )
    out = bm25_rank(docs, qmap, k=2).collect()
    byq = {}
    for r in out:
        byq.setdefault(r.query_id, []).append(r)
    # q1: doc 2 (tf=2) outranks doc 1 (tf=1); doc 4 matches nothing
    q1 = sorted(byq[1], key=lambda r: r.rank)
    assert [r.doc_id for r in q1] == [2, 1]
    assert q1[0].bm25 > q1[1].bm25
    # q2: doc 3 matches both terms and must rank first
    q2 = sorted(byq[2], key=lambda r: r.rank)
    assert q2[0].doc_id == 3
    # k respected, ranks contiguous from 1
    for rows_ in byq.values():
        assert len(rows_) <= 2
        assert sorted(r.rank for r in rows_) == list(range(1, len(rows_) + 1))


def test_bm25_rank_null_text_excluded(spark):
    """r8 ADVICE fix: NULL-text docs are excluded from the corpus stats
    (avgdl/n_docs) as well as the postings — scores must be identical to a
    corpus that never contained the NULL rows. Without the guard, Spark's
    legacy size(NULL) = -1 shifts avgdl and every score."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import bm25_rank

    clean = [
        (1, "apple banana cherry"),
        (2, "apple apple banana"),
        (3, "cherry date elderberry"),
    ]
    with_nulls = clean + [(4, None), (5, None)]
    qmap = spark.createDataFrame(
        [(1, "apple"), (2, "cherry")], "query_id int, term string"
    )
    schema = "doc_id long, text string"
    want = {
        (r.query_id, r.rank): (r.doc_id, r.bm25)
        for r in bm25_rank(spark.createDataFrame(clean, schema), qmap).collect()
    }
    got = {
        (r.query_id, r.rank): (r.doc_id, r.bm25)
        for r in bm25_rank(
            spark.createDataFrame(with_nulls, schema), qmap
        ).collect()
    }
    assert want == got


def test_bm25_rank_partial_terms_rejected(spark):
    """r8 ADVICE fix: a caller-supplied `terms` list that misses a query
    term must raise, not silently zero that term's contribution."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import bm25_rank

    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, "cherry date")], "doc_id long, text string"
    )
    qmap = spark.createDataFrame(
        [(1, "apple"), (1, "cherry")], "query_id int, term string"
    )
    import pytest

    with pytest.raises(ValueError, match="does not cover"):
        bm25_rank(docs, qmap, terms=["apple"])
    # a covering list (even a superset) is fine
    assert bm25_rank(docs, qmap, terms=["apple", "cherry", "durian"]).count() > 0


def test_curate_multimodal_corpus_semantics(spark, sf_dir, tmp_path):
    """Media capstone invariants on a crafted corpus: exact duplicates keep
    the min-id survivor, the per-source running spend never exceeds the
    budget, and admission is greedy in doc_id order (a later item is out
    iff it would overflow the budget at its turn)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.multimodal import (
        _MM_SOURCE_BUDGET,
        curate_multimodal_corpus,
    )

    sf = str(tmp_path)
    # identical text → identical payload hash AND identical token count
    rows = [(i, "aa bb cc", "en", "s1", 8) for i in range(1, 4)]
    # distinct small items to walk the budget up in one source
    rows += [(10 + i, f"x{i} " * (i + 1), "en", "s2", 4 * (i + 1)) for i in range(8)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    out = sorted(
        curate_multimodal_corpus(spark, sf).collect(), key=lambda r: r.doc_id
    )
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # dedup: of docs 1..3 (identical content) only doc 1 survives
    assert [r.doc_id for r in by_src.get("s1", [])] == [1]
    # budget: running spend monotone and capped
    for src, rs in by_src.items():
        spend = 0
        for r in rs:
            spend += r.vision_tokens
            assert r.cum_tokens == spend
        assert spend <= _MM_SOURCE_BUDGET


def test_session_top_paths_fixture_exact(spark, tmp_path):
    """Hand-built sessions with known gap boundaries: both engines must
    carve identical sessions (1800 s inactivity, the sessionize
    convention), truncate each path to the first 3 events in (ts,
    event_id) order, and rank identically — including the
    sub-second-timestamp case where a naive date_diff vs epoch-cast
    mismatch would flip a boundary."""
    import duckdb

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        SESSION_PATHS_SQL,
        session_top_paths,
    )

    sf = str(tmp_path)
    rows = [
        # user 1: one session of 4 events -> path view>click>buy (truncated)
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:10:00", 1, "click"),
        (3, "2024-01-01 10:20:00", 1, "buy"),
        (4, "2024-01-01 10:25:00", 1, "view"),
        # gap of exactly 1800s -> SAME session (strict > opens a new one)
        (5, "2024-01-01 10:55:00", 1, "click"),
        # gap of 1801s -> new session: view alone
        (6, "2024-01-01 11:25:01", 1, "view"),
        # user 2: two events same ts -> event_id breaks the tie
        (7, "2024-01-02 09:00:00", 2, "click"),
        (8, "2024-01-02 09:00:00", 2, "view"),
        # user 3: NULL event_type / NULL user rows are excluded
        (9, "2024-01-03 09:00:00", 3, None),
        (10, "2024-01-03 09:00:01", None, "view"),
        (11, "2024-01-03 09:00:02", 3, "view"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = [tuple(r) for r in session_top_paths(spark, sf).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'")
    want = [tuple(r) for r in con.sql(SESSION_PATHS_SQL).fetchall()]
    assert got == want
    by_path = {p: n for _, p, n in got}
    assert by_path == {"view>click>buy": 1, "view": 2, "click>view": 1}
    ranks = [r for r, _, _ in got]
    assert ranks == list(range(1, len(got) + 1))


def test_hw_forecast_periodic_series_exact(spark, tmp_path):
    """A perfectly weekly-periodic zero-trend count series is a fixed
    point of the Holt-Winters recurrence: the pinned init recovers the
    cycle exactly, every in-sample one-step error is 0, the forecasts
    replay the next cycle verbatim, and the backtest scores both HW and
    seasonal-naive at 0 (hw_wins on the <= tie rule)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        events_hw_backtest,
        events_hw_forecast,
    )

    cycle = [3, 1, 4, 1, 5, 9, 2]  # counts per dow, repeated 4 weeks
    rows = []
    eid = 0
    for d in range(28):
        for _ in range(cycle[d % 7]):
            eid += 1
            rows.append((eid, f"2024-01-{d + 1:02d} 12:00:00", 1, "a", 1.0, "{}"))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    (fc,) = events_hw_forecast(spark, sf).collect()
    assert fc.n_days == 28 and fc.mae_1step == 0.0
    assert fc.trend == 0.0
    got = [getattr(fc, f"forecast_h{h}") for h in range(1, 8)]
    assert got == [float(c) for c in cycle], got

    (bt,) = events_hw_backtest(spark, sf).collect()
    assert (bt.mae_hw, bt.mae_snaive, bt.hw_wins) == (0.0, 0.0, 1)


def test_theil_sen_resists_planted_outlier(spark):
    """On a clean line y = 2i + 3 with ONE wild spike, Theil–Sen must
    recover slope 2 exactly (the spike touches < 29% of pairs) while OLS
    is visibly dragged — the robustness contrast the op reports."""
    from datetime import date

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        theil_sen_from_grid,
    )

    n_days = 21
    rows = [
        (
            "a",
            date(2024, 1, 1 + i),
            # spike on the LAST day — max x-leverage (a spike at mean-x
            # would leave OLS untouched)
            (2 * (i + 1) + 3) + (500 if i == n_days - 1 else 0),
        )
        for i in range(n_days)
    ]
    grid = spark.createDataFrame(rows, "event_type string, day date, n long")
    (r,) = theil_sen_from_grid(grid).collect()
    assert r.n_days == n_days
    assert r.n_pairs == n_days * (n_days - 1) // 2
    assert r.ts_slope == 2.0, r
    assert r.ts_intercept == 3.0, r
    assert abs(r.ols_slope - 2.0) > 1.0, "OLS should be dragged by the spike"


def test_session_overlap_prune_is_exact(spark, sf_dir):
    """The length-pruned top-20 must equal a brute-force O(n²) pairwise
    sweep over the same sessionized frame — the prune is an exactness
    proof (overlap ≤ min length), not a heuristic."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.windows import (
        _OVL_TOPK,
        join_session_overlap,
        session_rollup,
    )
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load

    got = [tuple(r) for r in join_session_overlap(spark, sf_dir).collect()]
    sess = [
        (r.user_id, r.session_id,
         int(r.session_start.timestamp() * 1_000_000),
         int(r.session_end.timestamp() * 1_000_000))
        for r in session_rollup(load(spark, "events", sf_dir)).collect()
    ]
    brute = []
    for i in range(len(sess)):
        for j in range(len(sess)):
            ua, sa, sta, ena = sess[i]
            ub, sb, stb, enb = sess[j]
            if ua < ub and sta <= enb and stb <= ena:
                brute.append(
                    (ua, sa, ub, sb, min(ena, enb) - max(sta, stb))
                )
    brute.sort(key=lambda t: (-t[4], t[0], t[1], t[2], t[3]))
    want = [(a, b, c, d, e) for a, b, c, d, e in brute[:_OVL_TOPK]]
    assert got == want and got


def test_ppmi_similarity_second_order(spark, tmp_path):
    """'cat' and 'dog' never co-occur but share exactly the contexts
    {food, water}: the PPMI-cosine face must score the pair high with
    adjacent = 0 — the second-order signal raw co-occurrence cannot
    see."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        text_ppmi_similarity,
    )

    rows = []
    for i in range(20):
        animal = "cat" if i % 2 == 0 else "dog"
        rows.append(
            (i, f"{animal} food {animal} water", "en", "s", 20)
        )
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = {(r.tok_a, r.tok_b): r for r in text_ppmi_similarity(spark, sf).collect()}
    r = out[("cat", "dog")]
    assert r.adjacent == 0
    assert r.n_shared_ctx == 2
    assert r.ppmi_cosine > 0.9, r


def test_proximity_min_window_hand_case(spark, tmp_path):
    """Hand-verified minimal spans: doc 1's best window for (spark,
    table, scan) is 3 tokens (positions 3..5), doc 2 holds the terms
    far apart (window 9), and a doc missing one term never qualifies."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        proximity_min_window,
    )

    rows = [
        (1, "spark x x table scan spark table y scan", "en", "s", 40),
        (2, "spark a b c table d e f scan", "en", "s", 30),
        (3, "spark table only here", "en", "s", 20),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = [
        r
        for r in proximity_min_window(spark, sf).collect()
        if r.query_id == 1  # (spark, table, scan)
    ]
    assert [(r.rank, r.doc_id, r.window_len) for r in out] == [
        (1, 1, 3),
        (2, 2, 9),
    ]


def test_markov_removal_credits_causal_channels(spark, tmp_path):
    """Every conversion runs start→view→click→conv while signup users
    never convert: removing view or click must kill ALL conversions
    (removal effect 1, equal credit), and signup must earn exactly
    zero — the causal-role property position rules cannot express."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        attribution_markov_removal,
    )

    rows, eid = [], 0
    for u in range(10):
        for i, typ in enumerate(("view", "click", "purchase")):
            eid += 1
            rows.append((eid, 3 * u + i, u, typ, 1.0, "{}"))
    for u in range(10, 20):
        eid += 1
        rows.append((eid, 3 * u, u, "signup", 1.0, "{}"))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, m int, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(TIMESTAMP'2024-05-01 00:00:00' + make_interval(0,0,0,0,0,m,0)"
        " AS TIMESTAMP) AS ts",
        "user_id", "event_type", "value", "props",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    out = {r.channel: r for r in attribution_markov_removal(spark, sf).collect()}
    assert set(out) == {"view", "click", "signup"}
    assert out["signup"].removal_effect == 0.0
    assert out["view"].removal_effect == 1.0
    assert out["click"].removal_effect == 1.0
    assert out["view"].attribution_share == 0.5
    assert out["click"].attributed_conversions == 5.0
    assert out["signup"].attributed_conversions == 0.0

    # exact Shapley on the same graph: v(S) = 0.5 iff BOTH view and
    # click ∈ S, so φ_view = φ_click = 0.25, φ_signup = 0 (null
    # player), and Σφ = v(full) − v(∅) = 0.5 (efficiency axiom)
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        attribution_shapley,
    )

    sh = {r.channel: r for r in attribution_shapley(spark, sf).collect()}
    assert sh["view"].shapley_value == 0.25
    assert sh["click"].shapley_value == 0.25
    assert sh["signup"].shapley_value == 0.0
    assert sh["view"].attribution_share == 0.5
    assert sh["click"].attributed_conversions == 5.0


def test_kleinberg_burst_finds_planted_episode(spark, tmp_path):
    """A flat two-type corpus with type 'a' surging 15x on days 10-14
    must decode to EXACTLY one burst interval covering those days (the
    Viterbi entry cost merges them into one episode), with no burst rows
    for the steady background type, events = the interval's true count,
    and expected < events."""
    from datetime import date

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        events_burst_kleinberg,
    )

    rows, eid = [], 0
    for d in range(30):
        n_a = 30 if 9 <= d <= 13 else 2
        for typ, cnt in (("a", n_a), ("b", 10)):
            for _ in range(cnt):
                eid += 1
                rows.append((eid, d, 1, typ, 1.0, "{}"))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, d int, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(DATE_ADD(DATE'2024-03-01', d) AS TIMESTAMP) AS ts",
        "user_id", "event_type", "value", "props",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    out = events_burst_kleinberg(spark, sf).collect()
    assert [r.event_type for r in out] == ["a"], out
    (r,) = out
    assert (r.burst_start, r.burst_end) == (date(2024, 3, 10), date(2024, 3, 14))
    assert r.n_days == 5 and r.events == 150
    assert r.expected < r.events


def test_conformal_coverage_and_regime_break(spark, tmp_path):
    """On a perfectly weekly-periodic series the lag-7 residuals are all
    zero: q = 0 and holdout coverage = 1.0. Planting a regime break in
    the held-out week must collapse coverage to 0 while q stays 0 — the
    early-warning property the op exists for."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        events_forecast_conformal,
    )

    cycle = [3, 1, 4, 1, 5, 9, 2]

    def write(sf, burst_last_week):
        rows, eid = [], 0
        for d in range(35):
            cnt = cycle[d % 7] + (10 if burst_last_week and d >= 28 else 0)
            for _ in range(cnt):
                eid += 1
                rows.append((eid, d, 1, "a", 1.0, "{}"))
        df = spark.createDataFrame(
            rows,
            "event_id long, d int, user_id long, event_type string,"
            " value double, props string",
        ).selectExpr(
            "event_id",
            "CAST(DATE_ADD(DATE'2024-01-01', d) AS TIMESTAMP) AS ts",
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.parquet(f"{sf}/events.parquet")

    sf_clean = str(tmp_path / "clean")
    write(sf_clean, burst_last_week=False)
    (r,) = events_forecast_conformal(spark, sf_clean).collect()
    assert (r.q_resid, r.n_test, r.coverage) == (0, 7, 1.0), r

    sf_burst = str(tmp_path / "burst")
    write(sf_burst, burst_last_week=True)
    (rb,) = events_forecast_conformal(spark, sf_burst).collect()
    assert rb.q_resid == 0 and rb.coverage == 0.0, rb


def test_champion_bm25_scores_are_true_bm25(spark, sf_dir):
    """Champion-list retrieval is inexact only in MEMBERSHIP: every
    (query, doc) it returns must carry exactly the score the full BM25
    ranking assigns that doc, and the full ranking's #1 doc (whose tf on
    some query term is champion-grade by Zipf) must be recalled."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        _BM25_QUERIES,
        bm25_champion_search,
        bm25_rank,
        bm25_search,
    )
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load

    champ = bm25_champion_search(spark, sf_dir).collect()
    assert champ
    qmap = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts],
        "query_id int, term string",
    )
    full = {
        (r.query_id, r.doc_id): r.bm25
        for r in bm25_rank(
            load(spark, "documents", sf_dir), qmap, k=10**6
        ).collect()
    }
    for r in champ:
        assert full[(r.query_id, r.doc_id)] == r.bm25, r
    top1 = {
        r.query_id: r.doc_id for r in bm25_search(spark, sf_dir).collect()
        if r.rank == 1
    }
    champ_top1 = {r.query_id: r.doc_id for r in champ if r.rank == 1}
    hits = sum(1 for q, d in top1.items() if champ_top1.get(q) == d)
    assert hits >= len(top1) - 1, (top1, champ_top1)


def test_simrank_sees_structural_twins(spark, tmp_path):
    """Two items with IDENTICAL neighborhoods but zero co-occurrence
    (users touch {1,3,4} or {2,3,4}, never 1 and 2 together) must rank
    as the TOP SimRank pair with co_users = 0 — the structural-
    equivalence signal the direct-overlap family scores zero."""
    import json as _json

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        item_simrank,
    )

    rows, eid = [], 0
    for u in range(10):
        items = (1, 3, 4) if u < 5 else (2, 3, 4)
        for it in items:
            eid += 1
            rows.append(
                (
                    eid,
                    f"2024-01-{(eid % 27) + 1:02d} 10:00:00",
                    u,
                    "click",
                    1.0,
                    _json.dumps({"k": it}),
                )
            )
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    out = item_simrank(spark, sf).collect()
    assert out
    assert all(0.0 < r.simrank <= 1.0 for r in out)
    top = out[0]
    assert (top.item_a, top.item_b, top.co_users) == (1, 2, 0), out[:3]


def test_neyman_allocation_favors_variance(spark, tmp_path, sf_dir):
    """Equal-size strata with unequal spread: the high-variance language
    must receive more of the budget (the Neyman property), the full
    budget must be spent exactly, and n_taken == n_alloc when strata are
    large enough."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.sampling import (
        _NEY_BUDGET,
        sample_neyman_allocation,
    )

    rows = []
    for i in range(300):
        rows.append((i, "t", "flat", "s", 1000))  # zero variance
        rows.append((i + 1000, "t", "wild", "s", 100 + (i * 37) % 2000))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = {r.lang: r for r in sample_neyman_allocation(spark, sf).collect()}
    assert out["wild"].n_alloc > out["flat"].n_alloc
    assert out["flat"].n_alloc == 0  # zero variance earns zero budget
    assert sum(r.n_alloc for r in out.values()) == _NEY_BUDGET
    assert all(r.n_taken == min(r.n_alloc, r.n_stratum) for r in out.values())

    # real corpus: budget spent exactly, checksums commit to membership
    real = sample_neyman_allocation(spark, sf_dir).collect()
    assert sum(r.n_alloc for r in real) == _NEY_BUDGET
    assert all(
        (r.n_taken == 0) == (r.sample_checksum == 0) for r in real
    )


def test_plsa_separates_planted_topics(spark, tmp_path):
    """Two disjoint planted vocabularies (sports vs cooking) must come
    out as distinct dominant topics: some topic's entire top-term list
    draws from one vocabulary, another's from the other — and the
    factor-table invariants hold (probabilities in (0,1], shares
    positive and summing to ~1)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        _PLSA_K,
        _PLSA_TOP,
        text_topic_plsa,
    )

    sports = "goal match team score player coach league win pitch referee"
    cooking = "flour oven bake sugar butter recipe dough salt whisk pan"
    rows = []
    for i in range(40):
        words = (sports if i % 2 == 0 else cooking).split()
        # rotate so every doc is a different ordering of its vocabulary
        text = " ".join(words[i % 10 :] + words[: i % 10])
        rows.append((i, text, "en", "fixture", len(text)))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    out = text_topic_plsa(spark, sf).collect()
    assert len(out) == _PLSA_K * _PLSA_TOP
    assert all(0.0 < r.p_term_topic <= 1.0 for r in out)
    shares = {r.topic: r.topic_share for r in out}
    assert all(s > 0 for s in shares.values())
    assert abs(sum(shares.values()) - 1.0) < 1e-3
    s_set, c_set = set(sports.split()), set(cooking.split())
    by_topic = {}
    for r in out:
        by_topic.setdefault(r.topic, set()).add(r.term)
    pure_s = [t for t, terms in by_topic.items() if terms <= s_set]
    pure_c = [t for t, terms in by_topic.items() if terms <= c_set]
    assert pure_s and pure_c, by_topic


def test_bootstrap_ci_invariants(spark, sf_dir):
    """The percentile band must bracket the point estimate (40 replicates
    of a mean around its own center), the band must be ordered, and the
    pinned Poisson(1) inverse-CDF table must draw with mean ≈ 1 — the
    property that makes Poisson-bootstrap replicates exchangeable with
    the classic n-with-replacement bootstrap."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        _pois1_weight,
        bootstrap_ci_order_value,
    )

    rows = bootstrap_ci_order_value(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ci_lo <= r.ci_hi
        assert r.ci_lo <= r.mean_value <= r.ci_hi, r

    draws = (
        spark.range(20000)
        .select(_pois1_weight((F.col("id") % 10000) / 10000.0).alias("w"))
        .agg(
            F.avg("w").alias("m"),
            F.max("w").alias("mx"),
            F.min("w").alias("mn"),
        )
        .collect()[0]
    )
    assert 0.95 < draws.m < 1.05, draws
    assert draws.mn == 0 and draws.mx <= 7


def test_hw_forecast_short_series_null_contract(spark, tmp_path):
    """A grid spanning fewer than 2m days emits the type with NULL
    state (and the backtest NULL metrics) instead of erroring — the
    documented insufficient-series contract."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        events_hw_backtest,
        events_hw_forecast,
    )

    rows = [
        (i + 1, f"2024-01-{(i % 5) + 1:02d} 08:00:00", 1, "a", 1.0, "{}")
        for i in range(10)
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    (fc,) = events_hw_forecast(spark, sf).collect()
    assert fc.n_days == 5
    assert fc.level is None and fc.trend is None and fc.forecast_h1 is None
    (bt,) = events_hw_backtest(spark, sf).collect()
    assert bt.mae_hw is None and bt.mae_snaive is None and bt.hw_wins is None


def test_session_top_paths_invariants(spark):
    """On the real corpus: ranks are dense 1..k (k ≤ 20), counts
    non-increasing with rank, ties broken by path asc, and every path has
    at most 3 hops drawn from the event-type vocabulary."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        _PATH_LEN,
        _PATH_TOPK,
        session_top_paths,
    )

    sf = "/root/testdata/sf0.01"
    rows = session_top_paths(spark, sf).collect()
    assert 0 < len(rows) <= _PATH_TOPK
    vocab = {
        r.event_type
        for r in load(spark, "events", sf).select("event_type").distinct().collect()
        if r.event_type is not None
    }
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert (prev.n_sessions, cur.path) > (cur.n_sessions, prev.path) or (
            prev.n_sessions > cur.n_sessions
        )
        assert cur.n_sessions <= prev.n_sessions
    for r in rows:
        parts = r.path.split(">")
        assert 1 <= len(parts) <= _PATH_LEN and set(parts) <= vocab


def test_attribution_last_touch_fixture_exact(spark, tmp_path):
    """Hand-built journeys: credit goes to the most recent touch within
    7 days (ties broken by event_id), conversions with no prior touch or
    only stale touches are 'direct', and touches AFTER the conversion
    never count. Engine and oracle must agree exactly."""
    import duckdb

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        ATTRIBUTION_SQL,
        attribution_last_touch,
    )

    sf = str(tmp_path)
    rows = [
        # user 1: click then view then purchase -> credited to view
        (1, "2024-01-01 10:00:00", 1, "click", None),
        (2, "2024-01-01 11:00:00", 1, "view", None),
        (3, "2024-01-01 12:00:00", 1, "purchase", 10.0),
        # user 2: touch 8 days before purchase -> outside lookback: direct
        (4, "2024-01-01 00:00:00", 2, "click", None),
        (5, "2024-01-09 00:00:01", 2, "purchase", 20.0),
        # user 3: purchase with NO prior event at all -> direct;
        # the view AFTER it must not be credited
        (6, "2024-01-02 09:00:00", 3, "purchase", 5.0),
        (7, "2024-01-02 10:00:00", 3, "view", None),
        # user 4: same-ts touch and purchase; touch has SMALLER event_id so
        # it precedes the purchase in (ts, event_id) order -> signup
        (8, "2024-01-03 09:00:00", 4, "signup", None),
        (9, "2024-01-03 09:00:00", 4, "purchase", 7.5),
        # user 5: error events are not touches -> direct
        (10, "2024-01-04 09:00:00", 5, "error", None),
        (11, "2024-01-04 09:30:00", 5, "purchase", None),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type", "value"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = {r.channel: (r.n_conversions, r.attributed_value)
           for r in attribution_last_touch(spark, sf).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'")
    want = {c: (n, v) for c, n, v in con.sql(ATTRIBUTION_SQL).fetchall()}
    assert got == want
    assert got == {
        "view": (1, 10.0),
        "direct": (3, 25.0),
        "signup": (1, 7.5),
    }


def test_dau_wau_mau_fixture_and_invariants(spark, tmp_path):
    """Trailing windows on a sparse spine: WAU/MAU look back over calendar
    days (not observed rows), and on the real corpus dau ≤ wau ≤ mau with
    one row per observed activity day."""
    import datetime

    import duckdb

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        DAU_WAU_MAU_SQL,
        events_dau_wau_mau,
    )

    sf = str(tmp_path)
    rows = [
        # day 1: users 1,2 · day 5: user 2 · day 40: user 3 (gap > 28d)
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 11:00:00", 2, "view"),
        (3, "2024-01-05 10:00:00", 2, "click"),
        (4, "2024-02-09 10:00:00", 3, "view"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = {r.day: (r.dau, r.wau, r.mau)
           for r in events_dau_wau_mau(spark, sf).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'")
    want = {d: (a, w, m) for d, a, w, m in con.sql(DAU_WAU_MAU_SQL).fetchall()}
    assert got == want
    d = datetime.date
    assert got == {
        d(2024, 1, 1): (2, 2, 2),
        d(2024, 1, 5): (1, 2, 2),   # user 1's day-1 visit still in WAU/MAU
        d(2024, 2, 9): (1, 1, 1),   # 35-day gap: nobody else in MAU
    }

    real = events_dau_wau_mau(spark, "/root/testdata/sf0.01").collect()
    assert len(real) == len({r.day for r in real}) > 0
    for r in real:
        assert 1 <= r.dau <= r.wau <= r.mau


def test_basket_association_rules_consistency(spark):
    """Rules agree with the co-occurrence op they share CTEs with: same
    lift per unordered pair, confidence ≥ the gate and ≤ 1, support ≤
    confidence, and both directions of a kept pair appear iff each clears
    the confidence gate on its own antecedent count."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        _RULE_MIN_CONF,
        basket_association_rules,
        events_item_cooccurrence,
    )

    sf = "/root/testdata/sf0.01"
    rules = basket_association_rules(spark, sf).collect()
    assert rules
    co_lift = {(r.item_a, r.item_b): r.lift
               for r in events_item_cooccurrence(spark, sf).collect()}
    for r in rules:
        assert r.antecedent != r.consequent
        assert _RULE_MIN_CONF <= r.confidence <= 1.0
        assert 0 < r.support <= r.confidence
        key = (min(r.antecedent, r.consequent), max(r.antecedent, r.consequent))
        assert abs(co_lift[key] - r.lift) < 1e-9


def test_ann_recall_eval_agrees_with_components(spark, sf_dir):
    """The recall frame must equal an independent set-intersection of its
    two constituent operators' outputs, and aggregate recall must clear
    the family's random-data floor."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        ann_ivf_index,
        ann_recall_eval,
        knn_bruteforce,
    )

    got = {r.q_id: (r.n_hits, r.n_exact, r.recall)
           for r in ann_recall_eval(spark, sf_dir).collect()}
    ivf = {}
    for r in ann_ivf_index(spark, sf_dir).collect():
        ivf.setdefault(r.q_id, set()).add(r.vec_id)
    exact = {}
    for r in knn_bruteforce(spark, sf_dir).collect():
        exact.setdefault(r.q_id, set()).add(r.vec_id)
    assert set(got) == set(exact)
    for q, (nh, ne, rec) in got.items():
        hits = len(ivf.get(q, set()) & exact[q])
        assert (nh, ne) == (hits, len(exact[q]))
        assert abs(rec - round(hits / len(exact[q]), 6)) < 1e-12
    total = sum(h for h, _, _ in got.values()) / sum(n for _, n, _ in got.values())
    assert total > 0.05, f"aggregate IVF recall suspiciously low: {total}"


def test_bm25_prf_expands_recall(spark):
    """PRF semantics on a crafted corpus: a document that lacks every
    original query term but shares the feedback docs' dominant vocabulary
    is absent from plain BM25 yet present after expansion; original-term
    docs still rank."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.retrieval import bm25_prf_rank
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "apple banana banana cherry"),
            (2, "apple banana fig"),
            (3, "banana banana grape"),   # no 'apple' — only PRF finds it
            (4, "kiwi lemon mango"),      # unrelated vocabulary
        ],
        "doc_id long, text string",
    )
    qterms = spark.createDataFrame([(1, "apple")], "query_id int, term string")
    plain = {r.doc_id for r in bm25_rank(docs, qterms, k=10).collect()}
    assert plain == {1, 2}
    prf = {r.doc_id for r in bm25_prf_rank(docs, qterms, fb=2, n_exp=1).collect()}
    # feedback docs {1,2} vote 'banana' (tf 3) as the expansion term
    assert {1, 2, 3} <= prf and 4 not in prf


def test_pack_chop_identities(spark, sf_dir):
    """Boundary-split packing invariants: (a) token conservation -- the
    placement manifest carries every chunk token exactly once; (b) every
    CLOSED sequence (one that is not its bucket's last) holds exactly
    _PACK_BUDGET tokens -- the zero-padding-waste property that makes
    concat-and-chop the standard pretraining packer; (c) placements tile
    contiguously: within a bucket, each chunk starts exactly where the
    previous one ended."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        _PACK_BUDGET,
        chunk_documents,
        pack_training_sequences,
    )

    placed = pack_training_sequences(spark, sf_dir).collect()
    chunks = chunk_documents(spark, sf_dir).collect()
    assert sum(r.chunk_tokens for r in placed) == sum(
        r.chunk_tokens for r in chunks
    )
    assert len(placed) == len(chunks)
    by_bucket = {}
    for r in placed:
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: (r.start_seq, r.start_off, r.doc_id))
        # (c) contiguous tiling
        off = 0
        for r in rows:
            assert r.start_seq * _PACK_BUDGET + r.start_off == off
            assert r.end_seq == (off + r.chunk_tokens - 1) // _PACK_BUDGET
            off += r.chunk_tokens
        # (b) closed sequences are exactly full
        total = off
        n_closed = total // _PACK_BUDGET
        assert rows[-1].end_seq == (
            n_closed if total % _PACK_BUDGET else n_closed - 1
        )


def test_pack_sequences_next_fit_hand_case(spark):
    """Atomic next-fit on one bucket, hand-computed: chunks of sizes
    [60, 50, 30, 120, 10] against budget 128 in md5 order must close a
    sequence exactly when the next chunk would overflow it, and never
    split a chunk."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import pack_chunks_next_fit

    sizes = {0: 60, 1: 50, 2: 30, 3: 120, 4: 10}
    chunks = spark.createDataFrame(
        [(7, i, n) for i, n in sizes.items()],
        "doc_id long, chunk_idx int, chunk_tokens int",
    )
    got = {
        r.chunk_idx: r.seq for r in pack_chunks_next_fit(chunks, 1, budget=128).collect()
    }
    # replay next-fit in the same md5(doc_id:chunk_idx) order
    import hashlib

    order = sorted(
        sizes, key=lambda i: hashlib.md5(f"7:{i}".encode()).hexdigest()
    )
    fill, seq, want = 0, -1, {}
    for i in order:
        if seq < 0 or fill + sizes[i] > 128:
            seq, fill = seq + 1, sizes[i]
        else:
            fill += sizes[i]
        want[i] = seq
    assert got == want
    # conservation: every chunk appears exactly once
    assert set(got) == set(sizes)


def test_pack_sequences_partition_invariant(spark, sf_dir):
    """The packing assignment must be a pure function of the data: a
    repartitioned/shuffled input produces the identical assignment (the
    md5-ordered per-bucket fold, not arrival order)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        chunk_documents,
        pack_chunks_next_fit,
    )

    chunks = chunk_documents(spark, sf_dir).select(
        "doc_id", "chunk_idx", "chunk_tokens"
    )
    a = sorted(map(tuple, pack_chunks_next_fit(chunks, 8).collect()))
    b = sorted(
        map(tuple, pack_chunks_next_fit(chunks.repartition(17, "chunk_idx"), 8).collect())
    )
    assert a == b and a
    # next-fit never overflows the budget within a sequence
    from collections import defaultdict

    fill = defaultdict(int)
    for bucket, seq, _d, _i, n in a:
        fill[(bucket, seq)] += n
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import _PACK_BUDGET

    assert all(v <= _PACK_BUDGET for v in fill.values())


def test_unigram_lm_conservation_and_greedy(spark, sf_dir):
    """Unigram-LM trainer invariants: (a) character conservation --
    Σ count·piece_len over the final vocabulary equals Σ freq·len(word)
    over the capped word-type table (greedy segmentation re-tiles every
    character exactly once); (b) the greedy fold is longest-match: no
    emitted piece could be extended to a longer vocab piece at the same
    position (checked on the memoized segmentation frame)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        _UNI_MAXP,
        _uni_state,
        _uni_word_table,
        load,
        train_unigram_lm,
    )
    from pyspark.sql import functions as F

    vocab_rows = train_unigram_lm(spark, sf_dir).collect()
    words = _uni_word_table(load(spark, "documents", sf_dir)).collect()
    assert sum(r["count"] * r.piece_len for r in vocab_rows) == sum(
        r.freq * len(r.word) for r in words
    )
    vocab, word_pieces = _uni_state(spark, sf_dir)
    vset = set(vocab)
    for r in word_pieces.limit(200).collect():
        pos = 0
        for piece in r.pieces:
            assert r.word[pos : pos + len(piece)] == piece
            # longest-match: no longer vocab piece starts here
            for L in range(len(piece) + 1, _UNI_MAXP + 1):
                assert r.word[pos : pos + L] not in vset or len(
                    r.word[pos : pos + L]
                ) < L
            pos += len(piece)
        assert pos == len(r.word)


def test_bm25_prf_index_path_matches_docs_path(spark, sf_dir):
    """bm25_prf_rank over the materialized inverted index must return
    EXACTLY what the tokenize-on-the-fly path returns — the r13 rewrite
    that serves both PRF passes (and the feedback vote) from postings is
    only legitimate because postings/stats are mergeable sums with exact
    parity to the batch derivation."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load_spread
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.retrieval import (
        _BM25_QUERIES,
        bm25_prf_rank,
    )
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        materialized_bm25_index,
    )

    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts],
        "query_id int, term string",
    )
    docs = load_spread(spark, "documents", sf_dir)
    postings, stats = materialized_bm25_index(spark, sf_dir)
    via_docs = sorted(map(tuple, bm25_prf_rank(docs, qterms).collect()))
    via_index = sorted(
        map(
            tuple,
            bm25_prf_rank(
                None, qterms, postings=postings, stats_partials=stats
            ).collect(),
        )
    )
    assert via_docs == via_index and via_index


def test_dedup_prefix_jaccard_exactness(spark, tmp_path):
    """The prefix filter must be EXACT at theta (the AllPairs guarantee,
    unlike the df-cap heuristic or LSH): on a crafted corpus, the
    operator's pair set equals the brute-force all-pairs set of exact
    3-shingle Jaccard >= 7/10 -- recall AND precision 1.0."""
    import itertools

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.dedup import dedup_prefix_jaccard

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [
        (1, base),
        (2, base + " extra"),                      # near-dup of 1
        (3, base.replace("fox", "cat")),           # near-dup of 1
        (4, "completely different words entirely unrelated content here now"),
        (5, base),                                 # exact dup of 1
        (6, "the quick brown fox sentence shares a few shingles only"),
    ]
    out = tmp_path / "sf"
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(out / "documents.parquet")
    )
    got = {
        (r.doc_a, r.doc_b) for r in dedup_prefix_jaccard(spark, str(out)).collect()
    }

    def sh3(text):
        t = text.lower().split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    want = set()
    for (a, ta), (b, tb) in itertools.combinations(docs, 2):
        A, B = sh3(ta), sh3(tb)
        inter = len(A & B)
        union = len(A | B)
        if union and inter * 10 >= union * 7:
            want.add((a, b))
    assert got == want and (1, 5) in want


def test_scd2_asof_lookup_unique_resolution(spark, sf_dir):
    """Every purchase must resolve to EXACTLY one dimension version (the
    half-open periods partition each user's timeline from their first
    event), and the resolved state must equal the user's event_type run
    covering the purchase timestamp."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.windows import (
        scd2_asof_lookup,
        scd2_from_events,
    )

    rows = scd2_asof_lookup(spark, sf_dir).collect()
    assert rows
    # one row per purchase event
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids))
    # spot-verify 20 rows against the dimension
    dim = {}
    for d in scd2_from_events(spark, sf_dir).collect():
        dim.setdefault(d.user_id, []).append(d)
    for r in rows[:20]:
        matches = [
            d
            for d in dim[r.user_id]
            if d.valid_from <= r.ts and (d.valid_to is None or r.ts < d.valid_to)
        ]
        assert len(matches) == 1
        assert (matches[0].version, matches[0].state) == (r.version, r.state)


def test_chunk_cdc_shift_stability(spark, tmp_path):
    """The defining CDC property (and why it beats fixed-stride chunking
    for dedup): prepending tokens to a document changes only the chunks
    BEFORE the first surviving boundary -- every chunk that starts after
    it keeps a byte-identical content hash, because boundaries are a
    local function of the token window.  Fixed-stride chunk_documents
    re-frames everything after an insert; chunk_cdc must not."""
    import random

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import chunk_cdc

    rng = random.Random(7)
    words = [f"w{rng.randrange(5000)}" for _ in range(600)]
    orig = " ".join(words)
    shifted = "zzz qqq " + orig
    df = spark.createDataFrame(
        [(1, orig), (2, shifted)], "doc_id long, text string"
    )
    out = tmp_path / "sf"
    df.write.parquet(str(out / "documents.parquet"))
    rows = chunk_cdc(spark, str(out)).collect()
    h1 = [r.chunk_hash for r in sorted(
        (r for r in rows if r.doc_id == 1), key=lambda r: r.chunk_ord)]
    h2 = [r.chunk_hash for r in sorted(
        (r for r in rows if r.doc_id == 2), key=lambda r: r.chunk_ord)]
    assert len(h1) > 5, "fixture too short to form several chunks"
    # every chunk of the original except (at most) the first must
    # reappear verbatim in the shifted document
    assert set(h1[1:]) <= set(h2)
    # and the shared tail is in the same order
    k = h2.index(h1[1])
    assert h2[k : k + len(h1) - 1] == h1[1:]


def test_user_survival_km_hand_computed(spark, tmp_path):
    """Kaplan-Meier on crafted lifetimes, checked against the textbook
    estimator: lifetimes (days, died) = 5 users churning at T=2 (x2),
    T=5, T=9 and two censored (active on the max date).  S(2)=1-2/6,
    S(5)=S(2)*(1-1/4)... wait -- derive in-code from the definition and
    compare, so the test pins the ESTIMATOR, not hand arithmetic."""
    import json as _json
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import user_survival_km

    # user u: first event day0 + events through day0+T; censored users'
    # last event lands ON the max date (gap 0)
    rows = []
    eid = 0
    base = "2024-03-0"

    def add(user, d_first, d_last):
        nonlocal eid
        for d in (d_first, d_last):
            eid += 1
            rows.append((eid, f"2024-03-{d:02d} 12:00:00", user, "e", 1.0))

    # max date will be 2024-03-20
    add(1, 1, 3)    # T=2  died
    add(2, 1, 3)    # T=2  died
    add(3, 2, 7)    # T=5  died
    add(4, 3, 12)   # T=9  died
    add(5, 1, 20)   # T=19 censored (on max date)
    add(6, 10, 20)  # T=10 censored (on max date)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out_dir = tmp_path / "sf"
    df.write.parquet(str(out_dir / "events.parquet"))
    got = {
        r.t: (r.n_risk, r.n_deaths, r.n_censored, r.survival)
        for r in user_survival_km(spark, str(out_dir)).collect()
    }
    # textbook replay
    lifetimes = [(2, 1), (2, 1), (5, 1), (9, 1), (19, 0), (10, 0)]
    import collections

    per_t = collections.defaultdict(lambda: [0, 0])
    for t, died in lifetimes:
        per_t[t][0 if died else 1] += 1
    surv, want = 1.0, {}
    for t in sorted(per_t):
        d, c = per_t[t]
        n_risk = sum(1 for T, _ in lifetimes if T >= t)
        if d > 0:
            surv = round(surv * (1.0 - d / n_risk), 9)
            want[t] = (n_risk, d, c, surv)
    assert got == want and len(want) == 3


def test_funnel_latency_hand_computed(spark, tmp_path):
    """funnel_latency on crafted conversions reproduces hand-computed
    discrete median/p90 (µs), honoring the strictly-after stage rule (a
    purchase BEFORE the click does not convert) and dropping
    non-converters; both engines agree."""
    import duckdb

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import FUNNEL_LATENCY_SQL, funnel_latency

    # (user, event_type, offset_s): view→click latencies [10,40,20,5,30],
    # click→purchase latencies [15,980,1]; u4 never clicks; u5's purchase
    # precedes their click (no stage-3 conversion)
    spec = [
        (1, "view", 0), (1, "click", 10), (1, "purchase", 25),
        (2, "view", 0), (2, "click", 40),
        (3, "view", 0), (3, "click", 20), (3, "purchase", 1000),
        (4, "view", 0),
        (5, "purchase", 5), (5, "view", 10), (5, "click", 15),
        (6, "view", 0), (6, "click", 30), (6, "purchase", 31),
    ]
    base = 1_700_000_000
    rows = [
        (i, base + off, u, et, 1.0, "{}")
        for i, (u, et, off) in enumerate(spec)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, epoch long, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(from_unixtime(epoch) AS TIMESTAMP) ts",
        "user_id", "event_type", "value", "props"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = {r.step: (r.n_converted, r.median_us, r.p90_us)
           for r in funnel_latency(spark, sf).collect()}
    m = 1_000_000
    # sorted [5,10,20,30,40]: rank 3 → 20, rank ceil(4.5)=5 → 40
    assert got["view_to_click"] == (5, 20 * m, 40 * m)
    # sorted [1,15,980]: rank 2 → 15, rank ceil(2.7)=3 → 980
    assert got["click_to_purchase"] == (3, 15 * m, 980 * m)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'")
    want = {r[0]: (r[1], r[2], r[3]) for r in con.sql(FUNNEL_LATENCY_SQL).fetchall()}
    assert got == want
    # regression: the view-only user (u4) must not crash the funnel ops
    # (Spark 4 ANSI element_at(empty, 1) errors without try_element_at)
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import funnel_conversion

    counts = {r.stage: r.n_users for r in funnel_conversion(spark, sf).collect()}
    assert counts == {"1_view": 6, "2_click": 5, "3_purchase": 3}


def test_item_triangles_semantics(spark, tmp_path):
    """Triangle counting on a crafted graph: a 1-2-3 triangle plus a
    pendant 3-4 edge → items 1,2,3 report one triangle each with the
    hand-computed clustering coefficients, the pendant item is absent,
    and both engines agree."""
    import duckdb

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import ITEM_TRIANGLES_SQL, item_triangles

    # two users own {1,2,3} (all three pairs co=2); two own {3,4}
    baskets = {1: [1, 2, 3], 2: [1, 2, 3], 3: [3, 4], 4: [3, 4]}
    rows = []
    eid = 0
    for u, items in baskets.items():
        for it in items:
            rows.append(
                (eid, "2024-01-05 10:00:00", u, "view", 1.0, '{"k": %d}' % it)
            )
            eid += 1
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type", "value", "props"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = sorted(map(tuple, item_triangles(spark, sf).collect()))
    # deg: 1→2, 2→2, 3→3; clustering: 1.0, 1.0, 2/(3·2)
    assert got == [
        (1, 1, 2, 1.0),
        (2, 1, 2, 1.0),
        (3, 1, 3, round(2.0 / 6.0, 6)),
    ]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'")
    want = sorted(map(tuple, con.sql(ITEM_TRIANGLES_SQL).fetchall()))
    assert got == want


def test_recommend_items_semantics(spark, tmp_path):
    """Item-CF semantics on a crafted taste graph: a candidate backed by
    two owned items wins (evidence sums), a higher-scored candidate backed
    by only ONE owned item is dropped by the min-neighbors gate, owned
    items are never recommended, and both engines agree on the frame."""
    import duckdb

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import RECOMMEND_SQL, recommend_items

    # baskets: u1,u2={1,2}; u3,u4={2,3}; u5,u6={1,4}; u7={1,3} (target).
    # edges (co≥2): (1,2)=2, (2,3)=2, (1,4)=2; (1,3) co=1 → dropped.
    # u7 candidates: 2 via owned 1 AND 3 (n=2, score 4) → recommended;
    # 4 via owned 1 only (n=1) → gated out. u1 owns {1,2}: every candidate
    # has n=1 → no recs at all.
    baskets = {1: [1, 2], 2: [1, 2], 3: [2, 3], 4: [2, 3],
               5: [1, 4], 6: [1, 4], 7: [1, 3]}
    rows = []
    eid = 0
    for u, items in baskets.items():
        for it in items:
            for _ in range(2):  # duplicate events: baskets are DISTINCT
                rows.append(
                    (eid, "2024-01-05 10:00:00", u, "view", 1.0,
                     '{"k": %d}' % it)
                )
                eid += 1
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type", "value", "props"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = sorted(map(tuple, recommend_items(spark, sf).collect()))
    assert got == [(7, 1, 2, 4, 2)]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'")
    want = sorted(map(tuple, con.sql(RECOMMEND_SQL).fetchall()))
    assert got == want


def test_adaptive_ntile_sliced_equals_window(spark):
    """The sliced-rank NTILE (the large-frame plan) must assign the
    IDENTICAL bucket to every row as the global-window form, on
    adversarial frames: heavy ties, n < k, n % k != 0, negatives,
    single row — both directions. (value, tie) is a total order in
    every caller, so bit-identity is exact, not statistical."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        adaptive_ntile,
    )

    cases = [
        ([(1, 5.0), (2, 5.0), (3, 5.0)], [(5, False)]),     # all-tied, n < k
        ([(1, 0.0)], [(10, True)]),                          # single row
        # ties + negatives + n % k != 0, both directions and both ks
        (
            [(i, float(i % 4 - 2)) for i in range(97)],
            [(5, False), (5, True), (10, False), (10, True)],
        ),
    ]
    for rows, combos in cases:
        df = spark.createDataFrame(rows, "tid long, v double")
        for k, desc in combos:
            w = adaptive_ntile(df, k, "v", "tid", "b", descending=desc, est_rows=0)
            s = adaptive_ntile(
                df, k, "v", "tid", "b", descending=desc, est_rows=1 << 62
            )
            wm = {r["tid"]: r["b"] for r in w.collect()}
            sm = {r["tid"]: r["b"] for r in s.collect()}
            assert wm == sm, (len(rows), k, desc, wm, sm)


def test_decile_faces_sliced_path_output_identical(spark, sf_dir, monkeypatch):
    """End-to-end: forcing the sliced plan on the three decile faces must
    reproduce the window-plan output row-for-row at driver SF — the same
    guarantee the plan-shape tests pin, asserted on values."""
    import __spark_entry__ as entry_mod

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
        analytics,
    )

    qs = entry_mod.queries()
    faces = (
        "events_power_users_curve",
        "events_rfm_segments",
        "corpus_novelty_curve",
    )
    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    want = {q: canon(qs[q](spark, sf_dir)) for q in faces}
    monkeypatch.setattr(analytics, "_NTILE_MAX_WINDOWED", -1)
    for q in faces:
        assert canon(qs[q](spark, sf_dir)) == want[q], q


def test_rfm_sliced_path_releases_caches(spark, sf_dir, monkeypatch):
    """The sliced-path RFM serving face persists the merged frame and each
    scored intermediate so the three quantile probes scan cached inputs
    (r10 advice medium: an uncached chain re-executes the whole upstream
    plan per probe), then releases every per-call CacheManager entry via
    checkpoint_release before returning — no corpus-sized cache may
    outlive the call."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
        analytics,
    )

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load

    cm = spark._jsparkSession.sharedState().cacheManager()
    empty_before = cm.isEmpty()
    state = analytics.rfm_user_partials(load(spark, "events", sf_dir))
    want = sorted(tuple(r) for r in analytics.rfm_from_user_state(state).collect())
    monkeypatch.setattr(analytics, "_NTILE_MAX_WINDOWED", -1)
    got = sorted(tuple(r) for r in analytics.rfm_from_user_state(state).collect())
    assert got == want and got
    # every persist() taken on the sliced path must be released on return
    assert cm.isEmpty() or not empty_before


def test_hashing_vectorizer_rows_are_unit_normalized(spark, sf_dir):
    """Every emitted doc's coordinates are the L2-normalized signed bucket
    sums: Σ weight² ≈ 1 (6-decimal rounding tolerance) and no zero
    coordinates survive the sign-cancellation filter."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        text_hashing_vectorizer,
    )

    rows = text_hashing_vectorizer(spark, sf_dir).collect()
    assert rows
    by_doc = {}
    for r in rows:
        assert r["weight"] != 0.0
        assert 0 <= r["bucket"] < 64
        by_doc.setdefault(r["doc_id"], 0.0)
        by_doc[r["doc_id"]] += r["weight"] ** 2
    for doc, ss in by_doc.items():
        assert abs(ss - 1.0) < 5e-5, (doc, ss)


def test_quality_weighted_sample_is_deterministic_acceptance(spark, sf_dir):
    """The sampler accepts exactly the docs whose md5-derived uniform falls
    below their pinned quality score (every surviving row satisfies
    u < score), and two invocations return the identical sample."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.sampling import (
        quality_weighted_sample,
    )

    a = quality_weighted_sample(spark, sf_dir).collect()
    b = quality_weighted_sample(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and a
    for r in a:
        assert r["u"] < r["quality_score"]


def test_dedup_representative_pick_takes_best_scored_member(spark, sf_dir):
    """Per cluster the pick is the max-quality member (ties → lowest
    doc_id), verified against the clustering and classifier outputs it
    composes."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.dedup import (
        dedup_clusters,
        dedup_representative_pick,
    )
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        text_linear_quality_classifier,
    )

    members = {}
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in text_linear_quality_classifier(spark, sf_dir).collect()
    }
    for r in dedup_clusters(spark, sf_dir).collect():
        if r["doc_id"] in scores:
            members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    picks = dedup_representative_pick(spark, sf_dir).collect()
    assert picks
    for p in picks:
        docs = members[p["cluster_id"]]
        best = min(docs, key=lambda d: (-scores[d], d))
        assert p["rep_doc_id"] == best
        assert p["n_members"] == len(docs)
        assert p["rep_score"] == scores[best]


def test_user_lifecycle_growth_accounting_identity(spark, sf_dir):
    """On consecutive observed days, dau(d) − dau(d−1) must equal
    new + resurrected − churned — the accounting identity that makes the
    lifecycle decomposition a decomposition and not four unrelated
    counters."""
    from datetime import timedelta

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        events_dau_wau_mau,
        events_user_lifecycle,
    )

    dau = {
        r["day"]: r["dau"] for r in events_dau_wau_mau(spark, sf_dir).collect()
    }
    lc = events_user_lifecycle(spark, sf_dir).collect()
    assert lc
    checked = 0
    for r in lc:
        prev = r["day"] - timedelta(days=1)
        if prev in dau and r["day"] in dau:
            delta = dau[r["day"]] - dau[prev]
            assert delta == r["n_new"] + r["n_resurrected"] - r["n_churned"], r
            checked += 1
    assert checked > 0


def test_cusum_mean_and_spine_consistency(spark, sf_dir):
    """Every type reports the same zero-filled spine length, and
    mean_daily · n_days recovers the type's event count."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        events_cusum_changepoint,
    )

    import pyspark.sql.functions as F

    rows = events_cusum_changepoint(spark, sf_dir).collect()
    assert rows
    n_days = {r["n_days"] for r in rows}
    assert len(n_days) == 1
    counts = {
        r["event_type"]: r["n"]
        for r in load(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert abs(r["mean_daily"] * r["n_days"] - counts[r["event_type"]]) < 0.01


def test_referential_integrity_audit_counts_orphan_rows(spark, sf_dir, tmp_path):
    """The shipped testdata is FK-clean (all-zero violations), and on a
    dirtied copy the audit counts orphan ROWS (multiplicity, not distinct
    keys) plus duplicate-PK and null-FK rows."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.quality import (
        referential_integrity_audit,
    )

    clean = {
        r["constraint_name"]: r["n_violations"]
        for r in referential_integrity_audit(spark, sf_dir).collect()
    }
    assert set(clean.values()) == {0} and len(clean) == 6

    d = tmp_path / "dirty"
    d.mkdir()
    for t in ("customer", "part", "supplier"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.parquet(
            str(d / f"{t}.parquet")
        )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    extra = li.limit(2).withColumn(
        "l_orderkey", F.lit(999_999_999).cast("long")
    )
    li.unionByName(extra).write.mode("overwrite").parquet(
        str(d / "lineitem.parquet")
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dup = od.limit(1)
    nullfk = od.limit(1).withColumn(
        "o_custkey", F.lit(None).cast("long")
    ).withColumn("o_orderkey", F.lit(888_888_888).cast("long"))
    od.unionByName(dup).unionByName(nullfk).write.mode("overwrite").parquet(
        str(d / "orders.parquet")
    )
    dirty = {
        r["constraint_name"]: r["n_violations"]
        for r in referential_integrity_audit(spark, str(d)).collect()
    }
    assert dirty["fk_lineitem_orders"] == 2  # orphan ROW count
    assert dirty["pk_orders_orderkey_unique"] == 2  # both copies of the dup
    assert dirty["notnull_orders_custkey"] == 1
    assert dirty["fk_lineitem_part"] == 0


def _write_clustered_embeddings(path, n=2000, d=64, k=8, sigma=0.35, seed=42):
    """Mixture-of-Gaussians embeddings fixture (r9 verdict order #5): the
    driver testdata's embeddings are uniform-random — IVF's worst case, so
    the recall evals sat at the ~0.16 uniform-noise floor regardless of
    index quality. k tight clusters make recall DISCRIMINATIVE: a working
    cell-probe index recovers most true neighbors (they share the query's
    cluster), a broken one cannot. A Zipf-decay per-dim scale (1/j^0.75)
    concentrates variance in the early dims the way MRL-TRAINED embeddings
    do — without it the 16-dim truncation eval stays at its floor no
    matter how clustered the data is, because isotropic within-cluster
    noise spreads neighbor ranking across all 64 dims (measured: 0.14
    isotropic vs 0.76 decayed). Same schema as the driver table
    (vec_id long, embedding array<float>, label int = cluster id);
    deterministic by seed. Documented in FIXTURES.md §B2."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, (k, d)) * 10.0
    labels = rng.integers(0, k, n)
    vecs = centers[labels] + rng.normal(0.0, sigma, (n, d))
    vecs = vecs * (1.0 / np.arange(1, d + 1) ** 0.75)
    tab = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row for row in vecs.astype(np.float32)], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype("int32"), pa.int32()),
        }
    )
    pq.write_table(tab, str(path / "embeddings.parquet"))


def test_ann_recall_clustered_fixture_is_discriminative(spark, tmp_path):
    """On the clustered fixture the pinned IVF index must recover most
    exact neighbors — materially above the ~0.16 uniform floor — and the
    truncated-dim (matryoshka) scan must keep most of its recall too
    (cluster structure survives the 16-dim prefix)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
        similarity,
    )

    _write_clustered_embeddings(tmp_path)
    sfd = str(tmp_path)
    ivf = similarity.ann_recall_eval(spark, sfd).collect()
    assert len(ivf) == 20, ivf
    mean_ivf = sum(r["recall"] for r in ivf) / len(ivf)
    assert mean_ivf >= 0.5, mean_ivf
    mrl = similarity.matryoshka_recall_eval(spark, sfd).collect()
    mean_mrl = sum(r["recall"] for r in mrl) / len(mrl)
    assert mean_mrl >= 0.5, mean_mrl


def test_ann_recall_eval_oracle_green_on_clustered_fixture(spark, tmp_path):
    """The recall eval's DuckDB twin must agree value-exactly on the
    clustered fixture as well — the pinned index lifecycle is
    fixture-agnostic, so oracle-greenness cannot depend on the uniform
    testdata's geometry."""
    import duckdb

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
        similarity,
    )

    _write_clustered_embeddings(tmp_path)
    sfd = str(tmp_path)
    got = similarity.ann_recall_eval(spark, sfd)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sfd}/embeddings.parquet'"
    )
    want = con.sql(similarity.ANN_RECALL_SQL)

    def canon(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        def cell(v):
            return repr(round(v, 9)) if isinstance(v, float) else str(v)
        return sorted("|".join(cell(r[i]) for i in order) for r in rows)

    g = canon(got.columns, got.collect())
    w = canon(want.columns, want.fetchall())
    assert g == w and g, (g[:3], w[:3])


def test_cluster_size_histogram_is_total(spark, sf_dir):
    """Every document belongs to exactly one cluster, so the histogram's
    n_members · n_clusters must sum to the corpus size and doc_share to
    1.0 — the totality invariant that catches a dropped singleton class."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.dedup import (
        dedup_cluster_size_histogram,
    )

    rows = dedup_cluster_size_histogram(spark, sf_dir).collect()
    assert rows
    n_docs = load(spark, "documents", sf_dir).count()
    assert sum(r["n_members"] * r["n_clusters"] for r in rows) == n_docs
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-4


def test_coverage_audit_zero_median_outage_guard(spark, tmp_path):
    """A long outage (half or more of the spine days empty) makes the
    discrete median daily count 0 — exactly the scenario this audit
    targets. Unguarded, ratio_to_median is a float division by zero and
    low_coverage is vacuously false; both must come back NULL instead,
    and the DuckDB oracle must agree value-exactly (r11 ADVICE)."""
    import duckdb

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.quality import (
        COVERAGE_AUDIT_SQL,
        events_coverage_audit,
    )

    sf = str(tmp_path)
    # events on day 1 and day 11 only -> 11-day spine, 9 empty days,
    # median daily count 0
    rows = [
        (i, "2024-03-%02d 10:00:00" % day, i, "view", 1.0, "{}")
        for i, day in enumerate([1, 1, 1, 11, 11])
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    got = events_coverage_audit(spark, sf)
    got_rows = got.collect()
    assert len(got_rows) == 11
    assert all(r["median_n"] == 0 for r in got_rows)
    assert all(r["ratio_to_median"] is None for r in got_rows)
    assert all(r["low_coverage"] is None for r in got_rows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    want = con.sql(COVERAGE_AUDIT_SQL)

    def canon(cols, rws):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def cell(v):
            return repr(round(v, 9)) if isinstance(v, float) else str(v)

        return sorted("|".join(cell(r[i]) for i in order) for r in rws)

    g = canon(got.columns, got_rows)
    w = canon(want.columns, want.fetchall())
    assert g == w and g, (g[:3], w[:3])


def test_taste_graph_ops_release_caches(spark, sf_dir):
    """Every taste-graph op that persists the shared `_user_baskets` frame
    (and PageRank/LPA's edge frames) must release those CacheManager
    entries via checkpoint_release before returning — the r11 verdict's
    leaked-persist class: a long-lived session otherwise accumulates one
    dead user-cardinality cache entry per call."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
        analytics,
    )

    cm = spark._jsparkSession.sharedState().cacheManager()
    empty_before = cm.isEmpty()
    for op in (
        analytics.events_item_cooccurrence,
        analytics.item_jaccard_similarity,
        analytics.item_pagerank,
        analytics.item_communities,
        analytics.basket_association_rules,
        analytics.item_triangles,
        analytics.recommend_items,
    ):
        # materialize fully (tiny-SF row counts may legitimately be 0 —
        # the min-count pair gate; emptiness of the CACHE is the point)
        op(spark, sf_dir).count()
        assert cm.isEmpty() or not empty_before, op.__name__


def test_cc_memo_rebuilds_after_documents_rewrite(spark, tmp_path):
    """The CC labels memo keys on a file fingerprint of documents, so a
    SAME-SESSION rewrite of the corpus under the same path (the snapshot
    layer can do this) must produce fresh clusters, not the memoized
    stale ones (r11 verdict low #2)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import dedup

    sf = str(tmp_path)

    def write_docs(texts):
        rows = [
            (i, t, "en", "web", len(t)) for i, t in enumerate(texts)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    # v1: docs 0 and 1 are exact near-dups -> one 2-member cluster
    write_docs([base, base + " extra", "completely different text about spark engines and parquet files"])
    v1 = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(spark, sf).collect()
    }
    assert v1[0] == v1[1]
    # v2 rewrite: all three docs pairwise-distinct -> all singletons
    write_docs([base, "an entirely new second document with no shared shingles whatsoever here",
                "completely different text about spark engines and parquet files"])
    v2 = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(spark, sf).collect()
    }
    assert v2[0] != v2[1], "memo served stale clusters after rewrite"
    assert len(set(v2.values())) == 3


def test_bpe_merge_fold_is_exact_greedy(spark):
    """The delimiter-string fold must implement greedy left-to-right
    NON-OVERLAPPING merging: runs pair from the left ('aaa' -> [aa, a]),
    a freshly merged tail never re-matches, multi-char symbols merge by
    tail identity (not suffix collision)."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        _BPE_DELIM,
        _bpe_merge_fold,
    )

    d = _BPE_DELIM
    cases = [
        # (symbols, lhs, rhs, expected symbols after merge)
        (["a", "a", "a"], "a", "a", ["aa", "a"]),
        (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
        (["a", "b", "b"], "a", "b", ["ab", "b"]),
        (["aa", "a", "a"], "aa", "a", ["aaa", "a"]),
        (["x", "a", "b", "a", "b"], "a", "b", ["x", "ab", "ab"]),
        (["ba", "a", "b"], "a", "b", ["ba", "ab"]),  # no suffix collision
        (["q"], "a", "b", ["q"]),  # single symbol untouched
    ]
    rows = [(i, d.join(syms)) for i, (syms, _, _, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, seq string")
    for i, (_syms, lhs, rhs, want) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(_bpe_merge_fold(F.col("seq"), lhs, rhs).alias("m"))
            .collect()[0]["m"]
        )
        assert got.split(d) == want, (i, got.split(d), want)


def test_bpe_training_conserves_symbol_counts(spark, sf_dir):
    """Exactness invariant of the whole training run: applying merge k
    replaces pair_count_k adjacent pairs with single symbols, so the
    corpus-weighted total symbol count must shrink by EXACTLY
    sum(pair_count) between the char-level start and the final state —
    an off-by-anything in the fold (overlaps double-merged, runs
    mis-paired) breaks the identity."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators import (
        textops,
    )

    merges, final_words = textops._bpe_state(spark, sf_dir)
    assert len(merges) == textops._BPE_TRAIN_MERGES
    # ranks pinned 1..N, counts non-increasing? (not guaranteed in general
    # BPE — later merges can outnumber earlier ones only if created pairs
    # dominate; do not assert monotonicity, just positivity)
    assert [m[0] for m in merges] == list(range(1, len(merges) + 1))
    assert all(m[4] > 0 for m in merges)
    start = (
        textops.bpe_word_table(load(spark, "documents", sf_dir))
        .select(
            (F.col("freq") * F.length("word")).alias("w")
        )
        .agg(F.sum("w").alias("s"))
        .collect()[0]["s"]
    )
    # start counts CODEPOINTS via char-split length == initial symbols
    final = (
        final_words.select(
            (
                F.col("freq")
                * F.size(F.split("seq", textops._BPE_DELIM))
            ).alias("w")
        )
        .agg(F.sum("w").alias("s"))
        .collect()[0]["s"]
    )
    assert start - final == sum(m[4] for m in merges), (start, final)


def test_split_leakage_audit_invariants(spark, sf_dir):
    """Both methods audit the SAME edge list, and the cluster-aware split
    must leak zero near-dup edges by construction (both endpoints of an
    edge share a component, the component shares one hash draw) — while
    the per-document split on this corpus leaks some (the planted
    near-dups straddle split boundaries)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.sampling import (
        split_leakage_audit,
    )

    rows = {r["method"]: r for r in split_leakage_audit(spark, sf_dir).collect()}
    assert set(rows) == {"doc_hash", "cluster_hash"}
    assert rows["doc_hash"]["n_edges"] == rows["cluster_hash"]["n_edges"] > 0
    assert rows["cluster_hash"]["n_cross_split_edges"] == 0
    assert rows["cluster_hash"]["leakage_rate"] == 0.0


def test_decontaminate_split_flags_only_train_docs(spark, sf_dir):
    """Every flagged doc must be in the train split under the shared
    assignment, with a sane overlap ratio in (0, 1]."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.sampling import (
        decontaminate_split,
        split_train_val_test,
    )

    flagged = decontaminate_split(spark, sf_dir).collect()
    assert flagged  # the corpus plants cross-split near-dups
    splits = {
        r["doc_id"]: r["split"]
        for r in split_train_val_test(spark, sf_dir).collect()
    }
    for r in flagged:
        assert splits[r["doc_id"]] == "train", r
        assert 0 < r["overlap_ratio"] <= 1.0
        assert r["n_shared_shingles"] <= r["n_shingles"]


def test_quantization_recall_eval_structure(spark, sf_dir):
    """Structural invariants of the quantization-loss leg: one row per
    pinned query, the exact side is always top-5, recall bounded. On
    THIS corpus int8 is lossless (uniform 64-dim vectors sit far apart
    relative to the quantization step, so recall pins at 1.0 — the same
    honest non-discriminative caveat as the LSH banding eval on the
    synthetic corpus); the eval becomes discriminative exactly when
    near-parallel vectors crowd the top-k boundary, which is when a
    deployment needs it."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        quantization_recall_eval,
    )

    rows = quantization_recall_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] == 5
        assert 0 <= r["n_hits"] <= 5
        assert 0.0 <= r["recall"] <= 1.0
        assert r["recall"] == round(r["n_hits"] / r["n_exact"], 6)


def test_point_in_time_features_exclude_label_and_future(spark, tmp_path):
    """The leakage contract, hand-computed: a purchase's features count
    ONLY strictly-prior events — not the label row's own value, not
    anything after it; a first-touch purchase gets zero history and NULL
    value sum; all-NULL prior values stay NULL (never coerced to 0)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        point_in_time_features,
    )

    sf = str(tmp_path)
    rows = [
        # user 1: view(10.0), view(NULL), PURCHASE(99.0), view(5.0), PURCHASE(1.0)
        (1, "2024-01-01 10:00:00", 1, "view", 10.0, "{}"),
        (2, "2024-01-01 11:00:00", 1, "view", None, "{}"),
        (3, "2024-01-02 10:00:00", 1, "purchase", 99.0, "{}"),
        (4, "2024-01-03 10:00:00", 1, "view", 5.0, "{}"),
        (5, "2024-01-04 10:00:00", 1, "purchase", 1.0, "{}"),
        # user 2: first-touch purchase — no history at all
        (6, "2024-01-05 10:00:00", 2, "purchase", 7.0, "{}"),
        # user 3: only NULL-valued history before the purchase
        (7, "2024-01-01 10:00:00", 3, "view", None, "{}"),
        (8, "2024-01-06 10:00:00", 3, "purchase", 2.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    got = {
        r["event_id"]: (
            r["n_prior_events"], r["prior_value_sum"],
            r["days_since_first_seen"],
        )
        for r in point_in_time_features(spark, sf).collect()
    }
    assert got == {
        # label 3: prior = events 1,2 -> 2 events, 10.0 (NULL skipped), 1 day
        3: (2, 10.0, 1),
        # label 5: prior = 1,2,3,4 -> 99.0 counted ONLY as history of a
        # LATER label, 10+99+5 = 114.0, 3 days since first seen
        5: (4, 114.0, 3),
        # label 6: first touch -> empty frame
        6: (0, None, None),
        # label 8: one prior event, all-NULL values stay NULL
        8: (1, None, 5),
    }


def test_negative_sampling_invariants(spark, sf_dir):
    """No sampled negative may be an item its user interacted with; at
    most _NEG_K negatives per positive; every negative is a real item;
    and the draw is deterministic (two runs agree row-for-row)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        _NEG_K,
        negative_sampling_uniform,
        user_item_pairs,
    )

    rows = negative_sampling_uniform(spark, sf_dir).collect()
    assert rows
    owned = {
        (r["user_id"], r["item"])
        for r in user_item_pairs(load(spark, "events", sf_dir)).collect()
    }
    items = {i for _, i in owned}
    from collections import Counter

    per_pos = Counter()
    for r in rows:
        assert (r["user_id"], r["neg_item"]) not in owned, r
        assert r["neg_item"] in items, r
        assert 0 <= r["slot"] < _NEG_K
        per_pos[(r["user_id"], r["pos_item"])] += 1
        assert (r["user_id"], r["pos_item"]) in owned  # positives are real
    assert max(per_pos.values()) <= _NEG_K
    again = negative_sampling_uniform(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_classifier_auc_matches_pairwise_definition(spark, sf_dir):
    """The binned rank statistic must equal the O(P·N) textbook definition
    AUC = [Σ_{+,-} (1 if s+ > s-) + ½ (if tie)] / (P·N) computed directly
    on the shared round-6 scores — the closed form is an optimization,
    not a redefinition."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        classifier_auc_eval,
        text_gopher_quality,
        text_linear_quality_classifier,
    )

    clf = {
        r["doc_id"]: r["quality_score"]
        for r in text_linear_quality_classifier(spark, sf_dir).collect()
    }
    ref = {
        r["doc_id"]: r["keep"]
        for r in text_gopher_quality(spark, sf_dir).collect()
    }
    pos = [clf[d] for d in clf if d in ref and ref[d]]
    neg = [clf[d] for d in clf if d in ref and not ref[d]]
    assert pos and neg  # the fixture corpus has both classes
    num = sum(
        1.0 if sp > sn else (0.5 if sp == sn else 0.0)
        for sp in pos
        for sn in neg
    )
    expected = round(num / (len(pos) * len(neg)), 6)
    row = classifier_auc_eval(spark, sf_dir).collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - expected) < 1e-9, (row["auc"], expected)
    assert abs(row["gini"] - round(2 * (num / (len(pos) * len(neg))) - 1, 6)) < 1e-6
    assert row["n_score_bins"] == len(set(pos) | set(neg))


def test_lang_id_kappa_consistent_with_confusion(spark, sf_dir):
    """κ recomputed from the confusion matrix's own cells must match the
    closed integer form, and land in (-1, 1]."""
    from collections import Counter

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        lang_id_confusion,
        lang_id_kappa,
    )

    cells = Counter()
    for r in lang_id_confusion(spark, sf_dir).collect():
        cells[(r["labeled_lang"], r["detected_lang"])] = r["n"]
    n = sum(cells.values())
    agree = sum(v for (l, d), v in cells.items() if l == d)
    rows = Counter()
    cols = Counter()
    for (l, d), v in cells.items():
        rows[l] += v
        cols[d] += v
    c2 = sum(rows[k] * cols.get(k, 0) for k in rows)
    row = lang_id_kappa(spark, sf_dir).collect()[0]
    assert row["n_docs"] == n and row["n_agree"] == agree
    assert row["observed_agreement"] == round(agree / n, 6)
    assert row["expected_agreement"] == round(c2 / (n * n), 6)
    assert row["kappa"] == round((n * agree - c2) / (n * n - c2), 6)
    assert -1.0 < row["kappa"] <= 1.0


def test_label_knn_purity_invariants(spark, sf_dir):
    """Each audited vector sees exactly min(k, N−1) neighbors; vote counts
    are internally consistent; the suspect flag is exactly own ≠ majority;
    and the audit is deterministic."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        _PURITY_K,
        _Q_CAP,
        label_knn_purity,
    )

    n_vecs = load(spark, "embeddings", sf_dir).count()
    rows = label_knn_purity(spark, sf_dir).collect()
    assert rows and len(rows) <= _Q_CAP
    for r in rows:
        assert r["k_found"] == min(_PURITY_K, n_vecs - 1)
        assert 0 <= r["n_agree"] <= r["k_found"]
        assert 1 <= r["majority_n"] <= r["k_found"]
        assert r["majority_n"] >= r["n_agree"]  # majority is the argmax
        assert r["suspect"] == (r["label"] != r["majority_label"])
        if r["label"] == r["majority_label"]:
            assert r["n_agree"] == r["majority_n"]
    again = label_knn_purity(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_source_unigram_divergence_bounds_and_totals(spark, sf_dir):
    """JSD ∈ [0, ln 2], KL ≥ 0, and per-source token counts sum to the
    corpus total (the distributions are over the same stream)."""
    import math as _math

    from streaming_data_pipeline_with_iceberg_and_spark_spark.functions.text import tokens
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        source_unigram_divergence,
    )

    rows = source_unigram_divergence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["jsd_vs_corpus"] <= _math.log(2) + 1e-9, r
        assert r["kl_vs_corpus"] >= -1e-9, r
        assert 1 <= r["n_distinct_tokens"] <= r["n_tokens"]
    total = (
        load(spark, "documents", sf_dir)
        .filter(F.col("text").isNotNull())
        .select(F.sum(F.size(tokens("text"))).alias("t"))
        .collect()[0]["t"]
    )
    assert sum(r["n_tokens"] for r in rows) == total


def test_source_unigram_divergence_single_source_is_zero(spark, tmp_path):
    """A corpus with ONE source has p ≡ q, so both divergences are exactly
    0.0 (every log term is ln 1) — the sharp lower-bound case."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import (
        source_unigram_divergence,
    )

    sf = str(tmp_path)
    load(spark, "documents", "/root/testdata/sf0.001").withColumn(
        "source", F.lit("only")
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    rows = source_unigram_divergence(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["jsd_vs_corpus"] == 0.0
    assert rows[0]["kl_vs_corpus"] == 0.0


def test_forecast_backtest_eval_span_and_recompute(spark, sf_dir):
    """Every type evaluates exactly (spine length − 7) days (the grid is
    zero-filled, so only the first week lacks a prediction), and the MAE
    recomputed from the shared grid matches."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        _FC_LAG_DAYS,
        daily_type_grid,
        events_forecast_backtest,
    )

    grid = daily_type_grid(load(spark, "events", sf_dir)).collect()
    series = {}
    for r in grid:
        series.setdefault(r["event_type"], []).append((r["day"], r["n"]))
    rows = {r["event_type"]: r for r in events_forecast_backtest(spark, sf_dir).collect()}
    assert set(rows) == set(series)
    for et, pts in series.items():
        pts.sort()
        ns = [n for _, n in pts]
        pairs = [(ns[i], ns[i - _FC_LAG_DAYS]) for i in range(_FC_LAG_DAYS, len(ns))]
        assert rows[et]["n_days_eval"] == len(ns) - _FC_LAG_DAYS
        mae = round(sum(abs(a - p) for a, p in pairs) / len(pairs), 6)
        assert abs(rows[et]["mae"] - mae) < 1e-9
        assert rows[et]["total_actual"] == sum(a for a, _ in pairs)
        assert rows[et]["total_pred"] == sum(p for _, p in pairs)


def test_attribution_linear_conserves_value(spark, sf_dir):
    """Linear attribution distributes each conversion's value exactly once:
    Σ channel attributed_value ≈ Σ purchase value (within per-channel cent
    rounding), every purchase is covered exactly once (assigned XOR
    direct), and touch channels are real touch types."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        _ATTR_CONVERSION,
        _ATTR_TOUCHES,
        attribution_linear,
    )

    rows = attribution_linear(spark, sf_dir).collect()
    assert rows
    chans = {r["channel"] for r in rows}
    assert chans <= set(_ATTR_TOUCHES) | {"direct"}
    ev = (
        load(spark, "events", sf_dir)
        .filter(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
            & (F.col("event_type") == _ATTR_CONVERSION)
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()[0]
    )
    got_value = sum(r["attributed_value"] for r in rows)
    assert abs(got_value - ev["v"]) < 0.01 * len(rows) + 1e-6
    # coverage: direct count + distinct assigned conversions = all purchases
    direct_n = next((r["n_conversions"] for r in rows if r["channel"] == "direct"), 0)
    touch_rows = [r for r in rows if r["channel"] != "direct"]
    # per-channel n_conversions can overlap; recompute assigned distinct
    # from the op's own building blocks is the oracle's job — here assert
    # the bound: assigned distinct ≤ Σ per-channel ≤ assigned · |channels|
    assert direct_n <= ev["n"]
    assert sum(r["n_touches"] for r in touch_rows) >= max(
        r["n_conversions"] for r in touch_rows
    )


def test_text_readability_hand_fixture(spark, tmp_path):
    """Hand-computed Flesch on a pinned two-sentence doc: the counting
    stand-ins (whitespace words, [.!?]+ sentences, vowel-group syllables
    clamped ≥1 per word) and both formulas, exactly."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import text_readability

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "The cat sat. The dog ran!")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    r = text_readability(spark, sf).collect()[0]
    # words: the/cat/sat./the/dog/ran! = 6; sentences: 2 groups ([.] [!])
    # syllables: e,a,a,e,o,a -> 1 each = 6
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    wps, spw = 6 / 2, 6 / 6
    assert r["flesch_ease"] == round(206.835 - 1.015 * wps - 84.6 * spw, 6)
    assert r["fk_grade"] == round(0.39 * wps + 11.8 * spw - 15.59, 6)


def test_text_readability_count_bounds(spark, sf_dir):
    """Syllables ≥ words (each word clamps ≥1); sentences ≥ 1; the row set
    covers exactly the non-null-text docs."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.textops import text_readability

    rows = text_readability(spark, sf_dir).collect()
    n_docs = (
        load(spark, "documents", sf_dir).filter(F.col("text").isNotNull()).count()
    )
    assert len(rows) == n_docs
    for r in rows:
        assert r["n_syllables"] >= r["n_words"] >= 1
        assert r["n_sentences"] >= 1


def test_entity_match_blocking_recall_vs_bruteforce(spark):
    """The two-pass (prefix, suffix) blocking must recover EVERY
    within-nation pair at Levenshtein ≤ 1 on the fixture corpus (an edit
    in the suffix preserves the prefix block and vice versa), and every
    emitted pair must satisfy the match predicate — recall AND precision
    1.0 vs the brute-force truth at sf0.001."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.quality import (
        _ER_LEV_MAX,
        entity_match_candidates,
    )

    sf = "/root/testdata/sf0.001"
    cust = [
        (r["c_custkey"], r["c_name"], r["c_nationkey"])
        for r in load(spark, "customer", sf).collect()
    ]

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    truth = set()
    by_nation = {}
    for k, nm, nat in cust:
        by_nation.setdefault(nat, set()).add(nm)
    for nat, members in by_nation.items():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                if lev(ms[i], ms[j]) <= _ER_LEV_MAX:
                    truth.add((nat, ms[i], ms[j]))
    got_rows = entity_match_candidates(spark, sf).collect()
    got = {(r["nationkey"], r["name_a"], r["name_b"]) for r in got_rows}
    assert got == truth and truth
    keys = {(k, nm): True for k, nm, _ in cust}
    for r in got_rows:
        assert r["name_a"] < r["name_b"]
        assert r["lev_dist"] <= _ER_LEV_MAX
        # fixture names are unique, so multiplicities are 1 and the rep
        # keys are real custkeys
        assert r["n_a"] == r["n_b"] == r["n_record_pairs"] == 1
        assert (r["rep_a"], r["name_a"]) in keys
        assert (r["rep_b"], r["name_b"]) in keys
    assert len(got_rows) == len(got)  # no duplicate pairs survive the union


def test_entity_match_collapses_exact_duplicates_first(spark, tmp_path):
    """A corpus where one entity has many duplicate registrations must
    collapse them BEFORE the fuzzy join: multiplicities ride a column
    (n_a·n_b record pairs), never the pair frame."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.quality import (
        entity_match_candidates,
    )

    sf = str(tmp_path)
    rows = [(i, "Customer#000000001", 7, 0.0, "AUTOMOBILE") for i in range(50)]
    rows += [(100 + i, "Customer#000000002", 7, 0.0, "AUTOMOBILE") for i in range(3)]
    rows += [(900, "Customer#000000009", 8, 0.0, "MACHINERY")]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    out = entity_match_candidates(spark, sf).collect()
    # one NAME pair survives (nation 7), carrying 50×3 record pairs
    assert len(out) == 1
    r = out[0]
    assert (r["name_a"], r["name_b"]) == (
        "Customer#000000001", "Customer#000000002"
    )
    assert (r["n_a"], r["n_b"], r["n_record_pairs"]) == (50, 3, 150)
    assert (r["rep_a"], r["rep_b"]) == (0, 100)


def test_join_key_skew_audit_recompute(spark):
    """Every statistic recomputed from the raw key multiplicities at
    sf0.001; the hot key is the max-multiplicity key with smallest-key
    tie-break."""
    from collections import Counter

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.quality import (
        _SKEW_SPECS,
        join_key_skew_audit,
    )

    sf = "/root/testdata/sf0.001"
    rows = {
        (r["fact_table"], r["key_col"]): r
        for r in join_key_skew_audit(spark, sf).collect()
    }
    assert set(rows) == set(_SKEW_SPECS)
    for fact, key in _SKEW_SPECS:
        mult = Counter(
            r[key]
            for r in load(spark, fact, sf).select(key).collect()
            if r[key] is not None
        )
        r = rows[(fact, key)]
        assert r["n_rows"] == sum(mult.values())
        assert r["n_keys"] == len(mult)
        assert r["max_mult"] == max(mult.values())
        assert r["avg_mult"] == round(sum(mult.values()) / len(mult), 6)
        assert r["skew_ratio"] == round(
            max(mult.values()) * len(mult) / sum(mult.values()), 6
        )
        assert r["hot_key"] == min(
            k for k, m in mult.items() if m == max(mult.values())
        )


def test_order_reconciliation_counts_on_dirtied_copy(spark, tmp_path):
    """On a crafted corpus: an order whose lines sum exactly to its header
    reconciles; a 1-cent gap reconciles at the tolerance; a large gap and
    a no-lines order are counted; totals are exact integer cents."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.quality import (
        order_reconciliation_audit,
    )

    sf = str(tmp_path)
    # order 1: one line 100.00 * (1-0) * (1+0) = 100.00 == header
    # order 2: line 50.00 vs header 50.01 (1-cent gap -> reconciled at tol)
    # order 3: line 10.00 vs header 99.99 (gap 8999 cents)
    # order 4: no lines
    spark.createDataFrame(
        [(1, 100.0), (2, 50.01), (3, 99.99), (4, 7.0)],
        "o_orderkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(1, 100.0, 0.0, 0.0), (2, 50.0, 0.0, 0.0), (3, 10.0, 0.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    ).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    r = order_reconciliation_audit(spark, sf).collect()[0]
    assert r["n_orders"] == 4
    assert r["n_no_lines"] == 1
    assert r["n_reconciled"] == 2
    assert r["max_gap_cents"] == 8999
    assert r["total_header_cents"] == 10000 + 5001 + 9999 + 700
    assert r["total_line_cents"] == 10000 + 5000 + 1000


def test_entity_resolution_groups_match_union_find(spark):
    """Entity labels must equal a union-find closure over the match pairs
    (transitivity: A≈B, B≈C ⇒ one entity even when lev(A,C) > 1), each
    entity's canonical name is its min rep key, and record counts are
    conserved."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.quality import (
        entity_match_candidates,
        entity_resolution_groups,
    )

    sf = "/root/testdata/sf0.001"
    pairs = entity_match_candidates(spark, sf).collect()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["rep_a"]), find(r["rep_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    rows = entity_resolution_groups(spark, sf).collect()
    for r in rows:
        want = find(r["rep_key"]) if r["rep_key"] in parent else r["rep_key"]
        assert r["entity_id"] == want, r
        assert r["is_canonical"] == (r["entity_id"] == r["rep_key"])
    # one canonical spelling per entity; total records = customer count
    canon = [r for r in rows if r["is_canonical"]]
    assert len({r["entity_id"] for r in rows}) == len(canon)
    n_cust = load(spark, "customer", sf).filter(
        F.col("c_name").isNotNull()
    ).count()
    assert sum(r["n_records"] for r in rows) == n_cust


def test_experiment_ab_eval_recompute(spark, sf_dir):
    """Arm sizes, conversion counts, and the pooled z recomputed in
    python from the per-user purchase flags under the same md5
    assignment."""
    import hashlib
    import math as _math

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        experiment_ab_eval,
    )

    ev = (
        load(spark, "events", sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type")
        .collect()
    )
    conv = {}
    for r in ev:
        conv[r["user_id"]] = conv.get(r["user_id"], 0) or int(
            r["event_type"] == "purchase"
        )
    arms = {0: [0, 0], 1: [0, 0]}
    for u, c in conv.items():
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:4], 16) % 2
        arms[arm][0] += 1
        arms[arm][1] += c
    row = experiment_ab_eval(spark, sf_dir).collect()[0]
    assert (row["n_a"], row["conv_a"]) == tuple(arms[0])
    assert (row["n_b"], row["conv_b"]) == tuple(arms[1])
    (n_a, c_a), (n_b, c_b) = arms[0], arms[1]
    pool = (c_a + c_b) / (n_a + n_b)
    if 0 < pool < 1:
        z = (c_b / n_b - c_a / n_a) / _math.sqrt(
            pool * (1 - pool) * (1 / n_a + 1 / n_b)
        )
        assert abs(row["z_score"] - round(z, 6)) < 1e-6
    else:
        # fixture corpora where every user converts (or none do) have
        # zero pooled variance — the guard must emit NULL, not ±inf
        assert row["z_score"] is None
    assert row["lift"] == round(c_b / n_b - c_a / n_a, 6)


def test_experiment_ab_eval_discriminates_on_mixed_corpus(spark, tmp_path):
    """On a crafted corpus with different arm rates the z-score matches
    the closed form (the non-degenerate branch)."""
    import hashlib
    import math as _math

    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        experiment_ab_eval,
    )

    sf = str(tmp_path)
    rows = []
    eid = 0
    for u in range(200):
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:4], 16) % 2
        # arm 0 converts ~30%, arm 1 ~60% (deterministic by user id)
        converts = (u % 10) < (3 if arm == 0 else 6)
        rows.append((eid, "2024-01-01 00:00:00", u, "view", 1.0))
        eid += 1
        if converts:
            rows.append((eid, "2024-01-01 01:00:00", u, "purchase", 5.0))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type", "value"
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    r = experiment_ab_eval(spark, sf).collect()[0]
    n_a, c_a, n_b, c_b = r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]
    pool = (c_a + c_b) / (n_a + n_b)
    z = (c_b / n_b - c_a / n_a) / _math.sqrt(
        pool * (1 - pool) * (1 / n_a + 1 / n_b)
    )
    assert abs(r["z_score"] - round(z, 6)) < 1e-6
    assert r["lift"] > 0


def test_touch_conversion_intervals_bounds(spark, sf_dir):
    """Wilson bounds bracket the rate inside [0, 1]; trial counts equal
    raw touch-event counts; converting ≤ trials."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        _ATTR_TOUCHES,
        touch_conversion_intervals,
    )

    rows = touch_conversion_intervals(spark, sf_dir).collect()
    assert {r["channel"] for r in rows} <= set(_ATTR_TOUCHES)
    raw = (
        load(spark, "events", sf_dir)
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
            & F.col("event_type").isin(_ATTR_TOUCHES)
        )
        .groupBy("event_type")
        .count()
        .collect()
    )
    raw_n = {r["event_type"]: r["count"] for r in raw}
    for r in rows:
        assert r["n_touches"] == raw_n[r["channel"]]
        assert 0 <= r["n_converting"] <= r["n_touches"]
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0


def test_experiment_cuped_recompute(spark, sf_dir):
    """θ, raw/adjusted lift, and variance reduction recomputed in python
    from the per-user (x, y) pairs under the same midpoint split and md5
    arms; CUPED must not change the expected lift direction definition
    (identical x̄ subtraction on both arms)."""
    import hashlib

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        experiment_cuped_eval,
    )

    ev = (
        load(spark, "events", sf_dir)
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"), "event_type", "value")
        .collect()
    )
    d0, d1 = min(r["d"] for r in ev), max(r["d"] for r in ev)
    import datetime as _dt

    mid = d0 + _dt.timedelta(days=(d1 - d0).days // 2)
    per = {}
    for r in ev:
        x, y = per.setdefault(r["user_id"], [0, 0.0])
        if r["d"] < mid:
            per[r["user_id"]][0] += 1
        if (
            r["d"] >= mid
            and r["event_type"] == "purchase"
            and r["value"] is not None
        ):
            per[r["user_id"]][1] += r["value"]
    xs = {u: v[0] for u, v in per.items()}
    ys = {u: v[1] for u, v in per.items()}
    n = len(per)
    sx, sy = sum(xs.values()), sum(ys.values())
    sxy = sum(xs[u] * ys[u] for u in per)
    sxx = sum(x * x for x in xs.values())
    syy = sum(y * y for y in ys.values())
    mean_x, mean_y = sx / n, sy / n
    var_x = sxx / n - mean_x * mean_x
    var_y = syy / n - mean_y * mean_y
    cov = sxy / n - mean_x * (sy / n)
    theta = cov / var_x
    arm = lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:4], 16) % 2
    g = {0: [u for u in per if arm(u) == 0], 1: [u for u in per if arm(u) == 1]}
    ya = sum(ys[u] for u in g[0]) / len(g[0])
    yb = sum(ys[u] for u in g[1]) / len(g[1])
    xa = sum(xs[u] for u in g[0]) / len(g[0])
    xb = sum(xs[u] for u in g[1]) / len(g[1])
    row = experiment_cuped_eval(spark, sf_dir).collect()[0]
    assert row["n_users"] == n
    assert abs(row["theta"] - theta) < 1e-5
    assert abs(row["lift_raw"] - (yb - ya)) < 1e-5
    adj = (yb - theta * (xb - mean_x)) - (ya - theta * (xa - mean_x))
    assert abs(row["lift_cuped"] - adj) < 1e-5
    vr = 1.0 - (var_y - cov * cov / var_x) / var_y
    assert abs(row["variance_reduction"] - vr) < 1e-5
    assert 0.0 <= row["variance_reduction"] <= 1.0


def test_scd2_invariants(spark, sf_dir):
    """SCD2 contract on the real stream: per user exactly one current row;
    versions are 1..k contiguous; periods chain (valid_to == next
    valid_from) and never go backwards; consecutive versions always
    change state; the version count equals the user's change count
    recomputed in python."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.windows import (
        scd2_from_events,
    )

    rows = scd2_from_events(spark, sf_dir).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    ev = (
        load(spark, "events", sf_dir)
        .filter(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = {}
    for r in ev:
        streams.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    for u, vs in per_user.items():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
        assert sum(r["is_current"] for r in vs) == 1 and vs[-1]["is_current"]
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] <= a["valid_to"]
            assert a["state"] != b["state"]
        # python recompute of the collapsed change count
        seq = [t for _, _, t in sorted(streams[u])]
        changes = 1 + sum(1 for x, y in zip(seq, seq[1:]) if x != y)
        assert len(vs) == changes, u
    assert set(per_user) == set(streams)


def test_label_purity_ivf_audit_totals(spark, sf_dir):
    """Every vector is audited exactly once; rates and agreement bounded."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        _PURITY_K,
        label_purity_ivf_audit,
    )

    rows = label_purity_ivf_audit(spark, sf_dir).collect()
    n = load(spark, "embeddings", sf_dir).filter(
        F.col("embedding").isNotNull()
    ).count()
    assert sum(r["n_audited"] for r in rows) == n
    for r in rows:
        assert 0 <= r["n_suspect"] <= r["n_audited"]
        assert 0.0 <= r["suspect_rate"] <= 1.0
        assert 0.0 <= r["mean_agree"] <= _PURITY_K


def test_label_purity_ivf_audit_clean_on_separated_clusters(spark, tmp_path):
    """On a corpus whose labels are well-separated clusters, every
    vector's IVF neighbors share its label — zero suspects, full
    agreement (the audit is discriminative exactly when labels and
    geometry disagree)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.similarity import (
        label_purity_ivf_audit,
    )

    sf = str(tmp_path)
    rows = []
    # 3 labels, 40 members each, clusters on distant orthogonal axes with
    # small deterministic jitter
    for lab in range(3):
        for i in range(40):
            base = [0.0] * 8
            base[lab] = 10.0
            base[(lab + 3) % 8] = 0.01 * (i % 7)
            rows.append((lab * 100 + i, [float(x) for x in base], lab))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    out = label_purity_ivf_audit(spark, sf).collect()
    assert sum(r["n_audited"] for r in out) == 120
    for r in out:
        assert r["n_suspect"] == 0, r
        assert r["suspect_rate"] == 0.0


def test_customer_ltv_cohorts_invariants(spark, sf_dir):
    """Cohort accounting identities: offsets are non-negative and 0 exists
    for every cohort (the acquisition month itself); cumulative revenue
    is the running sum of period revenue; the grand total equals the
    corpus order total in exact cents; active-customer counts never
    exceed the cohort's size at offset 0... (not monotone — a cohort can
    have MORE active customers later; only the offset-0 count equals the
    cohort's acquisition size)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.tpch_extra import (
        customer_ltv_cohorts,
    )

    rows = customer_ltv_cohorts(spark, sf_dir).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_month"], []).append(r)
    for c, vs in by_cohort.items():
        vs.sort(key=lambda r: r["month_offset"])
        assert vs[0]["month_offset"] == 0, c
        cum = 0
        for r in vs:
            assert r["month_offset"] >= 0
            cum += r["revenue_cents"]
            assert r["cum_revenue_cents"] == cum, r
    total = sum(r["revenue_cents"] for r in rows)
    want = (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
        .select(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("t")
        )
        .collect()[0]["t"]
    )
    assert total == want
    # offset-0 active counts sum to the number of distinct customers
    n_cust = (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
        .select("o_custkey").distinct().count()
    )
    assert sum(vs[0]["n_active_customers"] for vs in by_cohort.values()) == n_cust


def test_impute_events_value_contract(spark, tmp_path):
    """Crafted corpus pins the repair contract: pass-through of observed
    values, exact group median for NULLs (even group size picks rank
    ⌈n/2⌉ — the lower middle), the '(none)' group for NULL types, and a
    group with no observed values staying NULL while still flagged."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        impute_events_value,
    )

    sf = str(tmp_path)
    rows = [
        # type a: values 1, 3, 5, NULL  -> median rank (3+1)//2=2 -> 3.0
        (1, "a", 1.0), (2, "a", 3.0), (3, "a", 5.0), (4, "a", None),
        # type b: values 10, 20 -> rank (2+1)//2=1 -> 10.0
        (5, "b", 10.0), (6, "b", None), (7, "b", 20.0),
        # NULL type: value 7 observed, one NULL -> '(none)' median 7.0
        (8, None, 7.0), (9, None, None),
        # type c: nothing observed -> stays NULL, flagged
        (10, "c", None),
    ]
    spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    got = {r["event_id"]: r for r in impute_events_value(spark, sf).collect()}
    assert got[1]["value_imputed"] == 1.0 and not got[1]["was_imputed"]
    assert got[4]["value_imputed"] == 3.0 and got[4]["was_imputed"]
    assert got[6]["value_imputed"] == 10.0 and got[6]["was_imputed"]
    assert got[9]["value_imputed"] == 7.0 and got[9]["was_imputed"]
    assert got[10]["value_imputed"] is None and got[10]["was_imputed"]
    assert len(got) == 10


def test_events_type_mix_drift_bounds_and_zero_case(spark, tmp_path):
    """JSD ∈ [0, ln 2]; a corpus whose weekly mix equals the overall mix
    exactly scores 0.0 every week; n_events sums to the fact size."""
    import math as _math

    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from streaming_data_pipeline_with_iceberg_and_spark_spark.operators.analytics import (
        events_type_mix_drift,
    )

    sf0 = "/root/testdata/sf0.01"
    rows = events_type_mix_drift(spark, sf0).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["jsd_vs_overall"] <= _math.log(2) + 1e-9
    n = (
        load(spark, "events", sf0)
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .count()
    )
    assert sum(r["n_events"] for r in rows) == n

    # identical mix every week -> exact 0.0 (p == q cell-for-cell)
    sf = str(tmp_path)
    data = []
    eid = 0
    for wk_day in ("2024-01-01", "2024-01-08", "2024-01-15"):
        for et, k in (("view", 6), ("click", 3), ("purchase", 1)):
            for i in range(k):
                data.append((eid, f"{wk_day} 10:00:00", et))
                eid += 1
    spark.createDataFrame(
        data, "event_id long, ts string, event_type string"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "event_type"
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = events_type_mix_drift(spark, sf).collect()
    assert len(out) == 3
    for r in out:
        assert r["jsd_vs_overall"] == 0.0 and r["n_types_seen"] == 3


def test_fold_assign_kernel_bit_exact_vs_hof_crossjoin(spark, sf_dir):
    """r16: fold_assign_cells must reproduce the HOF crossJoin reference
    BIT-exactly — same winning cell (rank-1), same top-nprobe cell sets
    and order, because its per-dimension vectorized multiply-add is the
    identical IEEE op sequence as F.aggregate's sequential fold."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.functions.vector import (
        dot as hof_dot,
    )
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load
    from pyspark.sql import Window

    emb = (
        load(spark, "embeddings", sf_dir)
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    cents = similarity.pinned_forgy_seeds(emb, 7)
    cells = spark.createDataFrame(
        [
            (j, cents[j], similarity._seq_half_sq(cents[j]))
            for j in range(len(cents))
        ],
        "cell int, c array<double>, chalf double",
    )
    scored = emb.crossJoin(F.broadcast(cells)).select(
        "vec_id",
        "cell",
        (hof_dot("embedding", "c") - F.col("chalf")).alias("score"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("cell"))
    ref = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .collect()
    )
    ref_sets = {}
    for r in ref:
        ref_sets.setdefault(r["vec_id"], []).append((r["rn"], r["cell"]))
    got = similarity.fold_assign_cells(emb, cents, nprobe=2).collect()
    got_sets = {}
    for i, r in enumerate(got):
        got_sets.setdefault(r["vec_id"], []).append(r["cell"])
    assert set(got_sets) == set(ref_sets)
    for vid, pairs in ref_sets.items():
        want = [c for _, c in sorted(pairs)]
        assert got_sets[vid] == want, (vid, got_sets[vid], want)


def test_fold_assign_kernel_degenerate_rows(spark):
    """Ragged / null-holed / NULL embeddings take the slow path: window
    semantics rank cells ascending (0, 1, ...); maxby_nulls=True emits a
    NULL cell instead — both mirroring the forms the kernel replaced."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),          # clean
            (2, [1.0, 0.0, 5.0]),     # ragged (d=2 centroids)
            (3, [None, 1.0]),         # null element
            (4, None),                # NULL embedding
        ],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    win = {
        r["vec_id"]: r["cell"]
        for r in similarity.fold_assign_cells(emb, cents, nprobe=1).collect()
    }
    assert win == {1: 0, 2: 0, 3: 0, 4: 0}
    mx = {
        r["vec_id"]: r["cell"]
        for r in similarity.fold_assign_cells(
            emb, cents, nprobe=1, maxby_nulls=True
        ).collect()
    }
    assert mx == {1: 0, 2: None, 3: None, 4: None}


def test_dim_folds_bit_exact_vs_hof(spark, sf_dir):
    """r16: the dim-specialized unrolled folds (single-F.expr codegen
    chains) must be BIT-exact vs the HOF forms over every corpus pair —
    repr-level equality, the selfcheck's own comparison — and fall back
    to the HOF result for ragged rows via the size() guard."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.functions import (
        vector as V,
    )
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load

    emb = (
        load(spark, "embeddings", sf_dir)
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    d = len(emb.first()["embedding"])
    q = emb.limit(30).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    pairs = q.crossJoin(emb)
    both = pairs.select(
        V.dot("q_vec", "embedding").alias("h_dot"),
        V.dot("q_vec", "embedding", dim=d).alias("u_dot"),
        V.norm("embedding").alias("h_nrm"),
        V.norm("embedding", dim=d).alias("u_nrm"),
        V.l2_distance("q_vec", "embedding").alias("h_l2"),
        V.l2_distance("q_vec", "embedding", dim=d).alias("u_l2"),
        V.cosine("q_vec", "embedding").alias("h_cos"),
        V.cosine("q_vec", "embedding", dim=d).alias("u_cos"),
    ).collect()
    for r in both:
        assert repr(r["h_dot"]) == repr(r["u_dot"])
        assert repr(r["h_nrm"]) == repr(r["u_nrm"])
        assert repr(r["h_l2"]) == repr(r["u_l2"])
        assert repr(r["h_cos"]) == repr(r["u_cos"])
    # guard fallback: a wrong-dim specialization returns the HOF value
    ragged = pairs.limit(5).select(
        V.dot("q_vec", "embedding").alias("h"),
        V.dot("q_vec", "embedding", dim=d + 3).alias("u"),
    )
    for r in ragged.collect():
        assert repr(r["h"]) == repr(r["u"])


def test_minhash_arrow_kernel_parity_with_expr_form(spark, sf_dir):
    """r16: the Arrow MinHash signature kernel must agree BYTE-for-byte
    with the pure-column-expression pipeline it replaced — same kept
    rows, same band hashes, same 32-long signatures (the pipeline is
    integer/string exact, so parity is equality, not closeness)."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load

    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    degenerate = spark.createDataFrame(
        [(9001, None), (9002, "   "), (9003, "\t"), (9004, "one"),
         (9005, "two tokens"), (9006, "a b c d e")],
        "doc_id long, text string",
    )
    both = docs.unionByName(degenerate)
    key = lambda r: (  # noqa: E731
        tuple(r[f"band{b}"] for b in range(8)),
        tuple(r["sig"]),
    )
    new = {r["doc_id"]: key(r) for r in dedup.minhash_sig_bands(both).collect()}
    old = {
        r["doc_id"]: key(r)
        for r in dedup._minhash_sig_bands_expr(both).collect()
    }
    assert new == old
    assert 9001 not in new and 9002 not in new  # null/space-only drop
    assert 9003 in new and 9004 in new  # tab survives Spark's space-only trim


def test_kgram_arrow_kernel_parity_with_expr_form(spark, sf_dir):
    """r16: the Arrow k-gram postings kernel must agree exactly with the
    column-expression pipeline it replaced — same (doc_id, pos, h) rows,
    including the <k-token and NULL-text zero-row contracts."""
    from streaming_data_pipeline_with_iceberg_and_spark_spark.io import load

    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    degenerate = spark.createDataFrame(
        [(9101, None), (9102, "short doc"), (9103, " ".join(["tok"] * 8)),
         (9104, " ".join(f"w{i}" for i in range(12)))],
        "doc_id long, text string",
    )
    toked = dedup.es_tokenized(docs.unionByName(degenerate))
    new = sorted(map(tuple, dedup.kgram_rows(toked).collect()))
    old = sorted(map(tuple, dedup._kgram_rows_expr(toked).collect()))
    assert new == old
    new_ids = {r[0] for r in new}
    assert 9101 not in new_ids and 9102 not in new_ids
    assert 9103 in new_ids and 9104 in new_ids
