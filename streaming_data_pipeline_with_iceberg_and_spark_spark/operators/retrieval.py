"""Hybrid retrieval (SURVEY.md §2.8 L3 + L4 composed): BM25 ⊕ dense-cosine
fused by reciprocal-rank fusion (RRF, Cormack et al. 2009) — the retrieval
shape a RAG / data-curation pipeline actually runs: a sparse lexical ranker
and a dense semantic ranker each produce a bounded top-k list per query, and
the fusion layer combines RANKS (not scores), so the two scoring scales never
need calibration.

Scale shape (the part that matters at 100 TB): the corpus-scale work lives
entirely inside the two existing retrieval operators — BM25's query-term-
filtered postings shuffle (textops.bm25_rank) and the kNN broadcast-scored
scan — each already plan-audited. The fusion itself joins two frames bounded
at |Q|·k rows (hundreds, regardless of corpus size), so RRF adds ZERO
corpus-keyed work: one tiny full-outer join + one window.

Both inputs are oracle-exact (tie-consistent rounded-score ranking on each
side), and RRF is deterministic integer-rank arithmetic — 1/(C + rank) sums
of integer-derived reciprocals are bit-identical across engines — so the
WHOLE hybrid chain is value-checked against DuckDB, no rows-only carve-out.

Reference parity note: the reference pipeline (spark_job.py) has no
retrieval surface; this family is part of the [EXT] LLM-training-data
north star (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import dot, norm
from ..io import load, load_spread
from .textops import _BM25_B, _BM25_K1, _BM25_QUERIES, bm25_rank

# Per-list retrieval depth (k of each underlying top-k), RRF smoothing
# constant (60 is the standard from the original RRF paper), and the final
# fused list depth. All three are interpolated into the oracle SQL below —
# never hardcoded twice.
_HYBRID_K = 20
_RRF_C = 60
_HYBRID_TOPK = 10

# Pinned dense-query vector per BM25 query id — vec_ids chosen inside the
# id range present at every fixture SF (0..499). In production the query
# side is a tiny user batch carrying both terms and an embedding; pinning
# keeps the driver oracle reproducible, exactly like _BM25_QUERIES.
_HYBRID_QVECS = {1: 3, 2: 97, 3: 151, 4: 263, 5: 419}


def hybrid_rank(
    docs: DataFrame,
    emb: DataFrame,
    qterms: DataFrame,
    qvecs: DataFrame,
    k: int = _HYBRID_K,
    topk: int = _HYBRID_TOPK,
    c: int = _RRF_C,
) -> DataFrame:
    """RRF-fuse BM25 top-``k`` with cosine top-``k`` — the reusable operator.

    ``qterms`` is a (query_id, term) frame and ``qvecs`` a (query_id,
    qvec_id) frame over ``emb``'s id space; both are tiny request batches by
    contract (bm25_rank enforces its `_BM25_MAX_TERMS` bound; the dense side
    broadcasts the query vectors). Returns the fused top-``topk`` per query
    with both constituent ranks exposed (NULL where a doc appeared in only
    one list).
    """
    sparse = bm25_rank(docs, qterms, k=k).select(
        "query_id", "doc_id", F.col("rank").alias("bm25_rank")
    )

    corpus = (
        emb.filter(F.col("embedding").isNotNull())
        .withColumn("nrm", norm("embedding"))
    )
    qside = (
        emb.filter(F.col("embedding").isNotNull())
        .join(F.broadcast(qvecs), F.col("vec_id") == F.col("qvec_id"))
        .select(
            "query_id",
            "qvec_id",
            F.col("embedding").alias("q_vec"),
            norm("embedding").alias("q_nrm"),
        )
    )
    scored = corpus.join(
        F.broadcast(qside), F.col("vec_id") != F.col("qvec_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.round(
            dot(F.col("q_vec"), F.col("embedding"))
            / (F.col("q_nrm") * F.col("nrm")),
            5,
        ).alias("cos_sim"),
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("doc_id")
    )
    dense = (
        scored.withColumn("cos_rank", F.row_number().over(wd))
        .filter(F.col("cos_rank") <= k)
        .select("query_id", "doc_id", "cos_rank")
    )

    # Fusion: both sides are ≤ |Q|·k rows — a constant-bounded join at any
    # corpus size. RRF contribution is 0 for the list a doc missed.
    fused = sparse.join(dense, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "bm25_rank",
        "cos_rank",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("cos_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "doc_id", "rrf_score", "bm25_rank", "cos_rank")
    )


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval capstone: RRF fusion of the pinned BM25 benchmark
    queries with their pinned dense query vectors (registry face of
    :func:`hybrid_rank`)."""
    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts],
        "query_id int, term string",
    )
    qvecs = spark.createDataFrame(
        sorted(_HYBRID_QVECS.items()), "query_id int, qvec_id long"
    )
    return hybrid_rank(
        load_spread(spark, "documents", sf_dir),
        load(spark, "embeddings", sf_dir),
        qterms,
        qvecs,
    )


_Q_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts
)
_QV_VALUES = ", ".join(f"({qid}, {v})" for qid, v in sorted(_HYBRID_QVECS.items()))

HYBRID_SEARCH_SQL = f"""
WITH q(query_id, term) AS (VALUES {_Q_VALUES}),
qv(query_id, qvec_id) AS (VALUES {_QV_VALUES}),
d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents WHERE text IS NOT NULL
),
stats AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM d),
e AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl
  FROM e WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY 1, 2
),
dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         * (tf * ({_BM25_K1} + 1))
         / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl)) AS c
  FROM tf JOIN dfc USING (term), stats
),
perq AS (
  SELECT query_id, tf.doc_id AS doc_id, ROUND(SUM(c), 6) AS bm25
  FROM contrib tf JOIN q USING (term)
  GROUP BY 1, 2
),
sparse AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY bm25 DESC, doc_id ASC) AS bm25_rank
  FROM perq
),
sparse_k AS (SELECT * FROM sparse WHERE bm25_rank <= {_HYBRID_K}),
densed AS (
  SELECT qv.query_id AS query_id, ce.vec_id AS doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY qv.query_id
           ORDER BY ROUND(list_cosine_similarity(
                      list_transform(qe.embedding, x -> CAST(x AS DOUBLE)),
                      list_transform(ce.embedding, x -> CAST(x AS DOUBLE))), 5) DESC,
                    ce.vec_id ASC) AS cos_rank
  FROM qv
  JOIN embeddings qe ON qe.vec_id = qv.qvec_id AND qe.embedding IS NOT NULL
  JOIN embeddings ce ON ce.vec_id != qv.qvec_id AND ce.embedding IS NOT NULL
),
dense_k AS (SELECT * FROM densed WHERE cos_rank <= {_HYBRID_K}),
fused AS (
  SELECT COALESCE(s.query_id, dn.query_id) AS query_id,
         COALESCE(s.doc_id, dn.doc_id) AS doc_id,
         s.bm25_rank AS bm25_rank,
         dn.cos_rank AS cos_rank,
         ROUND(COALESCE(1.0 / ({_RRF_C} + s.bm25_rank), 0)
             + COALESCE(1.0 / ({_RRF_C} + dn.cos_rank), 0), 6) AS rrf_score
  FROM sparse_k s
  FULL OUTER JOIN dense_k dn
    ON s.query_id = dn.query_id AND s.doc_id = dn.doc_id
)
SELECT query_id, rank, doc_id, rrf_score, bm25_rank, cos_rank
FROM (
  SELECT query_id, doc_id, rrf_score, bm25_rank, cos_rank,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM fused
)
WHERE rank <= {_HYBRID_TOPK}
"""


QUERIES = {
    "hybrid_search_rrf": hybrid_search_rrf,
}

ORACLES = {
    "hybrid_search_rrf": HYBRID_SEARCH_SQL,
}
