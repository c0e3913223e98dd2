"""Multimodal column operators (SURVEY.md §2.8 L5).

Convention: media travel as opaque ``binary`` columns + a typed metadata
struct — the Spark-idiomatic layout for 100 TB of images/audio/video (bytes
stay columnar in parquet; metadata prunes without touching payloads).

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image`` raises NotImplementedError; ``fake_decode_features`` is the
deterministic stand-in used by the mapInPandas pipeline so the Spark-side
plumbing (schema, Arrow batching, partition shape) is real and tested.
Payloads here are synthesized from ``documents.text`` bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load, load_spread

# metadata struct carried beside every media payload column
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - intentional stub
    """Real codec hook (PIL/libjpeg not in this container)."""
    raise NotImplementedError(
        "image decode requires a codec library; use fake_decode_features "
        "for deterministic pipeline tests"
    )


def fake_decode_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decoder: (byte_sum % 997, fake_w, fake_h)."""
    byte_sum = sum(payload) % 997
    fake_w = 16 + (payload[0] % 64) if payload else 0
    fake_h = 16 + (payload[-1] % 64) if payload else 0
    return byte_sum, fake_w, fake_h


def with_media_column(docs: DataFrame) -> DataFrame:
    """Attach a synthetic binary payload + metadata struct to documents."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5("text").alias("content_md5"),
        ).alias("meta"),
    )


def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: binary payload + metadata projection (no decode needed —
    metadata-only scans must not touch payload bytes at scale)."""
    docs = load(spark, "documents", sf_dir)
    media = with_media_column(docs)
    return media.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
    )


MM_BINARY_METADATA_SQL = """
SELECT doc_id,
       'text/plain' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
"""


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum_mod", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: Arrow-batched feature extraction over binary payloads via
    mapInPandas — the real multimodal hot path shape. The stand-in decoder
    is deterministic byte math, so ``MM_FEATURE_EXTRACT_SQL`` reproduces it
    value-exactly (plus a pure-Python oracle in tests/test_multimodal.py).

    At scale: payload batches stream through Arrow; the Python worker sees
    pandas chunks, never the whole partition; output schema is fixed.

    NULL text yields a NULL payload from ``F.encode``; there is nothing to
    decode, so those rows are dropped here AND in the oracle (same WHERE) —
    keeping engine and oracle row sets identical if a fixture ever carries
    NULL text."""
    media = with_media_column(
        load_spread(spark, "documents", sf_dir).filter(F.col("text").isNotNull())
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "byte_sum_mod": [f[0] for f in feats],
                    "fake_width": [f[1] for f in feats],
                    "fake_height": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(extract, schema=_FEATURE_SCHEMA)


# The fake decoder is pure byte arithmetic over the UTF-8 payload, so the
# oracle reproduces it exactly by hex-expanding the blob: byte i is the hex
# pair at substr(2i+1, 2). Works for any byte content, not just ASCII.
MM_FEATURE_EXTRACT_SQL = """
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bytes,
       CAST(CASE WHEN n = 0 THEN 0 ELSE
         list_sum(list_transform(range(0, n), i ->
           CAST(('0x' || substr(h, 2 * i + 1, 2)) AS INT))) % 997
       END AS INT) AS byte_sum_mod,
       CAST(CASE WHEN n = 0 THEN 0
         ELSE 16 + CAST(('0x' || substr(h, 1, 2)) AS INT) % 64
       END AS INT) AS fake_width,
       CAST(CASE WHEN n = 0 THEN 0
         ELSE 16 + CAST(('0x' || substr(h, 2 * n - 1, 2)) AS INT) % 64
       END AS INT) AS fake_height
FROM b
"""


# shared engine/oracle knobs — every SQL twin below interpolates these
# (never hardcodes them), so changing a constant cannot desync the sides
_PATCH = 14  # ViT-style patch edge (pixels)
_MAX_SIDE = 64  # resize rule: cap the longest side before patching
_FRAME_STEP = 100  # frame-sampling stride (every Nth frame)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: frame sampling plumbing — treat each doc as an n_chars-frame clip,
    emit every ``_FRAME_STEP``-th frame index (sequence + explode; pure
    column ops)."""
    docs = load(spark, "documents", sf_dir)
    frames = F.sequence(
        F.lit(0), F.col("n_chars").cast("int") - 1, F.lit(_FRAME_STEP)
    )
    return docs.select(
        "doc_id", F.explode(frames).alias("frame_idx")
    ).withColumn("sample_tag", F.concat(F.lit("f"), F.col("frame_idx")))


MM_FRAME_SAMPLE_SQL = f"""
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       'f' || CAST(i AS VARCHAR) AS sample_tag
FROM documents, unnest(range(0, n_chars, {_FRAME_STEP})) AS t(i)
"""


def mm_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5+L1: content-hash dedup over binary payloads (metadata-only)."""
    media = with_media_column(load(spark, "documents", sf_dir))
    return (
        media.groupBy(F.col("meta.content_md5").alias("content_md5"))
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count("*").alias("n_copies"),
            F.max(F.col("meta.n_bytes")).alias("n_bytes"),
        )
    )


MM_CONTENT_DEDUP_SQL = """
SELECT md5(text) AS content_md5,
       MIN(doc_id) AS survivor_doc_id,
       COUNT(*) AS n_copies,
       MAX(CAST(octet_length(encode(text)) AS BIGINT)) AS n_bytes
FROM documents
GROUP BY 1
"""


def mm_patch_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VLM token accounting: patch-grid token count per image after a
    resize-to-cap rule — the budgeting pass a multimodal training pipeline
    runs BEFORE decode to plan packing. Image dims come from the same
    deterministic fake-decoder rule as ``mm_feature_extract`` (16 + first/
    last byte % 64), but expressed as pure column expressions so the whole
    query stays JVM-side and oracle-checkable — at scale this is a
    metadata-only scan that never touches payload bytes."""
    docs = load(spark, "documents", sf_dir)
    w = F.lit(16) + F.ascii(F.substring("text", 1, 1)) % 64
    h = F.lit(16) + F.ascii(F.substring("text", -1, 1)) % 64
    # resize: scale so max(w,h) ≤ _MAX_SIDE, preserving aspect (integer floor)
    scale = F.least(F.lit(1.0), F.lit(_MAX_SIDE) / F.greatest(w, h))
    rw = F.greatest(F.lit(1), F.floor(w * scale)).cast("int")
    rh = F.greatest(F.lit(1), F.floor(h * scale)).cast("int")
    npx = F.ceil(rw / F.lit(_PATCH)).cast("int")
    npy = F.ceil(rh / F.lit(_PATCH)).cast("int")
    return docs.select(
        "doc_id",
        rw.alias("resized_w"),
        rh.alias("resized_h"),
        (npx * npy).alias("n_patches"),
        (npx * npy + 1).alias("vision_tokens"),
    )


MM_PATCH_TOKEN_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         16 + ascii(substr(text, 1, 1)) % 64 AS w,
         16 + ascii(substr(text, -1, 1)) % 64 AS h
  FROM documents
), resized AS (
  SELECT doc_id,
         CAST(greatest(1, floor(w * least(1.0, {_MAX_SIDE} / greatest(w, h)))) AS INT) AS resized_w,
         CAST(greatest(1, floor(h * least(1.0, {_MAX_SIDE} / greatest(w, h)))) AS INT) AS resized_h
  FROM dims
)
SELECT doc_id, resized_w, resized_h,
       CAST(ceil(resized_w / {_PATCH}.0) * ceil(resized_h / {_PATCH}.0) AS INT) AS n_patches,
       CAST(ceil(resized_w / {_PATCH}.0) * ceil(resized_h / {_PATCH}.0) + 1 AS INT) AS vision_tokens
FROM resized
"""


# media-capstone knobs: per-item vision-token ceiling and per-source
# cumulative token budget (the greedy fill a VLM data pipeline runs to
# balance sources under a fixed token allowance)
_MM_TOKEN_FILTER = 17
_MM_SOURCE_BUDGET = 60


def curate_multimodal_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition for the MEDIA pipeline (the multimodal twin of
    sampling.curate_pretraining_corpus): per-item vision-token gate →
    content dedup (min-id survivor per payload hash) → per-source greedy
    budget fill (admit items in doc_id order while the source's cumulative
    vision-token spend stays under budget).

    Plan shape: the token budget is pure scan-level column math (never
    touches payload bytes — mm_patch_token_budget's rule), the dedup is one
    shuffle on the content hash at post-gate size, the budget fill is the
    scale-adaptive running sum (``sampling.scale_adaptive_prefix_sum`` —
    sliced + broadcast offsets above the row threshold so one dominant
    source never sorts on a single task, a plain per-source window below,
    bit-identical either way). Every stage is ANSI-expressible, so the
    WHOLE chain is value-checked against DuckDB. NULL text yields a NULL
    token count and is dropped by the gate on both sides."""
    from ..io import parquet_row_count
    from .sampling import scale_adaptive_prefix_sum

    docs = load(spark, "documents", sf_dir)
    w_ = F.lit(16) + F.ascii(F.substring("text", 1, 1)) % 64
    h_ = F.lit(16) + F.ascii(F.substring("text", -1, 1)) % 64
    scale = F.least(F.lit(1.0), F.lit(_MAX_SIDE) / F.greatest(w_, h_))
    rw = F.greatest(F.lit(1), F.floor(w_ * scale)).cast("int")
    rh = F.greatest(F.lit(1), F.floor(h_ * scale)).cast("int")
    vtok = (
        F.ceil(rw / F.lit(_PATCH)).cast("int")
        * F.ceil(rh / F.lit(_PATCH)).cast("int")
        + F.lit(1)
    )
    gated = docs.select(
        "doc_id", "source", "text", vtok.alias("vision_tokens")
    ).filter(F.col("vision_tokens") <= _MM_TOKEN_FILTER)
    wd = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        gated.withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "text")
    )
    filled = scale_adaptive_prefix_sum(
        deduped,
        "source",
        "doc_id",
        "doc_id",
        "vision_tokens",
        "cum_tokens",
        est_rows=parquet_row_count("documents", sf_dir),
    )
    return filled.filter(F.col("cum_tokens") <= _MM_SOURCE_BUDGET).select(
        "doc_id", "source", "vision_tokens", "cum_tokens"
    )


MM_CURATE_SQL = f"""
WITH dims AS (
  SELECT doc_id, source, text,
         16 + ascii(substr(text, 1, 1)) % 64 AS w,
         16 + ascii(substr(text, -1, 1)) % 64 AS h
  FROM documents
), budget AS (
  SELECT doc_id, source, text,
         CAST(ceil(CAST(greatest(1, floor(w * least(1.0, {_MAX_SIDE} / greatest(w, h)))) AS INT) / {_PATCH}.0)
            * ceil(CAST(greatest(1, floor(h * least(1.0, {_MAX_SIDE} / greatest(w, h)))) AS INT) / {_PATCH}.0)
            + 1 AS INT) AS vision_tokens
  FROM dims
), gated AS (
  SELECT * FROM budget WHERE vision_tokens <= {_MM_TOKEN_FILTER}
), deduped AS (
  SELECT doc_id, source, vision_tokens FROM gated g
  WHERE doc_id = (SELECT MIN(doc_id) FROM gated g2 WHERE md5(g2.text) = md5(g.text))
), filled AS (
  SELECT doc_id, source, vision_tokens,
         CAST(SUM(vision_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM deduped
)
SELECT doc_id, source, vision_tokens, cum_tokens
FROM filled
WHERE cum_tokens <= {_MM_SOURCE_BUDGET}
"""


QUERIES = {
    "mm_binary_metadata": mm_binary_metadata,
    "curate_multimodal_corpus": curate_multimodal_corpus,
    "mm_patch_token_budget": mm_patch_token_budget,
    "mm_feature_extract": mm_feature_extract,
    "mm_frame_sample": mm_frame_sample,
    "mm_content_dedup": mm_content_dedup,
}

ORACLES = {
    "mm_binary_metadata": MM_BINARY_METADATA_SQL,
    "curate_multimodal_corpus": MM_CURATE_SQL,
    "mm_patch_token_budget": MM_PATCH_TOKEN_SQL,
    "mm_frame_sample": MM_FRAME_SAMPLE_SQL,
    "mm_content_dedup": MM_CONTENT_DEDUP_SQL,
    # round 6: upgraded from rows-only — the fake decoder is deterministic
    # byte math, which DuckDB reproduces by hex-decoding the UTF-8 blob
    "mm_feature_extract": MM_FEATURE_EXTRACT_SQL,
}
