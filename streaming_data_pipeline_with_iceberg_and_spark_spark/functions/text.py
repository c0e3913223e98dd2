"""Text-processing column expressions: tokenize, normalize, shingle, hash.

All built-in functions (split/transform/slice/md5/conv) — no UDFs, so the
whole path stays JVM-side. Hashes that must be oracle-reproducible use md5
(cross-engine stable); engine-internal hashing (MinHash perms) uses xxhash64
(faster, Spark-native).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# words drawn from the synthetic corpus vocabulary; generic function-word list
STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (lowercased)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(text)), r"\s+")


def normalize(text: Column | str) -> Column:
    """Dedup normalization: lowercase, strip non-alnum, collapse whitespace."""
    text = F.col(text) if isinstance(text, str) else text
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array, via transform over a
    sequence of start offsets (no explode needed at this stage).

    The token array is bound ONCE as a lambda variable (outer transform over
    a 1-element array) — writing ``slice(toks, ...)`` directly inside the
    offset lambda would re-evaluate the tokenizer expression per offset,
    turning an O(len) projection into O(len²) per row.
    """
    return F.flatten(
        F.transform(
            F.array(toks),
            lambda t: F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
            ),
        )
    )


def md5_bucket16(s: Column) -> Column:
    """Deterministic 16-bit hash from md5 (cross-engine reproducible):
    first 4 hex chars → int in [0, 65535]."""
    return F.conv(F.substring(F.md5(s), 1, 4), 16, 10).cast("int")


def md5_bucket32(s: Column) -> Column:
    """32-bit variant (8 hex chars)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def mg_fold(cnt, new_counts, cap: int):
    """One Misra-Gries merge step over pandas Series keyed by token: add the
    batch's exact counts, then on overflow apply the batched decrement (drop
    the (cap+1)-th largest count from every survivor). The single shared
    implementation of the summary fold — the batch two-phase heavy hitters
    (operators/textops.py) and the streaming sharded state
    (streaming/stateful.py) must decrement identically or their results
    silently diverge. State never exceeds ``cap`` counters.

    cite: Misra & Gries 1982 (public literature)."""
    cnt = cnt.add(new_counts, fill_value=0)
    if len(cnt) > cap:
        thresh = cnt.nlargest(cap + 1).iloc[-1]
        cnt = cnt[cnt > thresh] - thresh
    return cnt
