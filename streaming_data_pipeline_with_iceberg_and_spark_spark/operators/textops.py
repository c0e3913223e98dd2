"""Text analysis operators (SURVEY.md §2.8 L4/L6).

Language-ID, quality scoring, token counting, TF-IDF, n-gram frequency,
fingerprinting — all built-in column expressions / one-explode pipelines.
At 100 TB each of these is a single scan (+ one shuffle for the global
aggregations); nothing is per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, md5_bucket16, mg_fold, tokens
from ..io import (
    compact_checkpoint,
    data_fingerprint,
    load,
    load_spread,
    parquet_row_count,
    small_df,
)

# marker stopwords per language for the n-gram/stopword language-ID heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "la", "y", "los"],
}


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, avg token length."""
    docs = load_spread(spark, "documents", sf_dir)
    toks = tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
            )
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


TEXT_TOKEN_STATS_SQL = """
WITH t AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
       ROUND(list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) / len(toks), 6) AS avg_token_len,
       CAST(length(text) AS BIGINT) AS n_chars_actual
FROM t
"""


# BPE-style pre-tokenizer: contraction suffixes, letter runs, 1-3 digit
# groups, punctuation runs — the GPT-2/cl100k pre-split shape restricted to
# constructs whose semantics agree between Java regex (Spark) and RE2
# (DuckDB oracle): plain alternation, no lookaround.
_BPE_REGEX = r"'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]{1,3}|[^a-z0-9\s']+|'"


def text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish: regex pre-tokenization (the way LLM token
    budgets are actually estimated) vs plain whitespace counts."""
    docs = load_spread(spark, "documents", sf_dir)
    toks = F.regexp_extract_all(F.lower("text"), F.lit(_BPE_REGEX), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_bpe"),
        F.size(tokens("text")).alias("n_ws_tokens"),
        F.round(
            F.size(toks) / F.size(tokens("text")), 6
        ).alias("bpe_per_ws_token"),
    )


TEXT_TOKEN_BPE_SQL = """
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '{rx}') AS bpe,
         string_split_regex(lower(trim(text)), '\\s+') AS ws
  FROM documents
)
SELECT doc_id,
       CAST(len(bpe) AS INT) AS n_bpe_tokens,
       CAST(len(list_distinct(bpe)) AS INT) AS n_distinct_bpe,
       CAST(len(ws) AS INT) AS n_ws_tokens,
       ROUND(CAST(len(bpe) AS DOUBLE) / len(ws), 6) AS bpe_per_ws_token
FROM t
""".format(rx=_BPE_REGEX.replace("'", "''"))


# ---------------------------------------------------------------------------
# In-engine BPE merge TRAINING (round 12): learn the merge table itself —
# the piece of the tokenizer story that was pinned, not learned (the apply
# face `text_token_bpe` and the diagnostics `vocab_coverage` /
# `text_pmi_collocations` predate it). The algorithm is Sennrich et al.
# 2016 (arXiv:1508.07909): iteratively merge the most frequent adjacent
# symbol pair. Two design decisions make it 100 TB-shaped and
# SQL-replayable:
#
#  * TRAIN ON THE VOCABULARY, NOT THE CORPUS (the original paper's trick):
#    pair counts over word TYPES weighted by corpus frequency equal pair
#    counts over the raw token stream, so each round's state and shuffle
#    are bounded by the word-type table — millions of rows at 100 TB, not
#    the fact. The corpus is scanned exactly once (to build w0).
#  * PINNED merge count + constant driver state (one (lhs, rhs, cnt) row
#    collected per round — the train_quality_classifier discipline), so
#    DuckDB replays the whole run as unrolled AS MATERIALIZED CTEs and the
#    entry is VALUE-EXACT, all-integer (no rounding anywhere).
#
# The greedy left-to-right non-overlapping merge is ONE fold shared by
# both engines (F.aggregate ≡ list_reduce) over the word's symbols joined
# by a reserved delimiter (U+001F, excluded from the vocabulary on both
# sides): tail symbol == lhs and next == rhs ⇒ append rhs to the tail.
# A freshly merged tail can never re-match (lhs||rhs ≠ lhs since rhs is
# nonempty), which is exactly greedy semantics.
_BPE_TRAIN_MERGES = 10
_BPE_CKPT_EVERY = 4
_BPE_DELIM = "\x1f"


def bpe_word_table(docs: DataFrame) -> DataFrame:
    """(word, freq) over the BPE pre-tokens — the training input. Shared
    by training and the apply face so the two cannot disagree about what
    a word is. Words containing the reserved delimiter are excluded on
    both engines (the oracle's strpos guard)."""
    toks = F.regexp_extract_all(F.lower("text"), F.lit(_BPE_REGEX), 0)
    return (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(toks).alias("word"))
        .filter(~F.col("word").contains(_BPE_DELIM))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _bpe_merge_fold(seq, lhs: str, rhs: str):
    """Greedy merge of the pinned (lhs, rhs) pair over a delimited symbol
    string, as ONE fold. The rounds nest these expressions (round k's
    input is round k-1's fold), so the input `seq` must appear EXACTLY
    ONCE — the first formulation seeded the fold with element_at(syms, 1)
    and folded slice(syms, 2, …), referencing the previous round's whole
    tree three times: 3^k expression growth, and round ~8 hung Catalyst.
    The empty-string sentinel keeps it single-use (symbols are never
    empty — every pre-token matches ≥1 char — so acc = '' uniquely marks
    "before the first symbol"). DuckDB's list_reduce seeds with the first
    element instead; the two are semantically identical here."""
    d = _BPE_DELIM
    return F.aggregate(
        F.split(seq, d),
        F.lit(""),
        lambda acc, x: F.when(acc == F.lit(""), x)
        .when(
            (x == F.lit(rhs))
            & ((acc == F.lit(lhs)) | F.endswith(acc, F.lit(d + lhs))),
            F.concat(acc, F.lit(rhs)),
        )
        .otherwise(F.concat(acc, F.lit(d), x)),
    )


# (applicationId, sf_dir, documents-fingerprint) -> (merges, final words
# frame). The CC-memo discipline: the train face and the apply face share
# one run; the fingerprint key rebuilds on a same-session corpus rewrite;
# the memoized frame is vocabulary-bounded.
_BPE_STATE_CACHE: dict = {}


def clear_bpe_cache() -> None:
    _BPE_STATE_CACHE.clear()


def _bpe_state(spark: SparkSession, sf_dir: str):
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        data_fingerprint(sf_dir, "documents"),
    )
    hit = _BPE_STATE_CACHE.get(key)
    if hit is not None:
        return hit
    for k in list(_BPE_STATE_CACHE):
        try:
            stale = (
                _BPE_STATE_CACHE[k][1].sparkSession.sparkContext._jsc is None
            )
        except Exception:
            stale = True
        if stale or k[:2] == key[:2]:
            _BPE_STATE_CACHE.pop(k, None)
    result = bpe_train_from_words(
        bpe_word_table(load(spark, "documents", sf_dir))
    )
    _BPE_STATE_CACHE[key] = result
    return result


def bpe_train_from_words(words: DataFrame):
    """THE BPE training loop over a (word, freq) table — shared by the
    corpus batch face (`_bpe_state`) and the NINETEENTH incremental
    path's serve face (`bpe_merges_from_word_cells`), so training from
    the maintained word-cells table cannot diverge from training off
    the scan.  Returns (merges list, final words frame)."""
    # Materialize sparsely: w0 once, then every _BPE_CKPT_EVERY rounds.
    # Between checkpoints each round's single pair-count job re-applies
    # the accumulated merge folds MAP-SIDE as a nested expression — a
    # per-round materialization job costs more than the folds (measured:
    # per-round checkpointing was ~2 jobs/round and 16 s at sf0.01; the
    # fold re-derivation shape runs the same training in ~half). The
    # periodic checkpoint bounds the re-derivation at O(c·vocab) per
    # round instead of O(N·vocab) — the knob that matters when the
    # word-type table is 10⁸ rows at 100 TB.
    state = words.select(
        "word",
        "freq",
        F.array_join(F.split("word", ""), _BPE_DELIM).alias("seq"),
    ).localCheckpoint(eager=True)
    seq_expr = F.col("seq")
    merges: list = []
    for rank in range(1, _BPE_TRAIN_MERGES + 1):
        syms = F.split(seq_expr, _BPE_DELIM)
        pairs = (
            state.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(syms, 1, F.size(syms) - 1),
                        F.slice(syms, 2, F.size(syms) - 1),
                        lambda a, b: F.struct(
                            a.alias("lhs"), b.alias("rhs")
                        ),
                    )
                ).alias("pr"),
            )
            .groupBy("pr.lhs", "pr.rhs")
            # BARE aggregate; no casts inside .agg() (the r11 sort-agg
            # lesson) — counts are already long
            .agg(F.sum("freq").alias("cnt"))
        )
        # constant-bounded collect: exactly ONE row per pinned round (the
        # argmax pair), the train_quality_classifier driver-state shape
        best = (
            pairs.orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # fully merged / empty corpus: fewer than N merges
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], int(best[0]["cnt"])
        merges.append((rank, lhs, rhs, lhs + rhs, cnt))
        seq_expr = _bpe_merge_fold(seq_expr, lhs, rhs)
        if rank % _BPE_CKPT_EVERY == 0 and rank < _BPE_TRAIN_MERGES:
            state = state.select(
                "word", "freq", seq_expr.alias("seq")
            ).localCheckpoint(eager=True)
            seq_expr = F.col("seq")
    final_words = state.select("word", "freq", seq_expr.alias("seq"))
    return merges, final_words


def merge_word_cells(state: DataFrame) -> DataFrame:
    """Collapse appended per-batch (word, freq) partials to one row per
    word type — the serve-side merge of the NINETEENTH incremental path
    (and the whole job of ``compact_word_cells``).  Integer sums merge
    exactly, so training from the merged cells is bit-identical to
    training off the corpus scan."""
    return state.groupBy("word").agg(F.sum("freq").alias("freq"))


def bpe_merges_from_word_cells(spark: SparkSession, cells: DataFrame) -> DataFrame:
    """Serve BPE merge training from the maintained word-cells table —
    ``bpe_merges_from_word_cells(cells) ≡ train_bpe_merges`` over
    everything ingested (parity test): retrain the tokenizer nightly
    without re-scanning the corpus."""
    merges, _ = bpe_train_from_words(merge_word_cells(cells))
    return spark.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, merged string,"
        " pair_count long",
    )


def unigram_vocab_from_word_cells(cells: DataFrame):
    """Serve unigram-LM training from the SAME maintained word-cells
    table (the cap filter is a pure predicate on the merged cells) —
    vocab ≡ the batch trainer's."""
    return uni_train_from_words(
        merge_word_cells(cells).filter(F.length("word") <= _UNI_MAXW)
    )


def train_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the top-``_BPE_TRAIN_MERGES`` BPE merges from the corpus:
    (merge_rank, lhs, rhs, merged, pair_count), rank-ordered. Value-exact:
    the oracle replays every round as unrolled MATERIALIZED CTEs and every
    column is a string or an integer count."""
    merges, _ = _bpe_state(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, merged string,"
        " pair_count long",
    )


def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the LEARNED merge table — the apply face fed
    by :func:`train_bpe_merges` (one shared training run per session via
    the memo). Per doc: pre-token count, post-merge symbol count, and
    symbols-per-token (the compression the learned merges actually buy).

    Scale shape: symbol counts are computed once per word TYPE on the
    final vocabulary table (the training state — vocabulary-bounded), then
    joined to per-(doc, word) counts: the fold never runs per token
    instance. No broadcast hint on the vocab join (word types are
    corpus-scale at 100 TB; AQE decides at small SF)."""
    _, final_words = _bpe_state(spark, sf_dir)
    vocab = final_words.select(
        "word", F.size(F.split("seq", _BPE_DELIM)).alias("n_syms")
    )
    docs = load_spread(spark, "documents", sf_dir)
    toks = F.regexp_extract_all(F.lower("text"), F.lit(_BPE_REGEX), 0)
    per_word = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(toks).alias("word"))
        .filter(~F.col("word").contains(_BPE_DELIM))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_word.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_pretokens"),
            F.sum(F.col("n") * F.col("n_syms")).alias("n_bpe_symbols"),
        )
        .select(
            "doc_id",
            "n_pretokens",
            "n_bpe_symbols",
            F.round(
                F.col("n_bpe_symbols") / F.col("n_pretokens"), 6
            ).alias("symbols_per_token"),
        )
    )


def bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal value of each learned BPE merge: applying merge k removes
    exactly pair_count_k symbols from the corpus-weighted total (the
    conservation identity the tests pin), so the compression curve —
    symbols remaining and ratio-to-char-level after each merge — falls
    out of the merge table and ONE corpus total, no re-encoding pass.
    The diminishing-returns diagnostic that sizes a vocabulary budget
    (pair with `vocab_coverage`, its pre-BPE twin). Rides the memoized
    training run; all-integer until the final rounded division."""
    merges, _ = _bpe_state(spark, sf_dir)
    m = spark.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, merged string,"
        " pair_count long",
    )
    total = bpe_word_table(load(spark, "documents", sf_dir)).agg(
        F.sum(F.col("freq") * F.length("word")).alias("start_symbols")
    )
    w = Window.orderBy("merge_rank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("pair_count").over(w)
    return (
        m.crossJoin(F.broadcast(total))
        .select(
            "merge_rank",
            "merged",
            "pair_count",
            (F.col("start_symbols") - cum).alias("symbols_after"),
            F.round(
                (F.col("start_symbols") - cum) / F.col("start_symbols"), 6
            ).alias("compression_ratio"),
        )
        .orderBy("merge_rank")
    )


def _bpe_compression_sql() -> str:
    selects = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, lhs || rhs AS merged,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, _BPE_TRAIN_MERGES + 1)
    )
    return f"""
WITH {_bpe_train_ctes()},
mt AS ({selects}),
tot AS (
  SELECT CAST(SUM(freq * length(word)) AS BIGINT) AS start_symbols FROM w0
)
SELECT merge_rank, merged, pair_count,
       CAST(start_symbols - SUM(pair_count) OVER (ORDER BY merge_rank)
            AS BIGINT) AS symbols_after,
       ROUND(CAST(start_symbols - SUM(pair_count) OVER (ORDER BY merge_rank)
                  AS DOUBLE) / start_symbols, 6) AS compression_ratio
FROM mt, tot
ORDER BY merge_rank
"""


def _bpe_train_ctes() -> str:
    """The unrolled training rounds as a CTE chain (shared by the train
    and apply oracles). MATERIALIZED is required: w{i} references w{i-1}
    twice (pair scan + merge scan) and DuckDB would otherwise inline the
    chain exponentially."""
    rx = _BPE_REGEX.replace("'", "''")
    d = "chr(31)"
    ctes = [
        f"""w0 AS MATERIALIZED (
  SELECT word, freq, array_to_string(string_split(word, ''), {d}) AS seq
  FROM (
    SELECT word, COUNT(*) AS freq FROM (
      SELECT unnest(regexp_extract_all(lower(text), '{rx}')) AS word
      FROM documents WHERE text IS NOT NULL
    ) WHERE strpos(word, {d}) = 0
    GROUP BY word
  )
)"""
    ]
    for i in range(1, _BPE_TRAIN_MERGES + 1):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT syms[i] AS lhs, syms[i + 1] AS rhs, SUM(freq) AS cnt
  FROM (SELECT string_split(seq, {d}) AS syms, freq,
               unnest(range(1, len(string_split(seq, {d})))) AS i
        FROM w{i - 1})
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT lhs, rhs, cnt FROM p{i} ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1
),
w{i} AS MATERIALIZED (
  SELECT word, freq,
         list_reduce(string_split(seq, {d}),
           (acc, x) -> CASE WHEN x = b.rhs
                             AND (acc = b.lhs OR ends_with(acc, {d} || b.lhs))
                        THEN acc || x ELSE acc || {d} || x END) AS seq
  FROM w{i - 1}, b{i} b
)"""
        )
    return ",\n".join(ctes)


def _train_bpe_sql() -> str:
    selects = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, lhs, rhs, lhs || rhs AS merged,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, _BPE_TRAIN_MERGES + 1)
    )
    return (
        f"WITH {_bpe_train_ctes()}\n"
        f"SELECT * FROM ({selects}) ORDER BY merge_rank"
    )


TRAIN_BPE_SQL = _train_bpe_sql()
BPE_COMPRESSION_SQL = _bpe_compression_sql()


def _bpe_apply_sql() -> str:
    rx = _BPE_REGEX.replace("'", "''")
    n = _BPE_TRAIN_MERGES
    return f"""
WITH {_bpe_train_ctes()},
bpe_vocab AS (
  SELECT word, len(string_split(seq, chr(31))) AS n_syms FROM w{n}
),
bpe_per_word AS (
  SELECT doc_id, word, COUNT(*) AS n FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{rx}')) AS word
    FROM documents WHERE text IS NOT NULL
  ) WHERE strpos(word, chr(31)) = 0
  GROUP BY doc_id, word
)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_pretokens,
       CAST(SUM(n * n_syms) AS BIGINT) AS n_bpe_symbols,
       ROUND(CAST(SUM(n * n_syms) AS DOUBLE) / SUM(n), 6)
         AS symbols_per_token
FROM bpe_per_word JOIN bpe_vocab USING (word)
GROUP BY doc_id
"""


BPE_APPLY_SQL = _bpe_apply_sql()


# Unigram-LM tokenizer training knobs (interpolated into the oracle).
_UNI_MAXP = 4  # max piece length (chars)
_UNI_MAXW = 16  # word-type length cap — longer types sit out of training
_UNI_SEED = 80  # multi-char seed candidates kept from substring counting
_UNI_VOCAB = 48  # multi-char pieces kept per pruning round
_UNI_ROUNDS = 3  # pinned segment→count→prune rounds


def _uni_word_table(docs: DataFrame) -> DataFrame:
    """Length-capped word-type table for unigram-LM training: the SAME
    pre-tokenizer as BPE (shared regex — the two trainers must agree on
    what a word is), plus the ≤_UNI_MAXW cap that bounds the greedy
    fold's iteration count on both engines."""
    return bpe_word_table(docs).filter(F.length("word") <= _UNI_MAXW)


def _uni_greedy_pieces(word, vocab_multi: list[str]):
    """Greedy longest-match segmentation of ``word`` against the (driver-
    bounded) multi-char vocabulary + the implicit single-char fallback,
    as ONE JVM sequential fold — n iterations, each consuming one piece
    (single-char pieces guarantee progress, so n iterations always
    finish).  Returns the array<string> of pieces in order."""
    n = F.length(word)
    vmap = (
        F.create_map(
            *[c for p in vocab_multi for c in (F.lit(p), F.lit(1))]
        )
        if vocab_multi
        else None
    )

    def step(acc, _i):
        pos = acc["pos"]
        cands = []
        if vmap is not None:
            for L in range(_UNI_MAXP, 1, -1):
                c = word.substr(pos, F.lit(L))
                cands.append(
                    F.when(
                        (pos + F.lit(L - 1) <= n)
                        & F.element_at(vmap, c).isNotNull(),
                        c,
                    )
                )
        piece = F.coalesce(*cands, word.substr(pos, F.lit(1)))
        return F.when(pos > n, acc).otherwise(
            F.struct(
                (pos + F.length(piece)).alias("pos"),
                F.concat(acc["out"], F.array(piece)).alias("out"),
            )
        )

    zero = F.struct(
        F.lit(1).cast("int").alias("pos"),
        F.expr("CAST(array() AS array<string>)").alias("out"),
    )
    return F.aggregate(
        F.sequence(F.lit(1), n), zero, step, lambda acc: acc["out"]
    )


# (applicationId, sf_dir, documents-fingerprint) -> (vocab_rows,
# word_pieces frame).  The _BPE_STATE_CACHE discipline: train and apply
# faces share one run; fingerprint key rebuilds on same-session rewrite;
# the memoized frame is word-type-bounded.
_UNI_STATE_CACHE: dict = {}


def clear_unigram_cache() -> None:
    _UNI_STATE_CACHE.clear()


def _uni_state(spark: SparkSession, sf_dir: str):
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        data_fingerprint(sf_dir, "documents"),
    )
    hit = _UNI_STATE_CACHE.get(key)
    if hit is not None:
        return hit
    for k in list(_UNI_STATE_CACHE):
        try:
            stale = (
                _UNI_STATE_CACHE[k][1].sparkSession.sparkContext._jsc is None
            )
        except Exception:
            stale = True
        if stale or k[:2] == key[:2]:
            _UNI_STATE_CACHE.pop(k, None)
    result = uni_train_from_words(
        _uni_word_table(load(spark, "documents", sf_dir))
    )
    _UNI_STATE_CACHE[key] = result
    return result


def uni_train_from_words(words_capped: DataFrame):
    """THE unigram-LM training loop over a length-capped (word, freq)
    table — shared by the corpus batch face (`_uni_state`) and the
    NINETEENTH incremental path's serve face
    (`unigram_vocab_from_word_cells`).  Returns (vocab list,
    word_pieces frame)."""
    words = words_capped.localCheckpoint(eager=True)
    word = F.col("word")
    n = F.length(word)
    # seed: every substring of length 2.._UNI_MAXP, corpus-weighted.
    # Factory closure, NOT a default-arg lambda: F.transform treats a
    # two-parameter lambda as (element, index) and would bind the array
    # index over the default.
    def _subs(L: int):
        return F.when(
            n >= L,
            F.transform(
                F.sequence(F.lit(1), n - F.lit(L - 1)),
                lambda i: word.substr(i, F.lit(L)),
            ),
        ).otherwise(F.expr("CAST(array() AS array<string>)"))

    sub_arrays = [_subs(L) for L in range(2, _UNI_MAXP + 1)]
    seed = (
        words.select("freq", F.explode(F.flatten(F.array(*sub_arrays))).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(_UNI_SEED)
        .collect()
    )
    vocab = sorted(r["piece"] for r in seed)
    for _round in range(_UNI_ROUNDS):
        counts = (
            words.select(
                "freq", F.explode(_uni_greedy_pieces(word, vocab)).alias("piece")
            )
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
            .filter(F.length("piece") > 1)
        )
        # prune by marginal saving = cnt·(len−1) chars vs char-level
        # segmentation, ties (saving DESC, cnt DESC, piece ASC) — the
        # constant-bounded collect contract (≤_UNI_VOCAB rows/round)
        kept = (
            counts.orderBy(
                F.desc((F.col("cnt") * (F.length("piece") - 1))),
                F.desc("cnt"),
                F.asc("piece"),
            )
            .limit(_UNI_VOCAB)
            .collect()
        )
        vocab = sorted(r["piece"] for r in kept)
    # final pass: segment with the FINAL vocabulary; memoize the
    # word-type → pieces frame (word-type-bounded, like BPE final_words)
    word_pieces = words.select(
        "word", "freq", _uni_greedy_pieces(word, vocab).alias("pieces")
    ).localCheckpoint(eager=True)
    return vocab, word_pieces


def train_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (NEW round 13; SentencePiece's
    unigram model, Kudo 2018) — the second trainer of the L23 tokenizer
    family, sharing :func:`bpe_word_table`'s pre-tokenizer with
    :func:`train_bpe_merges`.  Deterministic hard-EM variant built for
    cross-engine exactness: seed the candidate vocabulary from weighted
    substring counts (top-{seed} of length 2..{maxp}), then {rounds}
    pinned rounds of segment → count → prune, where segmentation is
    greedy longest-match (the WordPiece inference rule — integer-exact,
    no float Viterbi scores to diverge on) and pruning keeps the
    {vocab} pieces with the largest marginal saving cnt·(len−1), ties
    (saving, cnt, piece) pinned.  Single-char pieces are never pruned
    (every word stays segmentable).  Output: the final vocabulary with
    usage counts under ITS OWN segmentation and the unigram probability
    — rank, piece, piece_len, count, prob (ROUND 9; an exact division
    of two integers, so no libm divergence).

    Conservation (test-pinned): Σ count·piece_len = Σ freq·len(word) —
    greedy segmentation re-tiles every character exactly once.

    Scale shape: the corpus is scanned once into the word-TYPE table
    (the wordcount shuffle); each round is one segmentation projection
    (a JVM fold per word type — never per token instance) + one
    vocab-keyed count shuffle + a ≤{vocab}-row driver collect.  Driver
    state is the vocabulary list — constant-bounded, the BPE best-pair
    contract.  Word types longer than {maxw} chars sit out (pinned cap,
    both engines).""".format(
        seed=_UNI_SEED,
        maxp=_UNI_MAXP,
        rounds=_UNI_ROUNDS,
        vocab=_UNI_VOCAB,
        maxw=_UNI_MAXW,
    )
    vocab, word_pieces = _uni_state(spark, sf_dir)
    counts = (
        word_pieces.select("freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("count"))
    )
    vocab_df = spark.createDataFrame(
        [(p,) for p in vocab], "piece string"
    ).unionByName(
        word_pieces.select(
            F.explode(F.split("word", "")).alias("piece")
        ).distinct()
    ).distinct()
    total = counts.agg(F.sum("count").alias("total"))
    out = (
        vocab_df.join(counts, "piece", "left")
        .select(
            "piece",
            F.length("piece").alias("piece_len"),
            F.coalesce("count", F.lit(0).cast("long")).alias("count"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "piece",
            "piece_len",
            "count",
            F.round(F.col("count") / F.col("total"), 9).alias("prob"),
        )
    )
    w = Window.orderBy(F.desc("count"), F.asc("piece"))
    return out.select(
        F.row_number().over(w).alias("rank"),
        "piece",
        "piece_len",
        "count",
        "prob",
    ).orderBy("rank")


def unigram_lm_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply face of :func:`train_unigram_lm` (the bpe_apply_merges twin):
    encode the corpus with the LEARNED unigram vocabulary and report per
    document: word count, piece count, pieces-per-word and
    chars-per-piece — the fertility metrics a tokenizer evaluation
    reads.  Piece counts are computed once per word TYPE on the memoized
    segmentation frame, then joined to per-(doc, word) counts — the fold
    never runs per token instance.  Words longer than the training cap
    pass through as single out-of-model pieces (piece count 1, pinned on
    both engines)."""
    _, word_pieces = _uni_state(spark, sf_dir)
    per_type = word_pieces.select(
        "word", F.size("pieces").alias("n_pieces_word")
    )
    docs = load_spread(spark, "documents", sf_dir)
    toks = F.regexp_extract_all(F.lower("text"), F.lit(_BPE_REGEX), 0)
    per_word = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(toks).alias("word"))
        .filter(~F.col("word").contains(_BPE_DELIM))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_word.join(per_type, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(
                F.col("n") * F.coalesce("n_pieces_word", F.lit(1))
            ).alias("n_pieces"),
            F.sum(F.col("n") * F.length("word")).alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_pieces",
            F.round(F.col("n_pieces") / F.col("n_words"), 6).alias(
                "pieces_per_word"
            ),
            F.round(F.col("n_chars") / F.col("n_pieces"), 6).alias(
                "chars_per_piece"
            ),
        )
    )


def _uni_seg_ctes(tag: str, vcte: str, rounds_src: str = "wu") -> str:
    """One greedy longest-match segmentation as a recursive CTE: the
    frontier is one row per word type carrying the cursor position; each
    iteration consumes one piece (longest vocab match at the cursor, via
    length-guarded LEFT JOINs, single char as fallback), so iterations
    are bounded by _UNI_MAXW — never the corpus."""
    joins = "\n".join(
        f"    LEFT JOIN {vcte} c{L}\n"
        f"      ON g.pos + {L - 1} <= len(g.word)\n"
        f"     AND c{L}.piece = substr(g.word, g.pos, {L})"
        for L in range(_UNI_MAXP, 1, -1)
    )
    coal = ", ".join(
        [f"c{L}.piece" for L in range(_UNI_MAXP, 1, -1)]
        + ["substr(g.word, g.pos, 1)"]
    )
    return f"""g{tag} AS (
  SELECT word, freq, 1 AS pos, CAST(NULL AS VARCHAR) AS piece
  FROM {rounds_src}
  UNION ALL
  SELECT g.word, g.freq,
         g.pos + length(COALESCE({coal})),
         COALESCE({coal})
  FROM g{tag} g
{joins}
  WHERE g.pos <= len(g.word)
)"""


def _train_unigram_sql(final_select: str) -> str:
    return "WITH RECURSIVE " + ",\n".join(_uni_ctes()) + "\n" + final_select


def _uni_ctes() -> list[str]:
    """The unrolled unigram training rounds as a CTE list — shared by the
    train/segment oracles and the tokenizer-comparison face (which
    splices them next to the BPE chain; names are disjoint by
    construction: wu/v*/g*/cf vs w*/p*/b*)."""
    rx = _BPE_REGEX.replace("'", "''")
    d = "chr(31)"
    subs = " UNION ALL ".join(
        f"SELECT substr(word, i, {L}) AS piece, freq\n"
        f"  FROM wu, unnest(range(1, len(word) - {L} + 2)) AS t(i)\n"
        f"  WHERE len(word) >= {L}"
        for L in range(2, _UNI_MAXP + 1)
    )
    ctes = [
        f"""wu AS MATERIALIZED (
  SELECT word, freq FROM (
    SELECT word, COUNT(*) AS freq FROM (
      SELECT unnest(regexp_extract_all(lower(text), '{rx}')) AS word
      FROM documents WHERE text IS NOT NULL
    ) WHERE strpos(word, {d}) = 0
    GROUP BY word
  ) WHERE len(word) <= {_UNI_MAXW}
)""",
        f"""v0 AS MATERIALIZED (
  SELECT piece FROM (
    SELECT piece, SUM(freq) AS cnt FROM ({subs}) GROUP BY piece
  ) ORDER BY cnt DESC, piece ASC LIMIT {_UNI_SEED}
)""",
    ]
    for r in range(1, _UNI_ROUNDS + 1):
        ctes.append(_uni_seg_ctes(str(r), f"v{r - 1}"))
        ctes.append(
            f"""v{r} AS MATERIALIZED (
  SELECT piece FROM (
    SELECT piece, SUM(freq) AS cnt FROM g{r}
    WHERE piece IS NOT NULL AND len(piece) > 1
    GROUP BY piece
  )
  ORDER BY cnt * (len(piece) - 1) DESC, cnt DESC, piece ASC
  LIMIT {_UNI_VOCAB}
)""",
        )
    ctes.append(_uni_seg_ctes("f", f"v{_UNI_ROUNDS}"))
    ctes.append(
        """cf AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS count
  FROM gf WHERE piece IS NOT NULL GROUP BY piece
)"""
    )
    return ctes


TRAIN_UNIGRAM_SQL = _train_unigram_sql(
    f"""
, vall AS (
  SELECT piece FROM v{_UNI_ROUNDS}
  UNION
  SELECT DISTINCT unnest(string_split(word, '')) AS piece FROM wu
),
tot AS (SELECT CAST(SUM(count) AS BIGINT) AS total FROM cf),
outv AS (
  SELECT v.piece,
         CAST(len(v.piece) AS INT) AS piece_len,
         COALESCE(c.count, 0) AS count
  FROM vall v LEFT JOIN cf c ON c.piece = v.piece
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY count DESC, piece ASC) AS INT)
         AS rank,
       piece, piece_len, count,
       ROUND(count * 1.0 / total, 9) AS prob
FROM outv, tot
ORDER BY rank
"""
)

UNIGRAM_SEGMENT_SQL = _train_unigram_sql(
    f"""
, npw AS (
  SELECT word, COUNT(*) AS n_pieces_word
  FROM gf WHERE piece IS NOT NULL GROUP BY word
),
pw AS (
  SELECT doc_id, word, COUNT(*) AS n FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text),
      '{_BPE_REGEX.replace("'", "''")}')) AS word
    FROM documents WHERE text IS NOT NULL
  ) WHERE strpos(word, chr(31)) = 0
  GROUP BY doc_id, word
)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_words,
       CAST(SUM(n * COALESCE(t.n_pieces_word, 1)) AS BIGINT) AS n_pieces,
       ROUND(SUM(n * COALESCE(t.n_pieces_word, 1)) * 1.0 / SUM(n), 6)
         AS pieces_per_word,
       ROUND(SUM(n * len(word)) * 1.0
             / SUM(n * COALESCE(t.n_pieces_word, 1)), 6) AS chars_per_piece
FROM pw LEFT JOIN npw t USING (word)
GROUP BY doc_id
"""
)


def tokenizer_fertility_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-vs-unigram tokenizer comparison per source (NEW round 13) —
    the readout a tokenizer bake-off produces: for each document source,
    the corpus word count, symbols-per-word under the learned BPE merges
    and pieces-per-word under the learned unigram vocabulary, and their
    ratio.  Composes BOTH memoized training runs (``_bpe_state`` /
    ``_uni_state`` — the two trainers share the pre-tokenizer, so
    per-word-type symbol counts join on the same word key), so the
    comparison costs two vocab-bounded joins, never a re-train.

    All-integer until the final rounded divisions: Σn, Σn·syms and
    Σn·pieces are exact longs.  Words beyond the unigram length cap
    count 1 piece (the unigram_lm_segment contract).  Scale: one
    (source, word) count shuffle over the corpus + two word-type joins
    (word types, not token instances)."""
    _, final_words = _bpe_state(spark, sf_dir)
    _, word_pieces = _uni_state(spark, sf_dir)
    bpev = final_words.select(
        "word", F.size(F.split("seq", _BPE_DELIM)).alias("n_syms")
    )
    npw = word_pieces.select("word", F.size("pieces").alias("n_pieces"))
    docs = load_spread(spark, "documents", sf_dir)
    toks = F.regexp_extract_all(F.lower("text"), F.lit(_BPE_REGEX), 0)
    pw = (
        docs.filter(F.col("text").isNotNull())
        .select("source", F.explode(toks).alias("word"))
        .filter(~F.col("word").contains(_BPE_DELIM))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n = F.col("n")
    return (
        pw.join(bpev, "word")
        .join(npw, "word", "left")
        .groupBy("source")
        .agg(
            F.sum(n).alias("n_words"),
            F.sum(n * F.col("n_syms")).alias("_bs"),
            F.sum(n * F.coalesce("n_pieces", F.lit(1))).alias("_us"),
        )
        .select(
            "source",
            "n_words",
            F.round(F.col("_bs") / F.col("n_words"), 6).alias(
                "bpe_symbols_per_word"
            ),
            F.round(F.col("_us") / F.col("n_words"), 6).alias(
                "uni_pieces_per_word"
            ),
            F.round(F.col("_us") / F.col("_bs"), 6).alias("uni_to_bpe_ratio"),
        )
        .orderBy("source")
    )


def _fertility_compare_sql() -> str:
    rx = _BPE_REGEX.replace("'", "''")
    return (
        "WITH RECURSIVE "
        + _bpe_train_ctes()
        + ",\n"
        + ",\n".join(_uni_ctes())
        + f""",
bpev AS (
  SELECT word, len(string_split(seq, chr(31))) AS n_syms
  FROM w{_BPE_TRAIN_MERGES}
),
npw AS (
  SELECT word, COUNT(*) AS n_pieces
  FROM gf WHERE piece IS NOT NULL GROUP BY word
),
pw AS (
  SELECT source, word, COUNT(*) AS n FROM (
    SELECT source, unnest(regexp_extract_all(lower(text), '{rx}')) AS word
    FROM documents WHERE text IS NOT NULL
  ) WHERE strpos(word, chr(31)) = 0
  GROUP BY source, word
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_words,
       ROUND(SUM(n * b.n_syms) * 1.0 / SUM(n), 6) AS bpe_symbols_per_word,
       ROUND(SUM(n * COALESCE(u.n_pieces, 1)) * 1.0 / SUM(n), 6)
         AS uni_pieces_per_word,
       ROUND(SUM(n * COALESCE(u.n_pieces, 1)) * 1.0 / SUM(n * b.n_syms), 6)
         AS uni_to_bpe_ratio
FROM pw JOIN bpev b USING (word) LEFT JOIN npw u USING (word)
GROUP BY source
ORDER BY source
"""
    )


TOKENIZER_FERTILITY_SQL = _fertility_compare_sql()


_RAKE_TOPK = 20


def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (NEW round 13; Rose et al. 2010 — Rapid
    Automatic Keyword Extraction): candidate PHRASES are maximal runs of
    content words (the TextRank candidate definition: ≥3-letter
    alphabetic, non-stopword) between stopword/punctuation delimiters;
    each word scores degree/frequency (degree = Σ length of phrases it
    occurs in — co-occurrence reach; frequency = occurrence count), and
    a phrase scores the sum of its words' scores — multi-word phrases
    rank high exactly when their words travel together.  The
    co-occurrence-degree heuristic complements text_textrank_keywords'
    graph centrality (RAKE surfaces PHRASES, TextRank single words).

    Output: top {topk} phrases by ROUNDED score (phrase tie-break) with
    occurrence count and word count.

    Mechanics: one posexplode + the gaps-and-islands window (run id =
    position − candidate row_number, partitioned by doc) builds phrase
    occurrences; word stats and phrase scores are two vocab-bounded
    aggs.  Word scores divide exact integers; the per-phrase sum is ≤
    phrase-length doubles absorbed by ROUND 6 (the item_pagerank
    acceptance class).  One doc-keyed window + two bounded shuffles —
    scan-parallel at any corpus size.""".format(topk=_RAKE_TOPK)
    docs = load_spread(spark, "documents", sf_dir)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z']+"), 0)
    pos = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.posexplode(toks).alias("pos", "w")
    )
    cand = pos.withColumn(
        "is_c",
        (F.length("w") >= 3)
        & ~F.array_contains(stop_arr, F.col("w"))
        & F.col("w").rlike("^[a-z]+$"),
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        cand.filter(F.col("is_c"))
        .withColumn("grp", F.col("pos") - F.row_number().over(wd))
    )
    # r15 optimization round (guide §2.4): derive the per-word occurrence
    # rows by re-splitting the phrase string instead of joining the
    # corpus-scale ``runs`` back on the run key — words are [a-z]+ so the
    # space join/split is lossless: the identical (w, plen) multiset with
    # one SortMergeJoin and one corpus posexplode+window pass removed
    # (439 → 205 tasks, 14 → 9 jobs at sf0.1).  Deliberately NOT
    # persisted: AQE's runtime exchange reuse already shares the phrases
    # aggregation between its two consumers (a persist variant measured
    # 449 tasks — the persist-the-shingles negative-result class).
    # Oracle re-verified value-exact at all 3 SFs.
    phrases = runs.groupBy("doc_id", "grp").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "w"))),
                lambda x: x["w"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    occ = phrases.select(
        F.explode(F.split("phrase", " ")).alias("w"), "plen"
    )
    wscore = occ.groupBy("w").agg(
        (F.sum("plen") / F.count(F.lit(1))).alias("ws")
    )
    pstats = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.max("plen").alias("n_words"),
    )
    pscore = (
        pstats.select(
            "phrase",
            "n_occurrences",
            "n_words",
            F.explode(F.split("phrase", " ")).alias("w"),
        )
        .join(wscore, "w")
        .groupBy("phrase", "n_occurrences", "n_words")
        .agg(F.round(F.sum("ws"), 6).alias("score"))
    )
    # top-k via TakeOrdered (distributed), THEN rank the 20-row result —
    # a row_number window over ALL distinct phrases would sort the
    # corpus-scale phrase table in one partition (the sort_limit_topk
    # discipline; distinct phrases grow with the corpus)
    top = pscore.orderBy(F.desc("score"), F.asc("phrase")).limit(_RAKE_TOPK)
    wr = Window.orderBy(F.desc("score"), F.asc("phrase"))
    return (
        top.withColumn("rank", F.row_number().over(wr))
        .select(
            "rank",
            "phrase",
            "score",
            F.col("n_words").cast("int").alias("n_words"),
            "n_occurrences",
        )
        .orderBy("rank")
    )


TEXT_KEYPHRASE_RAKE_SQL = """
WITH pos AS (
  SELECT doc_id, i - 1 AS pos, toks[i] AS w
  FROM (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z'']+') AS toks
    FROM documents WHERE text IS NOT NULL
  ), unnest(range(1, len(toks) + 1)) AS t(i)
),
runs AS (
  SELECT doc_id, pos, w,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM pos
  WHERE len(w) >= 3 AND NOT list_contains({stopwords}, w)
    AND regexp_matches(w, '^[a-z]+$')
),
phrases AS (
  SELECT doc_id, grp,
         array_to_string(list(w ORDER BY pos), ' ') AS phrase,
         COUNT(*) AS plen
  FROM runs GROUP BY doc_id, grp
),
occ AS (
  SELECT r.w, p.plen
  FROM runs r JOIN phrases p USING (doc_id, grp)
),
wscore AS (
  SELECT w, SUM(plen) * 1.0 / COUNT(*) AS ws FROM occ GROUP BY w
),
pstats AS (
  SELECT phrase, COUNT(*) AS n_occurrences, MAX(plen) AS n_words
  FROM phrases GROUP BY phrase
),
pscore AS (
  SELECT phrase, n_occurrences, n_words,
         ROUND(SUM(ws), 6) AS score
  FROM (SELECT phrase, n_occurrences, n_words, unnest(string_split(phrase, ' ')) AS w
        FROM pstats)
  JOIN wscore USING (w)
  GROUP BY phrase, n_occurrences, n_words
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, phrase ASC) AS INT)
         AS rank,
       phrase, score,
       CAST(n_words AS INT) AS n_words,
       CAST(n_occurrences AS BIGINT) AS n_occurrences
FROM pscore
QUALIFY rank <= {topk}
ORDER BY rank
""".format(
    stopwords="[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]",
    topk=_RAKE_TOPK,
)


# TextRank knobs (interpolated into the oracle): candidate-vocabulary
# cap, damped-iteration count/damping (the item_pagerank constants), and
# the keyword output size.
_TR_VOCAB = 150
_TR_DAMPING = 0.85
_TR_ITERS = 3
_TR_TOPK = 20
_TR_WORD_RX = "[a-z]{3,}"


# (applicationId, sf_dir, documents-fingerprint) -> the capped word
# cograph, materialized + compacted.  r15 optimization round: the graph is
# vocab-capped (≤ _TR_VOCAB² weighted edges — metadata at any corpus size)
# but its BUILD is two corpus passes (vocab count + pair explode), and the
# PPMI face consumes it through several differing subtrees that AQE's
# runtime exchange reuse cannot collapse — so each call re-ran the corpus
# pipeline 2-3×.  The _taste_graph memo discipline: one build per
# (session, corpus content), compact_checkpoint so iterative consumers
# schedule single-block tasks, fingerprint key rebuilds on a same-session
# corpus rewrite.  Eviction drops the dict reference only; the popped
# frame's localCheckpoint RDD blocks are freed by GC + ContextCleaner
# rather than synchronously (r15 ADVICE, documented reliance): each entry
# is ≤ _TR_VOCAB² edge rows, so a same-session rewrite pins at most one
# superseded cograph until the next GC cycle — bounded, not a leak.
_TR_COGRAPH_CACHE: dict = {}


def clear_tr_cograph_cache() -> None:
    _TR_COGRAPH_CACHE.clear()


def _tr_word_cograph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capped word-adjacency co-occurrence graph (w1, w2, w) — THE
    word-graph edge definition, shared by TextRank (centrality) and the
    PPMI distributional-similarity face so the two cannot disagree
    about an edge: ≥3-letter non-stopword tokens, top-``_TR_VOCAB`` by
    (freq, word), adjacent in-document pairs with multiplicity."""
    from ..io import compact_checkpoint

    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        data_fingerprint(sf_dir, "documents"),
    )
    hit = _TR_COGRAPH_CACHE.get(key)
    if hit is not None:
        try:
            if hit.sparkSession.sparkContext._jsc is not None:
                return hit
        except Exception:
            pass
        _TR_COGRAPH_CACHE.pop(key, None)
    for k in list(_TR_COGRAPH_CACHE):
        try:
            stale = _TR_COGRAPH_CACHE[k].sparkSession.sparkContext._jsc is None
        except Exception:
            stale = True
        if stale or k[:2] == key[:2]:
            _TR_COGRAPH_CACHE.pop(k, None)
    co = compact_checkpoint(_tr_word_cograph_build(spark, sf_dir))
    _TR_COGRAPH_CACHE[key] = co
    return co


def _tr_word_cograph_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (uncached) cograph derivation — see :func:`_tr_word_cograph`."""
    docs = load_spread(spark, "documents", sf_dir)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    cand = F.filter(
        F.regexp_extract_all(F.lower("text"), F.lit(_TR_WORD_RX), 0),
        lambda t: ~F.array_contains(stop_arr, t),
    )
    seqs = docs.filter(F.col("text").isNotNull()).select(cand.alias("ws"))
    top = (
        seqs.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(_TR_VOCAB)
        .select("word")
    )
    ws = F.col("ws")
    pairs = seqs.select(
        F.explode(
            F.zip_with(
                F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("pr")
    ).select("pr.w1", "pr.w2").filter(F.col("w1") != F.col("w2"))
    return (
        pairs.join(F.broadcast(top.withColumnRenamed("word", "w1")), "w1")
        .join(F.broadcast(top.withColumnRenamed("word", "w2")), "w2")
        # collapse to WEIGHTED edges: the adjacency count is the edge
        # weight, and downstream frames drop from corpus-scale pair rows
        # to the ≤vocab² weighted graph
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank corpus keywords (NEW round 13; Mihalcea & Tarau 2004 —
    PageRank over the word co-occurrence graph, the classic unsupervised
    keyword extractor; complements the frequency-driven
    text_tfidf_top_terms with a centrality signal).  Candidate words are
    ≥3-letter alphabetic tokens minus stopwords, capped to the top
    ``{vocab}`` by (corpus freq, word) — the vocabulary-bounded-state
    discipline; edges are ADJACENT candidate pairs within each document
    (multi-edges kept: adjacency count is the edge weight, exactly the
    weighted-TextRank formulation), made undirected; then ``{iters}``
    damped iterations of r ← (1−d)/N + d·Σ r(u)/deg(u) — the
    item_pagerank machinery on the word graph.

    Output: top {topk} keywords by final score — rank, word, ROUND-8
    pagerank, adjacency degree.  Determinism: same acceptance as
    item_pagerank (float-sum order inside the per-destination aggregation
    absorbed by the final ROUND 8).

    Scale shape: one scan + explode builds the bounded vocabulary, one
    pair explode (filtered to the broadcast top-set BEFORE the shuffle)
    builds edges; each iteration is one src-keyed join + one dst-keyed
    sum over the capped graph — every frame after the explode is
    vocab-bounded.""".format(vocab=_TR_VOCAB, iters=_TR_ITERS, topk=_TR_TOPK)
    co = _tr_word_cograph(spark, sf_dir)
    # r15 optimization round (guide §2.2/§2.4): the graph is vocab-capped
    # (≤ 2·_TR_VOCAB² weighted edges — constant at ANY corpus size), but it
    # used to inherit the corpus groupBy's 2×32 shuffle partitions, so each
    # of the _TR_ITERS iterations ran SortMergeJoins over 64 near-empty
    # cached partitions (126 stages / 3688 tasks per run measured at
    # sf0.1).  coalesce(1) before persist + hoisting the loop-invariant
    # edges⋈deg join out of the loop + collecting the 1-row node count once
    # (constant-bounded driver state) cuts the run to 46 stages / 511 tasks
    # with bit-identical output (w·r/deg multiply order unchanged; 1/n and
    # (1−d)/n are the same IEEE doubles the column form produced).
    edges = co.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst"), "w"
    ).unionByName(
        co.select(F.col("w2").alias("src"), F.col("w1").alias("dst"), "w")
    ).coalesce(1).persist()
    deg = edges.groupBy("src").agg(F.sum("w").alias("deg")).persist()
    ed = (
        edges.join(deg, "src")
        .select("src", "dst", "w", "deg")
        .coalesce(1)
        .persist()
    )
    # max(…, 1) only guards the Python division on an EMPTY corpus (deg has
    # no rows, so the literal is never evaluated against data there)
    n = deg.count() or 1
    d = _TR_DAMPING
    ranks = deg.select(
        F.col("src").alias("word"), (F.lit(1.0) / F.lit(float(n))).alias("r")
    )
    for _ in range(_TR_ITERS):
        contrib = (
            ed.join(ranks.withColumnRenamed("word", "src"), "src")
            .select("dst", (F.col("w") * F.col("r") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = contrib.select(
            F.col("dst").alias("word"),
            (F.lit((1.0 - d) / float(n)) + d * F.col("s")).alias("r"),
        )
    # rank on the ROUNDED score (word tie-break): ordering on the raw
    # float would let last-ulp engine differences flip adjacent ranks
    scored = ranks.join(deg.withColumnRenamed("src", "word"), "word").select(
        "word", F.round("r", 8).alias("pagerank"), "deg"
    )
    wr = Window.orderBy(F.desc("pagerank"), F.asc("word"))
    result = (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _TR_TOPK)
        .select("rank", "word", "pagerank", "deg")
        .orderBy("rank")
    )
    from ..io import checkpoint_release

    return checkpoint_release(result, edges, deg, ed)


def _tr_graph_ctes() -> str:
    """seqs/top/pairs/co — the ONE word-graph CTE chain both the
    TextRank oracle and the PPMI oracle interpolate."""
    stop = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return f"""seqs AS (
  SELECT list_filter(regexp_extract_all(lower(text), '{_TR_WORD_RX}'),
                     t -> NOT list_contains({stop}, t)) AS ws
  FROM documents WHERE text IS NOT NULL
),
top AS (
  SELECT word FROM (
    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(ws) AS word FROM seqs)
    GROUP BY word
  ) ORDER BY freq DESC, word ASC LIMIT {_TR_VOCAB}
),
pairs AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM seqs)
  WHERE ws[i] != ws[i + 1]
),
co AS (
  SELECT w1, w2, COUNT(*) AS w FROM pairs
  WHERE w1 IN (SELECT word FROM top) AND w2 IN (SELECT word FROM top)
  GROUP BY w1, w2
)"""


def _textrank_sql() -> str:
    """Unrolled pinned iterations over the same capped word graph (the
    _pagerank_sql idiom)."""
    d = _TR_DAMPING
    ctes = [
        f"""{_tr_graph_ctes()},
edges AS (
  SELECT w1 AS src, w2 AS dst, w FROM co
  UNION ALL
  SELECT w2 AS src, w1 AS dst, w FROM co
),
deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (SELECT src AS word, 1.0 / n AS r FROM deg, nn)"""
    ]
    for i in range(_TR_ITERS):
        ctes.append(
            f"""s{i + 1} AS (
  SELECT e.dst AS word, SUM(e.w * r{i}.r / deg.deg) AS s
  FROM edges e JOIN deg ON deg.src = e.src JOIN r{i} ON r{i}.word = e.src
  GROUP BY e.dst
),
r{i + 1} AS (SELECT word, (1.0 - {d}) / n + {d} * s AS r FROM s{i + 1}, nn)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY ROUND(r.r, 8) DESC, r.word ASC)
         AS INT) AS rank,
       r.word, ROUND(r.r, 8) AS pagerank, deg.deg AS deg
FROM r{_TR_ITERS} r JOIN deg ON deg.src = r.word
QUALIFY rank <= {_TR_TOPK}
ORDER BY rank
"""
    )


TEXTRANK_SQL = _textrank_sql()


# PPMI similarity report size
_PPMI_TOPK = 25


def text_ppmi_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional token similarity from PPMI context vectors (NEW
    round 15; Levy & Goldberg 2014 — the count-based word-embedding
    construction): each vocabulary token's context vector is its
    positive pointwise mutual information against every co-occurring
    context token, and similarity is the COSINE between two tokens'
    PPMI vectors — "you shall know a word by the company it keeps".
    This is SECOND-ORDER similarity: two tokens that never co-occur but
    share contexts score high (the property raw co-occurrence counts,
    PMI collocations and the adjacency graph itself cannot see; the
    `adjacent` flag makes the contrast visible per pair). Built on the
    SAME capped word-adjacency graph as TextRank (one `_tr_word_cograph`
    / graph-CTE definition — centrality and semantics cannot disagree
    about an edge).

    Exactness: counts are integers; each PPMI cell is one ln of an
    integer ratio ROUND(9) (the classifier's libm acceptance class);
    cosine sums run over ≤vocab-length vectors of rounded cells with
    ROUND(6) at the report — the float-sum-order dust class. Ranking
    ties break (sim, pair).

    Scale shape: everything after the one corpus pair-explode runs on
    the ≤vocab² weighted graph — PPMI is a join against the two
    vocab-sized marginals, the cosine is one ctx-keyed self-join of
    vocab-bounded sparse vectors, and the report is a TakeOrdered
    top-{k}.""".format(k=_PPMI_TOPK)
    co = _tr_word_cograph(spark, sf_dir)
    # group after symmetrizing: (a,b) and (b,a) adjacency counts merge
    # into ONE coordinate per (tok, ctx) — ungrouped duplicates would
    # double-count coordinates inside the cosine
    ed = (
        co.select(
            F.col("w1").alias("tok"), F.col("w2").alias("ctx"), "w"
        )
        .unionByName(
            co.select(F.col("w2").alias("tok"), F.col("w1").alias("ctx"), "w")
        )
        .groupBy("tok", "ctx")
        .agg(F.sum("w").alias("w"))
    )
    tot = ed.agg(F.sum("w").alias("tw"))
    marg = ed.groupBy("tok").agg(F.sum("w").alias("m"))
    p = (
        ed.join(marg, "tok")
        .join(
            marg.select(F.col("tok").alias("ctx"), F.col("m").alias("mc")),
            "ctx",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "ctx",
            F.round(
                F.greatest(
                    F.log(
                        (F.col("w") * F.col("tw")).cast("double")
                        / (F.col("m") * F.col("mc")).cast("double")
                    ),
                    F.lit(0.0),
                ),
                9,
            ).alias("v"),
        )
        .filter(F.col("v") > 0)
    )
    a = p.select(F.col("tok").alias("ta"), "ctx", F.col("v").alias("va"))
    b = p.select(F.col("tok").alias("tb"), "ctx", F.col("v").alias("vb"))
    num = (
        a.join(b, "ctx")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(
            F.sum(F.col("va") * F.col("vb")).alias("dot"),
            F.count(F.lit(1)).alias("n_shared_ctx"),
        )
    )
    norms = p.groupBy("tok").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    adj = ed.select(F.col("tok").alias("ta"), F.col("ctx").alias("tb"))
    out = (
        num.join(norms.select(F.col("tok").alias("ta"), F.col("nrm").alias("na")), "ta")
        .join(norms.select(F.col("tok").alias("tb"), F.col("nrm").alias("nb")), "tb")
        .join(
            adj.withColumn("adjacent", F.lit(1)).distinct(),
            ["ta", "tb"],
            "left",
        )
        .select(
            F.col("ta").alias("tok_a"),
            F.col("tb").alias("tok_b"),
            "n_shared_ctx",
            F.coalesce("adjacent", F.lit(0)).alias("adjacent"),
            F.round(
                F.col("dot") / (F.col("na") * F.col("nb")), 6
            ).alias("ppmi_cosine"),
        )
        .orderBy(F.desc("ppmi_cosine"), F.asc("tok_a"), F.asc("tok_b"))
        .limit(_PPMI_TOPK)
    )
    return out


def _ppmi_similarity_sql() -> str:
    return f"""
WITH {_tr_graph_ctes()},
ed AS (
  SELECT tok, ctx, SUM(w) AS w FROM (
    SELECT w1 AS tok, w2 AS ctx, w FROM co
    UNION ALL
    SELECT w2 AS tok, w1 AS ctx, w FROM co
  ) GROUP BY 1, 2
),
tot AS (SELECT SUM(w) AS tw FROM ed),
marg AS (SELECT tok, SUM(w) AS m FROM ed GROUP BY tok),
p AS (
  SELECT e.tok, e.ctx,
         ROUND(GREATEST(LN(CAST(e.w * t.tw AS DOUBLE)
                           / CAST(ma.m * mc.m AS DOUBLE)), 0.0), 9) AS v
  FROM ed e
  JOIN marg ma ON ma.tok = e.tok
  JOIN marg mc ON mc.tok = e.ctx
  CROSS JOIN tot t
),
pp AS (SELECT * FROM p WHERE v > 0),
num AS (
  SELECT a.tok AS ta, b.tok AS tb,
         SUM(a.v * b.v) AS dot, COUNT(*) AS n_shared_ctx
  FROM pp a JOIN pp b ON b.ctx = a.ctx AND a.tok < b.tok
  GROUP BY 1, 2
),
norms AS (SELECT tok, SQRT(SUM(v * v)) AS nrm FROM pp GROUP BY tok),
adj AS (SELECT DISTINCT tok AS ta, ctx AS tb FROM ed)
SELECT n.ta AS tok_a, n.tb AS tok_b,
       CAST(n.n_shared_ctx AS BIGINT) AS n_shared_ctx,
       CASE WHEN adj.ta IS NOT NULL THEN 1 ELSE 0 END AS adjacent,
       ROUND(n.dot / (na.nrm * nb.nrm), 6) AS ppmi_cosine
FROM num n
JOIN norms na ON na.tok = n.ta
JOIN norms nb ON nb.tok = n.tb
LEFT JOIN adj ON adj.ta = n.ta AND adj.tb = n.tb
ORDER BY ppmi_cosine DESC, tok_a ASC, tok_b ASC
LIMIT {_PPMI_TOPK}
"""


PPMI_SIMILARITY_SQL = _ppmi_similarity_sql()


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filtering: length bounds, punct/digit/stopword ratios, and a
    composite keep/drop flag (the L6 boilerplate-filter shape)."""
    docs = load_spread(spark, "documents", sf_dir)
    toks = tokens("text")
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    digits = n_chars - F.length(F.regexp_replace("text", r"[0-9]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    out = docs.select(
        "doc_id",
        F.col("n_chars").alias("n_chars_meta"),
        (punct / n_chars).alias("_punct_ratio"),
        (digits / n_chars).alias("_digit_ratio"),
        (n_stop / F.size(toks)).alias("_stop_ratio"),
        F.size(toks).alias("n_tokens"),
    )
    return out.select(
        "doc_id",
        "n_chars_meta",
        F.round("_punct_ratio", 6).alias("punct_ratio"),
        F.round("_digit_ratio", 6).alias("digit_ratio"),
        F.round("_stop_ratio", 6).alias("stopword_ratio"),
        (
            (F.col("n_tokens") >= 5)
            & (F.col("_punct_ratio") < 0.2)
            & (F.col("_stop_ratio") > 0.0)
        ).alias("keep"),
    )


TEXT_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, n_chars, text,
         string_split_regex(lower(trim(text)), '\\s+') AS toks,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
             / length(text) AS punct_ratio_raw,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
             / length(text) AS digit_ratio_raw,
         CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                              x -> list_contains({stopwords}, x))) AS DOUBLE)
             / len(string_split_regex(lower(trim(text)), '\\s+')) AS stop_ratio_raw
  FROM documents
)
SELECT doc_id,
       n_chars AS n_chars_meta,
       ROUND(punct_ratio_raw, 6) AS punct_ratio,
       ROUND(digit_ratio_raw, 6) AS digit_ratio,
       ROUND(stop_ratio_raw, 6) AS stopword_ratio,
       (len(toks) >= 5 AND punct_ratio_raw < 0.2 AND stop_ratio_raw > 0.0) AS keep
FROM t
""".format(stopwords="[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]")


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-stopword votes per language, argmax with
    deterministic tie-break (score desc, language code asc), 'und' if zero."""
    docs = load_spread(spark, "documents", sf_dir)
    toks = tokens("text")
    score_cols = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        score_cols.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias(
                    "score"
                ),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax: sort (score desc, lang asc) → first; array_sort on struct sorts
    # ascending by field order, so sort (-score, lang) and take element 1
    best = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-c.getField("score")).alias("neg"), c.getField("lang").alias("lang"),
                    c.getField("score").alias("score"),
                )
                for c in score_cols
            ]
        )
    ).getItem(0)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(best.getField("score") > 0, best.getField("lang"))
        .otherwise("und")
        .alias("detected_lang"),
        best.getField("score").alias("marker_hits"),
    )


TEXT_LANG_ID_SQL = """
WITH t AS (
  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents
), scores AS (
  SELECT doc_id, lang,
         {score_exprs}
  FROM t
), ranked AS (
  SELECT doc_id, lang,
         unnest(list_sort([{structs}])) AS s
  FROM scores
), first_pick AS (
  SELECT doc_id, lang, s,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s.neg, s.lang) AS rn
  FROM ranked
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN s.score > 0 THEN s.lang ELSE 'und' END AS detected_lang,
       CAST(s.score AS INT) AS marker_hits
FROM first_pick WHERE rn = 1
""".format(
    score_exprs=",\n         ".join(
        "CAST(len(list_filter(toks, x -> list_contains({m}, x))) AS INT) AS score_{lang}".format(
            m="[" + ", ".join(f"'{w}'" for w in ws) + "]", lang=lang
        )
        for lang, ws in sorted(_LANG_MARKERS.items())
    ),
    structs=", ".join(
        f"{{'neg': -score_{lang}, 'lang': '{lang}', 'score': score_{lang}}}"
        for lang in sorted(_LANG_MARKERS)
    ),
)


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: global top-20 terms by summed tf·idf, in ONE corpus scan.

    df (document frequency) comes from ``count(*) over (partition by term)``
    on the (doc_id, term) tf rows — a join back to a separate df aggregate
    would evaluate the tokenize/explode subplan twice (two full corpus scans;
    Spark does not CSE across a self-join). The final ``groupBy(term)`` then
    reuses the window's hash-partitioning on term: explode → shuffle
    (doc_id, term) → shuffle (term) → done, no second scan."""
    docs = load(spark, "documents", sf_dir)
    n_docs = docs.count()  # scalar, computed once (count-star over metadata)
    tf = (
        load_spread(spark, "documents", sf_dir)
        .select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # one (doc_id, term) row per doc containing the term → count(*) = df
    scored = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    ).withColumn("tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
    return (
        scored.groupBy("term")
        .agg(F.round(F.sum("tfidf"), 6).alias("total_tfidf"), F.max("df").alias("df"))
        .orderBy(F.desc("total_tfidf"), F.asc("term"))
        .limit(20)
    )


TEXT_TFIDF_SQL = """
WITH tf AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
), tfc AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2
), dfc AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tfc GROUP BY 1
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT term,
       ROUND(SUM(tf * ln(CAST(n_docs AS DOUBLE) / df)), 6) AS total_tfidf,
       MAX(df) AS df
FROM tfc JOIN dfc USING (term), n
GROUP BY term
ORDER BY total_tfidf DESC, term ASC
LIMIT 20
"""


def bigram_array(toks):
    """Word-bigram array from a token array: zip_with against its own tail —
    no self-join, no posexplode. Shared by ``text_bigram_freq`` and
    ``text_pmi_collocations`` so the two ops cannot disagree about what a
    bigram is."""
    return F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda x, y: F.when(y.isNotNull(), F.concat_ws(" ", x, y)),
        ),
        lambda b: b.isNotNull(),
    )


def text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram frequency: global top-20 word bigrams (zip_with of the token
    array against its own tail — no self-join)."""
    docs = load_spread(spark, "documents", sf_dir)
    bigrams = bigram_array(tokens("text"))
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


TEXT_BIGRAM_SQL = """
WITH t AS (
  SELECT string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents
), bg AS (
  SELECT unnest(list_filter(
           list_transform(list_zip(toks, toks[2:]),
                          p -> CASE WHEN p[2] IS NOT NULL
                                    THEN p[1] || ' ' || p[2] END),
           x -> x IS NOT NULL)) AS bigram
  FROM t
)
SELECT bigram, COUNT(*) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 20
"""


def text_rollup_by_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rollup: doc counts + char stats by (lang, source). Since
    round 11 the op IS the composition ``rollup_from_cells ∘
    corpus_cells`` — the leaf-cell pass the TWELFTH incremental path
    (``streaming.ingest.start_incremental_corpus_rollup_ingest``)
    maintains, so the corpus dashboard serves from a
    |langs|×|sources|-bounded state table and batch/maintained faces
    cannot diverge."""
    return rollup_from_cells(corpus_cells(load(spark, "documents", sf_dir)))


def corpus_cells(docs: DataFrame) -> DataFrame:
    """Leaf (lang, source) cell partials — n docs, n non-null-char docs,
    char sum — the one pass over the corpus that the batch rollup and the
    incremental corpus-rollup ingest share (the hourly_counts
    discipline). All three measures are ADDITIVE integer sums, so
    per-batch partials merge by addition forever: the mergeable-sums IVM
    class, no ordering contract, late data exact."""
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("n_chars").alias("nn"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("chars"),
    )


def merge_corpus_cells(state: DataFrame) -> DataFrame:
    """Collapse appended per-batch cell partials to one row per cell —
    the serve-side merge (and the whole job of
    ``compact_corpus_cells``)."""
    return state.groupBy("lang", "source").agg(
        F.sum("n").alias("n"),
        F.sum("nn").alias("nn"),
        F.sum("chars").alias("chars"),
    )


def rollup_from_cells(state: DataFrame) -> DataFrame:
    """ROLLUP finalization over (possibly partial) leaf cells: merge, then
    re-aggregate the ≤ |langs|×|sources| metadata rows through the same
    rollup lattice the direct form uses. avg divides the merged integer
    sums once (AVG over bigint is sum/count in double on both engines),
    so the readout is bit-identical to the direct rollup."""
    cells = merge_corpus_cells(state)
    return (
        cells.rollup("lang", "source")
        .agg(
            F.sum("n").alias("n_docs"),
            F.sum("nn").alias("_nn"),
            F.sum("chars").alias("_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            F.coalesce("source", F.lit("(all)")).alias("source"),
            "n_docs",
            F.when(F.col("_nn") > 0, F.col("_chars")).alias("total_chars"),
            F.when(
                F.col("_nn") > 0,
                F.round(F.col("_chars").cast("double") / F.col("_nn"), 6),
            ).alias("avg_chars"),
        )
    )


TEXT_ROLLUP_SQL = """
SELECT COALESCE(lang, '(all)') AS lang,
       COALESCE(source, '(all)') AS source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(n_chars), 6) AS avg_chars
FROM documents
GROUP BY ROLLUP (lang, source)
"""


def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint via polynomial rolling hash over token hashes:
    h = fold(h * 31 + md5_32(tok)) mod 2^31 — one array pass per doc
    (F.aggregate), cross-engine reproducible (md5-based token hash), no
    shuffle beyond the scan."""
    from ..functions.text import md5_bucket32, tokens

    docs = load_spread(spark, "documents", sf_dir)
    rolling = F.aggregate(
        F.transform(tokens("text"), md5_bucket32),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + t) % F.lit(1 << 31).cast("long"),
    )
    return docs.select("doc_id", rolling.alias("fingerprint"))


TEXT_ROLLING_HASH_SQL = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split_regex(lower(trim(text)), '\\s+'),
                          tok -> CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT))),
         (acc, t) -> (acc * 31 + t) % 2147483648) AS fingerprint
FROM documents
"""


# Content-defined-chunking knobs: boundary window (tokens), boundary
# divisor (expected chunk length), both interpolated into the oracle.
_CDC_W = 4
_CDC_DIV = 64


def chunk_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (NEW round 13; the rsync/LBFS rolling-
    hash boundary rule — Muthitacharoen et al. 2001): a chunk boundary
    falls after token i whenever the polynomial hash of the last
    ``{w}`` token hashes is ≡ 0 mod ``{div}`` — so boundaries are a
    LOCAL function of content, and an insertion early in a document
    shifts only the chunks up to the next boundary while every later
    chunk (and its hash) is byte-identical.  That shift-resistance is
    what makes CDC the dedup-friendly chunker (fixed-stride
    ``chunk_documents`` re-frames everything after an insert); the
    stability property is test-pinned.

    Output per chunk: doc_id, chunk_ord, start_tok, n_tokens and the
    chunk content hash — the rows a chunk-level dedup (L1
    ``dedup_span_exact`` family) consumes.

    Pure per-row array math (token hash transform, an O(n·{w}) boundary
    scan, one zip into segments, posexplode): no shuffle, no UDF,
    scan-parallel at any corpus size.  The window hash reuses
    ``text_rolling_hash``'s fold (md5_bucket32 token hashes, ×31 mod
    2³¹) so the fingerprint family shares one definition.""".format(
        w=_CDC_W, div=_CDC_DIV
    )
    from ..functions.text import md5_bucket32

    docs = load_spread(spark, "documents", sf_dir)
    base = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", tokens("text").alias("toks")
    )
    base = base.select(
        "doc_id",
        "toks",
        F.transform("toks", md5_bucket32).alias("hs"),
        F.size("toks").alias("n"),
    )
    n = F.col("n")

    def win_hash(i):
        return F.aggregate(
            F.slice("hs", i - F.lit(_CDC_W - 1), F.lit(_CDC_W)),
            F.lit(0).cast("long"),
            lambda acc, t: (acc * 31 + t) % F.lit(1 << 31).cast("long"),
        )

    bpos = F.when(
        n > _CDC_W,
        F.filter(
            F.sequence(F.lit(_CDC_W), n - 1),
            lambda i: win_hash(i) % _CDC_DIV == 0,
        ),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    seg = base.select(
        "doc_id",
        "toks",
        F.concat(
            F.array(F.lit(1)), F.transform(bpos, lambda b: b + 1)
        ).alias("starts"),
        F.concat(bpos, F.array(n)).alias("ends"),
    )
    ch = seg.select(
        "doc_id",
        "toks",
        F.posexplode(
            F.zip_with(
                "starts",
                "ends",
                lambda s, e: F.struct(s.alias("s"), e.alias("e")),
            )
        ).alias("k0", "c"),
    )
    length = F.col("c.e") - F.col("c.s") + 1
    return ch.select(
        "doc_id",
        (F.col("k0") + 1).cast("int").alias("chunk_ord"),
        F.col("c.s").cast("int").alias("start_tok"),
        length.cast("int").alias("n_tokens"),
        F.md5(
            F.array_join(F.slice("toks", F.col("c.s"), length), " ")
        ).alias("chunk_hash"),
    )


CHUNK_CDC_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents WHERE text IS NOT NULL
),
h AS (
  SELECT doc_id, toks,
         list_transform(toks,
           tok -> CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)) AS hs,
         len(toks) AS n
  FROM d
),
b AS (
  SELECT doc_id, toks, n,
         CASE WHEN n > {_CDC_W} THEN
           list_filter(range({_CDC_W}, n),
             i -> list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                                 hs[i - {_CDC_W - 1}:i]),
                    (acc, t) -> (acc * 31 + t) % 2147483648)
                  % {_CDC_DIV} = 0)
         ELSE CAST([] AS BIGINT[]) END AS bpos
  FROM h
),
c AS (
  SELECT doc_id, toks,
         list_prepend(CAST(1 AS BIGINT),
                      list_transform(bpos, x -> x + 1)) AS starts,
         list_append(bpos, CAST(n AS BIGINT)) AS ends
  FROM b
)
SELECT doc_id,
       CAST(k AS INT) AS chunk_ord,
       CAST(starts[k] AS INT) AS start_tok,
       CAST(ends[k] - starts[k] + 1 AS INT) AS n_tokens,
       md5(array_to_string(toks[starts[k]:ends[k]], ' ')) AS chunk_hash
FROM c, unnest(range(1, len(starts) + 1)) AS t(k)
"""


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated CDC chunks (NEW round 13) — the reason
    content-defined chunking exists: because :func:`chunk_cdc` boundaries
    are content-local, a boilerplate block shared by many documents lands
    in byte-identical chunks regardless of where it sits in each
    document, so ONE hash groupBy finds shared spans that fixed-stride
    chunking would frame differently per document (the `dedup_span_exact`
    story at the variable-length grain).  Emits every chunk content hash
    appearing in ≥2 distinct documents: document count, occurrence
    count, chunk token length — the boilerplate-removal worklist.

    One hash shuffle over the chunk stream; output bounded by repeated
    content.  Deterministic integers + md5 — value-exact."""
    ch = chunk_cdc(spark, sf_dir)
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("n_tokens").alias("n_tokens"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("chunk_hash"))
    )


CDC_CHUNK_DEDUP_SQL = f"""
WITH chunks AS ({CHUNK_CDC_SQL})
SELECT chunk_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MAX(n_tokens) AS INT) AS n_tokens
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, chunk_hash ASC
"""


# PII patterns restricted to constructs whose semantics agree between Java
# regex (Spark) and RE2 (DuckDB): character classes, bounded repetition,
# ASCII \b — no lookaround. Counts are taken on the ORIGINAL text per
# pattern (independent), redaction is applied sequentially in a fixed order
# (email → ipv4 → phone) on both sides so overlapping matches resolve
# identically.
_PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+?\d{3}[ .-]\d{3}[ .-]\d{4}"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub for training data: count emails / IPv4 / phone-shaped spans
    per document and emit the md5 of the redacted text (the text itself can
    be arbitrarily large; the hash proves both engines redacted identically).
    Pure column expressions — one scan, no shuffle, no Python in the row
    path; at 100 TB this runs at parquet-scan speed."""
    docs = load_spread(spark, "documents", sf_dir)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_PII_IPV4), F.lit(0))).alias(
            "n_ipv4"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PHONE), F.lit(0))).alias(
            "n_phones"
        ),
        F.md5(redacted).alias("redacted_hash"),
    )


PII_REDACT_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '@EMAIL@')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '@IPV4@')) AS INT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '@PHONE@')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '@EMAIL@', '<EMAIL>', 'g'),
           '@IPV4@', '<IP>', 'g'),
           '@PHONE@', '<PHONE>', 'g')) AS redacted_hash
FROM documents
""".replace("@EMAIL@", _PII_EMAIL).replace("@IPV4@", _PII_IPV4).replace(
    "@PHONE@", _PII_PHONE
)


def _gopher_signals():
    """Shared Gopher-rule expressions (Rae et al. 2021 §A1.1 shape) over
    ``col("text")``. The rule filter (``text_gopher_quality``) and the
    classifier trainer's weak labels (``train_quality_classifier``) MUST
    derive from this one definition: a threshold tweak in one place would
    otherwise silently desync the distilled model from the filter it
    distills. Returns (n_tokens, mean_len, alpha_frac, keep)."""
    toks = tokens("text")
    n_tokens = F.size(toks)
    mean_len = (
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double"))
        / n_tokens
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n_tokens
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    has_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) > 0
    keep = (
        (n_tokens >= 5)
        & (n_tokens <= 100000)
        & (mean_len >= 2.0)
        & (mean_len <= 12.0)
        & (alpha_frac >= 0.8)
        & has_stop
    )
    return n_tokens, mean_len, alpha_frac, keep


def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1 shape):
    token-count bounds, mean-word-length band, minimum fraction of words
    containing an alphabetic character, and a stopword-presence check —
    composed into one keep flag. Complements ``text_quality_score`` (ratio
    scores) with the hard-rule variant production pipelines apply first.
    One scan, zero shuffles."""
    docs = load_spread(spark, "documents", sf_dir)
    n_tokens, mean_len, alpha_frac, keep = _gopher_signals()
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        keep.alias("keep"),
    )


TEXT_GOPHER_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents
), s AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) / len(toks) AS mean_len,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(toks) AS alpha_frac,
         len(list_filter(toks, x -> list_contains({stopwords}, x))) > 0 AS has_stop
  FROM t
)
SELECT doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       ROUND(mean_len, 6) AS mean_word_len,
       ROUND(alpha_frac, 6) AS alpha_word_frac,
       (n_tokens >= 5 AND n_tokens <= 100000 AND mean_len >= 2.0
        AND mean_len <= 12.0 AND alpha_frac >= 0.8 AND has_stop) AS keep
FROM s
""".format(stopwords="[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]")


def text_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector: word 5-grams appearing in ≥2 distinct documents,
    top-20 by document frequency. This is the analysis that FEEDS the
    stop-shingle caps in the dedup paths — at 100 TB you run it on a sample
    to learn the corpus' boilerplate before tuning df thresholds. Distinct
    5-grams per doc → one explode → one count shuffle."""
    from ..functions.text import shingles

    docs = load_spread(spark, "documents", sf_dir)
    inv = docs.select(
        F.explode(F.array_distinct(shingles(tokens("text"), 5))).alias("ngram")
    )
    return (
        inv.groupBy("ngram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
        .orderBy(F.desc("df"), "ngram")
        .limit(20)
    )


TEXT_REPEATED_NGRAMS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+4], ' ')
                        FOR i IN range(1, greatest(len(t) - 4, 1) + 1)]) AS s
  FROM toks
), inv AS (
  SELECT unnest(s) AS ngram FROM sh
)
SELECT ngram, COUNT(*) AS df
FROM inv
GROUP BY ngram
HAVING COUNT(*) >= 2
ORDER BY df DESC, ngram
LIMIT 20
"""


#: Hard ceiling on the eval-set stand-in: only doc_ids below this can be
#: "eval", so the broadcast eval n-gram set is bounded by a CONSTANT number
#: of documents (<= _EVAL_ID_CAP/10) at ANY corpus size — the same invariant
#: as similarity._Q_CAP.  A real deployment passes a fixed eval table; the
#: id-ceiling stand-in keeps the sf0.01 oracle byte-identical (ids < cap).
_EVAL_ID_CAP = 100_000


def decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check (train/eval leakage): flag every
    training document sharing ≥1 word 5-gram with the held-out eval set
    (stand-in: the doc_id % 10 == 0 decile, id-capped at ``_EVAL_ID_CAP`` so
    the eval side is a FIXED-size set, not a corpus decile). The eval side's
    distinct n-gram set is bounded by the cap so the semi-join broadcasts at
    any corpus size; the corpus side is one shingle explode — no corpus
    self-join, no all-pairs. This is the exact-substring variant of
    decontamination (Brown et al., GPT-3 appendix C shape); the near-dup
    variants live in operators/dedup.py."""
    from ..functions.text import shingles

    docs = load_spread(spark, "documents", sf_dir)
    is_eval = (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < _EVAL_ID_CAP)
    sh = docs.select(
        "doc_id",
        is_eval.alias("is_eval"),
        F.explode(F.array_distinct(shingles(tokens("text"), 5))).alias("ngram"),
    )
    eval_ngrams = sh.filter("is_eval").select("ngram").distinct()
    contaminated = (
        sh.filter(~F.col("is_eval"))
        .join(F.broadcast(eval_ngrams), "ngram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        docs.filter(~is_eval)
        .join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
        )
    )


DECONTAMINATE_SQL = """
WITH toks AS (
  SELECT doc_id, doc_id % 10 = 0 AND doc_id < 100000 AS is_eval,
         string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
), sh AS (
  SELECT doc_id, is_eval,
         unnest(list_distinct([array_to_string(t[i:i+4], ' ')
                               FOR i IN range(1, greatest(len(t) - 4, 1) + 1)])) AS ngram
  FROM toks
), eval_ngrams AS (
  SELECT DISTINCT ngram FROM sh WHERE is_eval
), contaminated AS (
  SELECT DISTINCT doc_id FROM sh
  WHERE NOT is_eval AND ngram IN (SELECT ngram FROM eval_ngrams)
)
SELECT d.doc_id, c.doc_id IS NOT NULL AS contaminated
FROM documents d LEFT JOIN contaminated c USING (doc_id)
WHERE NOT (d.doc_id % 10 = 0 AND d.doc_id < 100000)
"""


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-LM quality signal: mean per-token unigram
    log-probability of each document under the corpus' own (add-one
    smoothed) unigram distribution — unusually improbable token streams
    (garbled text, wrong-language spans) score low and get filtered.

    Two passes, both single-shuffle: (1) global unigram counts — a
    word-count; (2) re-score each document by joining its exploded tokens
    against the vocabulary table and averaging. Invariant: the tok↔vocab
    join carries NO broadcast hint — a web-corpus vocabulary (typos, URLs,
    hashes) grows unboundedly with corpus size, so a forced broadcast would
    OOM the driver at 100 TB. Both sides shuffle-partition on `tok`; AQE is
    free to downgrade to broadcast at small SF where vocab fits. `totals`
    stays broadcast — it is a single row at any scale."""
    docs = load_spread(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    totals = tok.agg(
        F.count("*").alias("n_total"), F.countDistinct("tok").alias("v")
    )
    scored = (
        tok.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.log((F.col("cnt") + 1.0) / (F.col("n_total") + F.col("v"))).alias(
                "lp"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("mean_logprob"),
    )


TEXT_UNIGRAM_LP_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
), totals AS (
  SELECT COUNT(*) AS n_total, COUNT(DISTINCT tok) AS v FROM tok
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       ROUND(AVG(ln((cnt + 1.0) / (n_total + v))), 6) AS mean_logprob
FROM tok JOIN vocab USING (tok), totals
GROUP BY doc_id
"""


# Interpolation weight for the bigram LM: λ·p_bigram + (1−λ)·p_unigram.
# Interpolated into the oracle SQL — never hardcoded twice.
_BIGRAM_LAMBDA = 0.75


def text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained interpolated bigram-LM perplexity per document — the
    sequence-model upgrade of ``text_unigram_logprob`` (CCNet-style LM
    quality filtering, Wenzek et al. 2020): p(w|v) = λ·c(v,w)/c(v) +
    (1−λ)·(c(w)+1)/(N+V), per-doc mean log-prob and perplexity. Garbled or
    wrong-language text has improbable TRANSITIONS even when its unigrams
    look fine — this is the signal the unigram scorer misses.

    Scale shape mirrors text_unigram_logprob exactly: token/bigram counts
    are word-count-shaped single shuffles; the re-scoring joins partition
    on the token keys with NO broadcast hint (a web-corpus vocabulary grows
    with the corpus — a forced broadcast would OOM at 100 TB; AQE may
    downgrade at small SF), and the (N, V) totals stay a broadcast 1-row
    aggregate. Docs with < 2 tokens have no bigrams and drop out (both
    engines, inner-join semantics). Determinism: the per-doc AVG of double
    logs rounds at 6dp (the text_unigram_logprob precedent); perplexity is
    exp(−mean) computed FROM the rounded mean, so it adds no independent
    rounding risk."""
    # r15 optimization round, tried and REVERTED (the persist-the-shingles
    # negative-result class, OPTIMIZATION_r15.md): persisting the
    # tokenized base + scoring each distinct bigram once on the
    # vocab-bounded count frame measured WORSE (338 → 562 tasks, 12 → 19
    # jobs, 2.1 → 3.0 s interleaved A/B at sf0.1) — AQE's runtime
    # exchange reuse already deduplicates the identical pairs/vocab
    # subtrees inside the single action, and the persist + eager result
    # checkpoint replaced that free reuse with real materialization jobs.
    docs = load_spread(spark, "documents", sf_dir)
    toks = tokens("text")
    base = docs.select("doc_id", toks.alias("t"))
    pairs = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.prev", "bg.cur")
    tok = docs.select(F.explode(toks).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("c1"))
    big = pairs.groupBy("prev", "cur").agg(F.count("*").alias("c2"))
    totals = tok.agg(
        F.count("*").alias("n_total"), F.countDistinct("tok").alias("v")
    )
    lam = F.lit(_BIGRAM_LAMBDA)
    scored = (
        pairs.join(big, ["prev", "cur"])
        .join(vocab.select(F.col("tok").alias("prev"), F.col("c1").alias("cprev")), "prev")
        .join(vocab.select(F.col("tok").alias("cur"), F.col("c1").alias("ccur")), "cur")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.log(
                lam * F.col("c2") / F.col("cprev")
                + (F.lit(1.0) - lam)
                * (F.col("ccur") + 1.0)
                / (F.col("n_total") + F.col("v"))
            ).alias("lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("mean_logprob"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        "mean_logprob",
        F.round(F.exp(-F.col("mean_logprob")), 4).alias("perplexity"),
    )


TEXT_PERPLEXITY_BIGRAM_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
),
pairs AS (
  SELECT doc_id, t[i + 1] AS prev, t[i + 2] AS cur
  FROM d, unnest(range(len(t) - 1)) AS r(i)
),
tok AS (SELECT unnest(t) AS tok FROM d),
vocab AS (SELECT tok, COUNT(*) AS c1 FROM tok GROUP BY tok),
big AS (SELECT prev, cur, COUNT(*) AS c2 FROM pairs GROUP BY prev, cur),
totals AS (SELECT COUNT(*) AS n_total, COUNT(DISTINCT tok) AS v FROM tok),
scored AS (
  SELECT doc_id,
         ln({_BIGRAM_LAMBDA} * c2 / cprev.c1
            + (1.0 - {_BIGRAM_LAMBDA}) * (ccur.c1 + 1.0) / (n_total + v)) AS lp
  FROM pairs
  JOIN big USING (prev, cur)
  JOIN vocab cprev ON cprev.tok = pairs.prev
  JOIN vocab ccur ON ccur.tok = pairs.cur, totals
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(lp), 6) AS mean_logprob
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams, mean_logprob,
       ROUND(EXP(-mean_logprob), 4) AS perplexity
FROM agg
"""


# Chunking knobs (tokens per chunk / stride): interpolated into the oracle.
_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/pretraining chunker: split each document into overlapping
    token-window chunks (size {size}, stride {stride}) with stable ids —
    the projection between raw documents and embedding/packing stages
    (``pack_chunks_next_fit`` packs whole-chunk budgets; this preserves overlap
    context for retrieval).

    Pure per-row column math (sequence → posexplode → slice → join): no
    shuffle, no UDF, trivially scan-parallel at any corpus size; chunk
    count per doc is ⌈n_tokens/stride⌉ so output size is linear in corpus
    tokens. Deterministic strings/ints only — value-exact oracle.""".format(
        size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    )
    return chunk_rows(load_spread(spark, "documents", sf_dir))


def chunk_rows(docs: DataFrame) -> DataFrame:
    """THE chunk definition over a documents frame (identical to
    ``chunk_documents``, which is this applied to the corpus scan) —
    shared with the training-mix assembly capstone so selection-then-
    chunk and chunk-the-corpus cannot disagree about a chunk."""
    base = docs.select("doc_id", tokens("text").alias("t"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("t") - 1, F.lit(0)), F.lit(_CHUNK_STRIDE)
    )
    chunked = base.filter(F.size("t") > 0).select(
        "doc_id", F.posexplode(starts).alias("chunk_idx", "start"), "t"
    )
    chunk = F.slice(F.col("t"), F.col("start") + 1, F.lit(_CHUNK_SIZE))
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("chunk_tokens"),
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
)
SELECT doc_id,
       CAST(s / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
       array_to_string(t[s + 1 : s + {_CHUNK_SIZE}], ' ') AS chunk_text,
       CAST(len(t[s + 1 : s + {_CHUNK_SIZE}]) AS INT) AS chunk_tokens
FROM d, unnest(range(0, len(t), {_CHUNK_STRIDE})) AS r(s)
WHERE len(t) > 0
"""


# Sequence-packing knobs: token budget per training row and the target
# chunk rows per packing bucket (both interpolated into the oracle). The
# bucket count scales as ceil(n_chunks / _PACK_BUCKET_ROWS), so per-bucket
# state stays ~_PACK_BUCKET_ROWS rows at ANY corpus size — the packing
# fold's cost class is flat per bucket while buckets scale out.
_PACK_BUDGET = 128
_PACK_BUCKET_ROWS = 512


def pack_chunks_next_fit(
    chunks: DataFrame,
    n_buckets: int,
    budget: int = _PACK_BUDGET,
) -> DataFrame:
    """Greedy next-fit packing of atomic chunks into fixed-token-budget
    training sequences — the reusable operator (the last step of the
    chunk → decontaminate → PACK assembly chain; GPT-style pretraining
    consumes fixed-length rows, and packing decides how much of the token
    budget is padding).

    Determinism + distribution: every chunk hashes to a bucket by
    ``md5(doc_id:chunk_idx) % n_buckets`` and buckets pack INDEPENDENTLY
    in (md5, doc_id, chunk_idx) order — so the assignment is a pure
    function of the data (partition-layout invariant, test-pinned), and
    the packing state never crosses bucket boundaries.  Within a bucket
    the next-fit rule (chunk overflows the open sequence → close it, open
    a new one) runs as ONE JVM sequential fold (``F.aggregate``) over the
    bucket's sorted chunk array — no Python in the loop, no iteration
    joins.  The trade: each bucket's last sequence may run underfull
    (bounded by n_buckets·budget wasted tokens corpus-wide, negligible at
    _PACK_BUCKET_ROWS rows per bucket).

    Scale shape: one hash shuffle on the bucket key (n/_PACK_BUCKET_ROWS
    groups), a linear fold per bucket, then an explode back to per-chunk
    rows — cost is one pass regardless of corpus size, and per-executor
    memory is bounded by the ~_PACK_BUCKET_ROWS-row bucket arrays.

    Returns the per-chunk assignment: (bucket, seq, doc_id, chunk_idx,
    chunk_tokens); ``seq`` is 0-based within its bucket."""
    ord_col = F.md5(
        F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx")).cast("binary")
    )
    keyed = chunks.select(
        (F.conv(F.substring(ord_col, 1, 4), 16, 10).cast("int") % n_buckets)
        .alias("bucket"),
        ord_col.alias("o"),
        F.col("doc_id").alias("d"),
        F.col("chunk_idx").alias("i"),
        F.col("chunk_tokens").cast("long").alias("n"),
    )
    # sort_array over (o, d, i, n) structs = ORDER BY md5, doc_id, chunk_idx
    packed = keyed.groupBy("bucket").agg(
        F.sort_array(F.collect_list(F.struct("o", "d", "i", "n"))).alias("xs")
    )
    out_t = "array<struct<d:bigint,i:int,n:bigint,seq:bigint>>"
    zero = F.struct(
        F.lit(0).cast("long").alias("fill"),
        F.lit(-1).cast("long").alias("seq"),
        F.expr(f"CAST(array() AS {out_t})").alias("out"),
    )

    def step(acc, x):
        start = (acc["seq"] < 0) | ((acc["fill"] + x["n"]) > budget)
        newseq = F.when(start, acc["seq"] + 1).otherwise(acc["seq"])
        newfill = F.when(start, x["n"]).otherwise(acc["fill"] + x["n"])
        entry = F.struct(
            x["d"].alias("d"),
            x["i"].alias("i"),
            x["n"].alias("n"),
            newseq.alias("seq"),
        )
        return F.struct(
            newfill.alias("fill"),
            newseq.alias("seq"),
            F.concat(acc["out"], F.array(entry)).alias("out"),
        )

    folded = packed.select(
        "bucket",
        F.aggregate("xs", zero, step, lambda acc: acc["out"]).alias("out"),
    )
    a = F.explode("out")
    return folded.select("bucket", a.alias("a")).select(
        "bucket",
        F.col("a.seq").alias("seq"),
        F.col("a.d").alias("doc_id"),
        F.col("a.i").alias("chunk_idx"),
        F.col("a.n").alias("chunk_tokens"),
    )


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L23 dataset assembly, final step (NEW round 13): place every
    chunk_documents chunk into fixed-{budget}-token training sequences by
    the concat-and-chop rule — chunks concatenate in deterministic
    (md5, doc_id, chunk_idx) order within their bucket and SPLIT at
    budget boundaries, so every sequence except each bucket's last holds
    exactly {budget} tokens (the standard GPT-style pretraining packer:
    zero padding waste, document boundaries carried as metadata).  Output
    is the per-chunk placement manifest: (bucket, doc_id, chunk_idx,
    chunk_tokens, start_seq, start_off, end_seq) — a chunk whose span
    crosses a boundary reports start_seq < end_seq (the trainer chops it
    there).  Σ chunk_tokens is trivially conserved (placement never drops
    tokens); the exactly-{budget}-per-closed-sequence identity is
    test-pinned.

    Why chop and not atomic next-fit for the REGISTRY face: the
    boundary-split placement is a closed-form window prefix sum —
    value-exact in plain ANSI SQL at any scale — while the atomic
    variant (:func:`pack_chunks_next_fit`, kept for retrieval-style training
    where chunks must stay whole) is an inherently sequential per-bucket
    fold whose SQL replay costs iterations × corpus and has no bounded
    unroll; it is verified by hand-case/property/parity tests instead.

    Scale shape: one count action for the scale-adaptive bucket count
    (ceil(n/{rows}) — window partitions stay ~{rows} rows at any corpus
    size), then ONE hash shuffle on the bucket key and one window prefix
    sum; everything else is per-row arithmetic.""".format(
        budget=_PACK_BUDGET, rows=_PACK_BUCKET_ROWS
    )
    chunks = chunk_documents(spark, sf_dir).select(
        "doc_id", "chunk_idx", "chunk_tokens"
    )
    # scale-adaptive bucket count (the adaptive-NTILE discipline): one
    # cheap count action; the oracle computes the identical expression
    n_chunks = chunks.count()
    nb = max(1, -(-n_chunks // _PACK_BUCKET_ROWS))
    return place_chunks(chunks, nb).drop("o")


def place_chunks(chunks: DataFrame, nb: int) -> DataFrame:
    """THE boundary-split placement over a (doc_id, chunk_idx,
    chunk_tokens) frame (identical to ``pack_training_sequences``, which
    is this applied to the corpus chunk stream) — shared with the
    training-mix assembly capstone.  Returns the placement plus the
    md5 order key ``o`` (callers that persist a manifest hash the rows
    in (o, doc_id, chunk_idx) order)."""
    ord_col = F.md5(
        F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx")).cast("binary")
    )
    keyed = chunks.select(
        (F.conv(F.substring(ord_col, 1, 4), 16, 10).cast("int") % nb).alias(
            "bucket"
        ),
        ord_col.alias("o"),
        "doc_id",
        "chunk_idx",
        F.col("chunk_tokens").cast("long").alias("chunk_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("o", "doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("chunk_tokens").over(w), F.lit(0).cast("long"))
    b = F.lit(_PACK_BUDGET).cast("long")
    return keyed.select(
        "bucket",
        "o",
        "doc_id",
        "chunk_idx",
        "chunk_tokens",
        F.floor(cum / b).alias("start_seq"),
        (cum % b).alias("start_off"),
        F.floor((cum + F.col("chunk_tokens") - 1) / b).alias("end_seq"),
    )


PACK_TRAINING_SEQUENCES_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
),
ch AS (
  SELECT doc_id,
         CAST(s / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
         CAST(len(t[s + 1 : s + {_CHUNK_SIZE}]) AS BIGINT) AS chunk_tokens
  FROM d, unnest(range(0, len(t), {_CHUNK_STRIDE})) AS r(s)
  WHERE len(t) > 0
),
nbc AS (
  SELECT GREATEST(1, CAST(CEIL(COUNT(*) / {_PACK_BUCKET_ROWS}.0) AS INT))
         AS nb
  FROM ch
),
keyed AS (
  SELECT CAST(('0x' || substr(
           md5(doc_id::VARCHAR || ':' || chunk_idx::VARCHAR), 1, 4))
           AS INT) % (SELECT nb FROM nbc) AS bucket,
         md5(doc_id::VARCHAR || ':' || chunk_idx::VARCHAR) AS o,
         doc_id, chunk_idx, chunk_tokens
  FROM ch
),
placed AS (
  SELECT bucket, doc_id, chunk_idx, chunk_tokens,
         COALESCE(SUM(chunk_tokens) OVER (
           PARTITION BY bucket ORDER BY o, doc_id, chunk_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM keyed
)
SELECT bucket, doc_id, chunk_idx, chunk_tokens,
       CAST(FLOOR(cum / {_PACK_BUDGET}) AS BIGINT) AS start_seq,
       CAST(cum % {_PACK_BUDGET} AS BIGINT) AS start_off,
       CAST(FLOOR((cum + chunk_tokens - 1) / {_PACK_BUDGET}) AS BIGINT)
         AS end_seq
FROM placed
"""


def text_within_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style WITHIN-document repetition rules (Rae et al. 2021
    §A1.1): the fraction of duplicate word 2-grams and the share of
    occurrences claimed by the single most frequent 2-gram, composed into a
    keep flag — the loop/babble detector. Complements
    ``text_repeated_ngrams``, which finds ACROSS-document boilerplate.

    The gram array is materialized once per row in a prior projection (a
    lambda re-binding would re-run the tokenizer per distinct gram); the
    mode count is quadratic in per-doc distinct grams but embarrassingly
    parallel and bounded by document length — zero shuffles at any corpus
    scale."""
    from ..functions.text import shingles

    docs = load_spread(spark, "documents", sf_dir)
    g = docs.select(
        "doc_id", shingles(tokens("text"), 2).alias("grams")
    )
    grams = F.col("grams")
    n = F.size(grams)
    d = F.size(F.array_distinct(grams))
    top = F.array_max(
        F.transform(
            F.array_distinct(grams),
            lambda u: F.size(F.filter(grams, lambda x: x == u)),
        )
    )
    dup_frac = (n - d) / n
    top_share = top / n
    return g.select(
        "doc_id",
        n.alias("n_grams"),
        F.round(dup_frac, 6).alias("dup_2gram_frac"),
        F.round(top_share, 6).alias("top_2gram_share"),
        ((dup_frac <= 0.6) & (top_share <= 0.1)).alias("keep"),
    )


TEXT_WITHIN_DOC_REP_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents
), g AS (
  SELECT doc_id,
         [array_to_string(toks[i:i+1], ' ')
          FOR i IN range(1, greatest(len(toks) - 1, 1) + 1)] AS grams
  FROM t
), s AS (
  SELECT doc_id,
         len(grams) AS n,
         len(list_distinct(grams)) AS d,
         list_max(list_transform(list_distinct(grams),
                                 u -> len(list_filter(grams, x -> x = u)))) AS topc
  FROM g
)
SELECT doc_id,
       CAST(n AS INT) AS n_grams,
       ROUND((n - d) / CAST(n AS DOUBLE), 6) AS dup_2gram_frac,
       ROUND(topc / CAST(n AS DOUBLE), 6) AS top_2gram_share,
       ((n - d) / CAST(n AS DOUBLE) <= 0.6
        AND topc / CAST(n AS DOUBLE) <= 0.1) AS keep
FROM s
"""


#: heavy-hitters: Misra-Gries capacity per partition (constant memory) and
#: candidates emitted per partition (bounds the phase-2 broadcast at
#: _HH_CAND × num_partitions rows — constants, independent of corpus size)
_HH_CAP = 4000
_HH_CAND = 200


def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by exact count via two-phase heavy hitters — the
    bounded-shuffle alternative to a full-vocabulary word count.

    Phase 1 (candidate generation, mapInPandas): each partition streams its
    documents once keeping a Misra-Gries-style summary — exact batch counts
    merged into at most ``_HH_CAP`` counters; on overflow every counter is
    decremented by the (CAP+1)-th largest (the batched decrement step), so
    partition memory is CONSTANT and any token with local share > 1/CAP
    survives. Each partition emits only its top ``_HH_CAND`` candidates:
    ≤ CAND·P tiny rows cross the wire instead of the whole vocabulary (at
    100 TB a web-corpus vocab is billions of distinct tokens; the candidate
    set is a few thousand rows).

    Phase 2 (exact verification): one more scan counts ONLY the broadcast
    candidate union, so the output is exact, not an estimate — which is
    what makes this entry oracle-checkable against a plain SQL word count.
    A true global top-20 token is Zipf-heavy in essentially every
    partition, far above the 1/CAP survival bar.

    cite: Misra & Gries 1982; SpaceSaving (Metwally et al. 2005) — public
    literature; candidate+verify composition per common MapReduce practice.
    """
    import pandas as pd

    docs = load_spread(spark, "documents", sf_dir)

    def part_candidates(batches):
        cnt = pd.Series(dtype="int64")
        for pdf in batches:
            toks = pdf["text"].str.lower().str.strip().str.split().explode()
            cnt = mg_fold(cnt, toks.value_counts(), _HH_CAP)
        top = cnt.nlargest(_HH_CAND)
        yield pd.DataFrame({"token": top.index.astype(str)})

    cands = (
        docs.select("text")
        .mapInPandas(part_candidates, "token string")
        .distinct()
    )
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


TEXT_HEAVY_HITTERS_SQL = """
WITH t AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents
)
SELECT token, COUNT(*) AS n
FROM t GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
"""


#: Fixed hashed-feature weights for the linear quality classifier — the
#: engine-side analogue of shipping a trained fastText/DCLM quality model:
#: 16 hashing-trick buckets + bias, values arbitrary but pinned so both
#: engines score identically. In production these come from training; the
#: SCORING path below is exactly what a real deployment runs per document.
_LQC_W = [
    -0.31, 0.12, 0.27, -0.08, 0.19, -0.22, 0.05, 0.33,
    -0.14, 0.21, -0.27, 0.09, 0.17, -0.05, 0.24, -0.11,
]
_LQC_BIAS = 0.20


def train_quality_model(spark: SparkSession, sf_dir: str):
    """The programmatic train-then-deploy entry point: returns
    ``(metrics DataFrame, weights, bias)`` explicitly — feed the weights
    to :func:`score_with_linear_model`. (The registry query
    ``train_quality_classifier`` returns only the metrics frame, per the
    driver contract.)"""
    # r16: tokenization/hashing materializes WIDE (per-row md5 CPU), then
    # the epoch loop reads a row-count-compacted checkpoint — 8 sequential
    # epochs each dispatch ONE Arrow task per ~500k cached rows instead of
    # re-reading the single-split file in one serialized task (guide §2.2)
    docs = load_spread(spark, "documents", sf_dir).filter(F.col("text").isNotNull())
    toks = tokens("text")
    n_tokens = F.size(toks)
    # r15 ADVICE guard: the sentinel-key epoch metrics divide by n_docs
    # assuming every margin (and so every per-row metric term) is
    # non-NULL, which holds only while n ≥ 1 for every kept doc — true
    # for the whitespace tokens() (≥1 element on non-null text) but an
    # implementation detail a regex tokenizer would silently break,
    # deflating epoch metrics. Enforce it loudly instead of by comment.
    n_guarded = F.when(n_tokens >= 1, n_tokens.cast("double")).otherwise(
        F.raise_error(
            F.lit(
                "train_quality_model: tokenizer yielded an empty token "
                "list — the one-job-per-epoch metric rewrite requires "
                "n >= 1 for every non-null-text document"
            )
        )
    )
    _, _, _, keep = _gopher_signals()
    base = compact_checkpoint(
        docs.select(
            keep.cast("double").alias("y"),
            n_guarded.alias("n"),
            F.transform(toks, lambda t: F.pmod(md5_bucket16(t), F.lit(_TQC_DIM))).alias(
                "bks"
            ),
        )
    )
    return _tqc_fit(spark, base)


def _linear_score_expr(weights, bias: float):
    """THE linear-scorer expression over ``col("text")``, rounded to 6
    decimals (the rounding is part of the contract: the keep threshold
    compares the ROUNDED score, and the DuckDB oracle does the same).
    Single source of truth for the shipped pinned model, the deploy
    helper, and anything scoring with learned weights — a drift between
    copies would silently desync the train/deploy loop."""
    if len(weights) != _TQC_DIM:
        raise ValueError(f"expected {_TQC_DIM} weights, got {len(weights)}")
    warr = F.array(*[F.lit(float(x)) for x in weights])
    toks = tokens("text")
    wsum = F.aggregate(
        F.transform(
            toks,
            lambda t: F.element_at(
                warr, F.pmod(md5_bucket16(t), F.lit(_TQC_DIM)) + 1
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(
        1.0 / (1.0 + F.exp(-(F.lit(float(bias)) + wsum / F.size(toks)))), 6
    )


def text_linear_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filtering (the fastText/DCLM model shape):
    score = sigmoid(bias + mean of hashed-token weights) with a fixed
    16-bucket hashing trick. The entire scorer is a per-row column
    expression — tokens hash and look up weights inside ONE higher-order
    `aggregate`, no explode, no shuffle, no UDF — so at 100 TB the filter
    is a scan-level projection like any other quality gate. Cross-engine
    reproducible (md5-bucket hashing), so the score itself is
    value-checked against DuckDB.

    NULL-text docs are excluded on BOTH sides (Spark would emit a
    NULL-score row while the oracle's unnest+join drops the doc — the one
    place the engines' NULL semantics diverge)."""
    docs = load(spark, "documents", sf_dir).filter(F.col("text").isNotNull())
    score = _linear_score_expr(_LQC_W, _LQC_BIAS)
    return docs.select(
        "doc_id",
        F.size(tokens("text")).alias("n_tokens"),
        score.alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


# -- distributed classifier TRAINING (the other half of the fastText/DCLM
# quality-filter loop: text_linear_quality_classifier is inference with
# fixed weights; this learns the weights in-engine) ----------------------
# Same bucket count as the shipped scorer's _LQC_W, so the learned weight
# vector is a DROP-IN replacement for it (hash expr identical: pmod of
# md5_bucket16). Driver state: _TQC_DIM+1 doubles.
_TQC_DIM = 16
_TQC_ITERS = 8
_TQC_LR = 2.0


def train_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distill the Gopher hard rules into a hashed-feature linear model by
    distributed full-batch logistic regression (the fastText/DCLM loop:
    heuristic labels → linear scorer → cheap scan-level filter). Weak label
    y = the rule-based keep flag; features x = mean one-hot of md5-hashed
    token buckets (so the learned model scores with EXACTLY the expression
    shape ``text_linear_quality_classifier`` ships).

    Scale design: each epoch is (1) a per-row margin/residual projection
    with the current weights inlined as a literal array — no join, no UDF —
    and (2) ONE wordcount-shaped shuffle (explode token buckets, weighted
    by residual/n, groupBy bucket) yielding the exact full-batch gradient;
    plus two 1-row aggregates (log-loss, accuracy). Driver state is the
    (dim+1)-double weight vector — constant at any corpus size. The
    tokenized/bucketed corpus is persisted once and re-scanned per epoch,
    the standard Spark batch-GD shape.

    Oracle-GREEN since round 9 (was rows-only): gradient sums are float
    reductions whose accumulation order Spark does not fix — but ROUNDING
    the updated parameters at 9 decimals every epoch (far above the
    ~1e-13 order drift) pins the whole trajectory, the same recipe that
    made the kmeans Lloyd loop SQL-expressible. TRAIN_QUALITY_SQL unrolls
    all ``_TQC_ITERS`` epochs (gopher labels → margins from the w CTE →
    sigmoid → metrics → full-batch gradient → ROUND(…, 9) update), with
    MATERIALIZED CTE hints so DuckDB evaluates each epoch once instead of
    inlining the chain exponentially. Accuracy compares ROUND(p, 9) ≥ 0.5
    (an unrounded compare would flip on last-ulp exp() differences); the
    metric rounds at 6. Invariants additionally tested
    (tests/test_extensions.py): log-loss strictly decreases from ln 2,
    final accuracy beats the majority class, and the learned weights
    deploy through the shipped scorer expression."""
    return train_quality_model(spark, sf_dir)[0]


def _tqc_fit(spark: SparkSession, base: DataFrame):
    """Returns (metrics DataFrame, weights, bias). An empty corpus yields
    the zero model — a defined, deployable (if useless) state, never a
    stale or missing one."""
    import math

    n_docs = base.count()
    if n_docs == 0:
        return (
            spark.createDataFrame([], "iter int, logloss double, accuracy double"),
            [0.0] * _TQC_DIM,
            0.0,
        )

    w = [0.0] * _TQC_DIM
    bias = 0.0
    metrics = []
    # r16 optimization round (guide §4.2): each epoch is now ONE vectorized
    # Arrow pass over the cached (y, n, bks) frame.  The replaced JVM form
    # re-embedded the updated weights as a literal array every epoch, so
    # whole-stage codegen RECOMPILED per epoch (~0.3 s × 8 — the r15
    # sentinel-key rewrite had already merged the epoch's three actions
    # into one job, and a broadcast-weights variant measured 2× slower:
    # per-epoch broadcast build + BNLJ cost more than the replans saved).
    # The kernel keeps the epoch's weights in its closure (nothing
    # recompiles), reproduces the margin fold EXACTLY — one vectorized add
    # per token POSITION over 0.0-padded per-position weight columns, the
    # same IEEE accumulation order as the sequential HOF fold (x + 0.0 is
    # exact for every finite x, and a -0.0 sum flipped to +0.0 by padding
    # cannot change any emitted value: margins only feed exp/division,
    # never a sign-of-zero-visible output) — and emits per-batch PARTIAL
    # sums on the same sentinel keys (-1 logloss, -2 accuracy, -3 bias
    # gradient) plus per-bucket gradient partials, ≤ _TQC_DIM + 3 rows per
    # batch.  The accuracy term replicates F.round's HALF_UP-on-shortest-
    # decimal exactly via Decimal(repr(p)) per row.  p itself crosses
    # exp/log implementations (numpy vs JVM vs DuckDB) that may differ in
    # the last ulp — the SAME cross-engine dust the round-9 parameter pin
    # and round-6 metric report were built to absorb (re-verified
    # value-exact at all three SFs).  Regrouped partial-sum order is the
    # dust class the r15 rewrite already established.
    import numpy as np

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [T.StructField("b", T.IntegerType()), T.StructField("v", T.DoubleType())]
    )

    def _epoch_fn(w_now: list, bias_now: float, final: bool):
        W = np.array(w_now, dtype=np.float64)
        eps = 1e-12

        def fn(batches):
            import pyarrow as pa
            import pyarrow.compute as pc
            from decimal import ROUND_HALF_UP, Decimal

            q9 = Decimal("1e-9")
            for bt in batches:
                nr = bt.num_rows
                if nr == 0:
                    continue
                cols = {bt.schema.names[i]: bt.column(i) for i in range(bt.num_columns)}
                y = np.asarray(cols["y"].to_numpy(zero_copy_only=False), dtype=np.float64)
                nn = np.asarray(cols["n"].to_numpy(zero_copy_only=False), dtype=np.float64)
                bks = cols["bks"]
                lens = np.asarray(
                    pc.list_value_length(bks).to_numpy(zero_copy_only=False),
                    dtype=np.int64,
                )
                flat = np.asarray(
                    bks.values.to_numpy(zero_copy_only=False), dtype=np.int64
                )
                wv = W[flat]
                maxlen = int(lens.max()) if nr else 0
                pad = np.zeros((nr, maxlen), dtype=np.float64)
                starts = np.concatenate(([0], np.cumsum(lens)))
                idx = np.arange(maxlen)
                mask = idx[None, :] < lens[:, None]
                pad[mask] = wv
                acc = np.zeros(nr, dtype=np.float64)
                for ppos in range(maxlen):
                    acc = acc + pad[:, ppos]
                margin = bias_now + acc / nn
                p = 1.0 / (1.0 + np.exp(-margin))
                ll = -(y * np.log(p + eps) + (1.0 - y) * np.log(1.0 - p + eps))
                accf = np.array(
                    [
                        float(
                            (
                                float(
                                    Decimal(repr(float(pi))).quantize(
                                        q9, rounding=ROUND_HALF_UP
                                    )
                                )
                                >= 0.5
                            )
                            == bool(yi)
                        )
                        for pi, yi in zip(p, y)
                    ],
                    dtype=np.float64,
                )
                out_b = [-1, -2]
                out_v = [float(ll.sum()), float(accf.sum())]
                if not final:
                    r = p - y
                    g = np.zeros(_TQC_DIM, dtype=np.float64)
                    np.add.at(g, flat, np.repeat(r / nn, lens))
                    out_b = list(range(_TQC_DIM)) + [-1, -2, -3]
                    out_v = [float(x) for x in g] + out_v[:2] + [float(r.sum())]
                yield pa.record_batch(
                    [
                        pa.array(out_b, type=pa.int32()),
                        pa.array(out_v, type=pa.float64()),
                    ],
                    names=["b", "v"],
                )

        return fn

    for it in range(_TQC_ITERS):
        final = it == _TQC_ITERS - 1
        grad_rows = (
            base.mapInArrow(_epoch_fn(w, bias, final), out_schema)
            .groupBy("b")
            .agg(F.sum("v").alias("g"))
            .collect()  # ≤ _TQC_DIM + 3 rows — constant-bounded by construction
        )
        g = {int(r["b"]): float(r["g"]) for r in grad_rows}
        metrics.append((it, g.get(-1, 0.0) / n_docs, g.get(-2, 0.0) / n_docs))
        if final:
            break
        agg = {"gb": g.get(-3, 0.0)}
        # ROUND the updated parameters (9 decimals) on every epoch: the
        # gradient is a float reduction whose accumulation order differs
        # between engines (and between runs); rounding far above the
        # ~1e-13 drift makes the trajectory — and therefore the whole
        # training run — value-reproducible in ANSI SQL (the pinned-
        # Lloyd-means recipe from kmeans_cluster_profile, round 9)
        w = [
            round(w[b] - _TQC_LR * g.get(b, 0.0) / n_docs, 9)
            for b in range(_TQC_DIM)
        ]
        bias = round(bias - _TQC_LR * float(agg["gb"]) / n_docs, 9)
        if not all(math.isfinite(x) for x in w + [bias]):
            raise RuntimeError("quality-classifier training diverged")
    return (
        small_df(
            spark,
            [(i, round(l, 6), round(a, 6)) for i, l, a in metrics],
            "iter int, logloss double, accuracy double",
        ),
        list(w),
        bias,
    )


def _train_quality_sql() -> str:
    """SQL twin of the FULL distributed logistic-regression training run
    (round 9 — was rows-only): gopher labels, md5-bucket features, then
    ``_TQC_ITERS`` unrolled epochs of margin → sigmoid → metrics →
    full-batch gradient → ROUND(…, 9) weight/bias update. The per-epoch
    parameter rounding (far above the ~1e-13 gradient-sum order drift) is
    what pins the trajectory across engines — the kmeans pinned-Lloyd
    recipe applied to gradient descent."""
    lr = repr(float(_TQC_LR))
    zeros = ", ".join(f"({b}, 0.0)" for b in range(_TQC_DIM))
    parts = [
        f"""WITH gopher AS ({TEXT_GOPHER_SQL}),
tok AS MATERIALIZED (
  SELECT doc_id,
         (CAST(('0x' || substr(md5(tok), 1, 4)) AS INT) % {_TQC_DIM}) AS b
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
    FROM documents WHERE text IS NOT NULL
  )
),
docn AS MATERIALIZED (SELECT doc_id, COUNT(*) * 1.0 AS n FROM tok GROUP BY 1),
lbl AS MATERIALIZED (
  SELECT d.doc_id, d.n, CASE WHEN g.keep THEN 1.0 ELSE 0.0 END AS y
  FROM docn d JOIN gopher g USING (doc_id)
),
nd AS MATERIALIZED (SELECT COUNT(*) * 1.0 AS nd FROM lbl),
w0(b, wt) AS (VALUES {zeros}),
b0(bias) AS (VALUES (0.0))"""
    ]
    for i in range(_TQC_ITERS):
        parts.append(
            f""",
m{i} AS MATERIALIZED (
  SELECT t.doc_id, ANY_VALUE(l.n) AS n, ANY_VALUE(l.y) AS y,
         (SELECT bias FROM b{i}) + SUM(w.wt) / ANY_VALUE(l.n) AS margin
  FROM tok t JOIN w{i} w ON w.b = t.b JOIN lbl l ON l.doc_id = t.doc_id
  GROUP BY t.doc_id
),
p{i} AS MATERIALIZED (SELECT doc_id, n, y, 1.0 / (1.0 + EXP(-margin)) AS p FROM m{i}),
met{i} AS (
  SELECT {i} AS iter,
         ROUND(AVG(-(y * ln(p + 1e-12)
                     + (1.0 - y) * ln(1.0 - p + 1e-12))), 6) AS logloss,
         ROUND(AVG(CASE WHEN (ROUND(p, 9) >= 0.5) = (y = 1.0)
                        THEN 1.0 ELSE 0.0 END), 6) AS accuracy
  FROM p{i} HAVING COUNT(*) > 0
)"""
        )
        if i < _TQC_ITERS - 1:
            parts.append(
                f""",
g{i} AS MATERIALIZED (
  SELECT t.b, SUM((p.p - p.y) / p.n) AS g
  FROM tok t JOIN p{i} p USING (doc_id)
  GROUP BY t.b
),
w{i + 1}(b, wt) AS MATERIALIZED (
  SELECT w.b,
         ROUND(w.wt - {lr} * COALESCE(g.g, 0.0) / (SELECT nd FROM nd), 9)
  FROM w{i} w LEFT JOIN g{i} g USING (b)
),
b{i + 1}(bias) AS MATERIALIZED (
  SELECT ROUND((SELECT bias FROM b{i})
               - {lr} * (SELECT SUM(p - y) FROM p{i})
                 / (SELECT nd FROM nd), 9)
)"""
            )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM met{i}" for i in range(_TQC_ITERS)
    )
    parts.append(f"\n{union}\nORDER BY iter")
    return "".join(parts)


TRAIN_QUALITY_SQL = _train_quality_sql()


def score_with_linear_model(docs: DataFrame, weights: list, bias: float) -> DataFrame:
    """Score documents with an arbitrary 16-bucket linear model using the
    EXACT expression ``text_linear_quality_classifier`` ships (delegates
    to the same ``_linear_score_expr`` — one source of truth, including
    the round-to-6-then-compare keep semantics). This is the deploy half
    of the train-then-filter loop: pass ``_LQC_W``/``_LQC_BIAS`` for the
    pinned model or ``train_quality_model``'s learned weights."""
    score = _linear_score_expr(weights, bias)
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        score.alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


_LQC_VALUES = ", ".join(f"({i}, {w})" for i, w in enumerate(_LQC_W))

TEXT_LQC_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), w(bk, wt) AS (VALUES {_LQC_VALUES}),
s AS (
  SELECT doc_id, COUNT(*) AS n_tokens, AVG(wt) AS mean_w
  FROM t JOIN w
    ON (CAST(('0x' || substr(md5(tok), 1, 4)) AS INT) % 16) = bk
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       ROUND(1.0 / (1.0 + EXP(-({_LQC_BIAS} + mean_w))), 6) AS quality_score,
       ROUND(1.0 / (1.0 + EXP(-({_LQC_BIAS} + mean_w))), 6) >= 0.5 AS keep
FROM s
"""


# --- BM25 retrieval -------------------------------------------------------
# Okapi BM25 (Robertson/Spärck Jones; the Lucene-default +1 idf smoothing so
# idf is never negative) over the documents table for a FIXED query set —
# the retrieval twin of text_tfidf_top_terms. The reference has no search
# surface (spark-data-pipeline/spark_job.py is ingest-only); this is the
# [EXT] ranked-retrieval operator a training-data pipeline uses for corpus
# exploration and hard-negative mining.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10
# The query frame's distinct terms are collected to the driver and shipped
# as an INSET literal (that is what lets the postings filter run BEFORE the
# shuffle). Like similarity._Q_CAP, the bound is the contract that keeps
# scoring work growing with the corpus, never with the request.
_BM25_MAX_TERMS = 10_000
# Pinned benchmark queries over the fixture vocabulary. Like the ANN query
# sets (similarity._Q_CAP), the query side is CONSTANT-bounded by
# construction: scoring work grows with the corpus, never with |Q|.
_BM25_QUERIES = {
    1: ("spark", "table", "scan"),
    2: ("fast", "merge", "join"),
    3: ("window", "agg", "stream"),
    4: ("customer", "order", "query"),
    5: ("hash", "group", "sort"),
}


def bm25_doc_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The inverted-index rows for a document frame: (``id_col``, term, tf,
    dl) over ALL terms — the mergeable building block bm25_rank derives on
    the fly and :func:`~..streaming.ingest.start_incremental_bm25_ingest`
    maintains as a table. Postings for disjoint document sets are unioned by
    plain append (each doc's rows are self-contained), which is what makes
    the index incrementally maintainable. NULL-text docs contribute nothing
    (same guard as bm25_rank/BM25_SEARCH_SQL)."""
    toks = tokens(text_col)
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(id_col, F.size(toks).alias("dl"), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )


def bm25_stats_partial(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mergeable corpus-stats partial: one (n_docs, sum_dl) row. Plain sums,
    so partials from micro-batches finalize to EXACTLY the batch stats
    (integer sums divide once in :func:`bm25_stats_finalize` — bit-identical
    to a whole-corpus AVG)."""
    toks = tokens(text_col)
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.size(toks).alias("nt"))
        .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("sum_dl"))
    )


def bm25_stats_finalize(stats_partials: DataFrame) -> DataFrame:
    """Merge (n_docs, sum_dl) partial rows into the 1-row (n_docs, avgdl)
    frame bm25 scoring broadcasts. Empty/zero partials finalize to n_docs=0
    and a NULL avgdl — scoring then yields no rows, matching an empty
    corpus."""
    return stats_partials.agg(
        F.sum("n_docs").alias("n_docs"),
        (F.sum("sum_dl") / F.sum("n_docs")).alias("avgdl"),
    )


def bm25_score_postings(
    postings: DataFrame,
    stats: DataFrame,
    qmap: DataFrame,
    k: int = _BM25_TOPK,
    id_col: str = "doc_id",
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    terms: list[str] | None = None,
    check_terms: bool = True,
) -> DataFrame:
    """Score (``id_col``, term, tf, dl) postings against a (query_id, term)
    frame and return the top-``k`` per query — the shared scoring tail of
    :func:`bm25_rank` and the query-time face of the incrementally
    maintained index.

    ``postings`` may cover the whole vocabulary (the maintained-index case):
    rows are filtered to the query-term set FIRST, so against a stored
    postings table the scan reads only the query terms' rows (an INSET
    pushdown — the inverted-index property that makes query cost scale with
    matching postings, not corpus size). df-per-term is derived from the
    filtered postings via a window, identical to the on-the-fly path.
    """
    all_terms = (
        list(terms)
        if terms is not None
        else [
            r["term"]
            for r in qmap.select("term")
            .distinct()
            .limit(_BM25_MAX_TERMS + 1)
            .collect()
        ]
    )
    if len(all_terms) > _BM25_MAX_TERMS:
        raise ValueError(
            f"bm25 query frame exceeds {_BM25_MAX_TERMS} distinct "
            "terms; the query side must stay a driver-bounded request "
            "batch — for corpus-×-corpus scoring shapes, build an inverted "
            "index join instead"
        )
    if terms is not None and check_terms:
        # qmap is a tiny request frame by contract, so this subset check is
        # one cheap job — a caller-supplied list that misses a query term
        # would otherwise silently zero that term's contribution. Callers
        # whose `terms` and `qmap` are built from the SAME literal (the
        # pinned registry faces) may pass check_terms=False to skip the
        # job; the invariant then holds by construction.
        n_uncovered = (
            qmap.select("term")
            .distinct()
            .filter(~F.col("term").isin(all_terms))
            .limit(1)
            .count()
        )
        if n_uncovered:
            raise ValueError(
                "bm25: `terms` does not cover every distinct term in "
                "`qmap`; pass the full term list or omit `terms`"
            )
    scored = (
        postings.filter(F.col("term").isin(all_terms))
        .withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = scored.withColumn("contrib", idf * tf_norm)
    per_q = (
        scored.join(F.broadcast(qmap), "term")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc(id_col))
    return (
        per_q.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "bm25")
    )


def bm25_rank_from_index(
    postings: DataFrame,
    stats_partials: DataFrame,
    qmap: DataFrame,
    k: int = _BM25_TOPK,
    id_col: str = "doc_id",
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    terms: list[str] | None = None,
    check_terms: bool = True,
) -> DataFrame:
    """BM25 top-``k`` per query against a MAINTAINED index: the (term,
    doc_id, tf, dl) postings table plus (n_docs, sum_dl) stats partials kept
    by ``streaming.ingest.start_incremental_bm25_ingest``. Because postings
    and stats are plain mergeable sums, this returns EXACTLY what
    :func:`bm25_rank` returns over the full ingested corpus — without
    re-tokenizing anything (parity test in tests/test_streaming.py)."""
    return bm25_score_postings(
        postings,
        bm25_stats_finalize(stats_partials),
        qmap,
        k=k,
        id_col=id_col,
        k1=k1,
        b=b,
        terms=terms,
        check_terms=check_terms,
    )


# One materialized inverted index per (Spark application, sf_dir, corpus
# fingerprint) — the batch-session twin of the stream-maintained
# start_incremental_bm25_ingest tables.  The round-12 verdict's #1 bench
# finding was bm25_prf_search re-deriving the postings chain twice (6.2 s);
# every BM25-composing registry face in one session can instead share ONE
# tokenize+aggregate pass whose output is a term-clustered parquet postings
# table (so a query-term isin filter prunes row groups — the inverted-index
# property, now backed by storage layout) plus the 1-row stats partial.
# Keyed by applicationId + data fingerprint exactly like _PINNED_IVF_CACHE
# (the r11 memo-staleness rule: a same-session corpus rewrite builds fresh).
_BM25_INDEX_CACHE: dict = {}


def clear_bm25_index_cache() -> None:
    """Drop (and delete the scratch dirs of) all materialized BM25 indexes
    — test hook, mirroring clear_pinned_ivf_cache."""
    import shutil

    for _k, scratch in list(_BM25_INDEX_CACHE.items()):
        shutil.rmtree(scratch, ignore_errors=True)
    _BM25_INDEX_CACHE.clear()


def materialized_bm25_index(
    spark: SparkSession,
    sf_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """(postings, stats_partials) for the documents corpus, materialized
    once per session to scratch parquet and memoized.

    The postings write hash-partitions on term and sorts within partitions
    by (term, doc_id): every row group then covers a narrow term range, so
    bm25_score_postings' ``term IN (...)`` filter and the PRF vote's
    ``doc_id IN (...)`` filter both push down to the scan and skip files —
    query cost scales with matching postings, not corpus size.  This is the
    scratch-session realization of the layout the incremental ingest
    (streaming/ingest.py start_incremental_bm25_ingest) maintains durably;
    bm25_rank_from_index over either returns exactly what bm25_rank
    computes on the fly (parity tests in tests/test_streaming.py and
    tests/test_textops.py)."""
    import atexit
    import os
    import shutil
    import tempfile

    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        data_fingerprint(sf_dir, "documents"),
    )
    scratch = _BM25_INDEX_CACHE.get(key)
    if scratch is None:
        # a new corpus version displaces older entries for the same
        # (session, sf_dir) — their scratch dirs would otherwise linger
        for k in list(_BM25_INDEX_CACHE):
            if k[:2] == key[:2] and k != key:
                shutil.rmtree(_BM25_INDEX_CACHE.pop(k), ignore_errors=True)
        scratch = tempfile.mkdtemp(prefix="spark_graft_bm25idx_")
        atexit.register(shutil.rmtree, scratch, ignore_errors=True)
        docs = load_spread(spark, "documents", sf_dir).persist()
        try:
            (
                bm25_doc_postings(docs, text_col, id_col)
                .repartition(F.col("term"))
                .sortWithinPartitions("term", id_col)
                .write.mode("overwrite")
                .parquet(os.path.join(scratch, "postings"))
            )
            bm25_stats_partial(docs, text_col).write.mode("overwrite").parquet(
                os.path.join(scratch, "stats")
            )
        finally:
            docs.unpersist()
        _BM25_INDEX_CACHE[key] = scratch
    return (
        spark.read.parquet(os.path.join(scratch, "postings")),
        spark.read.parquet(os.path.join(scratch, "stats")),
    )


def bm25_rank(
    docs: DataFrame,
    qmap: DataFrame,
    k: int = _BM25_TOPK,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    terms: list[str] | None = None,
    check_terms: bool = True,
) -> DataFrame:
    """BM25 top-``k`` documents per query — the reusable operator.

    ``qmap`` is a small (query_id, term) frame (a user request batch); it is
    broadcast, so scoring work grows with the corpus, never with |Q|.
    When ``terms`` is passed it MUST cover every distinct term in ``qmap``
    (checked with a cheap anti-join on the tiny query frame) — a partial
    list would silently zero out the missing terms' contributions.

    NULL-text documents are excluded from the corpus entirely (both from
    avgdl/n_docs and from postings) — without the filter, Spark's legacy
    ``size(NULL) = -1`` would poison avgdl while the exploded postings side
    silently dropped the same rows (round-8 ADVICE fix; same guard as
    multimodal.mm_feature_extract, mirrored in BM25_SEARCH_SQL).

    Scale shape (the part that matters at 100 TB): the exploded token stream
    is filtered to the query-term set BEFORE the (doc_id, term) aggregation,
    so the shuffle carries only matching postings — a sliver of the corpus —
    while doc length (dl) rides along from the scan and the corpus-wide
    (n_docs, avgdl) stats are a broadcast 1-row aggregate. df-per-term
    reuses the postings' hash partitioning via a window, exactly like
    text_tfidf_top_terms; final top-k is one per-query window (plan audit
    in COVERAGE.md: Spark's WindowGroupLimit bounds it per-partition). Two
    corpus scans total (stats + postings), zero corpus-keyed wide shuffles.
    """
    stats = bm25_stats_finalize(bm25_stats_partial(docs, text_col))
    postings = bm25_doc_postings(docs, text_col, id_col)
    return bm25_score_postings(
        postings,
        stats,
        qmap,
        k=k,
        id_col=id_col,
        k1=k1,
        b=b,
        terms=terms,
        check_terms=check_terms,
    )


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: BM25 top-10 per pinned benchmark query — served from the
    session-materialized inverted index (r16 optimization round: the face
    used to re-tokenize the corpus twice per call via the on-the-fly
    :func:`bm25_rank`; ``bm25_rank_from_index`` over the materialized
    postings returns EXACTLY the same ranking by the mergeable-postings
    contract — parity-tested in tests/test_streaming.py /
    tests/test_textops-adjacent suites — while the query-time scan reads
    only the query terms' row groups). The pinned set keeps the driver
    oracle reproducible; ``bm25_rank`` itself remains the on-the-fly
    operator for ad-hoc corpora."""
    qmap = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts],
        "query_id int, term string",
    )
    postings, stats_partials = materialized_bm25_index(spark, sf_dir)
    return bm25_rank_from_index(
        postings,
        stats_partials,
        qmap,
        terms=sorted({t for ts in _BM25_QUERIES.values() for t in ts}),
        # qmap and terms come from the SAME pinned literal — the coverage
        # invariant holds by construction, so skip the check job (it cost
        # +44% on the bench face when it ran per invocation)
        check_terms=False,
    )


_BM25_Q_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts
)

BM25_SEARCH_SQL = f"""
WITH q(query_id, term) AS (VALUES {_BM25_Q_VALUES}),
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
)
SELECT query_id, rank, doc_id, bm25
FROM (
  SELECT query_id, doc_id, bm25,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY bm25 DESC, doc_id ASC) AS rank
  FROM perq
)
WHERE rank <= {_BM25_TOPK}
"""


# Dirichlet smoothing mass for query-likelihood retrieval: μ is the
# pseudo-length of background evidence mixed into every document model.
# The web-scale convention is μ≈2000; the synthetic corpus averages ~55
# tokens/doc, so μ=50 keeps document evidence and background comparable
# (μ >> dl would make every score the background and the ranking
# degenerate).
_QL_MU = 50.0


def ql_rank_from_index(
    postings: DataFrame,
    stats_partials: DataFrame,
    qmap: DataFrame,
    terms: list[str],
    mu: float = _QL_MU,
    k: int = _BM25_TOPK,
    id_col: str = "doc_id",
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranking (Ponte & Croft 1998 /
    Zhai & Lafferty 2001 — the language-modeling twin of BM25) against
    the maintained/materialized postings index:

        score(q, d) = Σ_t log( (tf + μ·P(t|C)) / (dl + μ) )

    evaluated in the candidate-only decomposition
    ``Σ log(μ·pc) − |q'|·log(dl+μ) + Σ_matched log(1 + tf/(μ·pc))`` so
    only docs matching ≥1 query term are touched (absent terms
    contribute exactly their background mass through the per-query
    constant).  OOV query terms (collection frequency 0) drop on both
    engines.  Every log is ROUND(·, 9) before the ≤|q|-term sums and
    the final score rounds at 6 — the user_survival_km libm-divergence
    discipline on top of the BM25 sum-rounding idiom.

    Scale shape: identical to BM25 serving — the term-isin filter
    pushes down to the term-clustered postings scan, collection term
    frequencies are one |q|-term agg, and everything after is bounded
    by matching postings; the query side is constant by contract."""
    c_total = stats_partials.agg(F.sum("sum_dl").alias("c_total"))
    pt = (
        postings.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.sum("tf").alias("cf"))
        .crossJoin(F.broadcast(c_total))
        .select("term", (F.col("cf") / F.col("c_total")).alias("pc"))
    )
    qt = qmap.join(pt, "term")
    qc = qt.groupBy("query_id").agg(
        F.sum(F.round(F.log(F.lit(mu) * F.col("pc")), 9)).alias("cq"),
        F.count(F.lit(1)).alias("nq"),
    )
    matched = (
        postings.filter(F.col("term").isin(terms))
        .join(F.broadcast(qt.select("query_id", "term", "pc")), "term")
        .withColumn(
            "mc",
            F.round(
                F.log(F.lit(1.0) + F.col("tf") / (F.lit(mu) * F.col("pc"))),
                9,
            ),
        )
    )
    perqd = matched.groupBy("query_id", id_col).agg(
        F.sum("mc").alias("ms"), F.max("dl").alias("dl")
    )
    scored = perqd.join(F.broadcast(qc), "query_id").select(
        "query_id",
        id_col,
        F.round(
            F.col("cq")
            + F.col("ms")
            - F.col("nq") * F.round(F.log(F.col("dl") + mu), 9),
            6,
        ).alias("ql"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("ql"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "ql")
    )


def proximity_min_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional proximity retrieval (NEW round 15): for each pinned
    benchmark query, rank documents containing ALL query terms by the
    length of the SMALLEST token window covering every term — the
    classic positional-index capability (minimal-span ranking, the
    backbone of phrase/proximity scoring in Lucene-class engines) that
    pure bag-of-words BM25 cannot express: "spark near table near scan"
    beats a document mentioning the three terms in unrelated paragraphs.

    The sweep is set-oriented, not per-doc imperative: positions filter
    to query terms at the scan (INSET pushdown), and for each occurrence
    the per-term running LAST position (one ``last(ignorenulls)`` window
    per term index over the (query, doc) position order) gives the
    candidate window ending there — min over occurrences is the exact
    minimal span (standard sliding-window identity). Everything is
    integer token positions; ranking ties break (window, doc) — fully
    value-exact.

    Scale shape: the shuffle carries only matching-term positions (the
    BM25 postings sliver); the window frames are per (query, doc)
    occurrence lists; the final top-k is the WindowGroupLimit shape.
    |terms per query| is pinned ≤ 3, so the per-term running-last
    columns are a constant-width projection."""
    q_terms = {qid: list(ts) for qid, ts in sorted(_BM25_QUERIES.items())}
    max_t = max(len(ts) for ts in q_terms.values())
    qmap = spark.createDataFrame(
        [
            (qid, t, i + 1)
            for qid, ts in q_terms.items()
            for i, t in enumerate(ts)
        ],
        "query_id int, term string, ti int",
    )
    all_terms = sorted({t for ts in q_terms.values() for t in ts})
    docs = load_spread(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    pos = (
        docs.select(
            "doc_id", F.posexplode(tokens("text")).alias("pos", "term")
        )
        .filter(F.col("term").isin(all_terms))
        .join(F.broadcast(qmap), "term")
    )
    w = (
        Window.partitionBy("query_id", "doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lasts = [
        F.last(
            F.when(F.col("ti") == i + 1, F.col("pos")), ignorenulls=True
        ).over(w).alias(f"l{i + 1}")
        for i in range(max_t)
    ]
    n_terms = F.size(
        F.filter(
            F.array(*[F.col(f"l{i + 1}") for i in range(max_t)]),
            lambda x: x.isNotNull(),
        )
    )
    # queries with fewer than max_t terms: missing indexes stay NULL
    # forever — require exactly |terms(q)| seen
    nt_map = spark.createDataFrame(
        [(qid, len(ts)) for qid, ts in q_terms.items()],
        "query_id int, n_q int",
    )
    spans = (
        pos.select("query_id", "doc_id", "pos", *lasts)
        .join(F.broadcast(nt_map), "query_id")
        .filter(n_terms == F.col("n_q"))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("pos")
                - F.least(
                    *[F.col(f"l{i + 1}") for i in range(max_t)]
                )
                + 1
            ).alias("win"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.min("win").cast("long").alias("window_len"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.asc("window_len"), F.asc("doc_id")
    )
    return (
        spans.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _BM25_TOPK)
        .select("query_id", "rank", "doc_id", "window_len")
    )


def _proximity_sql() -> str:
    q_terms = {qid: list(ts) for qid, ts in sorted(_BM25_QUERIES.items())}
    max_t = max(len(ts) for ts in q_terms.values())
    q_vals = ", ".join(
        f"({qid}, '{t}', {i + 1})"
        for qid, ts in q_terms.items()
        for i, t in enumerate(ts)
    )
    nt_vals = ", ".join(f"({qid}, {len(ts)})" for qid, ts in q_terms.items())
    last_cols = ",\n         ".join(
        f"LAST_VALUE(CASE WHEN ti = {i + 1} THEN pos END IGNORE NULLS)"
        f" OVER w AS l{i + 1}"
        for i in range(max_t)
    )
    lvars = ", ".join(f"l{i + 1}" for i in range(max_t))
    nn = " + ".join(
        f"CASE WHEN l{i + 1} IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(max_t)
    )
    return f"""
WITH q(query_id, term, ti) AS (VALUES {q_vals}),
nt(query_id, n_q) AS (VALUES {nt_vals}),
tokpos AS (
  SELECT doc_id, (t.idx - 1) AS pos, t.tok AS term
  FROM (
    SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS toks
    FROM documents WHERE text IS NOT NULL
  ), LATERAL (
    SELECT UNNEST(toks) AS tok,
           generate_subscripts(toks, 1) AS idx
  ) t
),
p AS (
  SELECT tp.doc_id, tp.pos, q.query_id, q.ti
  FROM tokpos tp JOIN q ON q.term = tp.term
),
lasts AS (
  SELECT query_id, doc_id, pos,
         {last_cols}
  FROM p
  WINDOW w AS (PARTITION BY query_id, doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
spans AS (
  SELECT l.query_id, l.doc_id,
         CAST(MIN(l.pos - LEAST({lvars}) + 1) AS BIGINT) AS window_len
  FROM lasts l JOIN nt ON nt.query_id = l.query_id
  WHERE {nn} = nt.n_q
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, window_len
FROM (
  SELECT query_id, doc_id, window_len,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY window_len ASC, doc_id ASC) AS rank
  FROM spans
)
WHERE rank <= {_BM25_TOPK}
"""


PROXIMITY_SQL = _proximity_sql()


# Champion-list width: docs kept per term for candidate generation.
_CHAMP_M = 30


def bm25_champion_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Champion-list BM25 (NEW round 15) — the classic inexact-top-k
    serving optimization (Manning/Raghavan/Schütze IR §7.1.3): per query
    term keep only the ``_CHAMP_M`` highest-tf postings ("champions"),
    take the union over the query's terms as the candidate set, and
    score ONLY those candidates — with TRUE document frequencies and the
    exact BM25 formula, so every reported score equals the full
    ranking's score for that document (test-pinned); only membership is
    approximate.

    Why it matters at 100 TB: a high-df term's postings list is
    corpus-sized, and full evaluation pays it on every query. Champion
    lists bound the scored set at |terms|·M documents REGARDLESS of df
    — the candidate frame is a broadcast, the heavy postings rows for
    non-champion docs never reach the aggregation, and the champion
    pick itself reuses the same per-term window partitioning the df
    count needs (one shuffle, two windows). Served from the SAME
    materialized term-clustered index as bm25_search/ql_search — the
    champion lists could equally be precomputed at index build, which
    is exactly what production engines do."""
    postings, stats_p = materialized_bm25_index(spark, sf_dir)
    qmap = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts],
        "query_id int, term string",
    )
    all_terms = sorted({t for ts in _BM25_QUERIES.values() for t in ts})
    stats = bm25_stats_finalize(stats_p)
    p = postings.filter(F.col("term").isin(all_terms)).withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    )
    wch = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    cand = (
        p.withColumn("crk", F.row_number().over(wch))
        .filter(F.col("crk") <= _CHAMP_M)
        .join(F.broadcast(qmap), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    scored = p.crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (_BM25_K1 + 1)) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    per_q = (
        scored.withColumn("contrib", idf * tf_norm)
        .join(F.broadcast(qmap), "term")
        .join(F.broadcast(cand), ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        per_q.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_TOPK)
        .select("query_id", "rank", "doc_id", "bm25")
    )


BM25_CHAMPION_SQL = f"""
WITH q(query_id, term) AS (VALUES {_BM25_Q_VALUES}),
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
champ AS (
  SELECT term, doc_id FROM (
    SELECT term, doc_id,
           ROW_NUMBER() OVER (PARTITION BY term
                              ORDER BY tf DESC, doc_id ASC) AS crk
    FROM tf
  ) WHERE crk <= {_CHAMP_M}
),
cand AS (
  SELECT DISTINCT q.query_id, c.doc_id
  FROM champ c JOIN q USING (term)
),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         * (tf * ({_BM25_K1} + 1))
         / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl)) AS c
  FROM tf JOIN dfc USING (term), stats
),
perq AS (
  SELECT q.query_id, contrib.doc_id AS doc_id, ROUND(SUM(c), 6) AS bm25
  FROM contrib JOIN q USING (term)
  JOIN cand ON cand.query_id = q.query_id AND cand.doc_id = contrib.doc_id
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, bm25
FROM (
  SELECT query_id, doc_id, bm25,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY bm25 DESC, doc_id ASC) AS rank
  FROM perq
)
WHERE rank <= {_BM25_TOPK}
"""


def ql_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood top-10 per pinned benchmark query (NEW round 14)
    — the second ranked-retrieval model next to BM25, served from the
    SAME materialized term-clustered index (one tokenize pass per
    session feeds both rankers; the maintained BM25-ingest tables serve
    this identically since postings/stats are the shared shapes)."""
    postings, stats = materialized_bm25_index(spark, sf_dir)
    qmap = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts],
        "query_id int, term string",
    )
    return ql_rank_from_index(
        postings,
        stats,
        qmap,
        terms=sorted({t for ts in _BM25_QUERIES.values() for t in ts}),
    )


QL_SEARCH_SQL = f"""
WITH q(query_id, term) AS (VALUES {_BM25_Q_VALUES}),
d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents WHERE text IS NOT NULL
),
stats AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS c_total FROM d),
e AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl
  FROM e WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY 1, 2
),
cfc AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
pt AS (
  SELECT term, cf / (SELECT c_total FROM stats) AS pc FROM cfc
),
qt AS (SELECT query_id, q.term AS term, pc FROM q JOIN pt ON q.term = pt.term),
qc AS (
  SELECT query_id,
         SUM(ROUND(ln({_QL_MU} * pc), 9)) AS cq,
         COUNT(*) AS nq
  FROM qt GROUP BY 1
),
m AS (
  SELECT qt.query_id, tf.doc_id,
         ROUND(ln(1.0 + tf / ({_QL_MU} * qt.pc)), 9) AS mc,
         tf.dl
  FROM tf JOIN qt USING (term)
),
pq AS (
  SELECT query_id, doc_id, SUM(mc) AS ms, MAX(dl) AS dl
  FROM m GROUP BY 1, 2
),
scored AS (
  SELECT pq.query_id, doc_id,
         ROUND(cq + ms - nq * ROUND(ln(dl + {_QL_MU}), 9), 6) AS ql
  FROM pq JOIN qc ON pq.query_id = qc.query_id
)
SELECT query_id, rank, doc_id, ql
FROM (
  SELECT query_id, doc_id, ql,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ql DESC, doc_id ASC) AS rank
  FROM scored
)
WHERE rank <= {_BM25_TOPK}
"""


# Coverage-curve depth: how many head tokens the diagnostic reports.
_VOCAB_TOPK = 30


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the `_VOCAB_TOPK` most frequent tokens
    with their cumulative share of ALL token occurrences — the
    tokenizer-design diagnostic ("how much of the corpus do the top-N
    words cover?") run before vocab induction / BPE training, and the
    head-distribution health check for corpus drift.

    Scale shape: one wordcount shuffle, then the global top-K via
    ``orderBy().limit()`` — TakeOrderedAndProject, the distributed
    partial-top-k operator (each partition keeps K rows; no global sort —
    an unpartitioned rank window would instead serialize the whole
    vocabulary onto one task, which Spark does NOT rewrite with
    WindowGroupLimit). The rank/cumulative windows then run over the ≤K
    collected rows and the grand total rides a broadcast 1-row agg.
    Counts are integers and the share is one integer division rounded at
    6 — cross-engine exact."""
    docs = load_spread(spark, "documents", sf_dir)
    cnt = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    return _coverage_from_counts(cnt)


def _coverage_from_counts(cnt: DataFrame, topk: int = _VOCAB_TOPK) -> DataFrame:
    """Shared coverage-curve tail over a (token, cnt) frame — consumed by
    the batch face and the maintained-index serving path."""
    total = cnt.agg(F.sum("cnt").alias("total"))
    top = cnt.orderBy(F.desc("cnt"), F.asc("token")).limit(topk)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    wc = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "token",
            "cnt",
            F.round(F.sum("cnt").over(wc) / F.col("total"), 6).alias("cum_share"),
        )
    )


def vocab_coverage_from_index(
    postings: DataFrame, topk: int = _VOCAB_TOPK
) -> DataFrame:
    """Serve the coverage curve from the INCREMENTALLY MAINTAINED BM25
    postings table (``streaming.ingest.start_incremental_bm25_ingest``):
    a token's corpus occurrence count is exactly Σtf over its postings
    rows, so the curve equals the batch :func:`vocab_coverage` over
    everything ingested — without re-tokenizing (parity test in
    tests/test_streaming.py). One pair-keyed sum over the index + the
    shared bounded tail."""
    cnt = postings.groupBy(F.col("term").alias("token")).agg(
        F.sum("tf").alias("cnt")
    )
    return _coverage_from_counts(cnt, topk)


VOCAB_COVERAGE_SQL = f"""
WITH t AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL
),
cnt AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY 1),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM cnt),
top AS (
  SELECT token, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank
  FROM cnt
  QUALIFY rank <= {_VOCAB_TOPK}
)
SELECT rank, token, cnt,
       ROUND(SUM(cnt) OVER (ORDER BY rank) / (total * 1.0), 6) AS cum_share
FROM top, tot
"""


def quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-vs-rules evaluation: the confusion matrix and
    precision/recall/F1/accuracy of the shipped linear quality classifier
    against the Gopher heuristic rules as reference labels — the
    agreement audit a data-curation team runs before swapping a rule
    filter for a learned one. Completes the round's evaluation trio
    (retrieval_eval, ann_recall_eval, and this model-level gate).

    Both inputs are value-exact operators; the comparison is one doc_id
    join + a 1-row aggregate, and every metric is a ratio of integer
    counts divided once and rounded at 6 (F1 in its integer form
    2·tp/(2·tp+fp+fn) — never composed from already-rounded P and R) —
    cross-engine exact. Zero-denominator cases emit 0.0 on both sides."""
    clf = text_linear_quality_classifier(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("ck")
    )
    ref = text_gopher_quality(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rk")
    )
    m = (
        clf.join(ref, "doc_id")
        .agg(
            F.sum((F.col("ck") & F.col("rk")).cast("long")).alias("tp"),
            F.sum((F.col("ck") & ~F.col("rk")).cast("long")).alias("fp"),
            F.sum((~F.col("ck") & F.col("rk")).cast("long")).alias("fn"),
            F.sum((~F.col("ck") & ~F.col("rk")).cast("long")).alias("tn"),
        )
    )

    def ratio(num, den):
        return F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0))

    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    return m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        ratio(tp, tp + fp).alias("precision"),
        ratio(tp, tp + fn).alias("recall"),
        ratio(2 * tp, 2 * tp + fp + fn).alias("f1"),
        ratio(tp + tn, tp + fp + fn + tn).alias("accuracy"),
    )


CLASSIFIER_EVAL_SQL_TEMPLATE = """
WITH clf AS ({lqc_sql}),
ref AS ({gopher_sql}),
m AS (
  SELECT
    CAST(SUM(CASE WHEN c.keep AND r.keep THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN c.keep AND NOT r.keep THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN NOT c.keep AND r.keep THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN NOT c.keep AND NOT r.keep THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM clf c JOIN ref r ON r.doc_id = c.doc_id
)
SELECT tp, fp, fn, tn,
  CASE WHEN tp + fp > 0 THEN ROUND(tp / ((tp + fp) * 1.0), 6) ELSE 0.0 END AS precision,
  CASE WHEN tp + fn > 0 THEN ROUND(tp / ((tp + fn) * 1.0), 6) ELSE 0.0 END AS recall,
  CASE WHEN 2 * tp + fp + fn > 0
       THEN ROUND(2 * tp / ((2 * tp + fp + fn) * 1.0), 6) ELSE 0.0 END AS f1,
  CASE WHEN tp + fp + fn + tn > 0
       THEN ROUND((tp + tn) / ((tp + fp + fn + tn) * 1.0), 6) ELSE 0.0 END AS accuracy
FROM m
"""


def classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the linear quality classifier: docs
    bucketed into ten equal-width score bins, each reporting its size,
    mean predicted score, and the Gopher-rules keep rate — the
    calibration curve read next to `quality_classifier_eval`'s single
    confusion matrix (a well-calibrated scorer's keep rate rises with its
    score).

    Scale note: bins are FIXED-WIDTH over the OBSERVED score range (the
    sigmoid of a mean-pooled linear model concentrates, so absolute
    [0,1]-width bins collapse to one) — a (min, max) broadcast 1-row agg
    plus a pure bin projection, deliberately NOT deciles: a global NTILE
    is an unpartitioned window that serializes the corpus onto one task
    (the vocab_coverage lesson). Cross-engine exactness: the score is
    already round-6 identical on both engines, the (min, max) of
    identical doubles and the bin arithmetic on them are identical, the
    keep rate is an AVG of exact 0/1 doubles (one division), and
    mean_score's AVG rounds at 6 (the accepted float-sum-order class)."""
    clf = text_linear_quality_classifier(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    ref = text_gopher_quality(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rk")
    )
    j = clf.join(ref, "doc_id")
    rng = j.agg(
        F.min("quality_score").alias("lo"), F.max("quality_score").alias("hi")
    )
    s, lo, hi = F.col("quality_score"), F.col("lo"), F.col("hi")
    bin_ = (
        F.when(hi == lo, F.lit(0))
        .otherwise(
            F.least(F.floor((s - lo) / (hi - lo) * 10), F.lit(9))
        )
        .cast("int")
    )
    return (
        j.crossJoin(F.broadcast(rng))
        .groupBy(bin_.alias("score_bin"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality_score"), 6).alias("mean_score"),
            F.round(F.avg(F.col("rk").cast("double")), 6).alias("ref_keep_rate"),
        )
    )


CLASSIFIER_CALIBRATION_SQL_TEMPLATE = """
WITH clf AS ({lqc_sql}),
ref AS ({gopher_sql}),
j AS (
  SELECT c.quality_score AS s, r.keep AS rk
  FROM clf c JOIN ref r ON r.doc_id = c.doc_id
),
rng AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM j)
SELECT CAST(CASE WHEN hi = lo THEN 0
            ELSE LEAST(FLOOR((s - lo) / (hi - lo) * 10), 9) END AS INT)
         AS score_bin,
       COUNT(*) AS n_docs,
       ROUND(AVG(s), 6) AS mean_score,
       ROUND(AVG(CASE WHEN rk THEN 1.0 ELSE 0.0 END), 6) AS ref_keep_rate
FROM j, rng
GROUP BY 1
"""


def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty decay over ingestion order — the diminishing-returns
    curve behind "is more of this source still adding information?": for
    each corpus-position decile (by doc_id, the ingestion order), the
    share of its docs' distinct 3-gram shingles seen for the FIRST time
    in that doc. A healthy growing corpus decays slowly; a curve that
    crashes to ~0 says the tail is re-crawls and boilerplate (the
    RefinedWeb/C4-style accumulation diagnostic).

    Shape: distinct shingles per doc (per-row projection, no explode
    until the count), one shingle-keyed MIN(doc_id) shuffle (wordcount
    class), join back on the shingle key, one doc-keyed agg, then an
    ADAPTIVE decile assignment over the doc-cardinality frame
    (``analytics.adaptive_ntile`` since round 10 — global-window NTILE
    below the threshold, the bit-identical sliced-rank plan above it;
    the probe is the parent table's metadata-cheap row count) and a
    10-row rollup. The per-decile rate is a ratio of summed integers
    rounded at 6 — cross-engine exact."""
    from ..functions.text import shingles

    docs = load_spread(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    # Round 10 (r9 verdict order #7, the 16.4× constant): the one
    # shingle-keyed shuffle now carries xxhash64 LONGS, not shingle
    # strings (engine-side only — the oracle keeps string keys; over S
    # distinct shingles the expected collision count is S²/2⁶⁵, ~3·10⁻¹⁰
    # at a million shingles, the md5-idiom bound), and the old join-back
    # of the exploded frame on the shingle key is GONE: a doc's novel
    # count is just how many first-occurrence rows it owns, a doc-keyed
    # agg of the (hash → first_doc) frame — so the corpus-scale exploded
    # frame shuffles ONCE instead of three times.
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens("text"), 3))).alias("s"),
    ).select("doc_id", F.xxhash64("s").alias("h"))
    first = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    totals = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    novels = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_novel")
    )
    per_doc = totals.join(novels, "doc_id", "left").fillna(0, ["n_novel"])
    from .analytics import adaptive_ntile

    # switch probe: the documents FOOTER row count is a free upper bound
    # on the per-doc frame — never a recompute of the shingle pipeline
    est = parquet_row_count("documents", sf_dir)
    dec = adaptive_ntile(
        per_doc, 10, "doc_id", "doc_id", "decile", est_rows=est
    ).select("n_shingles", "n_novel", "decile")
    return (
        dec.groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_shingles").alias("n_shingles"),
            F.sum("n_novel").alias("n_novel"),
            F.round(F.sum("n_novel") / F.sum("n_shingles"), 6).alias(
                "novelty_rate"
            ),
        )
        .orderBy("decile")
    )


CORPUS_NOVELTY_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])) AS s
  FROM toks
),
first AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
per_doc AS (
  SELECT sh.doc_id, COUNT(*) AS n_shingles,
         SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM sh JOIN first f USING (s)
  GROUP BY 1
),
dec AS (SELECT *, NTILE(10) OVER (ORDER BY doc_id) AS decile FROM per_doc)
SELECT decile, COUNT(*) AS n_docs,
       CAST(SUM(n_shingles) AS BIGINT) AS n_shingles,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       ROUND(SUM(n_novel) / (SUM(n_shingles) * 1.0), 6) AS novelty_rate
FROM dec
GROUP BY 1
ORDER BY 1
"""


def corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus report card — the one-page health summary a
    curation team reviews before admitting a source into the mixture: doc
    and token volume, within-source exact-duplicate count, Gopher-rule
    keep rate, and mean learned-classifier quality, every signal the
    SHARED definition the standalone ops use (``_gopher_signals``, the
    pinned ``_linear_score_expr`` scorer, raw-text identity for dups) so
    the report can never disagree with the filters it summarizes.

    One pass over the corpus (all signals are per-row expressions — the
    classifier scores inside one higher-order aggregate, no explode) into
    one source-keyed agg; |sources| output rows. Counts are integers;
    the two rates round at 6."""
    docs = load(spark, "documents", sf_dir).filter(F.col("text").isNotNull())
    _, _, _, keep = _gopher_signals()
    score = _linear_score_expr(_LQC_W, _LQC_BIAS)
    enriched = docs.select(
        "source",
        "text",
        F.size(tokens("text")).cast("long").alias("n_toks"),
        keep.cast("int").alias("g"),
        score.alias("q"),
    )
    return (
        enriched.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            (F.count("*") - F.countDistinct("text")).alias("n_exact_dups"),
            F.sum("n_toks").alias("total_tokens"),
            F.round(F.avg("g"), 6).alias("gopher_keep_rate"),
            F.round(F.avg("q"), 6).alias("mean_quality"),
        )
        .orderBy("source")
    )


def _corpus_source_report_sql() -> str:
    return f"""
WITH lqc AS ({TEXT_LQC_SQL}),
gopher AS ({TEXT_GOPHER_SQL}),
d AS (
  SELECT doc_id, source, text,
         len(string_split_regex(lower(trim(text)), '\\s+')) AS n_toks
  FROM documents WHERE text IS NOT NULL
)
SELECT d.source, COUNT(*) AS n_docs,
       COUNT(*) - COUNT(DISTINCT d.text) AS n_exact_dups,
       CAST(SUM(d.n_toks) AS BIGINT) AS total_tokens,
       ROUND(AVG(CASE WHEN g.keep THEN 1 ELSE 0 END), 6) AS gopher_keep_rate,
       ROUND(AVG(l.quality_score), 6) AS mean_quality
FROM d
JOIN gopher g USING (doc_id)
JOIN lqc l USING (doc_id)
GROUP BY 1
ORDER BY 1
"""


# Zipf fit depth: the OLS runs over the top-_ZIPF_TOPK ranks — a constant,
# so the regression input is bounded at any corpus size.
_ZIPF_TOPK = 200


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the token rank-frequency curve: OLS of
    ln(freq) on ln(rank) for the top-``_ZIPF_TOPK`` tokens — natural
    corpora slope ≈ −1; a flat slope flags boilerplate/template floods
    and a cliff flags key-mash or deduplication damage, so the (slope,
    r²) pair is a one-row corpus-health gate cheap enough to run per
    ingest batch.

    Scale shape: one wordcount shuffle, global top-K via
    ``orderBy().limit()`` (TakeOrderedAndProject — the vocab_coverage
    idiom), then closed-form OLS as a single aggregate over ≤K rows.
    Cross-engine: ranks and counts are integers; the six OLS sums are
    over ≤K ln() values whose partition-order drift (~1e-11 absolute) is
    far inside the 6-decimal round, and both engines evaluate the
    IDENTICAL closed-form expressions on their own sums."""
    docs = load_spread(spark, "documents", sf_dir)
    cnt = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    top = cnt.orderBy(F.desc("cnt"), F.asc("token")).limit(_ZIPF_TOPK)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    xy = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    s = xy.agg(
        (F.count("*") * F.lit(1.0)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    return s.select(
        F.col("n").cast("long").alias("n_ranks"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            (num * num)
            / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            6,
        ).alias("r2"),
    )


TEXT_ZIPF_SQL = f"""
WITH t AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL
),
cnt AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY 1),
top AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank
  FROM cnt
  QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) <= {_ZIPF_TOPK}
),
xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
       FROM top),
s AS (
  SELECT COUNT(*) * 1.0 AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_ranks,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept,
       ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
"""


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CHARACTER-level Shannon entropy (bits/char) — the
    quality signal under the token-level Gopher rules: binary blobs,
    base64, key-mash and single-char spam all sit far from natural
    language's ~4 bits/char, so entropy bands are a standard first-pass
    filter (and compression-ratio proxy) in web-scale curation.

    Shape is wordcount at character granularity: split each doc into its
    char array and explode THAT, so every exploded row carries one char —
    the first cut exploded a position sequence and projected
    substring(text, i, 1) afterwards, which dragged the FULL text string
    through the explode on every row (100× sweep: 47× runtime; the char
    split measures ~5×). Then one (doc, char) hash agg with map-side
    combine and one doc-keyed agg. Entropy uses the algebraic form
    log2(n) − Σ c·log2(c) / n so only counts are summed distributively;
    the float sum's partition-order drift (~1e-13) is absorbed by the
    6-decimal round on both sides (the oracle keeps the substring walk —
    same multiset of chars, different mechanism)."""
    docs = load(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    ch = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("c")
    )
    cnts = ch.groupBy("doc_id", "c").agg(F.count("*").alias("cnt"))
    agg = cnts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("cnt") * F.log2("cnt")).alias("s"),
    )
    return agg.select(
        "doc_id",
        F.col("n").alias("len"),
        "n_distinct",
        F.round(F.log2("n") - F.col("s") / F.col("n"), 6).alias(
            "entropy_bits"
        ),
    )


TEXT_CHAR_ENTROPY_SQL = """
WITH ch AS (
  SELECT doc_id, substring(text, i, 1) AS c
  FROM (
    SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i
    FROM documents WHERE text IS NOT NULL AND len(text) > 0
  )
),
cnts AS (SELECT doc_id, c, COUNT(*) AS cnt FROM ch GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n, COUNT(*) AS n_distinct,
         SUM(cnt * log2(cnt)) AS s
  FROM cnts GROUP BY 1
)
SELECT doc_id, n AS len, n_distinct,
       ROUND(log2(n) - s / n, 6) AS entropy_bits
FROM agg
"""


# Hashing-vectorizer width: 64 signed buckets — the sklearn
# HashingVectorizer / Weinberger et al. (ICML'09) feature-hashing trick at
# a width small enough for an exact cross-engine oracle.
_HV_DIM = 64


def text_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed bag-of-words (NEW round 10): each token hashes to one
    of ``_HV_DIM`` signed buckets (bucket = md5₁₆ mod 64; sign = parity of
    the next md5 bit — Weinberger et al.'s unbiased signed hashing), the
    per-(doc, bucket) signed term counts are L2-normalized per doc, and the
    nonzero coordinates come back as (doc_id, bucket, weight) rows — the
    sparse feature layout a distributed trainer consumes. This is the
    fixed-width featurizer behind ``train_quality_classifier``'s hashing
    trick, exposed as a first-class op with the full signed-sum semantics.

    Scale shape: tokenize → explode → ONE (doc, bucket) hash agg (wordcount
    class, map-side combine collapses repeated tokens before the shuffle)
    → per-doc norm as a second doc-keyed agg broadcast-joined back — no
    window over the corpus, no UDF. Zero-sum buckets (sign cancellation)
    drop BEFORE the norm on both engines, so the norm is over emitted
    coordinates only and the output is exactly the nonzero support.
    Cross-engine: md5-derived bucket/sign, integer sums, one sqrt and one
    division rounded at 6."""
    docs = load_spread(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    h = md5_bucket16(F.col("tok"))
    signed = toks.select(
        "doc_id",
        F.pmod(h, F.lit(_HV_DIM)).alias("bucket"),
        F.when(F.pmod(F.floor(h / F.lit(_HV_DIM)).cast("long"), F.lit(2)) == 0, 1)
        .otherwise(-1)
        .alias("sign"),
    )
    raw = (
        signed.groupBy("doc_id", "bucket")
        .agg(F.sum("sign").cast("long").alias("w_raw"))
        .filter(F.col("w_raw") != 0)
    )
    norms = raw.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w_raw") * F.col("w_raw"))).alias("nrm")
    )
    return raw.join(norms, "doc_id").select(
        "doc_id",
        "bucket",
        F.round(F.col("w_raw") / F.col("nrm"), 6).alias("weight"),
    )


TEXT_HASHING_VECTORIZER_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
),
hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 4)) AS INT) % {_HV_DIM} AS bucket,
         CASE WHEN (CAST(('0x' || substr(md5(tok), 1, 4)) AS INT) // {_HV_DIM})
                   % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM t
),
raw AS (
  SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS w_raw
  FROM hashed GROUP BY 1, 2
  HAVING SUM(sign) != 0
),
norms AS (
  SELECT doc_id, SQRT(SUM(w_raw * w_raw)) AS nrm FROM raw GROUP BY 1
)
SELECT r.doc_id, r.bucket, ROUND(r.w_raw / n.nrm, 6) AS weight
FROM raw r JOIN norms n USING (doc_id)
"""


def curation_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel report (NEW round 11): how many documents survive
    each successive gate — non-null text → Gopher rules → learned
    classifier (score ≥ 0.5) → exact dedup (one survivor per raw text) —
    with per-stage drop rates. The waterfall is THE summary a curation
    review starts from ("which gate is eating the corpus?"); per-source
    health lives in ``corpus_source_report``, this is the sequential
    view.

    Composes the SHARED definitions verbatim (``_gopher_signals``, the
    pinned ``_linear_score_expr``, raw-text identity for dedup — the
    corpus_source_report discipline), so the funnel cannot disagree with
    the standalone gates.

    Scale shape: every stage signal is a per-row expression, so ALL four
    stage counts come out of ONE aggregation pass (conditional counts +
    one conditional COUNT(DISTINCT text) for the dedup stage — a bare
    distinct aggregate, per the table_profile lesson); the 4-row
    waterfall is a literal-array explode of the single aggregated row.
    Integer counts, one rounded rate per stage — cross-engine exact."""
    docs = load(spark, "documents", sf_dir)
    _, _, _, keep = _gopher_signals()
    score = _linear_score_expr(_LQC_W, _LQC_BIAS)
    nn = F.col("text").isNotNull()
    g = nn & keep
    q = g & (score >= 0.5)
    one = docs.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(nn, 1)).alias("n_text"),
        F.count(F.when(g, 1)).alias("n_gopher"),
        F.count(F.when(q, 1)).alias("n_quality"),
        F.countDistinct(F.when(q, F.col("text"))).alias("n_dedup"),
    )
    stages = [
        ("1_nonnull_text", "n_all", "n_text"),
        ("2_gopher_rules", "n_text", "n_gopher"),
        ("3_quality_classifier", "n_gopher", "n_quality"),
        ("4_exact_dedup", "n_quality", "n_dedup"),
    ]
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("stage"),
                F.col(nin).cast("long").alias("n_in"),
                F.col(nout).cast("long").alias("n_out"),
                F.when(
                    F.col(nin) > 0,
                    F.round(
                        (F.col(nin) - F.col(nout)).cast("double") / F.col(nin),
                        6,
                    ),
                ).alias("drop_rate"),
            )
            for name, nin, nout in stages
        ]
    )
    return (
        one.select(F.explode(entries).alias("e")).select("e.*").orderBy("stage")
    )


def _curation_waterfall_sql() -> str:
    return f"""
WITH lqc AS ({TEXT_LQC_SQL}),
gopher AS ({TEXT_GOPHER_SQL}),
sig AS (
  SELECT d.doc_id, d.text,
         (d.text IS NOT NULL) AS nn,
         (d.text IS NOT NULL AND COALESCE(g.keep, FALSE)) AS g_keep,
         (d.text IS NOT NULL AND COALESCE(g.keep, FALSE)
          AND COALESCE(l.quality_score, 0) >= 0.5) AS q_keep
  FROM documents d
  LEFT JOIN gopher g USING (doc_id)
  LEFT JOIN lqc l USING (doc_id)
),
agg AS (
  SELECT COUNT(*) AS n_all,
         COUNT(CASE WHEN nn THEN 1 END) AS n_text,
         COUNT(CASE WHEN g_keep THEN 1 END) AS n_gopher,
         COUNT(CASE WHEN q_keep THEN 1 END) AS n_quality,
         COUNT(DISTINCT CASE WHEN q_keep THEN text END) AS n_dedup
  FROM sig
)
SELECT stage, CAST(n_in AS BIGINT) AS n_in, CAST(n_out AS BIGINT) AS n_out,
       CASE WHEN n_in > 0
            THEN ROUND(CAST(n_in - n_out AS DOUBLE) / n_in, 6) END AS drop_rate
FROM (
  SELECT '1_nonnull_text' AS stage, n_all AS n_in, n_text AS n_out FROM agg
  UNION ALL
  SELECT '2_gopher_rules', n_text, n_gopher FROM agg
  UNION ALL
  SELECT '3_quality_classifier', n_gopher, n_quality FROM agg
  UNION ALL
  SELECT '4_exact_dedup', n_quality, n_dedup FROM agg
)
ORDER BY stage
"""


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix (NEW round 11): detected vs labeled
    language with per-label share — the eval face that tells you WHERE the
    marker heuristic fails (which labeled language leaks into 'und' or a
    sibling), not just how often; the quality_classifier_eval discipline
    applied to the lang-ID component.

    Composes ``text_lang_id`` verbatim (the op under eval IS the shared
    definition — the eval cannot drift from the component it scores).
    NULL labels fold to 'unlabeled' on both engines so the matrix is
    total. Scale shape: the per-doc detector is a scan-level projection;
    the matrix is one hash agg to ≤ |langs|² cells and the share divides
    a windowed label total over those cells — nothing after the agg
    touches the corpus."""
    ids = text_lang_id(spark, sf_dir).select(
        F.coalesce("labeled_lang", F.lit("unlabeled")).alias("labeled_lang"),
        "detected_lang",
    )
    cells = ids.groupBy("labeled_lang", "detected_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    wl = Window.partitionBy("labeled_lang")
    return (
        cells.select(
            "labeled_lang",
            "detected_lang",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("n").cast("double") / F.sum("n").over(wl), 6
            ).alias("share_of_label"),
        )
        .orderBy("labeled_lang", "detected_lang")
    )


LANG_ID_CONFUSION_SQL = f"""
WITH ids AS ({TEXT_LANG_ID_SQL}),
cells AS (
  SELECT COALESCE(labeled_lang, 'unlabeled') AS labeled_lang,
         detected_lang, COUNT(*) AS n
  FROM ids GROUP BY 1, 2
)
SELECT labeled_lang, detected_lang, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY labeled_lang), 6) AS share_of_label
FROM cells
ORDER BY labeled_lang, detected_lang
"""


# Collocation extraction thresholds: a bigram needs ≥5 occurrences before
# its PMI is trusted (rare pairs have degenerate, maximal PMI — the classic
# sparsity failure Church & Hanks (1990) flag for mutual-information
# collocation mining).
_PMI_MIN_COUNT = 5
_PMI_TOP_K = 20


def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining (NEW round 11): the top-20 word bigrams by
    pointwise mutual information, PMI = ln(p(xy) / (p(x)·p(y))) with
    p(x) = unigram count / total tokens and p(xy) = bigram count / total
    bigrams — Church & Hanks' association ratio, the standard "these words
    belong together" statistic behind phrase induction and tokenizer-merge
    candidates. Bigrams below ``_PMI_MIN_COUNT`` occurrences are dropped
    BEFORE ranking (rare pairs score degenerate maximal PMI); totals are
    computed over the UNFILTERED streams so probabilities stay honest.

    Shares ``bigram_array``/``tokens`` with ``text_bigram_freq`` (same
    corpus, same bigram definition — frequency and association faces
    cannot diverge).

    Scale shape: two wordcount-class hash aggs (unigrams, bigrams) with
    map-side combine; the two 1-row totals and the unigram-count frame
    join back BROADCAST (vocabulary ≪ corpus; the bigram frame, the only
    large one after aggregation, never moves again — the min-count filter
    prunes it before the joins). PMI divides doubles in one pinned
    operation order, rounded at 6; ties → (w1, w2) — cross-engine
    exact."""
    docs = load_spread(spark, "documents", sf_dir)
    toks = tokens("text")
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    bg = (
        docs.select(F.explode(bigram_array(toks)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    n_uni = uni.agg(F.sum("n_w").cast("double").alias("n_tok"))
    n_bg = bg.agg(F.sum("n_xy").cast("double").alias("n_big"))
    cand = (
        bg.filter(F.col("n_xy") >= _PMI_MIN_COUNT)
        .withColumn("w1", F.split("bigram", " ").getItem(0))
        .withColumn("w2", F.split("bigram", " ").getItem(1))
    )
    joined = (
        cand.join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_x"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_y"))),
            "w2",
        )
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bg))
    )
    pmi = F.round(
        F.log(
            (F.col("n_xy").cast("double") / F.col("n_big"))
            / (
                (F.col("n_x").cast("double") / F.col("n_tok"))
                * (F.col("n_y").cast("double") / F.col("n_tok"))
            )
        ),
        6,
    )
    return (
        joined.select(
            "w1",
            "w2",
            F.col("n_xy").cast("long").alias("n_xy"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(_PMI_TOP_K)
    )


TEXT_PMI_SQL = f"""
WITH t AS (
  SELECT string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents
),
uni AS (
  SELECT unnest(toks) AS w FROM t
),
ucnt AS (SELECT w, COUNT(*) AS n_w FROM uni GROUP BY w),
bg AS (
  SELECT unnest(list_filter(
           list_transform(list_zip(toks, toks[2:]),
                          p -> CASE WHEN p[2] IS NOT NULL
                                    THEN p[1] || ' ' || p[2] END),
           x -> x IS NOT NULL)) AS bigram
  FROM t
),
bcnt AS (SELECT bigram, COUNT(*) AS n_xy FROM bg GROUP BY bigram),
tot AS (
  SELECT (SELECT CAST(SUM(n_w) AS DOUBLE) FROM ucnt) AS n_tok,
         (SELECT CAST(SUM(n_xy) AS DOUBLE) FROM bcnt) AS n_big
),
cand AS (
  SELECT string_split(bigram, ' ')[1] AS w1,
         string_split(bigram, ' ')[2] AS w2,
         n_xy
  FROM bcnt WHERE n_xy >= {_PMI_MIN_COUNT}
)
SELECT c.w1, c.w2, CAST(c.n_xy AS BIGINT) AS n_xy,
       ROUND(LN((CAST(c.n_xy AS DOUBLE) / t.n_big)
                / ((CAST(ux.n_w AS DOUBLE) / t.n_tok)
                   * (CAST(uy.n_w AS DOUBLE) / t.n_tok))), 6) AS pmi
FROM cand c
JOIN ucnt ux ON ux.w = c.w1
JOIN ucnt uy ON uy.w = c.w2
CROSS JOIN tot t
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT {_PMI_TOP_K}
"""


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document (NEW round
    12) — the classic readability gate (Flesch 1948; Kincaid 1975) a
    curation pipeline reads next to the Gopher rules: wildly low ease
    flags run-on boilerplate/legalese, negative grades flag fragment
    spam. Deterministic counting stand-ins keep it cross-engine exact:
    words = the SHARED whitespace tokenization; sentences =
    ``[.!?]+`` group count clamped ≥ 1; syllables = per-word vowel-group
    (``[aeiouy]+``) count clamped ≥ 1 — the standard dictionary-free
    approximation, verified identical Spark-vs-DuckDB.

    Scale shape: entirely a scan-level per-row projection (one
    higher-order aggregate over the token array — no explode, no
    shuffle, no UDF, the text_token_stats class). Counts are integers;
    the two formulas divide integers in a pinned operation order and
    round at 6."""
    docs = load_spread(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    toks = tokens("text")
    n_words = F.size(toks)
    n_sentences = F.greatest(
        F.lit(1), F.regexp_count("text", F.lit(r"[.!?]+"))
    )
    n_syllables = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc
        + F.greatest(F.lit(1), F.regexp_count(t, F.lit("[aeiouy]+"))),
    )
    base = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sentences.cast("long").alias("n_sentences"),
        n_syllables.cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6)
        .alias("flesch_ease"),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6)
        .alias("fk_grade"),
    )


TEXT_READABILITY_SQL = """
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
           AS n_words,
         CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
           AS n_sentences,
         CAST(list_sum(list_transform(
                string_split_regex(lower(trim(text)), '\\s+'),
                t -> GREATEST(1, len(regexp_extract_all(t, '[aeiouy]+')))))
              AS BIGINT) AS n_syllables
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       ROUND(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
         AS flesch_ease,
       ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
             + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
             - 15.59, 6) AS fk_grade
FROM base
"""


def classifier_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the linear quality classifier against the Gopher rules
    (NEW round 12) — the threshold-free ranking metric read next to
    ``quality_classifier_eval``'s fixed-0.5 confusion matrix and
    ``classifier_calibration``'s reliability curve: does a higher score
    actually mean a higher chance the rules would keep the doc, across
    EVERY operating point? AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻)
    (the Mann-Whitney form, ties at half credit).

    Exactness + scale in one shape: docs collapse to DISTINCT score bins
    (the score is the SHARED round-6 ``quality_score`` — already
    value-exact cross-engine, so the bin key needs no new rounding) with
    integer pos/neg counts; the pair statistic is then
    Σ_bins n_pos·(2·cum_neg_below + n_neg) over the BIN frame — the
    unpartitioned cumulative window runs over ≤ 10⁶+1 rows (round-6
    scores in [0,1]) at ANY corpus size, the CUSUM-spine discipline,
    never the corpus. Everything is a long until the single final
    division (AUC) resp. division-minus-one (Gini = 2·AUC − 1, computed
    from the integer statistic, never from the rounded AUC); one-class
    corpora emit NULL on both engines."""
    clf = text_linear_quality_classifier(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    ref = text_gopher_quality(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rk")
    )
    bins = (
        clf.join(ref, "doc_id")
        .groupBy("quality_score")
        .agg(
            F.sum(F.col("rk").cast("long")).alias("n_pos"),
            F.sum((~F.col("rk")).cast("long")).alias("n_neg"),
        )
    )
    wb = Window.orderBy("quality_score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    terms = bins.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(wb), F.lit(0)).alias("cnb"),
    )
    m = terms.agg(
        F.coalesce(F.sum("n_pos"), F.lit(0)).alias("p"),
        F.coalesce(F.sum("n_neg"), F.lit(0)).alias("nn"),
        F.count(F.lit(1)).alias("n_score_bins"),
        F.coalesce(
            F.sum(F.col("n_pos") * (2 * F.col("cnb") + F.col("n_neg"))),
            F.lit(0),
        ).alias("num2"),
    )
    p, nn, num2 = F.col("p"), F.col("nn"), F.col("num2")
    ok = (p > 0) & (nn > 0)
    return m.select(
        p.cast("long").alias("n_pos"),
        nn.cast("long").alias("n_neg"),
        F.col("n_score_bins").cast("long").alias("n_score_bins"),
        F.when(ok, F.round(num2 / (2.0 * p * nn), 6)).alias("auc"),
        F.when(ok, F.round(num2 / (1.0 * p * nn) - 1.0, 6)).alias("gini"),
    )


CLASSIFIER_AUC_SQL_TEMPLATE = """
WITH clf AS ({lqc_sql}),
ref AS ({gopher_sql}),
bins AS (
  SELECT c.quality_score AS s,
         CAST(SUM(CASE WHEN r.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN r.keep THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
  FROM clf c JOIN ref r ON r.doc_id = c.doc_id
  GROUP BY 1
),
terms AS (
  SELECT n_pos, n_neg,
         COALESCE(SUM(n_neg) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
  FROM bins
),
m AS (
  SELECT CAST(COALESCE(SUM(n_pos), 0) AS BIGINT) AS p,
         CAST(COALESCE(SUM(n_neg), 0) AS BIGINT) AS nn,
         CAST(COUNT(*) AS BIGINT) AS n_score_bins,
         CAST(COALESCE(SUM(n_pos * (2 * cnb + n_neg)), 0) AS BIGINT) AS num2
  FROM terms
)
SELECT p AS n_pos, nn AS n_neg, n_score_bins,
       CASE WHEN p > 0 AND nn > 0
            THEN ROUND(num2 / (2.0 * p * nn), 6) END AS auc,
       CASE WHEN p > 0 AND nn > 0
            THEN ROUND(num2 / (1.0 * p * nn) - 1.0, 6) END AS gini
FROM m
"""


def lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the lang-ID heuristic (NEW round 12) — the
    chance-corrected agreement score that ``lang_id_confusion``'s raw
    matrix doesn't give you: a detector that answers 'en' for everything
    on a 90%-English corpus gets 0.90 raw agreement but κ = 0, which is
    the honest number a curation team compares detectors by
    (Cohen 1960; the standard annotator-agreement statistic applied
    detector-vs-label).

    Composes ``text_lang_id`` verbatim (the shared definition — same
    discipline as the confusion face). Closed integer form: with
    n = Σ cells, agree = Σ diagonal, c2 = Σ_class row_total·col_total,
    κ = (n·agree − c2) / (n² − c2) — one division total, so the value is
    cross-engine exact, not a composition of rounded ratios. Scale: the
    matrix is ≤ |langs|² cells; everything after the one hash agg runs
    on that metadata-sized frame. Degenerate chance agreement
    (n² = c2 — a single-class corpus) emits NULL κ on both engines."""
    ids = text_lang_id(spark, sf_dir).select(
        F.coalesce("labeled_lang", F.lit("unlabeled")).alias("l"),
        F.col("detected_lang").alias("d"),
    )
    # materialize the ≤|langs|² matrix ONCE: the four marginal branches
    # below would otherwise each re-run the corpus lang-ID chain (r13
    # bench finding: 4× corpus scans, 2.3 s for a 25-cell statistic)
    cells = (
        ids.groupBy("l", "d")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    rows_ = cells.groupBy("l").agg(F.sum("n").alias("rn"))
    cols_ = cells.groupBy("d").agg(F.sum("n").alias("cn"))
    chance = (
        rows_.join(cols_, rows_["l"] == cols_["d"])
        .agg(F.coalesce(F.sum(F.col("rn") * F.col("cn")), F.lit(0)).alias("c2"))
    )
    diag = cells.filter(F.col("l") == F.col("d")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("agree")
    )
    tot = cells.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n"))
    m = tot.crossJoin(F.broadcast(diag)).crossJoin(F.broadcast(chance))
    n, a, c2 = F.col("n"), F.col("agree"), F.col("c2")
    return m.select(
        n.cast("long").alias("n_docs"),
        a.cast("long").alias("n_agree"),
        F.when(n > 0, F.round(a / (n * 1.0), 6)).alias("observed_agreement"),
        F.when(n > 0, F.round(c2 / (n * n * 1.0), 6)).alias(
            "expected_agreement"
        ),
        F.when(n * n != c2, F.round((n * a - c2) / ((n * n - c2) * 1.0), 6))
        .alias("kappa"),
    )


LANG_ID_KAPPA_SQL = f"""
WITH ids AS ({TEXT_LANG_ID_SQL}),
cells AS (
  SELECT COALESCE(labeled_lang, 'unlabeled') AS l, detected_lang AS d,
         COUNT(*) AS n
  FROM ids GROUP BY 1, 2
),
rows_ AS (SELECT l, SUM(n) AS rn FROM cells GROUP BY l),
cols_ AS (SELECT d, SUM(n) AS cn FROM cells GROUP BY d),
m AS (
  SELECT CAST(COALESCE((SELECT SUM(n) FROM cells), 0) AS BIGINT) AS n,
         CAST(COALESCE((SELECT SUM(n) FROM cells WHERE l = d), 0) AS BIGINT)
           AS agree,
         CAST(COALESCE((SELECT SUM(rn * cn) FROM rows_
                        JOIN cols_ ON cols_.d = rows_.l), 0) AS BIGINT) AS c2
)
SELECT n AS n_docs, agree AS n_agree,
       CASE WHEN n > 0 THEN ROUND(agree / (n * 1.0), 6) END
         AS observed_agreement,
       CASE WHEN n > 0 THEN ROUND(c2 / (n * n * 1.0), 6) END
         AS expected_agreement,
       CASE WHEN n * n != c2
            THEN ROUND((n * agree - c2) / ((n * n - c2) * 1.0), 6) END
         AS kappa
FROM m
"""


def source_unigram_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift (NEW round 12): Jensen-Shannon and
    KL divergence between each source's unigram distribution and the
    corpus-wide distribution — the "which domain is the odd one out"
    statistic behind mixture re-weighting and crawl-quality triage (a
    source whose JSD spikes is boilerplate, spam, or the wrong language;
    the pipeline-level twin of the per-doc ``text_unigram_logprob``).

    Shares ``tokens`` with every text face. Shape: one explode to
    (source, tok) counts — the word-count class; corpus counts are
    RE-AGGREGATED from those per-source partials (one pass, one shuffle);
    the JSD term frame is the |vocab| × |sources| dense grid (sources are
    a bounded domain registry; the grid is vocab-sized per source, the
    same class as the vocab join in text_unigram_logprob — partitioned on
    tok, never broadcast). KL(p‖q) needs only the source's OWN sparse
    rows (q > 0 wherever p > 0 since source tokens ⊆ corpus vocab).
    Integer counts throughout; per-term p/q/log arithmetic is identical
    IEEE expression shape on both engines and the per-source sums round
    at 6 (the accepted float-sum-order class, agg_stats precedent)."""
    docs = load_spread(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    tok = docs.select("source", F.explode(tokens("text")).alias("tok"))
    st = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c_st"))
    vocab = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    src_tot = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    tot = vocab.agg(F.coalesce(F.sum("c_t"), F.lit(0)).alias("n_corpus"))
    grid = (
        vocab.crossJoin(F.broadcast(src_tot))
        .join(st, ["source", "tok"], "left")
        .select(
            "source",
            "n_s",
            "c_t",
            F.coalesce("c_st", F.lit(0)).alias("c_st"),
        )
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("c_st").cast("double") / F.col("n_s")
    q = F.col("c_t").cast("double") / F.col("n_corpus")
    mm = (p + q) / 2
    jsd_term = (
        F.when(F.col("c_st") > 0, p * F.log(p / mm)).otherwise(F.lit(0.0))
        * 0.5
        + (q * F.log(q / mm)) * 0.5
    )
    kl_term = F.when(F.col("c_st") > 0, p * F.log(p / q)).otherwise(F.lit(0.0))
    return (
        grid.groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.sum((F.col("c_st") > 0).cast("long")).alias("n_distinct_tokens"),
            F.round(F.sum(jsd_term), 6).alias("jsd_vs_corpus"),
            F.round(F.sum(kl_term), 6).alias("kl_vs_corpus"),
        )
        .orderBy("source")
    )


SOURCE_UNIGRAM_DIVERGENCE_SQL = """
WITH tok AS (
  SELECT source,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
),
st AS (SELECT source, tok, COUNT(*) AS c_st FROM tok GROUP BY 1, 2),
vocab AS (SELECT tok, SUM(c_st) AS c_t FROM st GROUP BY tok),
src AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY source),
tot AS (SELECT COALESCE(SUM(c_t), 0) AS n_corpus FROM vocab),
grid AS (
  SELECT s.source, s.n_s, v.c_t, COALESCE(st.c_st, 0) AS c_st, t.n_corpus
  FROM vocab v CROSS JOIN src s CROSS JOIN tot t
  LEFT JOIN st ON st.source = s.source AND st.tok = v.tok
),
terms AS (
  SELECT source, n_s, c_st,
         CAST(c_st AS DOUBLE) / n_s AS p,
         CAST(c_t AS DOUBLE) / n_corpus AS q
  FROM grid
)
SELECT source,
       CAST(MAX(n_s) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN c_st > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_distinct_tokens,
       ROUND(SUM((CASE WHEN c_st > 0 THEN p * LN(p / ((p + q) / 2))
                       ELSE 0.0 END) * 0.5
                 + (q * LN(q / ((p + q) / 2))) * 0.5), 6) AS jsd_vs_corpus,
       ROUND(SUM(CASE WHEN c_st > 0 THEN p * LN(p / q) ELSE 0.0 END), 6)
         AS kl_vs_corpus
FROM terms
GROUP BY source
ORDER BY source
"""


# --- pLSA topic model ------------------------------------------------------
# Hofmann's probabilistic latent semantic analysis (EM over p(w|z), p(z|d))
# — the corpus-exploration face LLM curation uses for domain discovery and
# mixture planning. Everything pinned for cross-engine exactness:
_PLSA_K = 3        # topics
_PLSA_V = 100      # vocabulary: top-V corpus tokens (count desc, token asc)
_PLSA_ITERS = 3    # EM iterations, unrolled in the oracle
_PLSA_TOP = 6      # terms reported per topic
# Rounding contract: responsibilities at 12 (kills the k-way sum's
# last-ulp order dependence), factor tables at 9 per iteration (the
# kmeans/classifier trajectory-pinning recipe), report at 6.


def _plsa_seed(prefix, z) -> F.Column:
    """Deterministic strictly-positive init mass in [1, 1000] from the
    md5 lane law — seeds p(w|z) and p(z|d) identically on both engines."""
    return (
        F.pmod(md5_bucket16(F.concat_ws(":", prefix, z.cast("string"))), F.lit(1000))
        + 1
    ).cast("double")


_PLSA_FIT_CACHE: dict = {}


def clear_plsa_cache() -> None:
    _PLSA_FIT_CACHE.clear()


def _plsa_fit(spark: SparkSession, sf_dir: str):
    """Memoized EM run → (pwz, pzd) checkpointed factor frames — the
    ``_BPE_STATE_CACHE`` discipline, so the topic report and the
    per-source mixture face share ONE training run per corpus version
    (and cannot disagree about a factor)."""
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        data_fingerprint(sf_dir, "documents"),
    )
    hit = _PLSA_FIT_CACHE.get(key)
    if hit is not None:
        return hit
    for k in list(_PLSA_FIT_CACHE):
        try:
            stale = (
                _PLSA_FIT_CACHE[k][1].sparkSession.sparkContext._jsc is None
            )
        except Exception:
            stale = True
        if stale or k[:2] == key[:2]:
            _PLSA_FIT_CACHE.pop(k, None)
    result = _plsa_train(spark, sf_dir)
    _PLSA_FIT_CACHE[key] = result
    return result


def text_topic_plsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pLSA topic decomposition of the corpus (NEW round 15): factor the
    (doc, term) count matrix into ``_PLSA_K`` topics by
    expectation-maximization — p(w|z) topic-term profiles and p(z|d)
    per-doc mixtures — and report each topic's top terms plus its corpus
    share. The unsupervised corpus-exploration face next to the
    supervised classifier family: domain discovery, mixture planning
    ("what IS in this crawl?") and topic-balance gates all read this.

    Deterministic and value-exact across engines (the pinned-iteration
    discipline): md5-seeded strictly-positive init, ``_PLSA_ITERS``
    unrolled EM rounds, responsibilities ROUND(12) (absorbing the k-way
    sum's last-ulp order dependence), factor tables ROUND(9) per round
    (the kmeans/classifier trajectory-pinning recipe — far above the
    ~1e-16 float-reduction drift, so label switching cannot occur), and
    a (p desc, term asc) rank with the report at ROUND(6).

    Scale shape: vocabulary is TakeOrdered top-V (the textrank cap
    discipline) so p(w|z) is a V×k BROADCAST table; p(z|d) is doc-keyed
    and stays distributed; each EM round is ONE join-agg pass over the
    (doc, term, count) frame (wordcount-shaped — the count matrix joins
    its broadcast factors, responsibilities normalize in a (d,w) window
    over k rows, and both M-step tables are hash aggs). Factor tables
    localCheckpoint per round, so the lineage — and the recompute — is
    one round deep regardless of iteration count."""
    pwz, pzd = _plsa_fit(spark, sf_dir)
    shares = pzd.groupBy("z").agg(F.round(F.avg("p"), 6).alias("topic_share"))
    wr = Window.partitionBy("z").orderBy(F.desc("p"), F.asc("w"))
    return (
        pwz.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _PLSA_TOP)
        .join(F.broadcast(shares), "z")
        .select(
            F.col("z").alias("topic"),
            "rank",
            F.col("w").alias("term"),
            F.round("p", 6).alias("p_term_topic"),
            "topic_share",
        )
        .orderBy("topic", "rank")
    )


def _plsa_train(spark: SparkSession, sf_dir: str):
    """The EM run itself — returns (pwz, pzd) as checkpointed frames."""
    docs = load_spread(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    tok = docs.select(
        F.col("doc_id").alias("d"), F.explode(tokens("text")).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(_PLSA_V)
        .select("w")
    )
    dw = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    zs = spark.range(_PLSA_K).select(F.col("id").cast("int").alias("z"))
    wz = Window.partitionBy("z")
    pwz = (
        vocab.crossJoin(zs)
        .select("w", "z", _plsa_seed(F.col("w"), F.col("z")).alias("raw"))
        .select(
            "w", "z", F.round(F.col("raw") / F.sum("raw").over(wz), 9).alias("p")
        )
        .localCheckpoint(eager=True)
    )
    wd = Window.partitionBy("d")
    pzd = (
        dw.select("d")
        .distinct()
        .crossJoin(F.broadcast(zs))
        .select(
            "d",
            "z",
            _plsa_seed(F.col("d").cast("string"), F.col("z")).alias("raw"),
        )
        .select(
            "d", "z", F.round(F.col("raw") / F.sum("raw").over(wd), 9).alias("p")
        )
        .localCheckpoint(eager=True)
    )
    cd = dw.groupBy("d").agg(F.sum("c").alias("cd"))
    wdw = Window.partitionBy("d", "w")
    for _ in range(_PLSA_ITERS):
        tri = (
            dw.join(F.broadcast(pwz.withColumnRenamed("p", "pw")), "w")
            .join(pzd.withColumnRenamed("p", "pd"), ["d", "z"])
            .select(
                "d",
                "w",
                "z",
                "c",
                (F.col("pw") * F.col("pd")).alias("j"),
            )
            .select(
                "d",
                "w",
                "z",
                (
                    F.col("c")
                    * F.round(F.col("j") / F.sum("j").over(wdw), 12)
                ).alias("m"),
            )
            .persist()
        )
        pwz = (
            tri.groupBy("w", "z")
            .agg(F.sum("m").alias("s"))
            .select(
                "w", "z", F.round(F.col("s") / F.sum("s").over(wz), 9).alias("p")
            )
            .localCheckpoint(eager=True)
        )
        pzd = (
            tri.groupBy("d", "z")
            .agg(F.sum("m").alias("s"))
            .join(cd, "d")
            .select(
                "d", "z", F.round(F.col("s") / F.col("cd"), 9).alias("p")
            )
            .localCheckpoint(eager=True)
        )
        tri.unpersist()
    dw.unpersist()
    return pwz, pzd


def topic_mixture_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source topic mixture from the SAME memoized pLSA run (NEW
    round 15): mean p(z|d) over each source's documents — the
    mixture-planning readout ("how much of each topic does every crawl
    source contribute?") that feeds temperature reweighting the way
    ``domain_mixture_weights`` feeds source-level budgets, but in TOPIC
    space (two sources can be distinct yet topically redundant — this
    face sees that, source counts cannot).

    Shares the checkpointed factor frames with ``text_topic_plsa``
    (one training run per corpus version, the memoized-chain
    discipline); the face itself is one |docs|-keyed join + a
    |sources|×k hash agg. Docs with no in-vocabulary token have no
    p(z|d) row and sit out — the factorization's documented domain."""
    _, pzd = _plsa_fit(spark, sf_dir)
    src = load(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    ).select(F.col("doc_id").alias("d"), "source")
    return (
        pzd.join(src, "d")
        .groupBy("source", "z")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("p"), 6).alias("topic_share"),
        )
        .select(
            "source",
            F.col("z").alias("topic"),
            "n_docs",
            "topic_share",
        )
        .orderBy("source", "topic")
    )


def _plsa_sql() -> str:
    """Unrolled-EM oracle: init CTEs + one (resp → pwz → pzd) block per
    iteration, all MATERIALIZED so DuckDB evaluates each round once.
    ``_plsa_chain_sql`` is the shared WITH-chain; the two faces differ
    only in their final SELECT — the same one-training-run guarantee the
    memoized engine chain gives."""
    lane = "CAST(('0x' || substr(md5({s}), 1, 4)) AS INT) % 1000 + 1"
    parts = [
        f"""WITH tok AS MATERIALIZED (
  SELECT doc_id AS d,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents WHERE text IS NOT NULL
),
vocab AS MATERIALIZED (
  SELECT w FROM tok GROUP BY w
  ORDER BY COUNT(*) DESC, w ASC LIMIT {_PLSA_V}
),
dw AS MATERIALIZED (
  SELECT t.d, t.w, COUNT(*) AS c FROM tok t JOIN vocab v ON v.w = t.w
  GROUP BY t.d, t.w
),
cd AS MATERIALIZED (SELECT d, SUM(c) AS cd FROM dw GROUP BY d),
zs AS (SELECT UNNEST(range({_PLSA_K})) AS z),
pwz0 AS MATERIALIZED (
  SELECT w, z, ROUND(raw / SUM(raw) OVER (PARTITION BY z), 9) AS p FROM (
    SELECT w, z,
           CAST({lane.format(s="w || ':' || CAST(z AS VARCHAR)")} AS DOUBLE)
             AS raw
    FROM vocab CROSS JOIN zs
  )
),
pzd0 AS MATERIALIZED (
  SELECT d, z, ROUND(raw / SUM(raw) OVER (PARTITION BY d), 9) AS p FROM (
    SELECT d, z,
           CAST({lane.format(
               s="CAST(d AS VARCHAR) || ':' || CAST(z AS VARCHAR)"
           )} AS DOUBLE) AS raw
    FROM (SELECT DISTINCT d FROM dw) CROSS JOIN zs
  )
)"""
    ]
    for i in range(1, _PLSA_ITERS + 1):
        parts.append(
            f""",
tri{i} AS MATERIALIZED (
  SELECT d, w, z,
         c * ROUND(j / SUM(j) OVER (PARTITION BY d, w), 12) AS m
  FROM (
    SELECT dw.d, dw.w, zs.z, dw.c, pw.p * pd.p AS j
    FROM dw
    CROSS JOIN zs
    JOIN pwz{i - 1} pw ON pw.w = dw.w AND pw.z = zs.z
    JOIN pzd{i - 1} pd ON pd.d = dw.d AND pd.z = zs.z
  )
),
pwz{i} AS MATERIALIZED (
  SELECT w, z, ROUND(s / SUM(s) OVER (PARTITION BY z), 9) AS p FROM (
    SELECT w, z, SUM(m) AS s FROM tri{i} GROUP BY w, z
  )
),
pzd{i} AS MATERIALIZED (
  SELECT t.d, t.z, ROUND(t.s / cd.cd, 9) AS p FROM (
    SELECT d, z, SUM(m) AS s FROM tri{i} GROUP BY d, z
  ) t JOIN cd ON cd.d = t.d
)"""
        )
    return "".join(parts)


def _plsa_chain_sql() -> str:
    return _plsa_sql()


TEXT_TOPIC_PLSA_SQL = f"""{_plsa_chain_sql()}
SELECT CAST(z AS INT) AS topic, CAST(rank AS INT) AS rank, term,
       p_term_topic, topic_share
FROM (
  SELECT z, w AS term,
         ROW_NUMBER() OVER (PARTITION BY z ORDER BY p DESC, w ASC) AS rank,
         ROUND(p, 6) AS p_term_topic
  FROM pwz{_PLSA_ITERS}
) r
JOIN (SELECT z, ROUND(AVG(p), 6) AS topic_share FROM pzd{_PLSA_ITERS} GROUP BY z) s
  USING (z)
WHERE rank <= {_PLSA_TOP}
ORDER BY topic, rank"""


TOPIC_MIXTURE_BY_SOURCE_SQL = f"""{_plsa_chain_sql()}
SELECT s.source, CAST(p.z AS INT) AS topic,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(p.p), 6) AS topic_share
FROM pzd{_PLSA_ITERS} p
JOIN (SELECT doc_id AS d, source FROM documents WHERE text IS NOT NULL) s
  ON s.d = p.d
GROUP BY s.source, p.z
ORDER BY s.source, topic"""


QUERIES = {
    "vocab_coverage": vocab_coverage,
    "text_hashing_vectorizer": text_hashing_vectorizer,
    "text_topic_plsa": text_topic_plsa,
    "topic_mixture_by_source": topic_mixture_by_source,
    "bm25_champion_search": bm25_champion_search,
    "proximity_min_window": proximity_min_window,
    "text_ppmi_similarity": text_ppmi_similarity,
    "text_pmi_collocations": text_pmi_collocations,
    "lang_id_confusion": lang_id_confusion,
    "lang_id_kappa": lang_id_kappa,
    "classifier_auc_eval": classifier_auc_eval,
    "source_unigram_divergence": source_unigram_divergence,
    "text_readability": text_readability,
    "curation_waterfall": curation_waterfall,
    "text_char_entropy": text_char_entropy,
    "text_zipf_fit": text_zipf_fit,
    "corpus_source_report": corpus_source_report,
    "corpus_novelty_curve": corpus_novelty_curve,
    "quality_classifier_eval": quality_classifier_eval,
    "classifier_calibration": classifier_calibration,
    "text_heavy_hitters": text_heavy_hitters,
    "bm25_search": bm25_search,
    "ql_search": ql_search,
    "text_rolling_hash": text_rolling_hash,
    "text_within_doc_repetition": text_within_doc_repetition,
    "pii_redact": pii_redact,
    "decontaminate_eval_overlap": decontaminate_eval_overlap,
    "text_unigram_logprob": text_unigram_logprob,
    "text_perplexity_bigram": text_perplexity_bigram,
    "chunk_documents": chunk_documents,
    "pack_training_sequences": pack_training_sequences,
    "train_unigram_lm": train_unigram_lm,
    "text_textrank_keywords": text_textrank_keywords,
    "chunk_cdc": chunk_cdc,
    "cdc_chunk_dedup": cdc_chunk_dedup,
    "tokenizer_fertility_compare": tokenizer_fertility_compare,
    "text_keyphrase_rake": text_keyphrase_rake,
    "unigram_lm_segment": unigram_lm_segment,
    "text_gopher_quality": text_gopher_quality,
    "text_repeated_ngrams": text_repeated_ngrams,
    "text_token_stats": text_token_stats,
    "text_token_bpe": text_token_bpe,
    "train_bpe_merges": train_bpe_merges,
    "bpe_apply_merges": bpe_apply_merges,
    "bpe_compression_curve": bpe_compression_curve,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "text_tfidf_top_terms": text_tfidf_top_terms,
    "text_bigram_freq": text_bigram_freq,
    "text_rollup_by_lang_source": text_rollup_by_lang_source,
    "text_linear_quality_classifier": text_linear_quality_classifier,
    "train_quality_classifier": train_quality_classifier,
}

ORACLES = {
    # round 10: signed feature hashing (md5 bucket/sign, integer sums)
    "text_hashing_vectorizer": TEXT_HASHING_VECTORIZER_SQL,
    # round 15: pLSA topic model (unrolled pinned-EM oracle)
    "text_topic_plsa": TEXT_TOPIC_PLSA_SQL,
    # round 15: per-source topic mixture from the same chain
    "topic_mixture_by_source": TOPIC_MIXTURE_BY_SOURCE_SQL,
    # round 15: champion-list inexact top-k BM25 (true scores, pruned candidates)
    "bm25_champion_search": BM25_CHAMPION_SQL,
    # round 15: positional minimal-span proximity ranking
    "proximity_min_window": PROXIMITY_SQL,
    # round 15: PPMI distributional similarity on the shared word graph
    "text_ppmi_similarity": PPMI_SIMILARITY_SQL,
    # round 11: PMI collocation mining (shared tokens/bigram defs)
    "text_pmi_collocations": TEXT_PMI_SQL,
    # round 11: lang-ID eval face (wraps the shared TEXT_LANG_ID_SQL)
    "lang_id_confusion": LANG_ID_CONFUSION_SQL,
    # round 12: chance-corrected agreement on the same shared detector
    "lang_id_kappa": LANG_ID_KAPPA_SQL,
    # round 12: threshold-free ranking eval of the shared classifier score
    "classifier_auc_eval": CLASSIFIER_AUC_SQL_TEMPLATE.format(
        lqc_sql=TEXT_LQC_SQL, gopher_sql=TEXT_GOPHER_SQL
    ),
    # round 12: per-source unigram JSD/KL drift vs the corpus distribution
    "source_unigram_divergence": SOURCE_UNIGRAM_DIVERGENCE_SQL,
    # round 12: Flesch/FK readability (integer counting stand-ins)
    "text_readability": TEXT_READABILITY_SQL,
    # round 11: sequential curation funnel (shared gopher/LQC/dedup defs)
    "curation_waterfall": _curation_waterfall_sql(),
    "vocab_coverage": VOCAB_COVERAGE_SQL,
    "text_char_entropy": TEXT_CHAR_ENTROPY_SQL,
    "text_zipf_fit": TEXT_ZIPF_SQL,
    "corpus_source_report": _corpus_source_report_sql(),
    "corpus_novelty_curve": CORPUS_NOVELTY_SQL,
    "quality_classifier_eval": CLASSIFIER_EVAL_SQL_TEMPLATE.format(
        lqc_sql=TEXT_LQC_SQL, gopher_sql=TEXT_GOPHER_SQL
    ),
    "classifier_calibration": CLASSIFIER_CALIBRATION_SQL_TEMPLATE.format(
        lqc_sql=TEXT_LQC_SQL, gopher_sql=TEXT_GOPHER_SQL
    ),
    "text_heavy_hitters": TEXT_HEAVY_HITTERS_SQL,
    "bm25_search": BM25_SEARCH_SQL,
    # round 14: Dirichlet query-likelihood ranking (the LM retrieval
    # model next to BM25, served from the shared materialized index)
    "ql_search": QL_SEARCH_SQL,
    "text_rolling_hash": TEXT_ROLLING_HASH_SQL,
    "text_within_doc_repetition": TEXT_WITHIN_DOC_REP_SQL,
    "pii_redact": PII_REDACT_SQL,
    "decontaminate_eval_overlap": DECONTAMINATE_SQL,
    "text_unigram_logprob": TEXT_UNIGRAM_LP_SQL,
    "text_perplexity_bigram": TEXT_PERPLEXITY_BIGRAM_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    # round 13: next-fit packing replayed by a per-bucket recursive CTE
    "pack_training_sequences": PACK_TRAINING_SEQUENCES_SQL,
    # round 13: greedy hard-EM unigram trainer, unrolled-round recursive CTEs
    "train_unigram_lm": TRAIN_UNIGRAM_SQL,
    # round 13: TextRank keywords (pinned damped iterations, ROUND-8 rank)
    "text_textrank_keywords": TEXTRANK_SQL,
    # round 13: content-defined chunking (rolling-hash boundaries)
    "chunk_cdc": CHUNK_CDC_SQL,
    "cdc_chunk_dedup": CDC_CHUNK_DEDUP_SQL,
    # round 13: BPE-vs-unigram bake-off (both training chains spliced)
    "tokenizer_fertility_compare": TOKENIZER_FERTILITY_SQL,
    # round 13: RAKE keyphrases (gaps-and-islands runs, degree/freq scores)
    "text_keyphrase_rake": TEXT_KEYPHRASE_RAKE_SQL,
    "unigram_lm_segment": UNIGRAM_SEGMENT_SQL,
    "text_gopher_quality": TEXT_GOPHER_SQL,
    "text_repeated_ngrams": TEXT_REPEATED_NGRAMS_SQL,
    "text_token_stats": TEXT_TOKEN_STATS_SQL,
    "text_token_bpe": TEXT_TOKEN_BPE_SQL,
    "train_bpe_merges": TRAIN_BPE_SQL,
    "bpe_apply_merges": BPE_APPLY_SQL,
    "bpe_compression_curve": BPE_COMPRESSION_SQL,
    "text_quality_score": TEXT_QUALITY_SQL,
    "text_lang_id": TEXT_LANG_ID_SQL,
    "text_tfidf_top_terms": TEXT_TFIDF_SQL,
    "text_bigram_freq": TEXT_BIGRAM_SQL,
    "text_rollup_by_lang_source": TEXT_ROLLUP_SQL,
    "text_linear_quality_classifier": TEXT_LQC_SQL,
    # round 9: train_quality_classifier upgraded rows-only → value-exact
    # via per-epoch ROUND(…, 9) parameter pinning (docstring has the full
    # mechanism); the whole distributed logistic-regression run is now
    # replayed by DuckDB
    "train_quality_classifier": TRAIN_QUALITY_SQL,
}
