"""Data-quality auditing operators (round 11): table profiling and
referential-integrity checks — the Deequ/Great-Expectations-shaped audits a
100-TB ingest runs before anything downstream trusts the data.

The reference pipeline trusts its single enrichment input implicitly
(/root/reference/spark-data-pipeline/spark_job.py:105-164 validates nothing
before writing); a lakehouse ingesting at scale cannot, so these are
first-class operators with exact oracles rather than ad-hoc notebook checks.

Scale notes:
- ``table_profile`` is ONE aggregation pass over the fact. The exact
  per-column distinct counts make Catalyst plan it via Expand (one shuffle
  carrying |columns| tagged copies of each row's single audited column —
  not |columns| scans of the table); count/null/min/max ride the same agg
  with map-side partials. At 100 TB you would flip ``exact_distinct=False``
  and get one HLL pass with NO expand; the exact form is the oracle-checked
  default at test SF.
- ``referential_integrity_audit`` collapses each fact-side foreign key to
  DISTINCT (key, multiplicity) BEFORE the anti join — the shuffle then
  carries |distinct keys| rows, not |fact| rows, and orphan row counts are
  recovered by summing multiplicities of the orphan keys. Dimension sides
  prune to the key column at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load

# (table, column) audit spec for the profile — orders is the audited fact.
_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def table_profile(
    spark: SparkSession, sf_dir: str, exact_distinct: bool = True
) -> DataFrame:
    """Per-column profile of ``orders`` in long form: row count, null count,
    distinct count, and min/max rendered as strings — the summary a data
    catalog materializes per snapshot.

    One aggregation job computes every metric for every column; the long
    (column, metric) layout comes from a literal-array inline explode of the
    already-aggregated single row, so the unpivot costs nothing. min/max are
    computed on the NATIVE type (a varchar min of a double column would be
    lexicographic nonsense) and rendered to strings afterwards; doubles are
    rounded at 2 before rendering so both engines print identical minimal
    digits.

    ``exact_distinct=False`` swaps every COUNT(DISTINCT) for
    ``approx_count_distinct`` — the 100-TB form with no Expand in the plan
    (kept out of the oracle contract; the default is exact).

    PERF (measured 30×, 3.2 s → 0.11 s at sf0.1): the distinct counts get
    their OWN aggregate, crossJoined with the count/null/min/max pass, and
    every expression inside ``.agg()`` is a BARE aggregate function. Mixing
    the six COUNT(DISTINCT)s with the plain aggregates in one .agg() —
    or wrapping any aggregate there in a cast/round — made Catalyst's
    multi-distinct rewrite dedup the Expand output on the full 6-column
    tuple with sort-based aggregates (a corpus-wide sort, 3.2 s at sf0.1;
    the split form plans each distinct on its own slim key). All rendering
    (rounds, string casts, null arithmetic) happens in the SELECT over the
    already-aggregated single row, where it costs nothing."""
    df = load(spark, "orders", sf_dir)
    nd = (
        (lambda c: F.countDistinct(c))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.min(c).alias(f"_mn_{c}"),
            F.max(c).alias(f"_mx_{c}"),
        ]
    nds = [nd(c).alias(f"_nd_{c}") for c in _PROFILE_COLS]
    one = df.agg(*aggs).crossJoin(F.broadcast(df.agg(*nds)))

    def render(c: str, which: str):
        col = F.col(f"_{which}_{c}")
        if dtypes[c] in ("double", "float"):
            col = F.round(col, 2)
        return col.cast("string")

    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).cast("long").alias("n_null"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                render(c, "mn").alias("min_str"),
                render(c, "mx").alias("max_str"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return (
        one.select(F.explode(entries).alias("e"))
        .select("e.*")
        .orderBy("col_name")
    )


TABLE_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{c}' AS col_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST({f"ROUND(MIN({c}), 2)" if c == "o_totalprice" else f"MIN({c})"} AS VARCHAR) AS min_str,
       CAST({f"ROUND(MAX({c}), 2)" if c == "o_totalprice" else f"MAX({c})"} AS VARCHAR) AS max_str
FROM orders"""
    for c in _PROFILE_COLS
) + "\nORDER BY col_name"


# (constraint name, fact table, fact key, dim table, dim key); None dim =
# not-null / uniqueness checks handled separately.
_FK_SPECS = (
    ("fk_lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("fk_lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("fk_lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("fk_orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
)


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over the star schema: four foreign keys (orphan fact
    rows), primary-key uniqueness on orders, and a NOT NULL check — one row
    per constraint with (n_checked, n_violations), the report a lakehouse
    gate consumes to pass/fail an ingest batch.

    Orphan checks collapse the fact key to DISTINCT (key, multiplicity)
    first, anti-join that against the dim's key column, and recover the
    violating ROW count as the sum of orphan multiplicities — so the join
    shuffles |distinct keys| rows regardless of fact width or duplication
    (at TPC-H shape, lineitem→orders has ~4× fewer distinct keys than
    rows; real event data is far more duplicated). NULL fact keys are
    excluded from FK checks (SQL FK semantics) and surfaced by the
    NOT NULL constraint row instead."""
    parts = []
    for name, fact, fkey, dim, dkey in _FK_SPECS:
        fk = (
            load(spark, fact, sf_dir)
            .filter(F.col(fkey).isNotNull())
            .groupBy(F.col(fkey).alias("k"))
            .agg(F.count(F.lit(1)).alias("mult"))
        )
        dk = load(spark, dim, sf_dir).select(F.col(dkey).alias("k"))
        orphans = fk.join(dk, "k", "left_anti")
        parts.append(
            fk.agg(
                F.lit(name).alias("constraint_name"),
                F.coalesce(F.sum("mult"), F.lit(0)).cast("long").alias("n_checked"),
            ).crossJoin(
                F.broadcast(
                    orphans.agg(
                        F.coalesce(F.sum("mult"), F.lit(0))
                        .cast("long")
                        .alias("n_violations")
                    )
                )
            )
        )
    orders = load(spark, "orders", sf_dir)
    dup = (
        orders.filter(F.col("o_orderkey").isNotNull())
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("mult"))
        .filter(F.col("mult") > 1)
    )
    parts.append(
        orders.agg(
            F.lit("pk_orders_orderkey_unique").alias("constraint_name"),
            F.count("o_orderkey").cast("long").alias("n_checked"),
        ).crossJoin(
            F.broadcast(
                dup.agg(
                    F.coalesce(F.sum("mult"), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
            )
        )
    )
    parts.append(
        orders.agg(
            F.lit("notnull_orders_custkey").alias("constraint_name"),
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            F.sum(F.col("o_custkey").isNull().cast("int"))
            .cast("long")
            .alias("n_violations"),
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("constraint_name")


RI_AUDIT_SQL = """
WITH fk1 AS (SELECT l_orderkey AS k, COUNT(*) AS mult FROM lineitem
             WHERE l_orderkey IS NOT NULL GROUP BY 1),
fk2 AS (SELECT l_partkey AS k, COUNT(*) AS mult FROM lineitem
        WHERE l_partkey IS NOT NULL GROUP BY 1),
fk3 AS (SELECT l_suppkey AS k, COUNT(*) AS mult FROM lineitem
        WHERE l_suppkey IS NOT NULL GROUP BY 1),
fk4 AS (SELECT o_custkey AS k, COUNT(*) AS mult FROM orders
        WHERE o_custkey IS NOT NULL GROUP BY 1)
SELECT 'fk_lineitem_orders' AS constraint_name,
       CAST(COALESCE((SELECT SUM(mult) FROM fk1), 0) AS BIGINT) AS n_checked,
       CAST(COALESCE((SELECT SUM(mult) FROM fk1
                      WHERE k NOT IN (SELECT o_orderkey FROM orders
                                      WHERE o_orderkey IS NOT NULL)), 0)
            AS BIGINT) AS n_violations
UNION ALL
SELECT 'fk_lineitem_part',
       CAST(COALESCE((SELECT SUM(mult) FROM fk2), 0) AS BIGINT),
       CAST(COALESCE((SELECT SUM(mult) FROM fk2
                      WHERE k NOT IN (SELECT p_partkey FROM part
                                      WHERE p_partkey IS NOT NULL)), 0)
            AS BIGINT)
UNION ALL
SELECT 'fk_lineitem_supplier',
       CAST(COALESCE((SELECT SUM(mult) FROM fk3), 0) AS BIGINT),
       CAST(COALESCE((SELECT SUM(mult) FROM fk3
                      WHERE k NOT IN (SELECT s_suppkey FROM supplier
                                      WHERE s_suppkey IS NOT NULL)), 0)
            AS BIGINT)
UNION ALL
SELECT 'fk_orders_customer',
       CAST(COALESCE((SELECT SUM(mult) FROM fk4), 0) AS BIGINT),
       CAST(COALESCE((SELECT SUM(mult) FROM fk4
                      WHERE k NOT IN (SELECT c_custkey FROM customer
                                      WHERE c_custkey IS NOT NULL)), 0)
            AS BIGINT)
UNION ALL
SELECT 'pk_orders_orderkey_unique',
       CAST((SELECT COUNT(o_orderkey) FROM orders) AS BIGINT),
       CAST(COALESCE((SELECT SUM(mult) FROM (
              SELECT o_orderkey, COUNT(*) AS mult FROM orders
              WHERE o_orderkey IS NOT NULL
              GROUP BY 1 HAVING COUNT(*) > 1)), 0) AS BIGINT)
UNION ALL
SELECT 'notnull_orders_custkey',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
ORDER BY constraint_name
"""


# (table, event-time column) pairs the freshness audit monitors.
_FRESHNESS_SPECS = (
    ("events", "ts"),
    ("orders", "o_orderdate"),
    ("lineitem", "l_shipdate"),
)


def data_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness audit: per monitored (table, event-time column), the max
    timestamp and its lag in days behind the freshest table — the staleness
    panel an ingest SLA monitor reads (a pipeline whose orders stream
    stalls shows up here days before anyone reads a wrong dashboard).

    Each max is one column-pruned scan agg (parquet footer statistics make
    it near-free); the lag joins three 1-row frames broadcast. Integer day
    lags — cross-engine exact."""
    maxes = []
    for tbl, col in _FRESHNESS_SPECS:
        maxes.append(
            load(spark, tbl, sf_dir).agg(
                F.lit(tbl).alias("table_name"),
                F.max(F.col(col).cast("timestamp")).alias("max_ts"),
            )
        )
    out = maxes[0]
    for m in maxes[1:]:
        out = out.unionByName(m)
    freshest = out.agg(F.max("max_ts").alias("global_max"))
    return (
        out.crossJoin(F.broadcast(freshest))
        .select(
            "table_name",
            "max_ts",
            F.datediff(F.to_date("global_max"), F.to_date("max_ts"))
            .cast("long")
            .alias("lag_days"),
        )
        .orderBy("table_name")
    )


FRESHNESS_SQL = """
WITH m AS (
  SELECT 'events' AS table_name, MAX(CAST(ts AS TIMESTAMP)) AS max_ts FROM events
  UNION ALL
  SELECT 'lineitem', MAX(CAST(l_shipdate AS TIMESTAMP)) FROM lineitem
  UNION ALL
  SELECT 'orders', MAX(CAST(o_orderdate AS TIMESTAMP)) FROM orders
)
SELECT table_name, max_ts,
       CAST(date_diff('day', CAST(max_ts AS DATE),
                      (SELECT CAST(MAX(max_ts) AS DATE) FROM m)) AS BIGINT)
         AS lag_days
FROM m
ORDER BY table_name
"""


def events_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-coverage audit: per calendar day in [min, max] — ZERO-FILLED,
    so a silent dead day surfaces as an explicit 0-row, not an absent row —
    the event count, its ratio to the discrete median daily count, and a
    low-coverage flag (n < half the median): the "did yesterday's ingest
    actually arrive" check that catches partial-delivery incidents exact
    row counts alone hide.

    The median is DISCRETE (rank ⌈n/2⌉ by (n, day) — the events_anomaly_mad
    idiom: no interpolation arithmetic for engines to disagree on). One
    hash agg over the fact to ≤ |days| rows; the spine join and both
    windows run over that calendar-bounded frame.

    median_n = 0 (half or more of the spine days empty — the long-outage
    scenario this audit exists for) guards both derived columns to NULL:
    unguarded, the ratio is a float division by zero whose Inf/NaN
    rendering the engines may disagree on, and n·2 < 0 is vacuously
    false exactly when coverage is at its worst."""
    ev = load(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    daily = (
        ev.select(F.to_date(F.col("ts").cast("timestamp")).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    grid = spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    from pyspark.sql import Window

    w = Window.orderBy("n", "day")
    ranked = grid.select(
        "day",
        "n",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
    )
    med = ranked.filter(
        F.col("rn") == F.floor((F.col("cnt") + 1) / 2)
    ).select(F.col("n").alias("median_n"))
    return (
        grid.crossJoin(F.broadcast(med))
        .select(
            "day",
            "n",
            "median_n",
            F.when(
                F.col("median_n") > 0,
                F.round(F.col("n").cast("double") / F.col("median_n"), 6),
            ).alias("ratio_to_median"),
            F.when(
                F.col("median_n") > 0, F.col("n") * 2 < F.col("median_n")
            ).alias("low_coverage"),
        )
        .orderBy("day")
    )


COVERAGE_AUDIT_SQL = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day FROM events WHERE ts IS NOT NULL
),
daily AS (SELECT day, COUNT(*) AS n FROM ev GROUP BY day),
spine AS (
  SELECT CAST(UNNEST(generate_series(
           (SELECT MIN(day) FROM daily),
           (SELECT MAX(day) FROM daily),
           INTERVAL 1 DAY)) AS DATE) AS day
),
grid AS (
  SELECT s.day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
  FROM spine s LEFT JOIN daily d USING (day)
),
ranked AS (
  SELECT day, n,
         ROW_NUMBER() OVER (ORDER BY n, day) AS rn,
         COUNT(*) OVER () AS cnt
  FROM grid
),
med AS (SELECT n AS median_n FROM ranked WHERE rn = (cnt + 1) // 2)
SELECT g.day, g.n, CAST(m.median_n AS BIGINT) AS median_n,
       CASE WHEN m.median_n > 0
            THEN ROUND(CAST(g.n AS DOUBLE) / m.median_n, 6) END
         AS ratio_to_median,
       CASE WHEN m.median_n > 0
            THEN (g.n * 2 < m.median_n) END AS low_coverage
FROM grid g CROSS JOIN med m
ORDER BY g.day
"""


# Record-linkage match threshold: candidate pairs within one edit of each
# other (Fellegi-Sunter style deterministic pass; a learned scorer would
# consume the same candidate frame).
_ER_LEV_MAX = 1
# Salt fan-out for the blocked pair join: a hot block spreads over this
# many tasks (B side replicates by the same factor — bounded, tiny frame).
_ER_SALT = 8


def entity_match_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked record-linkage candidates (NEW round 12) over the customer
    master: within-nation DISTINCT-NAME pairs within one edit of each
    other — the entity-resolution pass a data-cleaning pipeline runs
    before merging duplicate registrations (Fellegi & Sunter 1969;
    blocking per Christen's indexing survey). Emits matched name pairs
    with exact Levenshtein distance, each side's duplicate multiplicity
    and representative key, and the implied record-pair count.

    Scale discipline — two layers:
    (1) EXACT duplicates collapse FIRST: identical (nation, name) rows
        become ONE frame row carrying (multiplicity, min custkey) — the
        referential_integrity distinct-key-collapse idea. Without it the
        fuzzy stage is quadratic in entity multiplicity (a corpus where
        every entity has 100 duplicate registrations would pay 100² the
        pair work for zero information); with it, duplication inflates a
        COLUMN, never the join.
    (2) NEVER an all-pairs join: TWO blocking passes (name 13-prefix and
        5-suffix, each AND nation — prefix+suffix lengths sum to the
        name length, so a single edit anywhere preserves at least one
        block) union into one tagged frame self-joined on the
        (pass, nation, block) key; pairs dedup on the name pair BEFORE
        the edit-distance scoring. The LSH-banding discipline applied to
        structured records.
    Levenshtein is integer-exact cross-engine; name_a < name_b
    lexicographically (deterministic, engine-independent order).
    ``entity_resolution_groups`` composes THIS pair frame (the shared
    ``_er_matched_pairs`` core) into transitive entity clusters."""
    return (
        _er_matched_pairs(_er_name_frame(spark, sf_dir))
        .select(
            "nationkey",
            "name_a",
            "name_b",
            "lev_dist",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (F.col("n_a") * F.col("n_b")).cast("long").alias("n_record_pairs"),
            "rep_a",
            "rep_b",
        )
        .orderBy("nationkey", "name_a", "name_b")
    )


def _er_name_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-duplicate collapse: one row per (nation, name) with its
    record multiplicity and representative (min) custkey — the frame the
    match pass, the grouping pass and their oracles all read."""
    c = load(spark, "customer", sf_dir).filter(F.col("c_name").isNotNull())
    return c.groupBy(
        F.col("c_nationkey").alias("nationkey"), F.col("c_name").alias("name")
    ).agg(
        F.count(F.lit(1)).alias("mult"),
        F.min("c_custkey").alias("rep_key"),
    )


def _er_matched_pairs(names: DataFrame) -> DataFrame:
    """The blocked fuzzy-match core: two blocking passes, pair dedup on
    the name pair, Levenshtein ≤ threshold. Shared by the candidate
    report and the transitive grouping."""
    tagged = names.select(
        "*", F.substring("name", 1, 13).alias("blk"), F.lit(1).alias("pass")
    ).unionByName(
        names.select(
            "*", F.expr("right(name, 5)").alias("blk"), F.lit(2).alias("pass")
        )
    )
    a = tagged.select(
        "nationkey", "blk", "pass",
        F.col("name").alias("name_a"),
        F.col("mult").alias("n_a"),
        F.col("rep_key").alias("rep_a"),
    )
    b = tagged.select(
        "nationkey", "blk", "pass",
        F.col("name").alias("name_b"),
        F.col("mult").alias("n_b"),
        F.col("rep_key").alias("rep_b"),
    )
    # The match predicate runs BEFORE the pair dedup: a pair can appear at
    # most twice (once per blocking pass), so scoring it twice is two cheap
    # fold evaluations, while DISTINCT-first would shuffle EVERY in-block
    # candidate pair (measured 9M rows at sf0.1 vs ~10k matches — the
    # distinct must only ever carry survivors).
    #
    # SOUND pre-gate before the edit-distance DP (measured 13×: the block
    # join explodes 30k tagged rows into 4.5M candidates INSIDE one AQE
    # task — AQE coalesces by shuffle-INPUT bytes and cannot see the
    # explosion — so the per-candidate cost must be pennies): two strings
    # of EQUAL length within one edit differ by at most one substitution,
    # which cannot alter two disjoint substrings — so a true match has
    # positions 14-15 intact OR positions 16+ intact (different lengths
    # pass through). Prunes ~99% of candidates for ~100 ns each; the
    # DuckDB oracle deliberately does NOT carry the gate, so an
    # unsoundness would surface as a value mismatch instead of hiding.
    cheap_gate = (
        (F.length("name_a") != F.length("name_b"))
        | (F.substring("name_a", 14, 2) == F.substring("name_b", 14, 2))
        | (F.expr("substring(name_a, 16)") == F.expr("substring(name_b, 16)"))
    )
    # Salted, pin-partitioned block join (measured 7× on top of the gate:
    # 14.8 s → 2.0 s at sf0.1). Two problems share one fix: (a) AQE
    # coalesces the join's post-shuffle partitions by INPUT bytes and
    # cannot see that 30k tagged rows explode into 4.5M candidates, so the
    # whole pair stream lands on ONE task — the explicit numPartitions
    # repartition (REPARTITION_BY_NUM) is exempt from AQE coalescing;
    # (b) one oversized block (every same-prefix name in a nation) would
    # still serialize onto one task — the A side salts on the name hash
    # and the B side replicates ×_ER_SALT (the join_salted_skew idiom), so
    # a hot block spreads over _ER_SALT tasks while pair completeness is
    # exact (every (a, b) meets at salt(a)).
    spark = names.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = ["nationkey", "blk", "pass", "salt"]
    a_s = a.withColumn(
        "salt", F.pmod(F.xxhash64("name_a"), F.lit(_ER_SALT))
    ).repartition(n_part, *keys)
    b_s = b.crossJoin(
        F.broadcast(
            spark.range(_ER_SALT).select(F.col("id").alias("salt"))
        )
    ).repartition(n_part, *keys)
    return (
        a_s.join(b_s, keys)
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(cheap_gate)
        .withColumn("lev_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("lev_dist") <= _ER_LEV_MAX)
        .select(
            "nationkey", "name_a", "name_b", "lev_dist",
            "n_a", "n_b", "rep_a", "rep_b",
        )
        .distinct()
    )


# Per-(session, customer-version, sf_dir) memo of the record-linkage CC
# labels — the dedup-family _CC_LABEL_CACHE discipline brought to the ER
# grain (round 13: the bench showed every warm entity_resolution_groups
# call re-running the ~6 star-alternation rounds, ~10 s each; within one
# session the clustering over a static master is one derivation).  The
# memoized frame is the eagerly-localCheckpointed labels table; the
# customer fingerprint in the key rebuilds on a same-session rewrite.
_ER_CC_CACHE: dict = {}


def clear_er_cc_cache() -> None:
    _ER_CC_CACHE.clear()


def _er_cc_labels(
    spark: SparkSession, sf_dir: str, names: DataFrame
) -> DataFrame:
    from ..io import data_fingerprint
    from .dedup import _connected_components

    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        data_fingerprint(sf_dir, "customer"),
    )
    hit = _ER_CC_CACHE.get(key)
    if hit is not None:
        try:
            if hit.sparkSession.sparkContext._jsc is not None:
                return hit
        except Exception:
            pass
        _ER_CC_CACHE.pop(key, None)
    for k in list(_ER_CC_CACHE):
        if k[:2] == key[:2] and k != key:
            _ER_CC_CACHE.pop(k, None)
    edges = _er_matched_pairs(names).select(
        F.col("rep_a").alias("doc_a"), F.col("rep_b").alias("doc_b")
    )
    verts = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .union(edges.select("doc_b"))
        .distinct()
    )
    labels = (
        _connected_components(verts, edges)
        .select(F.col("doc_id").alias("rep_key"), "cluster_id")
        .localCheckpoint(eager=True)
    )
    _ER_CC_CACHE[key] = labels
    return labels


def entity_resolution_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive entity clusters (NEW round 12): connected components
    over the blocked fuzzy-match edges — the resolution step that turns
    pairwise candidates into mergeable entities (A≈B and B≈C put A and C
    in one entity even when lev(A,C) > the pair threshold). One row per
    distinct (nation, name): its representative key, the entity id (the
    minimum rep key reachable through match edges), whether this name is
    the entity's canonical spelling, and the name's record multiplicity
    — exactly the dedup_clusters shape on the record-linkage grain.

    Composes the SHARED ``_er_matched_pairs`` core (the grouping cannot
    disagree with the candidate report) and the shared min-label CC
    (iterated on the edge-induced subgraph only — matched names are a
    small fraction of the master at any scale; the full name frame is
    touched once by the closing left join). Oracle: DuckDB recursive-CTE
    transitive closure over the identical pair SQL."""
    names = _er_name_frame(spark, sf_dir)
    labels = _er_cc_labels(spark, sf_dir, names)
    entity_id = F.coalesce("cluster_id", F.col("rep_key"))
    return (
        names.join(labels, "rep_key", "left")
        .select(
            "nationkey",
            "name",
            "rep_key",
            entity_id.alias("entity_id"),
            (entity_id == F.col("rep_key")).alias("is_canonical"),
            F.col("mult").cast("long").alias("n_records"),
        )
        .orderBy("nationkey", "name")
    )


_ER_PAIR_CTES = f"""
WITH RECURSIVE names AS (
  SELECT c_nationkey AS nationkey, c_name AS name,
         COUNT(*) AS mult, MIN(c_custkey) AS rep_key
  FROM customer WHERE c_name IS NOT NULL
  GROUP BY 1, 2
),
tagged AS (
  SELECT *, substr(name, 1, 13) AS blk, 1 AS pass FROM names
  UNION ALL
  SELECT *, right(name, 5) AS blk, 2 AS pass FROM names
),
matched AS (
  SELECT DISTINCT a.nationkey, a.name AS name_a, b.name AS name_b,
         CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev_dist,
         a.mult AS n_a, b.mult AS n_b,
         a.rep_key AS rep_a, b.rep_key AS rep_b
  FROM tagged a JOIN tagged b
    ON a.nationkey = b.nationkey AND a.blk = b.blk AND a.pass = b.pass
   AND a.name < b.name
  WHERE levenshtein(a.name, b.name) <= {_ER_LEV_MAX}
)"""


ENTITY_MATCH_SQL = _ER_PAIR_CTES + """
SELECT nationkey, name_a, name_b, lev_dist,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(n_a * n_b AS BIGINT) AS n_record_pairs,
       rep_a, rep_b
FROM matched
ORDER BY nationkey, name_a, name_b
"""


ENTITY_GROUPS_SQL = _ER_PAIR_CTES + """,
edges AS (
  SELECT rep_a AS src, rep_b AS dst FROM matched
  UNION ALL
  SELECT rep_b AS src, rep_a AS dst FROM matched
),
reach(a, b) AS (
  SELECT DISTINCT src AS a, src AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
),
comp AS (SELECT a AS rep_key, MIN(b) AS cluster_id FROM reach GROUP BY a)
SELECT n.nationkey, n.name, n.rep_key,
       COALESCE(c.cluster_id, n.rep_key) AS entity_id,
       COALESCE(c.cluster_id, n.rep_key) = n.rep_key AS is_canonical,
       CAST(n.mult AS BIGINT) AS n_records
FROM names n LEFT JOIN comp c USING (rep_key)
ORDER BY n.nationkey, n.name
"""


# Join-key skew audit targets: the fact-side keys whose distribution
# decides shuffle-partition sizing and salting at scale.
_SKEW_SPECS = (
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
)


def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key distribution audit (NEW round 12): per audited fact key,
    row count, distinct-key count, mean/max per-key multiplicity, the
    skew ratio (max/mean), and the hottest key — the numbers that decide
    ``spark.sql.shuffle.partitions`` sizing, AQE skew-join thresholds and
    whether a key needs salting BEFORE a 100-TB join melts an executor
    (the join_salted_skew operator is the cure; this is the diagnosis).

    Scale shape: one distinct-key collapse per spec (the
    referential_integrity discipline — the shuffle carries keys, not
    rows), then every statistic is a 1-row aggregate over the key frame;
    the hot key is max_by on (multiplicity, −key) — deterministic
    tie-break to the smallest key, no sort of the key frame. Integer
    counts; the two ratios divide once and round at 6."""
    parts = []
    for fact, key in _SKEW_SPECS:
        km = (
            load(spark, fact, sf_dir)
            .filter(F.col(key).isNotNull())
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("mult"))
        )
        agg = km.agg(
            F.coalesce(F.sum("mult"), F.lit(0)).cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("mult").cast("long").alias("max_mult"),
            F.max_by(
                "k", F.struct(F.col("mult").alias("m"), (-F.col("k")).alias("nk"))
            ).alias("hot_key"),
        )
        parts.append(
            agg.select(
                F.lit(fact).alias("fact_table"),
                F.lit(key).alias("key_col"),
                "n_rows",
                F.col("n_keys").cast("long").alias("n_keys"),
                F.when(
                    F.col("n_keys") > 0,
                    F.round(
                        F.col("n_rows").cast("double") / F.col("n_keys"), 6
                    ),
                ).alias("avg_mult"),
                "max_mult",
                F.when(
                    F.col("n_rows") > 0,
                    F.round(
                        F.col("max_mult")
                        * F.col("n_keys").cast("double")
                        / F.col("n_rows"),
                        6,
                    ),
                ).alias("skew_ratio"),
                F.col("hot_key").cast("long").alias("hot_key"),
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out.orderBy("fact_table", "key_col")


def _skew_audit_sql() -> str:
    selects = []
    for fact, key in _SKEW_SPECS:
        selects.append(f"""
SELECT * FROM (
  WITH km AS (SELECT {key} AS k, COUNT(*) AS mult FROM {fact}
              WHERE {key} IS NOT NULL GROUP BY 1)
  SELECT '{fact}' AS fact_table, '{key}' AS key_col,
         CAST(COALESCE(SUM(mult), 0) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CASE WHEN COUNT(*) > 0
              THEN ROUND(CAST(COALESCE(SUM(mult), 0) AS DOUBLE) / COUNT(*), 6)
         END AS avg_mult,
         CAST(MAX(mult) AS BIGINT) AS max_mult,
         CASE WHEN COALESCE(SUM(mult), 0) > 0
              THEN ROUND(MAX(mult) * CAST(COUNT(*) AS DOUBLE)
                         / COALESCE(SUM(mult), 0), 6)
         END AS skew_ratio,
         CAST((SELECT k FROM km ORDER BY mult DESC, k ASC LIMIT 1) AS BIGINT)
           AS hot_key
  FROM km
)"""
        )
    return "\nUNION ALL\n".join(selects) + "\nORDER BY fact_table, key_col"


SKEW_AUDIT_SQL = _skew_audit_sql()


# Reconciliation tolerance in cents: header total vs the sum of its lines.
_RECON_TOL_CENTS = 1


def order_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation audit (NEW round 12): does each order
    header's o_totalprice equal the sum of its lineitem revenue
    (extendedprice · (1−discount) · (1+tax))? One summary row — orders
    checked, orders with no lines, orders reconciled within 1 cent, the
    worst absolute gap, and both grand totals — the finance-grade
    consistency gate between a fact and its rollup header (on the
    synthetic fixture the generator draws totals independently, so the
    audit honestly reports zero reconciled; the op exists for corpora
    where the identity is supposed to hold).

    Money discipline (the abc_pareto lesson): every amount becomes
    integer CENTS per ROW (floor(x·100 + 0.5) on the per-line revenue
    and the header), so all sums are order-free longs and the comparison
    is exact cross-engine. Scale shape: one hash agg collapses lineitem
    to per-order cents (distinct-key frame), one join to headers, one
    1-row aggregate. Since round 15 the pieces are shared with the
    TWENTY-SECOND incremental path (`reconciliation_from_state`): the
    cents expressions, the per-order collapse and the final report
    aggregate are single definitions, so the batch and maintained faces
    cannot disagree."""
    lines = recon_line_partials(
        load(spark, "lineitem", sf_dir)
    ).groupBy(F.col("k")).agg(F.sum("line_cents").alias("line_cents"))
    hdr = recon_order_partials(load(spark, "orders", sf_dir)).select(
        "k", "hdr_cents"
    )
    return _recon_report(hdr.join(lines, "k", "left"))


def _recon_line_cents() -> F.Column:
    """Per-line integer cents — THE line-revenue definition (batch audit
    and the 22nd path's ingest partials share it)."""
    return F.floor(
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
        * 100
        + F.lit(0.5)
    ).cast("long")


def recon_line_partials(li: DataFrame) -> DataFrame:
    """Per-order additive lineitem partials (k, line_cents, n_lines) from
    lineitem-shaped rows — aggregation pushed below any join, so state
    appends are order-mass, never lineitem-mass."""
    return (
        li.filter(F.col("l_orderkey").isNotNull())
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(
            F.sum(_recon_line_cents()).alias("line_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def recon_order_partials(orders: DataFrame) -> DataFrame:
    """Header partials (k, hdr_cents, hdr_n) — hdr_n makes the merged
    state self-describing (an order is 'stated' iff hdr_n > 0)."""
    return orders.filter(F.col("o_orderkey").isNotNull()).select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("hdr_cents"),
        F.lit(1).cast("long").alias("hdr_n"),
    )


def merge_recon_partials(state: DataFrame) -> DataFrame:
    """Collapse appended partials to one row per order — every column is
    an additive integer sum, so ANY batch split / arrival order / replay
    state merges to the same frame (the mergeable-sums IVM class)."""
    return state.groupBy("k").agg(
        F.sum("hdr_cents").alias("hdr_cents"),
        F.sum("hdr_n").alias("hdr_n"),
        F.sum("line_cents").alias("line_cents"),
        F.sum("n_lines").alias("n_lines"),
    )


def reconciliation_from_state(state: DataFrame) -> DataFrame:
    """The audit served from the 22nd path's maintained partials: merge,
    keep stated orders (hdr_n > 0 — lines whose header never arrived stay
    pending, exactly the batch face's header-driven left join), and map
    n_lines = 0 back to the batch face's NULL line_cents (an order with
    no lines is 'unmatched', not 'sums to zero'). ≡
    ``order_reconciliation_audit`` over everything ingested."""
    m = merge_recon_partials(state).filter(F.col("hdr_n") > 0)
    j = m.select(
        "hdr_cents",
        F.when(F.col("n_lines") == 0, F.lit(None).cast("long"))
        .otherwise(F.col("line_cents"))
        .alias("line_cents"),
    )
    return _recon_report(j)


def _recon_report(j: DataFrame) -> DataFrame:
    """One-row reconciliation report over a (hdr_cents, line_cents) frame
    — the single final-aggregate definition both faces share."""
    diff = F.abs(F.col("hdr_cents") - F.col("line_cents"))
    return j.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("line_cents").isNull(), 1)).alias("n_no_lines"),
        F.count(F.when(diff <= _RECON_TOL_CENTS, 1)).alias("n_reconciled"),
        F.max(diff).cast("long").alias("max_gap_cents"),
        F.coalesce(F.sum("hdr_cents"), F.lit(0)).cast("long").alias("total_header_cents"),
        F.coalesce(F.sum("line_cents"), F.lit(0)).cast("long").alias("total_line_cents"),
    )


ORDER_RECON_SQL = f"""
WITH lines AS (
  SELECT l_orderkey AS k,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                             * (1.0 + l_tax) * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS line_cents
  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
),
j AS (
  SELECT CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS hdr_cents,
         l.line_cents
  FROM orders o LEFT JOIN lines l ON l.k = o.o_orderkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(CASE WHEN line_cents IS NULL THEN 1 END) AS BIGINT)
         AS n_no_lines,
       CAST(COUNT(CASE WHEN ABS(hdr_cents - line_cents) <= {_RECON_TOL_CENTS}
                       THEN 1 END) AS BIGINT) AS n_reconciled,
       CAST(MAX(ABS(hdr_cents - line_cents)) AS BIGINT) AS max_gap_cents,
       CAST(COALESCE(SUM(hdr_cents), 0) AS BIGINT) AS total_header_cents,
       CAST(COALESCE(SUM(line_cents), 0) AS BIGINT) AS total_line_cents
FROM j
"""


QUERIES = {
    "table_profile": table_profile,
    "referential_integrity_audit": referential_integrity_audit,
    "data_freshness_audit": data_freshness_audit,
    "events_coverage_audit": events_coverage_audit,
    "entity_match_candidates": entity_match_candidates,
    "entity_resolution_groups": entity_resolution_groups,
    "join_key_skew_audit": join_key_skew_audit,
    "order_reconciliation_audit": order_reconciliation_audit,
}

ORACLES = {
    "table_profile": TABLE_PROFILE_SQL,
    "referential_integrity_audit": RI_AUDIT_SQL,
    "data_freshness_audit": FRESHNESS_SQL,
    "events_coverage_audit": COVERAGE_AUDIT_SQL,
    # round 12: blocked record-linkage candidates (two-pass blocking)
    "entity_match_candidates": ENTITY_MATCH_SQL,
    # round 12: transitive entity clusters (recursive-CTE closure oracle)
    "entity_resolution_groups": ENTITY_GROUPS_SQL,
    # round 12: shuffle/salting diagnosis (distinct-key collapse per spec)
    "join_key_skew_audit": SKEW_AUDIT_SQL,
    # round 12: header-vs-lines reconciliation in integer cents
    "order_reconciliation_audit": ORDER_RECON_SQL,
}
