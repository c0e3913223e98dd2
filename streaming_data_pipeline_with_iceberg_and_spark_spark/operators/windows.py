"""Window-function operators (SURVEY.md §2.5, W1-W5).

All stock ``pyspark.sql.Window``. Every ordering includes a unique tiebreaker
(custkey / orderkey / event_id) so results are deterministic under the
driver's hash compare. Partition keys are the natural distribution keys
(nation, customer, user) — at 100 TB each window is one shuffle on its
partition key; no global windows (an ``orderBy`` without ``partitionBy``
funnels everything to one task and is banned in this module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number / rank / dense_rank per nation by acctbal."""
    cust = load(spark, "customer", sf_dir)
    w_tie = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    w_val = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return cust.select(
        "c_nationkey",
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.row_number().over(w_tie).alias("rn"),
        F.rank().over(w_val).alias("rnk"),
        F.dense_rank().over(w_val).alias("drnk"),
    )


WINDOW_RANK_SQL = """
SELECT c_nationkey, c_custkey,
       ROUND(c_acctbal, 2) AS acctbal,
       ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
       RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
FROM customer
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead per user ordered by event time (speed-delta pattern —
    the reference's ``sudden_braking`` flag computed properly)."""
    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
        (F.lead("ts").over(w).cast("long") - F.col("ts").cast("long")).alias(
            "secs_to_next"
        ),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT user_id, event_id, value,
       LAG(value)  OVER w AS prev_value,
       ROUND(value - LAG(value) OVER w, 2) AS value_delta,
       CAST(floor(epoch(LEAD(ts) OVER w)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) AS secs_to_next
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: cumulative sum per customer over order history."""
    orders = load(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count("*").over(w).alias("order_seq"),
    )


WINDOW_RUNNING_SUM_SQL = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER w, 2) AS running_spend,
       COUNT(*) OVER w AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: sliding row frame — 3-event moving average per user."""
    ev = load(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("moving_avg3"),
        F.count("*").over(w).alias("frame_size"),
    )


WINDOW_MOVING_AVG_SQL = """
SELECT user_id, event_id,
       ROUND(AVG(value) OVER w, 6) AS moving_avg3,
       COUNT(*) OVER w AS frame_size
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def window_range_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: range frame on event time — 30-day trailing spend per customer.
    Spark range frames need a numeric ordering column → epoch seconds."""
    orders = load(spark, "orders", sf_dir).withColumn(
        "epoch_s", F.col("o_orderdate").cast("long")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_s")
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
        F.count("*").over(w).alias("n_orders_30d"),
    )


WINDOW_RANGE_30D_SQL = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER w, 2) AS spend_30d,
       COUNT(*) OVER w AS n_orders_30d
FROM (SELECT *, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_s
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
"""


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: top-3 orders per customer by price (row_number ≤ k pattern)."""
    orders = load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, rn
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
"""


def window_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: ntile / percent_rank / cume_dist over account balance.

    Scale note (measured 4.2× time at 100× data — sub-linear, 1.0 s): the
    5-value mktsegment key puts each segment's sort on one task. All three
    functions are pure functions of (global rank, group total) under this
    unique ORDER BY, so at sizes where a segment outgrows a task they
    derive from the adaptive distributed-selection ranking pattern of
    ``analytics._disc_median_select`` with no semantic change."""
    cust = load(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


WINDOW_NTILE_SQL = """
SELECT c_mktsegment, c_custkey,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: first_value / last_value / nth_value over the full partition."""
    ev = load(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


WINDOW_FIRST_LAST_SQL = """
SELECT user_id, event_id,
       FIRST_VALUE(event_type) OVER w AS first_type,
       LAST_VALUE(event_type)  OVER w AS last_type,
       NTH_VALUE(event_type, 2) OVER w AS second_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


_SESSION_GAP_S = 1800  # 30-minute inactivity gap


def session_rollup(ev: DataFrame, round_value: bool = True) -> DataFrame:
    """THE gap-sessionization pass over an event frame — shared by the
    batch ``sessionize`` face and the incremental sessions ingest (which
    runs it per micro-batch and stitches across the boundary), so the two
    paths cannot drift. lag → gap flag → running-sum session id → per-
    session rollup; all on the user_id shuffle key. With
    ``round_value=False`` the session value stays the RAW sum (the
    mergeable partial the incremental path stores; rounding happens once
    at serve — the rfm monetary discipline)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    with_session = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > _SESSION_GAP_S), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    vsum = F.sum("value")
    return with_session.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.round(vsum, 2) if round_value else vsum).alias("session_value"),
    )


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: batch sessionization by 30-minute inactivity gap —
    lag → gap flag → running sum session id → per-session rollup.
    Two window passes + one group-by, all on the user_id shuffle key."""
    return session_rollup(load(spark, "events", sf_dir))


def sessions_from_state(closed: DataFrame, open_state: DataFrame) -> DataFrame:
    """Serve the sessionized corpus from the incrementally-maintained pair
    (closed sessions log + per-user open-session boundary): union the open
    sessions as sessions-in-progress, assign each user's ordinal
    session_id by session_start order, and round the value once — equal
    row-for-row to batch ``sessionize`` over everything ingested (parity
    + hypothesis model in the test suite). Distinct sessions of one user
    are separated by >gap, so starts are strictly increasing and the
    ordinal is well-defined. The ranking window runs over SESSION-
    cardinality rows per user (bounded by activity, not event count);
    value_sum merges happened at stitch time, so one ROUND(2) here is the
    only finalization arithmetic."""
    open_rows = open_state.select(
        "user_id",
        "session_start",
        F.col("last_ts").alias("session_end"),
        "n_events",
        "value_sum",
    )
    allr = closed.select(
        "user_id", "session_start", "session_end", "n_events", "value_sum"
    ).unionByName(open_rows)
    w = Window.partitionBy("user_id").orderBy("session_start")
    return allr.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_id"),
        "n_events",
        "session_start",
        "session_end",
        F.round("value_sum", 2).alias("session_value"),
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT *,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR floor(epoch(ts)) - floor(epoch(LAG(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       ROUND(SUM(value), 2) AS session_value
FROM sess
GROUP BY user_id, session_id
"""


# Interval-overlap report size + the length-prune probe width (the
# _OVL_PROBE longest sessions seed the exact lower bound).
_OVL_TOPK = 20
_OVL_PROBE = 100
# Candidate-blocking granularity in epoch-µs (r16 optimization round,
# guide §2.1/§3): HOUR buckets instead of calendar days. Bucket width only
# affects which pairs are EVALUATED, never the result — two sessions
# overlap ⟺ they share the bucket containing max(st_a, st_b), and
# multi-bucket double-matches dedupe on the pair key — so a finer grain
# trades a ~(en−st)/width explode factor for a quadratic drop in
# per-bucket pair work (measured at sf0.1, 95,465 sessions: 304.1M
# day-bucket join rows evaluated → 13.1M hour-bucket ones, a 23× cut,
# while the exploded input grows only 95.5k → 96.6k rows — the same
# 20-row answer either way).
_OVL_BUCKET_US = 3_600_000_000


def join_session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval-overlap SELF-join on the SHARED session
    definition (NEW round 15): the top-{k} longest pairwise overlaps
    between different users' sessions — the interval×interval join face
    (J6's range join matches a POINT into an interval; this matches
    intervals into intervals), the shape behind co-presence analytics,
    meeting detection and resource-contention audits.

    Scale shape — two layers, both load-bearing. (1) Bucketing: each
    session explodes to the ``_OVL_BUCKET_US``-wide time buckets it
    touches, the join is an EQUI-join on bucket with the overlap
    predicate as a post-filter, and multi-bucket double-matches dedupe
    on the pair key — never a nested-loop over |sessions|². The
    candidate join's inputs are explicitly repartitioned on the bucket
    key at a PINNED width (r16 optimization round, guide §2.1): the
    exploded frames are a few MB even when the pair filter inside the
    join evaluates tens of millions of rows, so AQE's byte-based
    coalescing — blind to the join's explode factor — used to collapse
    the whole pair evaluation into ONE task (measured 5.8 s serial at
    sf0.1); a repartition-by-num is exempt from coalescing and the join
    reuses its partitioning, so the pair work spreads across the
    cluster at any data:core ratio. (2) LENGTH PRUNING kills the
    quadratic-in-co-presence ambush (dense buckets make all-pairs
    explode): overlap(a,b) ≤ min(len_a, len_b), so every global top-k
    pair has BOTH lengths ≥ L, where L = the k-th best overlap among
    the ``_OVL_PROBE`` longest sessions (a broadcast probe frame whose
    pairwise overlaps lower-bound the answer). Only sessions of length
    ≥ L enter the bucket join — provably exact, and the denser the
    co-presence the HIGHER L climbs (measured: the 10× sweep dropped
    from 6.8× to ~1× after the prune). L = 0 (fewer than k probe
    overlaps) falls back to the full join. Overlap arithmetic is exact
    integer epoch-µs; ties break on the full pair key.""".format(
        k=_OVL_TOPK
    )
    # persisted: the probe, the bound and the candidate join all re-read
    # the sessionized frame (checkpoint_release frees it on return)
    sess = session_rollup(load(spark, "events", sf_dir)).select(
        "user_id",
        "session_id",
        F.unix_micros("session_start").alias("st"),
        F.unix_micros("session_end").alias("en"),
    ).persist()

    def overlap_pairs(frame_a: DataFrame, bcast: bool = False) -> DataFrame:
        a = frame_a.select(
            F.col("user_id").alias("ua"), F.col("session_id").alias("sa"),
            F.col("st").alias("sta"), F.col("en").alias("ena"), "bkt",
        )
        b = frame_a.select(
            F.col("user_id").alias("ub"), F.col("session_id").alias("sb"),
            F.col("st").alias("stb"), F.col("en").alias("enb"), "bkt",
        )
        if bcast:
            joined = a.join(F.broadcast(b), "bkt")
        else:
            # pinned-width repartition on the join key: see the docstring —
            # keeps AQE from serializing the explode-heavy pair filter
            p = frame_a.sparkSession.sparkContext.defaultParallelism
            joined = a.repartition(p, "bkt").join(b.repartition(p, "bkt"), "bkt")
        return (
            joined
            .filter(
                (F.col("ua") < F.col("ub"))
                & (F.col("sta") <= F.col("enb"))
                & (F.col("stb") <= F.col("ena"))
            )
            .select(
                "ua", "sa", "ub", "sb",
                (
                    F.least("ena", "enb") - F.greatest("sta", "stb")
                ).alias("overlap_us"),
            )
            .distinct()
        )

    def bucketed(frame: DataFrame) -> DataFrame:
        # st/en are non-negative epoch-µs longs, so integer DIV is floor
        return frame.select(
            "user_id", "session_id", "st", "en",
            F.explode(
                F.expr(
                    f"sequence(st div {_OVL_BUCKET_US},"
                    f" en div {_OVL_BUCKET_US})"
                )
            ).alias("bkt"),
        )

    probe = (
        sess.orderBy(
            F.desc(F.col("en") - F.col("st")),
            F.asc("user_id"), F.asc("session_id"),
        )
        .limit(_OVL_PROBE)
    )
    wl = Window.partitionBy().orderBy(F.desc("overlap_us"))
    lbound = (
        overlap_pairs(bucketed(probe), bcast=True)
        .withColumn("rk", F.row_number().over(wl))
        .filter(F.col("rk") == _OVL_TOPK)
        .select(F.col("overlap_us").alias("lb"))
        .unionByName(
            sess.sparkSession.createDataFrame([(0,)], "lb long")
        )
        .agg(F.max("lb").alias("lb"))
    )
    cand = sess.crossJoin(F.broadcast(lbound)).filter(
        (F.col("en") - F.col("st")) >= F.col("lb")
    )
    pairs = overlap_pairs(bucketed(cand))
    out = (
        pairs.orderBy(
            F.desc("overlap_us"), F.asc("ua"), F.asc("sa"),
            F.asc("ub"), F.asc("sb"),
        )
        .limit(_OVL_TOPK)
        .select(
            F.col("ua").alias("user_a"),
            F.col("sa").alias("session_a"),
            F.col("ub").alias("user_b"),
            F.col("sb").alias("session_b"),
            "overlap_us",
        )
    )
    from ..io import checkpoint_release

    return checkpoint_release(out, sess)


SESSION_OVERLAP_SQL = f"""
WITH sessions AS ({{sessionize_sql}}),
sess AS (
  SELECT user_id, session_id,
         epoch_us(session_start) AS st, epoch_us(session_end) AS en,
         CAST(session_start AS DATE) AS d0, CAST(session_end AS DATE) AS d1
  FROM sessions
),
probe AS (
  SELECT * FROM sess
  ORDER BY en - st DESC, user_id ASC, session_id ASC LIMIT {_OVL_PROBE}
),
probe_b AS (
  SELECT user_id, session_id, st, en, CAST(gs.day AS DATE) AS day
  FROM probe, LATERAL (
    SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  ) gs
),
probe_pairs AS (
  SELECT DISTINCT a.user_id AS ua, a.session_id AS sa,
         b.user_id AS ub, b.session_id AS sb,
         LEAST(a.en, b.en) - GREATEST(a.st, b.st) AS overlap_us
  FROM probe_b a JOIN probe_b b ON b.day = a.day
  WHERE a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
),
lbound AS (
  SELECT MAX(lb) AS lb FROM (
    SELECT overlap_us AS lb FROM (
      SELECT overlap_us,
             ROW_NUMBER() OVER (ORDER BY overlap_us DESC) AS rk
      FROM probe_pairs
    ) WHERE rk = {_OVL_TOPK}
    UNION ALL SELECT 0
  )
),
cand AS (SELECT s.* FROM sess s, lbound WHERE s.en - s.st >= lbound.lb),
bucketed AS (
  SELECT user_id, session_id, st, en, CAST(gs.day AS DATE) AS day
  FROM cand, LATERAL (
    SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  ) gs
),
pairs AS (
  SELECT DISTINCT
         a.user_id AS user_a, a.session_id AS session_a,
         b.user_id AS user_b, b.session_id AS session_b,
         LEAST(a.en, b.en) - GREATEST(a.st, b.st) AS overlap_us
  FROM bucketed a JOIN bucketed b ON b.day = a.day
  WHERE a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
)
SELECT user_a, session_a, user_b, session_b,
       CAST(overlap_us AS BIGINT) AS overlap_us
FROM pairs
ORDER BY overlap_us DESC, user_a, session_a, user_b, session_b
LIMIT {_OVL_TOPK}
"""


def scd2_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension type-2 build (NEW round 12; Kimball's
    SCD2 — the warehouse pattern behind every versioned dimension): fold
    each user's event stream into attribute-version rows. The tracked
    attribute is the user's current activity state (event_type);
    consecutive duplicates collapse (a repeated state is NOT a new
    version — the classic SCD2 change-detection rule), each surviving
    change opens a version with valid_from = its timestamp and
    valid_to = the next version's valid_from (half-open periods; NULL =
    still current), is_current flags the open row, version numbers are
    1-based per user.

    Scale shape: ONE user-keyed shuffle; the change-detection lag, the
    validity lead and the version row_number all ride the same
    (user_id × (ts, event_id)) window partitioning — Catalyst plans one
    Sort + three window functions, no second exchange. Deterministic:
    the (ts, event_id) order key is unique."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("state"),
        F.lag("event_type").over(w).alias("_prev"),
    ).filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("state")))
    return changes.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    ).orderBy("user_id", "version")


def scd2_from_state(closed: DataFrame, open_state: DataFrame) -> DataFrame:
    """Serve the SCD2 dimension from the incrementally-maintained pair
    (closed-versions log + per-user open-version boundary) — the
    SIXTEENTH incremental path (round 13), boundary-state class like
    sessions.  Union the open rows as current versions (valid_to NULL),
    project the batch face's columns — equal row-for-row to
    ``scd2_from_events`` over everything ingested (parity + replay +
    late-data tests in tests/test_streaming.py).  Version numbers were
    assigned at stitch time, so serving is a pure union + projection:
    no window, no shuffle beyond the scan."""
    ts_type = dict(open_state.dtypes)["valid_from"]
    open_rows = open_state.select(
        "user_id",
        "version",
        "state",
        "valid_from",
        F.lit(None).cast(ts_type).alias("valid_to"),
    )
    allr = closed.select(
        "user_id", "version", "state", "valid_from", "valid_to"
    ).unionByName(open_rows)
    return allr.select(
        "user_id",
        "version",
        "state",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    ).orderBy("user_id", "version")


SCD2_SQL = """
WITH ev AS (
  SELECT user_id, ts, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL AND event_id IS NOT NULL
),
changes AS (
  SELECT user_id, ts, event_id, event_type AS state
  FROM (
    SELECT *, LAG(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS _prev
    FROM ev
  )
  WHERE _prev IS NULL OR _prev != event_type
)
SELECT user_id,
       ROW_NUMBER() OVER w AS version,
       state,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       LEAD(ts) OVER w IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
"""


def scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textbook SCD2 CONSUMPTION query (NEW round 13): resolve each
    purchase event against the versioned dimension — which activity-state
    version was current when the user purchased (half-open period match:
    valid_from ≤ ts < valid_to, NULL valid_to = still open).  This is the
    query the dimension exists FOR; every fact-to-dimension join in a
    Kimball warehouse is this shape.

    Composes ``scd2_from_events`` (ONE dimension definition — the
    maintained ``scd2_from_state`` serves the same frame at ingest).
    Every purchase resolves to exactly ONE version (periods partition the
    user's timeline from their first event) — uniqueness is the test-
    pinned invariant.

    Scale shape: one user-keyed join; versions per user are bounded by
    that user's state changes, so the per-key match work is tiny and the
    period predicate prunes to one row. At 100 TB both sides bucket on
    user_id — the standard co-located fact⋈dimension layout."""
    dim = scd2_from_events(spark, sf_dir)
    ev = load(spark, "events", sf_dir).filter(
        (F.col("event_type") == "purchase")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    return (
        ev.select("event_id", "user_id", "ts")
        .join(dim, "user_id")
        .filter(
            (F.col("valid_from") <= F.col("ts"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select("event_id", "user_id", "ts", "version", "state")
    )


SCD2_ASOF_SQL = f"""
WITH dim AS ({SCD2_SQL}),
ev AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL
    AND ts IS NOT NULL AND event_id IS NOT NULL
)
SELECT ev.event_id, ev.user_id, ev.ts, dim.version, dim.state
FROM ev JOIN dim USING (user_id)
WHERE dim.valid_from <= ev.ts
  AND (dim.valid_to IS NULL OR ev.ts < dim.valid_to)
"""


QUERIES = {
    "scd2_from_events": scd2_from_events,
    "scd2_asof_lookup": scd2_asof_lookup,
    "window_rank": window_rank,
    "window_lag_lead": window_lag_lead,
    "window_running_sum": window_running_sum,
    "window_moving_avg": window_moving_avg,
    "window_range_30d": window_range_30d,
    "window_topk_per_group": window_topk_per_group,
    "window_ntile_pct": window_ntile_pct,
    "window_first_last": window_first_last,
    "sessionize": sessionize,
    "join_session_overlap": join_session_overlap,
}

ORACLES = {
    # round 12: Kimball SCD2 versioning (change-collapse + validity lead)
    "scd2_from_events": SCD2_SQL,
    # round 13: the SCD2 consumption query (fact ⋈ versioned dimension)
    "scd2_asof_lookup": SCD2_ASOF_SQL,
    "window_rank": WINDOW_RANK_SQL,
    "window_lag_lead": WINDOW_LAG_LEAD_SQL,
    "window_running_sum": WINDOW_RUNNING_SUM_SQL,
    "window_moving_avg": WINDOW_MOVING_AVG_SQL,
    "window_range_30d": WINDOW_RANGE_30D_SQL,
    "window_topk_per_group": WINDOW_TOPK_SQL,
    "window_ntile_pct": WINDOW_NTILE_SQL,
    "window_first_last": WINDOW_FIRST_LAST_SQL,
    "sessionize": SESSIONIZE_SQL,
    # round 15: bucketed interval-overlap self-join on the shared sessions
    "join_session_overlap": SESSION_OVERLAP_SQL.format(sessionize_sql=SESSIONIZE_SQL),
}
