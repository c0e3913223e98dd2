"""Product-analytics operators over the event stream: funnel conversion and
cohort retention — the two query shapes every event-analytics engine ships.

Scale-first design: the funnel is ONE groupBy(user) pass with the stage
logic as array expressions (the textbook formulation — one min-join per
stage — re-scans and re-shuffles the fact once per stage); retention is one
user-keyed aggregation plus one small distinct. The reference has no
analytics layer at all (its one query is an enrichment projection,
spark_job.py:156-164); these extend the engine the same way the dedup/text
ops do, with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import md5_bucket16, md5_bucket32
from ..io import (
    checkpoint_release,
    compact_checkpoint,
    load,
    load_spread,
    parquet_row_count,
)

_FUNNEL = ["view", "click", "purchase"]


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: a user converts stage k only
    with an event strictly after their stage-(k-1) conversion time. One
    shuffle total: per-user sorted timestamp arrays per stage, then the
    "first event after t" lookups are array expressions — no re-joining the
    fact per stage, which at 100 TB would triple the shuffle volume."""
    ev = load(spark, "events", sf_dir).filter(F.col("event_type").isin(_FUNNEL))
    per_user = ev.groupBy("user_id").agg(
        *[
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == t, F.col("ts"))
                )
            ).alias(f"ts_{t}")
            for t in _FUNNEL
        ]
    )
    # try_element_at: a stage with no qualifying event yields an EMPTY
    # array, and under Spark 4's default ANSI mode element_at(empty, 1)
    # is an ERROR, not NULL — a view-only user would crash the funnel
    # (latent until a sparse fixture exposed it; regression test in
    # tests/test_extensions.py::test_funnel_latency_hand_computed)
    t1 = F.try_element_at("ts_view", F.lit(1))
    t2 = F.try_element_at(F.filter("ts_click", lambda c: c > t1), F.lit(1))
    t3 = F.try_element_at(F.filter("ts_purchase", lambda p: p > t2), F.lit(1))
    staged = per_user.select(
        t1.alias("t1"), t2.alias("t2"), t3.alias("t3")
    ).agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    return staged.select(
        F.explode(
            F.array(
                F.struct(F.lit("1_view").alias("stage"), F.col("n1").alias("n_users")),
                F.struct(F.lit("2_click").alias("stage"), F.col("n2").alias("n_users")),
                F.struct(
                    F.lit("3_purchase").alias("stage"), F.col("n3").alias("n_users")
                ),
            )
        ).alias("s")
    ).select("s.stage", "s.n_users")


# Shared funnel-stage CTEs: conversion counts AND conversion latency both
# interpolate this single definition, so the two oracles cannot disagree
# about what "converting stage k" means.
_FUNNEL_CTES = """v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY 1
)"""

FUNNEL_SQL = f"""
WITH {_FUNNEL_CTES}
SELECT '1_view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
UNION ALL
SELECT '2_click', (SELECT COUNT(*) FROM c)
UNION ALL
SELECT '3_purchase', (SELECT COUNT(*) FROM p)
"""


def funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per funnel step: exact DISCRETE median and p90 of
    the view→click and click→purchase latencies (µs), over the same
    stage definitions as :func:`funnel_conversion` — the "how fast do
    they convert" half of every funnel dashboard.

    Latencies are exact integer epoch-µs differences (the attribution
    idiom: ``unix_micros`` ≡ DuckDB ``epoch_us``), and the rank
    statistics are DISCRETE elements (rank ⌈n/2⌉ and ⌈0.9n⌉ in value
    order) selected from a VALUE HISTOGRAM — the `events_anomaly_mad`
    discipline: interpolation arithmetic is the one step two engines can
    disagree on at the last ulp, and a histogram rank-select's output
    depends only on per-value counts, never on tie order. Everything is
    integer arithmetic — cross-engine exact.

    Scale shape: the funnel staging is the same single user-keyed shuffle
    as funnel_conversion; the statistics pass is ONE hash-agg over the
    latency rows into a (step, lat) histogram plus cumulative windows
    over the histogram — the corpus is never sorted per step (a windowed
    per-step rank would serialize each step's converters onto one task;
    for a pathological all-distinct latency domain the
    `_disc_median_select` slicing strategy generalizes)."""
    ev = load(spark, "events", sf_dir).filter(F.col("event_type").isin(_FUNNEL))
    per_user = ev.groupBy("user_id").agg(
        *[
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == t, F.col("ts"))
                )
            ).alias(f"ts_{t}")
            for t in _FUNNEL
        ]
    )
    # try_element_at: a stage with no qualifying event yields an EMPTY
    # array, and under Spark 4's default ANSI mode element_at(empty, 1)
    # is an ERROR, not NULL — a view-only user would crash the funnel
    # (latent until a sparse fixture exposed it; regression test in
    # tests/test_extensions.py::test_funnel_latency_hand_computed)
    t1 = F.try_element_at("ts_view", F.lit(1))
    t2 = F.try_element_at(F.filter("ts_click", lambda c: c > t1), F.lit(1))
    t3 = F.try_element_at(F.filter("ts_purchase", lambda p: p > t2), F.lit(1))
    staged = per_user.select(t1.alias("t1"), t2.alias("t2"), t3.alias("t3"))
    lat = (
        staged.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("view_to_click").alias("step"),
                        (F.unix_micros("t2") - F.unix_micros("t1")).alias("lat"),
                    ),
                    F.struct(
                        F.lit("click_to_purchase").alias("step"),
                        (F.unix_micros("t3") - F.unix_micros("t2")).alias("lat"),
                    ),
                )
            ).alias("s")
        )
        .select("s.*")
        .filter(F.col("lat").isNotNull())
    )
    stats = _hist_rank_stats(lat, "step", "lat")
    return stats.select(
        "step",
        F.col("n").alias("n_converted"),
        F.col("median").alias("median_us"),
        F.col("p90").alias("p90_us"),
    )


def funnel_from_state(state: DataFrame) -> DataFrame:
    """Finalize the incrementally maintained per-user (t1, t2, t3) funnel
    state into the same stage-count frame ``funnel_conversion`` computes
    over the raw fact (parity test in tests/test_streaming.py) — three
    counts over a |users|-bounded table instead of a corpus scan."""
    agg = state.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(F.lit("1_view").alias("stage"), F.col("n1").alias("n_users")),
                F.struct(F.lit("2_click").alias("stage"), F.col("n2").alias("n_users")),
                F.struct(
                    F.lit("3_purchase").alias("stage"), F.col("n3").alias("n_users")
                ),
            )
        ).alias("s")
    ).select("s.stage", "s.n_users")


def funnel_latency_from_state(state: DataFrame) -> DataFrame:
    """Finalize the maintained funnel state into the same discrete
    median/p90 latency frame as :func:`funnel_latency` — the stats pass
    runs over the |users|-bounded state, never the fact."""
    lat = (
        state.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("view_to_click").alias("step"),
                        (F.unix_micros("t2") - F.unix_micros("t1")).alias("lat"),
                    ),
                    F.struct(
                        F.lit("click_to_purchase").alias("step"),
                        (F.unix_micros("t3") - F.unix_micros("t2")).alias("lat"),
                    ),
                )
            ).alias("s")
        )
        .select("s.*")
        .filter(F.col("lat").isNotNull())
    )
    stats = _hist_rank_stats(lat, "step", "lat")
    return stats.select(
        "step",
        F.col("n").alias("n_converted"),
        F.col("median").alias("median_us"),
        F.col("p90").alias("p90_us"),
    )


def _hist_rank_stats(vals: DataFrame, group: str, col: str) -> DataFrame:
    """Exact discrete (median, p90) per group from a value histogram —
    rank ⌈n/2⌉ / ⌈0.9n⌉ elements in value order, one hash-agg over the
    rows + cumulative windows over ≤distinct-count histogram rows per
    group. Shared by funnel_latency and session_stats (ONE rank-statistic
    definition). Output: (group, n, median, p90)."""
    hist = vals.groupBy(group, col).agg(F.count("*").alias("_c"))
    w = Window.partitionBy(group).orderBy(col)
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    tgt = hist.groupBy(group).agg(
        F.sum("_c").alias("n"),
        F.expr("(sum(_c) + 1) div 2").alias("_rm"),
        F.expr("(9 * sum(_c) + 9) div 10").alias("_r90"),
    )
    med = (
        cum.join(F.broadcast(tgt.select(group, "_rm")), group)
        .filter(
            (F.col("_cum") >= F.col("_rm"))
            & (F.col("_cum") - F.col("_c") < F.col("_rm"))
        )
        .select(group, F.col(col).alias("median"))
    )
    p90 = (
        cum.join(F.broadcast(tgt.select(group, "_r90")), group)
        .filter(
            (F.col("_cum") >= F.col("_r90"))
            & (F.col("_cum") - F.col("_c") < F.col("_r90"))
        )
        .select(group, F.col(col).alias("p90"))
    )
    return tgt.select(group, "n").join(med, group).join(p90, group)


def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-population health metrics: exact discrete median/p90 of
    events-per-session and session duration (whole seconds) over the
    SAME 30-minute-gap sessionization as the W5 operator (`sessionize`
    is called directly — one session definition) — the engagement-depth
    dashboard next to DAU/WAU/MAU.

    All values are integers (counts; floor-epoch-second differences) and
    the statistics are histogram rank-selects (`_hist_rank_stats`, shared
    with funnel_latency) — cross-engine exact. Scale: sessionize's one
    user-keyed shuffle, a 2-rows-per-session projection, one hash-agg +
    tiny cumulative windows."""
    from .windows import sessionize

    s = sessionize(spark, sf_dir)
    vals = (
        s.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("events_per_session").alias("metric"),
                        F.col("n_events").cast("long").alias("v"),
                    ),
                    F.struct(
                        F.lit("session_duration_s").alias("metric"),
                        (
                            F.col("session_end").cast("long")
                            - F.col("session_start").cast("long")
                        ).alias("v"),
                    ),
                )
            ).alias("s")
        )
        .select("s.*")
    )
    return _hist_rank_stats(vals, "metric", "v")


SESSION_STATS_SQL_TEMPLATE = """
WITH sess_out AS ({sessionize_sql}),
vals AS (
  SELECT 'events_per_session' AS metric, CAST(n_events AS BIGINT) AS v
  FROM sess_out
  UNION ALL
  SELECT 'session_duration_s',
         CAST(floor(epoch(session_end)) - floor(epoch(session_start)) AS BIGINT)
  FROM sess_out
),
hist AS (SELECT metric, v, COUNT(*) AS c FROM vals GROUP BY 1, 2),
cum AS (
  SELECT metric, v, c,
         SUM(c) OVER (PARTITION BY metric ORDER BY v) AS cum
  FROM hist
),
tgt AS (
  SELECT metric, CAST(SUM(c) AS BIGINT) AS n,
         (CAST(SUM(c) AS BIGINT) + 1) // 2 AS rm,
         (9 * CAST(SUM(c) AS BIGINT) + 9) // 10 AS r90
  FROM hist GROUP BY 1
)
SELECT t.metric, t.n, m.v AS median, p.v AS p90
FROM tgt t
JOIN cum m ON m.metric = t.metric AND m.cum >= t.rm AND m.cum - m.c < t.rm
JOIN cum p ON p.metric = t.metric AND p.cum >= t.r90 AND p.cum - p.c < t.r90
"""


FUNNEL_LATENCY_SQL = f"""
WITH {_FUNNEL_CTES},
lat AS (
  SELECT 'view_to_click' AS step, epoch_us(c.t2) - epoch_us(v.t1) AS lat
  FROM c JOIN v USING (user_id)
  UNION ALL
  SELECT 'click_to_purchase', epoch_us(p.t3) - epoch_us(c.t2)
  FROM p JOIN c USING (user_id)
),
hist AS (SELECT step, lat, COUNT(*) AS c FROM lat GROUP BY 1, 2),
cum AS (
  SELECT step, lat, c,
         SUM(c) OVER (PARTITION BY step ORDER BY lat) AS cum
  FROM hist
),
tgt AS (
  SELECT step, CAST(SUM(c) AS BIGINT) AS n_converted,
         (CAST(SUM(c) AS BIGINT) + 1) // 2 AS rm,
         (9 * CAST(SUM(c) AS BIGINT) + 9) // 10 AS r90
  FROM hist GROUP BY 1
)
SELECT t.step, t.n_converted, m.lat AS median_us, p.lat AS p90_us
FROM tgt t
JOIN cum m ON m.step = t.step AND m.cum >= t.rm AND m.cum - m.c < t.rm
JOIN cum p ON p.step = t.step AND p.cum >= t.r90 AND p.cum - p.c < t.r90
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-cohort retention curve: day-k retention = share of users with
    any event k days after their first event day. One user-keyed min, one
    (user, day) distinct, one small count — at scale both shuffles key on
    user_id so they share the exchange.

    Since round 9 the op is ``retention_from_activity ∘ activity_pairs``
    — the DISTINCT (user, day) activity table the incremental engagement
    ingest maintains is sufficient state for retention too (d0 is just
    the user's min activity day), so the dashboard serves from the
    |users|×|active-days|-bounded table with no extra ingest path. The
    shared ``activity_pairs`` pass means anonymous (NULL-user) and
    NULL-ts events are excluded, matching the engagement triple and the
    RFM scorer."""
    return retention_from_activity(
        activity_pairs(load(spark, "events", sf_dir))
    )


def retention_from_activity(act: DataFrame) -> DataFrame:
    """Retention finalization over a DISTINCT (user_id, day) activity
    frame — the batch op and the maintained-table serving face (parity
    test in tests/test_streaming.py)."""
    first = act.groupBy("user_id").agg(F.min("day").alias("d0"))
    total = first.agg(F.count("*").alias("cohort_size"))
    days = (
        act.join(first, "user_id")
        .select("user_id", F.datediff("day", "d0").cast("int").alias("day_k"))
        .distinct()
    )
    return (
        days.groupBy("day_k")
        .agg(F.count("*").alias("n_users"))
        .crossJoin(F.broadcast(total))
        .select(
            "day_k",
            "n_users",
            F.round(F.col("n_users") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("day_k")
    )


COHORT_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
), first AS (
  SELECT user_id, MIN(day) AS d0 FROM act GROUP BY 1
), days AS (
  SELECT DISTINCT a.user_id,
         CAST(date_diff('day', f.d0, a.day) AS INT) AS day_k
  FROM act a JOIN first f USING (user_id)
), total AS (
  SELECT COUNT(*) AS cohort_size FROM first
)
SELECT day_k, COUNT(*) AS n_users,
       ROUND(COUNT(*) / (SELECT cohort_size FROM total), 6) AS retention
FROM days
GROUP BY day_k
ORDER BY day_k
"""


# A windowed per-group median sorts each group on ONE task; beyond this
# group size a distributed plan wins (below it, it loses on fixed stage
# count). Tests force each path by monkeypatching this.
_MAD_MAX_WINDOWED_GROUP = 1_000_000
# Value domains at or below this distinct-count use the value-histogram
# median (one hash-agg over the corpus + tiny cumulative windows);
# quantile-literal slicing degenerates on duplicate-heavy domains (ties
# cannot straddle a slice, so one hot value = one task).
_MAD_HIST_MAX_DISTINCT = 65_536


def _disc_median_window(df, group: str, tie: str, col: str, out: str):
    """Discrete per-group median (rank ⌈n/2⌉ in (col, tie) order) via one
    ranking window per group — the small-group plan: fewest stages, each
    group sorted on one task."""
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(col, tie)
    grp = Window.partitionBy(group)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(grp))
        .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select(group, F.col(col).alias(out))
    )


def slice_bucket_expr(col: F.Column, bounds: list[float]) -> F.Column:
    """Quantile-slice index for a numeric column against SORTED literal
    boundaries: COUNT(bounds < value), as a chain of when-sums.

    Deliberately NOT the ``F.aggregate`` higher-order fold over an array
    literal: that form trips a Catalyst binding bug (INTERNAL_ERROR
    ATTRIBUTE_NOT_FOUND — the folded column reference is lost when the
    bucket expression is consumed from a groupBy branch of certain
    child plans; reproduced on Spark 4.1 with a cached repartitioned
    input during the r15 fill sweep, and it bit ALL three sliced-plan
    call sites).  The chained whens are semantically identical — bounds
    are ≤ 2·parallelism driver-collected literals — and stay inside
    whole-stage codegen.  Empty bounds (degenerate/all-NULL domain) →
    one slice; NULL values fold to slice 0 (nulls-first, matching the
    windowed twins)."""
    expr = F.lit(0)
    for b in bounds:
        expr = expr + F.when(col > F.lit(float(b)), 1).otherwise(0)
    return expr


def _disc_median_hist(df, group: str, tie: str, col: str, out: str):
    """Exact median from the value histogram: the corpus is touched by ONE
    hash-agg; the cumulative window runs over ≤ distinct-count rows per
    group — bounded by _MAD_HIST_MAX_DISTINCT at any scale. The tie column
    never matters here: the rank-⌈n/2⌉ element's VALUE depends only on the
    per-value counts."""
    from pyspark.sql import Window

    hist = df.groupBy(group, col).agg(F.count("*").alias("_c"))
    w_ord = Window.partitionBy(group).orderBy(col)
    cum = hist.withColumn("_cum", F.sum("_c").over(w_ord))
    tgt = hist.groupBy(group).agg(F.expr("(sum(_c) + 1) div 2").alias("_r"))
    # exactly the bucket containing rank r: cum ≥ r and cum-before < r
    # (selecting the row, not min(col), keeps a NULL median correct —
    # NULLs sort first, matching the windowed path)
    return (
        cum.join(F.broadcast(tgt), group)
        .filter(
            (F.col("_cum") >= F.col("_r"))
            & (F.col("_cum") - F.col("_c") < F.col("_r"))
        )
        .select(group, F.col(col).alias(out))
    )


def _disc_median_select(df, group: str, tie: str, col: str, out: str):
    """Exact distributed selection for huge groups: routes to the
    histogram plan when the value domain is small; otherwise slices the
    value domain at driver-collected approx-quantile literals so every
    group spans many tasks, ranks within slices, and adds broadcast
    per-slice offsets."""
    from pyspark.sql import Window

    nd = df.agg(F.approx_count_distinct(col)).first()[0] or 0
    if nd <= _MAD_HIST_MAX_DISTINCT:
        return _disc_median_hist(df, group, tie, col, out)
    n_part = max(df.sparkSession.sparkContext.defaultParallelism * 2, 8)
    # Slice boundaries are GLOBAL approx-quantiles of the value column,
    # collected ONCE to the driver (≤ n_part-1 doubles — bounded) and
    # inlined as literals. Deliberately NOT repartitionByRange: the
    # RangePartitioner re-samples boundaries per evaluation, and this
    # plan reads the sliced frame from three branches (join side,
    # per-slice counts, per-group targets) — offsets computed under one
    # set of boundaries added to ranks computed under another would
    # select a wrong element. Literal boundaries make consistency
    # intrinsic instead of hinging on exchange reuse.
    bounds = sorted(
        set(
            df.stat.approxQuantile(
                col, [i / n_part for i in range(1, n_part)], 0.001
            )
        )
    )
    # rows with equal values share a slice (strict >), so within a group
    # the (slice, value, tie) order equals the global (value, tie) order;
    # NULLs fold to slice 0, matching the windowed path's nulls-first.
    # Degenerate domain (all-NULL values → approxQuantile returns no
    # boundaries): one slice, exactly right for a one-point domain.
    keyed = df.withColumn("_bk", slice_bucket_expr(F.col(col), bounds))
    # slices are value-bounded, so these windows parallelize — with one
    # residual skew case: equal values cannot straddle a slice, so a
    # single value carrying more rows than a slice serializes ITS slice
    # even above the nd gate (a heavy hitter among many distincts).
    # Accepted and detectable from the cnts table below; the full fix is
    # tie-splitting by id ranges within the hot value.
    slice_w = Window.partitionBy("_bk", group).orderBy(col, tie)
    local = keyed.withColumn("_lrn", F.row_number().over(slice_w))
    cnts = local.groupBy("_bk", group).agg(F.count("*").alias("_c"))
    # global rank within a group = sum of earlier slices' counts + local
    # rank; the offset table is ≤ n_part × |groups| rows — broadcast
    off_w = (
        Window.partitionBy(group)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cnts.withColumn("_off", F.coalesce(F.sum("_c").over(off_w), F.lit(0)))
    tgt = cnts.groupBy(group).agg(F.expr("(sum(_c) + 1) div 2").alias("_r"))
    return (
        local.join(F.broadcast(offs.select("_bk", group, "_off")), ["_bk", group])
        .join(F.broadcast(tgt), group)
        .filter(F.col("_off") + F.col("_lrn") == F.col("_r"))
        .select(group, F.col(col).alias(out))
    )


# Entity frames at or below this row count keep the plain global-window
# NTILE (one task, fewest stages — and the form the SQL oracles are written
# in); above it the EXACT sliced-rank plan engages so no unpartitioned
# window ever sorts an unbounded entity frame on one task (the r9 verdict's
# order #3 for the three decile faces). Tests force the sliced path by
# monkeypatching this.
_NTILE_MAX_WINDOWED = 4_000_000


def adaptive_ntile(
    df,
    k: int,
    value_col: str,
    tie_col: str,
    out: str,
    descending: bool = False,
    est_rows: int | None = None,
):
    """EXACT NTILE(k) over (value, tie) order without a mandatory global
    single-task sort — the L9 adaptive-median treatment applied to the
    decile faces (events_rfm_segments, events_power_users_curve,
    corpus_novelty_curve).

    Contract: ``value_col`` numeric and non-NULL (every caller rounds /
    coalesces first — NULL ordering differs between engines anyway), and
    ``tie_col`` unique within the frame, so (value, tie) is a total order
    and BOTH plans compute the identical bucket for every row. Callers
    pass ``est_rows`` (a cheap upper bound — an approx_count_distinct over
    the raw fact's key column, or a plain count of the parent table) so
    the switch costs one bounded probe, not a recompute of the aggregated
    frame.

    Small frames: the plain ``F.ntile(k)`` global window — the
    oracle-checkable form, one task, fine to tens of millions of entities.
    Large frames: exact global rank from the quantile-literal slicing plan
    (rank within value slices + broadcast per-slice offsets — the
    ``_disc_median_select`` machinery, every slice parallel), then NTILE's
    closed form on the rank: with n rows, base = n div k and rem = n mod k,
    row rank r lands in bucket ⌈r/(base+1)⌉ while r ≤ (base+1)·rem, else
    rem + ⌈(r − (base+1)·rem)/base⌉ — integer arithmetic only, so the
    sliced path is bit-identical to the window path (pinned by
    tests/test_extensions.py forcing both on adversarial frames)."""
    from pyspark.sql import Window

    if est_rows is None or est_rows <= _NTILE_MAX_WINDOWED:
        order = [
            F.desc(value_col) if descending else F.asc(value_col),
            F.asc(tie_col),
        ]
        return df.withColumn(out, F.ntile(k).over(Window.orderBy(*order)))

    spark = df.sparkSession
    # signed probe column: slicing ascends in _v, which is descending in
    # value when descending=True — slice order then matches rank order.
    # _v is only ever compared to its own quantiles (a monotone transform
    # of the order), ranking inside slices uses the ORIGINAL column.
    keyed = df.withColumn(
        "_v",
        (-F.col(value_col)).cast("double")
        if descending
        else F.col(value_col).cast("double"),
    )
    n_part = max(spark.sparkContext.defaultParallelism * 2, 8)
    # literal boundaries, NOT repartitionByRange — the plan reads the
    # sliced frame from several branches and boundaries must be one set
    # (the _disc_median_select rationale, verbatim)
    bounds = sorted(
        set(
            keyed.stat.approxQuantile(
                "_v", [i / n_part for i in range(1, n_part)], 0.001
            )
        )
    )
    keyed = keyed.withColumn("_bk", slice_bucket_expr(F.col("_v"), bounds))
    slice_w = Window.partitionBy("_bk").orderBy(
        F.desc(value_col) if descending else F.asc(value_col), F.asc(tie_col)
    )
    local = keyed.withColumn("_lrn", F.row_number().over(slice_w))
    cnts = local.groupBy("_bk").agg(F.count("*").alias("_c"))
    off_w = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    # ≤ n_part+1 rows: the offset window and the total are driver-tiny
    offs = cnts.withColumn("_off", F.coalesce(F.sum("_c").over(off_w), F.lit(0)))
    total = cnts.agg(F.sum("_c").alias("_n"))
    r = F.col("_off") + F.col("_lrn")
    base = F.floor(F.col("_n") / k).cast("long")
    rem = (F.col("_n") - base * k).cast("long")
    cut = (base + 1) * rem
    # integer ceil(a/b) = (a + b − 1) div b; the otherwise branch only
    # evaluates for r > cut, which implies base ≥ 1, but greatest() keeps
    # the expression total under ANSI division
    ntile_expr = F.when(
        r <= cut,
        F.floor((r + (base + 1) - 1) / (base + 1)).cast("int"),
    ).otherwise(
        (
            rem
            + F.floor(
                (r - cut + F.greatest(base, F.lit(1)) - 1)
                / F.greatest(base, F.lit(1))
            )
        ).cast("int")
    )
    return (
        local.join(F.broadcast(offs.select("_bk", "_off")), "_bk")
        .crossJoin(F.broadcast(total))
        .withColumn(out, ntile_expr)
        .drop("_v", "_bk", "_lrn", "_off", "_n")
    )


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type outlier detection via median absolute deviation:
    flag values with |x − median| > 3·1.4826·MAD (1.4826 makes MAD a
    consistent σ estimator under normality; Leys et al. 2013). Mean/stddev
    z-scores break on the very outliers they hunt — the median/MAD pair is
    the standard robust substitute for metric-quality monitoring.

    Medians are DISCRETE (lower-middle element, rank ⌈n/2⌉ in value order),
    not interpolated — interpolation arithmetic is the one step two engines
    can disagree on at the last ulp, and a flag threshold is discontinuous
    in it. The median plan is ADAPTIVE — three exact strategies, picked
    from one cheap count-agg pass (plus a distinct-count probe when the
    big-group path engages):

    - small groups (≤ ``_MAD_MAX_WINDOWED_GROUP``): one ranking window per
      median — fewest stages, the right plan when every group fits a task;
    - huge groups, low-cardinality values (≤ ``_MAD_HIST_MAX_DISTINCT``
      distinct): VALUE-HISTOGRAM median — one (type, value) hash-agg over
      the corpus, then a cumulative window over the tiny histogram finds
      the bucket containing rank ⌈n/2⌉;
    - huge groups, high-cardinality values: distributed selection — slice
      the value domain at driver-collected approx-quantile literals so
      every type spans MANY tasks (the windowed plan sorts each type on
      ONE task: measured 51.9× time at 100× data), rank within the small
      value slices, then add per-slice offsets from a broadcastable
      (n_slices × n_types)-row count table. Residual skew risk, accepted
      and detectable from the slice-count table: equal values cannot
      straddle a slice, so a single value carrying >~1M rows serializes
      its slice — but such a value implies low effective cardinality,
      which routes to the histogram plan instead.

    All plans compute the identical discrete median (equivalence is
    pinned by a test that forces each path on the same input). For
    quantiles over unbounded groups where two passes are too many, the
    mergeable-histogram path (``agg_histogram_quantiles``) is the
    approximate twin; this op is the exact-math one."""
    ev = load(spark, "events", sf_dir).select("event_id", "event_type", "value")
    biggest = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("_n"))
        .agg(F.max("_n"))
        .first()[0]
        or 0
    )

    def _disc_median(df, col, out):
        fn = (
            _disc_median_window
            if biggest <= _MAD_MAX_WINDOWED_GROUP
            else _disc_median_select
        )
        return fn(df, "event_type", "event_id", col, out)

    med = _disc_median(ev, "value", "med")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    if biggest > _MAD_MAX_WINDOWED_GROUP:
        # the selection path reads dev three times (the approx-quantile
        # pass, the sliced-rank plan, and the final flag join) — materialize
        # once; the windowed path reads it twice and both are one cheap
        # stage, not worth an eager checkpoint job
        dev = dev.localCheckpoint(eager=True)
    mad = _disc_median(dev, "adev", "mad")
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.col("adev") > F.lit(3.0) * F.lit(1.4826) * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_anomalies"),
        )
    )


ANOMALY_MAD_SQL = """
WITH e AS (
  SELECT event_id, event_type, value FROM events
), r1 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e
), med AS (
  SELECT event_type, value AS med FROM r1 WHERE rn = (n + 1) // 2
), dev AS (
  SELECT e.event_id, e.event_type, m.med, ABS(e.value - m.med) AS adev
  FROM e JOIN med m USING (event_type)
), r2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type, adev AS mad FROM r2 WHERE rn = (n + 1) // 2
)
SELECT d.event_type,
       COUNT(*) AS n_events,
       ROUND(MIN(d.med), 6) AS med,
       ROUND(MIN(m.mad), 6) AS mad,
       CAST(SUM(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1
"""


# Co-occurrence knobs, interpolated into the oracle: per-user distinct-item
# cap (power-user pair-explosion guard — the analytics twin of the dedup
# inverted-index df cap) and the minimum co-count worth emitting.
_CO_USER_CAP = 40
_CO_MIN_COUNT = 2


def user_item_pairs(events: DataFrame) -> DataFrame:
    """DISTINCT (user_id, item) pairs from an events frame — the taste
    graph's atom, shared by the batch basket builder and the incremental
    co-occurrence ingest (the two paths cannot diverge on what counts as
    an interaction)."""
    return (
        events.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .filter(F.col("item").isNotNull() & F.col("user_id").isNotNull())
        .distinct()
    )


def baskets_from_items(ui: DataFrame, cap: int = _CO_USER_CAP) -> DataFrame:
    """Sorted distinct-item basket per user from (user_id, item) rows;
    users over ``cap`` distinct items are excluded WHOLE (pair-explosion
    guard)."""
    return (
        ui.groupBy("user_id")
        .agg(F.array_sort(F.collect_list("item")).alias("items"))
        .filter(F.size("items") <= cap)
    )


def _user_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One basket (sorted distinct-item array) per user, built by a single
    user-keyed shuffle over the event scan. Cached — several bounded aggs
    consume it within each caller's plan (co-occurrence, PageRank).
    EVERY caller must release this frame via ``checkpoint_release`` on its
    result (the rfm-slice discipline, analytics.py `events_rfm_segments`
    chain): a returned-lazy persist pins a user-cardinality CacheManager
    entry for the session's lifetime per call."""
    ev = load(spark, "events", sf_dir)
    return baskets_from_items(user_item_pairs(ev)).persist()


def basket_pair_rows(baskets: DataFrame) -> DataFrame:
    """One (item_a < item_b) row per user-pair, generated MAP-SIDE by
    array expressions over the baskets — no user_id self-join. Shared by
    the batch pair counter and the incremental delta path (ONE pair
    definition)."""
    pair_structs = F.flatten(
        F.transform(
            "items",
            lambda x, i: F.transform(
                F.slice("items", i + F.lit(2), F.size("items")),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    return baskets.select(F.explode(pair_structs).alias("p")).select(
        "p.item_a", "p.item_b"
    )


def _basket_pairs(baskets: DataFrame) -> DataFrame:
    """(item_a < item_b, co_users) pair counts over the baskets."""
    return (
        basket_pair_rows(baskets)
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("co_users"))
        .filter(F.col("co_users") >= _CO_MIN_COUNT)
    )


# (applicationId, sf_dir, events-fingerprint) -> (pair counts, item
# counts, n_users) — the taste-graph bundle EIGHT registry faces derive
# per call (co-occurrence, Jaccard, PageRank, PPR, LPA communities,
# triangles, association rules, CF recs).  All three frames are
# item-space-bounded (never user- or event-cardinality), so the memo
# holds metadata-sized localCheckpoints; the events fingerprint rebuilds
# on a same-session rewrite (the r11 memo-staleness rule).  Round 13:
# the bench showed each face re-running the basket build + pair explode
# (~1-2 s each) per call; within a session the graph is one derivation.
_TASTE_GRAPH_CACHE: dict = {}


def clear_taste_graph_cache() -> None:
    _TASTE_GRAPH_CACHE.clear()


def _taste_graph(spark: SparkSession, sf_dir: str):
    from ..io import data_fingerprint

    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        data_fingerprint(sf_dir, "events"),
    )
    hit = _TASTE_GRAPH_CACHE.get(key)
    if hit is not None:
        try:
            if hit[0].sparkSession.sparkContext._jsc is not None:
                return hit
        except Exception:
            pass
        _TASTE_GRAPH_CACHE.pop(key, None)
    for k in list(_TASTE_GRAPH_CACHE):
        if k[:2] == key[:2] and k != key:
            _TASTE_GRAPH_CACHE.pop(k, None)
    from ..io import compact_checkpoint

    baskets = _user_baskets(spark, sf_dir)
    try:
        # r15 optimization round: compact the materialized bundle to a
        # row-count-derived partition count (io.compact_checkpoint) — the
        # iterative faces (PageRank/PPR/SimRank/LPA) otherwise schedule
        # 32-64 near-empty tasks per iteration over the inherited shuffle
        # partitioning and plan SortMergeJoins over the scattered blocks.
        co = compact_checkpoint(_basket_pairs(baskets))
        cnt = compact_checkpoint(
            baskets.select(F.explode("items").alias("item"))
            .groupBy("item")
            .agg(F.count("*").alias("cnt"))
        )
        n_users = baskets.agg(F.count("*").alias("n_users")).localCheckpoint(
            eager=True
        )
    finally:
        baskets.unpersist()
    _TASTE_GRAPH_CACHE[key] = (co, cnt, n_users)
    return co, cnt, n_users


def cooccurrence_edges_from_index(
    delta: DataFrame, min_count: int = _CO_MIN_COUNT
) -> DataFrame:
    """Finalize the incrementally maintained co-occurrence delta table
    (item_a, item_b, d) into the same (item_a, item_b, co_users) edge
    frame ``_basket_pairs`` computes over the full history: counts are
    mergeable sums of the per-batch ±1 contributions, summed once here.
    At 100 TB this replaces the full-history pair regeneration with a
    pair-keyed agg over the (much smaller) delta table; periodic
    compaction = overwriting the table with this frame at min_count=1."""
    return (
        delta.groupBy("item_a", "item_b")
        .agg(F.sum("d").cast("long").alias("co_users"))
        .filter(F.col("co_users") >= min_count)
    )


def events_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket item co-occurrence with lift — the "users who touched
    X also touched Y" pass behind recommendations and feature-affinity
    dashboards. Items are ``props.k``; baskets are each user's DISTINCT
    item set; output is every item pair co-touched by ≥ ``_CO_MIN_COUNT``
    users with lift = P(a,b)/(P(a)·P(b)) over the participating users.

    Scale shape: one distinct pass builds (user, item); users with more
    than ``_CO_USER_CAP`` distinct items are excluded WHOLE (a deterministic
    rule both engines share) — without the cap, one crawler-like user with
    10⁵ items contributes 10¹⁰ pairs and the self-join explodes; with it,
    pairs per user are ≤ C(cap,2) and total work is linear in users. The
    pair self-join co-partitions on user_id (one shuffle), counts are plain
    hash aggs, and the item-frequency side joins back on the item keys —
    no broadcast hints (item cardinality is corpus-sized at 100 TB; AQE
    may downgrade at small SF). Lift is integer-count arithmetic divided
    once, rounded at 6 — cross-engine exact."""
    co, cnt, n_users = _taste_graph(spark, sf_dir)
    result = (
        co.join(cnt.select(F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a")), "item_a")
        .join(cnt.select(F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b")), "item_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "item_a",
            "item_b",
            "co_users",
            F.round(
                F.col("co_users") * F.col("n_users")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )
    return result


# Shared oracle CTE chain: baskets → pair counts. Both co-occurrence and
# PageRank interpolate this single definition, so the two oracles can never
# disagree about what an edge is.
_CO_CTES = f"""ui AS (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL AND user_id IS NOT NULL
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item, COUNT(*) OVER (PARTITION BY user_id) AS n_items
    FROM ui
  ) WHERE n_items <= {_CO_USER_CAP}
),
co AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS co_users
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_CO_MIN_COUNT}
)"""

COOCCURRENCE_SQL = f"""
WITH {_CO_CTES},
nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM capped),
cnt AS (SELECT item, COUNT(*) AS cnt FROM capped GROUP BY item)
SELECT item_a, item_b, co_users,
       ROUND(co_users * n_users / (ca.cnt * cb.cnt * 1.0), 6) AS lift
FROM co
JOIN cnt ca ON ca.item = co.item_a
JOIN cnt cb ON cb.item = co.item_b, nu
"""


def item_jaccard_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard item-item similarity over the taste graph: |U_a ∩ U_b| /
    |U_a ∪ U_b| per co-touched pair — the SET-overlap normalization that
    lift doesn't give (lift rewards rare coincidences; Jaccard rewards
    genuinely shared audiences) and the exact quantity MinHash-LSH
    estimates, so it doubles as the ground truth a sampled dedup/blocking
    pass is validated against.

    Same scale shape as ``events_item_cooccurrence`` (ONE shared edge
    definition — ``_user_baskets``/``_basket_pairs`` engine-side,
    ``_CO_CTES`` in the oracle): capped baskets bound pairs per user at
    C(cap,2), one pair-keyed hash agg, item-count joins keyed on the
    items with no broadcast hints. |U_a ∪ U_b| = cnt_a + cnt_b − co is
    integer arithmetic; the single division rounds at 6 — cross-engine
    exact."""
    co, cnt, _n = _taste_graph(spark, sf_dir)
    result = (
        co.join(cnt.select(F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a")), "item_a")
        .join(cnt.select(F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b")), "item_b")
        .select(
            "item_a",
            "item_b",
            "co_users",
            F.round(
                F.col("co_users")
                / (F.col("cnt_a") + F.col("cnt_b") - F.col("co_users")),
                6,
            ).alias("jaccard"),
        )
    )
    return result


ITEM_JACCARD_SQL = f"""
WITH {_CO_CTES},
cnt AS (SELECT item, COUNT(*) AS cnt FROM capped GROUP BY item)
SELECT item_a, item_b, co_users,
       ROUND(co_users / ((ca.cnt + cb.cnt - co_users) * 1.0), 6) AS jaccard
FROM co
JOIN cnt ca ON ca.item = co.item_a
JOIN cnt cb ON cb.item = co.item_b
"""


# PageRank knobs, interpolated into the oracle: damping factor and the
# PINNED iteration count (unrolled identically on both sides — a fixed
# small iteration count is what makes the whole computation ANSI-SQL
# expressible; convergence-to-epsilon would not be).
_PR_DAMPING = 0.85
_PR_ITERS = 3


def item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the item co-occurrence graph — "centrality in the
    taste graph", the classic graph signal behind item importance ranking
    and crawl/curation prioritization. Edges are the co-occurrence pairs
    (undirected → both directions), rank starts uniform and runs
    ``_PR_ITERS`` damped iterations: r ← (1−d)/N + d·Σ_in r(u)/deg(u).

    Scale shape: each iteration is ONE ranks⋈edges join partitioned on the
    source item plus one destination-keyed sum — the standard distributed
    PageRank step (Spark's own GraphX/Pregel examples use this shape); the
    iteration count is a pinned constant, so the unrolled plan depth is
    bounded. No dangling-node term is needed: an undirected edge list gives
    every node at least one outgoing edge by construction. Deterministic up
    to float-sum order inside the per-destination aggregation; the final
    round at 8 decimals absorbs that (~1e-16 relative) on both engines."""
    co, _cnt, _n = _taste_graph(spark, sf_dir)
    # r15 optimization round (guide §2.2/§2.4, same rework as
    # text_textrank_keywords): the compacted memoized graph feeds a
    # loop-invariant edges⋈deg join hoisted out of the iteration, and the
    # 1-row node count is collected once (constant-bounded driver state)
    # instead of re-broadcast every iteration — r/deg multiply order and
    # the 1/n // (1−d)/n doubles are unchanged, so output is bit-identical.
    edges = co.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionByName(
        co.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    ).persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    ed = edges.join(deg, "src").select("src", "dst", "deg").persist()
    n = deg.count() or 1
    d = _PR_DAMPING
    ranks = deg.select(
        F.col("src").alias("item"), (F.lit(1.0) / F.lit(float(n))).alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            ed.join(ranks.withColumnRenamed("item", "src"), "src")
            .select("dst", (F.col("r") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = contrib.select(
            F.col("dst").alias("item"),
            (F.lit((1.0 - d) / float(n)) + d * F.col("s")).alias("r"),
        )
    result = (
        ranks.join(deg.withColumnRenamed("src", "item"), "item")
        .select("item", F.round("r", 8).alias("pagerank"), "deg")
    )
    return checkpoint_release(result, edges, deg, ed)


def _pagerank_sql() -> str:
    """Unroll the same pinned iterations in SQL (shared edge CTEs)."""
    d = _PR_DAMPING
    ctes = [
        f"""edges AS (
  SELECT item_a AS src, item_b AS dst FROM co
  UNION ALL
  SELECT item_b AS src, item_a AS dst FROM co
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (SELECT src AS item, 1.0 / n AS r FROM deg, nn)"""
    ]
    for i in range(_PR_ITERS):
        ctes.append(
            f"""s{i + 1} AS (
  SELECT e.dst AS item, SUM(r{i}.r / deg.deg) AS s
  FROM edges e JOIN deg ON deg.src = e.src JOIN r{i} ON r{i}.item = e.src
  GROUP BY e.dst
),
r{i + 1} AS (SELECT item, (1.0 - {d}) / n + {d} * s AS r FROM s{i + 1}, nn)"""
        )
    return (
        f"WITH {_CO_CTES},\n"
        + ",\n".join(ctes)
        + f"""
SELECT r.item AS item, ROUND(r.r, 8) AS pagerank, deg.deg AS deg
FROM r{_PR_ITERS} r JOIN deg ON deg.src = r.item
"""
    )


PAGERANK_SQL = _pagerank_sql()


# SimRank knobs: decay C and the pinned iteration count (unrolled in the
# oracle like PageRank's).
_SR_C = 0.8
_SR_ITERS = 3
_SR_TOPK = 20


def item_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimRank item-item similarity over the taste graph (NEW round 15):
    "two items are similar if similar items co-occur with them" — the
    STRUCTURAL-equivalence signal the direct-overlap family (Jaccard,
    lift, co-count) cannot see: two items never bought together but
    bought alongside the same third items score high here and zero
    there. Jeh & Widom 2002 recurrence on the undirected co-occurrence
    edges: s(a,a)=1, s ← C/(deg_a·deg_b) · Σ_{u∈N(a),v∈N(b)} s(u,v),
    ``_SR_ITERS`` pinned iterations, ROUND(9) per iteration (the
    PageRank/Lloyd trajectory pin), top-``_SR_TOPK`` co-occurring pairs
    by final score with (score desc, pair asc) tie order.

    Scale shape: the ONE shared edge definition (``_CO_CTES``) keeps the
    item universe vocabulary-bounded (≤ |items|² similarity pairs — a
    metadata frame, the Markov/transition-matrix class, NOT corpus
    mass); each iteration runs the GEMM S' ∝ A·S·Aᵀ as TWO half-hops
    with a partial agg between them (edge⋈scores grouped by (a,v), then
    the second edge leg), so the per-iteration intermediate is
    2·|S|·avg_deg rows instead of the single-hop Σ deg_a·deg_b ≈ (2|E|)²
    expansion (r15 optimization round). The report ranks ALL
    positive-scoring unordered pairs — including pairs with NO
    co-occurrence edge, which is precisely SimRank's point — carrying
    co_users (0 for never-together pairs) so the contrast with the
    direct-overlap family is visible in the output itself."""
    co, _cnt, _n = _taste_graph(spark, sf_dir)
    # r15 optimization round: coalesce(1) the bounded graph frames before
    # persist (the textrank/item_pagerank treatment, guide §2.2) so the
    # pinned iterations do not schedule 32+ near-empty tasks per pass.
    edges = co.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionByName(
        co.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    ).coalesce(1).persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).coalesce(1).persist()
    nodes = deg.select(F.col("src").alias("item"))
    # s0 = identity on the full ordered pair space
    s = (
        nodes.select(F.col("item").alias("x"))
        .crossJoin(nodes.select(F.col("item").alias("y")))
        .select(
            "x",
            "y",
            F.when(F.col("x") == F.col("y"), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("s"),
        )
    )
    ea = edges.select(F.col("src").alias("a"), F.col("dst").alias("u"))
    eb = edges.select(F.col("src").alias("b"), F.col("dst").alias("v"))
    for _ in range(_SR_ITERS):
        # join order matters: edge⋈scores first (zero scores dropped —
        # they contribute nothing), then the second edge leg; never the
        # literal (2|E|)² cross product.
        # r15 optimization round (guide §2.3, aggregate before you
        # shuffle): the recurrence is the GEMM S' ∝ A·S·Aᵀ, so it runs as
        # TWO half-hops with a partial aggregation between them — Σ_u
        # s(u,v) grouped by (a,v) first, then the second edge leg over
        # the collapsed halves.  The single-hop form fed Σ_{(u,v)}
        # deg(u)·deg(v) rows per iteration into one agg (~98M at sf0.1,
        # where the 100-item graph is complete); the half-hop feeds
        # |s|·deg twice (~2M).  Pure float-sum regrouping of UNROUNDED
        # partials inside one iteration — the accumulation-order dust the
        # per-iteration ROUND(9) trajectory pin already absorbs (same
        # acceptance class as the hash-agg's own partial/merge order,
        # which neither engine fixes); oracle re-verified value-exact at
        # all three SFs.
        half = (
            ea.join(
                s.filter(F.col("s") != 0), F.col("u") == F.col("x")
            )
            .groupBy("a", "y")
            .agg(F.sum("s").alias("h"))
        )
        contrib = (
            half.join(eb, F.col("v") == F.col("y"))
            .groupBy("a", "b")
            .agg(F.sum("h").alias("t"))
        )
        s = (
            contrib.join(deg.withColumnRenamed("src", "a").withColumnRenamed("deg", "da"), "a")
            .join(deg.withColumnRenamed("src", "b").withColumnRenamed("deg", "db"), "b")
            .select(
                F.col("a").alias("x"),
                F.col("b").alias("y"),
                F.round(
                    F.lit(_SR_C) * F.col("t") / (F.col("da") * F.col("db")),
                    9,
                ).alias("s"),
            )
            .select(
                "x",
                "y",
                F.when(F.col("x") == F.col("y"), F.lit(1.0))
                .otherwise(F.col("s"))
                .alias("s"),
            )
        )
        # compact the ≤|items|² score frame between iterations so the next
        # pass does not schedule 32 near-empty tasks over the checkpoint
        # blocks (scale-adaptive: a genuinely large pair space keeps its
        # partitioning)
        s = compact_checkpoint(s)
    out = (
        s.filter((F.col("x") < F.col("y")) & (F.col("s") > 0))
        .join(
            co,
            (F.col("item_a") == F.col("x")) & (F.col("item_b") == F.col("y")),
            "left",
        )
        .select(
            F.col("x").alias("item_a"),
            F.col("y").alias("item_b"),
            F.coalesce("co_users", F.lit(0).cast("long")).alias("co_users"),
            F.round("s", 8).alias("simrank"),
        )
        .orderBy(F.desc("simrank"), F.asc("item_a"), F.asc("item_b"))
        .limit(_SR_TOPK)
    )
    return checkpoint_release(out, edges, deg)


def _simrank_sql() -> str:
    """Unrolled pinned-iteration oracle over the shared edge CTEs."""
    ctes = [
        f"""edges AS (
  SELECT item_a AS src, item_b AS dst FROM co
  UNION ALL
  SELECT item_b AS src, item_a AS dst FROM co
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT src AS item FROM deg),
s0 AS (
  SELECT a.item AS x, b.item AS y,
         CASE WHEN a.item = b.item THEN 1.0 ELSE 0.0 END AS s
  FROM nodes a CROSS JOIN nodes b
)"""
    ]
    for i in range(_SR_ITERS):
        ctes.append(
            f"""t{i + 1} AS MATERIALIZED (
  SELECT ea.src AS a, eb.src AS b, SUM(s{i}.s) AS t
  FROM edges ea
  CROSS JOIN edges eb
  JOIN s{i} ON s{i}.x = ea.dst AND s{i}.y = eb.dst
  GROUP BY ea.src, eb.src
),
s{i + 1} AS MATERIALIZED (
  SELECT t.a AS x, t.b AS y,
         CASE WHEN t.a = t.b THEN 1.0
              ELSE ROUND({_SR_C} * t.t / (da.deg * db.deg), 9) END AS s
  FROM t{i + 1} t
  JOIN deg da ON da.src = t.a
  JOIN deg db ON db.src = t.b
)"""
        )
    return (
        f"WITH {_CO_CTES},\n"
        + ",\n".join(ctes)
        + f"""
SELECT s.x AS item_a, s.y AS item_b,
       CAST(COALESCE(co.co_users, 0) AS BIGINT) AS co_users,
       ROUND(s.s, 8) AS simrank
FROM s{_SR_ITERS} s
LEFT JOIN co ON co.item_a = s.x AND co.item_b = s.y
WHERE s.x < s.y AND s.s > 0
ORDER BY simrank DESC, item_a ASC, item_b ASC
LIMIT {_SR_TOPK}
"""
    )


SIMRANK_SQL = _simrank_sql()


_PPR_SEEDS = 5  # seed items (top-degree picks, ties item ASC)
_PPR_TOPK = 10  # recommendations per seed


def recommend_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized-PageRank recommendations (NEW round 13; the
    random-walk-with-restart recommender — Pixie/SALSA's core signal):
    for each of the ``{seeds}`` highest-degree seed items, run
    ``_PR_ITERS`` damped iterations of r ← (1−d)·e_seed + d·Σ r(u)/deg(u)
    over the SAME co-occurrence edge definition as item_pagerank /
    recommend_items (the shared-edge discipline — three rec signals, one
    graph), and emit the top {topk} non-seed items per seed.  PPR
    concentrates mass NEAR the seed, so unlike global PageRank the
    ranking answers "what goes with THIS item".

    All seeds propagate in one batched iteration (state keyed
    (seed, item) — ≤ seeds·|items| rows, vocab-bounded); ranking orders
    on the ROUNDED score (item tie-break), the TextRank discipline, so
    last-ulp float dust cannot flip ranks cross-engine.""".format(
        seeds=_PPR_SEEDS, topk=_PPR_TOPK
    )
    co, _cnt, _n = _taste_graph(spark, sf_dir)
    result, cached = ppr_over_edges(co)
    return checkpoint_release(result, *cached)


def ppr_over_edges(co: DataFrame):
    """The PPR core over a (item_a, item_b[, …]) co-occurrence edge
    frame — shared by the batch face and the maintained-table serve path
    (``cooccurrence_edges_from_index`` emits the identical frame, so the
    incremental co-occurrence state serves PPR recs with no new state;
    parity asserted in the co-occurrence ingest test).  Returns
    (result, frames-to-release)."""
    # r15 optimization round NOTE (measured, kept as-is): hoisting a
    # persisted edges⋈deg out of this loop (the item_pagerank rework) was
    # tried and REVERTED — here `ranks` is the small side (≤ seeds·items
    # rows) and drives the joins, so the per-iteration cost was already
    # ranks-bounded and the hoist only added a materialization job
    # (tally: 284 → 314 tasks).
    edges = co.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionByName(
        co.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    ).persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    seeds = (
        deg.orderBy(F.desc("deg"), F.asc("src"))
        .limit(_PPR_SEEDS)
        .select(F.col("src").alias("seed"))
    )
    d = _PR_DAMPING
    ranks = seeds.select("seed", F.col("seed").alias("item"), F.lit(1.0).alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            ranks.join(edges.withColumnRenamed("src", "item"), "item")
            .join(deg.withColumnRenamed("src", "item"), "item")
            .select("seed", "dst", (F.col("r") / F.col("deg")).alias("c"))
            .groupBy("seed", "dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = contrib.select(
            "seed",
            F.col("dst").alias("item"),
            (
                d * F.col("s")
                + F.when(F.col("dst") == F.col("seed"), 1.0 - d).otherwise(0.0)
            ).alias("r"),
        )
    scored = ranks.filter(F.col("item") != F.col("seed")).select(
        "seed", "item", F.round("r", 8).alias("ppr")
    )
    wr = Window.partitionBy("seed").orderBy(F.desc("ppr"), F.asc("item"))
    result = (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _PPR_TOPK)
        .select("seed", "rank", "item", "ppr")
        .orderBy("seed", "rank")
    )
    return result, (edges, deg)


def _ppr_sql() -> str:
    d = _PR_DAMPING
    ctes = [
        f"""edges AS (
  SELECT item_a AS src, item_b AS dst FROM co
  UNION ALL
  SELECT item_b AS src, item_a AS dst FROM co
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
seeds AS (
  SELECT src AS seed FROM deg ORDER BY deg DESC, src ASC LIMIT {_PPR_SEEDS}
),
r0 AS (SELECT seed, seed AS item, 1.0 AS r FROM seeds)"""
    ]
    for i in range(_PR_ITERS):
        ctes.append(
            f"""s{i + 1} AS (
  SELECT r{i}.seed, e.dst, SUM(r{i}.r / deg.deg) AS s
  FROM r{i} JOIN edges e ON e.src = r{i}.item
  JOIN deg ON deg.src = r{i}.item
  GROUP BY r{i}.seed, e.dst
),
r{i + 1} AS (
  SELECT seed, dst AS item,
         {d} * s + CASE WHEN dst = seed THEN 1.0 - {d} ELSE 0.0 END AS r
  FROM s{i + 1}
)"""
        )
    return (
        f"WITH {_CO_CTES},\n"
        + ",\n".join(ctes)
        + f"""
SELECT seed, CAST(ROW_NUMBER() OVER (PARTITION BY seed
         ORDER BY ROUND(r, 8) DESC, item ASC) AS INT) AS rank,
       item, ROUND(r, 8) AS ppr
FROM r{_PR_ITERS}
WHERE item != seed
QUALIFY rank <= {_PPR_TOPK}
ORDER BY seed, rank
"""
    )


RECOMMEND_PPR_SQL = _ppr_sql()


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov model of user behavior: P(next event_type | this
    event_type) from each user's time-ordered event sequence — the
    session-flow fingerprint behind next-action prediction, anomaly
    detection on behavior drift, and UX funnel diagnostics.

    One user-keyed sort window (lag) builds the transition stream, then a
    tiny |types|² hash agg; probabilities are integer counts divided once
    and rounded, so cross-engine exact. Ordering ties on ts break by
    event_id — the same total order both engines sort by. Scale: the only
    shuffle is the per-user window partition (the sessionize shape); the
    transition matrix itself is bounded by the event-type vocabulary."""
    return markov_transitions(load(spark, "events", sf_dir))


def markov_transition_counts(ev: DataFrame) -> DataFrame:
    """The mergeable half of the Markov model: (prev_type, next_type, n)
    transition counts from time-ordered per-user sequences. Counts from
    DISJOINT, per-user-time-contiguous event slices sum to the full-corpus
    counts once boundary transitions are added — which is what
    ``streaming.ingest.start_incremental_markov_ingest`` maintains.

    Rows with a NULL sort key (ts or event_id) are excluded on BOTH sides:
    they cannot take a position in a temporal sequence, and the two engines
    would otherwise ORDER them differently (Spark NULLS FIRST under ASC,
    DuckDB NULLS LAST) — shifting every adjacent transition."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.filter(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )


def markov_from_counts(counts: DataFrame) -> DataFrame:
    """Finalize (possibly partial) transition-count rows into the
    probability matrix — the query-time face of the maintained table."""
    tr = counts.groupBy("prev_type", "next_type").agg(F.sum("n").alias("n"))
    wp = Window.partitionBy("prev_type")
    return tr.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


def markov_transitions(ev: DataFrame) -> DataFrame:
    """First-order transition matrix of an event frame (reusable core of
    :func:`events_markov_transitions`)."""
    return markov_from_counts(markov_transition_counts(ev))


# Shared sequence/count CTEs: the transition matrix AND the per-user
# surprisal score interpolate this single definition, so the two oracles
# cannot disagree about what a transition is.
_MARKOV_CTES = """seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL AND event_id IS NOT NULL
),
tr AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)"""

MARKOV_SQL = f"""
WITH {_MARKOV_CTES}
SELECT prev_type, next_type, n,
       ROUND(n / (SUM(n) OVER (PARTITION BY prev_type) * 1.0), 6) AS p
FROM tr
"""


def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-behavior Markov chain (NEW round 13;
    Shannon's H(X_{{t+1}}|X_t) under the empirical source distribution)
    — ONE number summarizing how predictable the behavior stream is:
    H = −Σ_s π(s)·Σ_t p(t|s)·ln p(t|s) with π the empirical prev-state
    mix.  The corpus-health twin of `user_behavior_surprisal` (that face
    scores USERS against the model; this scores the MODEL itself — a
    falling rate means behavior is homogenizing, a jump means a new flow
    or instrumentation break).  Perplexity = e^H is the branching
    factor.

    Composes `markov_transition_counts` verbatim (the shared transition
    definition — also what the incremental Markov path maintains, so the
    maintained table serves this too).  Everything after the transition
    count runs on the |types|² matrix; ln/exp at ROUND 6 is the
    established bm25/perplexity acceptance class."""
    tr = markov_transition_counts(load(spark, "events", sf_dir))
    total = tr.agg(F.sum("n").alias("tot"))
    wp = Window.partitionBy("prev_type")
    row_n = F.sum("n").over(wp)
    contrib = tr.crossJoin(F.broadcast(total)).select(
        "prev_type",
        "n",
        (
            (F.col("n") / F.col("tot"))
            * -F.log(F.col("n") / row_n)
        ).alias("h_term"),
    )
    return contrib.agg(
        F.countDistinct("prev_type").cast("long").alias("n_states"),
        F.sum("n").alias("n_transitions"),
        F.round(F.sum("h_term"), 6).alias("entropy_rate_nats"),
        F.round(F.exp(F.sum("h_term")), 6).alias("perplexity"),
    )


MARKOV_ENTROPY_SQL = f"""
WITH {_MARKOV_CTES},
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM tr),
contrib AS (
  SELECT prev_type, n,
         (n * 1.0 / tot)
         * -LN(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type)) AS h_term
  FROM tr, tot
)
SELECT CAST(COUNT(DISTINCT prev_type) AS BIGINT) AS n_states,
       CAST(SUM(n) AS BIGINT) AS n_transitions,
       ROUND(SUM(h_term), 6) AS entropy_rate_nats,
       ROUND(EXP(SUM(h_term)), 6) AS perplexity
FROM contrib
"""


def events_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type burstiness via the Fano factor (NEW round 13;
    variance-to-mean ratio of the zero-filled daily count series — a
    Poisson-stable stream sits at 1, crawler/bot bursts push it far
    above, rate-limited synthetic traffic below): the dispersion
    diagnostic the anomaly monitors assume but never report.  Computes
    population variance from the exact integer moments (Σn, Σn²) so the
    value is one division — cross-engine exact up to the final ROUND 6.

    Serves from the FIFTEENTH incremental path's state by composition
    (``daily_type_grid`` = grid_from_daily_cells ∘ daily_type_cells);
    everything after the leaf-cell shuffle runs on the |types|×|days|
    metadata grid."""
    grid = daily_type_grid(load(spark, "events", sf_dir))
    # Σn² as an exact INTEGER sum (order-independent; a double sum would
    # be order-dependent once intermediate values pass 2^53)
    m = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.col("n")).alias("_ss"),
    )
    mean = F.col("total") / F.col("n_days")
    var = F.col("_ss") / F.col("n_days") - mean * mean
    return m.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        "total",
        F.round(mean, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.when(mean > 0, F.round(var / mean, 6)).alias("fano_factor"),
    ).orderBy("event_type")


EVENTS_FANO_SQL = """
WITH ev AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
daily AS (SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2),
spine AS (
  SELECT UNNEST(generate_series(
           (SELECT MIN(day) FROM daily),
           (SELECT MAX(day) FROM daily),
           INTERVAL 1 DAY)) AS day
),
grid AS (
  SELECT t.event_type, COALESCE(d.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN spine s
  LEFT JOIN daily d ON d.event_type = t.event_type
                   AND d.day = CAST(s.day AS DATE)
),
m AS (
  SELECT event_type,
         COUNT(*) AS n_days,
         CAST(SUM(n) AS BIGINT) AS total,
         CAST(SUM(n * n) AS BIGINT) AS _ss
  FROM grid GROUP BY 1
)
SELECT event_type,
       CAST(n_days AS BIGINT) AS n_days,
       total,
       ROUND(total / (n_days * 1.0), 6) AS mean_daily,
       ROUND(_ss / n_days - (total / (n_days * 1.0))
             * (total / (n_days * 1.0)), 6) AS var_daily,
       CASE WHEN total > 0 THEN
         ROUND((_ss / n_days - (total / (n_days * 1.0))
                * (total / (n_days * 1.0)))
               / (total / (n_days * 1.0)), 6) END AS fano_factor
FROM m
ORDER BY event_type
"""


def events_sequence_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support for ordered type pairs (NEW round 13;
    the 2-step slice of GSP/SPADE sequence mining): for every ordered
    pair (a → b), how many users exhibit the pattern "some a event
    strictly before some b event" — NOT adjacency (the Markov matrix) and
    NOT co-occurrence (the basket graph): a funnel-discovery signal that
    finds multi-step flows no one thought to define as a funnel.

    Closed form that avoids per-user sequence scans: user u supports
    (a → b) iff u's FIRST a precedes u's LAST b in the (ts, event_id)
    total order — so support needs only each user's per-type first/last
    occurrence (one (user, type) agg, mergeable min/max — maintainable
    exactly like the RFM partials), then a per-user |types|² struct
    compare.  Support ratio divides by the users having ANY typed event.

    One user-keyed shuffle; the pair compare runs on ≤|users|·|types|
    first/last rows self-joined per user (|types| is small by contract);
    output ≤|types|² rows."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    key = F.struct(F.col("ts"), F.col("event_id"))
    fl = ev.groupBy("user_id", "event_type").agg(
        F.min(key).alias("first_k"), F.max(key).alias("last_k")
    )
    n_users = fl.select("user_id").distinct().count()
    a = fl.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("first_k").alias("fa"),
    )
    b = fl.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("last_k").alias("lb"),
    )
    sup = (
        a.join(b, "user_id")
        .filter(F.col("fa") < F.col("lb"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return sup.select(
        "type_a",
        "type_b",
        "n_users",
        F.round(F.col("n_users") / F.lit(n_users), 6).alias("support"),
    ).orderBy("type_a", "type_b")


EVENTS_SEQUENCE_SUPPORT_SQL = """
WITH ev AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL AND event_id IS NOT NULL
),
fl AS (
  SELECT user_id, event_type,
         MIN(ROW(ts, event_id)) AS first_k,
         MAX(ROW(ts, event_id)) AS last_k
  FROM ev GROUP BY 1, 2
),
nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM fl),
sup AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_users
  FROM fl a JOIN fl b ON a.user_id = b.user_id
  WHERE a.first_k < b.last_k
  GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n_users AS BIGINT) AS n_users,
       ROUND(n_users * 1.0 / n, 6) AS support
FROM sup, nu
ORDER BY type_a, type_b
"""


def events_type_dow_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence test of event_type × day-of-week (NEW
    round 13) — the classic contingency-table question behind "does
    behavior mix shift by weekday?" (a significant statistic says the
    type mix is NOT independent of the weekday — the batch-analytics
    twin of the weekly JSD drift monitor, which localizes WHICH weeks;
    this face tests the global hypothesis and reports the top deviating
    cells).  One row: table dims, n, χ², degrees of freedom, plus the
    most over-represented cell (largest (o−e)²/e with its direction).

    Everything after one (type, dow) hash agg runs on the ≤|types|×7
    matrix; expected counts are exact integer products divided once;
    the χ² sum is over ≤35 cells, ROUND 6 (the accepted float-sum
    class)."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    cells = ev.groupBy(
        "event_type",
        F.dayofweek(F.col("ts").cast("timestamp")).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_ = cells.groupBy("event_type").agg(F.sum("o").alias("rn"))
    cols_ = cells.groupBy("dow").agg(F.sum("o").alias("cn"))
    tot = cells.agg(F.sum("o").alias("n"))
    full = (
        cells.join(rows_, "event_type")
        .join(cols_, "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            "o",
            (F.col("rn") * F.col("cn") / F.col("n")).alias("e"),
        )
        .select(
            "event_type",
            "dow",
            "o",
            "e",
            ((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
            .alias("cell_chi"),
        )
        .localCheckpoint(eager=True)  # ≤|types|×7 rows; four consumers
    )
    dims = full.agg(
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.countDistinct("dow").cast("long").alias("n_dows"),
        F.sum("o").alias("n"),
        F.round(F.sum("cell_chi"), 6).alias("chi2"),
    )
    wtop = Window.orderBy(
        F.desc(F.round("cell_chi", 6)), F.asc("event_type"), F.asc("dow")
    )
    top = (
        full.withColumn("r", F.row_number().over(wtop))
        .filter(F.col("r") == 1)
        .select(
            F.col("event_type").alias("top_cell_type"),
            F.col("dow").alias("top_cell_dow"),
            (F.col("o") > F.col("e")).alias("top_cell_over"),
        )
    )
    return dims.crossJoin(F.broadcast(top)).select(
        "n_types",
        "n_dows",
        "n",
        "chi2",
        ((F.col("n_types") - 1) * (F.col("n_dows") - 1)).alias("dof"),
        "top_cell_type",
        "top_cell_dow",
        "top_cell_over",
    )


EVENTS_TYPE_DOW_CHISQ_SQL = """
WITH cells AS (
  SELECT event_type,
         CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INT) AS dow,
         COUNT(*) AS o
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
rows_ AS (SELECT event_type, SUM(o) AS rn FROM cells GROUP BY 1),
cols_ AS (SELECT dow, SUM(o) AS cn FROM cells GROUP BY 1),
tot AS (SELECT SUM(o) AS n FROM cells),
expected AS (
  SELECT c.event_type, c.dow, c.o,
         r.rn * co.cn * 1.0 / t.n AS e
  FROM cells c
  JOIN rows_ r USING (event_type)
  JOIN cols_ co USING (dow)
  CROSS JOIN tot t
),
scored AS (
  SELECT *, (o - e) * (o - e) / e AS cell_chi FROM expected
),
dims AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
         CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_dows,
         CAST(SUM(o) AS BIGINT) AS n,
         ROUND(SUM(cell_chi), 6) AS chi2
  FROM scored
),
top AS (
  SELECT event_type AS top_cell_type, dow AS top_cell_dow,
         o > e AS top_cell_over
  FROM scored
  ORDER BY ROUND(cell_chi, 6) DESC, event_type ASC, dow ASC
  LIMIT 1
)
SELECT n_types, n_dows, n, chi2,
       (n_types - 1) * (n_dows - 1) AS dof,
       top_cell_type, top_cell_dow, top_cell_over
FROM dims, top
"""


def user_behavior_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral anomaly score: the mean negative log-likelihood
    of a user's event transitions under the CORPUS Markov model — the
    user-behavior twin of document LM perplexity (a bot or broken client
    makes improbable transitions even when each event type looks normal).
    Shares the transition definition with `events_markov_transitions`
    (same `markov_transitions` core on the engine side, same
    `_MARKOV_CTES` in the oracle).

    Scale shape: the model is the existing one-shuffle transition matrix,
    bounded at |event-type|² rows — broadcast to the re-scoring join;
    per-user sequences reuse the same user-keyed window shuffle; the
    final pass is one user-keyed avg. Determinism: −ln of the model's
    ROUNDED p (identical doubles both engines), per-user AVG rounded at 6
    (the text_perplexity_bigram precedent — round-6 absorbs float-sum
    order)."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select("user_id", "prev_type", F.col("event_type").alias("next_type"))
    )
    model = markov_transitions(ev).select("prev_type", "next_type", "p")
    return (
        seq.join(F.broadcast(model), ["prev_type", "next_type"])
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_transitions"),
            F.round(F.avg(-F.log("p")), 6).alias("mean_nll"),
        )
    )


USER_SURPRISAL_SQL = f"""
WITH {_MARKOV_CTES},
model AS (
  SELECT prev_type, next_type,
         ROUND(n / (SUM(n) OVER (PARTITION BY prev_type) * 1.0), 6) AS p
  FROM tr
)
SELECT s.user_id, COUNT(*) AS n_transitions,
       ROUND(AVG(-ln(m.p)), 6) AS mean_nll
FROM seq s
JOIN model m ON m.prev_type = s.prev_type AND m.next_type = s.event_type
WHERE s.prev_type IS NOT NULL
GROUP BY 1
"""


# Path-mining knobs, interpolated into the oracle: session inactivity gap
# (seconds — the sessionize convention), path prefix length, and how many
# top paths to report.
_PATH_GAP_S = 1800
_PATH_LEN = 3
_PATH_TOPK = 20


def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey paths: sessionize by inactivity gap (the
    ``sessionize`` convention), take each session's first ``_PATH_LEN``
    event types in time order as its path signature ("view>click>buy"),
    and report the ``_PATH_TOPK`` most frequent paths — the entry-flow
    analysis behind landing-page and funnel-design decisions.

    Everything shuffles once on user_id (lag-gap window + running-sum
    session ids, the sessionize plan), then per-session paths come from a
    SORTED struct array (deterministic (ts, event_id) order inside the
    collect — never a bare collect_list, whose order is
    partition-dependent), and the path frequency table is vocabulary-
    bounded (≤ |event_types|^len). NULL sort keys excluded on both sides
    (the Markov discipline). Counts are integers; ranking ties break on
    the path string — exact cross-engine."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    sess = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > _PATH_GAP_S), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.array_join(
                F.transform(
                    F.slice("evs", 1, _PATH_LEN), lambda e: e["event_type"]
                ),
                ">",
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        counted.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _PATH_TOPK)
        .select("rank", "path", "n_sessions")
    )


SESSION_PATHS_SQL = f"""
WITH ev AS (
  SELECT * FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL AND event_id IS NOT NULL
),
flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR date_diff('second', LAG(ts) OVER w, ts) > {_PATH_GAP_S}
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
paths AS (
  SELECT array_to_string(
           list_transform(
             list_slice(list(event_type ORDER BY ts, event_id), 1, {_PATH_LEN}),
             e -> e),
           '>') AS path
  FROM sess GROUP BY user_id, session_id
),
counted AS (SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path)
SELECT rank, path, n_sessions
FROM (
  SELECT path, n_sessions,
         ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC) AS rank
  FROM counted
)
WHERE rank <= {_PATH_TOPK}
"""


# Pinned synchronous label-propagation rounds (unrolled on both sides).
_LPA_ITERS = 3


def item_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the item co-occurrence graph by synchronous
    label propagation (Raghavan et al. 2007): every node starts as its own
    label; each round a node adopts the most frequent label among its
    neighbors (tie → smallest label); ``_LPA_ITERS`` pinned rounds. The
    taste-cluster complement to :func:`item_pagerank`'s centrality —
    item-group discovery for assortment analysis and recommendation
    candidate pools.

    ENTIRELY integer arithmetic with a deterministic tie rule, so — unlike
    float PageRank — the oracle equivalence is exact, not
    rounding-mediated. Each round is one src-keyed join + one (dst, label)
    count + one rank-1 window (WindowGroupLimit); plan depth bounded by
    the pinned round count, the same distributed LPA step GraphX/GraphFrames
    run per superstep."""
    co, _cnt, _n = _taste_graph(spark, sf_dir)
    edges = co.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionByName(
        co.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    ).persist()
    labels = edges.select(F.col("src").alias("item")).distinct().select(
        "item", F.col("item").alias("label")
    )
    for _ in range(_LPA_ITERS):
        votes = (
            edges.join(labels.withColumnRenamed("item", "src"), "src")
            .groupBy("dst", "label")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("label"))
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("item"), "label")
        )
    result = labels.select("item", F.col("label").alias("community"))
    return checkpoint_release(result, edges)


def _lpa_sql() -> str:
    """Unroll the same pinned label-propagation rounds in SQL."""
    ctes = [
        """edges AS (
  SELECT item_a AS src, item_b AS dst FROM co
  UNION ALL
  SELECT item_b AS src, item_a AS dst FROM co
),
l0 AS (SELECT DISTINCT src AS item, src AS label FROM edges)"""
    ]
    for i in range(_LPA_ITERS):
        ctes.append(
            f"""l{i + 1} AS (
  SELECT item, label FROM (
    SELECT e.dst AS item, l.label, COUNT(*) AS n,
           ROW_NUMBER() OVER (PARTITION BY e.dst
                              ORDER BY COUNT(*) DESC, l.label ASC) AS rn
    FROM edges e JOIN l{i} l ON l.item = e.src
    GROUP BY e.dst, l.label
  ) WHERE rn = 1
)"""
        )
    return (
        f"WITH {_CO_CTES},\n"
        + ",\n".join(ctes)
        + f"""
SELECT item, label AS community FROM l{_LPA_ITERS}
"""
    )


LPA_SQL = _lpa_sql()


def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the standard lifecycle-marketing
    scoring: per user, Recency (days since last event, anchored to the
    corpus max date so the result is reproducible), Frequency (event
    count) and Monetary (value sum), each quintile-scored by NTILE(5),
    composed into a segment label (champion / loyal / at-risk / lost /
    regular).

    One user-keyed agg + three quintile assignments over the per-USER
    frame (user cardinality, not event cardinality) + a broadcast 1-row
    anchor. Scale note: the quintiles are ADAPTIVE since round 10
    (``adaptive_ntile``) — the exact global-window NTILE (the
    oracle-checkable form) below the threshold, the bit-identical
    sliced-rank plan above it, so no single-task sort at any user count.
    Determinism: every quintile orders by a ROUNDED metric with user_id
    as the final tie-break, so a last-ulp float difference in the
    monetary sum can never flip bucket assignment between engines.

    Since round 9 the op is the composition ``rfm_from_user_state ∘
    rfm_user_partials`` — the same two pieces the incremental user-state
    ingest maintains and serves from, so the batch and maintained-table
    paths share one definition and cannot diverge (the activity_pairs
    discipline)."""
    return rfm_from_user_state(
        rfm_user_partials(load(spark, "events", sf_dir)),
        # the fact's footer row count bounds user cardinality for free
        est_rows=parquet_row_count("events", sf_dir),
    )


def rfm_user_partials(events: DataFrame) -> DataFrame:
    """Per-user MERGEABLE lifecycle partials — min first-day, max last-day,
    event count, raw value sum — the one pass over the raw fact that
    :func:`events_rfm_segments` and the incremental user-state ingest
    share. Every column merges with min/max/sum, so partials from any
    batch split (including late and out-of-order data) combine exactly:
    the easiest incremental-view-maintenance class, no ordering
    contract."""
    return (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(F.to_date(F.col("ts").cast("timestamp"))).alias("d_first"),
            F.max(F.to_date(F.col("ts").cast("timestamp"))).alias("d_last"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("monetary_sum"),
        )
    )


def merge_user_state(state: DataFrame) -> DataFrame:
    """Collapse appended per-batch partials to one row per user — the
    serve-side merge (and the whole job of ``compact_user_state``)."""
    return state.groupBy("user_id").agg(
        F.min("d_first").alias("d_first"),
        F.max("d_last").alias("d_last"),
        F.sum("n_events").alias("n_events"),
        F.sum("monetary_sum").alias("monetary_sum"),
    )


def rfm_from_user_state(state: DataFrame, est_rows: int | None = None) -> DataFrame:
    """RFM finalization over (possibly partial) user-state rows: merge,
    then score. Monetary rounds at 2 AFTER the merge, so a partial-sum
    order difference of last-ulp size cannot flip an NTILE bucket — the
    same guard the cross-engine oracle relies on. ``est_rows`` bounds the
    user cardinality for the adaptive quintile switch (the batch face
    passes the fact's free footer count); when the caller has no bound —
    the maintained-state serving face — one approx-count pass over the
    INPUT state probes it, cost proportional to the state table.

    On the SLICED path (est above ``_NTILE_MAX_WINDOWED``) each
    ``adaptive_ntile`` call runs an eager ``approxQuantile`` action over
    its input, so chaining three calls on a lazy frame would re-execute
    the whole upstream plan per probe — the third probe re-running the
    first two sliced-rank plans, and the caller's action running it all
    again (the r10 advice finding). The sliced path therefore persists
    the merged rfm frame and each intermediate scored frame so every
    probe scans a cached input exactly once, then hands the final frame
    to ``checkpoint_release``: the result materializes eagerly (this is
    the serving face — the caller consumes it; per-user scale, bounded
    far below the fact table) and every per-call cache entry is released
    before return. The windowed path stays fully lazy and plan-identical
    to the oracle."""
    per_user = merge_user_state(state).select(
        "user_id",
        "d_last",
        F.col("n_events").alias("frequency"),
        # COALESCE → an all-NULL-value user scores 0 spend instead of a
        # NULL that the two engines would ORDER differently (Spark puts
        # NULLs first under ASC, DuckDB last — a latent NTILE divergence)
        F.round(F.coalesce("monetary_sum", F.lit(0.0)), 2).alias("monetary"),
    )
    anchor = per_user.agg(F.max("d_last").alias("d_max"))
    rfm = per_user.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff("d_max", "d_last").cast("int").alias("recency_days"),
        "frequency",
        "monetary",
    )
    # below the threshold the quintiles stay the exact global-window
    # form the oracle is written in
    est = (
        est_rows
        if est_rows is not None
        else state.agg(F.approx_count_distinct("user_id")).first()[0] or 0
    )
    sliced = est > _NTILE_MAX_WINDOWED
    cached: list[DataFrame] = []
    scored = rfm
    if sliced:
        scored = scored.persist()
        cached.append(scored)
    for col, out_col, desc in (
        ("recency_days", "r_q", False),
        ("frequency", "f_q", True),
        ("monetary", "m_q", True),
    ):
        scored = adaptive_ntile(
            scored, 5, col, "user_id", out_col, descending=desc, est_rows=est
        )
        if sliced:
            # the NEXT call's quantile probe materializes this cache entry,
            # so each upstream plan executes exactly once
            scored = scored.persist()
            cached.append(scored)
    seg = (
        F.when((F.col("r_q") <= 2) & (F.col("f_q") <= 2) & (F.col("m_q") <= 2), "champion")
        .when((F.col("r_q") <= 2) & (F.col("f_q") <= 3), "loyal")
        .when((F.col("r_q") >= 4) & (F.col("f_q") <= 2), "at_risk")
        .when((F.col("r_q") >= 4) & (F.col("f_q") >= 4), "lost")
        .otherwise("regular")
    )
    result = scored.select(
        "user_id", "recency_days", "frequency", "monetary",
        "r_q", "f_q", "m_q", seg.alias("segment"),
    )
    if sliced:
        from ..io import checkpoint_release

        return checkpoint_release(result, *cached)
    return result


RFM_SQL = """
WITH ev AS (SELECT * FROM events WHERE user_id IS NOT NULL),
anchor AS (SELECT MAX(CAST(ts AS DATE)) AS d_max FROM ev),
per_user AS (
  SELECT user_id,
         MAX(CAST(ts AS DATE)) AS d_last,
         COUNT(*) AS frequency,
         ROUND(COALESCE(SUM(value), 0), 2) AS monetary
  FROM ev GROUP BY user_id
),
rfm AS (
  SELECT user_id,
         CAST(date_diff('day', d_last, d_max) AS INT) AS recency_days,
         frequency, monetary
  FROM per_user, anchor
),
scored AS (
  SELECT *,
         NTILE(5) OVER (ORDER BY recency_days ASC, user_id ASC) AS r_q,
         NTILE(5) OVER (ORDER BY frequency DESC, user_id ASC) AS f_q,
         NTILE(5) OVER (ORDER BY monetary DESC, user_id ASC) AS m_q
  FROM rfm
)
SELECT user_id, recency_days, frequency, monetary, r_q, f_q, m_q,
       CASE
         WHEN r_q <= 2 AND f_q <= 2 AND m_q <= 2 THEN 'champion'
         WHEN r_q <= 2 AND f_q <= 3 THEN 'loyal'
         WHEN r_q >= 4 AND f_q <= 2 THEN 'at_risk'
         WHEN r_q >= 4 AND f_q >= 4 THEN 'lost'
         ELSE 'regular'
       END AS segment
FROM scored
"""


# Attribution knobs, interpolated into the oracle: which event types count
# as marketing touches, which as conversions, and the lookback window
# (microseconds — compared on exact integer epoch-µs, never truncated
# seconds, so sub-second timestamps can't flip a boundary cross-engine).
_ATTR_TOUCHES = ["view", "click", "signup"]
_ATTR_CONVERSION = "purchase"
_ATTR_LOOKBACK_US = 7 * 86400 * 1_000_000


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited to the
    user's most recent preceding touch event (view/click/signup) within a
    7-day lookback, else to the synthetic ``direct`` channel — the
    marketing-analytics query behind every channel-ROI dashboard.

    One user_id shuffle total: a single ROWS-frame window ordered by the
    deterministic (ts, event_id) key carries the last touch's channel and
    timestamp forward (``last(..., ignorenulls)`` over UNBOUNDED
    PRECEDING..1 PRECEDING — never a per-conversion range join, which at
    100 TB multiplies every conversion by its candidate touches before
    pruning). The lookback test compares exact integer epoch-µs. Sums
    follow the q1 idiom (ROUND(SUM(value), 2), +0.0 −0.0 guard)."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(_ATTR_TOUCHES)
    touched = ev.select(
        "ts",
        "event_type",
        "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_ch"),
        F.last(F.when(is_touch, F.unix_micros("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_us"),
    )
    conv = touched.filter(F.col("event_type") == _ATTR_CONVERSION)
    channel = F.when(
        F.col("touch_us").isNotNull()
        & (F.unix_micros("ts") - F.col("touch_us") <= _ATTR_LOOKBACK_US),
        F.col("touch_ch"),
    ).otherwise(F.lit("direct"))
    return (
        conv.select(channel.alias("channel"), "value")
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_conversions"),
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("attributed_value"),
        )
    )


_ATTR_TOUCH_LIST = ", ".join(f"'{t}'" for t in _ATTR_TOUCHES)

ATTRIBUTION_SQL = f"""
WITH ev AS (
  SELECT * FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL AND event_id IS NOT NULL
),
touched AS (
  SELECT ts, event_type, value,
         LAST_VALUE(CASE WHEN event_type IN ({_ATTR_TOUCH_LIST})
                         THEN event_type END IGNORE NULLS) OVER w AS touch_ch,
         LAST_VALUE(CASE WHEN event_type IN ({_ATTR_TOUCH_LIST})
                         THEN epoch_us(ts) END IGNORE NULLS) OVER w AS touch_us
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT CASE WHEN touch_us IS NOT NULL
             AND epoch_us(ts) - touch_us <= {_ATTR_LOOKBACK_US}
            THEN touch_ch ELSE 'direct' END AS channel,
       COUNT(*) AS n_conversions,
       ROUND(SUM(value), 2) + 0.0 AS attributed_value
FROM touched
WHERE event_type = '{_ATTR_CONVERSION}'
GROUP BY 1
"""


# Engagement-window widths in days (inclusive trailing windows ending at
# each observed activity day): daily / weekly / monthly active users.
_WAU_DAYS = 7
_MAU_DAYS = 28


def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU: for every observed activity day, the count of distinct
    users active that day, in the trailing 7 days, and in the trailing 28
    days — the standard engagement triple behind stickiness (DAU/MAU)
    reporting.

    Scale shape: activity first collapses to DISTINCT (user, day) — the
    only pass over the raw fact; everything after is bounded by
    |users| × |active days|. The day spine is calendar-bounded (≤ a few
    thousand rows even over a decade) so it BROADCASTs against the
    activity pairs on a 0..27-day band predicate, and one hash agg per
    day computes all three distinct counts with conditional
    COUNT(DISTINCT CASE ...) — no per-window re-scan of the fact, no
    three-way self-join. Counts are integers — cross-engine exact."""
    return engagement_from_activity(activity_pairs(load(spark, "events", sf_dir)))


def activity_pairs(events: DataFrame) -> DataFrame:
    """DISTINCT (user_id, day) activity pairs — the one pass over the raw
    fact that :func:`events_dau_wau_mau` and the incremental engagement
    ingest share, so batch and maintained-table paths can never disagree
    about what "active on day d" means."""
    return (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.to_date(F.col("ts").cast("timestamp")).alias("day"))
        .distinct()
    )


def engagement_from_activity(act: DataFrame) -> DataFrame:
    """DAU/WAU/MAU finalization over a DISTINCT (user_id, day) activity
    frame (see :func:`events_dau_wau_mau` for the shape rationale).

    The band join first collapses to one row per (spine day, user) keyed
    by that user's CLOSEST activity day in the window (min diff) — which
    alone decides all three memberships (dau iff 0, wau iff < 7, mau
    always) — and the final pass is plain conditional counts. No
    multi-count-distinct expand (a 3× row multiplication on the banded
    rows that the 100× sweep showed dominating), one scan of the
    activity frame, two hash aggs total."""
    days = act.select(F.col("day").alias("d")).distinct()
    diff = F.datediff(F.col("d"), F.col("day"))
    closest = (
        act.join(F.broadcast(days), (diff >= 0) & (diff < _MAU_DAYS))
        .groupBy("d", "user_id")
        .agg(F.min(diff).alias("md"))
    )
    return (
        closest.groupBy("d")
        .agg(
            F.count(F.when(F.col("md") == 0, 1)).alias("dau"),
            F.count(F.when(F.col("md") < _WAU_DAYS, 1)).alias("wau"),
            F.count("*").alias("mau"),
        )
        .select(F.col("d").alias("day"), "dau", "wau", "mau")
    )


DAU_WAU_MAU_SQL = f"""
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
days AS (SELECT DISTINCT day AS d FROM act)
SELECT d AS day,
       COUNT(DISTINCT CASE WHEN date_diff('day', act.day, d) = 0
                           THEN user_id END) AS dau,
       COUNT(DISTINCT CASE WHEN date_diff('day', act.day, d) < {_WAU_DAYS}
                           THEN user_id END) AS wau,
       COUNT(DISTINCT user_id) AS mau
FROM days JOIN act
  ON date_diff('day', act.day, d) BETWEEN 0 AND {_MAU_DAYS - 1}
GROUP BY d
"""


def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity seasonality profile: event count and share per (day-of-week,
    hour-of-day) cell — the 7×24 heatmap behind capacity planning, send-time
    optimization and anomaly baselining (an hourly count is only "anomalous"
    relative to its seasonal cell).

    One hash agg over the fact to a ≤168-row frame + a broadcast 1-row
    total — the cheapest possible full-corpus profile at any scale.
    Cross-engine note: Spark's dayofweek is 1=Sunday, DuckDB's is
    0=Sunday — the oracle shifts by one rather than both sides paying a
    CASE remap. Counts are integers; the share divides once, rounded 6."""
    return seasonality_from_counts(
        hourly_counts(load(spark, "events", sf_dir))
    )


def hourly_counts(events: DataFrame) -> DataFrame:
    """DISTINCT-bucket (day, hour, n) event counts — the one pass over the
    raw fact that the seasonality profile, the anomaly ranking, and the
    incremental hourly ingest share (the activity_pairs discipline:
    batch and maintained-table paths cannot disagree about a bucket).
    Counts are ADDITIVE, so per-batch partials merge by summing — the
    mergeable-sums IVM class, no ordering contract."""
    return (
        events.filter(F.col("ts").isNotNull())
        .select(F.to_date(F.col("ts").cast("timestamp")).alias("day"),
                F.hour(F.col("ts").cast("timestamp")).alias("hour"))
        .groupBy("day", "hour")
        .agg(F.count("*").alias("n"))
    )


def merge_hourly_counts(state: DataFrame) -> DataFrame:
    """Collapse appended per-batch count partials to one row per bucket —
    the serve-side merge (and the whole job of ``compact_hourly_counts``)."""
    return state.groupBy("day", "hour").agg(F.sum("n").alias("n"))


def seasonality_from_counts(hc: DataFrame) -> DataFrame:
    """Seasonality finalization over (possibly partial) (day, hour, n)
    rows — the batch op and the maintained-table serving face. A grouped
    sum over (dow, hour) of per-(day, hour) counts is EXACTLY the direct
    per-event count, so parity with the event-scan path is algebraic."""
    merged = merge_hourly_counts(hc)
    total = merged.agg(F.sum("n").alias("total"))
    return (
        merged.groupBy(F.dayofweek("day").alias("dow"), "hour")
        .agg(F.sum("n").alias("n_events"))
        .crossJoin(F.broadcast(total))
        .select(
            "dow",
            "hour",
            "n_events",
            F.round(F.col("n_events") / F.col("total"), 6).alias("share"),
        )
        .orderBy("dow", "hour")
    )


SEASONALITY_SQL = """
WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
total AS (SELECT COUNT(*) AS total FROM ev)
SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
       CAST(hour(ts) AS INT) AS hour,
       COUNT(*) AS n_events,
       ROUND(COUNT(*) / ((SELECT total FROM total) * 1.0), 6) AS share
FROM ev
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-ADJUSTED hourly anomaly ranking: each observed
    (date, hour) bucket is z-scored against the mean/σ of its OWN
    (day-of-week, hour) seasonal cell; the 20 most anomalous buckets
    surface, flagged when |z| ≥ 1.5 — the alerting layer on top of
    ``events_hourly_seasonality`` (a raw count is only anomalous relative
    to "Tuesdays at 9am", which is what the MAD op's global per-type
    baseline can't express). Ranked top-k, not a fixed gate: with c
    observations per cell the population z is bounded by √(c−1), so a
    hard threshold degenerates on short histories — rank answers "what
    should I look at first" at any history length. Absent cells are
    absence-of-traffic, a separate (volume) signal, so the profile is
    over observed buckets only — identical on both engines.

    Two hash aggs (hour buckets ≤ days×24; profile ≤ 168 rows, broadcast
    back) then a TakeOrdered top-k — full-corpus work is the one bucket
    count. σ uses the population form; both engines produce exact 0.0 on
    constant cells (degenerate cells drop), and ordering/flagging use the
    ROUNDED z with (day, hour) ties so a last-ulp σ difference cannot
    reorder or flip membership."""
    return anomalies_from_counts(
        hourly_counts(load(spark, "events", sf_dir))
    )


def anomalies_from_counts(state: DataFrame) -> DataFrame:
    """Anomaly-ranking finalization over (possibly partial) (day, hour, n)
    rows — the batch op and the maintained-table serving face."""
    hc = merge_hourly_counts(state)
    prof = hc.groupBy(F.dayofweek("day").alias("dow"), "hour").agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sd")
    )
    z = F.round((F.col("n") - F.col("mu")) / F.col("sd"), 6)
    return (
        hc.withColumn("dow", F.dayofweek("day"))
        .join(F.broadcast(prof), ["dow", "hour"])
        .filter(F.col("sd") > 0)
        .select(
            "day",
            "hour",
            F.col("n").alias("n_events"),
            F.round("mu", 6).alias("cell_mean"),
            F.round("sd", 6).alias("cell_std"),
            z.alias("z"),
            (F.abs(z) >= 1.5).alias("is_alert"),
        )
        .orderBy(F.desc(F.abs(F.col("z"))), "day", "hour")
        .limit(20)
    )


HOURLY_ANOMALIES_SQL = """
WITH hc AS (
  SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS INT) AS hour,
         COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
prof AS (
  SELECT CAST(dayofweek(day) + 1 AS INT) AS dow, hour,
         AVG(n) AS mu, STDDEV_POP(n) AS sd
  FROM hc GROUP BY 1, 2
),
scored AS (
  SELECT h.day, h.hour AS hour, h.n AS n_events,
         ROUND(p.mu, 6) AS cell_mean,
         ROUND(p.sd, 6) AS cell_std,
         ROUND((h.n - p.mu) / p.sd, 6) AS z
  FROM hc h
  JOIN prof p
    ON p.dow = CAST(dayofweek(h.day) + 1 AS INT) AND p.hour = h.hour
  WHERE p.sd > 0
)
SELECT day, hour, n_events, cell_mean, cell_std, z,
       ABS(z) >= 1.5 AS is_alert
FROM scored
ORDER BY ABS(z) DESC, day, hour
LIMIT 20
"""


def events_power_users_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration (Lorenz) curve by user decile: rank users by
    event count, split into NTILE(10) deciles, report each decile's user
    and event counts plus the CUMULATIVE share of all events — the
    "what fraction of traffic do the top 10% produce" answer behind
    power-user programs, abuse thresholds and sampling-bias checks on
    behavioral training data.

    One user-keyed agg collapses the fact to user cardinality; the decile
    assignment is ADAPTIVE since round 10 (``adaptive_ntile``): below the
    threshold it is the exact global-window NTILE the oracle is written
    in; above it the EXACT sliced-rank plan assigns the identical buckets
    with every slice parallel — no single-task sort at any user count.
    The switch probe is the fact's parquet-footer row count — free.
    Determinism: deciles order by (count DESC, user_id),
    cumulative sums are integers, one division rounded 6."""
    ev = load(spark, "events", sf_dir).filter(F.col("user_id").isNotNull())
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    total = per_user.agg(F.sum("n").alias("total_events"))
    # footer row count of the FACT is a free upper bound on user
    # cardinality — the switch costs no Spark job
    est = parquet_row_count("events", sf_dir)
    dec = adaptive_ntile(
        per_user, 10, "n", "user_id", "decile", descending=True, est_rows=est
    ).select("n", "decile")
    per_dec = dec.groupBy("decile").agg(
        F.count("*").alias("n_users"), F.sum("n").alias("n_events")
    )
    return (
        per_dec.withColumn(
            "cum_events", F.sum("n_events").over(Window.orderBy("decile"))
        )
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_users",
            "n_events",
            F.round(F.col("cum_events") / F.col("total_events"), 6).alias(
                "cum_share"
            ),
        )
        .orderBy("decile")
    )


POWER_USERS_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n FROM events
  WHERE user_id IS NOT NULL GROUP BY 1
),
total AS (SELECT CAST(SUM(n) AS BIGINT) AS total_events FROM per_user),
dec AS (
  SELECT n, NTILE(10) OVER (ORDER BY n DESC, user_id ASC) AS decile
  FROM per_user
),
per_dec AS (
  SELECT decile, COUNT(*) AS n_users, CAST(SUM(n) AS BIGINT) AS n_events
  FROM dec GROUP BY 1
)
SELECT decile, n_users, n_events,
       ROUND(CAST(SUM(n_events) OVER (ORDER BY decile) AS BIGINT)
             / ((SELECT total_events FROM total) * 1.0), 6) AS cum_share
FROM per_dec
ORDER BY decile
"""


def sessions_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the classic ±1 boundary sweep:
    every session (the W5 gap-based sessionization, ONE shared definition
    with ``sessionize``) contributes a +1 at its start and a −1 just after
    its end; the running sum over all boundaries in time order IS the live
    concurrency, and its per-day max is the capacity-planning number no
    plain per-hour count gives (counts miss sessions that SPAN the hour).

    Interval semantics are half-open on exact integer epoch-µs: a session
    is live on [start, end+1µs), so a session ending the same microsecond
    another starts overlaps it — and because the running sum uses the
    default RANGE frame, all boundaries at one instant share one
    cumulative value: tie order can never change the result on either
    engine. Scale shape: the sweep runs over 2·|sessions| boundary rows
    (session cardinality, not event cardinality) as the textbook TWO-PASS
    prefix sum — per-day partitioned cumulative windows (parallel across
    days) plus a calendar-bounded day-offset frame, never one global
    time-ordered sort (the single-window form measured 24× at the 100×
    sweep; day bucketing is prefix-consistent with the time order, so the
    result is bit-identical). The oracle keeps the simple global form —
    same math, different physical plan."""
    from .windows import sessionize

    sess = sessionize(spark, sf_dir)
    starts = sess.select(
        F.unix_micros("session_start").alias("pt"), F.lit(1).alias("delta")
    )
    ends = sess.select(
        (F.unix_micros("session_end") + 1).alias("pt"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionAll(ends).withColumn(
        "day", F.to_date(F.timestamp_micros("pt"))
    )
    # pass 1: per-day delta totals → carry-in offset per day (the day
    # frame is calendar-bounded, so its one ordered window is ≤ a few
    # thousand rows at any corpus size)
    day_off = (
        pts.groupBy("day")
        .agg(F.sum("delta").alias("dsum"))
        .select(
            "day",
            (
                F.sum("dsum").over(Window.orderBy("day")) - F.col("dsum")
            ).alias("off"),
        )
    )
    # pass 2: within-day cumulative (parallel across day partitions;
    # RANGE frame keeps same-instant ties on one shared value) + carry-in
    cum = pts.join(F.broadcast(day_off), "day").withColumn(
        "conc",
        F.col("off")
        + F.sum("delta").over(Window.partitionBy("day").orderBy("pt")),
    )
    return (
        cum.groupBy("day")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
                "n_sessions"
            ),
            F.max("conc").alias("peak_concurrency"),
        )
        .orderBy("day")
    )


SESSION_CONCURRENCY_SQL_TEMPLATE = """
WITH sessions AS ({sessionize_sql}),
pts AS (
  SELECT epoch_us(session_start) AS pt, 1 AS delta FROM sessions
  UNION ALL
  SELECT epoch_us(session_end) + 1 AS pt, -1 AS delta FROM sessions
),
cum AS (
  SELECT pt, delta, SUM(delta) OVER (ORDER BY pt) AS conc FROM pts
)
SELECT CAST(make_timestamp(pt) AS DATE) AS day,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrency
FROM cum
GROUP BY 1
ORDER BY 1
"""


# Association-rule gate: minimum directional confidence worth emitting.
_RULE_MIN_CONF = 0.2


def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules a→b over the user-basket item pairs:
    confidence = P(b | a) = co_users / cnt_a, kept when ≥
    ``_RULE_MIN_CONF``, with support and (symmetric) lift — the
    recommendation-rule mining pass downstream of
    :func:`events_item_cooccurrence`, sharing its basket/pair/cap
    definitions exactly (same ``_user_baskets``/``_basket_pairs`` on the
    engine side, same ``_CO_CTES`` in the oracle, so the two can never
    disagree about what an edge is).

    Each undirected pair fans out to its two directed rules MAP-SIDE
    (explode of a 2-element struct array — no second join); the item
    frequency side joins on the item keys un-hinted (corpus-sized at
    100 TB; AQE decides at small SF) and n_users rides a broadcast 1-row
    aggregate. Ratios are integer counts divided once, rounded at 6 —
    cross-engine exact."""
    co0, cnt, n_users = _taste_graph(spark, sf_dir)
    co = (
        co0
        .join(
            cnt.select(F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a")),
            "item_a",
        )
        .join(
            cnt.select(F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b")),
            "item_b",
        )
    )
    directed = co.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                    F.col("cnt_a").alias("cnt_ante"),
                    F.col("cnt_b").alias("cnt_cons"),
                    F.col("co_users"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                    F.col("cnt_b").alias("cnt_ante"),
                    F.col("cnt_a").alias("cnt_cons"),
                    F.col("co_users"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    result = (
        directed.crossJoin(F.broadcast(n_users))
        .filter(F.col("co_users") / F.col("cnt_ante") >= _RULE_MIN_CONF)
        .select(
            "antecedent",
            "consequent",
            "co_users",
            F.round(F.col("co_users") / F.col("n_users"), 6).alias("support"),
            F.round(F.col("co_users") / F.col("cnt_ante"), 6).alias("confidence"),
            F.round(
                F.col("co_users") * F.col("n_users")
                / (F.col("cnt_ante") * F.col("cnt_cons")),
                6,
            ).alias("lift"),
        )
    )
    return result


ASSOCIATION_RULES_SQL = f"""
WITH {_CO_CTES},
nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM capped),
cnt AS (SELECT item, COUNT(*) AS cnt FROM capped GROUP BY item),
joined AS (
  SELECT co.item_a, co.item_b, co.co_users, ca.cnt AS cnt_a, cb.cnt AS cnt_b
  FROM co
  JOIN cnt ca ON ca.item = co.item_a
  JOIN cnt cb ON cb.item = co.item_b
),
directed AS (
  SELECT item_a AS antecedent, item_b AS consequent,
         cnt_a AS cnt_ante, cnt_b AS cnt_cons, co_users FROM joined
  UNION ALL
  SELECT item_b, item_a, cnt_b, cnt_a, co_users FROM joined
)
SELECT antecedent, consequent, co_users,
       ROUND(co_users / (n_users * 1.0), 6) AS support,
       ROUND(co_users / (cnt_ante * 1.0), 6) AS confidence,
       ROUND(co_users * n_users / (cnt_ante * cnt_cons * 1.0), 6) AS lift
FROM directed, nu
WHERE co_users / (cnt_ante * 1.0) >= {_RULE_MIN_CONF}
"""


def item_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + local clustering coefficient per item over the
    co-occurrence graph — the cohesion signal behind community quality,
    spam-ring detection, and graph-health dashboards. A triangle is three
    items pairwise co-occurring; the coefficient is
    2·triangles / (deg·(deg−1)), the fraction of a node's neighbor pairs
    that are themselves connected (Watts & Strogatz 1998).

    Scale shape: the standard distributed node-iterator++ — edges are
    already canonical (a < b), wedges come from ONE edges⋈edges join on
    the middle vertex (the a<b<c ordering counts each triangle exactly
    once and keeps the wedge count minimal), closed by ONE more join on
    the (a, c) key; per-item counts are an explode + hash agg. All
    shuffles are item-keyed and the graph is item-space-bounded — the
    replicator's 100× user growth fattens edge WEIGHTS, not the vertex
    set. Counts are integers and the coefficient is one division rounded
    at 6 — cross-engine exact. Only items in ≥1 triangle are emitted
    (their degree is ≥2 by construction, so the coefficient denominator
    never hits zero on either engine)."""
    co, _cnt, _n = _taste_graph(spark, sf_dir)
    e = co.select("item_a", "item_b")
    e1 = e.select(F.col("item_a").alias("a"), F.col("item_b").alias("b"))
    e2 = e.select(F.col("item_a").alias("b"), F.col("item_b").alias("c"))
    e3 = e.select(F.col("item_a").alias("a"), F.col("item_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    pert = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("triangles"))
    )
    deg = (
        e.select(F.col("item_a").alias("item"))
        .unionByName(e.select(F.col("item_b").alias("item")))
        .groupBy("item")
        .agg(F.count("*").alias("deg"))
    )
    result = pert.join(deg, "item").select(
        "item",
        "triangles",
        "deg",
        (
            F.round(
                F.lit(2.0) * F.col("triangles")
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            )
            + F.lit(0.0)
        ).alias("clustering"),
    )
    return result


ITEM_TRIANGLES_SQL = f"""
WITH {_CO_CTES},
e AS (SELECT item_a AS a, item_b AS b FROM co),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
pert AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS triangles
  FROM (SELECT unnest([a, b, c]) AS item FROM tri)
  GROUP BY 1
),
deg AS (
  SELECT item, COUNT(*) AS deg FROM (
    SELECT item_a AS item FROM co UNION ALL SELECT item_b FROM co
  ) GROUP BY 1
)
SELECT p.item, p.triangles, d.deg,
       ROUND(2.0 * p.triangles / (d.deg * (d.deg - 1)), 6) + 0.0 AS clustering
FROM pert p JOIN deg d ON d.item = p.item
"""


# Recommendation knobs, interpolated into the oracle: list depth per user
# and the minimum evidence (distinct owned neighbors voting for the
# candidate) worth recommending on.
_REC_TOPK = 3
_REC_MIN_NEIGHBORS = 2


def recommend_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based collaborative filtering: top-``_REC_TOPK`` recommended
    items per user, scored by summing co-occurrence evidence from the
    user's owned items — score(u, j) = Σ_{i ∈ basket(u)} co_users(i, j)
    over the taste-graph edges, candidates already owned are excluded, and
    candidates backed by fewer than ``_REC_MIN_NEIGHBORS`` distinct owned
    items are dropped (a one-edge "recommendation" is noise). The classic
    neighborhood recommender (Sarwar et al. 2001, item-item CF) on the
    SAME basket/edge definitions as co-occurrence/PageRank/rules — the
    four taste-graph ops cannot disagree about an edge.

    Scale shape: ONE (user,item)⋈edges shuffle join keyed on the item (both
    sides corpus-sized at 100 TB — no broadcast hint; AQE decides at small
    SF), one (user, candidate) hash agg, an anti-join back on the owned
    pairs, and a per-user rank-1..N window (WindowGroupLimit bounds rows
    leaving each partition). Per-user work is bounded by the basket cap ×
    per-item edge fan-out; scores are integer-count sums — cross-engine
    exact, no rounding anywhere."""
    baskets = _user_baskets(spark, sf_dir)
    owned = baskets.select(
        "user_id", F.explode("items").alias("item")
    )
    co, _cnt, _n = _taste_graph(spark, sf_dir)
    return checkpoint_release(_recommend_from(owned, co), baskets)


def _recommend_from(owned: DataFrame, co: DataFrame) -> DataFrame:
    """Shared recommender core over (user_id, item) ownership rows and an
    (item_a, item_b, co_users) edge frame — consumed by both the batch
    face and the maintained-index serving path."""
    edges = co.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("rec_item"),
        "co_users",
    ).unionByName(
        co.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("rec_item"),
            "co_users",
        )
    )
    scored = (
        owned.join(edges, "item")
        .groupBy("user_id", "rec_item")
        .agg(
            F.sum("co_users").alias("score"),
            F.count("*").alias("n_neighbors"),
        )
        .filter(F.col("n_neighbors") >= _REC_MIN_NEIGHBORS)
        .join(
            owned.select("user_id", F.col("item").alias("rec_item")),
            ["user_id", "rec_item"],
            "left_anti",
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("score"), F.asc("rec_item")
    )
    return (
        scored.withColumn("rec_rank", F.row_number().over(w))
        .filter(F.col("rec_rank") <= _REC_TOPK)
        .select("user_id", "rec_rank", "rec_item", "score", "n_neighbors")
    )


def recommend_from_index(
    items: DataFrame, delta: DataFrame, cap: int = _CO_USER_CAP
) -> DataFrame:
    """Serve item-CF recommendations from the INCREMENTALLY MAINTAINED
    state (the `start_incremental_cooccurrence_ingest` items + delta
    tables) — exactly equal to the batch :func:`recommend_items` over
    everything ingested (parity test in tests/test_streaming.py), without
    re-scanning the raw event fact: at 100 TB the serving query touches
    only the bounded ownership table and the pair-keyed edge sum."""
    baskets = baskets_from_items(items, cap)
    owned = baskets.select("user_id", F.explode("items").alias("item"))
    return _recommend_from(owned, cooccurrence_edges_from_index(delta))


RECOMMEND_SQL = f"""
WITH {_CO_CTES},
edges AS (
  SELECT item_a AS item, item_b AS rec_item, co_users FROM co
  UNION ALL
  SELECT item_b, item_a, co_users FROM co
),
scored AS (
  SELECT c.user_id, e.rec_item,
         CAST(SUM(e.co_users) AS BIGINT) AS score,
         COUNT(*) AS n_neighbors
  FROM capped c JOIN edges e ON e.item = c.item
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_REC_MIN_NEIGHBORS}
),
unowned AS (
  SELECT s.* FROM scored s
  WHERE NOT EXISTS (SELECT 1 FROM capped o
                    WHERE o.user_id = s.user_id AND o.item = s.rec_item)
)
SELECT user_id, rec_rank, rec_item, score, n_neighbors FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY score DESC, rec_item ASC) AS rec_rank
  FROM unowned
) WHERE rec_rank <= {_REC_TOPK}
"""


# Pinned fixed-width value-histogram bin spec for the incremental quantile
# path. UNLIKE agg_histogram_quantiles' data-derived (min, span) edges —
# which change as data arrives and therefore cannot be maintained
# incrementally — a fixed absolute width makes the bin function pure, so
# per-batch (type, bin, c) partials merge by addition forever (the
# mergeable-sums IVM class). Estimate error ≤ one bin width by
# construction; state size is values-span/width rows per type, not fact
# rows. Production picks width from the metric's unit (here: events.value
# is a ~[0, 500] price-like metric → width 1.0).
_VH_BIN_WIDTH = 1.0


def value_hist(events: DataFrame) -> DataFrame:
    """Fixed-width (event_type, bin, c) value-histogram counts — the one
    pass over the raw fact that the batch quantile readout and the
    incremental value-hist ingest share (the hourly_counts discipline).
    bin = floor(value / width) on the raw double — pure, so partials are
    additive with no ordering contract and late data merges exactly."""
    return (
        events.filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") / F.lit(_VH_BIN_WIDTH)).cast("long").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def merge_value_hist(state: DataFrame) -> DataFrame:
    """Collapse appended per-batch histogram partials to one row per
    (type, bin) — the serve-side merge (and the whole job of
    ``compact_value_hist``)."""
    return state.groupBy("event_type", "bin").agg(F.sum("c").alias("c"))


def quantiles_from_value_hist(state: DataFrame) -> DataFrame:
    """p50/p90/p99 readout over (possibly partial) value-histogram rows:
    merge, then one cumulative window over the ≤ span/width metadata rows
    per type — never the fact. Estimates are deterministic bin LOWER
    EDGES (bin · width), exact integer/double arithmetic both engines."""
    hist = merge_value_hist(state)
    w = Window.partitionBy("event_type").orderBy("bin")
    wall = Window.partitionBy("event_type")
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(wall)
    )
    qcols = [
        F.min(F.when(F.col("cum") >= F.lit(q) * F.col("n"), F.col("bin"))).alias(b)
        for q, b in ((0.5, "b50"), (0.9, "b90"), (0.99, "b99"))
    ]
    est = cum.groupBy("event_type").agg(F.max("n").cast("long").alias("n_events"), *qcols)
    return est.select(
        "event_type",
        "n_events",
        *[
            F.round(F.col(b) * F.lit(_VH_BIN_WIDTH), 6).alias(f"p{p}_est")
            for b, p in (("b50", 50), ("b90", 90), ("b99", 99))
        ],
    ).orderBy("event_type")


def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p90/p99 value quantiles from the PINNED
    fixed-width histogram (NEW round 11) — the latency/price monitoring
    readout whose state the eleventh incremental path
    (``streaming.ingest.start_incremental_value_hist_ingest``) maintains
    at ingest. The op IS the composition ``quantiles_from_value_hist ∘
    value_hist`` — batch and maintained-table serving faces share both
    definitions and cannot diverge.

    The exact-math siblings: ``agg_percentiles`` (full multiset, exact)
    and ``agg_histogram_quantiles`` (data-derived edges, tighter bins,
    not incrementally maintainable). This face trades ≤ one bin width of
    error for a state table that merges by addition forever."""
    return quantiles_from_value_hist(value_hist(load(spark, "events", sf_dir)))


EVENTS_VALUE_QUANTILES_SQL = f"""
WITH h AS (
  SELECT event_type,
         CAST(FLOOR(value / {_VH_BIN_WIDTH}) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_events,
       ROUND(CAST(MIN(CASE WHEN cum >= 0.5 * n THEN bin END) AS DOUBLE)
             * {_VH_BIN_WIDTH}, 6) AS p50_est,
       ROUND(CAST(MIN(CASE WHEN cum >= 0.9 * n THEN bin END) AS DOUBLE)
             * {_VH_BIN_WIDTH}, 6) AS p90_est,
       ROUND(CAST(MIN(CASE WHEN cum >= 0.99 * n THEN bin END) AS DOUBLE)
             * {_VH_BIN_WIDTH}, 6) AS p99_est
FROM cum
GROUP BY event_type
ORDER BY event_type
"""


def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting (NEW round 11): per day, how many active users are
    NEW (first-ever activity day), RETAINED (also active the previous day),
    or RESURRECTED (returned after a gap of 2+ days), and how many CHURNED
    into the day (active the previous day, not this one) — the standard
    DAU-decomposition behind every growth dashboard, with the accounting
    identity dau(d) − dau(d−1) = new + resurrected − churned (pinned in
    tests on consecutive-day pairs).

    Composes the SHARED ``activity_pairs`` definition (one pass over the
    raw fact, the engagement/retention discipline), so lifecycle counts can
    never disagree with DAU/WAU/MAU about what "active on day d" means.
    Churn is attributed to day+1 of an activity day with no next-day
    activity, capped at the corpus max day (nobody churns into a day the
    data hasn't reached).

    Scale shape: distinct pairs → ONE user-keyed window (lag + lead per
    user, shuffle bounded by |activity pairs|, every user independent) →
    two day-keyed hash aggs merged on the day. Integer counts —
    cross-engine exact.

    The op IS the composition ``lifecycle_from_activity ∘ activity_pairs``
    — the engagement ingest (the seventh incremental path) maintains
    exactly that DISTINCT activity table, so growth accounting serves from
    maintained state with ZERO new state (parity asserted in
    tests/test_streaming.py alongside DAU/WAU/MAU)."""
    return lifecycle_from_activity(activity_pairs(load(spark, "events", sf_dir)))


def lifecycle_from_activity(act: DataFrame) -> DataFrame:
    """Growth-accounting finalization over a DISTINCT (user_id, day)
    activity frame (see :func:`events_user_lifecycle` for semantics and
    the shape rationale)."""
    w = Window.partitionBy("user_id").orderBy("day")
    tagged = act.select(
        "user_id",
        "day",
        F.lag("day").over(w).alias("prev"),
        F.lead("day").over(w).alias("nxt"),
    )
    classed = tagged.withColumn(
        "cls",
        F.when(F.col("prev").isNull(), "new")
        .when(F.datediff("day", "prev") == 1, "retained")
        .otherwise("resurrected"),
    )
    active = classed.groupBy("day").agg(
        F.count(F.when(F.col("cls") == "new", 1)).alias("n_new"),
        F.count(F.when(F.col("cls") == "retained", 1)).alias("n_retained"),
        F.count(F.when(F.col("cls") == "resurrected", 1)).alias("n_resurrected"),
    )
    dmax = act.agg(F.max("day").alias("dmax"))
    churn = (
        classed.filter(
            F.col("nxt").isNull() | (F.datediff("nxt", "day") >= 2)
        )
        .select(F.date_add("day", 1).alias("day"))
        .join(F.broadcast(dmax), F.col("day") <= F.col("dmax"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        active.join(churn, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0))
            .cast("long")
            .alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
        .orderBy("day")
    )


USER_LIFECYCLE_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
tagged AS (
  SELECT user_id, day,
         LAG(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev,
         LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
  FROM act
),
classed AS (
  SELECT day,
         CASE WHEN prev IS NULL THEN 'new'
              WHEN date_diff('day', prev, day) = 1 THEN 'retained'
              ELSE 'resurrected' END AS cls,
         nxt
  FROM tagged
),
active AS (
  SELECT day,
         COUNT(CASE WHEN cls = 'new' THEN 1 END) AS n_new,
         COUNT(CASE WHEN cls = 'retained' THEN 1 END) AS n_retained,
         COUNT(CASE WHEN cls = 'resurrected' THEN 1 END) AS n_resurrected
  FROM classed GROUP BY day
),
churn AS (
  SELECT day + INTERVAL 1 DAY AS day, COUNT(*) AS n_churned
  FROM classed
  WHERE (nxt IS NULL OR date_diff('day', day, nxt) >= 2)
    AND day + INTERVAL 1 DAY <= (SELECT MAX(day) FROM act)
  GROUP BY 1
)
SELECT CAST(COALESCE(a.day, c.day) AS DATE) AS day,
       CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
       CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
       CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned
FROM active a FULL OUTER JOIN churn c ON a.day = c.day
ORDER BY day
"""


def daily_type_grid(ev: DataFrame) -> DataFrame:
    """Zero-filled per-type daily count series over the global
    [min day, max day] spine — the one series definition the monitoring
    faces (CUSUM changepoint, seasonal-naive backtest) share. Since
    round 12 the op IS the composition ``grid_from_daily_cells ∘
    daily_type_cells`` — the leaf-cell pass the FIFTEENTH incremental
    path (``streaming.ingest.start_incremental_daily_type_ingest``)
    maintains, so the monitoring dashboard re-reads a
    |types|×|days|-bounded state table per refresh instead of
    re-scanning the fact, and batch/maintained faces cannot diverge."""
    return grid_from_daily_cells(daily_type_cells(ev))


def daily_type_cells(ev: DataFrame) -> DataFrame:
    """Leaf (event_type, day, n) count partials — the one pass over the
    fact that the batch monitoring grid and the incremental daily-type
    ingest share (the hourly_counts discipline). The count is an
    ADDITIVE integer sum, so per-batch partials merge by addition
    forever: the mergeable-sums IVM class, no ordering contract, late
    events exact, state bounded by |types| × calendar days."""
    return (
        ev.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_type", F.to_date(F.col("ts").cast("timestamp")).alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_daily_type_cells(state: DataFrame) -> DataFrame:
    """Collapse appended per-batch cell partials to one row per
    (type, day) — the serve-side merge (and the whole job of
    ``compact_daily_type_cells``)."""
    return state.groupBy("event_type", "day").agg(F.sum("n").alias("n"))


def grid_from_daily_cells(state: DataFrame) -> DataFrame:
    """Zero-filled grid finalization over (possibly partial) daily cells:
    merge, then zero-fill over the global [min day, max day] spine. A
    silent day is a signal, not a gap, so every type's series has the
    same length and statistics are comparable across types. The spine is
    calendar-bounded and BROADCASTs against the distinct-type frame —
    everything after the merge runs on metadata-sized frames."""
    daily = merge_daily_type_cells(state)
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    return (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(spine))
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce("n", F.lit(0)).cast("long").alias("n")
        )
    )


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection (NEW round 11) per event type: the day
    where the cumulative sum of (daily count − the type's mean daily
    count) attains its maximum absolute value — Page's CUSUM statistic,
    the classic single-changepoint estimate for a level shift in a count
    series (the at-most-one-change estimator; ties → earliest day).

    Daily counts are ZERO-FILLED over the global [min day, max day] spine
    (a silent day is a signal, not a gap), so every type's series has the
    same length and the statistic is comparable across types.

    Scale shape: one hash agg over the fact to (type, day, n); the spine
    is calendar-bounded and BROADCASTs against the distinct-type frame;
    the running sum is one window per type partition (types are few, each
    series is spine-length — thousands of rows, not fact-scale). The
    cusum closed form S_d − idx·(total/n_days) uses integer running sums
    and one double division in a pinned operation order, rounded at 6 —
    cross-engine exact. The zero-filled grid is the SHARED
    ``daily_type_grid`` (also the forecast backtest's input — the
    monitoring faces read one series definition)."""
    grid = daily_type_grid(load(spark, "events", sf_dir))
    w = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    cs = grid.select(
        "event_type",
        "day",
        F.row_number().over(w).alias("idx"),
        F.sum("n").over(w).alias("s"),
        F.sum("n").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n_days"),
    ).select(
        "event_type",
        "day",
        "n_days",
        F.round(F.col("total").cast("double") / F.col("n_days"), 6).alias(
            "mean_daily"
        ),
        F.round(
            F.abs(
                F.col("s").cast("double")
                - F.col("idx")
                * (F.col("total").cast("double") / F.col("n_days"))
            ),
            6,
        ).alias("cusum_abs"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.desc("cusum_abs"), F.asc("day")
    )
    return (
        cs.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.col("cusum_abs").alias("max_abs_cusum"),
            "mean_daily",
            F.col("n_days").cast("long").alias("n_days"),
        )
        .orderBy("event_type")
    )


CUSUM_SQL = """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
daily AS (SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2),
spine AS (
  SELECT UNNEST(generate_series(
           (SELECT MIN(day) FROM daily),
           (SELECT MAX(day) FROM daily),
           INTERVAL 1 DAY)) AS day
),
grid AS (
  SELECT t.event_type, CAST(s.day AS DATE) AS day, COALESCE(d.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN spine s
  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = CAST(s.day AS DATE)
),
cs AS (
  SELECT event_type, day,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS idx,
         SUM(n) OVER (PARTITION BY event_type ORDER BY day) AS s,
         SUM(n) OVER (PARTITION BY event_type) AS total,
         COUNT(*) OVER (PARTITION BY event_type) AS n_days
  FROM grid
),
scored AS (
  SELECT event_type, day, n_days,
         ROUND(CAST(total AS DOUBLE) / n_days, 6) AS mean_daily,
         ROUND(ABS(CAST(s AS DOUBLE)
                   - idx * (CAST(total AS DOUBLE) / n_days)), 6) AS cusum_abs,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ROUND(ABS(CAST(s AS DOUBLE)
                                   - idx * (CAST(total AS DOUBLE) / n_days)), 6)
                                     DESC, day ASC) AS rn
  FROM cs
)
SELECT event_type, day AS change_day, cusum_abs AS max_abs_cusum,
       mean_daily, CAST(n_days AS BIGINT) AS n_days
FROM scored WHERE rn = 1
ORDER BY event_type
"""


# Seasonal-naive forecast horizon: predict day d with day d−7 (same
# weekday last week) — the standard no-model baseline every real
# forecaster must beat, and the cheapest honest drift monitor.
_FC_LAG_DAYS = 7


def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest (NEW round 12) per event type:
    predict each day's event count with the count from the same weekday
    one week earlier, then score the forecast over every evaluable day —
    MAE, signed bias, and sMAPE (0/0 days score 0). This is the
    baseline-quality gate a volume-forecasting pipeline runs before
    trusting any learned model ("does it beat seasonal-naive?") and a
    drift monitor in its own right (a regime change inflates the
    baseline's error immediately).

    Reads the SHARED ``daily_type_grid`` zero-filled series (the CUSUM
    face's input — the two monitors cannot disagree about the series).
    Scale shape: after the one (type, day) hash agg everything runs on
    the calendar-bounded grid: lag(7) per type partition, one hash agg
    to |types| rows. MAE/bias average exact integer differences (AVG
    over bigint = sum/count in double, the rollup_from_cells identity);
    sMAPE terms are per-row doubles in a pinned operation order summed
    at round-6 (the accepted float-sum-order class)."""
    grid = daily_type_grid(load(spark, "events", sf_dir))
    w = Window.partitionBy("event_type").orderBy("day")
    p = grid.withColumn("pred", F.lag("n", _FC_LAG_DAYS).over(w)).filter(
        F.col("pred").isNotNull()
    )
    n, pred = F.col("n"), F.col("pred")
    smape_term = F.when(
        n + pred > 0,
        F.abs(n - pred).cast("double") / ((n + pred) / 2.0),
    ).otherwise(F.lit(0.0))
    return (
        p.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days_eval"),
            F.sum("n").cast("long").alias("total_actual"),
            F.sum("pred").cast("long").alias("total_pred"),
            F.round(F.avg(F.abs(n - pred).cast("double")), 6).alias("mae"),
            F.round(F.avg((pred - n).cast("double")), 6).alias("bias"),
            F.round(F.avg(smape_term), 6).alias("smape"),
        )
        .orderBy("event_type")
    )


FORECAST_BACKTEST_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
daily AS (SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2),
spine AS (
  SELECT UNNEST(generate_series(
           (SELECT MIN(day) FROM daily),
           (SELECT MAX(day) FROM daily),
           INTERVAL 1 DAY)) AS day
),
grid AS (
  SELECT t.event_type, CAST(s.day AS DATE) AS day, COALESCE(d.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN spine s
  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = CAST(s.day AS DATE)
),
p AS (
  SELECT * FROM (
    SELECT event_type, day, n,
           LAG(n, {_FC_LAG_DAYS}) OVER (PARTITION BY event_type
                                        ORDER BY day) AS pred
    FROM grid
  ) WHERE pred IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days_eval,
       CAST(SUM(n) AS BIGINT) AS total_actual,
       CAST(SUM(pred) AS BIGINT) AS total_pred,
       ROUND(AVG(CAST(ABS(n - pred) AS DOUBLE)), 6) AS mae,
       ROUND(AVG(CAST(pred - n AS DOUBLE)), 6) AS bias,
       ROUND(AVG(CASE WHEN n + pred > 0
                      THEN CAST(ABS(n - pred) AS DOUBLE) / ((n + pred) / 2.0)
                      ELSE 0.0 END), 6) AS smape
FROM p
GROUP BY event_type
ORDER BY event_type
"""


def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (NEW round 12): every touch within
    the 7-day lookback of the user's NEXT conversion shares that
    conversion's value equally — the multi-touch counterpart of
    ``attribution_last_touch`` (same touch/conversion/lookback
    definitions), answering "which channels participated" instead of
    "which channel closed".

    Scale shape — one user_id shuffle total, the last-touch discipline
    flipped forward: a single ROWS frame (1 FOLLOWING..UNBOUNDED) per
    user carries each touch's next conversion (timestamp, id, value) —
    never a per-conversion range join. Per-conversion touch counts are
    one hash agg on conv_id; credit = value / n_touches divides BEFORE
    the channel rollup (each conversion distributes exactly its value).
    Conversions with no in-lookback touch credit 'direct' in full, so
    Σ attributed_value = Σ conversion value — the conservation identity
    pinned in tests. Money sums follow the q1 idiom (ROUND(,2) +0.0)."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    is_touch = F.col("event_type").isin(_ATTR_TOUCHES)
    is_conv = F.col("event_type") == _ATTR_CONVERSION

    def nxt(expr):
        return F.first(F.when(is_conv, expr), ignorenulls=True).over(wf)

    rows = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        "value",
        "event_id",
        nxt(F.unix_micros("ts")).alias("conv_us"),
        nxt(F.col("event_id")).alias("conv_id"),
        nxt(F.col("value")).alias("conv_value"),
    )
    touches = rows.filter(
        is_touch
        & F.col("conv_us").isNotNull()
        & (F.col("conv_us") - F.col("us") <= _ATTR_LOOKBACK_US)
    ).select(F.col("event_type").alias("channel"), "conv_id", "conv_value")
    counts = touches.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_t"))
    credited = touches.join(counts, "conv_id").select(
        "channel", "conv_id", (F.col("conv_value") / F.col("n_t")).alias("credit")
    )
    attr = credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("conv_id").alias("n_conversions"),
        (F.round(F.sum("credit"), 2) + F.lit(0.0)).alias("attributed_value"),
    )
    direct = (
        ev.filter(is_conv)
        .select(F.col("event_id").alias("conv_id"), "value")
        .join(counts, "conv_id", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("attributed_value"),
        )
        .select(
            F.lit("direct").alias("channel"),
            F.lit(0).cast("long").alias("n_touches"),
            "n_conversions",
            "attributed_value",
        )
        .filter(F.col("n_conversions") > 0)
    )
    return attr.unionByName(direct).orderBy("channel")


ATTRIBUTION_LINEAR_SQL = f"""
WITH ev AS (
  SELECT * FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL AND event_id IS NOT NULL
),
rows_ AS (
  SELECT event_type, epoch_us(ts) AS us, value, event_id,
         FIRST_VALUE(CASE WHEN event_type = '{_ATTR_CONVERSION}'
                          THEN epoch_us(ts) END IGNORE NULLS)
           OVER wf AS conv_us,
         FIRST_VALUE(CASE WHEN event_type = '{_ATTR_CONVERSION}'
                          THEN event_id END IGNORE NULLS)
           OVER wf AS conv_id,
         FIRST_VALUE(CASE WHEN event_type = '{_ATTR_CONVERSION}'
                          THEN value END IGNORE NULLS)
           OVER wf AS conv_value
  FROM ev
  WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
),
touches AS (
  SELECT event_type AS channel, conv_id, conv_value
  FROM rows_
  WHERE event_type IN ({_ATTR_TOUCH_LIST})
    AND conv_us IS NOT NULL
    AND conv_us - us <= {_ATTR_LOOKBACK_US}
),
counts AS (SELECT conv_id, COUNT(*) AS n_t FROM touches GROUP BY conv_id),
credited AS (
  SELECT t.channel, t.conv_id, t.conv_value / c.n_t AS credit
  FROM touches t JOIN counts c USING (conv_id)
),
attr AS (
  SELECT channel,
         CAST(COUNT(*) AS BIGINT) AS n_touches,
         CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions,
         ROUND(SUM(credit), 2) + 0.0 AS attributed_value
  FROM credited GROUP BY channel
),
direct AS (
  SELECT 'direct' AS channel,
         CAST(0 AS BIGINT) AS n_touches,
         CAST(COUNT(*) AS BIGINT) AS n_conversions,
         ROUND(SUM(e.value), 2) + 0.0 AS attributed_value
  FROM ev e
  WHERE e.event_type = '{_ATTR_CONVERSION}'
    AND e.event_id NOT IN (SELECT conv_id FROM counts)
  HAVING COUNT(*) > 0
)
SELECT * FROM attr
UNION ALL
SELECT * FROM direct
ORDER BY channel
"""


# Benford first-digit probabilities log10(1 + 1/d), pinned as literals
# (the one libm-free way to share them across engines).
_BENFORD_P = (0.301029996, 0.176091259, 0.124938737, 0.096910013,
              0.079181246, 0.066946790, 0.057991947, 0.051152522,
              0.045757491)


def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals (NEW round 15) — the
    classic forensic/data-quality screen: naturally occurring
    multi-magnitude amounts follow log10(1+1/d); fabricated or
    truncated data does not. Reports per-digit observed vs expected
    counts and the overall χ² — on the synthetic fixture (uniform-ish
    totals) the audit honestly reports a LARGE χ², which is exactly the
    point: it flags distributions that are not Benford-like.

    Exactness: the first digit comes from the INTEGER-cents string
    (never floor(log10(x)) — a libm boundary hazard), the nine Benford
    probabilities are pinned literals, and χ² sums nine closed-form
    terms in digit order via a window — one ROUND(6).

    Scale: one scan → 9-row hash agg; everything after runs on the
    9-row digit frame."""
    obs = benford_digit_cells(load(spark, "orders", sf_dir))
    return benford_from_digit_cells(spark, obs)


def benford_digit_cells(orders: DataFrame) -> DataFrame:
    """(digit, n_obs) first-digit count partials from an orders frame —
    the leaf pass the batch audit and the TWENTY-FOURTH incremental path
    share. Counts are additive integer sums: partials from any batch
    split merge by addition forever (mergeable-sums IVM class; the
    fraud monitor's entire state is ≤ 9 rows of counters)."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    first = F.substring(cents.cast("string"), 1, 1).cast("int")
    return (
        orders.filter(
            F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") > 0)
        )
        .select(first.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )


def merge_benford_cells(state: DataFrame) -> DataFrame:
    """Collapse appended digit partials — the serve-side merge (and the
    whole job of ``compact_benford_cells``)."""
    return state.groupBy("digit").agg(F.sum("n_obs").alias("n_obs"))


def benford_from_digit_cells(spark: SparkSession, state: DataFrame) -> DataFrame:
    """The audit served from (possibly partial) digit cells — ≡ batch
    ``benford_digit_audit`` over everything ingested (parity test in
    tests/test_streaming.py): the forensic screen refreshes from a
    9-row counter table, never re-scanning the fact."""
    obs = merge_benford_cells(state)
    pmap = spark.createDataFrame(
        [(d + 1, p) for d, p in enumerate(_BENFORD_P)],
        "digit int, p_benford double",
    )
    wall = Window.partitionBy()
    g = (
        pmap.join(obs, "digit", "left")
        .select(
            "digit",
            "p_benford",
            F.coalesce("n_obs", F.lit(0).cast("long")).alias("n_obs"),
        )
        .withColumn("n_total", F.sum("n_obs").over(wall))
    )
    exp = F.col("n_total") * F.col("p_benford")
    # empty-corpus guard: ANSI mode makes x/0 THROW, so every division
    # gates on n_total > 0 (an empty audit emits NULL shares/chi2)
    nonempty = F.col("n_total") > 0
    term = F.when(
        nonempty, (F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp
    )
    return (
        g.withColumn("chi2_total", F.round(F.sum(term).over(wall), 6))
        .select(
            "digit",
            "n_obs",
            # floor-of-shifted, never round(): n_total·p lands exactly on
            # 4th-decimal midpoints and the engines' tie rules differ
            (F.floor(exp * 10000 + F.lit(0.5)) / 10000.0).alias("expected_n"),
            F.when(nonempty, F.round(F.col("n_obs") / F.col("n_total"), 6))
            .alias("obs_share"),
            "p_benford",
            "chi2_total",
        )
        .orderBy("digit")
    )


_BENFORD_VALUES = ", ".join(
    f"({d + 1}, {p!r})" for d, p in enumerate(_BENFORD_P)
)

BENFORD_SQL = f"""
WITH obs AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit,
         COUNT(*) AS n_obs
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
  GROUP BY 1
),
pmap0(digit, p_raw) AS (VALUES {_BENFORD_VALUES}),
pmap AS (SELECT digit, CAST(p_raw AS DOUBLE) AS p_benford FROM pmap0),
g AS (
  SELECT p.digit, p.p_benford, COALESCE(o.n_obs, 0) AS n_obs,
         SUM(COALESCE(o.n_obs, 0)) OVER () AS n_total
  FROM pmap p LEFT JOIN obs o ON o.digit = p.digit
)
SELECT digit,
       CAST(n_obs AS BIGINT) AS n_obs,
       FLOOR(n_total * p_benford * 10000 + 0.5) / 10000.0 AS expected_n,
       CASE WHEN n_total > 0
            THEN ROUND(n_obs / (n_total * 1.0), 6) END AS obs_share,
       p_benford,
       ROUND(SUM(CASE WHEN n_total > 0
                      THEN (n_obs - n_total * p_benford)
                           * (n_obs - n_total * p_benford)
                           / (n_total * p_benford) END) OVER (), 6)
         AS chi2_total
FROM g
ORDER BY digit
"""


def experiment_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test on mean per-user event value (NEW round
    15) — the CONTINUOUS-metric significance readout completing the
    experimentation family (the z-test handles conversion rates; CUPED
    adjusts; DiD differences; this answers "did the treatment move
    spend per user?" without assuming equal variances). Same md5 arm
    law as the whole family; metric = each user's total event value in
    integer cents; t = (m̄₁−m̄₀)/√(s₁²/n₁+s₀²/n₀) with the
    Welch–Satterthwaite degrees of freedom.

    Exactness: per-arm moments are exact integer sums (n, Σx, Σx² in
    cents), sample variances and the t/df closed forms evaluate in a
    pinned IEEE operation order with one ROUND(6) each; degenerate arms
    (n ≤ 1 or both variances zero) emit NULL t/df on both engines.

    Scale shape: one user-keyed collapse over the fact (the
    activity_pairs discipline), a 2-row hash agg, a 1-row closed form."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    users = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 2
    )
    per_arm = users.select(arm.alias("arm"), "cents").groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("cents") * F.col("cents")).alias("sxx"),
    )
    a = per_arm.filter(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("sx").alias("sx0"),
        F.col("sxx").alias("sxx0"),
    )
    b = per_arm.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("sx").alias("sx1"),
        F.col("sxx").alias("sxx1"),
    )
    m = a.crossJoin(F.broadcast(b))

    def mean(sx, n):
        return sx.cast("double") / n.cast("double")

    def svar(sxx, sx, n):
        return (
            (n.cast("double") * sxx.cast("double")
             - sx.cast("double") * sx.cast("double"))
            / (n.cast("double") * (n - 1).cast("double"))
        )

    n0, n1 = F.col("n0"), F.col("n1")
    m0, m1 = mean(F.col("sx0"), n0), mean(F.col("sx1"), n1)
    v0 = svar(F.col("sxx0"), F.col("sx0"), n0)
    v1 = svar(F.col("sxx1"), F.col("sx1"), n1)
    se2 = v0 / n0.cast("double") + v1 / n1.cast("double")
    t = (m1 - m0) / F.sqrt(se2)
    df = (se2 * se2) / (
        (v0 / n0.cast("double")) * (v0 / n0.cast("double"))
        / (n0 - 1).cast("double")
        + (v1 / n1.cast("double")) * (v1 / n1.cast("double"))
        / (n1 - 1).cast("double")
    )
    ok = (n0 > 1) & (n1 > 1) & (se2 > 0)
    return m.select(
        n0.cast("long").alias("n0"),
        n1.cast("long").alias("n1"),
        F.round(m0 / 100.0, 4).alias("mean_value_0"),
        F.round(m1 / 100.0, 4).alias("mean_value_1"),
        F.when(ok, F.round(t, 6)).alias("t_stat"),
        F.when(ok, F.round(df, 6)).alias("welch_df"),
    )


WELCH_TTEST_SQL = """
WITH u AS (
  SELECT user_id,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
  GROUP BY user_id
),
pa AS (
  SELECT (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS INT)
          % 2) AS arm,
         COUNT(*) AS n, SUM(cents) AS sx, SUM(cents * cents) AS sxx
  FROM u GROUP BY 1
),
m AS (
  SELECT a.n AS n0, a.sx AS sx0, a.sxx AS sxx0,
         b.n AS n1, b.sx AS sx1, b.sxx AS sxx1
  FROM (SELECT * FROM pa WHERE arm = 0) a,
       (SELECT * FROM pa WHERE arm = 1) b
),
c AS (
  SELECT n0, n1,
         CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
         CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
         (CAST(n0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
          - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE))
         / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE)) AS v0,
         (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
          - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
         / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)) AS v1
  FROM m
),
s AS (
  SELECT n0, n1, m0, m1, v0, v1,
         v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE) AS se2
  FROM c
)
SELECT CAST(n0 AS BIGINT) AS n0,
       CAST(n1 AS BIGINT) AS n1,
       ROUND(m0 / 100.0, 4) AS mean_value_0,
       ROUND(m1 / 100.0, 4) AS mean_value_1,
       CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0
            THEN ROUND((m1 - m0) / SQRT(se2), 6) END AS t_stat,
       CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0
            THEN ROUND(se2 * se2 /
                       ((v0 / CAST(n0 AS DOUBLE)) * (v0 / CAST(n0 AS DOUBLE))
                        / CAST(n0 - 1 AS DOUBLE)
                        + (v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
                        / CAST(n1 - 1 AS DOUBLE)), 6) END AS welch_df
FROM s
"""


def experiment_ab_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment readout (NEW round 12): users split
    into two arms by an md5 hash of their id (the cross-engine
    ``_split_of`` discipline — assignment is a pure function, replayable
    forever), metric = "did the user purchase", effect read as the rate
    lift and the two-proportion pooled z-score — the minimal
    experimentation readout every growth team ships before reaching for
    a stats library (the p-value lookup is a monotone function of |z|;
    the engine emits the statistic, the dashboard draws the line at
    1.96).

    Scale shape: ONE distinct-user collapse over the fact (user, ever
    purchased) — the activity_pairs discipline — then a 2-row hash agg
    and a 1-row closed form. Counts are integers; rates/lift/z divide in
    a pinned IEEE operation order and round at 6; degenerate arms (empty,
    or pooled rate 0/1 making the variance zero) emit NULL z on both
    engines."""
    ev = load(spark, "events", sf_dir).filter(F.col("user_id").isNotNull())
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == _ATTR_CONVERSION).cast("int")).alias(
            "converted"
        )
    )
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 2
    )
    per_arm = users.select(arm.alias("arm"), "converted").groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("c")
    )
    a = per_arm.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("c").alias("c_a")
    )
    b = per_arm.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("c").alias("c_b")
    )
    m = a.crossJoin(F.broadcast(b))
    n_a, c_a = F.col("n_a"), F.col("c_a")
    n_b, c_b = F.col("n_b"), F.col("c_b")
    p_a = c_a.cast("double") / n_a
    p_b = c_b.cast("double") / n_b
    pool = (c_a + c_b).cast("double") / (n_a + n_b)
    var = pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b)
    return m.select(
        n_a.cast("long").alias("n_a"),
        c_a.cast("long").alias("conv_a"),
        F.round(p_a, 6).alias("rate_a"),
        n_b.cast("long").alias("n_b"),
        c_b.cast("long").alias("conv_b"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(p_b - p_a, 6).alias("lift"),
        F.when((n_a > 0) & (n_b > 0) & (pool > 0) & (pool < 1),
               F.round((p_b - p_a) / F.sqrt(var), 6)).alias("z_score"),
    )


EXPERIMENT_AB_SQL = f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = '{_ATTR_CONVERSION}' THEN 1 ELSE 0 END)
           AS converted
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
arms AS (
  SELECT (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS INT)
          % 2) AS arm, converted
  FROM users
),
per_arm AS (SELECT arm, COUNT(*) AS n, SUM(converted) AS c
            FROM arms GROUP BY arm),
m AS (
  SELECT a.n AS n_a, a.c AS c_a, b.n AS n_b, b.c AS c_b
  FROM (SELECT * FROM per_arm WHERE arm = 0) a
  CROSS JOIN (SELECT * FROM per_arm WHERE arm = 1) b
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS conv_a,
       ROUND(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS conv_b,
       ROUND(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
       ROUND(CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a, 6) AS lift,
       CASE WHEN n_a > 0 AND n_b > 0
             AND CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) > 0
             AND CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) < 1
            THEN ROUND((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
                       / SQRT((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                              * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                              * (1.0 / n_a + 1.0 / n_b)), 6)
       END AS z_score
FROM m
"""


def events_type_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical mix-drift monitor (NEW round 12): per ISO week, the
    Jensen-Shannon divergence between that week's event-type mix and the
    overall corpus mix — the "did the traffic composition change"
    dashboard line that catches an instrumentation break or a bot wave
    before any single-type monitor fires (the categorical twin of
    ``source_unigram_divergence``, on the events axis the CUSUM monitors
    per type).

    Scale shape: one (week, type) hash agg over the fact; the week×type
    grid (weeks calendar-bounded × |types|) is metadata-sized, overall
    totals broadcast as one row. Integer counts; per-cell p/q/log terms
    in identical IEEE shapes, per-week sums over ≤ |types| terms round
    at 6."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    wk = ev.select(
        F.date_trunc("week", F.col("ts").cast("timestamp"))
        .cast("date")
        .alias("week"),
        "event_type",
    )
    cells = wk.groupBy("week", "event_type").agg(F.count(F.lit(1)).alias("c"))
    week_tot = cells.groupBy("week").agg(F.sum("c").alias("n_w"))
    type_tot = cells.groupBy("event_type").agg(F.sum("c").alias("c_t"))
    tot = type_tot.agg(F.coalesce(F.sum("c_t"), F.lit(0)).alias("n"))
    grid = (
        week_tot.crossJoin(F.broadcast(type_tot))
        .join(cells, ["week", "event_type"], "left")
        .select(
            "week",
            "n_w",
            "c_t",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("c").cast("double") / F.col("n_w")
    q = F.col("c_t").cast("double") / F.col("n")
    mm = (p + q) / 2
    jsd_term = (
        F.when(F.col("c") > 0, p * F.log(p / mm)).otherwise(F.lit(0.0)) * 0.5
        + (q * F.log(q / mm)) * 0.5
    )
    return (
        grid.groupBy("week")
        .agg(
            F.max("n_w").cast("long").alias("n_events"),
            F.sum((F.col("c") > 0).cast("long")).alias("n_types_seen"),
            F.round(F.sum(jsd_term), 6).alias("jsd_vs_overall"),
        )
        .orderBy("week")
    )


EVENTS_TYPE_MIX_SQL = """
WITH ev AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week, event_type
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
cells AS (SELECT week, event_type, COUNT(*) AS c FROM ev GROUP BY 1, 2),
week_tot AS (SELECT week, SUM(c) AS n_w FROM cells GROUP BY week),
type_tot AS (SELECT event_type, SUM(c) AS c_t FROM cells GROUP BY event_type),
tot AS (SELECT COALESCE(SUM(c_t), 0) AS n FROM type_tot),
grid AS (
  SELECT w.week, w.n_w, t.c_t, COALESCE(cl.c, 0) AS c, x.n
  FROM week_tot w CROSS JOIN type_tot t CROSS JOIN tot x
  LEFT JOIN cells cl ON cl.week = w.week AND cl.event_type = t.event_type
),
terms AS (
  SELECT week, n_w, c,
         CAST(c AS DOUBLE) / n_w AS p,
         CAST(c_t AS DOUBLE) / n AS q
  FROM grid
)
SELECT week,
       CAST(MAX(n_w) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_types_seen,
       ROUND(SUM((CASE WHEN c > 0 THEN p * LN(p / ((p + q) / 2))
                       ELSE 0.0 END) * 0.5
                 + (q * LN(q / ((p + q) / 2))) * 0.5), 6) AS jsd_vs_overall
FROM terms
GROUP BY week
ORDER BY week
"""


def impute_events_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-repair face (NEW round 12): NULL event values imputed with
    their type's EXACT median — the deterministic cleaning step a
    pipeline applies before any value-weighted aggregate, using the SAME
    scale-adaptive exact-median machinery as ``events_anomaly_mad`` (the
    repair and the outlier monitor cannot disagree about the center).
    Every row survives: non-null values pass through, NULL values take
    the group median (value itself, no arithmetic — cross-engine exact),
    groups with NO observed values stay NULL with was_imputed still
    flagged (an honest repair never invents a number). NULL event_type
    rows form their own '(none)' group on both engines.

    Scale shape: the median runs on the non-null projection via
    ``_disc_median_select`` (histogram plan for small domains, sliced
    ranks for huge groups — never a global sort); the repair itself is
    one left join of the fact against the |types|-row median frame."""
    ev = load_spread(spark, "events", sf_dir).filter(
        F.col("event_id").isNotNull()
    ).select(
        "event_id",
        "event_type",
        F.coalesce("event_type", F.lit("(none)")).alias("k"),
        "value",
    )
    med = _disc_median_select(
        ev.filter(F.col("value").isNotNull()).select("k", "event_id", "value"),
        "k",
        "event_id",
        "value",
        "type_median",
    )
    return (
        ev.join(F.broadcast(med), "k", "left")
        .select(
            "event_id",
            "event_type",
            F.coalesce("value", "type_median").alias("value_imputed"),
            F.col("value").isNull().alias("was_imputed"),
        )
        .orderBy("event_id")
    )


IMPUTE_EVENTS_SQL = """
WITH ev AS (
  SELECT event_id, event_type,
         COALESCE(event_type, '(none)') AS k, value
  FROM events WHERE event_id IS NOT NULL
),
nn AS (SELECT k, event_id, value FROM ev WHERE value IS NOT NULL),
med AS (
  SELECT k, value AS type_median FROM (
    SELECT k, value,
           ROW_NUMBER() OVER (PARTITION BY k
                              ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY k) AS n
    FROM nn
  ) WHERE rn = (n + 1) // 2
)
SELECT e.event_id, e.event_type,
       COALESCE(e.value, m.type_median) AS value_imputed,
       e.value IS NULL AS was_imputed
FROM ev e LEFT JOIN med m ON m.k = e.k
ORDER BY e.event_id
"""


def experiment_cuped_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (NEW round 12; Deng et
    al., WSDM'13 — the industry-standard pre-experiment covariate
    adjustment): per user, x = pre-period event count and y = post-period
    purchase value (periods split at the midpoint of the observed day
    span — deterministic from the data, broadcast as one row); arms from
    the SAME md5 assignment as ``experiment_ab_eval``; θ = cov(x, y) /
    var(x) pooled, adjusted metric y′ = y − θ·(x − x̄). Emits θ, raw and
    CUPED-adjusted lift, and the variance-reduction ratio
    1 − var(y − θx)/var(y) — how much experiment runtime the covariate
    buys.

    Scale shape: one distinct-user collapse computing (x, y) per user,
    one 2-row per-arm moment agg + a 1-row pooled-moment agg (Σx, Σy,
    Σxy, Σx², Σy², all map-side combinable), closed form on the tiny
    frame. Moment sums are the round-6 float-sum-order class; every
    division happens once on the 1-row frame. Zero pre-period variance
    (a corpus with no pre-period signal) emits NULL θ/adjusted columns
    on both engines."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    days = ev.select(F.to_date("ts").alias("d")).agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    # midpoint day: pre-period = days strictly before it
    mid = days.select(
        F.expr("date_add(d0, CAST(floor(datediff(d1, d0) / 2) AS INT))").alias(
            "mid"
        )
    )
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(
                (F.to_date("ts") < F.col("mid")).cast("long")
            ).alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.to_date("ts") >= F.col("mid"))
                        & (F.col("event_type") == _ATTR_CONVERSION),
                        F.col("value"),
                    )
                ),
                F.lit(0.0),
            ).alias("y"),
        )
    )
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 2
    )
    pu = per_user.select(arm.alias("arm"), "x", "y")
    pooled = pu.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    arms = pu.groupBy("arm").agg(
        F.count(F.lit(1)).alias("an"),
        F.sum("x").alias("asx"),
        F.sum("y").alias("asy"),
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("an").alias("n_a"), F.col("asx").alias("sx_a"),
        F.col("asy").alias("sy_a"),
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("an").alias("n_b"), F.col("asx").alias("sx_b"),
        F.col("asy").alias("sy_b"),
    )
    m = pooled.crossJoin(F.broadcast(a)).crossJoin(F.broadcast(b))
    n = F.col("n").cast("double")
    mean_x = F.col("sx") / n
    var_x = F.col("sxx") / n - mean_x * mean_x
    cov = F.col("sxy") / n - mean_x * (F.col("sy") / n)
    theta = cov / var_x
    mean_y = F.col("sy") / n
    var_y = F.col("syy") / n - mean_y * mean_y
    var_adj = var_y - (cov * cov) / var_x
    ya, yb = F.col("sy_a") / F.col("n_a"), F.col("sy_b") / F.col("n_b")
    xa, xb = F.col("sx_a") / F.col("n_a"), F.col("sx_b") / F.col("n_b")
    ok = var_x > 0
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        F.when(ok, F.round(theta, 6)).alias("theta"),
        F.round(yb - ya, 6).alias("lift_raw"),
        F.when(
            ok,
            F.round((yb - theta * (xb - mean_x)) - (ya - theta * (xa - mean_x)), 6),
        ).alias("lift_cuped"),
        F.when(ok & (var_y > 0), F.round(1.0 - var_adj / var_y, 6)).alias(
            "variance_reduction"
        ),
    )


EXPERIMENT_CUPED_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d, event_type, value
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
mid AS (
  SELECT MIN(d) + CAST(FLOOR((MAX(d) - MIN(d)) / 2) AS INT) AS mid FROM ev
),
per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN d < (SELECT mid FROM mid) THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         COALESCE(SUM(CASE WHEN d >= (SELECT mid FROM mid)
                            AND event_type = '{_ATTR_CONVERSION}'
                           THEN value END), 0.0) AS y
  FROM ev GROUP BY user_id
),
pu AS (
  SELECT (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS INT)
          % 2) AS arm, x, y
  FROM per_user
),
pooled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx,
         SUM(y * y) AS syy
  FROM pu
),
arms AS (SELECT arm, COUNT(*) AS an, SUM(x) AS asx, SUM(y) AS asy
         FROM pu GROUP BY arm),
m AS (
  SELECT p.*, a.an AS n_a, a.asx AS sx_a, a.asy AS sy_a,
         b.an AS n_b, b.asx AS sx_b, b.asy AS sy_b
  FROM pooled p
  CROSS JOIN (SELECT * FROM arms WHERE arm = 0) a
  CROSS JOIN (SELECT * FROM arms WHERE arm = 1) b
)
SELECT n AS n_users,
  CASE WHEN CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
            * (CAST(sx AS DOUBLE) / n) > 0
       THEN ROUND((sxy / n - (CAST(sx AS DOUBLE) / n) * (sy / n))
                  / (CAST(sxx AS DOUBLE) / n
                     - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)), 6)
  END AS theta,
  ROUND(sy_b / n_b - sy_a / n_a, 6) AS lift_raw,
  CASE WHEN CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
            * (CAST(sx AS DOUBLE) / n) > 0
       THEN ROUND((sy_b / n_b
                   - ((sxy / n - (CAST(sx AS DOUBLE) / n) * (sy / n))
                      / (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
                         * (CAST(sx AS DOUBLE) / n)))
                     * (CAST(sx_b AS DOUBLE) / n_b - CAST(sx AS DOUBLE) / n))
                  - (sy_a / n_a
                     - ((sxy / n - (CAST(sx AS DOUBLE) / n) * (sy / n))
                        / (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
                           * (CAST(sx AS DOUBLE) / n)))
                       * (CAST(sx_a AS DOUBLE) / n_a
                          - CAST(sx AS DOUBLE) / n)), 6)
  END AS lift_cuped,
  CASE WHEN CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
            * (CAST(sx AS DOUBLE) / n) > 0
        AND syy / n - (sy / n) * (sy / n) > 0
       THEN ROUND(1.0 - ((syy / n - (sy / n) * (sy / n))
                         - ((sxy / n - (CAST(sx AS DOUBLE) / n) * (sy / n))
                            * (sxy / n - (CAST(sx AS DOUBLE) / n) * (sy / n)))
                           / (CAST(sxx AS DOUBLE) / n
                              - (CAST(sx AS DOUBLE) / n)
                                * (CAST(sx AS DOUBLE) / n)))
                  / (syy / n - (sy / n) * (sy / n)), 6)
  END AS variance_reduction
FROM m
"""


# Wilson 95% interval z (pinned literal so both engines compute the same
# closed form; the interval is the standard conversion-funnel error bar).
_WILSON_Z = 1.96


def touch_conversion_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel touch→conversion rate with a Wilson 95% interval (NEW
    round 12): every touch event is a Bernoulli trial — did the user's
    next conversion arrive within the attribution lookback? — so each
    channel gets (trials, successes, rate, wilson_lo, wilson_hi), the
    error bars a channel-ROI dashboard draws next to
    ``attribution_linear``'s credit split (same forward-carry frame,
    same touch/conversion/lookback definitions — the two faces cannot
    disagree about what a converting touch is).

    Scale shape: the one user-keyed forward window from the attribution
    family, then a |channels|-row hash agg; the Wilson closed form runs
    on integer counts in a pinned IEEE operation order, rounded at 6."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    is_conv = F.col("event_type") == _ATTR_CONVERSION
    nxt_us = F.first(
        F.when(is_conv, F.unix_micros("ts")), ignorenulls=True
    ).over(wf)
    touches = ev.select(
        "event_type", F.unix_micros("ts").alias("us"), nxt_us.alias("conv_us")
    ).filter(F.col("event_type").isin(_ATTR_TOUCHES))
    hit = (
        F.col("conv_us").isNotNull()
        & (F.col("conv_us") - F.col("us") <= _ATTR_LOOKBACK_US)
    ).cast("long")
    agg = touches.groupBy(F.col("event_type").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(hit).alias("n_converting"),
    )
    n = F.col("n_touches").cast("double")
    p = F.col("n_converting").cast("double") / n
    z2 = F.lit(_WILSON_Z * _WILSON_Z)
    denom = 1.0 + z2 / n
    center = p + z2 / (2.0 * n)
    rad = F.lit(_WILSON_Z) * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    return agg.select(
        "channel",
        F.col("n_touches").cast("long").alias("n_touches"),
        F.col("n_converting").cast("long").alias("n_converting"),
        F.round(p, 6).alias("rate"),
        F.round((center - rad) / denom, 6).alias("wilson_lo"),
        F.round((center + rad) / denom, 6).alias("wilson_hi"),
    ).orderBy("channel")


TOUCH_CONVERSION_CI_SQL = f"""
WITH ev AS (
  SELECT * FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL AND event_id IS NOT NULL
),
touches AS (
  SELECT event_type, epoch_us(ts) AS us,
         FIRST_VALUE(CASE WHEN event_type = '{_ATTR_CONVERSION}'
                          THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS conv_us
  FROM ev
),
agg AS (
  SELECT event_type AS channel,
         COUNT(*) AS n_touches,
         SUM(CASE WHEN conv_us IS NOT NULL
                   AND conv_us - us <= {_ATTR_LOOKBACK_US}
                  THEN 1 ELSE 0 END) AS n_converting
  FROM touches
  WHERE event_type IN ({{touch_list}})
  GROUP BY 1
)
SELECT channel,
       CAST(n_touches AS BIGINT) AS n_touches,
       CAST(n_converting AS BIGINT) AS n_converting,
       ROUND(CAST(n_converting AS DOUBLE) / CAST(n_touches AS DOUBLE), 6)
         AS rate,
       ROUND(((CAST(n_converting AS DOUBLE) / CAST(n_touches AS DOUBLE))
               + {_WILSON_Z * _WILSON_Z!r} / (2.0 * CAST(n_touches AS DOUBLE))
              - {_WILSON_Z!r} * SQRT(
                  (CAST(n_converting AS DOUBLE) / CAST(n_touches AS DOUBLE))
                  * (1.0 - CAST(n_converting AS DOUBLE)
                           / CAST(n_touches AS DOUBLE))
                  / CAST(n_touches AS DOUBLE)
                  + {_WILSON_Z * _WILSON_Z!r}
                    / (4.0 * CAST(n_touches AS DOUBLE)
                           * CAST(n_touches AS DOUBLE))))
             / (1.0 + {_WILSON_Z * _WILSON_Z!r}
                      / CAST(n_touches AS DOUBLE)), 6) AS wilson_lo,
       ROUND(((CAST(n_converting AS DOUBLE) / CAST(n_touches AS DOUBLE))
               + {_WILSON_Z * _WILSON_Z!r} / (2.0 * CAST(n_touches AS DOUBLE))
              + {_WILSON_Z!r} * SQRT(
                  (CAST(n_converting AS DOUBLE) / CAST(n_touches AS DOUBLE))
                  * (1.0 - CAST(n_converting AS DOUBLE)
                           / CAST(n_touches AS DOUBLE))
                  / CAST(n_touches AS DOUBLE)
                  + {_WILSON_Z * _WILSON_Z!r}
                    / (4.0 * CAST(n_touches AS DOUBLE)
                           * CAST(n_touches AS DOUBLE))))
             / (1.0 + {_WILSON_Z * _WILSON_Z!r}
                      / CAST(n_touches AS DOUBLE)), 6) AS wilson_hi
FROM agg
ORDER BY channel
""".format(touch_list=_ATTR_TOUCH_LIST)


# negatives per positive, and the expected items-per-bucket the dynamic
# bucket count targets (fan-out per (positive, slot) is ~_NEG_BUCKET_TARGET)
_NEG_K = 2
_NEG_BUCKET_TARGET = 64


def negative_sampling_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive / item-CF training:
    for every (user, positive item) interaction pair, draw ``_NEG_K``
    pseudo-random negative items the user has NOT interacted with —
    word2vec/two-tower training prep, with NO RNG anywhere (md5 draws, so
    re-runs, engines, and any partitioning agree row-for-row).

    Mechanism: items hash into B ≈ |items|/``_NEG_BUCKET_TARGET`` buckets
    and are ranked WITHIN their bucket (a bucket-partitioned window —
    parallel, vocabulary-sized); each (user, positive, slot) hashes to a
    target bucket and picks member ``draw % bucket_size`` directly, so
    the pick costs ONE md5 per slot and two keyed joins — no candidate
    fan-out anywhere (a per-slot argmin over bucket members, the first
    formulation, evaluated ~bucket_target md5 draws per slot and swept
    ~40% slower). Owned items are removed by one user-keyed anti-join
    AFTER the pick, so a collision yields a dropped slot rather than a
    biased re-draw (the quality_weighted_sample acceptance discipline) —
    the per-slot drop probability is the user's owned share of the
    bucket.

    Scale shape: NO dense GLOBAL item index and NO global sort — the
    classic implementation ranks items 0..N-1 in one unpartitioned
    window, a single-task sort at 10⁸ items; the within-bucket rank is
    the same idea sharded B ways. Work is Θ(pairs·K) — output-linear,
    the floor for a sampler that emits K rows per pair. Positives are
    the SHARED taste-graph atom (``user_item_pairs``), so the sampler
    can never disagree with the recommender about what an interaction
    is."""
    ui = user_item_pairs(load(spark, "events", sf_dir))
    items = ui.select("item").distinct()
    nb = items.agg(
        F.greatest(
            F.lit(1),
            F.floor(F.count(F.lit(1)) / F.lit(_NEG_BUCKET_TARGET)).cast(
                "int"
            ),
        ).alias("n_buckets")
    )
    wb = Window.partitionBy("bucket").orderBy("neg_item")
    ranked = (
        items.crossJoin(F.broadcast(nb))
        .select(
            F.col("item").alias("neg_item"),
            F.pmod(
                md5_bucket32(F.col("item").cast("string")),
                F.col("n_buckets"),
            ).alias("bucket"),
        )
        .select(
            "neg_item",
            "bucket",
            (F.row_number().over(wb) - 1).alias("idx"),
            F.count(F.lit(1)).over(Window.partitionBy("bucket")).alias(
                "bucket_size"
            ),
        )
    )
    sizes = ranked.select("bucket", "bucket_size").distinct()
    slots = (
        ui.select(
            "user_id",
            F.col("item").alias("pos_item"),
            F.explode(
                F.array(*[F.lit(i) for i in range(_NEG_K)])
            ).alias("slot"),
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "user_id",
            "pos_item",
            "slot",
            md5_bucket32(
                F.concat_ws(
                    "|",
                    F.col("user_id").cast("string"),
                    F.col("pos_item").cast("string"),
                    F.col("slot").cast("string"),
                )
            ).alias("draw"),
            "n_buckets",
        )
        .select(
            "user_id",
            "pos_item",
            "slot",
            "draw",
            "n_buckets",
            F.pmod(F.col("draw"), F.col("n_buckets")).alias("bucket"),
        )
    )
    picked = (
        slots.join(sizes, "bucket")
        .select(
            "user_id",
            "pos_item",
            "slot",
            "bucket",
            # an INDEPENDENT residue for the within-bucket pick: reusing
            # draw % size would correlate with the bucket choice
            # (draw % n_buckets) when sizes divide the bucket count
            F.pmod(
                F.floor(F.col("draw") / F.col("n_buckets")).cast("long"),
                F.col("bucket_size"),
            ).alias("idx"),
        )
        .join(ranked.select("bucket", "idx", "neg_item"), ["bucket", "idx"])
        .select("user_id", "pos_item", "slot", "neg_item")
    )
    owned = ui.select("user_id", F.col("item").alias("neg_item"))
    return picked.join(owned, ["user_id", "neg_item"], "left_anti").select(
        "user_id", "pos_item", "slot", "neg_item"
    )


def _negative_sampling_sql() -> str:
    def h32(expr: str) -> str:
        return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"

    slot_key = (
        "CAST(user_id AS VARCHAR) || '|' || CAST(pos_item AS VARCHAR)"
        " || '|' || CAST(slot AS VARCHAR)"
    )
    return f"""
WITH {_CO_CTES},
items AS (SELECT DISTINCT item FROM ui),
nb AS (
  SELECT GREATEST(1, CAST(FLOOR(COUNT(*) / {_NEG_BUCKET_TARGET}.0) AS INT))
           AS n_buckets
  FROM items
),
ranked AS (
  SELECT neg_item, bucket,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY neg_item) - 1 AS idx,
         COUNT(*) OVER (PARTITION BY bucket) AS bucket_size
  FROM (
    SELECT item AS neg_item,
           {h32("CAST(item AS VARCHAR)")} % n_buckets AS bucket
    FROM items, nb
  )
),
slots AS (
  SELECT user_id, pos_item, slot, draw, n_buckets,
         draw % n_buckets AS bucket
  FROM (
    SELECT user_id, pos_item, slot, {h32(slot_key)} AS draw, n_buckets
    FROM (SELECT user_id, item AS pos_item,
                 unnest(range({_NEG_K})) AS slot FROM ui), nb
  )
),
picked AS (
  SELECT s.user_id, s.pos_item, s.slot, r.neg_item
  FROM slots s
  JOIN (SELECT DISTINCT bucket, bucket_size FROM ranked) bs
    USING (bucket)
  JOIN ranked r
    ON r.bucket = s.bucket
   AND r.idx = (s.draw // s.n_buckets) % bs.bucket_size
)
SELECT p.user_id, p.pos_item, CAST(p.slot AS INT) AS slot, p.neg_item
FROM picked p
ANTI JOIN ui o ON o.user_id = p.user_id AND o.item = p.neg_item
"""


NEGATIVE_SAMPLING_SQL = _negative_sampling_sql()


def point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME-CORRECT training-feature assembly — the feature-store
    join discipline that prevents label leakage: for every 'purchase'
    label event, behavioral features computed ONLY from the user's
    STRICTLY-PRIOR events (a ROWS frame ending at -1 — never the label
    row itself, never anything after it). The classic bug this op exists
    to make impossible is training on features that already contain the
    label's own contribution; here the frame boundary IS the correctness
    contract, and the oracle replays it exactly.

    One user-keyed window over the fact (the sessionize shuffle shape);
    the label filter applies AFTER the frame so prior non-purchase events
    still count as history. Ordering ties break on event_id — the same
    total order every event-sequence op in this module sorts by; NULL
    user/ts rows are excluded (they cannot take a position in a user's
    timeline). The running value sum is sequential in frame order on
    both engines — the window_running_sum exactness idiom — and rounds
    at 6."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.count(F.lit(1)).over(w).alias("n_prior_events"),
            F.round(F.sum("value").over(w), 6).alias("prior_value_sum"),
            F.min("ts").over(w).alias("first_prior_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "n_prior_events",
            # NULL when the user has no prior events (a first-touch
            # purchase) or all prior values are NULL — both engines skip
            # NULLs in SUM identically
            "prior_value_sum",
            F.datediff(F.to_date("ts"), F.to_date("first_prior_ts")).alias(
                "days_since_first_seen"
            ),
        )
    )


PIT_FEATURES_SQL = """
WITH ev AS (
  SELECT user_id, event_id, ts, event_type, value
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
feat AS (
  SELECT user_id, event_id, ts, event_type,
         COUNT(*) OVER w AS n_prior_events,
         ROUND(SUM(value) OVER w, 6) AS prior_value_sum,
         MIN(ts) OVER w AS first_prior_ts
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id,
       CAST(n_prior_events AS BIGINT) AS n_prior_events,
       prior_value_sum,
       CAST(date_diff('day', CAST(first_prior_ts AS DATE), CAST(ts AS DATE))
            AS INT) AS days_since_first_seen
FROM feat
WHERE event_type = 'purchase'
"""


# Holt smoothing constants (exact literals, interpolated into the oracle)
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_HOLT_H = 3


def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing per event type (NEW
    round 13; Holt 1957 — the ETS(A,A,N) workhorse, completing the
    forecasting family next to the seasonal-naive backtest and the ACF
    detector): over the SHARED zero-filled daily grid
    (``daily_type_grid`` — the same series CUSUM and the backtest read),
    fold level/trend updates l ← α·y + (1−α)(l+b),
    b ← β(l−l_prev) + (1−β)b with pinned init (l₁=y₁; the second
    observation fits exactly and seeds the trend), and report the final
    state, the in-sample one-step MAE, and the h=1..{h} forecasts
    l + h·b.

    Cross-engine exactness: the recurrence is a SEQUENTIAL fold with
    ROUND(·, 9) after every level/trend/error update — identical step
    order on both engines (F.aggregate over the sorted per-type day
    array ≡ a recursive CTE stepping idx), the user_survival_km
    discipline.  The fold runs over the ≤|days| calendar series per
    type, never the fact.

    Scale shape: one (type, day) count shuffle (the shared leaf-cell
    pass the FIFTEENTH incremental path maintains — this face refreshes
    from state like the other monitors), then per-type folds on the
    |types|×|days| metadata grid.""".format(h=_HOLT_H)
    grid = daily_type_grid(
        load(spark, "events", sf_dir)
    )
    a, bta = _HOLT_ALPHA, _HOLT_BETA
    series = grid.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "n"))),
            lambda x: x["n"].cast("double"),
        ).alias("ys")
    )
    zero = F.struct(
        F.lit(0).cast("int").alias("k"),
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("sae"),
    )

    def step(acc, y):
        k, l, b, sae = acc["k"], acc["l"], acc["b"], acc["sae"]
        lb = l + b
        l_new = (
            F.when(k == 0, y)
            .when(k == 1, y)
            .otherwise(F.round(a * y + (1 - a) * lb, 9))
        )
        b_new = (
            F.when(k == 0, F.lit(0.0))
            .when(k == 1, y - l)
            .otherwise(F.round(bta * (l_new - l) + (1 - bta) * b, 9))
        )
        sae_new = F.when(
            k >= 2, F.round(sae + F.abs(y - lb), 9)
        ).otherwise(sae)
        return F.struct(
            (k + 1).alias("k"),
            l_new.alias("l"),
            b_new.alias("b"),
            sae_new.alias("sae"),
        )

    folded = series.select(
        "event_type",
        F.size("ys").alias("n_days"),
        F.aggregate("ys", zero, step).alias("st"),
    )
    l, b, sae = F.col("st.l"), F.col("st.b"), F.col("st.sae")
    return folded.select(
        "event_type",
        "n_days",
        F.round(l, 6).alias("level"),
        F.round(b, 6).alias("trend"),
        F.when(
            F.col("n_days") > 2, F.round(sae / (F.col("n_days") - 2), 6)
        ).alias("mae_1step"),
        *[
            F.round(l + h * b, 6).alias(f"forecast_h{h}")
            for h in range(1, _HOLT_H + 1)
        ],
    ).orderBy("event_type")


def _holt_sql() -> str:
    a, bta = _HOLT_ALPHA, _HOLT_BETA
    l_new = (
        f"CASE WHEN g.idx = 2 THEN CAST(g.n AS DOUBLE) "
        f"ELSE ROUND({a} * g.n + {1 - a} * (h.l + h.b), 9) END"
    )
    fcsts = ",\n       ".join(
        f"ROUND(l + {h} * b, 6) AS forecast_h{h}"
        for h in range(1, _HOLT_H + 1)
    )
    return f"""
WITH RECURSIVE ev AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
daily AS (SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2),
spine AS (
  SELECT UNNEST(generate_series(
           (SELECT MIN(day) FROM daily),
           (SELECT MAX(day) FROM daily),
           INTERVAL 1 DAY)) AS day
),
gridc AS (
  SELECT t.event_type, COALESCE(d.n, 0) AS n,
         ROW_NUMBER() OVER (PARTITION BY t.event_type
                            ORDER BY s.day) AS idx,
         COUNT(*) OVER (PARTITION BY t.event_type) AS n_days
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN spine s
  LEFT JOIN daily d ON d.event_type = t.event_type
                   AND d.day = CAST(s.day AS DATE)
),
hw AS (
  SELECT event_type, idx, n_days,
         CAST(n AS DOUBLE) AS l,
         CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS sae
  FROM gridc WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx, g.n_days,
         {l_new},
         CASE WHEN g.idx = 2 THEN g.n - h.l
              ELSE ROUND({bta} * (({l_new}) - h.l) + {1 - bta} * h.b, 9) END,
         CASE WHEN g.idx >= 3
              THEN ROUND(h.sae + ABS(g.n - (h.l + h.b)), 9)
              ELSE h.sae END
  FROM hw h JOIN gridc g
    ON g.event_type = h.event_type AND g.idx = h.idx + 1
)
SELECT event_type,
       CAST(n_days AS INT) AS n_days,
       ROUND(l, 6) AS level,
       ROUND(b, 6) AS trend,
       CASE WHEN n_days > 2 THEN ROUND(sae / (n_days - 2), 6) END
         AS mae_1step,
       {fcsts}
FROM hw WHERE idx = n_days
ORDER BY event_type
"""


EVENTS_HOLT_SQL = _holt_sql()


# Holt-Winters additive-seasonal knobs: weekly period, pinned smoothing
# rates, a full-cycle forecast horizon, and the 7-day holdout the
# backtest face reserves.
_HW_ALPHA = 0.5
_HW_BETA = 0.3
_HW_GAMMA = 0.3
_HW_M = 7
_HW_H = 7


def _hw_folded(grid: DataFrame, holdout: int) -> DataFrame:
    """Shared Holt-Winters fold: per-type sorted daily series → final
    (level, trend, rotated seasonal array, SAE, ys) after folding
    t = m+1 .. n-holdout.  Pinned init from the first two weeks
    (l₀ = week-1 mean, b₀ = (week-2 mean − week-1 mean)/m,
    sᵢ = yᵢ − l₀), every state update ROUND(·, 9) in a fixed order —
    the events_holt_forecast / user_survival_km cross-engine
    discipline.  After the fold the seasonal array is rotated so
    s[h] is the seasonal index for horizon h."""
    a, bt, g, m = _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_M
    series = grid.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "n"))),
            lambda x: x["n"].cast("double"),
        ).alias("ys")
    )
    n = F.size("ys")
    fit_n = n - F.lit(holdout)
    ssum = lambda lo, cnt: F.aggregate(
        F.slice("ys", lo, cnt), F.lit(0.0), lambda acc, y: acc + y
    )
    m1 = ssum(1, m) / m
    m2 = ssum(m + 1, m) / m
    l0 = F.round(m1, 9)
    b0 = F.round((m2 - m1) / m, 9)
    s0 = F.transform(F.slice("ys", 1, m), lambda y: F.round(y - l0, 9))
    init = F.struct(
        l0.alias("l"),
        b0.alias("b"),
        s0.alias("s"),
        F.lit(0.0).alias("sae"),
    )

    def step(acc, y):
        l, b, s, sae = acc["l"], acc["b"], acc["s"], acc["sae"]
        seas = F.element_at(s, 1)
        pred = l + b + seas
        l_new = F.round(a * (y - seas) + (1 - a) * (l + b), 9)
        b_new = F.round(bt * (l_new - l) + (1 - bt) * b, 9)
        s_val = F.round(g * (y - l_new) + (1 - g) * seas, 9)
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            F.concat(F.slice(s, 2, m - 1), F.array(s_val)).alias("s"),
            F.round(sae + F.abs(y - pred), 9).alias("sae"),
        )

    st = F.aggregate(
        # ys[m+1 .. fit_n]; length clamped at 0 so sub-2m series (NULL
        # state by contract) can't feed slice() a negative length
        F.slice("ys", m + 1, F.greatest(fit_n - m, F.lit(0))),
        init,
        step,
    )
    return series.select(
        "event_type",
        n.cast("int").alias("n_days"),
        fit_n.cast("int").alias("fit_n"),
        F.when(fit_n >= 2 * m, st).alias("st"),
        "ys",
    )


def events_hw_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive-seasonal forecast per event type (NEW round
    14; Winters 1960 — ETS(A,A,A) with weekly period m={m}, completing
    the ETS family the r13 ``events_holt_forecast`` started): over the
    SHARED zero-filled daily grid (``daily_type_grid``, the series the
    FIFTEENTH incremental path maintains), fold
    l ← α(y − s_{{t−m}}) + (1−α)(l+b), b ← β(l−l_prev) + (1−β)b,
    s_t ← γ(y − l) + (1−γ)s_{{t−m}} from t = m+1 with the pinned
    two-week init, and report the final state, the in-sample one-step
    MAE (errors vs l+b+s before each update), and the h=1..{h}
    forecasts l + h·b + s_{{next cycle}} — one full weekly cycle, the
    dow-aware counterpart of Holt's trend-only line.

    Cross-engine exactness: SEQUENTIAL fold with ROUND(·, 9) after
    every level/trend/seasonal/error update, identical step order both
    engines (F.aggregate over the sorted per-type day array carrying a
    rotating length-{m} seasonal array ≡ a recursive CTE stepping idx
    with a LIST state column); counts are integer-valued doubles so
    the init sums are exact.  Types with fewer than 2m grid days emit
    NULL state (contract, not error).

    Scale shape: identical to ``events_holt_forecast`` — one
    (type, day) count shuffle (served from maintained daily cells),
    then per-type folds on the |types|×|days| metadata grid; the
    seasonal array adds O(m) state per type, nothing
    fact-scale.""".format(m=_HW_M, h=_HW_H)
    folded = _hw_folded(
        daily_type_grid(load(spark, "events", sf_dir)), holdout=0
    )
    l, b, s, sae = (
        F.col("st.l"),
        F.col("st.b"),
        F.col("st.s"),
        F.col("st.sae"),
    )
    n_folds = F.col("fit_n") - _HW_M
    return folded.select(
        "event_type",
        "n_days",
        F.round(l, 6).alias("level"),
        F.round(b, 6).alias("trend"),
        F.when(
            n_folds > 0, F.round(sae / n_folds, 6)
        ).alias("mae_1step"),
        *[
            F.round(l + h * b + F.element_at(s, h), 6).alias(
                f"forecast_h{h}"
            )
            for h in range(1, _HW_H + 1)
        ],
    ).orderBy("event_type")


def events_hw_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters backtest vs the lag-{m} seasonal-naive baseline (NEW
    round 14): hold out the LAST {m} grid days per type, fit the
    ``events_hw_forecast`` fold on the prefix, and score both the HW
    h=1..{m} forecasts and the seasonal-naive predictions (y_{{t−m}})
    against the held-out actuals — the "does the extra state earn its
    keep" gate a forecast face needs before a scheduler trusts it
    (sibling of ``events_forecast_backtest``, which scores the naive
    baseline in-sample).  Emits per-type holdout MAE for both models
    and the winner flag.  Types with fewer than 3m grid days emit NULL
    metrics (2m to init+fold, m to hold out).

    Same fold, same rounding discipline, same metadata-grid scale
    shape as the forecast face.""".format(m=_HW_M)
    folded = _hw_folded(
        daily_type_grid(load(spark, "events", sf_dir)), holdout=_HW_M
    )
    l, b, s = F.col("st.l"), F.col("st.b"), F.col("st.s")
    yat = lambda idx: F.get("ys", idx - 1)  # 1-based lookup, NULL past end
    hw_err = [
        F.abs(
            yat(F.col("fit_n") + h)
            - F.round(l + h * b + F.element_at(s, h), 9)
        )
        for h in range(1, _HW_M + 1)
    ]
    sn_err = [
        F.abs(yat(F.col("fit_n") + h) - yat(F.col("fit_n") + h - _HW_M))
        for h in range(1, _HW_M + 1)
    ]
    some = F.col("st").isNotNull()
    mae_hw = F.round(
        sum(hw_err[1:], hw_err[0]) / _HW_M, 6
    )
    mae_sn = F.round(
        sum(sn_err[1:], sn_err[0]) / _HW_M, 6
    )
    return folded.select(
        "event_type",
        "n_days",
        F.when(some, mae_hw).alias("mae_hw"),
        F.when(some, mae_sn).alias("mae_snaive"),
        F.when(some, (mae_hw <= mae_sn).cast("int")).alias("hw_wins"),
    ).orderBy("event_type")


def _hw_sql(holdout: int, final_select: str) -> str:
    a, bt, g, m = _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_M
    y = "CAST(sr.ys[h.t + 1] AS DOUBLE)"
    l_new = (
        f"ROUND({a} * ({y} - h.s[1]) + {1 - a} * (h.l + h.b), 9)"
    )
    return f"""
WITH RECURSIVE ev AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
daily AS (SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2),
spine AS (
  SELECT UNNEST(generate_series(
           (SELECT MIN(day) FROM daily),
           (SELECT MAX(day) FROM daily),
           INTERVAL 1 DAY)) AS day
),
gridc AS (
  SELECT t.event_type, s.day AS day, COALESCE(d.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN spine s
  LEFT JOIN daily d ON d.event_type = t.event_type
                   AND d.day = CAST(s.day AS DATE)
),
series AS (
  SELECT event_type,
         list(CAST(n AS DOUBLE) ORDER BY day) AS ys,
         COUNT(*) AS n_days,
         COUNT(*) - {holdout} AS fit_n
  FROM gridc GROUP BY event_type
),
init AS (
  SELECT event_type, n_days, fit_n, ys,
         ROUND(list_aggregate(ys[1:{m}], 'sum') / {m}, 9) AS l0,
         ROUND((list_aggregate(ys[{m + 1}:{2 * m}], 'sum') / {m}
                - list_aggregate(ys[1:{m}], 'sum') / {m}) / {m}, 9) AS b0
  FROM series WHERE fit_n >= {2 * m}
),
hw AS (
  SELECT event_type, n_days, fit_n, ys, {m} AS t,
         l0 AS l, b0 AS b,
         [ROUND(yv - l0, 9) FOR yv IN ys[1:{m}]] AS s,
         CAST(0.0 AS DOUBLE) AS sae
  FROM init
  UNION ALL
  SELECT h.event_type, h.n_days, h.fit_n, h.ys, h.t + 1,
         {l_new},
         ROUND({bt} * (({l_new}) - h.l) + {1 - bt} * h.b, 9),
         list_append(h.s[2:{m}],
           ROUND({g} * ({y} - ({l_new})) + {1 - g} * h.s[1], 9)),
         ROUND(h.sae + ABS({y} - (h.l + h.b + h.s[1])), 9)
  FROM hw h JOIN series sr USING (event_type)
  WHERE h.t < h.fit_n
),
fin AS (SELECT * FROM hw WHERE t = fit_n),
short AS (SELECT event_type, n_days FROM series WHERE fit_n < {2 * m})
{final_select}
"""


def _hw_forecast_sql() -> str:
    m = _HW_M
    fcsts = ",\n       ".join(
        f"ROUND(l + {h} * b + s[{h}], 6) AS forecast_h{h}"
        for h in range(1, _HW_H + 1)
    )
    nulls = ",\n       ".join(
        f"CAST(NULL AS DOUBLE) AS forecast_h{h}"
        for h in range(1, _HW_H + 1)
    )
    return _hw_sql(
        0,
        f"""
SELECT event_type, CAST(n_days AS INT) AS n_days,
       ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
       CASE WHEN fit_n > {m}
            THEN ROUND(sae / (fit_n - {m}), 6) END AS mae_1step,
       {fcsts}
FROM fin
UNION ALL
SELECT event_type, CAST(n_days AS INT) AS n_days,
       CAST(NULL AS DOUBLE) AS level, CAST(NULL AS DOUBLE) AS trend,
       CAST(NULL AS DOUBLE) AS mae_1step,
       {nulls}
FROM short
ORDER BY event_type
""",
    )


def _hw_backtest_sql() -> str:
    m = _HW_M
    hw_terms = " + ".join(
        f"ABS(ys[fit_n + {h}] - ROUND(l + {h} * b + s[{h}], 9))"
        for h in range(1, m + 1)
    )
    sn_terms = " + ".join(
        f"ABS(ys[fit_n + {h}] - ys[fit_n + {h} - {m}])"
        for h in range(1, m + 1)
    )
    return _hw_sql(
        m,
        f"""
SELECT event_type, CAST(n_days AS INT) AS n_days,
       CASE WHEN fit_n >= {m} THEN ROUND(({hw_terms}) / {m}, 6) END
         AS mae_hw,
       CASE WHEN fit_n >= {m} THEN ROUND(({sn_terms}) / {m}, 6) END
         AS mae_snaive,
       CASE WHEN fit_n >= {m} THEN
         CAST(ROUND(({hw_terms}) / {m}, 6)
              <= ROUND(({sn_terms}) / {m}, 6) AS INT) END AS hw_wins
FROM fin
UNION ALL
SELECT event_type, CAST(n_days AS INT) AS n_days,
       CAST(NULL AS DOUBLE) AS mae_hw,
       CAST(NULL AS DOUBLE) AS mae_snaive,
       CAST(NULL AS INT) AS hw_wins
FROM short
ORDER BY event_type
""",
    )


EVENTS_HW_FORECAST_SQL = _hw_forecast_sql()
EVENTS_HW_BACKTEST_SQL = _hw_backtest_sql()


_ACF_MAX_LAG = 10


def autocorr_from_daily_cells_input(state: DataFrame) -> DataFrame:
    """Per-day total counts from (possibly partial) daily type cells —
    the merge that lets the maintained daily-cells table serve
    ``events_daily_autocorr`` (cells are additive integer sums, so
    partials from any batch split merge exactly)."""
    return state.groupBy("day").agg(F.sum("n").alias("c"))


def events_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..{lag} (NEW round 13) — the periodicity detector behind weekly-
    seasonality discovery and forecast-model selection (a spike at lag 7
    = weekly cycle; complements the hour-of-week seasonality profile,
    which ASSUMES the cycle this op detects).  Missing days count as
    ZERO (the series densifies over the full calendar — skipping gaps
    would alias the lags), and the biased ACF estimator divides each
    lag's autocovariance by the full-series variance.

    Cross-engine: counts are integers, the mean divides once; the
    covariance/variance sums run over the ≤|days| calendar table, and
    the final ROUND 6 absorbs float-sum-order dust (the item_pagerank
    acceptance class).

    Scale shape: one day-keyed count shuffle over the fact, then
    EVERYTHING ELSE — calendar densify, the lag self-join, the variance
    — runs on the ≤|days| metadata table (a few hundred rows at any
    corpus size).""".format(lag=_ACF_MAX_LAG)
    # composes the FIFTEENTH incremental path's leaf cells (the
    # daily_type_grid discipline): per-day totals are the type cells
    # summed over types, so the maintained state table serves the ACF
    # with no new state (NULL-type events sit out, the cells' contract)
    per_day = autocorr_from_daily_cells_input(
        daily_type_cells(load(spark, "events", sf_dir))
    )
    bounds = per_day.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = (
        bounds.select(
            F.explode(F.sequence("d0", "d1")).alias("day"), "d0"
        )
        .join(per_day, "day", "left")
        .select(
            F.datediff("day", "d0").alias("i"),
            F.coalesce("c", F.lit(0).cast("long")).alias("c"),
        )
    )
    stats = cal.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("c") / F.count(F.lit(1))).alias("m"),
    )
    centered = cal.crossJoin(F.broadcast(stats)).select(
        "i", (F.col("c") - F.col("m")).alias("x"), "n"
    )
    var = centered.agg(F.sum(F.col("x") * F.col("x")).alias("v"))
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = centered.select("i", F.col("x").alias("xa"))
    b = centered.select(F.col("i").alias("j"), F.col("x").alias("xb"))
    prods = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("j") == F.col("i") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("xa") * F.col("xb")).alias("cov"),
        )
    )
    return (
        prods.crossJoin(F.broadcast(var))
        .select(
            "lag",
            "n_pairs",
            F.round(F.col("cov") / F.col("v"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


EVENTS_DAILY_AUTOCORR_SQL = f"""
WITH per_day AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*) AS c
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM per_day),
cal AS (
  SELECT date_diff('day', d0, gs.day) AS i,
         COALESCE(p.c, 0) AS c
  FROM bounds,
       LATERAL (SELECT unnest(generate_series(d0, d1,
                INTERVAL 1 DAY))::DATE AS day) gs
  LEFT JOIN per_day p ON p.day = gs.day
),
stats AS (SELECT COUNT(*) AS n, SUM(c) * 1.0 / COUNT(*) AS m FROM cal),
centered AS (SELECT i, c - m AS x FROM cal, stats),
var AS (SELECT SUM(x * x) AS v FROM centered),
lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag),
prods AS (
  SELECT lag,
         COUNT(*) AS n_pairs,
         SUM(a.x * b.x) AS cov
  FROM centered a, lags
  JOIN centered b ON b.i = a.i + lag
  GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       ROUND(cov / v, 6) AS acf
FROM prods, var
ORDER BY lag
"""


def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimate per event type (NEW round 15):
    the slope is the median of all pairwise slopes (n_j − n_i)/(j − i)
    over the zero-filled daily count series — the classic
    breakdown-point-29% trend estimator that a single outage day or
    bot-storm spike cannot drag the way it drags OLS (reported alongside
    for exactly that contrast).  The companion intercept is the median
    of (n_i − slope·i), the standard Theil–Sen pairing.

    Reads the SHARED ``daily_type_grid`` series (CUSUM / backtest /
    Holt-Winters all read the same one — the monitors cannot disagree
    about the data).  Medians are DISCRETE lower-medians selected by
    rank with (value, i, j) tie order — exact, engine-identical, no
    interpolation divergence.

    Scale shape: one (type, day) hash agg over the fact, then the O(d²)
    pair frame runs on the CALENDAR-bounded grid (d = spine days, so
    ~365² ≈ 130k pairs/type/year at ANY corpus size — quadratic in the
    calendar, never in the data); slope pick + intercept are rank-1
    windows over that bounded frame; OLS needs only integer moment sums.
    """
    return theil_sen_from_grid(daily_type_grid(load(spark, "events", sf_dir)))


def theil_sen_from_grid(grid: DataFrame) -> DataFrame:
    """Theil–Sen + OLS trend from any (event_type, day, n) series frame —
    the grid→estimate core, split out so the planted-outlier truth test
    and the maintained-cells serve path read the identical estimator."""
    w0 = Window.partitionBy("event_type").orderBy("day")
    pts = grid.select(
        "event_type", F.row_number().over(w0).alias("i"), "n"
    )
    a = pts.select("event_type", "i", F.col("n").alias("ni"))
    b = pts.select(
        "event_type", F.col("i").alias("j"), F.col("n").alias("nj")
    )
    pairs = a.join(b, "event_type").filter(F.col("i") < F.col("j")).select(
        "event_type",
        "i",
        "j",
        (
            (F.col("nj") - F.col("ni")).cast("double")
            / (F.col("j") - F.col("i")).cast("double")
        ).alias("slope"),
    )
    ws = Window.partitionBy("event_type").orderBy("slope", "i", "j")
    slope = (
        pairs.withColumn("rk", F.row_number().over(ws))
        .withColumn(
            "n_pairs", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        )
        .filter(F.col("rk") == F.floor((F.col("n_pairs") + 1) / 2))
        .select("event_type", "n_pairs", F.col("slope").alias("ts_slope"))
    )
    resid = pts.join(F.broadcast(slope), "event_type").select(
        "event_type",
        "i",
        "n_pairs",
        "ts_slope",
        (F.col("n") - F.col("ts_slope") * F.col("i")).alias("r"),
    )
    wi = Window.partitionBy("event_type").orderBy("r", "i")
    picked = (
        resid.withColumn("rk", F.row_number().over(wi))
        .withColumn(
            "n_days", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        )
        .filter(F.col("rk") == F.floor((F.col("n_days") + 1) / 2))
        .select(
            "event_type", "n_days", "n_pairs", "ts_slope",
            F.col("r").alias("ts_intercept"),
        )
    )
    # OLS contrast from exact integer moments: one tiny agg on the grid.
    ols = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("i").alias("sx"),
        F.sum("n").alias("sy"),
        F.sum(F.col("i") * F.col("n")).alias("sxy"),
        F.sum(F.col("i") * F.col("i")).alias("sxx"),
    ).select(
        "event_type",
        (
            (F.col("nd") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("nd") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("ols_slope"),
    )
    return (
        picked.join(ols, "event_type")
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round("ts_slope", 6).alias("ts_slope"),
            F.round("ts_intercept", 6).alias("ts_intercept"),
            F.round("ols_slope", 6).alias("ols_slope"),
        )
        .orderBy("event_type")
    )


THEIL_SEN_SQL = """
WITH ev AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
daily AS (SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2),
spine AS (
  SELECT UNNEST(generate_series(
           (SELECT MIN(day) FROM daily),
           (SELECT MAX(day) FROM daily),
           INTERVAL 1 DAY)) AS day
),
grid AS (
  SELECT t.event_type, CAST(s.day AS DATE) AS day, COALESCE(d.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN spine s
  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = CAST(s.day AS DATE)
),
pts AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
         n
  FROM grid
),
pairs AS (
  SELECT a.event_type, a.i, b.i AS j,
         CAST(b.n - a.n AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS slope
  FROM pts a JOIN pts b ON b.event_type = a.event_type AND a.i < b.i
),
slope AS (
  SELECT event_type, n_pairs, slope AS ts_slope FROM (
    SELECT event_type, slope, i, j,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY slope, i, j) AS rk,
           COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
    FROM pairs
  ) WHERE rk = CAST(FLOOR((n_pairs + 1) / 2.0) AS BIGINT)
),
resid AS (
  SELECT p.event_type, p.i, s.n_pairs, s.ts_slope,
         p.n - s.ts_slope * p.i AS r
  FROM pts p JOIN slope s ON s.event_type = p.event_type
),
picked AS (
  SELECT event_type, n_days, n_pairs, ts_slope, r AS ts_intercept FROM (
    SELECT event_type, n_pairs, ts_slope, r, i,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r, i) AS rk,
           COUNT(*) OVER (PARTITION BY event_type) AS n_days
    FROM resid
  ) WHERE rk = CAST(FLOOR((n_days + 1) / 2.0) AS BIGINT)
),
ols AS (
  SELECT event_type,
         CAST(COUNT(*) * SUM(i * n) - SUM(i) * SUM(n) AS DOUBLE)
         / CAST(COUNT(*) * SUM(i * i) - SUM(i) * SUM(i) AS DOUBLE)
           AS ols_slope
  FROM pts GROUP BY event_type
)
SELECT p.event_type,
       CAST(p.n_days AS BIGINT) AS n_days,
       CAST(p.n_pairs AS BIGINT) AS n_pairs,
       ROUND(p.ts_slope, 6) AS ts_slope,
       ROUND(p.ts_intercept, 6) AS ts_intercept,
       ROUND(o.ols_slope, 6) AS ols_slope
FROM picked p JOIN ols o ON o.event_type = p.event_type
ORDER BY p.event_type
"""


# Split-conformal interval: nominal coverage level and the holdout length
# (the same final week the HW backtest holds out).
_CFP_LEVEL = 0.9
_CFP_TEST_DAYS = 7


def events_forecast_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals for the seasonal-naive
    forecaster (NEW round 15): calibrate the 90% band as a DISCRETE
    quantile of absolute lag-7 residuals on the calibration days (all
    evaluable days except the final week), then measure empirical
    coverage of actual ± q on the held-out week — the
    distribution-free uncertainty wrapper (Vovk; Lei et al.) that turns
    ANY point forecaster into an interval forecaster with finite-sample
    guarantees, and the natural companion to the MAE-only
    ``events_forecast_backtest``: a regime change shows up as coverage
    collapsing below nominal before the MAE trend is obvious.

    Exactness: residuals are integer counts, the calibration quantile is
    the ⌈0.9·(n+1)⌉-th smallest residual selected by rank with (value,
    day-index) tie order (clamped to the max residual when the rank
    exceeds n — the finite-sample edge), and coverage compares integers
    — one division at the end. Reads the SHARED ``daily_type_grid``;
    everything after the one (type, day) hash agg runs on the
    calendar-bounded grid."""
    grid = daily_type_grid(load(spark, "events", sf_dir))
    w0 = Window.partitionBy("event_type").orderBy("day")
    wt = Window.partitionBy("event_type")
    p = (
        grid.withColumn("idx", F.row_number().over(w0))
        .withColumn("t_days", F.count(F.lit(1)).over(wt))
        .withColumn("pred", F.lag("n", _FC_LAG_DAYS).over(w0))
        .filter(F.col("pred").isNotNull())
        .withColumn("r", F.abs(F.col("n") - F.col("pred")).cast("long"))
        .withColumn(
            "is_test", F.col("idx") > F.col("t_days") - _CFP_TEST_DAYS
        )
    )
    cal = p.filter(~F.col("is_test"))
    n_cal = cal.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_cal"))
    wq = Window.partitionBy("event_type").orderBy("r", "idx")
    q = (
        cal.withColumn("rk", F.row_number().over(wq))
        .join(n_cal, "event_type")
        .filter(
            F.col("rk")
            == F.least(
                F.ceil(F.lit(_CFP_LEVEL) * (F.col("n_cal") + 1)).cast("long"),
                F.col("n_cal"),
            )
        )
        .select("event_type", "n_cal", F.col("r").alias("q_resid"))
    )
    test = p.filter(F.col("is_test"))
    cov = (
        test.join(q, "event_type")
        .groupBy("event_type", "n_cal", "q_resid")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.count(F.when(F.col("r") <= F.col("q_resid"), 1)).alias(
                "n_covered"
            ),
        )
    )
    return cov.select(
        "event_type",
        "n_cal",
        "q_resid",
        "n_test",
        "n_covered",
        F.round(F.col("n_covered") / F.col("n_test"), 6).alias("coverage"),
    ).orderBy("event_type")


FORECAST_CONFORMAL_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
daily AS (SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2),
spine AS (
  SELECT UNNEST(generate_series(
           (SELECT MIN(day) FROM daily),
           (SELECT MAX(day) FROM daily),
           INTERVAL 1 DAY)) AS day
),
grid AS (
  SELECT t.event_type, CAST(s.day AS DATE) AS day, COALESCE(d.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN spine s
  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = CAST(s.day AS DATE)
),
p AS (
  SELECT event_type, idx, t_days,
         ABS(n - pred) AS r,
         idx > t_days - {_CFP_TEST_DAYS} AS is_test
  FROM (
    SELECT event_type, n,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS idx,
           COUNT(*) OVER (PARTITION BY event_type) AS t_days,
           LAG(n, {_FC_LAG_DAYS}) OVER (PARTITION BY event_type
                                        ORDER BY day) AS pred
    FROM grid
  ) WHERE pred IS NOT NULL
),
ncal AS (
  SELECT event_type, COUNT(*) AS n_cal FROM p WHERE NOT is_test GROUP BY 1
),
q AS (
  SELECT c.event_type, ncal.n_cal, c.r AS q_resid FROM (
    SELECT event_type, r, idx,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY r, idx) AS rk
    FROM p WHERE NOT is_test
  ) c
  JOIN ncal ON ncal.event_type = c.event_type
  WHERE c.rk = LEAST(CAST(CEIL({_CFP_LEVEL} * (ncal.n_cal + 1)) AS BIGINT),
                     ncal.n_cal)
),
cov AS (
  SELECT p.event_type, q.n_cal, q.q_resid,
         COUNT(*) AS n_test,
         COUNT(CASE WHEN p.r <= q.q_resid THEN 1 END) AS n_covered
  FROM p JOIN q ON q.event_type = p.event_type
  WHERE p.is_test
  GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(n_cal AS BIGINT) AS n_cal,
       CAST(q_resid AS BIGINT) AS q_resid,
       CAST(n_test AS BIGINT) AS n_test,
       CAST(n_covered AS BIGINT) AS n_covered,
       ROUND(n_covered / (n_test * 1.0), 6) AS coverage
FROM cov
ORDER BY event_type
"""


# Markov removal-effect attribution: pinned absorption iterations (the
# PageRank unroll discipline; removal-effect RATIOS converge much faster
# than absolute absorption, so a modest pinned K is honest).
_MRA_ITERS = 8


_ATTR_JOURNEY_CACHE: dict = {}


def clear_attr_journey_cache() -> None:
    _ATTR_JOURNEY_CACHE.clear()


def _attr_journey_base_p(spark: SparkSession, sf_dir: str):
    """(base_p transition-probability frame, n_converting_users) — the
    journey model every Markov-graph attribution face shares: touch
    events up to each user's FIRST conversion, absorbed at 'conv'/'null'
    with 'start' prepended, over the family's shared touch/conversion
    definitions and the deterministic (ts, event_id) order. MEMOIZED
    per corpus version (the ``_BPE_STATE_CACHE`` discipline) with the
    ≤|states|² probability frame checkpointed: the removal and Shapley
    faces pay the corpus pass once per session."""
    from ..io import data_fingerprint

    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        data_fingerprint(sf_dir, "events"),
    )
    hit = _ATTR_JOURNEY_CACHE.get(key)
    if hit is not None:
        return hit
    for k in list(_ATTR_JOURNEY_CACHE):
        try:
            stale = (
                _ATTR_JOURNEY_CACHE[k][0].sparkSession.sparkContext._jsc
                is None
            )
        except Exception:
            stale = True
        if stale or k[:2] == key[:2]:
            _ATTR_JOURNEY_CACHE.pop(k, None)
    result = _attr_journey_build(spark, sf_dir)
    _ATTR_JOURNEY_CACHE[key] = result
    return result


def _attr_journey_build(spark: SparkSession, sf_dir: str):
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    firstconv = (
        ev.filter(F.col("event_type") == _ATTR_CONVERSION)
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fc"))
    )
    j = (
        ev.filter(
            F.col("event_type").isin(list(_ATTR_TOUCHES) + [_ATTR_CONVERSION])
        )
        .join(firstconv, "user_id", "left")
        .filter(
            F.col("fc").isNull()
            | (F.struct("ts", "event_id") <= F.col("fc"))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_type") == _ATTR_CONVERSION, F.lit("conv"))
            .otherwise(F.col("event_type"))
            .alias("state"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = j.withColumn(
        "prev", F.coalesce(F.lag("state").over(w), F.lit("start"))
    )
    wlast = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    terminals = (
        j.withColumn("rk", F.row_number().over(wlast))
        .filter((F.col("rk") == 1) & (F.col("state") != "conv"))
        .select(F.col("state").alias("prev"), F.lit("null").alias("state"))
    )
    counts = (
        steps.select("prev", "state")
        .unionByName(terminals)
        .groupBy("prev", "state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev")
    base_p = counts.select(
        F.col("prev").alias("src"),
        F.col("state").alias("dst"),
        (F.col("n") / F.sum("n").over(wp)).alias("p"),
    ).coalesce(1).localCheckpoint(eager=True)
    return base_p, firstconv.count()


def _attr_absorption(
    spark: SparkSession, base_p: DataFrame, scen_rows: list
) -> DataFrame:
    """(scenario, cp) start→conv absorption after ``_MRA_ITERS`` pinned
    ROUND(9) vector-matrix rounds, one scenario per removal SET:
    ``scen_rows`` is [(name, (removed_channel, ...)), ...] and every
    edge INTO a removed channel re-targets 'null' (row sums preserved —
    no renormalization). The transition matrix is ≤|states|² rows, so
    the rounds run DRIVER-SIDE on the collected matrix (the
    ``_tqc_fit`` constant-bounded-driver-state discipline — the
    dataflow form spent ~8 s/warm-call on ~30 one-task codegen stages
    for arithmetic over ≤36 numbers) and the result returns as a
    literal frame; the oracle unrolls the same rounds in SQL, with the
    per-round ROUND(9) pinning the trajectory across all three
    evaluators. Shared by the removal-effect face (singleton sets) and
    the Shapley face (all subsets)."""
    P = {
        (r["src"], r["dst"]): float(r["p"]) for r in base_p.collect()
    }  # ≤ |states|² rows — constant-bounded driver state by construction
    out = []
    for name, removed in scen_rows:
        rs = set(removed)
        pm: dict = {}
        for (src, dst), pv in P.items():
            d2 = "null" if dst in rs else dst
            pm[(src, d2)] = pm.get((src, d2), 0.0) + pv
        v = {"start": 1.0}
        for _ in range(_MRA_ITERS):
            nv: dict = {}
            for st, m in v.items():
                if st in ("conv", "null"):
                    # absorbing self-loop: mass persists across rounds
                    nv[st] = nv.get(st, 0.0) + m
                    continue
                for (src, dst), pv in pm.items():
                    if src == st:
                        nv[dst] = nv.get(dst, 0.0) + m * pv
            v = {k: round(x, 9) for k, x in sorted(nv.items())}
        out.append((name, float(v.get("conv", 0.0))))
    return spark.createDataFrame(out, "scenario string, cp double")


def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (NEW round 15; the
    Anderl/Becker data-driven attribution model): build each user's
    journey over the SHARED touch channels (view/click/signup) up to
    their first conversion, absorb at 'conv' or 'null', fit the
    first-order transition matrix, and credit each channel by its
    REMOVAL EFFECT — how much the start→conv absorption probability
    drops when every transition into that channel is redirected to
    'null'. Unlike last-touch (position rule) and linear (equal split),
    this credits channels by their causal role in the graph: a channel
    that only ever appears after the sale is already decided earns ~0
    even if it is frequently the last touch.

    Exactness: journey transitions are integer counts over the
    deterministic (ts, event_id) order with the family's shared
    conversion/touch/first-conversion definitions; probabilities divide
    once; absorption runs ``_MRA_ITERS`` pinned vector-matrix rounds
    with ROUND(9) per state per round (redirecting preserves row sums,
    so no renormalization is needed); the oracle unrolls the same
    rounds per removal scenario.

    Scale shape: ONE user-keyed shuffle builds journeys (the sessionize
    shape); everything after — the |states|² matrix, the |scenarios| ×
    |states| absorption vectors, the rounds — runs on vocabulary-bounded
    metadata frames."""
    base_p, n_conv = _attr_journey_base_p(spark, sf_dir)
    scen_rows = [("base", ())] + [(t, (t,)) for t in _ATTR_TOUCHES]
    conv_prob = _attr_absorption(spark, base_p, scen_rows)
    base = conv_prob.filter(F.col("scenario") == "base").agg(
        F.coalesce(F.max("cp"), F.lit(0.0)).alias("base_cp")
    )
    effects = (
        conv_prob.filter(F.col("scenario") != "base")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("scenario").alias("channel"),
            F.round("cp", 6).alias("removal_conv_prob"),
            F.when(
                F.col("base_cp") > 0,
                F.round(1.0 - F.col("cp") / F.col("base_cp"), 9),
            ).otherwise(F.lit(0.0)).alias("eff"),
        )
    )
    wtot = Window.partitionBy()
    return (
        effects.withColumn("tot", F.sum("eff").over(wtot))
        .select(
            "channel",
            "removal_conv_prob",
            F.round("eff", 6).alias("removal_effect"),
            F.when(
                F.col("tot") > 0, F.round(F.col("eff") / F.col("tot"), 6)
            ).otherwise(F.lit(0.0)).alias("attribution_share"),
            F.when(
                F.col("tot") > 0,
                F.round(F.col("eff") / F.col("tot") * n_conv, 6),
            ).otherwise(F.lit(0.0)).alias("attributed_conversions"),
        )
        .orderBy("channel")
    )


def _shapley_subsets():
    """All subsets of the touch set, named by their sorted '+'-join
    ('none' for ∅) — the scenario space of the exact Shapley face."""
    from itertools import combinations

    chans = sorted(_ATTR_TOUCHES)
    out = []
    for r in range(len(chans) + 1):
        for sub in combinations(chans, r):
            name = "+".join(sub) if sub else "none"
            removed = tuple(c for c in chans if c not in sub)
            out.append((name, sub, removed))
    return out


def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over the Markov journey graph
    (NEW round 15; Shapley 1953 applied per Zhao et al.'s
    game-theoretic attribution): the characteristic function
    v(S) = start→conv absorption with every channel OUTSIDE S removed,
    evaluated for ALL 2^|channels| coalitions (8 scenarios for the
    3-channel touch set — exact, no sampling), and each channel earns
    its Shapley value φ_c = Σ_S |S|!(n−|S|−1)!/n!·[v(S∪c) − v(S)].
    The axiomatic credit split: efficiency (Σφ = v(full) − v(∅)),
    symmetry, and zero credit for null players — the properties the
    heuristic rules (last-touch, linear) and even the removal effect
    (which double-counts complements) do not guarantee.

    Shares the journey model and the pinned ROUND(9) absorption with
    ``attribution_markov_removal`` (one helper each — the two faces
    cannot disagree about a journey or an absorption); the Shapley
    combination itself is a pivot of the 8 absorption scalars through
    literal factorial weights, identical in the oracle.

    Scale: the coalition count is exponential in |channels| by
    definition — with the pinned 3-channel touch set that is 8
    absorption vectors on metadata-bounded frames (document before
    widening the channel set; ≥10 channels needs the sampled
    permutation estimator instead)."""
    subs = _shapley_subsets()
    base_p, n_conv = _attr_journey_base_p(spark, sf_dir)
    conv_prob = _attr_absorption(
        spark, base_p, [(name, removed) for name, _sub, removed in subs]
    )
    # pivot the 8 scalars into one row: v_<name> columns
    piv = conv_prob.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("scenario") == name, F.col("cp"))),
                F.lit(0.0),
            ).alias(f"v_{name.replace('+', '_')}")
            for name, _sub, _removed in subs
        ]
    )
    chans = sorted(_ATTR_TOUCHES)
    n = len(chans)
    import math

    def vcol(sub: tuple) -> F.Column:
        name = "+".join(sub) if sub else "none"
        return F.col(f"v_{name.replace('+', '_')}")

    from itertools import combinations

    phi_rows = []
    for c in chans:
        others = [x for x in chans if x != c]
        terms = []
        for r in range(len(others) + 1):
            for sub in combinations(others, r):
                weight = (
                    math.factorial(len(sub))
                    * math.factorial(n - len(sub) - 1)
                    / math.factorial(n)
                )
                with_c = tuple(sorted(sub + (c,)))
                terms.append(
                    F.lit(weight) * (vcol(with_c) - vcol(tuple(sub)))
                )
        phi = F.round(sum(terms[1:], terms[0]), 9)
        phi_rows.append((c, phi))
    stacked = piv.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("channel"), phi.alias("phi")
                    )
                    for c, phi in phi_rows
                ]
            )
        ).alias("s")
    ).select("s.channel", "s.phi")
    wtot = Window.partitionBy()
    return (
        stacked.withColumn("tot", F.sum("phi").over(wtot))
        .select(
            "channel",
            F.round("phi", 6).alias("shapley_value"),
            F.when(
                F.col("tot") > 0, F.round(F.col("phi") / F.col("tot"), 6)
            ).otherwise(F.lit(0.0)).alias("attribution_share"),
            F.when(
                F.col("tot") > 0,
                F.round(F.col("phi") / F.col("tot") * n_conv, 6),
            ).otherwise(F.lit(0.0)).alias("attributed_conversions"),
        )
        .orderBy("channel")
    )


_ATTR_JOURNEY_CTES = f"""ev AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL AND event_id IS NOT NULL
),
firstconv AS (
  SELECT user_id, MIN(ROW(ts, event_id)) AS fc FROM ev
  WHERE event_type = '{_ATTR_CONVERSION}' GROUP BY user_id
),
j AS (
  SELECT e.user_id, e.ts, e.event_id,
         CASE WHEN e.event_type = '{_ATTR_CONVERSION}' THEN 'conv'
              ELSE e.event_type END AS state
  FROM ev e LEFT JOIN firstconv f ON f.user_id = e.user_id
  WHERE e.event_type IN ({", ".join(
      f"'{t}'" for t in list(_ATTR_TOUCHES) + [_ATTR_CONVERSION]
  )})
    AND (f.fc IS NULL OR ROW(e.ts, e.event_id) <= f.fc)
),
steps AS (
  SELECT COALESCE(LAG(state) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id),
                  'start') AS prev,
         state
  FROM j
),
terminals AS (
  SELECT state AS prev, 'null' AS state FROM (
    SELECT state, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rk
    FROM j
  ) WHERE rk = 1 AND state != 'conv'
),
cnts AS (
  SELECT prev, state, COUNT(*) AS n FROM (
    SELECT prev, state FROM steps
    UNION ALL SELECT prev, state FROM terminals
  ) GROUP BY 1, 2
),
base_p AS (
  SELECT prev AS src, state AS dst,
         n / (SUM(n) OVER (PARTITION BY prev) * 1.0) AS p
  FROM cnts
)"""


def _absorption_sql(scen_rows: list) -> str:
    """Shared absorption CTE chain for a scenario list
    [(name, removed tuple)] — scen/trans + the unrolled rounds + the
    zero-coalesced cp frame."""
    scen_vals = ", ".join(
        "('{}', '{}')".format(name, ",".join(removed))
        for name, removed in scen_rows
    )
    loops = ", ".join(f"('{a}')" for a in ("conv", "null"))
    ctes = [
        f"""scen(scenario, removed_csv) AS (VALUES {scen_vals}),
trans AS (
  SELECT scenario, src, dst, SUM(p) AS p FROM (
    SELECT s.scenario, b.src,
           CASE WHEN strpos(',' || s.removed_csv || ',',
                            ',' || b.dst || ',') > 0
                THEN 'null' ELSE b.dst END AS dst,
           b.p
    FROM base_p b CROSS JOIN scen s
  ) GROUP BY 1, 2, 3
  UNION ALL
  SELECT s.scenario, a.src, a.src AS dst, 1.0 AS p
  FROM scen s CROSS JOIN (VALUES {loops}) a(src)
),
v0 AS (SELECT scenario, 'start' AS state, 1.0 AS m FROM scen)"""
    ]
    for i in range(_MRA_ITERS):
        ctes.append(
            f"""v{i + 1} AS (
  SELECT v.scenario, t.dst AS state, ROUND(SUM(v.m * t.p), 9) AS m
  FROM v{i} v JOIN trans t ON t.scenario = v.scenario AND t.src = v.state
  GROUP BY 1, 2
)"""
        )
    ctes.append(
        f"""cp AS (
  SELECT s.scenario, COALESCE(v.cp, 0.0) AS cp
  FROM scen s LEFT JOIN (
    SELECT scenario, m AS cp FROM v{_MRA_ITERS} WHERE state = 'conv'
  ) v ON v.scenario = s.scenario
)"""
    )
    return ",\n".join(ctes)


def _markov_removal_sql() -> str:
    scen_rows = [("base", ())] + [(t, (t,)) for t in _ATTR_TOUCHES]
    return (
        "WITH "
        + _ATTR_JOURNEY_CTES
        + ",\n"
        + _absorption_sql(scen_rows)
        + """,
nconv AS (SELECT COUNT(*) AS n_conv FROM firstconv),
base AS (SELECT COALESCE(MAX(cp), 0.0) AS bcp FROM cp
         WHERE scenario = 'base'),
eff AS (
  SELECT c.scenario AS channel,
         ROUND(c.cp, 6) AS removal_conv_prob,
         CASE WHEN b.bcp > 0 THEN ROUND(1.0 - c.cp / b.bcp, 9)
              ELSE 0.0 END AS e
  FROM cp c, base b
  WHERE c.scenario != 'base'
)
SELECT channel, removal_conv_prob,
       ROUND(e, 6) AS removal_effect,
       CASE WHEN SUM(e) OVER () > 0
            THEN ROUND(e / SUM(e) OVER (), 6) ELSE 0.0 END
         AS attribution_share,
       CASE WHEN SUM(e) OVER () > 0
            THEN ROUND(e / SUM(e) OVER () * n_conv, 6) ELSE 0.0 END
         AS attributed_conversions
FROM eff, nconv
ORDER BY channel"""
    )


MARKOV_REMOVAL_SQL = _markov_removal_sql()


def _shapley_sql() -> str:
    import math
    from itertools import combinations

    subs = _shapley_subsets()
    chans = sorted(_ATTR_TOUCHES)
    n = len(chans)
    piv_cols = ", ".join(
        "COALESCE(MAX(CASE WHEN scenario = '{}' THEN cp END), 0.0) AS v_{}"
        .format(name, name.replace("+", "_"))
        for name, _sub, _removed in subs
    )
    phi_selects = []
    for c in chans:
        others = [x for x in chans if x != c]
        terms = []
        for r in range(len(others) + 1):
            for sub in combinations(others, r):
                w = (
                    math.factorial(len(sub))
                    * math.factorial(n - len(sub) - 1)
                    / math.factorial(n)
                )
                with_c = tuple(sorted(sub + (c,)))
                nm_with = "_".join(with_c)
                nm_wo = "_".join(sub) if sub else "none"
                terms.append(f"{w!r} * (v_{nm_with} - v_{nm_wo})")
        phi_selects.append(
            f"SELECT '{c}' AS channel, ROUND({' + '.join(terms)}, 9) AS phi"
            " FROM piv"
        )
    scen_rows = [(name, removed) for name, _sub, removed in subs]
    return (
        "WITH "
        + _ATTR_JOURNEY_CTES
        + ",\n"
        + _absorption_sql(scen_rows)
        + f""",
nconv AS (SELECT COUNT(*) AS n_conv FROM firstconv),
piv AS (SELECT {piv_cols} FROM cp),
phi AS ({" UNION ALL ".join(phi_selects)})
SELECT channel,
       ROUND(phi, 6) AS shapley_value,
       CASE WHEN SUM(phi) OVER () > 0
            THEN ROUND(phi / SUM(phi) OVER (), 6) ELSE 0.0 END
         AS attribution_share,
       CASE WHEN SUM(phi) OVER () > 0
            THEN ROUND(phi / SUM(phi) OVER () * n_conv, 6) ELSE 0.0 END
         AS attributed_conversions
FROM phi, nconv
ORDER BY channel"""
    )


SHAPLEY_SQL = _shapley_sql()


# Kleinberg 2-state burst automaton: burst-rate multiplier, state-entry
# cost weight, and the burst-probability ceiling (p1 = min(s·p0, cap)).
_KB_S = 2.0
_KB_GAMMA = 1.0
_KB_P1_CAP = 0.99


def events_burst_kleinberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg burst detection per event type (NEW round 15; Kleinberg
    KDD 2002, the batched 2-state automaton): each day, the type's count
    n out of the day's total N is scored under a baseline state q0
    (rate p0 = the type's overall share) and a burst state q1 (rate
    min(s·p0, cap)); entering the burst state costs γ·ln(T). The
    minimum-cost state sequence — exact Viterbi, not a threshold — is
    decoded and reported as burst INTERVALS with their event mass and
    baseline expectation. This is the principled "is this type bursting,
    and exactly when" face: unlike the per-day |z| anomaly ranking, the
    entry cost suppresses one-day blips and merges adjacent hot days
    into one episode.

    Cross-engine exactness (the HW-fold discipline): the only libm calls
    are FOUR per-type log constants + one ln(T), all ROUND(9) before
    use; each forward step rounds both state costs at 9 in a pinned
    operation order; predecessor choice bits compare the already-rounded
    doubles with a pinned tie rule (ties prefer staying); the oracle
    replays the same recurrence as a recursive CTE with LIST state
    (the ``events_hw_forecast`` precedent) and the same backward decode.

    Scale shape: ONE (type, day) hash agg over the fact; the Viterbi
    fold runs per type over the calendar-bounded zero-filled series
    (a JVM ``aggregate`` fold over ≤|days| array cells — the
    Holt/Holt-Winters shape), and the interval report is a
    gaps-and-islands window over the decoded flags."""
    grid = daily_type_grid(load(spark, "events", sf_dir))
    allday = grid.groupBy("day").agg(F.sum("n").alias("nn"))
    series = (
        grid.join(allday, "day")
        .groupBy("event_type")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("day", "n", "nn"))
            ).alias("cells"),
            F.sum("n").alias("tn"),
        )
    )
    tot = series.agg(F.sum("tn").alias("gt"))
    t_days = F.size("cells")
    # clamp p0 below the p1 cap: a single-type corpus has share 1.0 and
    # ln(1−p0) would be −∞ (0·∞ = NaN downstream); the clamped automaton
    # still orders the states correctly (p0 < p1 always)
    p0 = F.least(
        F.col("tn").cast("double") / F.col("gt").cast("double"),
        F.lit(_KB_P1_CAP - 0.01),
    )
    p1 = F.least(F.lit(_KB_S) * p0, F.lit(_KB_P1_CAP))
    prm = series.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "cells",
        F.round(F.log(p0), 9).alias("lp0"),
        F.round(F.log(1.0 - p0), 9).alias("lq0"),
        F.round(F.log(p1), 9).alias("lp1"),
        F.round(F.log(1.0 - p1), 9).alias("lq1"),
        F.round(F.lit(_KB_GAMMA) * F.log(t_days.cast("double")), 9).alias(
            "trans"
        ),
        F.round(p0, 9).alias("p0"),
    )

    def day_cost(cell, lp, lq):
        n = cell["n"].cast("double")
        rest = (cell["nn"] - cell["n"]).cast("double")
        return F.round(-(n * lp + rest * lq), 9)

    first = F.element_at("cells", 1)
    init = F.struct(
        day_cost(first, F.col("lp0"), F.col("lq0")).alias("c0"),
        F.round(
            F.col("trans") + day_cost(first, F.col("lp1"), F.col("lq1")), 9
        ).alias("c1"),
        F.array().cast("array<int>").alias("bits"),
    )

    def fwd_step(acc, cell):
        c0, c1 = acc["c0"], acc["c1"]
        cost0 = day_cost(cell, F.col("lp0"), F.col("lq0"))
        cost1 = day_cost(cell, F.col("lp1"), F.col("lq1"))
        enter = F.round(c0 + F.col("trans"), 9)
        b0 = F.when(c1 < c0, F.lit(1)).otherwise(F.lit(0))
        b1 = F.when(enter < c1, F.lit(0)).otherwise(F.lit(1))
        return F.struct(
            F.round(F.least(c0, c1) + cost0, 9).alias("c0"),
            F.round(F.least(enter, c1) + cost1, 9).alias("c1"),
            F.concat(acc["bits"], F.array(b0 + 2 * b1)).alias("bits"),
        )

    folded = prm.select(
        "event_type",
        "cells",
        "p0",
        F.aggregate(
            F.slice("cells", 2, F.greatest(t_days - 1, F.lit(0))),
            init,
            fwd_step,
        ).alias("st"),
    )
    final_state = F.when(
        F.col("st.c1") < F.col("st.c0"), F.lit(1)
    ).otherwise(F.lit(0))
    bwd_init = F.struct(
        final_state.alias("cur"), F.array(final_state).alias("flags")
    )

    def bwd_step(acc, code):
        prev = F.when(
            acc["cur"] == 0, F.pmod(code, F.lit(2))
        ).otherwise(F.floor(code / 2).cast("int"))
        return F.struct(
            prev.alias("cur"),
            F.concat(F.array(prev), acc["flags"]).alias("flags"),
        )

    decoded = folded.select(
        "event_type",
        "cells",
        "p0",
        F.aggregate(F.reverse("st.bits"), bwd_init, bwd_step)["flags"].alias(
            "flags"
        ),
    )
    days = decoded.select(
        "event_type",
        "p0",
        F.posexplode(F.arrays_zip("cells", "flags")).alias("i", "zc"),
    ).select(
        "event_type",
        "p0",
        "i",
        F.col("zc.cells.day").alias("day"),
        F.col("zc.cells.n").alias("n"),
        F.col("zc.cells.nn").alias("nn"),
        F.col("zc.flags").alias("flag"),
    )
    wisl = Window.partitionBy("event_type", "flag").orderBy("i")
    return (
        days.filter(F.col("flag") == 1)
        .withColumn("grp", F.col("i") - F.row_number().over(wisl))
        .groupBy("event_type", "grp")
        .agg(
            F.min("day").alias("burst_start"),
            F.max("day").alias("burst_end"),
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n").cast("long").alias("events"),
            F.round(F.sum(F.col("p0") * F.col("nn")), 6).alias("expected"),
        )
        .select(
            "event_type", "burst_start", "burst_end", "n_days", "events",
            "expected",
        )
        .orderBy("event_type", "burst_start")
    )


BURST_KLEINBERG_SQL = f"""
WITH RECURSIVE ev AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
daily AS (SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2),
spine AS (
  SELECT UNNEST(generate_series(
           (SELECT MIN(day) FROM daily),
           (SELECT MAX(day) FROM daily),
           INTERVAL 1 DAY)) AS day
),
grid AS (
  SELECT t.event_type, CAST(s.day AS DATE) AS day, COALESCE(d.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN spine s
  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = CAST(s.day AS DATE)
),
allday AS (SELECT day, SUM(n) AS nn FROM grid GROUP BY 1),
series AS (
  SELECT g.event_type,
         ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.day) AS idx,
         g.day, g.n, a.nn
  FROM grid g JOIN allday a ON a.day = g.day
),
tdays AS (SELECT COUNT(*) AS t_days FROM spine),
prm AS (
  SELECT event_type,
         ROUND(LN(p0), 9) AS lp0, ROUND(LN(1 - p0), 9) AS lq0,
         ROUND(LN(p1), 9) AS lp1, ROUND(LN(1 - p1), 9) AS lq1,
         ROUND({_KB_GAMMA} * LN(CAST(t_days AS DOUBLE)), 9) AS trans,
         ROUND(p0, 9) AS p0
  FROM (
    SELECT event_type,
           LEAST(SUM(n) * 1.0 / (SELECT SUM(n) FROM grid),
                 {_KB_P1_CAP} - 0.01) AS p0,
           LEAST({_KB_S} * LEAST(SUM(n) * 1.0 / (SELECT SUM(n) FROM grid),
                                 {_KB_P1_CAP} - 0.01),
                 {_KB_P1_CAP}) AS p1
    FROM grid GROUP BY event_type
  ), tdays
),
fwd AS (
  SELECT s.event_type, 1 AS t,
         ROUND(-(s.n * p.lp0 + (s.nn - s.n) * p.lq0), 9) AS c0,
         ROUND(p.trans + ROUND(-(s.n * p.lp1 + (s.nn - s.n) * p.lq1), 9), 9)
           AS c1,
         CAST([] AS INT[]) AS bits
  FROM series s JOIN prm p ON p.event_type = s.event_type
  WHERE s.idx = 1
  UNION ALL
  SELECT f.event_type, f.t + 1,
         ROUND(LEAST(f.c0, f.c1)
               + ROUND(-(s.n * p.lp0 + (s.nn - s.n) * p.lq0), 9), 9),
         ROUND(LEAST(ROUND(f.c0 + p.trans, 9), f.c1)
               + ROUND(-(s.n * p.lp1 + (s.nn - s.n) * p.lq1), 9), 9),
         list_append(f.bits,
           CASE WHEN f.c1 < f.c0 THEN 1 ELSE 0 END
           + 2 * CASE WHEN ROUND(f.c0 + p.trans, 9) < f.c1 THEN 0 ELSE 1 END)
  FROM fwd f
  JOIN series s ON s.event_type = f.event_type AND s.idx = f.t + 1
  JOIN prm p ON p.event_type = f.event_type
),
lastrow AS (
  SELECT event_type, t, c0, c1, bits
  FROM (SELECT f.*, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY t DESC) AS rn FROM fwd f)
  WHERE rn = 1
),
bwd AS (
  SELECT event_type, t, CASE WHEN c1 < c0 THEN 1 ELSE 0 END AS st, bits
  FROM lastrow
  UNION ALL
  SELECT b.event_type, b.t - 1,
         CASE WHEN b.st = 0 THEN b.bits[b.t - 1] % 2
              ELSE b.bits[b.t - 1] // 2 END,
         b.bits
  FROM bwd b WHERE b.t > 1
),
flagged AS (
  SELECT s.event_type, s.idx, s.day, s.n, s.nn, b.st, p.p0
  FROM bwd b
  JOIN series s ON s.event_type = b.event_type AND s.idx = b.t
  JOIN prm p ON p.event_type = b.event_type
  WHERE b.st = 1
),
isl AS (
  SELECT event_type, idx, day, n, nn, p0,
         idx - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY idx)
           AS grp
  FROM flagged
)
SELECT event_type,
       MIN(day) AS burst_start,
       MAX(day) AS burst_end,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(n) AS BIGINT) AS events,
       ROUND(SUM(p0 * nn), 6) AS expected
FROM isl
GROUP BY event_type, grp
ORDER BY event_type, burst_start
"""


# --- Deterministic Poisson bootstrap ---------------------------------------
# Replicate count: enough for a discrete 95% band (ranks 2 and R−1), small
# enough that the replicate fan-out is a constant factor on the scan.
_BOOT_R = 40
# Poisson(1) CDF thresholds, pinned to 6 decimals — the inverse-CDF table
# BOTH engines compare the md5 uniform against (literal-for-literal, so the
# draw cannot flake at a boundary); tail mass beyond 6 lands on w=7.
_POIS1_CDF = (0.367879, 0.735759, 0.919699, 0.981012, 0.996341, 0.999406,
              0.999917)


def _pois1_weight(u: F.Column) -> F.Column:
    """Inverse-CDF Poisson(1) draw from a uniform in [0,1): the smallest k
    with u < F(k)."""
    w: F.Column | None = None
    expr = F.lit(len(_POIS1_CDF))
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        expr = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(expr)
    return expr


def bootstrap_ci_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap 95% CI on the mean order value per order
    priority (NEW round 15) — the uncertainty readout the experimentation
    family (z / Wilson / CUPED / DiD) lacks for non-binary metrics with
    no closed-form variance: does priority A's mean order value CREDIBLY
    exceed B's, or is the gap inside resampling noise?

    The resampler is the POISSON bootstrap (Chamandy et al., the
    map-reduce-native form): instead of drawing n rows with replacement
    (which needs a global index), each row independently contributes
    Poisson(1) copies to each replicate — exchangeable with the classic
    bootstrap at scale, and embarrassingly parallel. Every draw is
    DETERMINISTIC, and hashing amortizes 8 draws per digest: one md5 has
    32 hex chars = EIGHT 16-bit lanes, so replicate r reads lane (r mod 8)
    of md5(orderkey:⌊r/8⌋) as u = (lane mod 10⁴)/10⁴ (the
    ``sample_hash_fraction`` law per lane — R=40 costs 5 hashes/row, not
    40) pushed through a 6-decimal-pinned inverse-CDF table, so reruns,
    partitionings and both engines produce the same replicates. Money
    sums as integer cents; each replicate mean is ONE integer/integer
    double division; the CI is the DISCRETE (rank-2, rank-39) band of
    the 40 sorted replicate means with (value, replicate) tie order —
    no interpolation divergence.

    Scale shape: the scan fans out ×R through a posexplode of the
    per-row weight array, but partial aggregation collapses (priority,
    replicate) cells map-side — the shuffle carries ≤ |priorities|·R
    rows per task, and everything after runs on the |priorities|×R
    grid. At 100 TB: one pass over orders, 200 shuffle rows per task,
    driver state nil. (`load_spread`: the per-row hashing dominates scan
    width, so the single-row-group test file must not serialize into
    one task.)"""
    orders = load_spread(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    n_salts = (_BOOT_R + 7) // 8
    digests = F.transform(
        F.sequence(F.lit(0), F.lit(n_salts - 1)),
        lambda s: F.md5(
            F.concat_ws(
                ":", F.col("o_orderkey").cast("string"), s.cast("string")
            )
        ),
    )
    # Two-step binding, both load-bearing for cost: digests materialize as
    # a COLUMN (an inlined expression would re-hash inside every lambda
    # body), and u binds as a LAMBDA VARIABLE before the inverse-CDF CASE
    # (whose 7 branches would otherwise each re-evaluate the whole
    # hash-extract expression).
    uniforms = F.transform(
        F.sequence(F.lit(0), F.lit(_BOOT_R - 1)),
        lambda r: F.pmod(
            F.conv(
                F.substring(
                    F.get(F.col("h"), F.floor(r / 8).cast("int")),
                    (F.pmod(r, F.lit(8)) * 4 + 1).cast("int"),
                    F.lit(4),
                ),
                16,
                10,
            ).cast("int"),
            F.lit(10000),
        )
        / F.lit(10000.0),
    )
    weights = F.transform(uniforms, lambda u: _pois1_weight(u).cast("long"))
    cells = (
        orders.withColumn("h", digests)
        .select(
            "o_orderpriority",
            "cents",
            F.posexplode(weights).alias("r", "w"),
        )
        .groupBy("o_orderpriority", "r")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("wsum"),
            F.sum("w").alias("wn"),
        )
        .select(
            "o_orderpriority",
            "r",
            (F.col("wsum").cast("double") / F.col("wn").cast("double")).alias(
                "mean_c"
            ),
        )
    )
    wrk = Window.partitionBy("o_orderpriority").orderBy("mean_c", "r")
    band = (
        cells.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk").isin(2, _BOOT_R - 1))
        .groupBy("o_orderpriority")
        .agg(
            F.min("mean_c").alias("lo_c"),
            F.max("mean_c").alias("hi_c"),
        )
    )
    point = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("mean_c"),
    )
    return (
        point.join(band, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_orders",
            F.round(F.col("mean_c") / 100.0, 4).alias("mean_value"),
            F.round(F.col("lo_c") / 100.0, 4).alias("ci_lo"),
            F.round(F.col("hi_c") / 100.0, 4).alias("ci_hi"),
        )
        .orderBy("o_orderpriority")
    )


def _pois1_weight_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {_POIS1_CDF[k]} THEN {k}"
        for k in range(len(_POIS1_CDF))
    )
    return f"CASE {branches} ELSE {len(_POIS1_CDF)} END"


BOOTSTRAP_CI_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
reps AS (SELECT UNNEST(range({_BOOT_R})) AS r),
draws AS (
  SELECT o.o_orderpriority, reps.r, o.cents,
         {_pois1_weight_sql(
             "((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' "
             "|| CAST((r // 8) AS VARCHAR)), (r % 8) * 4 + 1, 4)) AS INT) "
             "% 10000) / 10000.0)"
         )} AS w
  FROM o CROSS JOIN reps
),
cells AS (
  SELECT o_orderpriority, r,
         CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_c
  FROM draws GROUP BY 1, 2
),
band AS (
  SELECT o_orderpriority, MIN(mean_c) AS lo_c, MAX(mean_c) AS hi_c FROM (
    SELECT o_orderpriority, mean_c,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY mean_c, r) AS rk
    FROM cells
  ) WHERE rk IN (2, {_BOOT_R - 1})
  GROUP BY 1
),
point AS (
  SELECT o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_c
  FROM o GROUP BY 1
)
SELECT p.o_orderpriority,
       CAST(p.n_orders AS BIGINT) AS n_orders,
       ROUND(p.mean_c / 100.0, 4) AS mean_value,
       ROUND(b.lo_c / 100.0, 4) AS ci_lo,
       ROUND(b.hi_c / 100.0, 4) AS ci_hi
FROM point p JOIN band b ON b.o_orderpriority = p.o_orderpriority
ORDER BY p.o_orderpriority
"""


def experiment_did_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout (NEW round 13; the Card-Krueger
    quasi-experimental design — completes the experimentation family
    next to the A/B z-test, Wilson intervals and CUPED): users split
    into control/treatment by the SAME md5 arm hash as
    ``experiment_ab_eval`` (one assignment definition across the
    family), time splits into pre/post at the corpus midpoint date, and
    the effect estimate is (T_post − T_pre) − (C_post − C_pre) over the
    per-cell mean event value — the estimator that differences away both
    the stable arm gap and the common time trend.

    Cross-engine exactness: event values sum as INTEGER CENTS (the
    money-sum discipline — no float-sum order dependence), means divide
    the exact cents total once, and the DiD closed form runs on those
    exact doubles before the single ROUND 6.  One conditional-agg pass:
    no joins, no window; the 8 cell aggregates collapse map-side."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    day = F.to_date(F.col("ts").cast("timestamp"))
    bounds = ev.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 2
    )
    cells = ev.crossJoin(F.broadcast(bounds)).select(
        arm.alias("arm"),
        (
            F.datediff(day, F.col("d0"))
            >= F.floor(F.datediff("d1", "d0") / 2)
        )
        .cast("int")
        .alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def cell(a: int, p: int, col, agg):
        return agg(
            F.when((F.col("arm") == a) & (F.col("post") == p), col)
        )

    m = cells.agg(
        *[
            cell(a, p, F.lit(1), F.count).alias(f"n_{'t' if a else 'c'}_{'post' if p else 'pre'}")
            for a in (0, 1)
            for p in (0, 1)
        ],
        *[
            F.coalesce(
                cell(a, p, F.col("cents"), F.sum), F.lit(0).cast("long")
            ).alias(f"s_{'t' if a else 'c'}_{'post' if p else 'pre'}")
            for a in (0, 1)
            for p in (0, 1)
        ],
    )

    def mean(tag):
        # empty-cell guard (ANSI mode errors on /0; an empty cell has no
        # mean — NULL, and the DiD estimate is NULL with it)
        return F.when(
            F.col(f"n_{tag}") > 0,
            F.col(f"s_{tag}") / F.lit(100.0) / F.col(f"n_{tag}"),
        )

    did = (mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre"))
    return m.select(
        *[F.col(f"n_{t}").cast("long").alias(f"n_{t}")
          for t in ("c_pre", "c_post", "t_pre", "t_post")],
        *[F.round(mean(t), 6).alias(f"mean_{t}")
          for t in ("c_pre", "c_post", "t_pre", "t_post")],
        F.round(did, 6).alias("did_estimate"),
    )


EXPERIMENT_DID_SQL = """
WITH ev AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS INT)
           % 2 AS arm,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
cells AS (
  SELECT arm,
         CASE WHEN date_diff('day', d0, day)
                   >= FLOOR(date_diff('day', d0, d1) / 2)
              THEN 1 ELSE 0 END AS post,
         cents
  FROM ev, bounds
),
m AS (
  SELECT
    COUNT(*) FILTER (arm = 0 AND post = 0) AS n_c_pre,
    COUNT(*) FILTER (arm = 0 AND post = 1) AS n_c_post,
    COUNT(*) FILTER (arm = 1 AND post = 0) AS n_t_pre,
    COUNT(*) FILTER (arm = 1 AND post = 1) AS n_t_post,
    COALESCE(SUM(cents) FILTER (arm = 0 AND post = 0), 0) AS s_c_pre,
    COALESCE(SUM(cents) FILTER (arm = 0 AND post = 1), 0) AS s_c_post,
    COALESCE(SUM(cents) FILTER (arm = 1 AND post = 0), 0) AS s_t_pre,
    COALESCE(SUM(cents) FILTER (arm = 1 AND post = 1), 0) AS s_t_post
  FROM cells
)
SELECT CAST(n_c_pre AS BIGINT) AS n_c_pre,
       CAST(n_c_post AS BIGINT) AS n_c_post,
       CAST(n_t_pre AS BIGINT) AS n_t_pre,
       CAST(n_t_post AS BIGINT) AS n_t_post,
       ROUND(CASE WHEN n_c_pre > 0 THEN s_c_pre / 100.0 / n_c_pre END, 6)
         AS mean_c_pre,
       ROUND(CASE WHEN n_c_post > 0 THEN s_c_post / 100.0 / n_c_post END, 6)
         AS mean_c_post,
       ROUND(CASE WHEN n_t_pre > 0 THEN s_t_pre / 100.0 / n_t_pre END, 6)
         AS mean_t_pre,
       ROUND(CASE WHEN n_t_post > 0 THEN s_t_post / 100.0 / n_t_post END, 6)
         AS mean_t_post,
       ROUND(CASE WHEN n_c_pre > 0 AND n_c_post > 0
                   AND n_t_pre > 0 AND n_t_post > 0
             THEN (s_t_post / 100.0 / n_t_post - s_t_pre / 100.0 / n_t_pre)
                - (s_c_post / 100.0 / n_c_post - s_c_pre / 100.0 / n_c_pre)
             END, 6) AS did_estimate
FROM m
"""


# Kaplan-Meier knobs: users whose last event falls within the censor
# window of the corpus max date are CENSORED (still alive), not churned.
# 0 = censor only users active on the corpus max date — the synthetic
# fixture's activity clusters at the end, so any wider window censors
# everyone; production sets this to the product's churn definition.
_KM_CENSOR_DAYS = 0


def user_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier user-survival curve (NEW round 13; Kaplan & Meier
    1958 — the standard right-censored churn/retention estimator, a
    different object from `cohort_retention`'s share-active curve): per
    user, lifetime T = days between first and last event; users whose
    last event is within {censor} days of the corpus max date are
    right-CENSORED (still alive), the rest are churn events at T.  For
    each churn time t: the at-risk count n_t (users with T ≥ t), churn
    count d_t, censored-at-t count, and the survival estimate
    S(t) = Π_{{t_i ≤ t}} (1 − d_i/n_i).

    Cross-engine exactness: the product is a SEQUENTIAL fold over the
    churn-time factors with ROUND(·, 9) after every multiply — identical
    step order on both engines (Spark F.aggregate ≡ DuckDB list_reduce,
    the _bpe_merge_fold discipline), so no EXP(SUM(LN)) libm divergence.
    The fold runs over the CHURN-TIME table — calendar-bounded (≤ days
    spanned by the corpus), never the users.

    Scale shape: one user-keyed shuffle (the lifetime agg), a broadcast
    1-row max date, one calendar-bounded day table whose at-risk counts
    come from a prefix-sum window over ≤|days| rows, and the O(days²)
    per-row fold on that same bounded table.

    The op is the composition ``survival_km_from_user_state ∘
    rfm_user_partials`` (the events_rfm_segments discipline): the same
    per-user lifecycle partials the incremental user-state ingest
    maintains serve the survival curve with no extra state.""".format(
        censor=_KM_CENSOR_DAYS
    )
    return survival_km_from_user_state(
        rfm_user_partials(
            load(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
        )
    )


def survival_km_from_user_state(state: DataFrame) -> DataFrame:
    """KM finalizer over (merged) per-user lifecycle partials — the same
    (user_id, d_first, d_last, …) rows :func:`rfm_user_partials` emits
    and the incremental user-state ingest maintains, so the maintained
    table serves survival curves with NO extra state (the seventeenth
    serve face on an existing path; parity test in
    tests/test_streaming.py).  Accepts un-merged per-batch partials too:
    it re-merges per user first (min/max are idempotent)."""
    u = state.groupBy("user_id").agg(
        F.min("d_first").alias("d0"), F.max("d_last").alias("d1")
    )
    mx = u.agg(F.max("d1").alias("dmax"))
    lt = u.crossJoin(F.broadcast(mx)).select(
        F.datediff("d1", "d0").alias("t"),
        (F.datediff("dmax", "d1") > _KM_CENSOR_DAYS)
        .cast("int")
        .alias("died"),
    )
    per_t = lt.groupBy("t").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("died").alias("n_deaths"),
        F.sum(1 - F.col("died")).alias("n_censored"),
    )
    total = lt.agg(F.count(F.lit(1)).alias("n_total"))
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.crossJoin(F.broadcast(total)).select(
        "t",
        "n_deaths",
        "n_censored",
        (F.col("n_total") - F.coalesce(F.sum("m").over(wt), F.lit(0))).alias(
            "n_risk"
        ),
    )
    # churn-time factors in t order, then the per-row pinned-round fold
    # over the bounded factor array (S(t) needs the prefix product)
    deaths = risk.filter(F.col("n_deaths") > 0).withColumn(
        "k", F.row_number().over(Window.orderBy("t"))
    )
    # sort_array over (t, factor) structs, NOT collect_list over a sorted
    # frame — aggregation order is not guaranteed to follow the sort
    factors = deaths.agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "t",
                        (F.lit(1.0) - F.col("n_deaths") / F.col("n_risk")).alias(
                            "f"
                        ),
                    )
                )
            ),
            lambda x: x["f"],
        ).alias("fs")
    )
    return (
        deaths.crossJoin(F.broadcast(factors))
        .select(
            "t",
            "n_risk",
            "n_deaths",
            "n_censored",
            F.aggregate(
                F.slice("fs", 1, F.col("k")),
                F.lit(1.0),
                lambda acc, x: F.round(acc * x, 9),
            ).alias("survival"),
        )
        .orderBy("t")
    )


USER_SURVIVAL_KM_SQL = f"""
WITH u AS (
  SELECT user_id,
         MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0,
         MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d1
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id
),
mx AS (SELECT MAX(d1) AS dmax FROM u),
lt AS (
  SELECT CAST(date_diff('day', d0, d1) AS INT) AS t,
         CASE WHEN date_diff('day', d1, dmax) > {_KM_CENSOR_DAYS}
              THEN 1 ELSE 0 END AS died
  FROM u, mx
),
per_t AS (
  SELECT t, COUNT(*) AS m,
         CAST(SUM(died) AS BIGINT) AS n_deaths,
         CAST(SUM(1 - died) AS BIGINT) AS n_censored
  FROM lt GROUP BY t
),
tot AS (SELECT COUNT(*) AS n_total FROM lt),
risk AS (
  SELECT t, n_deaths, n_censored,
         CAST(n_total - COALESCE(SUM(m) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM per_t, tot
),
deaths AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY t) AS k
  FROM risk WHERE n_deaths > 0
),
fs AS (
  SELECT list(1.0 - n_deaths * 1.0 / n_risk ORDER BY t) AS fs FROM deaths
)
SELECT t, n_risk, n_deaths, n_censored,
       list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fs[1:k]),
                   (acc, x) -> ROUND(acc * x, 9)) AS survival
FROM deaths, fs
ORDER BY t
"""


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "funnel_latency": funnel_latency,
    "user_survival_km": user_survival_km,
    "experiment_did_eval": experiment_did_eval,
    "events_daily_autocorr": events_daily_autocorr,
    "events_theil_sen_trend": events_theil_sen_trend,
    "bootstrap_ci_order_value": bootstrap_ci_order_value,
    "item_simrank": item_simrank,
    "events_forecast_conformal": events_forecast_conformal,
    "events_burst_kleinberg": events_burst_kleinberg,
    "attribution_markov_removal": attribution_markov_removal,
    "attribution_shapley": attribution_shapley,
    "experiment_welch_ttest": experiment_welch_ttest,
    "benford_digit_audit": benford_digit_audit,
    "recommend_ppr": recommend_ppr,
    "events_holt_forecast": events_holt_forecast,
    "events_hw_forecast": events_hw_forecast,
    "events_hw_backtest": events_hw_backtest,
    "markov_entropy_rate": markov_entropy_rate,
    "events_type_dow_chisq": events_type_dow_chisq,
    "events_sequence_support": events_sequence_support,
    "events_fano_factor": events_fano_factor,
    "events_forecast_backtest": events_forecast_backtest,
    "attribution_linear": attribution_linear,
    "experiment_ab_eval": experiment_ab_eval,
    "experiment_cuped_eval": experiment_cuped_eval,
    "impute_events_value": impute_events_value,
    "events_type_mix_drift": events_type_mix_drift,
    "touch_conversion_intervals": touch_conversion_intervals,
    "cohort_retention": cohort_retention,
    "events_anomaly_mad": events_anomaly_mad,
    "events_item_cooccurrence": events_item_cooccurrence,
    "events_markov_transitions": events_markov_transitions,
    "item_pagerank": item_pagerank,
    "events_rfm_segments": events_rfm_segments,
    "item_communities": item_communities,
    "session_top_paths": session_top_paths,
    "attribution_last_touch": attribution_last_touch,
    "events_dau_wau_mau": events_dau_wau_mau,
    "basket_association_rules": basket_association_rules,
    "recommend_items": recommend_items,
    "item_triangles": item_triangles,
    "session_stats": session_stats,
    "user_behavior_surprisal": user_behavior_surprisal,
    "item_jaccard_similarity": item_jaccard_similarity,
    "events_hourly_seasonality": events_hourly_seasonality,
    "events_hourly_anomalies": events_hourly_anomalies,
    "events_power_users_curve": events_power_users_curve,
    "sessions_peak_concurrency": sessions_peak_concurrency,
    "events_user_lifecycle": events_user_lifecycle,
    "events_cusum_changepoint": events_cusum_changepoint,
    "point_in_time_features": point_in_time_features,
    "negative_sampling_uniform": negative_sampling_uniform,
    "events_value_quantiles": events_value_quantiles,
}


def _session_stats_sql() -> str:
    from .windows import SESSIONIZE_SQL

    return SESSION_STATS_SQL_TEMPLATE.format(sessionize_sql=SESSIONIZE_SQL)


def _sessions_peak_concurrency_sql() -> str:
    from .windows import SESSIONIZE_SQL

    return SESSION_CONCURRENCY_SQL_TEMPLATE.format(
        sessionize_sql=SESSIONIZE_SQL
    )

ORACLES = {
    # round 13: Kaplan-Meier churn curve (pinned-round sequential fold)
    "user_survival_km": USER_SURVIVAL_KM_SQL,
    "experiment_did_eval": EXPERIMENT_DID_SQL,
    "events_daily_autocorr": EVENTS_DAILY_AUTOCORR_SQL,
    # round 15: Theil–Sen robust trend on the shared daily grid
    "events_theil_sen_trend": THEIL_SEN_SQL,
    # round 15: deterministic Poisson-bootstrap percentile CI
    "bootstrap_ci_order_value": BOOTSTRAP_CI_SQL,
    # round 15: SimRank structural similarity (unrolled pinned iterations)
    "item_simrank": SIMRANK_SQL,
    # round 15: split-conformal forecast intervals (integer residual quantile)
    "events_forecast_conformal": FORECAST_CONFORMAL_SQL,
    # round 15: Kleinberg 2-state burst Viterbi (recursive-CTE oracle)
    "events_burst_kleinberg": BURST_KLEINBERG_SQL,
    # round 15: Markov removal-effect attribution (unrolled absorption)
    "attribution_markov_removal": MARKOV_REMOVAL_SQL,
    # round 15: exact Shapley attribution over all 2^n coalitions
    "attribution_shapley": SHAPLEY_SQL,
    # round 15: Welch t-test on mean per-user value (integer moments)
    "experiment_welch_ttest": WELCH_TTEST_SQL,
    # round 15: Benford first-digit forensic audit (pinned literals)
    "benford_digit_audit": BENFORD_SQL,
    "recommend_ppr": RECOMMEND_PPR_SQL,
    "events_holt_forecast": EVENTS_HOLT_SQL,
    # round 14: Holt-Winters additive weekly seasonality + its holdout
    # backtest vs the lag-7 seasonal-naive baseline
    "events_hw_forecast": EVENTS_HW_FORECAST_SQL,
    "events_hw_backtest": EVENTS_HW_BACKTEST_SQL,
    "markov_entropy_rate": MARKOV_ENTROPY_SQL,
    "events_type_dow_chisq": EVENTS_TYPE_DOW_CHISQ_SQL,
    "events_sequence_support": EVENTS_SEQUENCE_SUPPORT_SQL,
    "events_fano_factor": EVENTS_FANO_SQL,
    "funnel_conversion": FUNNEL_SQL,
    "funnel_latency": FUNNEL_LATENCY_SQL,
    "cohort_retention": COHORT_SQL,
    "events_anomaly_mad": ANOMALY_MAD_SQL,
    "events_item_cooccurrence": COOCCURRENCE_SQL,
    "events_markov_transitions": MARKOV_SQL,
    "item_pagerank": PAGERANK_SQL,
    "events_rfm_segments": RFM_SQL,
    "item_communities": LPA_SQL,
    "session_top_paths": SESSION_PATHS_SQL,
    "attribution_last_touch": ATTRIBUTION_SQL,
    "events_dau_wau_mau": DAU_WAU_MAU_SQL,
    "basket_association_rules": ASSOCIATION_RULES_SQL,
    "recommend_items": RECOMMEND_SQL,
    "item_triangles": ITEM_TRIANGLES_SQL,
    "session_stats": _session_stats_sql(),
    "user_behavior_surprisal": USER_SURPRISAL_SQL,
    "item_jaccard_similarity": ITEM_JACCARD_SQL,
    "events_hourly_seasonality": SEASONALITY_SQL,
    "events_hourly_anomalies": HOURLY_ANOMALIES_SQL,
    "events_power_users_curve": POWER_USERS_SQL,
    "sessions_peak_concurrency": _sessions_peak_concurrency_sql(),
    # round 11: growth accounting + CUSUM changepoint
    "events_user_lifecycle": USER_LIFECYCLE_SQL,
    "events_cusum_changepoint": CUSUM_SQL,
    # round 12: seasonal-naive backtest over the SHARED daily_type_grid
    "events_forecast_backtest": FORECAST_BACKTEST_SQL,
    # round 12: linear multi-touch attribution (shared touch/lookback defs)
    "attribution_linear": ATTRIBUTION_LINEAR_SQL,
    # round 12: experimentation readout (md5 arms, pooled two-proportion z)
    "experiment_ab_eval": EXPERIMENT_AB_SQL,
    # round 12: CUPED covariate adjustment (pooled moments closed form)
    "experiment_cuped_eval": EXPERIMENT_CUPED_SQL,
    # round 12: median imputation on the shared exact-median machinery
    "impute_events_value": IMPUTE_EVENTS_SQL,
    # round 12: weekly categorical mix drift (the JSD pattern on types)
    "events_type_mix_drift": EVENTS_TYPE_MIX_SQL,
    # round 12: per-channel Wilson interval on the shared converting-touch def
    "touch_conversion_intervals": TOUCH_CONVERSION_CI_SQL,
    "point_in_time_features": PIT_FEATURES_SQL,
    "negative_sampling_uniform": NEGATIVE_SAMPLING_SQL,
    "events_value_quantiles": EVENTS_VALUE_QUANTILES_SQL,
}
