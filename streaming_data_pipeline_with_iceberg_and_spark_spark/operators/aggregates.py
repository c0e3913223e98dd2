"""Aggregation operators (SURVEY.md §2.4, A1-A10).

All stock Spark hash aggregation — partial (map-side) + final agg come free
from Catalyst; no query here forces an extra shuffle beyond the one the
group-by key requires. ``approx_count_distinct`` (HLL) is rows-only: its
estimate is engine-specific by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load, register_views


def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: global (no-group) aggregation over lineitem."""
    li = load(spark, "lineitem", sf_dir)
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        # avg in integer micro-units (discount has 2 decimals): a rounded
        # float avg flips its last digit with accumulation order — i.e. with
        # the executor core count
        F.expr(
            "(sum(cast(round(l_discount * 100) as bigint)) * 10000) div count(*)"
        ).alias("avg_disc_e6"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


AGG_GLOBAL_SQL = """
SELECT COUNT(*) AS n_rows,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price,
       (CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) * 10000) // COUNT(*) AS avg_disc_e6,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
"""


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: distinct + count-distinct per group."""
    orders = load(spark, "orders", sf_dir)
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_distinct_cust"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


AGG_COUNT_DISTINCT_SQL = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_distinct_cust,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: statistical aggregates (sample semantics on both engines)."""
    li = load(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev("l_quantity"), 6).alias("std_qty"),
        F.round(F.variance("l_extendedprice"), 4).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("covar_disc_tax"),
        F.round(F.stddev_pop("l_discount"), 8).alias("stdpop_disc"),
    )


AGG_STATS_SQL = """
SELECT l_returnflag,
       ROUND(stddev_samp(l_quantity), 6) AS std_qty,
       ROUND(var_samp(l_extendedprice), 4) AS var_price,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(covar_samp(l_discount, l_tax), 8) AS covar_disc_tax,
       ROUND(stddev_pop(l_discount), 8) AS stdpop_disc
FROM lineitem
GROUP BY l_returnflag
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: exact percentiles / median (continuous interpolation both engines).

    ``percentile_approx`` exists for the at-scale path; exact ``percentile``
    is used here because it is oracle-comparable.
    """
    li = load(spark, "lineitem", sf_dir)
    return li.groupBy("l_linestatus").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 6).alias("p95_qty"),
        F.round(F.median("l_extendedprice"), 6).alias("median_price"),
    )


AGG_PERCENTILES_SQL = """
SELECT l_linestatus,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
       ROUND(quantile_cont(l_quantity, 0.95), 6) AS p95_qty,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
FROM lineitem
GROUP BY l_linestatus
"""


def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: collect_set (sorted for determinism) + first/last via min/max.

    The sorted set is emitted as a comma-joined string, not a bare array:
    the driver's pandas-based canonicalizer cannot sort/hash list cells
    (round-1 gate crash), and a scalar column carries the same information.
    """
    orders = load(spark, "orders", sf_dir)
    return orders.groupBy("o_orderstatus").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        ),
        F.min("o_orderkey").alias("first_key"),
        F.max("o_orderkey").alias("last_key"),
    )


AGG_COLLECT_SQL = """
SELECT o_orderstatus,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
       MIN(o_orderkey) AS first_key,
       MAX(o_orderkey) AS last_key
FROM orders
GROUP BY o_orderstatus
"""


def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: conditional aggregation (count_if / filtered sums)."""
    ev = load(spark, "events", sf_dir)
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("value") > 100).alias("n_big"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)).alias(
            "purchase_value_raw"
        ),
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
    ).withColumn("purchase_value", F.round("purchase_value_raw", 2)).drop(
        "purchase_value_raw"
    )


AGG_CONDITIONAL_SQL = """
SELECT user_id,
       COUNT(*) FILTER (value > 100) AS n_big,
       COUNT(*) FILTER (event_type = 'error') AS n_errors,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_value
FROM events
GROUP BY user_id
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: rollup with grouping indicators."""
    li = load(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


AGG_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
       COALESCE(l_linestatus, '(all)') AS linestatus,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: cube over two order dimensions."""
    orders = load(spark, "orders", sf_dir)
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n",
            "avg_price",
        )
    )


AGG_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, '(all)') AS status,
       COALESCE(o_orderpriority, '(all)') AS priority,
       COUNT(*) AS n,
       ROUND(AVG(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: explicit GROUPING SETS via SQL over registered views (the
    reference's query surface is SQL-over-views, spark_job.py:31-37)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(CAST(year(o_orderdate) AS INT), -1) AS yr,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
        """
    )


AGG_GROUPING_SETS_SQL = """
SELECT COALESCE(o_orderstatus, '(all)') AS status,
       COALESCE(CAST(year(o_orderdate) AS INT), -1) AS yr,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
"""


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: pivot event counts per user over a pinned value list (pinning the
    list keeps the plan a single pass — no extra distinct-scan job)."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


AGG_PIVOT_SQL = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click')    AS click,
       COUNT(*) FILTER (event_type = 'error')    AS error,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup')   AS signup,
       COUNT(*) FILTER (event_type = 'view')     AS view
FROM events
GROUP BY user_id
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: HLL approximate count-distinct — rows-only (estimates are
    engine-specific); the scale path for 100 TB cardinality estimation."""
    ev = load(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch cardinality (Apache DataSketches HLL): per-event-type
    user sketches, plus an 'ALL' row whose estimate comes from UNIONING the
    per-type sketches — never re-touching the raw data. This is THE 100 TB
    distinct-counting pattern: partial sketches are tiny, commutative, and
    re-aggregable across partitions / days / retries, where exact distinct
    would shuffle every row to one reducer per re-slice. Rows-only check
    (estimates are engine-specific); accuracy + union-consistency asserted
    in tests/test_extensions.py."""
    ev = load(spark, "events", sf_dir)
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "exact_users",
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    ).select(
        F.lit("ALL").alias("event_type"),
        "approx_users",
        F.lit(None).cast("long").alias("exact_users"),
    )
    return typed.unionByName(merged)


def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (A9's inverse): wide per-priority order metrics →
    long (priority, metric, value) rows via ``DataFrame.unpivot`` — the
    tidy-format reshape feeding per-metric downstream aggregation."""
    orders = load(spark, "orders", sf_dir)
    wide = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        # sum exact integer cents, divide ONCE — a per-row division before
        # the sum reintroduces float accumulation-order dependence
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0
        ).alias("gross"),
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "gross", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


AGG_UNPIVOT_SQL = """
WITH wide AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS gross,
         CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM wide
UNION ALL
SELECT o_orderpriority, 'gross', gross FROM wide
UNION ALL
SELECT o_orderpriority, 'n_customers', n_customers FROM wide
"""


def histogram_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of document length with cumulative share — the
    distribution profile a corpus-curation pass starts from. One aggregation
    + one tiny window over the bucket list."""
    from pyspark.sql import Window

    docs = load(spark, "documents", sf_dir)
    binned = docs.groupBy(
        (F.floor(F.col("n_chars") / 100) * 100).cast("long").alias("bucket_lo")
    ).agg(F.count("*").alias("n"))
    w = Window.orderBy("bucket_lo").rowsBetween(Window.unboundedPreceding, 0)
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return binned.select(
        "bucket_lo",
        "n",
        F.round(
            F.sum("n").over(w) / F.sum("n").over(total), 6
        ).alias("cum_share"),
    )


HISTOGRAM_SQL = """
WITH binned AS (
  SELECT CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS bucket_lo, COUNT(*) AS n
  FROM documents GROUP BY 1
)
SELECT bucket_lo, n,
       ROUND(SUM(n) OVER (ORDER BY bucket_lo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / CAST(SUM(n) OVER () AS DOUBLE), 6) AS cum_share
FROM binned
"""


_HQ_BINS = 1000


def agg_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin quantile sketch: per-group p50/p90/p99 estimated
    from a shared 1000-bin histogram of l_extendedprice. The quantile
    companion to ``agg_hll_mergeable``: a group's sketch is its bin-count
    vector — partial-aggregatable map-side, mergeable across partitions /
    days / retries by vector addition, re-sliceable to any group rollup
    without re-touching raw data. Exact per-group percentiles
    (``agg_percentiles``) need the group's full value multiset; at 100 TB
    this histogram is the shape that survives.

    Two passes: global min/max (one tiny row, broadcast), then one
    hash-aggregation to (group, bin) counts; the quantile readout is a
    window over ≤1000 metadata rows per group. Estimates are deterministic
    bin LOWER EDGES — engine-exact (integer bin indices, identical double
    arithmetic), so this entry is oracle-checked, unlike sketches with
    engine-internal randomness. Error ≤ one bin width; accuracy vs the
    exact percentiles asserted in tests/test_extensions.py."""
    from pyspark.sql import Window

    li = load(spark, "lineitem", sf_dir).select(
        "l_returnflag", F.col("l_extendedprice").alias("x")
    )
    mm = li.agg(
        F.min("x").alias("mn"),
        # degenerate all-equal column: keep width positive
        F.greatest(F.max("x") - F.min("x"), F.lit(1e-9)).alias("span"),
    )
    binned = li.crossJoin(F.broadcast(mm)).select(
        "l_returnflag",
        "mn",
        (F.col("span") / _HQ_BINS).alias("width"),
        F.least(
            F.lit(_HQ_BINS - 1),
            F.floor((F.col("x") - F.col("mn")) / (F.col("span") / _HQ_BINS)).cast(
                "int"
            ),
        ).alias("bin"),
    )
    hist = binned.groupBy("l_returnflag", "bin").agg(
        F.count("*").alias("c"), F.min("mn").alias("mn"), F.min("width").alias("width")
    )
    cum = hist.withColumn(
        "cum", F.sum("c").over(Window.partitionBy("l_returnflag").orderBy("bin"))
    ).withColumn("n", F.sum("c").over(Window.partitionBy("l_returnflag")))
    qcols = [
        F.min(F.when(F.col("cum") >= F.lit(q) * F.col("n"), F.col("bin"))).alias(b)
        for q, b in ((0.5, "b50"), (0.9, "b90"), (0.99, "b99"))
    ]
    est = cum.groupBy("l_returnflag").agg(
        F.max("n").alias("n_rows"), F.min("mn").alias("mn"),
        F.min("width").alias("width"), *qcols
    )
    return est.select(
        "l_returnflag",
        "n_rows",
        *[
            F.round(F.col("mn") + F.col(b) * F.col("width"), 6).alias(f"p{p}_est")
            for b, p in (("b50", 50), ("b90", 90), ("b99", 99))
        ],
    )


AGG_HISTOGRAM_QUANTILES_SQL = """
WITH mm AS (
  SELECT MIN(l_extendedprice) AS mn,
         GREATEST(MAX(l_extendedprice) - MIN(l_extendedprice), 1e-9) AS span
  FROM lineitem
), binned AS (
  SELECT l_returnflag, mn, span / 1000 AS width,
         LEAST(999, CAST(FLOOR((l_extendedprice - mn) / (span / 1000)) AS INT)) AS bin
  FROM lineitem, mm
), hist AS (
  SELECT l_returnflag, bin, CAST(COUNT(*) AS BIGINT) AS c,
         MIN(mn) AS mn, MIN(width) AS width
  FROM binned GROUP BY 1, 2
), cum AS (
  SELECT *,
         CAST(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bin) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
  FROM hist
)
SELECT l_returnflag,
       MAX(n) AS n_rows,
       ROUND(MIN(mn) + MIN(CASE WHEN cum >= 0.5 * n THEN bin END) * MIN(width), 6) AS p50_est,
       ROUND(MIN(mn) + MIN(CASE WHEN cum >= 0.9 * n THEN bin END) * MIN(width), 6) AS p90_est,
       ROUND(MIN(mn) + MIN(CASE WHEN cum >= 0.99 * n THEN bin END) * MIN(width), 6) AS p99_est
FROM cum
GROUP BY 1
"""


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via roaring-style bitmaps — the
    precise sibling of ``agg_hll_mergeable``: per-(event_type, bucket)
    bitmaps are partial-aggregatable map-side and re-mergeable across
    partitions / days / retries with ``bitmap_or_agg``, like HLL sketches
    but with zero error. The ALL row is computed by bucket-wise OR of the
    per-type bitmaps — never re-touching raw data. Cost model: bitmap size
    is bounded per bucket (2^15 bits), so state scales with the id range,
    not the row count — at 100 TB this is THE exact-distinct pattern when
    ids are dense integers; HLL remains the fallback for sparse/string
    keys. Oracle-checked: results are exact COUNT(DISTINCT)."""
    ev = load(spark, "events", sf_dir).select(
        "event_type",
        F.bitmap_bucket_number("user_id").alias("bucket"),
        F.bitmap_bit_position("user_id").alias("pos"),
    )
    per_bucket = ev.groupBy("event_type", "bucket").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    typed = per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("exact_users")
    )
    merged = (
        per_bucket.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("exact_users"))
        .select(F.lit("ALL").alias("event_type"), "exact_users")
    )
    return typed.unionByName(merged)


AGG_BITMAP_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
"""


QUERIES = {
    "agg_global": agg_global,
    "agg_unpivot": agg_unpivot,
    "histogram_doc_length": histogram_doc_length,
    "agg_count_distinct": agg_count_distinct,
    "agg_stats": agg_stats,
    "agg_percentiles": agg_percentiles,
    "agg_collect": agg_collect,
    "agg_conditional": agg_conditional,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_pivot": agg_pivot,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_hll_mergeable": agg_hll_mergeable,
    "agg_bitmap_distinct": agg_bitmap_distinct,
    "agg_histogram_quantiles": agg_histogram_quantiles,
}

ORACLES = {
    "agg_bitmap_distinct": AGG_BITMAP_SQL,
    "agg_global": AGG_GLOBAL_SQL,
    "agg_unpivot": AGG_UNPIVOT_SQL,
    "histogram_doc_length": HISTOGRAM_SQL,
    "agg_count_distinct": AGG_COUNT_DISTINCT_SQL,
    "agg_stats": AGG_STATS_SQL,
    "agg_percentiles": AGG_PERCENTILES_SQL,
    "agg_collect": AGG_COLLECT_SQL,
    "agg_conditional": AGG_CONDITIONAL_SQL,
    "agg_rollup": AGG_ROLLUP_SQL,
    "agg_cube": AGG_CUBE_SQL,
    "agg_grouping_sets": AGG_GROUPING_SETS_SQL,
    "agg_pivot": AGG_PIVOT_SQL,
    "agg_histogram_quantiles": AGG_HISTOGRAM_QUANTILES_SQL,
    # agg_approx_distinct intentionally rows-only
}
