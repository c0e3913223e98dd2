"""Join operators (SURVEY.md §2.3, J1-J7).

The reference is a single-relation pipeline (no joins); these generalize over
the star schema. Join-strategy notes per query are in docstrings — the point
at 100 TB is *which side shuffles*:

- Fixed-cardinality dims (region/nation) → explicit broadcast, zero shuffle.
- Fact⋈fact → sort-merge on the join key; AQE splits skewed partitions.
- Non-equi band join → broadcast the tiny band table so the theta join is a
  BroadcastNestedLoopJoin over a handful of rows, never fact×fact NLJ.
- As-of join → union + last-non-null window (one shuffle on user key), NOT a
  range self-join; this is the scalable formulation for "latest reading ≤ t".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load


def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join chain with broadcast dims (customer⋈nation⋈region)."""
    cust = load(spark, "customer", sf_dir)
    nation = F.broadcast(load(spark, "nation", sf_dir))
    region = F.broadcast(load(spark, "region", sf_dir))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


JOIN_BROADCAST_SQL = """
SELECT r_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer — every customer, with zero-order customers retained."""
    cust = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("cnt", F.lit(0)).alias("n_orders"),
            F.coalesce("spend", F.lit(0.0)).alias("total_spend"),
        )
    )


JOIN_LEFT_OUTER_SQL = """
SELECT c_custkey, c_name,
       COALESCE(cnt, 0) AS n_orders,
       COALESCE(spend, 0.0) AS total_spend
FROM customer
LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey
) ON c_custkey = o_custkey
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: full outer — nations seen from customer vs supplier side."""
    cust = (
        load(spark, "customer", sf_dir)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        load(spark, "supplier", sf_dir)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


JOIN_FULL_OUTER_SQL = """
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
ON c_nationkey = s_nationkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left semi — customers that have at least one 'F' order."""
    cust = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


JOIN_SEMI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_mktsegment
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left anti — customers with no orders at all."""
    cust = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: cross join of two tiny relations (region × distinct orderstatus)."""
    region = load(spark, "region", sf_dir)
    status = load(spark, "orders", sf_dir).select("o_orderstatus").distinct()
    return region.crossJoin(status).select("r_name", "o_orderstatus")


JOIN_CROSS_SQL = """
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
"""


def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/J6: non-equi band join — orders matched to a tiny literal band table
    on a BETWEEN predicate. The band side is broadcast, so the theta join is a
    BroadcastNestedLoopJoin over 4 rows — never a shuffle NLJ."""
    orders = load(spark, "orders", sf_dir)
    bands = F.broadcast(
        spark.createDataFrame(
            [
                ("small", 0.0, 50000.0),
                ("medium", 50000.0, 200000.0),
                ("large", 200000.0, 400000.0),
                ("jumbo", 400000.0, 1e18),
            ],
            "band string, lo double, hi double",
        )
    )
    return (
        orders.join(
            bands,
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


JOIN_THETA_BAND_SQL = """
SELECT band, COUNT(*) AS n_orders,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders
JOIN (VALUES ('small', 0.0, 50000.0),
             ('medium', 50000.0, 200000.0),
             ('large', 200000.0, 400000.0),
             ('jumbo', 400000.0, 1e18)) AS bands(band, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
"""


def join_range_shipdelay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: range predicate on top of an equi-join — lineitems shipped within
    60 days of their order date. Equi key carries the shuffle; the range is a
    post-join filter (no NLJ)."""
    orders = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (
                F.col("l_shipdate")
                < F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            )
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_fast_ship"),
            F.round(F.avg(
                F.col("l_shipdate").cast("long") / 86400.0
                - F.col("o_orderdate").cast("long") / 86400.0
            ), 6).alias("avg_delay_days"),
        )
    )


JOIN_RANGE_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_fast_ship,
       ROUND(AVG(epoch(l_shipdate) / 86400.0 - epoch(o_orderdate) / 86400.0), 6) AS avg_delay_days
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate < o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority
"""


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: as-of join — for each 'purchase' event, the latest 'signup' event
    of the same user at-or-before the purchase time.

    Spark has no native ASOF JOIN. The scalable composition (vs a range
    self-join that explodes): union both sides tagged, one window pass per
    user ordered by (ts, side) carrying ``last(signup_ts, ignorenulls)``.
    One shuffle on user_id, O(n log n) per partition, no pair blowup —
    this survives 100 TB where a non-equi self-join cannot.

    Oracle uses DuckDB's native ASOF LEFT JOIN.
    """
    ev = load(spark, "events", sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("side")
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("side"),
    )
    # side=0 (signup) sorts before side=1 (purchase) at equal ts → inclusive ≤
    unioned = left.unionByName(right).withColumn(
        "signup_ts", F.when(F.col("side") == 0, F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn("asof_signup_ts", F.last("signup_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "asof_signup_ts",
            F.when(
                F.col("asof_signup_ts").isNotNull(),
                F.col("ts").cast("long") - F.col("asof_signup_ts").cast("long"),
            ).alias("secs_since_signup"),
        )
    )


JOIN_ASOF_SQL = """
SELECT a.event_id, a.user_id, a.ts,
       b.ts AS asof_signup_ts,
       CAST(floor(epoch(a.ts)) AS BIGINT) - CAST(floor(epoch(b.ts)) AS BIGINT) AS secs_since_signup
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
"""


_SALT_N = 8


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 under skew: hand-salted join. The derived key sends ~90% of fact
    rows to ONE hot key — the straggler shape that kills naive shuffles at
    100 TB. Salting composes the fix from plain operators: the fact side gets
    a deterministic salt in [0, N), the dim side is replicated across all N
    salts (explode), and the join key becomes (key, salt), spreading the hot
    key over N reducers. Semantically identical to the unsalted join — the
    DuckDB oracle runs the plain join. The merge hint forces the sort-merge
    path (a broadcast would hide the shuffle being demonstrated); AQE's
    skew-join split does this at runtime for SMJ, salting also covers the
    cases AQE can't see (e.g. skewed groupBy before any join).
    """
    li = load(spark, "lineitem", sf_dir)
    fact = li.select(
        F.when(F.col("l_orderkey") % 100 < 90, F.lit(0).cast("long"))
        .otherwise(F.col("l_orderkey") % 100)
        .alias("hot_key"),
        "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT_N)).alias(
            "salt"
        ),
    )
    dim = (
        spark.range(0, 100)
        .select(
            F.col("id").alias("hot_key"),
            (F.col("id") % 7 + 1).alias("rate"),
        )
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT_N)])))
        .withColumn("salt", F.col("salt").cast("long"))
    )
    joined = fact.join(dim.hint("merge"), ["hot_key", "salt"])
    # decimal accumulation: exact regardless of partitioning/order. The final
    # value is emitted as a rounded double, not decimal(24,2) — Spark Decimal
    # and DuckDB DECIMAL stringify differently in the driver's hasher
    # (round-1 hash_match=false despite identical values).
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    return joined.groupBy("hot_key").agg(
        F.count("*").alias("n_rows"),
        F.round(
            F.sum(price_dec * F.col("rate")).cast("double"), 2
        ).alias("weighted_price"),
    )


JOIN_SALTED_SKEW_SQL = """
SELECT hot_key, COUNT(*) AS n_rows,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * rate) AS DOUBLE), 2)
           AS weighted_price
FROM (SELECT CASE WHEN l_orderkey % 100 < 90 THEN 0
                  ELSE l_orderkey % 100 END AS hot_key,
             l_extendedprice
      FROM lineitem) f
JOIN (SELECT range AS hot_key, range % 7 + 1 AS rate FROM range(0, 100)) d
USING (hot_key)
GROUP BY hot_key
"""


QUERIES = {
    "join_broadcast_dims": join_broadcast_dims,
    "join_left_outer": join_left_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_cross": join_cross,
    "join_theta_band": join_theta_band,
    "join_range_shipdelay": join_range_shipdelay,
    "join_asof": join_asof,
    "join_salted_skew": join_salted_skew,
}

ORACLES = {
    "join_broadcast_dims": JOIN_BROADCAST_SQL,
    "join_left_outer": JOIN_LEFT_OUTER_SQL,
    "join_full_outer": JOIN_FULL_OUTER_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "join_cross": JOIN_CROSS_SQL,
    "join_theta_band": JOIN_THETA_BAND_SQL,
    "join_range_shipdelay": JOIN_RANGE_SQL,
    "join_asof": JOIN_ASOF_SQL,
    "join_salted_skew": JOIN_SALTED_SKEW_SQL,
}
