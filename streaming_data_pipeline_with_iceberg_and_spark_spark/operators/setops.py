"""Sorts, limits, distinct, set operations (SURVEY.md §2.6).

Global sorts appear only with a LIMIT on top, which Spark plans as
TakeOrderedAndProject (per-partition top-k + driver merge — no full
range-shuffle sort). An unbounded global orderBy is the one §2.6 operator
that cannot scale; the engine's convention is sort-with-limit or
sortWithinPartitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load


def _year_custkeys(spark, sf_dir: str, year: int) -> DataFrame:
    orders = load(spark, "orders", sf_dir)
    return orders.filter(F.year("o_orderdate") == year).select("o_custkey").distinct()


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (dedup): customers active in 1995 or 1996."""
    return (
        _year_custkeys(spark, sf_dir, 1995)
        .union(_year_custkeys(spark, sf_dir, 1996))
        .distinct()
        .select(F.col("o_custkey").alias("custkey"))
    )


SET_UNION_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
UNION
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1995 and 1996."""
    return (
        _year_custkeys(spark, sf_dir, 1995)
        .intersect(_year_custkeys(spark, sf_dir, 1996))
        .select(F.col("o_custkey").alias("custkey"))
    )


SET_INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers active in 1995 but not 1996."""
    return (
        _year_custkeys(spark, sf_dir, 1995)
        .exceptAll(_year_custkeys(spark, sf_dir, 1996))
        .select(F.col("o_custkey").alias("custkey"))
    )


SET_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName over heterogenous relations: one typed 'party' list."""
    cust = load(spark, "customer", sf_dir).select(
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    supp = load(spark, "supplier", sf_dir).select(
        F.lit("supplier").alias("kind"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.col("s_name").alias("name"),
    )
    return cust.unionByName(supp)


UNION_BY_NAME_SQL = """
SELECT c_name AS name, ROUND(c_acctbal, 2) AS acctbal, 'customer' AS kind FROM customer
UNION ALL
SELECT s_name, ROUND(s_acctbal, 2), 'supplier' FROM supplier
"""


def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection."""
    orders = load(spark, "orders", sf_dir)
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


DISTINCT_ROWS_SQL = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""


def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered limit (TakeOrderedAndProject): 50 priciest orders."""
    orders = load(spark, "orders", sf_dir)
    return (
        orders.orderBy(
            F.asc("o_orderstatus"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(50)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
        )
    )


SORT_LIMIT_SQL = """
SELECT o_orderstatus, o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders
ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
LIMIT 50
"""


def drop_duplicates_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a key subset with deterministic survivor (min
    event_id per (user_id, event_type) — the order-independent formulation;
    bare dropDuplicates keeps an arbitrary row, which can't be oracle-checked)."""
    ev = load(spark, "events", sf_dir)
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.count("*").alias("n_dups"),
    )


DROP_DUPLICATES_SQL = """
SELECT user_id, event_type,
       MIN(event_id) AS first_event_id,
       COUNT(*) AS n_dups
FROM events
GROUP BY user_id, event_type
"""


def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 sortWithinPartitions: repartition by key, order locally — the
    shuffle-once write-preparation pattern (no global sort exchange; contrast
    with orderBy, which adds a range-partition exchange). The oracle compare
    is order-insensitive, so content equality is what's checked."""
    li = load(spark, "lineitem", sf_dir)
    return (
        li.repartition("l_returnflag")
        .sortWithinPartitions("l_returnflag", "l_shipdate")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
    )


SORT_WITHIN_PARTITIONS_SQL = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate FROM lineitem
"""


QUERIES = {
    "sort_within_partitions": sort_within_partitions,
    "set_union": set_union,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "union_by_name": union_by_name,
    "distinct_rows": distinct_rows,
    "sort_limit_topk": sort_limit_topk,
    "drop_duplicates_subset": drop_duplicates_subset,
}

ORACLES = {
    "sort_within_partitions": SORT_WITHIN_PARTITIONS_SQL,
    "set_union": SET_UNION_SQL,
    "set_intersect": SET_INTERSECT_SQL,
    "set_except": SET_EXCEPT_SQL,
    "union_by_name": UNION_BY_NAME_SQL,
    "distinct_rows": DISTINCT_ROWS_SQL,
    "sort_limit_topk": SORT_LIMIT_SQL,
    "drop_duplicates_subset": DROP_DUPLICATES_SQL,
}
