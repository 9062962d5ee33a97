"""Set operations (SURVEY.md §2 Part B: union present as A7; intersect /
except absent in reference)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table
from transit_feed_etl_spark.registry import register


@register(
    "intersect_buyers_sellers_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def intersect_buyers_sellers_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations with both customers and
    suppliers. Compiles to an aggregate + semi-join shape."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@register(
    "except_nations_without_suppliers",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def except_nations_without_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers —
    the set-op twin of the A20 anti-join existence check."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")  # subtract == EXCEPT DISTINCT


@register(
    "union_distinct_keys",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    ORDER BY nationkey
    """,
)
def union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — dedup across both inputs in one hash agg."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.union(s)
        .distinct()
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )


@register(
    "except_all_open_order_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY o_custkey
    """,
)
def except_all_open_order_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset semantics — multiplicity preserved, unlike
    the distinct-making EXCEPT): customers' open-order slots minus their
    urgent-order slots. Catalyst plans this as a count-tagged aggregate
    + generate, one shuffle; no distinct collapse."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.exceptAll(b).orderBy("o_custkey")


@register(
    "intersect_all_buyer_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey
    """,
)
def intersect_all_buyer_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: per-customer min(multiplicity) of open vs finished
    orders — the multiset intersection."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b).orderBy("o_custkey")
