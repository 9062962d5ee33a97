"""Subquery surface: EXISTS / NOT EXISTS / IN / scalar / correlated-scalar.

Absent from the reference (SURVEY.md §2 Part B — its only subquery-like
shape is the manual catalog↔filesystem anti-join, gtfs_rt_assets.py:225-226).
Implemented as Spark SQL so Catalyst's subquery decorrelation does the
rewrite: correlated EXISTS/IN become left-semi joins, NOT EXISTS becomes a
left-anti join, and the correlated scalar aggregate becomes an aggregate +
equi-join — exactly the physical plans we'd hand-write, chosen by the
optimizer instead (tests/test_plans.py asserts the join strategies).

Scale notes: every decorrelated subquery below joins on a key column, so
at 100 TB the planner picks broadcast (dim-sized inner) or shuffled hash
join with AQE sizing — no per-row re-execution of the subquery, which is
the naive interpretation a row-engine would use.

Determinism: AVG is spelled as exact-decimal SUM cast to double divided by
COUNT on BOTH engines (one double division; no summation-order drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import register_views, table
from transit_feed_etl_spark.registry import register

# Exact-decimal average: the one double division both engines perform.
_AVG = "CAST(SUM(CAST({x} AS DECIMAL(18,3))) AS DOUBLE) / COUNT({x})"


@register(
    "exists_high_value_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    )
    """,
)
def exists_high_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: customers with at least one order above 300k.
    Catalyst decorrelates to a left-semi hash join on o_custkey — the
    subquery runs once as a relation, never per outer row."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
        )
        """
    )


@register(
    "not_exists_urgent_order_customers",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def not_exists_urgent_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS: customers with no urgent order — the SQL
    spelling of the reference's catalog-vs-filesystem existence check
    (gtfs_rt_assets.py:225-226). Decorrelates to a left-anti join; the
    priority filter is pushed below the join into the orders scan."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        """
    )


@register(
    "in_subquery_supplier_nations",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_nationkey IN (
      SELECT c.c_nationkey FROM customer c WHERE c.c_acctbal < 0.0
    )
    """,
)
def in_subquery_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery: suppliers located in any nation that has
    an overdrawn customer. Planned as a semi join against the distinct
    nationkey set (25 keys → broadcast)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE s.s_nationkey IN (
          SELECT c.c_nationkey FROM customer c WHERE c.c_acctbal < 0.0
        )
        """
    )


@register(
    "scalar_subquery_above_avg_price",
    oracle=f"""
    SELECT p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice > (SELECT {_AVG.format(x='p2.p_retailprice')} FROM part p2)
    """,
)
def scalar_subquery_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: parts priced above the global mean.
    The scalar aggregate runs once and is folded into the scan filter
    (one-row broadcast), not recomputed per row."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT p.p_partkey, p.p_retailprice
        FROM part p
        WHERE p.p_retailprice > (SELECT {_AVG.format(x='p2.p_retailprice')} FROM part p2)
        """
    )


@register(
    "correlated_scalar_small_qty_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,3))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem l
    WHERE l.l_quantity < 0.5 * (
      SELECT {_AVG.format(x='l2.l_quantity')}
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    """,
)
def correlated_scalar_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of small-quantity lineitems, threshold a
    correlated per-part average. Catalyst decorrelates the scalar subquery
    into groupBy(l_partkey).avg + an equi-join back to lineitem — one
    aggregate pass + one shuffle join, not a per-row subquery. At 100 TB
    the per-part aggregate is tiny relative to lineitem and AQE picks a
    broadcast for the join-back."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,3))) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM lineitem l
        WHERE l.l_quantity < 0.5 * (
          SELECT {_AVG.format(x='l2.l_quantity')}
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
        )
        """
    )


@register(
    "tuple_in_subquery",
    oracle="""
    SELECT l.l_orderkey, l.l_suppkey, l.l_quantity
    FROM lineitem l
    JOIN (SELECT l_orderkey, MIN(l_linenumber) AS l_linenumber
          FROM lineitem GROUP BY l_orderkey) f
      ON f.l_orderkey = l.l_orderkey AND f.l_linenumber = l.l_linenumber
    WHERE l.l_orderkey < 2000
    ORDER BY l.l_orderkey, l.l_suppkey
    """,
)
def tuple_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column (tuple) IN subquery — first line of every order via
    (orderkey, linenumber) membership. Catalyst rewrites the tuple IN
    to a LEFT SEMI hash join on the composite key; the subquery side
    pre-aggregates to one row per order before the join, so the semi
    probe is |orders|, not |lineitem|. (DuckDB lacks the tuple-IN
    syntax, so the oracle spells the equivalent unique-key join.)"""
    li = table(spark, sf_dir, "lineitem")
    firsts = li.groupBy("l_orderkey").agg(F.min("l_linenumber").alias("l_linenumber"))
    return (
        li.join(firsts, ["l_orderkey", "l_linenumber"], "left_semi")
        .filter(F.col("l_orderkey") < 2000)
        .select("l_orderkey", "l_suppkey", "l_quantity")
        .orderBy("l_orderkey", "l_suppkey")
    )
