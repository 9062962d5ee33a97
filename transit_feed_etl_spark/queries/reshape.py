"""Reshaping operators (SURVEY.md §2 Part B fill-ins): unpivot/melt,
grouped LISTAGG (ordered string aggregation), positional explode, and
outer explode — the wide<->long and nested<->flat conversions every
warehouse surface needs.

Determinism: every LISTAGG sorts before joining; explodes carry the
source ordinal so row identity survives the driver's order-insensitive
hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table
from transit_feed_etl_spark.operators import textfns as TX
from transit_feed_etl_spark.registry import register

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')"


@register(
    "unpivot_lineitem_measures",
    oracle="""
    WITH long AS (
      SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
    )
    SELECT l_returnflag, metric, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS total
    FROM long GROUP BY l_returnflag, metric
    ORDER BY l_returnflag, metric
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide->long melt) of three lineitem measures, then a
    grouped rollup per (flag, metric). Spark's `unpivot` compiles to a
    single Expand node — ONE scan of the fact table fans out 3 rows per
    input row map-side, exactly like the UNION-ALL formulation but
    without re-scanning; the aggregate then shuffles on the (flag,
    metric) key with partial aggregation."""
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "value",
    )
    return (
        long.groupBy("l_returnflag", "metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("total"),
        )
        .orderBy("l_returnflag", "metric")
    )


@register(
    "listagg_suppliers_by_nation",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n_suppliers,
           string_agg(s_name, ',' ORDER BY s_name) AS supplier_csv
    FROM supplier
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def listagg_suppliers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped LISTAGG: per-nation CSV of supplier names, sorted so the
    result is order-deterministic (collect_list alone inherits partition
    order — never hash-stable). At scale the collected list is bounded by
    group cardinality; for unbounded groups, cap with slice() after
    array_sort."""
    s = table(spark, sf_dir, "supplier")
    return (
        s.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "supplier_csv"
            ),
        )
        .orderBy("s_nationkey")
    )


@register(
    "posexplode_tokens",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents WHERE doc_id < 20
    )
    SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, toks[u.i] AS tok
    FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, LEN(toks) + 1)) AS i) u
    ORDER BY doc_id, pos
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: (doc_id, ordinal, token) — the token-sequence
    long form that windowed n-gram/position features build on. Pure
    Generate node, no shuffle before the deterministic orderBy."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select("doc_id", F.posexplode(TX.tokens("text")).alias("pos", "tok"))
        .orderBy("doc_id", "pos")
    )


@register(
    "explode_outer_rare_tokens",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter({_TOKS_SQL}, x -> x LIKE 'z%') AS rare
      FROM documents WHERE doc_id < 50
    ),
    padded AS (
      SELECT doc_id,
             CASE WHEN LEN(rare) = 0 THEN [NULL] ELSE rare END AS rare
      FROM t
    )
    SELECT doc_id, unnest(rare) AS tok
    FROM padded
    ORDER BY doc_id, tok NULLS FIRST
    """,
)
def explode_outer_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: documents keep a NULL row when their filtered
    token array is empty (plain explode silently drops them — the
    left-join-vs-inner-join distinction for nested data). The oracle
    emulates outer semantics by padding empty lists with [NULL]."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    rare = F.filter(TX.tokens("text"), lambda x: x.startswith("z"))
    return (
        d.select("doc_id", F.explode_outer(rare).alias("tok"))
        .orderBy("doc_id", F.col("tok").asc_nulls_first())
    )
