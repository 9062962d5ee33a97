"""Join surface (SURVEY.md §2 Part B join rows; A20 anti-join shape).

The reference's only join-like operation is the catalog-vs-filesystem
existence check (A20, reference gtfs_rt_assets.py:225-226) — a manual
anti-join. Here: the full equi / outer / semi / anti / theta surface on
the TPC-H-ish testdata.

Scale posture: dimension tables (region 5, nation 25, supplier, part)
are explicitly broadcast — at 100 TB the fact-side (lineitem/orders)
never shuffles for a dim join. Fact-fact joins (orders ⨝ lineitem)
shuffle on the join key; AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table
from transit_feed_etl_spark.registry import register


@register(
    "join_revenue_by_nation",
    oracle="""
    SELECT
      n.n_name,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        AS revenue,
      COUNT(*) AS n_items
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi join (fact-fact shuffle on orderkey; dims broadcast)
    + grouped decimal-exact revenue. TPC-H Q5 shape."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem")
    # multiply in double, cast the product once — see q1_pricing_summary
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


@register(
    "left_join_order_counts",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,3))), 0) AS DOUBLE) AS spend
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero urgent orders;
    COUNT(col) ignores the NULLs the outer join introduces."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,3)")), F.lit(0))
            .cast("double")
            .alias("spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "semi_join_active_customers",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT'
        AND o.o_totalprice > 50000
    )
    ORDER BY c.c_custkey
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with >=1 big urgent order.
    Semi join never duplicates the left side — no post-dedup needed."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 50000)
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "anti_join_inactive_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    ORDER BY c.c_custkey
    """,
)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the A20 catalog-vs-filesystem
    consistency check shape (reference gtfs_rt_assets.py:225-226):
    rows on the left with no witness on the right."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "theta_join_acctbal",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(s.s_acctbal - c.c_acctbal AS DECIMAL(18,3))) AS DOUBLE) AS bal_gap
    FROM supplier s
    JOIN customer c ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def theta_join_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + theta join (non-equi residual predicate): suppliers paired
    with same-nation customers of strictly lower balance. The equi part
    keys the shuffle; the inequality is a residual filter — never a
    cartesian product."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    gap = (F.col("s_acctbal") - F.col("c_acctbal")).cast("decimal(18,3)")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum(gap).cast("double").alias("bal_gap"))
        .orderBy("n_name")
    )


@register(
    "full_outer_join_daily",
    oracle="""
    WITH o AS (
      SELECT DATE_TRUNC('day', o_orderdate) AS d, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    l AS (
      SELECT DATE_TRUNC('day', l_shipdate) AS d, COUNT(*) AS n_ships
      FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(o.d, l.d) AS d,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(l.n_ships, 0) AS n_ships
    FROM o FULL OUTER JOIN l ON o.d = l.d
    ORDER BY d
    """,
)
def full_outer_join_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated daily series (order days vs
    ship days), NULL-filled with 0. Pre-aggregating before the join keeps
    the shuffled volume at #distinct-days, not #rows — the 100 TB habit."""
    # date_trunc keeps TimestampType on both sides (DuckDB DATE and Spark
    # DateType stringify differently through pandas — avoid DATE at the
    # comparison boundary).
    o = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    l = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("day", F.col("l_shipdate")).alias("d"))
        .agg(F.count(F.lit(1)).alias("n_ships"))
    )
    return (
        o.join(l, o.d == l.d, "full_outer")
        .select(
            F.coalesce(o.d, l.d).alias("d"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("n_ships"), F.lit(0)).alias("n_ships"),
        )
        .orderBy("d")
    )


@register(
    "range_join_shipments_in_window",
    oracle="""
    SELECT o.o_orderkey, COUNT(*) AS n_shipped
    FROM (SELECT o_orderkey, o_orderdate, o_orderdate + INTERVAL 7 DAY AS o_end
          FROM orders WHERE o_totalprice > 450000.0) o
    JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate AND l.l_shipdate <= o.o_end
    GROUP BY o.o_orderkey
    """,
)
def range_join_shipments_in_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range (interval) join — no equi key: market-wide shipments
    falling inside each high-value order's first week. Implemented with
    the binned construction (operators/rangejoin.py): explode intervals
    to week-wide bins, equi-join points on bin id, exact range filter —
    a hash join instead of the O(|L| x |R|) nested loop Spark would
    otherwise plan (asserted in tests/test_plans.py)."""
    from transit_feed_etl_spark.operators.rangejoin import range_join_binned

    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000.0)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.expr("o_orderdate + INTERVAL 7 DAYS").alias("o_end"),
        )
    )
    li = table(spark, sf_dir, "lineitem").select("l_shipdate")
    joined = range_join_binned(
        li, orders, point_ts="l_shipdate", start_ts="o_orderdate",
        end_ts="o_end", bin_width_s=7 * 86400,
    )
    return joined.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_shipped"))


@register(
    "cross_join_region_pairs",
    oracle="""
    SELECT a.r_name AS name_a, b.r_name AS name_b
    FROM region a CROSS JOIN region b
    WHERE a.r_name < b.r_name
    """,
)
def cross_join_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian/nested-loop join (Part B "theta / nested-loop"
    row): unordered region pairs. A pure non-equi condition has no hash
    key, so Spark plans BroadcastNestedLoopJoin — acceptable ONLY when
    one side is dimension-tiny (5 rows here); every at-scale non-equi
    join in this repo routes through the binned range join or a
    theta-join with an equi component instead."""
    r = table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("name_a"))
    b = r.select(F.col("r_name").alias("name_b"))
    return a.crossJoin(b).filter(F.col("name_a") < F.col("name_b"))


@register(
    "merge_upsert_user_profiles",
    oracle="""
    WITH base AS (
      SELECT user_id, event_type AS state, ts AS last_ts FROM (
        SELECT user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
      ) WHERE rn = 1
    ),
    updates AS (
      SELECT user_id, event_type AS state, ts AS last_ts FROM (
        SELECT user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
      ) WHERE rn = 1
    )
    SELECT user_id, state, last_ts, 'update' AS src FROM updates
    UNION ALL
    SELECT b.user_id, b.state, b.last_ts, 'base' AS src
    FROM base b WHERE NOT EXISTS (
      SELECT 1 FROM updates u WHERE u.user_id = b.user_id)
    ORDER BY user_id
    """,
)
def merge_upsert_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert (SCD1) expressed Spark-first on immutable parquet:
    updates-side rows WIN per key, untouched base rows survive via a
    LEFT ANTI join, and the union is the rewritten snapshot — the
    standard copy-on-write merge a lakehouse table format performs under
    `MERGE INTO`. Both 'latest per key' picks are ranking windows
    (WindowGroupLimit, one exchange each on user_id); the anti join
    reuses the same key so AQE coalesces its shuffle."""
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id", F.col("event_type").alias("state"), F.col("ts").alias("last_ts")
            )
        )

    base = latest(ev.filter(F.col("ts") < cutoff))
    updates = latest(ev.filter(F.col("ts") >= cutoff))
    kept = base.join(updates.select("user_id"), "user_id", "left_anti")
    return (
        updates.withColumn("src", F.lit("update"))
        .unionByName(kept.withColumn("src", F.lit("base")))
        .orderBy("user_id")
    )


@register(
    "nullsafe_join_lang_buckets",
    oracle="""
    WITH a AS (
      SELECT doc_id, NULLIF(lang, 'en') AS lang_key FROM documents
      WHERE doc_id < 100
    ),
    b AS (
      SELECT NULLIF(lang, 'en') AS lang_key, COUNT(*) AS n_docs
      FROM documents GROUP BY 1
    )
    SELECT a.doc_id, COALESCE(a.lang_key, '<null>') AS lang_key, b.n_docs
    FROM a JOIN b ON a.lang_key IS NOT DISTINCT FROM b.lang_key
    ORDER BY a.doc_id
    """,
)
def nullsafe_join_lang_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantics
    difference that loses rows in naive dimension joins. NULLIF
    manufactures NULL keys deterministically from the corpus; the
    null-safe condition still compiles to a hash-join (null-safe
    equality is hashable — no nested loop)."""
    d = table(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") < 100).select(
        "doc_id", F.nullif("lang", F.lit("en")).alias("lang_key")
    )
    b = (
        d.select(F.nullif("lang", F.lit("en")).alias("lang_key"))
        .groupBy("lang_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        a.join(b, a["lang_key"].eqNullSafe(b["lang_key"]))
        .select(
            "doc_id",
            F.coalesce(a["lang_key"], F.lit("<null>")).alias("lang_key"),
            "n_docs",
        )
        .orderBy("doc_id")
    )
