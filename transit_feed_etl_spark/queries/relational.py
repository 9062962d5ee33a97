"""Relational core — the reference's genuinely relational surface
(SURVEY.md §2 Part A: A4-A7, A14-A19) re-expressed on the driver testdata.

Reference citations (into /root/reference):
  A4  existence filter            gtfs_rt_assets.py:33
  A5  null-guarded projection     gtfs_rt_assets.py:38-46
  A6  constant enrichment         gtfs_rt_assets.py:36-37,79
  A7  union of per-feed batches   gtfs_rt_assets.py:83-89
  A14 bbox aggregation            gtfs_rt_assets.py:161-170
  A15 row count                   gtfs_rt_assets.py:182,194
  A17 grand-total + coalesce 0    gtfs_rt_assets.py:188-190
  A18 1-hour-lookback aggregate   gtfs_rt_assets.py:210-214
  A19 top-1 by timestamp desc     gtfs_rt_assets.py:217-222

``events`` is the vehicle-positions stand-in (FIXTURES.md F5); ``lineitem``
exercises the same aggregate shapes at 60k-600k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table, table_par
from transit_feed_etl_spark.registry import register

# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (filter + grouped multi-agg +
# sort). Exercises A15/A17 aggregate shapes at the largest table.
# Scale note: single shuffle on (l_returnflag, l_linestatus) — 6 groups —
# with map-side partial aggregation; the scan reads only 7 of 11 columns
# (column pruning) and pushes the l_shipdate filter into parquet.
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,3))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))
               ) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,3))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,3))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped pricing summary over lineitem (TPC-H Q1 shape).
    table_par: the 7-way decimal partial aggregation is the heavy map
    work; parallelizing the single-row-group scan halves cold wall time
    (decimal sums are order-independent, so results are unaffected)."""
    li = table_par(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,3)")
    price = F.col("l_extendedprice").cast("decimal(18,3)")
    disc = F.col("l_discount").cast("decimal(18,3)")
    # Derived measures multiply in DOUBLE (per-row IEEE arithmetic is
    # deterministic and engine-identical) and cast the PRODUCT to decimal
    # once; only the SUM needs decimal for order-independence. A decimal
    # multiply per row runs on the BigDecimal slow path — one cast on the
    # product is ~25% cheaper across the aggregation (oracle SQL uses the
    # identical formulation, so per-row values match bit-for-bit).
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# A4 — existence filter (reference keeps only entities with a `vehicle`
# field; here: events that carry a props payload and a positive value).
# --------------------------------------------------------------------------


@register(
    "existence_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE props IS NOT NULL AND value IS NOT NULL AND value > 5.0
    """,
)
def existence_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence filter (A4, gtfs_rt_assets.py:33): keep rows whose
    optional payload is present. Pushed down to the parquet scan."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(
        F.col("props").isNotNull() & F.col("value").isNotNull() & (F.col("value") > 5.0)
    ).select("event_id", "user_id", "event_type", "value")


# --------------------------------------------------------------------------
# A5 — null-guarded projection (emit value or NULL when guard fails).
# --------------------------------------------------------------------------


@register(
    "null_guarded_projection",
    oracle="""
    SELECT
      event_id,
      CASE WHEN event_type = 'purchase' THEN value ELSE NULL END AS purchase_value,
      CASE WHEN value IS NOT NULL AND value >= 0 THEN value ELSE NULL END AS safe_value,
      COALESCE(user_id, -1) AS user_id_filled
    FROM events
    """,
)
def null_guarded_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-guarded projection (A5, gtfs_rt_assets.py:38-46): per-field
    `x if present else NULL` via when/otherwise — vectorized, codegen'd."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .otherwise(F.lit(None))
        .alias("purchase_value"),
        F.when(F.col("value").isNotNull() & (F.col("value") >= 0), F.col("value"))
        .otherwise(F.lit(None))
        .alias("safe_value"),
        F.coalesce(F.col("user_id"), F.lit(-1)).alias("user_id_filled"),
    )


# --------------------------------------------------------------------------
# A6 + A7 — constant enrichment and union of per-feed batches.
# Two disjoint slices are stamped with a batch label and unioned, like the
# reference's per-feed record lists extended into one batch.
# --------------------------------------------------------------------------


@register(
    "union_enriched_batches",
    oracle="""
    SELECT batch_label, event_type, COUNT(*) AS n
    FROM (
      SELECT 'batch_clicks' AS batch_label, event_type FROM events
      WHERE event_type IN ('click', 'view')
      UNION ALL
      SELECT 'batch_commerce' AS batch_label, event_type FROM events
      WHERE event_type IN ('purchase', 'signup')
    )
    GROUP BY batch_label, event_type
    ORDER BY batch_label, event_type
    """,
)
def union_enriched_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant enrichment (A6, gtfs_rt_assets.py:36-37) + union of
    per-feed batches (A7, gtfs_rt_assets.py:83-89) via unionByName."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.lit("batch_clicks").alias("batch_label"), "event_type"
    )
    commerce = ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        F.lit("batch_commerce").alias("batch_label"), "event_type"
    )
    return (
        clicks.unionByName(commerce)
        .groupBy("batch_label", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("batch_label", "event_type")
    )


# --------------------------------------------------------------------------
# A14 + A15 — bbox-style grouped min/max aggregate + row count.
# The reference computes gdf.total_bounds per batch; here per event_type.
# --------------------------------------------------------------------------


@register(
    "bbox_aggregate",
    oracle="""
    SELECT
      event_type,
      MIN(value) AS bbox_min,
      MAX(value) AS bbox_max,
      MIN(ts) AS first_ts,
      MAX(ts) AS last_ts,
      COUNT(*) AS record_count
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def bbox_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box aggregation (A14, gtfs_rt_assets.py:161-170) + row
    count (A15): grouped MIN/MAX — partial-agg map-side, 5 groups."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.min("value").alias("bbox_min"),
            F.max("value").alias("bbox_max"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("record_count"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# A17 — grand total with NULL -> 0 coalesce (reference: `or 0` on a SUM
# that returns NULL for an empty selection).
# --------------------------------------------------------------------------


@register(
    "grand_total_coalesce",
    oracle="""
    SELECT
      CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6))), 0) AS DOUBLE) AS total_value,
      COUNT(*) AS total_rows
    FROM events
    WHERE event_type = 'does_not_exist'
    """,
)
def grand_total_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand-total aggregate with NULL->0 fallback (A17,
    gtfs_rt_assets.py:188-190): empty selection sums to 0, not NULL."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "does_not_exist").agg(
        F.coalesce(F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0))
        .cast("double")
        .alias("total_value"),
        F.count(F.lit(1)).alias("total_rows"),
    )


@register(
    "grand_total",
    oracle="""
    SELECT
      CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6))), 0) AS DOUBLE) AS total_value,
      COUNT(*) AS total_rows
    FROM events
    """,
)
def grand_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand-total aggregate over the full table (A17 happy path)."""
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.coalesce(F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0))
        .cast("double")
        .alias("total_value"),
        F.count(F.lit(1)).alias("total_rows"),
    )


# --------------------------------------------------------------------------
# A18 — sliding 1-hour-lookback aggregate. The reference compares against
# datetime('now','-1 hour'); for determinism we anchor on MAX(ts), which is
# also the honest streaming semantics (event-time, not wall-clock).
# --------------------------------------------------------------------------


@register(
    "time_range_aggregate",
    oracle="""
    SELECT
      COUNT(*) AS n_recent,
      CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6))), 0) AS DOUBLE) AS sum_recent
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
    """,
)
def time_range_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour freshness aggregate (A18, gtfs_rt_assets.py:210-214)
    with real TimestampType interval arithmetic (fixes the reference's
    string-compare quirk). The MAX(ts) scalar is broadcast-joined —
    no second full-shuffle."""
    ev = table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 1 HOUR"))
        .agg(
            F.count(F.lit(1)).alias("n_recent"),
            F.coalesce(F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0))
            .cast("double")
            .alias("sum_recent"),
        )
    )


# --------------------------------------------------------------------------
# A19 — top-1 by timestamp (latest record), with a total tie-break order.
# --------------------------------------------------------------------------


@register(
    "top1_latest",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 1
    """,
)
def top1_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record (A19, gtfs_rt_assets.py:217-222): ORDER BY ts DESC
    LIMIT 1 -> Spark compiles to TakeOrderedAndProject (no full sort)."""
    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", "ts", "user_id", "event_type", "value").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    ).limit(1)


# --------------------------------------------------------------------------
# General top-k (SURVEY §2 Part B "sorts / top-k").
# --------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by value: TakeOrderedAndProject keeps only k rows per
    partition then merges — no global sort even at 100 TB."""
    od = table(spark, sf_dir, "orders")
    return (
        od.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (select-project-join-aggregate-top-k): unshipped
    high-revenue orders for one market segment. Scale plan: the segment
    filter prunes customer BEFORE its broadcast; orders/lineitem date
    filters push into the scans; top-10 runs as TakeOrderedAndProject
    (no global sort materialization). l_orderkey is the total
    tie-breaker so LIMIT is deterministic."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join measuring revenue where customer
    and supplier share a nation, one region. Scale plan: region/nation/
    supplier/customer all broadcast (dims); lineitem-orders is the one
    shuffled fact-fact join; the c_nationkey = s_nationkey co-location
    predicate rides the supplier join, never a second shuffle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_CTE_RANK_SQL = """
WITH rev AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
  FROM {orders} JOIN {customer} ON o_custkey = c_custkey
  GROUP BY c_nationkey
)
SELECT n.n_name, r.revenue, r.n_orders,
       RANK() OVER (ORDER BY r.revenue DESC) AS rnk
FROM rev r JOIN {nation} n ON n.n_nationkey = r.c_nationkey
ORDER BY rnk, n_name
"""


@register(
    "sql_cte_nation_revenue_rank",
    oracle=_CTE_RANK_SQL.format(orders="orders", customer="customer", nation="nation"),
)
def sql_cte_nation_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `spark.sql(...)` entry path (SURVEY §3: DataFrame and SQL
    front-ends hit the same Catalyst plan): temp views + a CTE + a join
    + a global RANK window, executed as ONE SQL string. The oracle is
    the IDENTICAL text modulo view names — the strongest possible
    dialect-parity statement. Decimal revenue sums keep the rank input
    bit-identical across engines."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    table(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        _CTE_RANK_SQL.format(orders="v_orders", customer="v_customer", nation="v_nation")
    )


@register(
    "q18_large_order_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,3))) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): a HAVING-filtered aggregate
    feeds an IN-subquery semi-join against the fact, then re-aggregates
    with customer context. Catalyst turns the IN into a left-semi hash
    join on the pre-aggregated (small) key set — the fact table is
    scanned twice but shuffled on the same l_orderkey both times, and the
    HAVING side's partial agg collapses before it ever joins."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    dq = F.col("l_quantity").cast("decimal(18,3)")
    big = li.groupBy("l_orderkey").agg(F.sum(dq).alias("sq")).filter(
        F.col("sq") > 150
    ).select("l_orderkey")
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(big.withColumnRenamed("l_orderkey", "bk"),
              F.col("bk") == o["o_orderkey"], "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dq).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "group_by_all_sql",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def group_by_all_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the modern SQL shorthand both engines implement
    (every non-aggregate select item becomes a grouping key). Run
    through `spark.sql` so the SQL dialect surface itself is what is
    tested; the oracle text is identical modulo the view name."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gba")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS total
        FROM v_orders_gba
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


_CHAIN_EDGES_SQL = """
  SELECT user_id, event_id,
         LEAD(event_id) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_id
  FROM {events} WHERE user_id < 20
"""

_CHAIN_SEED_SQL = """
  SELECT user_id, event_id, 1 AS hop FROM (
    SELECT user_id, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM {events} WHERE user_id < 20
  ) WHERE rn = 1
"""

_RECURSIVE_CHAIN_SQL = """
WITH RECURSIVE
edges AS ({edges}),
seed AS ({seed}),
chain(user_id, event_id, hop) AS (
  SELECT user_id, event_id, hop FROM seed
  UNION ALL
  SELECT e.user_id, e.next_id, c.hop + 1
  FROM chain c
  JOIN edges e ON e.user_id = c.user_id AND e.event_id = c.event_id
  WHERE e.next_id IS NOT NULL AND c.hop < 25
)
SELECT user_id, CAST(COUNT(*) AS INT) AS chain_len,
       CAST(MAX(hop) AS INT) AS max_hop,
       CAST(MAX(event_id) AS BIGINT) AS last_event_id
FROM chain
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "recursive_event_chain",
    oracle=_RECURSIVE_CHAIN_SQL.format(
        edges=_CHAIN_EDGES_SQL.format(events="events"),
        seed=_CHAIN_SEED_SQL.format(events="events"),
    ),
)
def recursive_event_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): walk each user's
    event chain link by link — seed at the first event, follow the
    LEAD()-derived next-event edge, stop after 25 hops. Linear
    recursion (one successor per row), so total work is
    O(users x depth) with no path explosion; the hop bound keeps the
    iteration count under spark.sql.cteRecursionLevelLimit.

    The edge/seed relations are MATERIALIZED (localCheckpoint) before
    the recursion: Spark re-evaluates a non-recursive CTE referenced
    inside the recursive step on EVERY iteration, so an inline `edges`
    would re-run its window 25x (measured 13.7s -> ~2s at sf0.1).

    The recursion itself is the IDENTICAL SQL text as the DuckDB oracle
    — both engines execute the same recursive UNION ALL semantics. The
    deterministic (ts, event_id) tie-break makes the chain unique."""
    table(spark, sf_dir, "events").createOrReplaceTempView("v_events_chain")
    spark.sql(
        _CHAIN_EDGES_SQL.format(events="v_events_chain")
    ).localCheckpoint().createOrReplaceTempView("v_chain_edges")
    spark.sql(
        _CHAIN_SEED_SQL.format(events="v_events_chain")
    ).localCheckpoint().createOrReplaceTempView("v_chain_seed")
    return spark.sql(
        _RECURSIVE_CHAIN_SQL.format(
            edges="SELECT * FROM v_chain_edges", seed="SELECT * FROM v_chain_seed"
        )
    )


_LATERAL_TOPN_SQL = """
SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
FROM {customer} c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM {orders}
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_custkey < 300
ORDER BY c.c_custkey, t.o_orderkey
"""


@register(
    "lateral_topn_orders_per_customer",
    oracle=_LATERAL_TOPN_SQL.format(customer="customer", orders="orders"),
)
def lateral_topn_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    SQL-standard spelling of grouped top-n. Catalyst decorrelates the
    lateral into a ranked window over a single hash join (no per-row
    re-execution), so the plan is the same shuffle-once top-n as
    `topk_per_group`; the oracle is the IDENTICAL SQL text modulo view
    names (DuckDB executes the same LATERAL semantics). The
    (o_totalprice, o_orderkey) sort is a total order, so LIMIT 2 picks
    identical rows on both engines."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_lat_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_lat_orders")
    return spark.sql(
        _LATERAL_TOPN_SQL.format(customer="v_lat_customer", orders="v_lat_orders")
    )
