"""Window-function surface (SURVEY.md §2 Part B window rows).

The reference's only windowed shape is the degenerate top-1-by-sort
(A19, reference gtfs_rt_assets.py:217-222); "latest position per
vehicle" is the natural generalization — row_number over
(partition by key order by ts desc) = 1.

Running aggregates use DECIMAL so prefix sums are exact and
order-of-addition-independent (see registry.py determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table
from transit_feed_etl_spark.registry import register


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key — the generalized A19. One shuffle on
    user_id; at 100 TB prefer this over self-join-with-max (one pass)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    )
    WHERE rnk <= 3
    ORDER BY o_orderpriority, rnk
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window — the scalable 'N best per key'
    (no per-group sort of the whole table; partial top-k under AQE)."""
    od = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        od.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_orderpriority", "rnk")
    )


@register(
    "topk_per_group_salted",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    )
    WHERE rnk <= 3
    ORDER BY o_orderpriority, rnk
    """,
)
def topk_per_group_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof top-k per group (operators/skew.py
    salted_grouped_topk): level 1 ranks within (group, hash-salt) and
    keeps k per bucket, level 2 ranks the <= n_salts*k survivors — a
    hot group never lands on one reducer. The oracle is the PLAIN
    single-window form, so parity proves the two-level rewrite exact.
    `o_orderkey` makes the order total; 5 priorities x 600k orders at
    sf0.1 is precisely the few-hot-groups shape this exists for."""
    from transit_feed_etl_spark.operators.skew import salted_grouped_topk

    od = table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    return salted_grouped_topk(
        od,
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    ).orderBy("o_orderpriority", "rnk")


@register(
    "running_user_totals",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(value) OVER w AS prev_value,
           LEAD(event_type) OVER w AS next_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value,
           ROW_NUMBER() OVER w AS seq
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, seq
    """,
)
def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic functions (lag/lead) + running-sum frame
    (ROWS UNBOUNDED PRECEDING..CURRENT) + ranking, in one window pass."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("event_type").over(w).alias("next_type"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(wf)
            .cast("double")
            .alias("running_value"),
            F.row_number().over(w).alias("seq"),
        )
        .orderBy("user_id", "seq")
    )


@register(
    "rank_dense_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk,
           NTILE(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
    FROM customer
    ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    """,
)
def rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over per-segment balance ordering.
    ntile gets a total order (tie-break on key) so bucket assignment is
    deterministic across engines."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    wt = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(wt).alias("quartile"),
        )
        .orderBy("c_mktsegment", F.col("c_acctbal").desc(), "c_custkey")
    )


@register(
    "sessionize_events",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events WHERE user_id < 20
    ),
    s AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap > 30 min starts a session; cumulative
    sum of starts labels sessions. One shuffle on user_id; the streaming
    twin is session_window (streaming/ module)."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    epoch_s = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch_s - F.lag(epoch_s).over(w)
    is_new = F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0))
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wf))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "range_frame_trailing_sum",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,3))) OVER (
             PARTITION BY user_id
             ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_1h_sum
    FROM events
    ORDER BY user_id, ts, event_id
    """,
)
def range_frame_trailing_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per-user trailing-1-hour sum. The
    frame is value-based (rangeBetween on epoch seconds), not row-based —
    rows inside the same hour share contributors regardless of row
    position. DECIMAL prefix sums keep the result order-independent."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp_ltz").cast("long"))
        .rangeBetween(-3600, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,3)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_sum"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "first_last_nth_per_group",
    oracle="""
    SELECT DISTINCT o_custkey,
      FIRST_VALUE(o_orderkey) OVER w AS first_order,
      LAST_VALUE(o_orderkey)  OVER w AS last_order,
      NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
      COUNT(*) OVER w AS n_orders
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey
    """,
)
def first_last_nth_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with an explicit full-partition
    ROWS frame (the default frame would stop at CURRENT ROW and make
    last_value useless — a classic window-frame trap)."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
            F.count(F.lit(1)).over(w).alias("n_orders"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


@register(
    "ntile_percentile_ranks",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice ASC, o_orderkey ASC)
    ORDER BY o_orderpriority, o_totalprice ASC, o_orderkey ASC
    LIMIT 1000
    """,
)
def ntile_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranking functions: ntile quartiles, percent_rank,
    cume_dist — deterministic because the window order carries a unique
    tie-break key."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy(F.col("o_orderpriority"), F.col("pct_rank").asc(), F.col("o_orderkey").asc())
        .limit(1000)
    )


@register(
    "scd2_user_state",
    oracle="""
    SELECT user_id, event_type AS state, ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM (
      -- state CHANGES only: collapse runs of the same event_type
      SELECT user_id, event_type, ts FROM (
        SELECT user_id, event_type, ts,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type
        FROM events WHERE user_id < 50
      ) WHERE prev_type IS NULL OR event_type <> prev_type
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY valid_from)
    ORDER BY user_id, valid_from
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event stream:
    collapse consecutive same-state events (lag), then derive
    [valid_from, valid_to) intervals with lead — the standard
    warehouse temporal-dimension pattern. Two window passes over the
    SAME (user_id, ts) ordering, so Catalyst plans ONE exchange and
    sorts once; at 100 TB the state table partitions by user key with
    no self-join."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(wl))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", F.col("event_type").alias("state"), F.col("ts").alias("valid_from"))
    )
    wv = W.partitionBy("user_id").orderBy("valid_from")
    return (
        changes.withColumn("valid_to", F.lead("valid_from").over(wv))
        .withColumn(
            "is_current", F.when(F.col("valid_to").isNull(), 1).otherwise(0)
        )
        .select("user_id", "state", "valid_from", "valid_to", "is_current")
        .orderBy("user_id", "valid_from")
    )


@register(
    "revenue_share_within_nation",
    oracle="""
    WITH r AS (
      SELECT c.c_nationkey, c.c_custkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS revenue
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, c.c_custkey
    )
    SELECT c_nationkey, c_custkey, revenue,
           ROUND(revenue / SUM(CAST(revenue AS DECIMAL(18,3)))
                 OVER (PARTITION BY c_nationkey), 8) AS nation_share
    FROM r
    WHERE c_nationkey < 5
    ORDER BY c_nationkey, c_custkey
    """,
)
def revenue_share_within_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each customer's share of their nation's revenue
    — an unframed partition-total window over the pre-aggregated
    customer rollup (window input is |customers|, never |orders|). The
    window total goes through DECIMAL so partial-agg merge order can't
    drift the divisor."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    r = (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,3)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = W.partitionBy("c_nationkey")
    total = F.sum(F.col("revenue").cast("decimal(18,3)")).over(w)
    return (
        r.filter(F.col("c_nationkey") < 5)
        .select(
            "c_nationkey",
            "c_custkey",
            "revenue",
            F.round(F.col("revenue") / total, 8).alias("nation_share"),
        )
        .orderBy("c_nationkey", "c_custkey")
    )
