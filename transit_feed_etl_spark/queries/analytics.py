"""Product-analytics operators (EXT): native pivot, funnel conversion,
and cohort retention — the session/user-journey queries an events table
exists to answer. All are one- or two-shuffle plans keyed on user/time
buckets; nothing quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table
from transit_feed_etl_spark.registry import register

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_priority_by_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_n,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,3)))
                FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS f_sum,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_n,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,3)))
                FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE) AS o_sum,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_n,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,3)))
                FILTER (WHERE o_orderstatus = 'P'), 0) AS DOUBLE) AS p_sum
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE `groupBy().pivot(col, values).agg(...)` API (the
    `conditional_pivot` query builds the same shape by hand): explicit
    pivot values keep the plan single-pass — omitting them costs an extra
    distinct-scan job to discover columns, the first thing to fix at
    100 TB. Multiple aggregates per pivot value; counts cast to BIGINT
    and sums decimal-exact for the cross-engine hash."""
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,3)"))
            .cast("double")
            .alias("sum"),
        )
    )
    # coalesce AFTER the pivot: a pivot value with no rows at all emits
    # NULL cells that bypass any coalesce inside the aggregate, where
    # the oracle's FILTER form counts 0 (singleton-corpus sweep)
    zn = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("bigint")  # noqa: E731
    zs = lambda c: F.coalesce(F.col(c), F.lit(0.0))  # noqa: E731
    return piv.select(
        "o_orderpriority",
        zn("F_n").alias("f_n"),
        zs("F_sum").alias("f_sum"),
        zn("O_n").alias("o_n"),
        zs("O_sum").alias("o_sum"),
        zn("P_n").alias("p_n"),
        zs("P_sum").alias("p_sum"),
    ).orderBy("o_orderpriority")


@register(
    "funnel_view_to_purchase",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type,
             LEAD(event_type) OVER w AS next_type,
             LEAD(ts) OVER w AS next_ts
      FROM events WHERE event_type IN ('view', 'purchase')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_views,
           CAST(COUNT(*) FILTER (
             WHERE event_type = 'view' AND next_type = 'purchase'
               AND next_ts <= ts + INTERVAL 1 HOUR) AS BIGINT) AS n_converted
    FROM seq
    GROUP BY user_id
    HAVING COUNT(*) FILTER (WHERE event_type = 'view'
               AND next_type = 'purchase'
               AND next_ts <= ts + INTERVAL 1 HOUR) > 0
    ORDER BY user_id
    """,
)
def funnel_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion: views whose NEXT funnel event (lead over the
    user's view/purchase subsequence) is a purchase within 1 hour. One
    user-keyed window pass — the sequence-pattern formulation that scales
    as sort-within-partition, never a self-join of events against
    events. Emits converting users with view and conversion counts."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    is_view = F.col("event_type") == "view"
    converted = (
        is_view
        & (F.col("next_type") == "purchase")
        & (F.col("next_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.count_if(is_view).alias("n_views"),
            F.count_if(converted).alias("n_converted"),
        )
        .filter(F.col("n_converted") > 0)
        .orderBy("user_id")
    )


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(DATE_TRUNC('week', CAST(ts AS DATE)) AS DATE)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', CAST(ts AS DATE)) AS DATE) AS active_week
      FROM events
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(DATEDIFF('week', f.cohort_week, a.active_week) AS INT) AS week_offset,
           COUNT(*) AS n_users
    FROM activity a JOIN firsts f ON f.user_id = a.user_id
    GROUP BY 1, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week,
    counted per (cohort, week-offset) of later activity. Two shuffles
    (first-seen agg, distinct activity) then a user-keyed join — the
    cohort table is the per-user aggregate, never a row-per-event join
    input, so the join side is |users| not |events|."""
    ev = table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts").cast("date")).cast("date")
    firsts = ev.select("user_id", week.alias("w")).groupBy("user_id").agg(
        F.min("w").alias("cohort_week")
    )
    activity = ev.select("user_id", week.alias("active_week")).distinct()
    off = (
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("int")
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            off.alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
