"""As-of join query (EXT operator; SURVEY.md §2 Part B as-of/interval
row — natural for the reference's domain: align vehicle positions to the
most recent schedule/update event)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table
from transit_feed_etl_spark.operators.asof import asof_join
from transit_feed_etl_spark.registry import register


@register(
    "asof_join_purchase_before_view",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, 0 AS side, event_id AS sort_id,
             event_id AS p_id, value AS p_value, NULL::BIGINT AS l_id
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 1 AS side, event_id,
             NULL, NULL, event_id
      FROM events WHERE event_type = 'view'
    ),
    w AS (
      SELECT user_id, ts, side, l_id,
             LAST_VALUE(p_id IGNORE NULLS) OVER win AS asof_event_id,
             LAST_VALUE(p_value IGNORE NULLS) OVER win AS asof_value
      FROM u
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, sort_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT l_id AS event_id, user_id, ts, asof_event_id, asof_value
    FROM w WHERE side = 1
    ORDER BY event_id
    """,
)
def asof_join_purchase_before_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'view' event, the most recent 'purchase' by the same
    user at or before the view's timestamp (as-of/backward join).
    Implemented via the union-and-carry-forward operator — one shuffle
    on user_id, scales linearly (operators/asof.py)."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return asof_join(
        views,
        purchases,
        on="user_id",
        ts_col="ts",
        left_id="event_id",
        right_id="event_id",
        right_payload=("value",),
    ).select("event_id", "user_id", "ts", "asof_event_id", "asof_value").orderBy("event_id")


@register(
    "asof_join_next_purchase_after_view",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, 0 AS side, event_id AS sort_id,
             event_id AS p_id, value AS p_value, NULL::BIGINT AS l_id
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 1 AS side, event_id,
             NULL, NULL, event_id
      FROM events WHERE event_type = 'view'
    ),
    w AS (
      SELECT user_id, ts, side, l_id,
             FIRST_VALUE(p_id IGNORE NULLS) OVER win AS asof_event_id,
             FIRST_VALUE(p_value IGNORE NULLS) OVER win AS asof_value
      FROM u
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, side DESC, sort_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT l_id AS event_id, user_id, ts, asof_event_id, asof_value
    FROM w WHERE side = 1
    ORDER BY event_id
    """,
)
def asof_join_next_purchase_after_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every 'view' event, the EARLIEST 'purchase'
    by the same user at or after the view's timestamp — the
    time-to-conversion shape (operators/asof.py:asof_join_forward;
    mirrored union-and-carry, one shuffle on user_id)."""
    from transit_feed_etl_spark.operators.asof import asof_join_forward

    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return asof_join_forward(
        views,
        purchases,
        on="user_id",
        ts_col="ts",
        left_id="event_id",
        right_id="event_id",
        right_payload=("value",),
    ).select("event_id", "user_id", "ts", "asof_event_id", "asof_value").orderBy("event_id")
