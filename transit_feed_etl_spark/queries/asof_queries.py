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


@register(
    "point_in_time_state_join",
    oracle="""
    WITH ev AS (SELECT * FROM events WHERE user_id < 50),
    changes AS (
      SELECT user_id, event_type AS state, ts AS valid_from FROM (
        SELECT user_id, event_type, ts,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type
        FROM ev
      ) WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    u AS (
      SELECT user_id, valid_from AS uts, 1 AS side, state,
             NULL::BIGINT AS p_id, NULL::DOUBLE AS p_value
      FROM changes
      UNION ALL
      SELECT user_id, ts, 0, NULL, event_id, value
      FROM ev WHERE event_type = 'purchase'
    ),
    w AS (
      SELECT user_id, uts, side, p_id, p_value,
             LAST_VALUE(state IGNORE NULLS) OVER win AS state_at_event,
             LAST_VALUE(CASE WHEN side = 1 THEN uts END IGNORE NULLS)
               OVER win AS state_since
      FROM u
      WINDOW win AS (PARTITION BY user_id
                     ORDER BY uts, side, state NULLS FIRST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT p_id AS event_id, user_id, uts AS ts, p_value AS value,
           state_at_event, state_since
    FROM w WHERE side = 0 AND state_at_event IS NOT NULL
    ORDER BY event_id
    """,
)
def point_in_time_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each purchase event picks up the
    SCD2 state STRICTLY in effect before it (pairs with `scd2_user_state`
    — the fact-to-temporal-dimension lookup every warehouse needs). Same
    union-carry formulation as the as-of join: ZERO join operators in
    the plan (pinned in tests/test_plans.py) — only user_id-keyed window
    exchanges (the change-detection lag pass and the union carry); strict
    `<` semantics fall out of the (ts, side) sort order with probes
    BEFORE same-timestamp state changes.
    At 100 TB both inputs co-partition on the user key; no interval
    explosion, no range join."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    from pyspark.sql import Window as W

    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(wl))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", F.col("event_type").alias("state"), F.col("ts").alias("valid_from"))
    )
    probes = ev.filter(F.col("event_type") == "purchase")
    r = changes.select(
        "user_id",
        F.col("valid_from").alias("uts"),
        F.lit(1).alias("side"),
        "state",
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("double").alias("p_value"),
    )
    l = probes.select(
        "user_id",
        F.col("ts").alias("uts"),
        F.lit(0).alias("side"),
        F.lit(None).cast("string").alias("state"),
        F.col("event_id").alias("p_id"),
        F.col("value").alias("p_value"),
    )
    u = r.unionByName(l)
    win = (
        W.partitionBy("user_id")
        .orderBy(F.col("uts"), F.col("side"), F.col("state").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        "user_id",
        "uts",
        "side",
        "p_id",
        "p_value",
        F.last("state", ignorenulls=True).over(win).alias("state_at_event"),
        F.last(F.when(F.col("side") == 1, F.col("uts")), ignorenulls=True)
        .over(win)
        .alias("state_since"),
    )
    return (
        carried.filter((F.col("side") == 0) & F.col("state_at_event").isNotNull())
        .select(
            F.col("p_id").alias("event_id"),
            "user_id",
            F.col("uts").alias("ts"),
            F.col("p_value").alias("value"),
            "state_at_event",
            "state_since",
        )
        .orderBy("event_id")
    )
