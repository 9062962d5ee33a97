"""Event-time window aggregates — batch twins of the streaming semantics
(SURVEY.md §2 Part B streaming rows; reference's closest shape is the
1-hour-lookback A18 recomputed per minute ≈ a sliding window).

The same `F.window` expressions run unchanged under readStream with a
watermark (streaming/ingest.py); registering the batch versions makes
them oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table
from transit_feed_etl_spark.registry import register


@register(
    "tumbling_hourly_rollup",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6))), 0) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def tumbling_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type. `F.window`
    aligns to epoch boundaries, so window.start == date_trunc('hour') —
    the hypertable-rollup shape."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0))
            .cast("double")
            .alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
            "n_users",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "sliding_window_counts",
    oracle="""
    WITH s AS (
      SELECT e.ts, e.event_type,
             DATE_TRUNC('hour', e.ts)
               + TO_MINUTES(CASE WHEN EXTRACT(MINUTE FROM e.ts) >= 30 THEN 30 ELSE 0 END)
               - TO_MINUTES(k.k * 30) AS window_start
      FROM events e, (SELECT UNNEST([0, 1]) AS k) k
    )
    SELECT window_start, COUNT(*) AS n
    FROM s
    WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
    GROUP BY window_start
    ORDER BY window_start
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour length, 30-minute slide — every event
    falls in exactly 2 windows. The oracle reconstructs Spark's
    epoch-aligned window assignment via truncate-and-shift."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
        .orderBy("window_start")
    )


@register(
    "minutely_ingest_cadence",
    oracle="""
    SELECT DATE_TRUNC('minute', ts) AS batch_minute,
           COUNT(*) AS n_records,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6))), 0) AS DOUBLE) AS batch_value
    FROM events
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY batch_minute
    """,
)
def minutely_ingest_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute batch rollup — the reference's every-60s ingestion
    cadence (A23, reference gtfs_rt_assets.py:253-257) as an event-time
    aggregate, with the A10 empty/trivial-batch guard as HAVING."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("minute", F.col("ts")).alias("batch_minute"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.coalesce(F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0))
            .cast("double")
            .alias("batch_value"),
        )
        .filter(F.col("n_records") > 1)
        .orderBy("batch_minute")
    )


@register(
    "gap_fill_forward_fill",
    oracle="""
    WITH e AS (
      SELECT user_id, DATE_TRUNC('minute', ts) AS m, value
      FROM events WHERE user_id < 5
    ),
    agg AS (
      SELECT user_id, m, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
      FROM e GROUP BY user_id, m
    ),
    bounds AS (SELECT user_id, MIN(m) AS mn, MAX(m) AS mx FROM e GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS m
      FROM bounds
    )
    SELECT g.user_id, g.m AS minute_ts,
           CAST(COALESCE(a.n, 0) AS INT) AS n_events,
           LAST_VALUE(a.s IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.m
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
    FROM grid g LEFT JOIN agg a ON a.user_id = g.user_id AND a.m = g.m
    ORDER BY g.user_id, minute_ts
    """,
)
def gap_fill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: densify each user's event stream onto
    a 1-minute grid (sequence + explode between the observed bounds) and
    FORWARD-FILL the per-minute sum across gaps (last ignorenulls frame
    window). The grid explode is bounded by span/step per key — never a
    cross join against a global calendar — and the fill is one window
    over the same user_id partitioning the join already established, so
    Catalyst plans a single exchange for join + window."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    e = ev.select(
        "user_id", F.date_trunc("minute", "ts").alias("m"), "value"
    )
    agg = e.groupBy("user_id", "m").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
    )
    grid = (
        e.groupBy("user_id")
        .agg(F.min("m").alias("mn"), F.max("m").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 MINUTE"))
            ).alias("m"),
        )
    )
    from pyspark.sql import Window as W

    wf = (
        W.partitionBy("user_id")
        .orderBy("m")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(agg, ["user_id", "m"], "left")
        .select(
            "user_id",
            F.col("m").alias("minute_ts"),
            F.coalesce("n", F.lit(0)).cast("int").alias("n_events"),
            F.last("s", ignorenulls=True).over(wf).alias("filled_sum"),
        )
        .orderBy("user_id", "minute_ts")
    )


@register(
    "windowed_dedup_batch",
    oracle="""
    WITH b AS (
      SELECT event_id, user_id, event_type, ts, value,
             DATE_TRUNC('minute', ts)
               - INTERVAL (CAST(EXTRACT(minute FROM ts) AS INT) % 10) MINUTE
               AS bucket
      FROM events WHERE user_id < 20
    )
    SELECT event_id, user_id, event_type, ts, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type, bucket
        ORDER BY ts, event_id) AS rn
      FROM b
    ) WHERE rn = 1
    ORDER BY event_id
    """,
)
def windowed_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of `dropDuplicatesWithinWatermark`: keep the FIRST
    event per (user, type) within each 10-minute bucket — backfill jobs
    must reproduce the streaming dedup semantics when reprocessing
    history, and this is the deterministic window formulation that does
    it (the streaming variant's horizon becomes an explicit time
    bucket). One (key, bucket) ranking window; first-pick tie-break on
    (ts, event_id)."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    bucket = F.window("ts", "10 minutes")["start"]
    w = W.partitionBy("user_id", "event_type", bucket).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .orderBy("event_id")
    )
