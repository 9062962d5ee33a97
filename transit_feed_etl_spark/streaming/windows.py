"""Streaming window semantics beyond the reference (SURVEY.md §2 Part B
streaming rows / §7 Phase 3): watermarked tumbling & sliding aggregates,
within-watermark dedup, session windows, and a custom stateful operator
via applyInPandasWithState.

The reference's closest shape is the 1-hour lookback recomputed each
minute (A18) — wall-clock, late-data-blind. These are the honest
event-time upgrades.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregate. Late rows beyond
    the watermark are dropped; state is bounded (the A18 lookback pattern
    without unbounded recompute)."""
    w = (
        F.window(ts_col, window)
        if slide is None
        else F.window(ts_col, window, slide)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps one row per key while the key is
    inside the watermark horizon, then evicts — the streaming twin of
    the batch `dedup_exact` operator."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows with a per-user inactivity gap — the streaming
    twin of the batch `sessionize_events` query."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


# ---- custom stateful operator: running per-key anomaly counter ----------

_STATE_OUT_SCHEMA = (
    "user_id bigint, batch_events int, running_total double, n_anomalies int"
)
_STATE_SCHEMA = "running_total double, running_count bigint, n_anomalies int"


def _anomaly_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Carry a per-user running value total across micro-batches; count
    events whose value exceeds 10x the running mean of all PRIOR events
    (cumulative within the batch — a whole micro-batch arrives as one
    pandas frame, so the prefix means must be computed vectorized)."""
    import numpy as np

    (user_id,) = key
    running_total, running_count, n_anomalies = (
        state.get if state.exists else (0.0, 0, 0)
    )
    n_events = 0
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        vals = pdf["value"].fillna(0.0).to_numpy()
        prior_sum = np.concatenate(([0.0], np.cumsum(vals)[:-1])) + running_total
        prior_cnt = np.arange(len(vals)) + running_count
        prior_mean = prior_sum / np.maximum(prior_cnt, 1)
        n_anomalies += int(
            ((prior_cnt > 0) & (vals > 10 * np.maximum(prior_mean, 1e-9))).sum()
        )
        n_events += len(vals)
        running_total += float(vals.sum())
        running_count += len(vals)
    state.update((running_total, running_count, n_anomalies))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "batch_events": [n_events],
            "running_total": [running_total],
            "n_anomalies": [n_anomalies],
        }
    )


def stateful_anomaly_counts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): the
    escape hatch for semantics built-ins can't express (SURVEY.md §7
    risk register). State is per-key and Arrow-batched — no per-row
    Python."""
    return (
        events.withWatermark(ts_col, "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _anomaly_fn,
            outputStructType=_STATE_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: right rows land within
    [left.ts, left.ts + horizon] for the same key — the streaming twin of
    the batch `range_join_shipments_in_window` / `asof_join_*` family
    (e.g. attribute purchases to the view that preceded them).

    Both sides carry watermarks AND the join condition bounds event-time
    distance, so Spark can size the join state buffers and EVICT rows the
    watermark has passed — without the time bound, stream-stream join
    state grows forever (the 100 TB failure mode). Outer variants emit
    the unmatched side only after the watermark closes its window."""
    lv = left.withWatermark(ts_col, watermark).alias("l")
    rv = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {horizon}"))
    )
    joined = lv.join(rv, cond, how)
    return joined.select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_id"),
        F.col(f"l.{ts_col}").alias("left_ts"),
        F.col("r.event_id").alias("right_id"),
        F.col(f"r.{ts_col}").alias("right_ts"),
        (
            F.col(f"r.{ts_col}").cast("long") - F.col(f"l.{ts_col}").cast("long")
        ).alias("lag_seconds"),
    )
