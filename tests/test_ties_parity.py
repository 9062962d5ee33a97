"""Adversarial-ties differential sweep: every event-reading query must
agree with DuckDB when ALL events share one timestamp and one value —
the degenerate input that stresses every window tie-break (an
under-specified ORDER BY diverges here first) and every variance-style
denominator.

Found and fixed by this sweep when first run: outlier_events_zscore
divided by a zero sample variance on an all-identical group — an ANSI
ArithmeticException in Spark (and a z-score that is undefined anyway);
both sides now NULL the z-score for n < 2 or zero variance.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa
import pytest

from tests.corpus_utils import make_sf_dir, sweep_queries

# every registered query whose builder or oracle reads `events`
EVENT_QUERIES = (
    "latest_event_per_user",
    "running_user_totals",
    "sessionize_events",
    "range_frame_trailing_sum",
    "scd2_user_state",
    "salted_distinct_users_by_type",
    "exact_percentiles",
    "conditional_pivot",
    "outlier_events_zscore",
    "outlier_events_mad",
    "existence_filter",
    "null_guarded_projection",
    "union_enriched_batches",
    "bbox_aggregate",
    "grand_total_coalesce",
    "grand_total",
    "time_range_aggregate",
    "top1_latest",
    "recursive_event_chain",
    "format_popup_strings",
    "timestamp_formatting",
    "math_functions",
    "null_semantics",
    "bitwise_functions",
    "json_extraction",
    "map_entry_stats",
    "variant_typed_extraction",
    "cogroup_user_view_purchase",
    "tumbling_hourly_rollup",
    "sliding_window_counts",
    "minutely_ingest_cadence",
    "gap_fill_forward_fill",
    "windowed_dedup_batch",
    "merge_upsert_customer_balance",
    "scd2_purchase_value_history",
    "incremental_agg_merge",
    "merge_upsert_user_profiles",
    "funnel_view_to_purchase",
    "cohort_weekly_retention",
    "asof_join_purchase_before_view",
    "asof_join_next_purchase_after_view",
    "point_in_time_state_join",
)


def events_table(
    n: int, ts_fn, value_fn, users: int = 3, types=("view", "click", "purchase")
) -> pa.Table:
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([ts_fn(i) for i in range(n)], pa.timestamp("us", tz=None)),
            "user_id": pa.array([i % users for i in range(n)], pa.int64()),
            "event_type": pa.array(types[i % len(types)] for i in range(n)),
            "value": pa.array([value_fn(i) for i in range(n)], pa.float64()),
            "props": pa.array(['{"k":1}'] * n, pa.string()),
        }
    )


@pytest.fixture(scope="module")
def ties_sf_dir(tmp_path_factory) -> str:
    one_ts = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_ties")),
        {"events": events_table(60, lambda i: one_ts, lambda i: 1.0)},
    )


def test_event_queries_agree_on_all_tied_events(spark, ties_sf_dir):
    failures = sweep_queries(spark, ties_sf_dir, EVENT_QUERIES)
    assert not failures, failures


# --- calendar-boundary corpus (ISO week/year edges, leap day) ---------------


@pytest.fixture(scope="module")
def calendar_sf_dir(tmp_path_factory) -> str:
    from datetime import timedelta

    stamps = []
    for d in (
        "2023-12-28", "2023-12-31", "2024-01-01", "2024-01-04",
        "2024-02-28", "2024-02-29", "2024-03-01", "2024-12-30",
        "2025-01-01", "2023-01-01",
    ):
        stamps.append(datetime.fromisoformat(d + "T23:30:00+00:00"))
        stamps.append(datetime.fromisoformat(d + "T00:15:00+00:00"))
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_calendar")),
        {
            "events": events_table(
                60,
                lambda i: stamps[i % len(stamps)] + timedelta(minutes=i),
                lambda i: 1.0 + i,
            )
        },
    )


def test_event_queries_agree_on_calendar_boundaries(spark, calendar_sf_dir):
    """Week-of-year, year-boundary, and leap-day timestamps are the
    classic calendar divergence zone (ISO weeks differ between engines'
    defaults); every event query plus the calendar-function surface
    must agree across 2023/2024/2025 boundaries and 2024-02-29."""
    failures = sweep_queries(
        spark, calendar_sf_dir, EVENT_QUERIES + ("calendar_functions",)
    )
    assert not failures, failures


# --- malformed-JSON props corpus --------------------------------------------


@pytest.fixture(scope="module")
def badjson_sf_dir(tmp_path_factory) -> str:
    from datetime import timedelta

    base = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
    props = [
        '{"k":1}', "not json at all", "", '{"k": null}', "{broken",
        "null", "[]", "{}", '{"k": 42, "m": 7}', "   ",
    ]
    ev = events_table(
        40, lambda i: base + timedelta(minutes=i), lambda i: 1.0 + i
    )
    cols = ev.to_pydict()
    cols["props"] = [props[i % len(props)] for i in range(40)]
    import pyarrow as pa

    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_badjson")), {"events": pa.table(cols)}
    )


def test_json_queries_agree_on_malformed_props(spark, badjson_sf_dir):
    """Spark's get_json_object / from_json are LENIENT on malformed
    JSON (NULL / empty map) where DuckDB's json functions raise — the
    oracles carry json_valid guards so both engines agree on the whole
    props domain. (The VARIANT surface is strict on BOTH engines by
    design — parse_json raises, json_extract raises — so it is not in
    this lenient sweep.)"""
    failures = sweep_queries(
        spark,
        badjson_sf_dir,
        ("json_extraction", "map_entry_stats", "json_struct_roundtrip"),
    )
    assert not failures, failures
