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

import os
import shutil
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from transit_feed_etl_spark.queries import QUERIES

SRC = "/root/testdata/sf0.001"

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


@pytest.fixture(scope="module")
def ties_sf_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_ties"))
    n = 60
    one_ts = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array([one_ts] * n, pa.timestamp("us", tz=None)),
                "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
                "event_type": pa.array(
                    ["view", "click", "purchase"][i % 3] for i in range(n)
                ),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(['{"k":1}'] * n, pa.string()),
            }
        ),
        os.path.join(out, "events.parquet"),
    )
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        shutil.copyfile(f"{SRC}/{t}.parquet", os.path.join(out, f"{t}.parquet"))
    return out


def test_event_queries_agree_on_all_tied_events(spark, ties_sf_dir):
    from tests.oracle_utils import compare, run_oracle

    failures = {}
    for name in EVENT_QUERIES:
        q = QUERIES[name]
        if q.oracle is None:
            continue
        try:
            problems = compare(
                q.builder(spark, ties_sf_dir), run_oracle(q.oracle, ties_sf_dir)
            )
        except Exception as e:  # noqa: BLE001 — collect, report all at once
            problems = [f"exception: {e!r}"[:200]]
        if problems:
            failures[name] = problems[:2]
        spark.catalog.clearCache()
    assert not failures, failures
