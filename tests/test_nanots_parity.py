"""Nanosecond-timestamp differential sweep: the driver's events.parquet
is TIMESTAMP(NANOS), which Spark cannot read natively — io.table rides
``spark.sql.legacy.parquet.nanosAsLong`` and truncates to microseconds,
while DuckDB reads the full nanosecond value (the one cross-engine
precision asymmetry in the whole pipeline).

This corpus makes the asymmetry maximally hostile: groups of 4 events
share one microsecond and differ ONLY by 250 ns steps, so Spark sees
4-way timestamp ties where DuckDB sees a strict order. All 42
event-reading queries must still agree — which holds exactly because
every ordering the registry relies on carries a total tie-break on a
non-timestamp column (event_id / user_id), a contract this sweep turns
from convention into a test. A failure here means someone introduced an
ordering or window that leans on sub-microsecond timestamp order Spark
cannot see."""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa
import pytest

from tests.corpus_utils import make_sf_dir, sweep_queries
from tests.test_ties_parity import EVENT_QUERIES


@pytest.fixture(scope="module")
def nanots_sf_dir(tmp_path_factory) -> str:
    base_ns = (
        int(datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc).timestamp()) * 10**9
    )
    n = 40
    # groups of 4 share the same microsecond, differing by 250 ns steps
    ts_ns = [base_ns + (i // 4) * 60_000_000_000 + (i % 4) * 250 for i in range(n)]
    events = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts_ns, pa.timestamp("ns", tz=None)),
            "user_id": pa.array([i % 4 for i in range(n)], pa.int64()),
            "event_type": pa.array(
                [("view", "click", "purchase")[i % 3] for i in range(n)]
            ),
            "value": pa.array([float(i) for i in range(n)], pa.float64()),
            "props": pa.array(['{"k":1}'] * n, pa.string()),
        }
    )
    return make_sf_dir(str(tmp_path_factory.mktemp("sf_nanots")), {"events": events})


def test_event_queries_agree_despite_submicro_ties(spark, nanots_sf_dir):
    failures = sweep_queries(spark, nanots_sf_dir, EVENT_QUERIES)
    assert not failures, failures
