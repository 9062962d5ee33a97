"""Timestamp-range differential sweep (16th adversarial corpus, added
round 6).

Two boundary systems meet in the pandas interchange layer:
- the engine computes timestamps as JVM micros over the full
  0001..9999 proleptic-Gregorian range (as does DuckDB, which hands
  pandas datetime64[us]);
- Spark's ``toPandas()`` force-casts to datetime64[ns], whose range is
  only 1677-09-21 .. 2262-04-11 — anything outside raises ArrowInvalid
  at the boundary even though the JVM-side result is correct.

So the sweep pins BOTH facts: every event query agrees with DuckDB on
a corpus pushed to the ns-range EDGES (including negative-epoch
timestamps, the classic floor-division bucketing off-by-one zone), and
the out-of-ns-range years work JVM-side (collect) while the pandas
boundary refuses them loudly — the engine's implicit output domain for
pandas consumers, now documented instead of discovered in production.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from tests.corpus_utils import make_sf_dir, sweep_queries
from tests.test_ties_parity import EVENT_QUERIES, events_table
from transit_feed_etl_spark.queries import QUERIES

# eras spanning the datetime64[ns] range with >= 2 months of margin so
# in-query date arithmetic (windows, gap-fill steps, month adds) cannot
# push a derived timestamp over the edge mid-plan
ERAS = (
    datetime(1677, 11, 2, 0, 30, 0),    # just inside ns MIN
    datetime(1899, 12, 31, 23, 59, 59),
    datetime(1969, 12, 31, 23, 0, 0),   # negative epoch micros
    datetime(1970, 1, 1, 0, 0, 1),      # epoch
    datetime(2105, 6, 15, 12, 0, 0),
    datetime(2262, 2, 1, 23, 45, 0),    # just inside ns MAX
)


@pytest.fixture(scope="module")
def tsrange_sf_dir(tmp_path_factory) -> str:
    # users aligned 1:1 with eras (user j only ever sees era j): the
    # gap-fill densifier's cost contract is span/step PER USER — a user
    # whose events straddle 1677..2262 would legitimately demand a
    # 3e8-minute grid (the first draft of this sweep did exactly that
    # and turned the contract into a hang). Era-pure users keep every
    # per-user span at ~hours while the corpus still crosses every
    # boundary across users.
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_tsrange")),
        {
            "events": events_table(
                60,
                lambda i: ERAS[i % len(ERAS)] + timedelta(minutes=7 * (i // 6)),
                lambda i: 1.0 + (i % 9),
                users=len(ERAS),
                # 5 types against 6 users: co-prime cycles, so every
                # era-pure user still sees a mix of event types (funnel
                # and cohort shapes stay non-degenerate)
                types=("view", "click", "purchase", "signup", "error"),
            )
        },
    )


def test_event_queries_agree_at_ns_range_edges(spark, tsrange_sf_dir):
    """Every event query vs DuckDB with timestamps at the datetime64[ns]
    range edges and across the 1970 epoch sign flip — window bucketing,
    sessionization gaps, as-of ordering, and strftime formatting must
    all be era-independent (floor-division bucketing of NEGATIVE epoch
    micros diverges from truncation-toward-zero first)."""
    failures = sweep_queries(spark, tsrange_sf_dir, EVENT_QUERIES)
    assert not failures, failures


def test_beyond_pandas_range_computes_jvm_side_but_refuses_at_boundary(
    spark, tmp_path
):
    """Years 1000 and 9999 are valid engine-side (proleptic Gregorian
    micros, same as DuckDB): aggregation/collect return exact results.
    Only the pandas interchange refuses them — ArrowInvalid on the
    ns cast — and it must refuse LOUDLY, not wrap silently. This is the
    documented output-domain bound for pandas consumers (the driver's
    compare and any mapInPandas stage cross this boundary; queries over
    the shipped corpora never leave 1992..2025)."""
    out = make_sf_dir(
        str(tmp_path / "sf_far"),
        {
            "events": events_table(
                12,
                lambda i: datetime(1000, 1, 1, 12, 0, 0)
                if i % 2
                else datetime(9999, 12, 30, 12, 0, 0),
                lambda i: float(i),
            )
        },
    )
    from pyspark.sql import functions as F

    from transit_feed_etl_spark.io import table

    ev = table(spark, out, "events")
    # JVM-side: full-range timestamps aggregate and collect exactly
    row = ev.agg(
        F.min(F.year("ts")).alias("y_min"), F.max(F.year("ts")).alias("y_max")
    ).collect()[0]
    assert (row["y_min"], row["y_max"]) == (1000, 9999)
    assert ev.count() == 12
    collected = ev.select("ts").orderBy("ts").collect()
    assert collected[0]["ts"].year == 1000 and collected[-1]["ts"].year == 9999
    # pandas boundary: loud refusal, never a silent wrap
    with pytest.raises(Exception, match="ArrowInvalid|out of bounds"):
        ev.select("ts").toPandas()
    # and a timestamp-free projection of the same rows crosses fine
    assert len(ev.select("event_id", "value").toPandas()) == 12
