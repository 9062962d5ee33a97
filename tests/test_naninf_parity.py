"""NaN / ±Infinity differential sweep: the one numeric edge class the
extreme-values corpus deliberately avoided (its docstring bounds the
domain at finite doubles). The driver testdata is finite, so these are
OUT-OF-DOMAIN inputs — the sweep's job is (1) to prove the queries that
should shrug off non-finite values really do agree with DuckDB on them,
and (2) to PIN the classification of the known cross-engine divergences
so a future change that silently alters NaN behavior trips a test
instead of drifting.

Known cross-engine facts this corpus exposes (none are engine defects):

- DECIMAL-exactness contract: every order-independent SUM rides a
  DECIMAL cast (registry.py docstring). Spark casts NaN/Inf -> DECIMAL
  as NULL (non-ANSI mode); DuckDB RAISES (Conversion Error). The
  contract's documented domain is finite doubles — the 12 queries in
  ORACLE_RAISES below fail only because the ORACLE side cannot run.
- double->string rendering: Java prints 'NaN'/'Infinity', DuckDB
  'nan'/'inf' — same class as the scientific-notation bound documented
  in test_extreme_parity.py (format_popup_strings, null_semantics).
- percentile/median semantics: both engines sort NaN greatest, but
  they disagree on NaN's effect inside percentile interpolation
  (exact_percentiles, outlier_events_mad).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from tests.corpus_utils import make_sf_dir, sweep_queries
from tests.test_ties_parity import EVENT_QUERIES, events_table

NANINF_VALUES = [
    1.5,
    float("nan"),
    float("inf"),
    float("-inf"),
    -2.25,
    0.0,
    float("nan"),
    100.0,
]

# Queries whose ORACLE crashes on this corpus: DuckDB raises casting a
# non-finite double to DECIMAL, Spark nulls it. Finite-domain bound of
# the decimal-exactness contract, not a defect.
ORACLE_RAISES = {
    "running_user_totals",
    "range_frame_trailing_sum",
    "conditional_pivot",
    "outlier_events_zscore",
    "grand_total",
    "time_range_aggregate",
    "math_functions",
    "cogroup_user_view_purchase",
    "tumbling_hourly_rollup",
    "minutely_ingest_cadence",
    "gap_fill_forward_fill",
    "merge_upsert_customer_balance",
    "incremental_agg_merge",
}

# Queries where both engines run but disagree on representation or
# NaN-percentile semantics (see module docstring).
VALUE_DIVERGES = {
    "exact_percentiles",  # NaN inside percentile interpolation
    "outlier_events_mad",  # median over a NaN-bearing window
    "format_popup_strings",  # 'NaN' (JVM) vs 'nan' (DuckDB) rendering
    "null_semantics",  # same rendering divergence
}


@pytest.fixture(scope="module")
def naninf_sf_dir(tmp_path_factory) -> str:
    base = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_naninf")),
        {
            "events": events_table(
                40,
                lambda i: base + timedelta(minutes=i),
                lambda i: NANINF_VALUES[i % len(NANINF_VALUES)],
                users=4,
            )
        },
    )


def test_event_queries_classified_on_naninf(spark, naninf_sf_dir):
    """The safe set agrees exactly; the divergent set stays EXACTLY the
    known classification (a query leaving OR entering it is news)."""
    failures = sweep_queries(spark, naninf_sf_dir, EVENT_QUERIES)
    unexpected = {
        n: p for n, p in failures.items() if n not in ORACLE_RAISES | VALUE_DIVERGES
    }
    assert not unexpected, unexpected
    newly_safe = (ORACLE_RAISES | VALUE_DIVERGES) - set(failures)
    assert not newly_safe, (
        f"queries now AGREE on NaN/Inf — move them out of the divergent "
        f"classification: {sorted(newly_safe)}"
    )
    # the oracle-raises class must fail by ORACLE exception, not by a
    # Spark-side crash or a silent value mismatch
    for name in ORACLE_RAISES:
        assert any("exception" in p for p in failures[name]), (name, failures[name])
