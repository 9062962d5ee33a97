"""Zero-variance / degenerate-moment differential sweep (18th corpus):
constant numeric columns, single-row groups, and two-equal-value groups
— the input-domain edge where second-moment statistics (corr, covar,
stddev, variance, regression slopes, z-scores, MAD) divide by zero and
engines disagree on whether the result is NULL or NaN.

The driver testdata is well-spread, so every moment denominator there
is comfortably positive; these inputs are where the guards (or their
absence) actually bind: corr of a constant column, stddev of one row,
MAD of a constant group, a histogram whose min == max, quantiles of a
group with a single value.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.corpus_utils import make_sf_dir, sweep_queries

SWEEP_QUERIES = (
    # events.value moment family
    "exact_percentiles",
    "approx_percentiles",
    "equidepth_deciles",
    "exact_median_via_rank",
    "outlier_events_zscore",
    "outlier_events_mad",
    # lineitem / orders moment family
    "numeric_stats_by_flag",
    "regression_price_vs_qty",
    "cube_lineitem_stats",
    "bool_aggs_order_flags",
    "price_histogram",
    "argmax_order_per_status",
)


def _degenerate_events() -> pa.Table:
    """Four groups: 50 constant values, a singleton, two equal values,
    and one ordinary spread group (so the sweep also proves the normal
    path still agrees on a corpus containing degenerate siblings)."""
    rows: list[tuple[str, float]] = []
    rows += [("const", 7.25)] * 50
    rows += [("single", 3.0)]
    rows += [("two_equal", 5.5)] * 2
    rows += [("normal", float(3 * i % 41) + 0.5) for i in range(40)]
    n = len(rows)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [1_700_000_000_000_000 + i * 60_000_000 for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([r[1] for r in rows], pa.float64()),
            "props": pa.array(['{"k":1}'] * n, pa.string()),
        }
    )


def _constant_columns(src_path: str, consts: dict[str, float]) -> pa.Table:
    """The real sf0.001 table with the named double columns overwritten
    by constants — every other column (keys, dates, strings) keeps its
    genuine distribution so joins and group keys stay realistic."""
    t = pq.read_table(src_path)
    for col, v in consts.items():
        idx = t.schema.get_field_index(col)
        t = t.set_column(idx, col, pa.array([v] * t.num_rows, pa.float64()))
    return t


@pytest.fixture(scope="module")
def zerovar_sf_dir(tmp_path_factory) -> str:
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_zerovar")),
        {
            "events": _degenerate_events(),
            "lineitem": _constant_columns(
                "/root/testdata/sf0.001/lineitem.parquet",
                {
                    "l_quantity": 5.0,
                    "l_extendedprice": 100.0,
                    "l_discount": 0.05,
                    "l_tax": 0.02,
                },
            ),
            "orders": _constant_columns(
                "/root/testdata/sf0.001/orders.parquet",
                {"o_totalprice": 42000.0},
            ),
        },
    )


def test_moment_family_agrees_on_degenerate_variance(spark, zerovar_sf_dir):
    failures = sweep_queries(spark, zerovar_sf_dir, SWEEP_QUERIES)
    assert not failures, failures
