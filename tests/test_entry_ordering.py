"""Driver-contract ordering: the round driver samples a fixed-size
prefix of queries() (r1/r2 CORRECTNESS evidence), so the entry module
must emit verification-need order — failed/never-checked queries first,
already-green queries at the back — and rotate automatically as new
CORRECTNESS_r*.json files land."""

from __future__ import annotations

import __spark_entry__ as E
from transit_feed_etl_spark.queries import QUERIES


def test_queries_cover_registry_minus_exempt():
    names = list(E.queries())
    expected = [n for n, q in QUERIES.items() if not q.driver_exempt]
    assert sorted(names) == sorted(expected)
    assert len(names) == len(set(names))


def test_exempt_queries_not_exposed_to_driver():
    names = set(E.queries())
    for n, q in QUERIES.items():
        if q.driver_exempt:
            assert n not in names
            assert q.oracle is None  # exemption is only for oracle-less twins


def test_oracle_sql_subset_and_aligned():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    for n in o:
        assert o[n] == QUERIES[n].oracle


def test_unverified_queries_precede_green_ones():
    """Every query with a green driver row must sort after every query
    without one (the prefix is the driver's sample window)."""
    green = E._load_green()
    names = list(E.queries())
    first_green = next((i for i, n in enumerate(names) if n in green), len(names))
    assert all(n in green for n in names[first_green:]), (
        "green query interleaved before an unverified one"
    )


def test_priority_prefix_rotates_out_once_green():
    """A PRIORITY name that _load_green reports green must not occupy
    the prefix (the rotation needs no per-round edit)."""
    green = E._load_green()
    names = list(E.queries())
    pri_live = [n for n in E.PRIORITY if n in QUERIES and n not in green]
    assert names[: len(pri_live)] == pri_live
