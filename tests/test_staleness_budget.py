"""Re-check rotation health (VERDICT r5 items 4/5): with the registry
closed, the 50-slot driver window must cycle every query's driver
evidence within the staleness budget. These tests read the REAL
committed CORRECTNESS_r*.json evidence, so they tighten automatically
as rounds land — and start enforcing the hard budget once enough rounds
exist for a full rotation (round 8+)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.staleness_table import BUDGET, staleness


def test_every_query_has_a_row_once_registry_closed():
    """Round 5 closed the registry: from then on no driver-eligible
    query may be never-checked (a regression here means the rotation
    broke, not that coverage is pending)."""
    latest, table = staleness()
    if latest < 5:
        return
    never = [n for n, (_, _, s) in table.items() if s == "never-checked"]
    assert not never, never


def test_green_rows_within_staleness_budget_after_round_8():
    """At 50 re-checks/round over ~198 queries a full cycle takes ~4
    rounds; once round 8 evidence exists, no query's latest driver row
    may be older than BUDGET rounds (VERDICT r5 item 5)."""
    latest, table = staleness()
    if latest < 8:
        return
    stale = {
        n: f"r{rnd} ({age} rounds ago)"
        for n, (rnd, age, s) in table.items()
        # a post-closure registration awaiting its FIRST eligible driver
        # round has no row by design — "pending-first-row" is the
        # rotation-healthy status, not staleness (its REGISTERED_IN_ROUND
        # entry expires, and this exemption with it, the moment the first
        # row lands)
        if age > BUDGET and s != "pending-first-row"
    }
    assert not stale, stale


def test_verification_doc_table_is_current():
    """The committed VERIFICATION.md §8 table must match the committed
    evidence — regenerate with tools/staleness_table.py when a new
    CORRECTNESS round lands."""
    from tools.staleness_table import BEGIN, END, render

    doc = (Path(__file__).resolve().parent.parent / "VERIFICATION.md").read_text()
    assert BEGIN in doc and END in doc
    committed = doc.partition(BEGIN)[2].partition(END)[0]
    latest, table = staleness()
    fresh = render(latest, table).partition(BEGIN)[2].partition(END)[0]
    assert committed.strip() == fresh.strip(), (
        "VERIFICATION.md §8 is stale. EXPECTED at round start, right after "
        "the driver's evidence commit lands new CORRECTNESS/BENCH artifacts "
        "(ADVICE r7) — run: python tools/round_start.py, then commit."
    )


def test_registered_in_round_entries_still_bind():
    """REGISTERED_IN_ROUND (post-closure additions and driver-exempt
    PROMOTIONS) is rotation state like FORCE_RECHECK: an entry whose
    query has a driver row from its first eligible round or later must
    be pruned — a stale entry would re-label a genuine rotation defect
    as 'pending-first-row' forever. Rows that PREDATE the entry's round
    do not satisfy it (a promoted query's old no_oracle rows attest the
    pre-promotion shape, r12 simhash case)."""
    import __spark_entry__ as E
    from tools.staleness_table import REGISTERED_IN_ROUND

    verdicts = E._load_verdicts()
    for name, first_round in REGISTERED_IN_ROUND.items():
        row = verdicts.get(name)
        assert row is None or row[0] < first_round, (
            f"REGISTERED_IN_ROUND[{name!r}]={first_round} is satisfied by "
            f"an r{row[0]} driver row — prune it. EXPECTED at round start "
            "(ADVICE r7): run python tools/round_start.py for the prune list."
        )


def test_inline_eligible_counts_are_generated_and_current():
    """VERDICT r10 item 4: the §1 registry count drifted by hand three
    rounds running (r8: 204, r9: 208, r10: 213). Every prose mention of
    the driver-eligible count now lives in an eligible-count marker
    span rewritten by tools/staleness_table.py; this pins (a) at least
    the §1 and §8 spans exist and (b) every span holds exactly
    len(eligible)."""
    import re

    from tools.staleness_table import COUNT_BEGIN, COUNT_END

    doc = (Path(__file__).resolve().parent.parent / "VERIFICATION.md").read_text()
    spans = re.findall(
        re.escape(COUNT_BEGIN) + r"(.*?)" + re.escape(COUNT_END), doc
    )
    assert len(spans) >= 2, "expected the §1 and §8 eligible-count spans"
    _, table = staleness()
    for span in spans:
        assert span == str(len(table)), (
            f"eligible-count span says {span!r}, registry has {len(table)} "
            "driver-eligible queries — run python tools/staleness_table.py"
        )
