"""Registry-wide hash-exchange COUNT contract (VERDICT r11 item 7).

The bench box has been noisy two driver rounds running, so structural
plan regressions ("a broadcast silently became a shuffle") must not
depend on wall-clock evidence. Every registered query carries a
generated budget — the number of hash exchanges in its executed plan at
the test sf on the test session shape — in exchange_budgets.json
(tools/exchange_budget.py). A measured count above budget is exactly
the silent-shuffle regression this contract exists for; below budget
means the plan improved and the table must be regenerated so the gain
is locked in. Either way: intentional plan changes regenerate the
budget file in the same commit (python tools/exchange_budget.py
'name_re').

Counts, not widths: the 55 headline queries keep their stricter
byte-width contracts in tests/test_exchange_audit.py; this file is the
cheap whole-registry net under them. Determinism matches the width
contracts' hermetic regime — fixed input data, the conftest session
shape (cpus=8, shuffle_partitions=8), and hermetic_audit's pinned
confs + clean cache state.
"""

from __future__ import annotations

import json
import os

import pytest

from tools.exchange_audit import hermetic_audit
from tools.exchange_budget import BUDGET_PATH, SESSION_SHAPE
from transit_feed_etl_spark.queries import QUERIES

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

with open(BUDGET_PATH) as _f:
    _PAYLOAD = json.load(_f)
BUDGETS: dict[str, int] = _PAYLOAD["budgets"]


def test_budget_table_covers_the_whole_registry():
    """Every registered query must carry a budget, and no budget may
    pin a name that no longer exists — a new query registered without
    regenerating the table would otherwise sail under the net."""
    assert set(BUDGETS) == set(QUERIES), (
        sorted(set(QUERIES) - set(BUDGETS)),
        sorted(set(BUDGETS) - set(QUERIES)),
    )


def test_budget_table_matches_test_session_shape():
    """The budgets were measured on the conftest session shape; a drift
    here would make every count comparison meaningless."""
    assert _PAYLOAD["session"] == SESSION_SHAPE
    assert _PAYLOAD["sf_dir"] == SF


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_hash_exchange_count_stays_on_budget(name, spark):
    """UPPER bound, not equality: the regression this net exists for —
    a broadcast silently becoming a shuffle — always INCREASES the
    count. Below budget is the good direction and is legitimately
    nondeterministic at the margin: AQE's runtime broadcast decisions
    depend on observed relation statistics (e.g. whether a persisted
    subtree's stats arrive from fresh materialization or cache
    metadata), so a borderline-broadcastable side may plan as BHJ in
    one session and SMJ in another (ivf_ann_topk measured 1 vs 2
    across sessions under identical pinned confs). Regenerate the
    table when a plan intentionally changes, locking improvements in."""
    ex = hermetic_audit(lambda: QUERIES[name].builder(spark, SF), spark)
    measured = len(ex.get("hash", []))
    assert measured <= BUDGETS[name], (
        f"{name}: measured {measured} hash exchanges, budget"
        f" {BUDGETS[name]} — a plan grew a shuffle. If intentional,"
        f" regenerate: python tools/exchange_budget.py '{name}'."
        f" Exchanges: {ex.get('hash', [])}"
    )
