#!/usr/bin/env python
"""Registry-wide hash-exchange COUNT budgets (VERDICT r11 item 7).

The 55-query bench headline carries measured byte-width contracts
(tests/test_exchange_audit.py), but structural regression detection for
the OTHER ~165 registered queries depended on the wall-clock bench — a
box that has been noisy two driver rounds running. The cheap,
wall-clock-insensitive contract is the NUMBER of hash exchanges in each
query's executed plan: "a broadcast join silently became a shuffle
join" (the classic 100 TB regression — a hint dropped in a refactor, a
dimension outgrowing a hard-coded threshold, an accidental repartition)
changes that count; host contention never does.

This tool measures every registered query at the test sf on the test
session shape (cpus=8, shuffle_partitions=8 — tests/conftest.py) via
the HERMETIC audit (pinned plan confs, clean cache state) and writes
`exchange_budgets.json` at the repo root: {name: n_hash_exchanges}.
tests/test_exchange_budget.py asserts each query still measures exactly
its budget. An INTENTIONAL plan change (new round structure, an extra
partial-agg stage) must regenerate the table in the same commit:

    python tools/exchange_budget.py            # all queries
    python tools/exchange_budget.py 'name_re'  # update a subset in place

Counts are deterministic because everything that shaped them is pinned:
fixed input data, fixed session shape, hermetic confs, and AQE's
runtime decisions depend only on those. Single-partition and range
exchanges are excluded — they are scalar reductions and presentation
sorts whose presence is part of the result shape, and the roundrobin
exchanges are the documented testdata workaround (io.py) that a real
cluster disables.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "exchange_budgets.json",
)
# hermetic_audit pins plan-affecting confs to SESSION-BUILD values, so
# the session must be built with the same shape the tests use
SESSION_SHAPE = {"cpus": 8, "shuffle_partitions": 8}


def measure(spark, sf_dir: str, names=None) -> dict[str, int]:
    from tools.exchange_audit import hermetic_audit
    from transit_feed_etl_spark.queries import QUERIES

    out: dict[str, int] = {}
    for name in sorted(names or QUERIES):
        ex = hermetic_audit(lambda: QUERIES[name].builder(spark, sf_dir), spark)
        out[name] = len(ex.get("hash", []))
        print(f"{name:40} hash_exchanges={out[name]}", flush=True)
    return out


def main() -> int:
    from transit_feed_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    pat = re.compile(sys.argv[1]) if len(sys.argv) > 1 else None
    spark = get_spark(app_name="exchange_budget", **SESSION_SHAPE)
    from transit_feed_etl_spark.queries import QUERIES

    names = [n for n in QUERIES if (not pat or pat.search(n))]
    fresh = measure(spark, sf_dir, names)
    budgets: dict[str, int] = {}
    if pat and os.path.exists(BUDGET_PATH):
        with open(BUDGET_PATH) as f:
            budgets = json.load(f)["budgets"]
    budgets.update(fresh)
    # drop budgets for unregistered names so the file can't pin ghosts
    from transit_feed_etl_spark.queries import QUERIES as Q2

    budgets = {n: c for n, c in sorted(budgets.items()) if n in Q2}
    with open(BUDGET_PATH, "w") as f:
        json.dump({"sf_dir": sf_dir, "session": SESSION_SHAPE, "budgets": budgets}, f,
                  indent=1, sort_keys=True)
    print(f"wrote {len(budgets)} budgets to {os.path.normpath(BUDGET_PATH)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
