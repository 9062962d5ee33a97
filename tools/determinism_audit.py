#!/usr/bin/env python
"""Run every oracled query TWICE in one session and compare value
hashes — catches run-to-run nondeterminism (partition-order-dependent
floats, unstable tie-breaks, leaked cache state) that the one-shot
oracle-parity gate cannot see. ~8 min at sf0.01; run before a round
hand-off, not in the pytest loop.

Usage: python tools/determinism_audit.py [sf_dir]
Last clean run: 216/216 deterministic at sf0.01 (round 11 — all three
r11 registrations, the floored corpus_drift_kl, and the re-persisted
corpus_dedup_rounds included). Round-10: 213/213. Round-9: 208/208.
Round-8: 204/204. Round-7: 199/199. Round-6 note kept below for
the re-audit protocol: 198/198 (round 6; the six
queries whose outputs changed after that run — the oracle promotions,
array_setops, and the redesigned embedding_quantization — were
re-audited individually, plus shuffle=128 parity, same session).
Round-2 baseline: 185/185.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from transit_feed_etl_spark.caching import release_caches
    from transit_feed_etl_spark.queries import QUERIES
    from transit_feed_etl_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="determinism-audit")

    def result_hash(name: str) -> str:
        df = QUERIES[name].builder(spark, sf)
        cols = sorted(df.columns)
        rows = [tuple(str(r[c]) for c in cols) for r in df.collect()]
        release_caches()
        spark.catalog.clearCache()
        return hashlib.md5(str(sorted(rows)).encode()).hexdigest()

    bad = []
    names = sorted(n for n, q in QUERIES.items() if q.oracle)
    for name in names:
        if result_hash(name) != result_hash(name):
            bad.append(name)
            print(f"NONDETERMINISTIC: {name}", file=sys.stderr)
    print(f"checked {len(names)} queries; nondeterministic: {bad or 'NONE'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
