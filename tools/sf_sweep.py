#!/usr/bin/env python
"""Full-registry parity + timing sweep at an arbitrary scale factor.

The driver's CORRECTNESS gate runs at sf=0.01; this tool re-runs every
registered query AND its DuckDB oracle at a larger sf (default 0.1) to
catch partition-count-dependent bugs (wrong results that only appear
once data spans many partitions) and straggler plans the 30-query
headline bench does not time.

Usage: python tools/sf_sweep.py [sf_dir] [name_regex]
Writes one line per query: status, spark wall seconds, rows.
Exit code 1 if any oracle mismatch.
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

from tests.oracle_utils import compare, run_oracle  # noqa: E402
from transit_feed_etl_spark.caching import release_caches  # noqa: E402
from transit_feed_etl_spark.queries import QUERIES  # noqa: E402
from transit_feed_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pat = re.compile(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_spark()
    failures: list[str] = []
    timings: list[tuple[float, str]] = []
    for name, q in sorted(QUERIES.items()):
        if pat and not pat.search(name):
            continue
        t0 = time.monotonic()
        try:
            sdf = q.builder(spark, sf_dir)
            pdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR  {name}: {exc}", flush=True)
            failures.append(name)
            release_caches()
            continue
        wall = time.monotonic() - t0
        timings.append((wall, name))
        status = "ok"
        if q.oracle is not None:
            try:
                odf = run_oracle(q.oracle, sf_dir)
                problems = compare(sdf, odf)
            except Exception as exc:  # noqa: BLE001
                problems = [f"oracle error: {exc}"]
            if problems:
                status = "MISMATCH " + "; ".join(str(p) for p in problems[:3])
                failures.append(name)
        else:
            status = "rows-only"
        print(f"{wall:7.2f}s {len(pdf):>8} rows  {name}: {status}", flush=True)
        release_caches()
    timings.sort(reverse=True)
    print("\nslowest 15:")
    for wall, name in timings[:15]:
        print(f"  {wall:7.2f}s {name}")
    print(f"\ntotal spark wall: {sum(w for w, _ in timings):.1f}s "
          f"over {len(timings)} queries; failures: {len(failures)}")
    if failures:
        print("FAILED:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
