#!/usr/bin/env python
"""Full-registry differential sweep under DRIVER-LIKE conditions: every
oracle-paired query vs DuckDB at a chosen sf dir, on a session built the
way the round driver builds one (local[$SPARK_GRAFT_CPUS], shuffle
partitions = cores) rather than the pytest fixture's 8-core posture.

The pytest parity gate (tests/test_oracle_parity.py) covers the same
compare; this tool exists to re-check partition-count independence — a
query whose values depend on shuffle partitioning (float sum order,
under-specified top-k ties) passes at 8 partitions and fails at 32.
Every registered query is engineered to be partition-count independent
(decimal sums, total tie-breaks); this sweep proves it at the driver's
own width.

Usage:
  python tools/parity_sweep.py                 # sf0.01, all cores
  SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=8 python tools/parity_sweep.py
Exit code 0 = all green; 1 = at least one mismatch (listed on stdout).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transit_feed_etl_spark.caching import release_caches  # noqa: E402
from transit_feed_etl_spark.queries import QUERIES  # noqa: E402
from transit_feed_etl_spark.session import get_spark  # noqa: E402

from tests.oracle_utils import compare, run_oracle  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    # SPARK_GRAFT_SHUFFLE overrides shuffle partitions independently of
    # core count: running the registry at e.g. 128 partitions on 32
    # cores proves partition-count independence ABOVE the driver width
    # (a value that survives 8, 32, and 128 partitions has no
    # partition-order dependence left to find).
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE")
    spark = get_spark(
        app_name="parity_sweep",
        shuffle_partitions=int(shuffle) if shuffle else None,
    )
    checked = 0
    failed: dict[str, list[str]] = {}
    t_start = time.monotonic()
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        try:
            problems = compare(
                q.builder(spark, sf_dir), run_oracle(q.oracle, sf_dir)
            )
        except Exception as e:  # noqa: BLE001 — sweep must not die mid-run
            problems = [f"exception: {e!r}"[:300]]
        checked += 1
        if problems:
            failed[name] = problems[:3]
            print(f"FAIL {name} :: {problems[:3]}", flush=True)
        release_caches()
        spark.catalog.clearCache()
    wall = round(time.monotonic() - t_start, 1)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cores": spark.sparkContext.defaultParallelism,
                "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
                "checked": checked,
                "failed": sorted(failed),
                "wall_sec": wall,
            }
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
