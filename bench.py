#!/usr/bin/env python
"""Benchmark runner (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from transit_feed_etl_spark.queries import QUERIES
from transit_feed_etl_spark.session import get_spark

# Headline set: one representative per operator family (full coverage is
# the correctness suite's job; bench tracks throughput of the load-bearing
# plans at sf0.1).
HEADLINE = (
    "q1_pricing_summary",        # grouped multi-agg over the biggest table
    "join_revenue_by_nation",    # fact-fact + broadcast-dim join
    "left_join_order_counts",    # outer join + agg
    "latest_event_per_user",     # ranking window
    "topk_orders",               # global top-k
    "asof_join_purchase_before_view",  # as-of join operator
    "tumbling_hourly_rollup",    # event-time window rollup
    "dedup_exact",               # hash dedup
    "neardup_jaccard_pairs",     # shingle self-join near-dup
    "minhash_lsh_candidates",    # LSH scale path
    "cosine_topk_bruteforce",    # vector similarity
    "text_token_stats",          # text analysis
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")
    # Warm the JVM/codegen paths so query 1 doesn't pay session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = QUERIES[name]
        t0 = time.perf_counter()
        n = len(q.builder(spark, sf_dir).collect())
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    out = {
        "metric": "headline_query_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
