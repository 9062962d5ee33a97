#!/usr/bin/env python
"""Measure compact-forward vs id-ordered triangle counting on a
hub-skewed graph (VERDICT r6 item 8: convert the documented
'orient edges low-degree -> high-degree so hub fan-out stays bounded'
claim into evidence).

Graph: star + ring on n nodes — hub id 0 adjacent to every node, plus
ring edges (i, i+1). Exactly n-1 triangles {0, i, i+1}. This is the
power-law extreme: one node holds half the edge endpoints.

- id orientation: every star edge points 0 -> i (the hub has the lowest
  id), so the hub's forward adjacency is ALL n star edges and the wedge
  join enumerates ~n^2/2 candidate wedges at the hub.
- degree orientation (compact-forward): every edge points INTO the hub
  (highest degree), hub forward-degree 0; wedges only form at ring
  nodes (forward degree <= 2), so wedge volume is O(n).

Usage: python tools/triangle_probe.py [max_n]  (default 32000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from transit_feed_etl_spark.caching import release_caches  # noqa: E402
from transit_feed_etl_spark.operators.graph import triangle_count  # noqa: E402
from transit_feed_etl_spark.session import get_spark  # noqa: E402


def star_ring(spark, n: int):
    star = spark.range(1, n + 1).select(F.lit(0).alias("a"), F.col("id").alias("b"))
    ring = spark.range(1, n).select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    return star.unionAll(ring)


def main() -> int:
    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 32000
    spark = get_spark()
    ns = [max_n // 4, max_n // 2, max_n]
    print(f"{'n':>8} {'id-ordered':>12} {'compact-forward':>16}  total triangles")
    for n in ns:
        edges = star_ring(spark, n).persist()
        edges.count()
        row = {}
        for orient in ("id", "degree"):
            best = float("inf")
            total = -1
            for _ in range(2):
                t0 = time.monotonic()
                total = (
                    triangle_count(edges, orient=orient)
                    .agg(F.sum("n_tri"))
                    .collect()[0][0]
                )
                best = min(best, time.monotonic() - t0)
                release_caches()
            row[orient] = (best, total)
        edges.unpersist()
        assert row["id"][1] == row["degree"][1] == 3 * (n - 1), row
        print(
            f"{n:>8} {row['id'][0]:>11.2f}s {row['degree'][0]:>15.2f}s"
            f"  {row['id'][1]} (= 3*(n-1): each of the n-1 triangles at 3 nodes)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
