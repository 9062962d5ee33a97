"""Distributed graph analytics over edge-list DataFrames: PageRank by
power iteration. Complements operators/components.py (connected
components) — together they cover the two graph primitives a curation
pipeline actually runs at scale: dedup clustering (CC) and
authority/quality scoring (PageRank, the classic web-corpus quality
prior used when weighting crawl data for pretraining).

Scale design:
- The edge relation is the big thing; it is repartitioned on `src` ONCE
  and persisted, so every power iteration's rank join reuses that
  partitioning instead of re-shuffling |E| rows per round. Per
  iteration the moving data is only the rank vector (|V| rows): one
  shuffle to co-locate ranks with edges, one to group contributions by
  dst — the canonical Spark PageRank cost model.
- Iteration count is a fixed small constant (power iteration converges
  geometrically at rate `damping`); the loop persists each rank frame
  and releases the previous one, keeping lineage and cache bounded.

Determinism (the registry's differential-oracle contract): per-edge
contributions rank/degree are cast to DECIMAL(38,30) before the SUM, so
the aggregate is exact and partition-order-independent; the only double
operations per iteration are one division (rank/degree), one multiply
(damping * sum) and one add (teleport + damped mass) — each a single
IEEE operation an unrolled SQL oracle reproduces bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transit_feed_etl_spark.caching import persist_tracked


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list (pass a symmetrized list for
    an undirected graph). Every node must have out-degree >= 1 (true by
    construction for symmetrized edges); the node set is the distinct
    `src` set. Returns (node, rank) with full-precision double ranks.
    """
    e = persist_tracked(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).repartition("src"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # |V| as a 1-row broadcast anchor (never collected at the driver)
    nn = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = persist_tracked(
        deg.crossJoin(F.broadcast(nn)).select(
            "src", (F.lit(1.0) / F.col("n")).alias("rank")
        )
    )
    # static (src, dst, deg) relation reused by every iteration
    out = persist_tracked(e.join(deg, "src"))
    for _ in range(iters):
        contrib = (F.col("rank") / F.col("deg")).cast("decimal(38,30)")
        new_ranks = (
            out.join(ranks, "src")
            .groupBy("dst")
            .agg(F.sum(contrib).alias("mass"))
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("dst").alias("src"),
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.col("mass").cast("double")
                ).alias("rank"),
            )
        )
        prev, ranks = ranks, persist_tracked(new_ranks)
        ranks.count()  # materialize before dropping the parent cache
        prev.unpersist()
    return ranks.select(F.col("src").alias("node"), "rank")
