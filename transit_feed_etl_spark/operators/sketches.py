"""Mergeable frequency sketches (EXT, 100 TB heavy-hitters path).

Misra-Gries summaries are the textbook bounded-memory frequent-items
sketch: k counters per partition, pairwise-mergeable with additive error
— after merging P summaries built over N total items, every item's
estimate undercounts its true frequency by at most N/(k+1), so any item
with true count > N/(k+1) is GUARANTEED to survive (no false negatives
above the threshold). That guarantee — not the point estimates — is what
tests/test_properties.py pins against the exact count.

Spark shape: `mapInPandas` builds one summary per input partition
(Arrow-batched, bounded k counters — never a per-item dict of the whole
partition's distinct set), then the P*k summary rows (tiny) reduce on a
single partition with the same algorithm over weighted items. This is
the standard two-level sketch reduction: data-proportional work is all
in stage 1; stage 2 is O(P*k).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_update(counters: dict[str, int], item: str, wt: int, k: int) -> None:
    """Weighted Misra-Gries step. The decrement is capped at the MINIMUM
    tracked counter so every decrement event removes exactly (k+1)*dec
    units of mass — the invariant the N/(k+1) undercount bound rests on
    (an uncapped decrement would discard a heavy incoming item while
    removing little mass from small counters, breaking completeness)."""
    if item in counters:
        counters[item] += wt
        return
    if len(counters) < k:
        counters[item] = wt
        return
    m = min(counters.values())
    dec = min(wt, m)
    for key in list(counters):
        counters[key] -= dec
        if counters[key] <= 0:
            del counters[key]
    if wt > dec:  # room just opened up; track the remainder
        counters[item] = wt - dec


def _summarize_batches(
    batches: Iterator[pd.DataFrame], col: str, wt_col: str | None, k: int
) -> dict[str, int]:
    counters: dict[str, int] = {}
    for pdf in batches:
        items = pdf[col]
        wts = pdf[wt_col] if wt_col else None
        # pre-aggregate the batch (vectorized) so the per-item python loop
        # runs over DISTINCT items of the batch, not every row
        grouped = (
            pd.DataFrame({"i": items, "w": wts if wts is not None else 1})
            .groupby("i")["w"]
            .sum()
        )
        for item, wt in grouped.items():
            _mg_update(counters, item, int(wt), k)
    return counters


def misra_gries_topk(df: DataFrame, col: str, k: int = 32) -> DataFrame:
    """Heavy-hitter candidates for `df[col]` with k counters. Returns
    (item, est_count) where est_count is the merged lower-bound estimate;
    complete for all items with true count > N/(k+1)."""
    out_schema = f"{col} string, est_count long"

    def stage1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = _summarize_batches(batches, col, None, k)
        if counters:
            yield pd.DataFrame(
                {col: list(counters), "est_count": list(counters.values())}
            )

    def stage2(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = _summarize_batches(batches, col, "est_count", k)
        if counters:
            yield pd.DataFrame(
                {col: list(counters), "est_count": list(counters.values())}
            )

    partial = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        stage1, out_schema
    )
    return (
        partial.repartition(1)
        .mapInPandas(stage2, out_schema)
        .orderBy(F.col("est_count").desc(), F.col(col).asc())
    )
