"""Tracked persistence for multi-reference query plans.

Several operators (MinHash signatures, shingle sets, IVF assignments)
persist an intermediate relation that is referenced by 3-4 downstream
plan branches — without materialization Spark would recompute the whole
tokenize/shingle/aggregate subtree per reference. The query builders are
lazy, so they cannot unpersist before their caller materializes the
result; in a long-lived session (the driver runs every registered query
in one SparkSession) untracked persists would accumulate.

``persist_tracked`` registers every such cache; ``release_caches()``
unpersists them all. ``bench.py`` and the test harness call it after
each query's action completes. MEMORY_AND_DISK + Spark's LRU eviction
bound the damage even if a caller forgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() that registers the frame for later release_caches()."""
    out = df.persist(level)
    _TRACKED.append(out)
    return out


def release_caches() -> int:
    """Unpersist every tracked cache (blocking=False); returns count."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
