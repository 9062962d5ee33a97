"""Skew-mitigation operators: salted two-phase aggregation.

Spark's hash aggregation already neutralizes key skew for combinable
aggregates (count/sum/min/max get map-side partial aggregation, so a hot
key arrives at its reducer pre-reduced). The aggregates that DON'T
combine are the skew hazards:

- COUNT(DISTINCT x): the standard plan expands to a two-key aggregation
  whose first shuffle carries every (key, x) pair of the hot key to ONE
  reducer partition — at 100 TB a single hot key (one dominant
  event_type, one viral document) OOMs or straggles that task.
- collect_list / exact percentiles: same shape.

`salted_count_distinct` makes the distinct exact AND skew-free by
salting on a hash of the DISTINCT column, not a random number: every
occurrence of value x lands in exactly one of n_salts buckets, so
per-(key, salt) distinct counts are disjoint and their per-key SUM is
the exact global distinct count. The hot key's distinct work is then
spread over n_salts reducer tasks. Both shuffles carry pre-reduced
rows (phase 1 is itself a combinable distinct-aggregation per bucket).

A random salt would be WRONG for distinct (the same value could be
counted in several buckets); hash-salting is what makes this exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    key_cols: Sequence[str],
    distinct_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact, skew-proof COUNT(DISTINCT distinct_col) GROUP BY key_cols.

    Phase 1: groupBy(keys + pmod(xxhash64(distinct_col), n_salts))
             countDistinct(distinct_col)   -- disjoint by construction
    Phase 2: groupBy(keys) sum(partial)

    n_salts bounds the per-task distinct-set size at roughly
    |distinct values of the hottest key| / n_salts; raise it with scale
    (it only adds phase-2 rows, n_keys x n_salts of them).
    """
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts)).alias("_salt")
    phase1 = df.groupBy(*key_cols, salt).agg(
        F.countDistinct(distinct_col).alias("_partial")
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias(out_col))
