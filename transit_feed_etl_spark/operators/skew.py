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


def salted_grouped_topk(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence,
    k: int,
    n_salts: int = 16,
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact, skew-proof top-k per group (row_number <= k semantics).

    The direct window plan — row_number() over (partition by keys order
    by ...) — shuffles EVERY row of a group to one reducer task and
    sorts it there; at 100 TB one hot group (a dominant status, a viral
    key) makes that task the straggler. Salting fixes it in two levels:

    Level 1: rank within (keys, pmod(xxhash64(all columns), n_salts))
             and keep rank <= k  — a hot group's sort spreads over
             n_salts tasks; survivors are bounded at n_salts * k rows
             per group (local top-k dominates the k global winners of
             any single salt bucket by transitivity of the total order).
    Level 2: rank the n_salts*k survivors within (keys) — a tiny sort.

    Exactness needs `order_cols` to be a TOTAL order (include a unique
    tie-breaker), otherwise rows equal under the ordering could rank
    differently than the single-window form. The salt hashes all
    columns so duplicates of one row co-locate deterministically.

    Result is identical to the plain window form; both shuffles carry
    at most the level-1 survivors into level 2.
    """
    from pyspark.sql import Window as W

    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).alias("_salt")
    w1 = W.partitionBy(*key_cols, "_salt").orderBy(*order_cols)
    survivors = (
        df.select("*", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_salt", "_rn1")
    )
    w2 = W.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
