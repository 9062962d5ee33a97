"""Bucketed-table layout: co-located, shuffle-free joins and aggregations.

The reference's only physical-layout decision is its time-partitioned
directory tree (reference gtfs_rt_assets.py:136-138 — partition pruning).
Bucketing is the second axis a 100 TB deployment needs: hash-distribute
each table into a fixed number of buckets on its join key at WRITE time,
and every subsequent equi-join or groupBy on that key runs with ZERO
exchanges — the dominant cost of fact-fact joins at scale is the shuffle,
and bucketing pays it once, at ingest, instead of per query.

Design rules encoded here:
- bucket count is a power of two sized so one bucket of the larger fact
  fits comfortably in executor memory (buckets are the unit of task
  parallelism for bucketed scans);
- both sides of a recurring join use the SAME bucket count and key so
  Catalyst plans SortMergeJoin/ShuffledHashJoin with no Exchange on
  either side (`spark.sql.sources.bucketing.enabled`, on by default);
- sortBy within buckets makes the merge phase of SortMergeJoin a pure
  streaming merge (no per-task sort).

Bucketed tables must go through the session catalog (``saveAsTable``) —
bucket metadata lives in the metastore, not in parquet footers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted) catalog
    table. Joins/aggregations keyed on ``bucket_cols`` against another
    table with the same bucketing then need no shuffle."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key.

    With matching bucket specs this plans with no Exchange on either side
    (asserted in tests/test_plans.py); at 100 TB that removes the two
    largest shuffles in the pipeline. The join itself is a plain
    DataFrame join — co-location is a property of the tables, not the
    query."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
