"""As-of join operator (SURVEY.md §2 Part B "joins — as-of / interval").

Spark has no native as-of join; the scalable construction is the
union-and-carry-forward trick: tag both sides, sort within the key
partition by (ts, side, id), and carry the right side's payload forward
with last_value(ignoreNulls). One shuffle on the key — no range
explosion, no per-group Python. This beats `pd.merge_asof`-per-group
(applyInPandas) at scale because state never leaves the JVM.

Tie policy (matches the oracle formulation): at equal ts the right-side
row is visible to the left-side row, and among equal-ts right rows the
largest id wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    right_payload: tuple[str, ...] = (),
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts for the same `on` key.

    Output: all left columns (id aliased `left_id`) + `asof_<right_id>` +
    `asof_<payload>` columns (NULL when no prior right row exists).
    """
    r = right.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_id).alias("_rid"),
        *[F.col(c).alias(f"_rp_{c}") for c in right_payload],
        F.lit(None).cast("long").alias("_lid"),
    )
    l = left.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rid"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rp_{c}") for c in right_payload],
        F.col(left_id).cast("long").alias("_lid"),
    )
    u = r.unionByName(l)
    w = (
        W.partitionBy(on)
        .orderBy("_ts", "_side", "_rid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    def carry(c: str) -> Column:
        return F.last(F.col(c), ignorenulls=True).over(w)

    out = u.select(
        F.col(on),
        "_ts",
        "_side",
        "_lid",
        carry("_rid").alias(f"asof_{right_id}"),
        *[carry(f"_rp_{c}").alias(f"asof_{c}") for c in right_payload],
    )
    return out.filter(F.col("_side") == 1).select(
        F.col("_lid").alias(left_id),
        F.col(on),
        F.col("_ts").alias(ts_col),
        f"asof_{right_id}",
        *[f"asof_{c}" for c in right_payload],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    right_payload: tuple[str, ...] = (),
) -> DataFrame:
    """Forward as-of: for each left row, attach the EARLIEST right row
    with right.ts >= left.ts for the same `on` key (NULL when no later
    right row exists). Same union-and-carry construction as the
    backward join, mirrored: the carry runs over the FOLLOWING frame
    with first(ignorenulls), and at equal timestamps the right row
    sorts after the left row (side DESC) so the inclusive >= holds.
    One shuffle on the key; no range explosion; state stays in the JVM
    window operator."""
    r = right.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_id).alias("_rid"),
        *[F.col(c).alias(f"_rp_{c}") for c in right_payload],
        F.lit(None).cast("long").alias("_lid"),
    )
    l = left.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rid"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rp_{c}") for c in right_payload],
        F.col(left_id).cast("long").alias("_lid"),
    )
    u = r.unionByName(l)
    w = (
        W.partitionBy(on)
        .orderBy("_ts", F.desc("_side"), "_rid")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )

    def carry(c: str) -> Column:
        return F.first(F.col(c), ignorenulls=True).over(w)

    out = u.select(
        F.col(on),
        "_ts",
        "_side",
        "_lid",
        carry("_rid").alias(f"asof_{right_id}"),
        *[carry(f"_rp_{c}").alias(f"asof_{c}") for c in right_payload],
    )
    return out.filter(F.col("_side") == 1).select(
        F.col("_lid").alias(left_id),
        F.col(on),
        F.col("_ts").alias(ts_col),
        f"asof_{right_id}",
        *[f"asof_{c}" for c in right_payload],
    )
