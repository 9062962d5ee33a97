"""Distributed linear-model training over DataFrames: batch perceptron.

The training loop a curation pipeline runs to fit a lightweight quality
classifier ON the cluster (fastText-style role). Each round is one
corpus pass: margins evaluated map-side against the broadcast weight
row, misclassified-set gradient accumulated as d partial-aggregated
DECIMAL sums (the shuffle carries d decimal values per partition —
nothing corpus-sized moves), weights updated in a 1-row localCheckpoint.

Why a perceptron and not logistic regression: the trajectory must be
bit-identical to an unrolled-SQL oracle, and Java's Math.exp is allowed
1 ulp vs DuckDB's libm (measured: EXP(-7.25) differs in the last bit),
so a sigmoid would drift. Multiply/add/compare only — every round
replays exactly under the registry's DECIMAL-sum contract, the same
determinism design as PageRank/k-means/PCA power iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_perceptron(
    feats: DataFrame,
    n_features: int,
    rounds: int = 3,
    lr0: float = 0.5,
) -> DataFrame:
    """Train on (y, x0..x{n-1}) with learning rate lr0/round (the
    standard decaying schedule); y in {-1.0, +1.0}. Returns the full
    trajectory: one row per round with the PRE-update misclassification
    count and the POST-update FLOOR-scaled weights (round, n_misclassified,
    w{j}_e9...)."""
    spark = feats.sparkSession
    n_anchor = feats.agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(n_features)]
    )
    out_rows = []
    for r in range(rounds):
        lr = lr0 / (r + 1)
        margin = None
        for j in range(n_features):
            term = F.col(f"w{j}") * F.col(f"x{j}")
            margin = term if margin is None else margin + term
        mis = F.col("y") * margin <= 0
        g = (
            feats.crossJoin(F.broadcast(w))
            .select(
                mis.alias("_mis"),
                *[
                    F.when(mis, F.col("y") * F.col(f"x{j}"))
                    .otherwise(F.lit(0.0))
                    .cast("decimal(25,15)")
                    .alias(f"_g{j}")
                    for j in range(n_features)
                ],
            )
            .agg(
                F.count_if("_mis").alias("mis"),
                *[
                    F.sum(f"_g{j}").cast("double").alias(f"g{j}")
                    for j in range(n_features)
                ],
            )
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .crossJoin(F.broadcast(n_anchor))
            .select(
                *[
                    (
                        F.col(f"w{j}")
                        + (F.lit(lr) * (F.col(f"g{j}") / F.col("n")))
                    ).alias(f"w{j}")
                    for j in range(n_features)
                ],
                F.col("mis"),
            )
            .localCheckpoint()  # 1 row per round; flat plans
        )
        out_rows.append(
            w.select(
                F.lit(r + 1).alias("round"),
                F.col("mis").cast("bigint").alias("n_misclassified"),
                *[
                    F.floor(F.col(f"w{j}") * 1e9)
                    .cast("bigint")
                    .alias(f"w{j}_e9")
                    for j in range(n_features)
                ],
            )
        )
        w = w.drop("mis")
    out = out_rows[0]
    for o in out_rows[1:]:
        out = out.unionByName(o)
    return out.orderBy("round")
