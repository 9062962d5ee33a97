"""Prefix-filtered exact set-similarity join (EXT; the standard scalable
construction from the string-similarity-join literature — see PAPERS.md,
"Highly Efficient String Similarity Search and Join over Compressed
Indexes", ICDE 2022; the prefix principle itself is the classic
Chaudhuri/Bayardo AllPairs result).

Exact counterpart to MinHash-LSH (operators/minhash.py): recall is 1.0
BY CONSTRUCTION, not probabilistically. Prefix principle: order every
set by one global total order; if J(A,B) >= t, then A and B must share
an element within the first |X| - ceil(t*|X|) + 1 elements of each
(else the remaining suffixes are too short to reach the required
overlap). So the candidate join runs on PREFIXES only — with rare-first
(ascending global frequency) order, the hot shingles that drive the
quadratic blow-up of the naive self-join land in the suffixes and never
join. Candidate volume drops from sum-over-shingles(df^2) to
sum-over-prefix-shingles(df^2); exact Jaccard then verifies candidates.

All Catalyst: one aggregate for global frequencies, one window for
per-doc prefix ranking, one equi self-join on prefix shingles, one
verification join. Every shuffle key is a shingle or doc id — no
payload shuffling, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def jaccard_prefix_pairs(
    shingle_sets: DataFrame,
    id_col: str = "_id",
    set_col: str = "_sh",
    threshold: float = 0.35,
) -> DataFrame:
    """(id_a, id_b, jaccard) for all pairs with Jaccard >= threshold —
    exact, via prefix filtering.

    ``shingle_sets``: one row per doc, ``set_col`` an array of DISTINCT
    shingles. Returns id_a < id_b; jaccard rounded to 6 places (matches
    the oracle formulation in queries/dedup.py).
    """
    sh = shingle_sets.select(
        F.col(id_col).alias("_id"), F.col(set_col).alias("_sh")
    ).filter(F.size("_sh") > 0)

    # Hash each shingle to 8 bytes up front: the frequency aggregate,
    # the rank join, and the candidate self-join all shuffle hashes
    # instead of shingle STRINGS (~5-10x less shuffle volume at sf0.1,
    # measured 25s -> ~8s for the pair stage). Safe: a hash collision
    # can only ADD a candidate pair, and every candidate passes exact
    # string-set verification below — recall stays 1.0, precision is
    # restored by the verify join. The rare-first order becomes
    # (_df, _h), still a total order per doc (shingles are distinct;
    # an in-doc hash collision could tie, which at worst lengthens the
    # effective prefix by one — again recall-safe).
    e = sh.select(
        "_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_s")
    ).select("_id", "_n", F.xxhash64("_s").alias("_h"))
    freq = e.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    ranked = e.join(freq, "_h").withColumn(
        "_pos", F.row_number().over(W.partitionBy("_id").orderBy("_df", "_h"))
    )
    # epsilon guards double rounding in t*n: if the product lands an ulp
    # above the true integer, ceil would overshoot and shorten the prefix,
    # silently dropping pairs. Erring long only adds candidates — recall
    # stays 1.0 by construction.
    prefix = ranked.filter(
        F.col("_pos")
        <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n") - F.lit(1e-9)) + 1
    ).select("_id", "_h", "_pos", "_n")
    # The self-join below reads this relation twice and Catalyst does
    # not reuse the exchange across the two aliases; snapshot once.
    prefix = prefix.localCheckpoint()

    a, b = prefix.alias("a"), prefix.alias("b")
    na, nb = F.col("a._n"), F.col("b._n")
    # PPJoin-style exact pruning (Xiao et al., WWW 2008) on top of the
    # prefix join — both filters only discard pairs that provably cannot
    # reach Jaccard >= t, so recall stays 1.0:
    # - length filter: J(A,B) >= t forces t*|A| <= |B| (and vice versa);
    # - position filter: J >= t forces overlap >= ceil(t/(1+t)*(|A|+|B|)),
    #   and a match at prefix positions (pa, pb) bounds the achievable
    #   overlap by 1 + min(|A|-pa, |B|-pb). On a repetitive corpus this
    #   is the difference between ~580k and ~20k candidates at sf0.1:
    #   candidate volume, not the verify cost per pair, is what explodes
    #   at 100 TB.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (na + nb) - F.lit(1e-9)
    )
    ubound = F.lit(1) + F.least(na - F.col("a._pos"), nb - F.col("b._pos"))
    cand = (
        a.join(
            b,
            (F.col("a._h") == F.col("b._h"))
            & (F.col("a._id") < F.col("b._id"))
            & (nb >= F.lit(threshold) * na - F.lit(1e-9))
            & (na >= F.lit(threshold) * nb - F.lit(1e-9))
            & (ubound >= alpha),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )

    # Spread candidates across the cluster BEFORE the verify join: the
    # candidate relation is byte-tiny (two longs per row) so AQE
    # coalesces it into a handful of partitions, but each row carries an
    # expensive downstream array_intersect — AQE sizes partitions by
    # BYTES, not downstream cost, and the verify stage was measured
    # running on a single core because of it (4.3s -> 1.0s at sf0.1
    # from this repartition alone).
    cand = cand.repartition(sh.sparkSession.sparkContext.defaultParallelism)

    pa, pb = sh.alias("pa"), sh.alias("pb")
    n_inter = F.size(F.array_intersect(F.col("pa._sh"), F.col("pb._sh")))
    n_union = F.size(F.col("pa._sh")) + F.size(F.col("pb._sh")) - n_inter
    jac = n_inter.cast("double") / n_union
    return (
        cand.join(pa, F.col("id_a") == F.col("pa._id"))
        .join(pb, F.col("id_b") == F.col("pb._id"))
        .filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )
