"""Dedup operator tests: LSH recall vs the exact Jaccard join, SimHash
determinism and Hamming-pair semantics.

The LSH pipelines are not oracle-checkable (xxhash64 bucket membership is
engine-specific), so their correctness contract is a *property*: every pair
the exact join finds at the threshold must be found by the approximate
path too (the testdata's near-dups sit at Jaccard >= 0.9 where the
16-band/4-row s-curve is ~1.0).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table_par
from transit_feed_etl_spark.operators import minhash as MH
from transit_feed_etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


def test_minhash_lsh_recall_vs_exact(spark):
    exact = _pairs(QUERIES["neardup_jaccard_pairs"].builder(spark, SF_DIR))
    approx = _pairs(QUERIES["minhash_lsh_candidates"].builder(spark, SF_DIR))
    assert exact, "testdata should contain near-dup pairs"
    missed = exact - approx
    assert not missed, f"LSH missed {len(missed)}/{len(exact)} exact pairs"
    # and no false positives survive the exact-Jaccard verification step
    assert approx <= exact


def test_minhash_jaccard_values_match_exact(spark):
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in QUERIES["neardup_jaccard_pairs"].builder(spark, SF_DIR).collect()
    }
    approx = {
        (r.id_a, r.id_b): r.jaccard
        for r in QUERIES["minhash_lsh_candidates"].builder(spark, SF_DIR).collect()
    }
    for pair, j in approx.items():
        assert abs(j - exact[pair]) < 1e-9  # verification recomputes exact J

    # and every reported pair clears the threshold
    assert all(j >= 0.35 for j in approx.values())


def test_simhash_deterministic(spark):
    # the raw xx fingerprints live on the operator; the registered query
    # exposes the bound-style audit shape since the r12 promotion
    fps = lambda: MH.simhash(  # noqa: E731
        table_par(spark, SF_DIR, "documents"), id_col="doc_id", text_col="text"
    ).orderBy("doc_id").collect()
    a, b = fps(), fps()
    assert [(r.doc_id, r.simhash) for r in a] == [(r.doc_id, r.simhash) for r in b]
    assert len(a) == table_par(spark, SF_DIR, "documents").count()
    # and the promoted query's guarantee booleans hold on real data
    rows = QUERIES["simhash_fingerprints"].builder(spark, SF_DIR).collect()
    assert rows and all(r.dup_consistent and r.n_tokens_match for r in rows)


def test_simhash_near_dups_have_small_hamming(spark):
    """Exact near-dup pairs (Jaccard >= 0.35) should sit at a visibly
    smaller SimHash Hamming distance than random pairs."""
    fps = MH.simhash(
        table_par(spark, SF_DIR, "documents"), id_col="doc_id", text_col="text"
    )
    exact = QUERIES["neardup_jaccard_pairs"].builder(spark, SF_DIR)
    fa, fb = fps.alias("fa"), fps.alias("fb")
    ham = F.bit_count(F.col("fa.simhash").bitwiseXOR(F.col("fb.simhash")))
    dup_ham = (
        exact.join(fa, F.col("id_a") == F.col("fa.doc_id"))
        .join(fb, F.col("id_b") == F.col("fb.doc_id"))
        .agg(F.avg(ham).alias("avg_ham"))
        .collect()[0]
        .avg_ham
    )
    assert dup_ham is not None and dup_ham < 16  # random 64-bit pairs average 32


def test_simhash_pairs_pigeonhole(spark):
    """simhash_pairs at max_hamming=3 must find every pair whose true
    Hamming distance is <= 3 (pigeonhole over 4x16-bit chunks is exact)."""
    fps = MH.simhash(
        table_par(spark, SF_DIR, "documents"), id_col="doc_id", text_col="text"
    ).cache()
    got = {
        (r.id_a, r.id_b)
        for r in MH.simhash_pairs(fps, max_hamming=3).collect()
    }
    fa, fb = fps.alias("fa"), fps.alias("fb")
    ham = F.bit_count(F.col("fa.simhash").bitwiseXOR(F.col("fb.simhash")))
    want = {
        (r.id_a, r.id_b)
        for r in fa.join(
            fb, F.col("fa.doc_id") < F.col("fb.doc_id")
        )
        .filter(ham <= 3)
        .select(
            F.col("fa.doc_id").alias("id_a"), F.col("fb.doc_id").alias("id_b")
        )
        .collect()
    }
    assert got == want


def test_prefix_filter_prunes_candidates(spark, sf_dir):
    """The prefix principle's efficiency claim: the prefix self-join
    generates strictly fewer candidate pairs than the naive all-shingle
    self-join, while the verified output is identical (identity is
    pinned by the shared oracle in test_oracle_parity)."""
    from pyspark.sql import Window as W

    from transit_feed_etl_spark.io import table
    from transit_feed_etl_spark.operators import textfns as TX

    d = table(spark, sf_dir, "documents")
    sh = (
        d.select("doc_id", F.array_distinct(TX.word_shingles(TX.tokens("text"), 3)).alias("sh"))
        .filter(F.size("sh") > 0)
        .persist()
    )
    e = sh.select("doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s"))

    def pairs(rel):
        a, b = rel.alias("a"), rel.alias("b")
        return (
            a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id"), F.col("b.doc_id"))
            .distinct()
            .count()
        )

    naive = pairs(e.select("doc_id", "s"))
    freq = e.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    ranked = e.join(freq, "s").withColumn(
        "pos", F.row_number().over(W.partitionBy("doc_id").orderBy("df", "s"))
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.ceil(F.lit(0.35) * F.col("n")) + 1
    ).select("doc_id", "s")
    pruned = pairs(prefix)
    sh.unpersist()
    assert pruned * 2 < naive, (pruned, naive)  # ~4x observed


def test_connected_components_chain_and_cliques(spark):
    """A~B~C chains collapse transitively; separate cliques stay apart;
    labels are component minima."""
    from transit_feed_etl_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: r["label"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_diameter_guard(spark):
    from transit_feed_etl_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    # 7-node path: min-label needs ~6 rounds; max_iter=2 must refuse
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    got = {r["node"]: r["label"] for r in connected_components(chain).collect()}
    assert set(got.values()) == {0}


def test_dedup_clusters_consistent_with_pairs(spark):
    """Every near-dup pair must land in one cluster, and every cluster
    member must reach its canonical through pair edges (size >= 2)."""
    clusters = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in QUERIES["dedup_clusters"].builder(spark, SF_DIR).collect()
    }
    pair_rows = QUERIES["neardup_jaccard_pairs"].builder(spark, SF_DIR).collect()
    assert pair_rows and clusters
    for r in pair_rows:
        assert clusters[r.id_a][0] == clusters[r.id_b][0], (r.id_a, r.id_b)
    assert all(size >= 2 for _, size in clusters.values())
    assert all(canon in clusters for canon, _ in clusters.values())
