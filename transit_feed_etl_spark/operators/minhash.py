"""MinHash-LSH and SimHash near-duplicate operators (EXT, north star).

Pure-Catalyst implementations (xxhash64 + higher-order array functions —
no Python in the hot path). The LSH construction is the standard banding
scheme: s-curve probability 1-(1-j^r)^b of a pair at Jaccard j becoming a
candidate, with r rows/band and b bands.

Scale analysis (100 TB): the exact all-pairs Jaccard join explodes every
shingle (shuffle volume = total shingles, pair volume worst-case
quadratic in docs-per-shingle). LSH bounds the shuffle at
docs x bands rows of (band_key, doc_id) and only candidate pairs pay the
verification join; the signature computation itself is a single
groupBy(doc) over exploded shingles with 64 min() partial aggregates —
map-side combinable, linear, skew-free (band keys are hashes).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transit_feed_etl_spark.caching import persist_tracked
from transit_feed_etl_spark.operators import textfns as TX


def minhash_signature(
    docs: DataFrame, id_col: str, text_col: str, n_hashes: int = 64
) -> DataFrame:
    """(id, shingle-set, signature array) — one row per doc that has at
    least one shingle (shorter docs cannot be near-dup candidates).

    Signature k = MIN over shingles of xxhash64(k, shingle). Computed as
    n_hashes partial-aggregatable min() columns over the exploded shingle
    relation: one shuffle keyed on doc id.
    """
    # Hash-partition by doc id BEFORE tokenizing: everything downstream
    # (shingle projection, explode, the 64-min aggregation, and the
    # sh-to-sig join) is then already partitioned on the grouping/join key,
    # so the wide partial-agg shuffle (32 partitions x n_docs groups x 64
    # buffer columns) disappears — the groupBy and the join both reuse this
    # one exchange of raw text. At 100 TB that swaps an O(docs x 64 x
    # partitions) signature shuffle for an O(text) one.
    par = docs.sparkSession.sparkContext.defaultParallelism
    docs = docs.repartition(par, F.col(id_col))
    # Two-step projection: tokens FIRST as a named column, shingles over
    # the attribute. Inlining tokens() into word_shingles() would embed the
    # tokenizer expression inside the transform lambda's element_at calls,
    # re-tokenizing the document once per shingle element (~100x blowup,
    # measured 13s -> 3.5s for 5k docs). CollapseProject keeps the steps
    # separate because the alias is multi-referenced and non-cheap.
    toks = docs.select(F.col(id_col).alias("_id"), TX.tokens(text_col).alias("_toks"))
    sh = toks.select(
        "_id",
        F.array_distinct(TX.word_shingles(F.col("_toks"), 3)).alias("_sh"),
    )
    # Inner explode drops empty arrays natively — no size() pre-filter,
    # which would force a second evaluation of the shingle expression.
    # Hash each shingle STRING exactly once; permutation k then re-hashes
    # the fixed-width 8-byte value (xxhash64(k, h) is a perfectly good
    # hash family for MinHash). Hashing the variable-length string per
    # permutation costs ~3x more in the 64-min aggregation (measured
    # 0.81s -> 0.27s at sf0.1).
    exploded = sh.select("_id", F.explode("_sh").alias("_s")).withColumn(
        "_h", F.xxhash64("_s")
    )
    # ONE aggregation recovers both the shingle set (collect_set) and the
    # 64 mins — a join back to the un-exploded relation would recompute
    # the whole tokenize+shingle branch a second time (ReuseExchange is
    # defeated by the join's inferred isnotnull filter; verified in the
    # physical plan). Docs with zero shingles (< n tokens) are absent by
    # construction — they cannot be near-dup candidates.
    mins = [
        F.min(F.xxhash64(F.lit(k), F.col("_h"))).alias(f"_h{k}")
        for k in range(n_hashes)
    ]
    return (
        exploded.groupBy("_id")
        .agg(F.collect_set("_s").alias("_sh"), *mins)
        .select("_id", "_sh", F.array(*[f"_h{k}" for k in range(n_hashes)]).alias("_sig"))
    )


def lsh_band_keys(n_hashes: int, bands: int) -> Column:
    """Array of per-band bucket keys over a `_sig` signature column:
    band b's key hashes its rows_per_band signature slots under a
    band-salted xxhash64. Shared by the batch pipeline below and the
    incremental twin (queries/dedup.py::incremental_lsh_rounds) so the
    two build byte-identical bucket keys."""
    rows_per_band = n_hashes // bands
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[
                    F.element_at("_sig", b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.35,
    n_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate generation via banded LSH + exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    if n_hashes % bands != 0:
        raise ValueError("bands must divide n_hashes")

    # The signature relation feeds the band self-join (2 plan references)
    # AND both sides of the verification join (2 more). Without
    # materialization Spark recomputes the whole tokenize+shingle+64-agg
    # subtree per reference (measured 60s vs 9s at sf0.1). persist() is the
    # cluster-correct answer too: signatures are ~n_docs x (64x8B + shingle
    # set) — MEMORY_AND_DISK spills gracefully at 100 TB scale. Tracked:
    # callers release via caching.release_caches() after materializing.
    sigs = persist_tracked(minhash_signature(docs, id_col, text_col, n_hashes))

    e = sigs.select("_id", lsh_band_keys(n_hashes, bands).alias("_bk")).select(
        "_id", F.posexplode("_bk").alias("_band", "_bkey")
    )
    a, b = e.alias("a"), e.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bkey") == F.col("b._bkey"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sh = sigs.select("_id", "_sh")
    pa, pb = sh.alias("pa"), sh.alias("pb")
    n_inter = F.size(F.array_intersect(F.col("pa._sh"), F.col("pb._sh")))
    n_union = F.size(F.col("pa._sh")) + F.size(F.col("pb._sh")) - n_inter
    jac = n_inter.cast("double") / n_union
    return (
        candidates.join(pa, F.col("id_a") == F.col("pa._id"))
        .join(pb, F.col("id_b") == F.col("pb._id"))
        .filter(n_union > 0)
        .filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def portable_hash60(col: Column) -> Column:
    """60-bit token hash computable IDENTICALLY in Spark and DuckDB:
    the first 15 hex chars of md5, parsed as an integer. Spark:
    conv(substring(md5(x),1,15),16,10); DuckDB:
    CAST(CONCAT('0x', SUBSTR(md5(x),1,15)) AS UBIGINT). Both engines
    produce the same lowercase-hex md5, so the value matches bit-for-bit
    — this is what makes `simhash_portable` fully oracle-checkable where
    the xxhash64 variant cannot be (xxhash64 has no DuckDB equivalent
    and tokens are data, so the constants cannot be folded)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    hash_fn=F.xxhash64,
    n_bits: int = 64,
) -> DataFrame:
    """n_bits-wide SimHash fingerprint per document from distinct tokens.

    Bit j of the fingerprint is the sign of sum over tokens of
    (+1 if bit j of hash_fn(token) else -1). Implemented as n_bits
    conditional-sum aggregates over the exploded token relation —
    partial-aggregatable, one shuffle on doc id. hash_fn defaults to
    xxhash64 (fastest, engine-specific); pass `portable_hash60` with
    n_bits=60 for the cross-engine-checkable variant.
    """
    # Same pre-partitioning trick as minhash_signature: group-by-id needs
    # no exchange when the token explode already sits on hash(doc_id).
    par = docs.sparkSession.sparkContext.defaultParallelism
    docs = docs.repartition(par, F.col(id_col))
    toks = docs.select(F.col(id_col).alias("doc_id"), TX.tokens(text_col).alias("_t0")).select(
        "doc_id", F.array_distinct("_t0").alias("_t")
    )
    e = toks.select("doc_id", F.explode("_t").alias("_tok")).withColumn(
        "_h", hash_fn(F.col("_tok"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{j}")
        for j in range(n_bits)
    ]
    # Single-pass aggregation: count(1) over the exploded DISTINCT tokens
    # equals size(_t), so no join back to the token relation is needed
    # (that join would re-tokenize every document a second time).
    # Token-less docs are absent — they carry no SimHash signal.
    agg = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"), *votes)
    bits: list[Column] = [
        F.when(F.col(f"_v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
        for j in range(n_bits)
    ]
    fingerprint = reduce(lambda x, y: x.bitwiseOR(y), bits)
    return agg.select("doc_id", fingerprint.alias("simhash"), F.col("n_tokens").cast("int").alias("n_tokens"))


def simhash_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    n_chunks: int = 4,
    chunk_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole banding on n_chunks x
    chunk_bits-bit chunks (any pair within Hamming distance n_chunks-1
    shares at least one exact chunk), then exact popcount(xor)
    verification on candidates only."""
    if max_hamming > n_chunks - 1:
        raise ValueError(
            f"pigeonhole banding with {n_chunks} chunks is only lossless "
            f"for max_hamming <= {n_chunks - 1}, got {max_hamming}"
        )
    mask = (1 << chunk_bits) - 1
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), chunk_bits * c)
            .bitwiseAND(F.lit(mask))
            .alias(f"_c{c}")
            for c in range(n_chunks)
        ]
    )
    e = fingerprints.select(
        F.col("doc_id"), F.col("simhash"), F.posexplode(chunks).alias("_chunk", "_cval")
    )
    a, b = e.alias("a"), e.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a._chunk") == F.col("b._chunk"))
            & (F.col("a._cval") == F.col("b._cval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
