"""Curation-operator contracts beyond oracle parity: packing invariants
and sampling determinism."""

from __future__ import annotations

from collections import defaultdict

from transit_feed_etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_pack_sequences_invariants(spark):
    rows = QUERIES["pack_sequences"].builder(spark, SF_DIR).collect()
    docs = [r["doc_id"] for r in rows]
    assert len(docs) == len(set(docs))  # every doc packed exactly once

    sums = defaultdict(int)
    counts = defaultdict(int)
    for r in rows:
        sums[r["pack_id"]] += r["n_tokens"]
        counts[r["pack_id"]] += 1
        assert r["pack_id"] // 100_000 == r["bucket"]  # packs never span buckets
    for pid, s in sums.items():
        # budget respected, except a single oversized doc alone in a pack
        assert s <= 512 or counts[pid] == 1, (pid, s, counts[pid])

    # packing efficiency: next-fit wastes < 50% capacity on average
    # (every closed pack is by construction > budget/2 full... only when
    # doc sizes <= budget/2; assert the weaker corpus-level bound)
    total_tokens = sum(r["n_tokens"] for r in rows)
    n_packs = len(sums)
    assert n_packs <= -(-total_tokens // 512) * 2 + 8, (n_packs, total_tokens)


def test_hash_sample_stable_and_unbiased(spark):
    rows = QUERIES["hash_sample_documents"].builder(spark, SF_DIR).collect()
    again = QUERIES["hash_sample_documents"].builder(spark, SF_DIR).collect()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in again]  # reproducible
    # ~10% rate, binomial 3-sigma band for n=500
    assert 0.04 <= len(rows) / 500 <= 0.16, len(rows)


def test_stratified_sample_quota_per_stratum(spark):
    rows = QUERIES["stratified_sample_by_lang"].builder(spark, SF_DIR).collect()
    per_lang = defaultdict(list)
    for r in rows:
        per_lang[r["lang"]].append(r["rk"])
    for lang, rks in per_lang.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), lang
        assert len(rks) <= 20


def test_cluster_aware_split_has_zero_cross_split_clusters(spark, sf_dir):
    """Structural invariant: after cluster-aware assignment, no near-dup
    cluster may straddle a split boundary (the leakage the doc-id hash
    split permits)."""
    import pyspark.sql.functions as F

    from transit_feed_etl_spark.io import table_par
    from transit_feed_etl_spark.operators import textfns as TX
    from transit_feed_etl_spark.operators.components import connected_components
    from transit_feed_etl_spark.operators.minhash import portable_hash60
    from transit_feed_etl_spark.operators.prefixfilter import jaccard_prefix_pairs

    d = table_par(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.array_distinct(
            TX.word_shingles(TX.tokens("text"), 3)
        ).alias("sh"),
    ).localCheckpoint()
    pairs = jaccard_prefix_pairs(
        sh, id_col="doc_id", set_col="sh", threshold=0.35
    ).localCheckpoint()
    cc = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("canonical_id")
    )
    canon = d.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("canonical_id", "doc_id").alias("canonical_id")
    )
    h = portable_hash60(F.col("canonical_id").cast("string")) % 100
    split = F.when(h < 90, "train").when(h < 95, "val").otherwise("test")
    straddlers = (
        canon.withColumn("split", split)
        .groupBy("canonical_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddlers == 0


def test_compression_ratio_matches_python_zlib_replay(spark):
    """No SQL oracle can state deflate lengths (DuckDB has no zlib);
    the value contract for the full-fidelity twin is an EXACT
    per-document replay through stdlib zlib — same codec, same level —
    plus ordering sanity. (The driver-checked doc_compression_ratio
    projection carries a bound-style oracle instead.)"""
    import zlib

    import duckdb

    rows = {
        r["doc_id"]: r
        for r in QUERIES["doc_compression_ratio_full"].builder(spark, SF_DIR).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    assert len(rows) == len(docs) > 0
    for doc_id, text in docs:
        raw = (text or "").encode("utf-8")
        comp = zlib.compress(raw, 6)
        r = rows[doc_id]
        assert r["raw_bytes"] == len(raw)
        assert r["deflate_bytes"] == len(comp)
        assert r["ratio_e6"] == len(comp) * 1_000_000 // max(len(raw), 1)

    # ordering sanity: pure repetition compresses far better than the
    # corpus median
    ratios = sorted(r["ratio_e6"] for r in rows.values())
    median = ratios[len(ratios) // 2]
    rep = len(zlib.compress(b"the same line over and over " * 100, 6))
    rep_ratio = rep * 1_000_000 // (28 * 100)
    assert rep_ratio < median


def test_html_extraction_roundtrips_every_document(spark, sf_dir):
    """Value contract for html_boilerplate_extract beyond the
    differential oracle: on the driver corpus EVERY row must certify
    roundtrip_ok (extraction recovered exactly the whitespace-collapsed
    original text — no content eaten with the boilerplate), and the
    removed share must be a sane percentage (shells add real
    boilerplate, so > 0; never the whole page when text is non-empty)."""
    from transit_feed_etl_spark.queries import QUERIES

    rows = QUERIES["html_boilerplate_extract"].builder(spark, sf_dir).collect()
    assert rows and all(r["roundtrip_ok"] for r in rows)
    for r in rows:
        assert 0 < r["boilerplate_pct"] <= 100
        assert r["text_chars"] + r["boilerplate_pct"] >= 0  # schema sanity
        if r["text_chars"] > 0:
            assert r["boilerplate_pct"] < 100


def test_snapshot_diff_statuses_match_the_shim_predicates(spark):
    """Value contract for corpus_snapshot_diff beyond the differential
    oracle: the testdata shim makes each status a pure doc_id
    predicate — added = only-in-B (doc_id % 3 == 0), removed =
    only-in-A (doc_id % 3 == 1), changed = in both AND modified
    (doc_id % 3 == 2 and % 7 == 0) — and unchanged docs must not
    appear at all."""
    rows = QUERIES["corpus_snapshot_diff"].builder(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        seen.add(r["doc_id"])
        if r["status"] == "added":
            assert r["doc_id"] % 3 == 0 and r["old_md5"] is None
        elif r["status"] == "removed":
            assert r["doc_id"] % 3 == 1 and r["new_md5"] is None
        else:
            assert r["status"] == "changed"
            assert r["doc_id"] % 3 == 2 and r["doc_id"] % 7 == 0
            assert r["old_md5"] != r["new_md5"]
    # every unchanged doc (in both snapshots, not modified) is absent
    import duckdb

    unchanged = {
        x[0]
        for x in duckdb.connect()
        .execute(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet' "
            "WHERE doc_id % 3 = 2 AND doc_id % 7 <> 0"
        )
        .fetchall()
    }
    assert not (seen & unchanged)


def test_epoch_training_order_copies_and_order_are_lawful(spark):
    """Value contracts for epoch_training_order beyond the oracle:
    per-doc copies form exactly 1..n_copies with n_copies <= cap+1;
    the emitted rows are sorted by (order_key, doc_id, copy_idx); two
    builds are identical (no RNG anywhere); and for a domain whose
    integral epoch count is zero, the copy-holders are exactly the
    mixture query's accepted docs (the fractional epoch IS the
    mixture's acceptance test — the law tying the two stages)."""
    from transit_feed_etl_spark.queries.cleaning import _EPOCH_CAP

    rows = QUERIES["epoch_training_order"].builder(spark, SF_DIR).collect()
    assert rows
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append(r)
        assert 1 <= r["n_copies"] <= _EPOCH_CAP + 1
    for doc, rs in per_doc.items():
        idxs = sorted(x["copy_idx"] for x in rs)
        assert idxs == list(range(1, rs[0]["n_copies"] + 1)), (doc, idxs)
    keys = [(r["order_key"], r["doc_id"], r["copy_idx"]) for r in rows]
    assert keys == sorted(keys)
    again = QUERIES["epoch_training_order"].builder(spark, SF_DIR).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
