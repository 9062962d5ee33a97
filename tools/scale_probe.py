#!/usr/bin/env python
"""Scaling probe: how does each load-bearing operator's wall time grow
when the input grows k-fold?

Builds k-replicated copies of the driver's sf0.1 tables (ids offset per
replica so keys stay distinct — this is a measurement harness, not new
testdata; every row is a driver row) under /tmp, then times a
representative operator set at 1x / 2x / 4x and reports the growth
ratio per doubling. A ratio near 2 per doubling = linear (what a
100 TB-ready plan must show on its corpus-sized stages); quadratic
stages (the labeled verification baselines) show near 4.

Usage: python tools/scale_probe.py [max_k]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from transit_feed_etl_spark.caching import release_caches  # noqa: E402
from transit_feed_etl_spark.io import TABLES, table  # noqa: E402
from transit_feed_etl_spark.queries import QUERIES  # noqa: E402
from transit_feed_etl_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/scale_probe"

# (query, id columns to offset per replica, tables that must be scaled)
PROBES = [
    ("q1_pricing_summary", {"lineitem": []}),
    ("dedup_exact", {"documents": ["doc_id"]}),
    ("text_token_stats", {"documents": ["doc_id"]}),
    ("tfidf_top_terms", {"documents": ["doc_id"]}),
    ("minhash_lsh_candidates", {"documents": ["doc_id"]}),
    ("neardup_jaccard_prefix", {"documents": ["doc_id"]}),
    ("pca_top_component", {"embeddings": ["vec_id"]}),
    ("semdedup_prune", {"embeddings": ["vec_id"]}),
    # PQ: training is corpus-linear (fixed M x K codebooks), encoding and
    # the ADC scan linear, shortlist/re-rank per-query-bounded — expect
    # ~linear; the replicated corpus keeps queries fixed (vec_id < 10
    # survive the offset-0 replica) so output stays 50 rows
    ("pq_adc_rerank_topk", {"embeddings": ["vec_id"]}),
    # the labeled exact-quadratic verification baseline: blocked
    # gram-matrix cosine join — expect ~4x/doubling once compute-bound,
    # and k^2-growing OUTPUT under replication (every vector gains k-1
    # exact cosine-1.0 copies), same adversarial-replication note as
    # neardup_jaccard_prefix in SCALE.md
    ("embedding_neardup_pairs", {"embeddings": ["vec_id"]}),
    # near-dup clustering end-to-end (prefix-filter pair join + CC):
    # replication is adversarial here too (k^2 true pairs), so the
    # interesting signal is that the non-pair stages stay ~linear
    ("dedup_clusters", {"documents": ["doc_id"]}),
    ("cluster_aware_split", {"documents": ["doc_id"]}),
    ("bpe_encode_token_counts", {"documents": ["doc_id"]}),
    ("dup_ngram_doc_stats", {"documents": ["doc_id"]}),
    # r9 text additions: line frequency/regroup and bigram-LM counts are
    # corpus-keyed partial aggs -> expect ~linear; domain stats is one
    # key-width groupBy over a 23-domain key space -> expect ~flat-linear
    ("line_dedup_across_docs", {"documents": ["doc_id"]}),
    ("doc_bigram_logprob", {"documents": ["doc_id"]}),
    ("domain_doc_stats", {"documents": ["doc_id"]}),
    ("html_boilerplate_extract", {"documents": ["doc_id"]}),
    # r10 additions: unrolled digest-store dedup is K fixed anti-join
    # rounds over corpus-keyed digests -> expect ~linear; output stays
    # ~n_distinct(text) under replication (replicated texts hash
    # identically, so one global first-seen survivor regardless of k).
    # The capped sample's salted two-phase top-N bounds phase-2 input
    # by CAP x SALT x n_domains (corpus-independent) so only phase 1
    # scales -> expect ~linear; replicas share the same 23 domains
    # (domain = f(doc_id % 23)), so per-domain load grows k-fold —
    # exactly the heavy-domain shape the salting exists for — and
    # output stays pinned at 345 rows.
    ("corpus_dedup_rounds", {"documents": ["doc_id"]}),
    ("domain_capped_sample", {"documents": ["doc_id"]}),
    # map-only scan stage (zero hash exchanges, plan-pinned) -> expect
    # flat until compute-bound, the html_boilerplate_extract class
    ("blocklist_filter_verdicts", {"documents": ["doc_id"]}),
    # token-keyed groupBy partial aggs + vocab-bounded model -> expect
    # ~linear in the token stream; under replication the vocab is
    # constant and both halves replicate together, so output (top-20)
    # and the KL value itself are scale-invariant
    ("corpus_drift_kl", {"documents": ["doc_id"]}),
    # signatures once over the corpus; K round joins ride 24 B
    # band-bucket keys; replication is adversarial for the PAIR OUTPUT
    # (k^2 true near-dup pairs, the neardup_jaccard_prefix note) so the
    # signal is the non-pair stages staying ~linear
    ("incremental_lsh_rounds", {"documents": ["doc_id"]}),
    # incremental SemDeDup: frozen centroids (trained on batch 0 — the
    # replicas' offset ids keep the original 16 seeds), broadcast-tree
    # assignment, K cell-keyed round joins. Replication is adversarial
    # for the PAIR OUTPUT (every vector gains k-1 exact cosine-1.0
    # copies in its cell -> k^2 pairs, the embedding_neardup_pairs
    # note); the signal is assignment + store joins staying ~linear
    ("incremental_semdedup_rounds", {"embeddings": ["vec_id"]}),
    ("merge_upsert_customer_balance", {"events": ["event_id"], "customer": []}),
    ("sessionize_events", {"events": ["event_id"]}),
    ("exact_substring_spans", {"documents": ["doc_id"]}),
    ("doc_compression_ratio", {"documents": ["doc_id"]}),
    # disjoint co-purchase graph copies per replica (custkey/suppkey
    # offsets keep the namespaced node spaces disjoint): rounds stay
    # constant, per-round |E| grows k-fold -> expect ~linear
    (
        "pagerank_copurchase",
        {
            "orders": ["o_orderkey", "o_custkey"],
            "lineitem": ["l_orderkey", "l_suppkey"],
        },
    ),
    # two-pass posting-list build: every term's df grows k-fold, so the
    # 2<=df<=50 band keeps FEWER terms as k grows — the pass-1 count
    # must absorb the k-fold token stream at ~linear cost
    ("inverted_index_postings", {"documents": ["doc_id"]}),
    # k disjoint copies of the co-ordered-parts affinity graph (orderkey
    # AND partkey offsets keep per-order groups and the part node space
    # disjoint): the lineitem self-join pair build is bounded by order
    # size (constant), the support-2 edge set and the compact-forward
    # wedge volume both grow k-fold -> expect ~linear (VERDICT r7 item 5
    # — the one headline query without a measured exponent)
    ("coorder_part_triangles", {"lineitem": ["l_orderkey", "l_partkey"]}),
]

OFFSET = 10_000_000


def build_dir(spark, k: int, scaled: dict[str, list[str]]) -> str:
    # key the dir by WHAT was scaled, not just k: a dir built for a
    # different probe filter (different scaled-column union) must never
    # be silently reused with the wrong key offsets (ADVICE r6) — a
    # filter switch now lands in a fresh dir automatically instead of
    # relying on the operator deleting /tmp/scale_probe by hand
    import hashlib

    sig = hashlib.sha256(
        json.dumps(scaled, sort_keys=True).encode()
    ).hexdigest()[:10]
    out = f"{WORK}/x{k}_{sig}"
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if os.path.exists(dst):
            continue
        if t in scaled:
            df = table(spark, BASE, t)
            parts = []
            for i in range(k):
                p = df
                for c in scaled[t]:
                    p = p.withColumn(c, F.col(c) + F.lit(i * OFFSET))
                parts.append(p)
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            u.coalesce(max(1, k)).write.mode("overwrite").parquet(dst + ".dir")
            # single-file layout to mirror the driver's testdata shape
            files = [
                f for f in os.listdir(dst + ".dir") if f.endswith(".parquet")
            ]
            if len(files) == 1:
                shutil.move(os.path.join(dst + ".dir", files[0]), dst)
                shutil.rmtree(dst + ".dir")
            else:
                shutil.move(dst + ".dir", dst)
        else:
            shutil.copyfile(f"{BASE}/{t}.parquet", dst)
    return out


def main() -> int:
    import re

    max_k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pat = re.compile(sys.argv[2]) if len(sys.argv) > 2 else None
    ks = [1]
    while ks[-1] * 2 <= max_k:
        ks.append(ks[-1] * 2)
    spark = get_spark()
    # scale union of all id columns used by any SELECTED probe of that
    # table (union, not first-wins: pagerank needs lineitem key offsets
    # even though q1 registered lineitem first with none). Respecting
    # the filter here matters: building k-fold replicas of every table
    # for a one-probe run wastes minutes and GBs (round-6 review
    # finding). Build dirs are keyed by (k, hash of the scaled-column
    # map), so switching filters rebuilds instead of silently reusing a
    # dir scaled with different key offsets (ADVICE r6).
    selected = [
        (name, scaled)
        for name, scaled in PROBES
        if pat is None or pat.search(name)
    ]
    need: dict[str, list[str]] = {}
    for _, scaled in selected:
        for t, cols in scaled.items():
            need[t] = sorted(set(need.get(t, [])) | set(cols))
    # the built-in (non-PROBES) sections below scale embeddings too —
    # trigger on EVERY such section's name. Round-8 postmortem: the
    # original single-name check missed "semdedup_sampled", so a
    # filtered run built corpora with need={} (UNSCALED embeddings) and
    # measured cell-count growth on a constant 50k-vector corpus — the
    # retracted "flat 0.98x" row in SCALE.md. Any future built-in
    # section must add its name here or scale nothing.
    _BUILTIN_EMBEDDING_SECTIONS = (
        "semdedup_prune[cells=16k]",
        "semdedup_sampled[cells=16k,sample=const]",
        "semdedup_rounds[cells=16k]",
    )
    if pat is None or any(pat.search(n) for n in _BUILTIN_EMBEDDING_SECTIONS):
        need["embeddings"] = sorted(set(need.get("embeddings", [])) | {"vec_id"})
    dirs = {k: build_dir(spark, k, need) for k in ks}
    print(f"built {len(dirs)} scaled dirs: {sorted(dirs.values())}", flush=True)

    # SemDeDup with cells grown proportionally to the corpus — the
    # production sizing rule (SCALE.md): per-cell membership (and thus
    # per-task quadratic work) stays constant, so scaling should be
    # ~linear where the fixed-16-cell registered query is ~quadratic.
    from transit_feed_etl_spark.operators import vectors as VV
    from transit_feed_etl_spark.io import table_par
    from transit_feed_etl_spark.queries.similarity import (
        semdedup_pairs,
        semdedup_pairs_sampled,
    )

    results: dict[str, dict[int, float]] = {}
    name = "semdedup_prune[cells=16k]"
    results[name] = {}
    for k in ks if (pat is None or pat.search(name)) else []:
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            v = table_par(spark, dirs[k], "embeddings").select(
                "vec_id", VV.as_double("embedding").alias("v")
            )
            n = semdedup_pairs(v, n_cells=16 * k).count()
            best = min(best, time.monotonic() - t0)
            release_caches()
            spark.catalog.clearCache()
        results[name][k] = best
        print(f"  {name} x{k}: {best:.2f}s ({n} rows)", flush=True)

    # The production plan under the SAME sizing rule: Lloyd trains on
    # a FIXED-size sample (mod ∝ k keeps |sample| constant while cells
    # ∝ k), assignment routes through the hierarchical quantizer whose
    # depth grows as log_branch(cells) — per-vector work O(branch·depth)
    # instead of the r9-retired two-level shape's O(√cells) (the
    # measured 4.5x last doubling at x32, VERDICT r8 item 3). Full
    # training is iters x n x cells ∝ n² under cells ∝ n (the rising
    # per-doubling curve measured above); this one should flatten to
    # ~n·log n.
    name = "semdedup_sampled[cells=16k,sample=const]"
    results[name] = {}
    for k in ks if (pat is None or pat.search(name)) else []:
        n_cells, mod = 16 * k, 4 * k
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            v = table_par(spark, dirs[k], "embeddings").select(
                "vec_id", VV.as_double("embedding").alias("v")
            )
            # Seeds must be passed EXPLICITLY here: the replicated dirs
            # space ids 10M apart, so kmeans_train's seed_below filter
            # (vec_id < n_cells*mod) only ever reaches replica-0's
            # ~2k dense ids — cells silently COLLAPSED as k grew
            # (x8: 63, x16: 32, x32: 16 instead of 128/256/512), which
            # turned the per-cell pair scan quadratic and invalidated
            # the sizing rule the probe exists to measure (found in
            # round 9; the r8 "1.51x/doubling, 4.5x last doubling" row
            # measured this degenerate configuration, not the two-level
            # design — retracted in SCALE.md).
            samp = v.filter(F.col("vec_id") % mod == 0)
            seeds = (
                samp.orderBy("vec_id")
                .limit(n_cells)
                .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
            )
            n = semdedup_pairs_sampled(
                v, n_cells=n_cells, sample_mod=mod, seeds=seeds
            ).count()
            best = min(best, time.monotonic() - t0)
            release_caches()
            spark.catalog.clearCache()
        results[name][k] = best
        print(f"  {name} x{k}: {best:.2f}s ({n} rows)", flush=True)

    # Incremental SemDeDup under the SAME production sizing rule
    # (cells ∝ corpus keeps per-cell occupancy — and thus both the
    # in-batch pair scan and each round's new-vs-store join fan-out —
    # constant). The flat registered query (PROBES) holds cells=16, so
    # its per-cell occupancy grows k-fold and the pair stages go
    # quadratic (measured 2.41x/doubling at x4) — the identical
    # characteristic the flat semdedup_prune shows, and exactly why
    # SCALE.md's sizing rule exists. Replication remains ADVERSARIAL
    # for the pair OUTPUT even under the rule: exact duplicates route
    # to the same cell at any cell count, so k² cosine-1.0 true pairs
    # are intrinsic to the harness (the embedding_neardup_pairs /
    # incremental_lsh_rounds note).
    from transit_feed_etl_spark.queries.similarity import semdedup_rounds

    name = "semdedup_rounds[cells=16k]"
    results[name] = {}
    for k in ks if (pat is None or pat.search(name)) else []:
        n_cells = 16 * k
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            v = table_par(spark, dirs[k], "embeddings").select(
                "vec_id", VV.as_double("embedding").alias("v")
            )
            # explicit seeds: the replicated dirs space ids 10M apart,
            # so seed_below would collapse cells as k grows (the round-9
            # sampled-section postmortem above); seed from batch 0
            samp = v.filter(F.col("vec_id") % 4 == 0)
            seeds = (
                samp.orderBy("vec_id")
                .limit(n_cells)
                .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
            )
            n = semdedup_rounds(v, n_cells=n_cells, seeds=seeds).count()
            best = min(best, time.monotonic() - t0)
            release_caches()
            spark.catalog.clearCache()
        results[name][k] = best
        print(f"  {name} x{k}: {best:.2f}s ({n} rows)", flush=True)

    # Connected components on k disjoint chain graphs (depth 8 forces
    # several pointer-jumping rounds): rounds are O(log depth) and
    # depth is fixed, so k-fold edges should cost ~k-fold wall — the
    # scaling claim behind dedup_clusters / cluster_aware_split.
    from transit_feed_etl_spark.operators.components import connected_components

    name = "connected_components[chains]"
    results[name] = {}
    depth = 8
    for k in ks if (pat is None or pat.search(name)) else []:
        n_chains = 4000 * k
        edges = (
            spark.range(n_chains)
            .selectExpr("id AS chain", f"explode(sequence(0, {depth - 2})) AS hop")
            .selectExpr(
                f"chain * {depth} + hop AS id_a",
                f"chain * {depth} + hop + 1 AS id_b",
            )
        )
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            n = connected_components(edges).count()
            best = min(best, time.monotonic() - t0)
            release_caches()
            spark.catalog.clearCache()
        results[name][k] = best
        print(f"  {name} x{k}: {best:.2f}s ({n} rows)", flush=True)

    for name, _ in selected:
        q = QUERIES[name]
        results[name] = {}
        for k in ks:
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                n = q.builder(spark, dirs[k]).count()
                best = min(best, time.monotonic() - t0)
                release_caches()
                spark.catalog.clearCache()
            results[name][k] = best
            print(f"  {name} x{k}: {best:.2f}s ({n} rows)", flush=True)

    print(f"\n{'operator':32} " + " ".join(f"{'x' + str(k):>7}" for k in ks)
          + "  ratio/doubling")
    for name, r in results.items():
        if not r:
            continue
        # geometric mean over ALL doublings: (t_max / t_1)^(1/doublings)
        geo = (r[ks[-1]] / r[ks[0]]) ** (1.0 / (len(ks) - 1)) if len(ks) > 1 else 1.0
        print(f"{name:32} " + " ".join(f"{r[k]:6.2f}s" for k in ks)
              + f"  {geo:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
