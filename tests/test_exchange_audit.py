"""Measured exchange-width contract: SCALE.md's central shuffle claims
("the dedup exchange carries digests, never bodies"; "assignment rows
are narrow key/score tuples") asserted against the executed plan's OWN
shuffle metrics (dataSize / recordsWritten), not docstrings.

Width (bytes per shuffled record) is schema-determined, so the bound
holds at every sf — a refactor that starts shuffling document bodies or
float vectors through one of these exchanges multiplies the width and
trips the bound long before any benchmark notices.

Two exchange populations, bounded separately (round-9 recalibration
after the walker learned to descend into cached AQE subtrees — the r8
artifact was blind to every exchange under a persist()):

- CORPUS-SCALED exchanges (records grow with the input): these must
  stay key-width; they are the 100 TB hazard the contract exists for.
- BOUNDED-BY-CONSTRUCTION exchanges (records = centroids/codebooks x
  map partitions, corpus-independent): Lloyd / PQ training partials
  shuffle a few hundred wide aggregate rows regardless of corpus size;
  their width is irrelevant at scale. They are exempted by an explicit
  per-query record ceiling (sf0.001 / 8-partition constants, each
  documented) so a corpus-scaled exchange can never hide under one.
"""

from __future__ import annotations

import os

import pytest

from tools.exchange_audit import audit_query, hermetic_audit
from transit_feed_etl_spark.queries import QUERIES

# honor the same testdata override as conftest.py (ADVICE r8)
SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# name -> (max bytes/record over corpus-scaled hash exchanges,
#          record ceiling below which an exchange is a
#          bounded-by-construction training partial and exempt)
NARROW_BOUNDS = {
    # md5 digest + partial min/count; no training stage -> no exemption
    "dedup_exact": (80, 0),
    # ONE corpus-wide exchange: the signature-assembly partial-min agg
    # ships one (doc_id, 64 minhash ints) row per doc ~= 334 B. That IS
    # the algorithm's data movement (everything downstream is narrow
    # band/bucket keys at 32 B). r8's "32 B/rec" claim measured only
    # the post-cache half; the honest bound is signature width.
    "minhash_lsh_candidates": (352, 0),
    "dedup_clusters": (48, 0),       # (node, label) propagation rows
    "pagerank_copurchase": (56, 0),  # (node, rank) rows
    # corpus-scaled rows are the 40 B prune outputs; <=160-record
    # exchanges are Lloyd per-cell decimal-sum partials
    # (16 cells x 8 map partitions = 128 rows, ~2.1 KB each,
    # corpus-INDEPENDENT record count)
    "semdedup_prune": (56, 160),
    "semdedup_prune_sampled": (56, 160),
    # <=100-record exchanges are the per-subspace PQ codebook training
    # partials (64 rows); corpus-scaled rows are 4 B/subspace codes +
    # (qid, nid, score) ADC rows
    "pq_adc_rerank_topk": (80, 100),
    "coorder_part_triangles": (72, 0),  # oriented edges + (deg,id) structs
    # freq pass + flag join + removed-set groupBy all carry 32-hex
    # digests + small ints; bodies only ride broadcasts under defaults
    # (see the no-broadcast degradation test below)
    "line_dedup_across_docs": (88, 0),
    # K anti-join rounds + in-batch first-seen windows: Catalyst prunes
    # text at the scan, so every exchange carries (doc_id, batch_id,
    # 32-hex digest) — measured 54.8 B/rec over 10 exchanges at sf0.1
    "corpus_dedup_rounds": (88, 0),
    # salted phase-1 window + bounded phase-2 re-rank: host pruned
    # after domain extraction, so exchanges carry (doc_id, n_chars,
    # domain, salt) — measured 55.5 B/rec at sf0.1
    "domain_capped_sample": (88, 0),
    # ONE token-keyed groupBy with partial aggs; rows are (token,
    # count_ref, count_new) and the record count is VOCAB-bounded, not
    # corpus-bounded — measured 40.0 B/rec at sf0.001; the reference/new
    # totals reduce to broadcast single rows
    "corpus_drift_kl": (56, 0),
    # two domain-keyed groupBys (partial-agg rows: domain + 2-3 longs,
    # measured 40-48 B/rec) + one broadcast constants row; selection
    # constants ride a broadcast join back onto the scan
    "domain_mixture_sample": (56, 0),
    # CC label-propagation rounds (node, label) + the doc_id-keyed
    # weight join — measured 24 B/rec; same class as dedup_clusters
    "softdedup_weights": (48, 0),
    # corpus-scaled rows are the 40 B per-vector prune outputs; the
    # <=160-record exemption covers the Lloyd per-cell decimal-sum
    # partials (corpus-INDEPENDENT record count, ~2.3 KB rows), exactly
    # the semdedup_prune / semdedup_prune_sampled contract
    "incremental_semdedup_rounds": (56, 160),
    # both snapshot sides reduce to (doc_id, 16-byte digest) at the
    # scan; the full-outer join shuffles 56 B/rec, never text
    "corpus_snapshot_diff": (80, 0),
    # two ~23-key domain groupBys (partial rows: domain + 2 longs,
    # measured 40 B/rec); epoch math + copy explode are map-side and
    # the constants ride ONE broadcast row
    "epoch_training_order": (56, 0),
}


def _exchanges(name, spark):
    # hermetic: pin plan-affecting confs to session-build values and
    # drop all caches around build+measure, so a foreign test's cached
    # subtree or leaked conf cannot perturb the measured plan (VERDICT
    # r11 item 2 — the incremental_semdedup_rounds contract failed in
    # full-suite order only)
    ex = hermetic_audit(lambda: QUERIES[name].builder(spark, SF), spark)
    return [
        (e["records"], e["data_bytes"] / e["records"])
        for e in ex.get("hash", [])
        if e["records"]
    ]


@pytest.mark.parametrize("name", sorted(NARROW_BOUNDS))
def test_corpus_scaled_hash_exchanges_stay_key_width(name, spark):
    """An exchange violates the contract iff it is BOTH wider than the
    key-width bound AND carries more records than the
    bounded-by-construction ceiling.  Stated as that per-exchange
    implication (wide => record-bounded) the contract is never vacuous,
    so it needs no "at least one corpus-scaled exchange" precondition.
    The r12 guard (`assert scaled`) required such an exchange to exist
    and broke on a LEANER plan: after the r12 store/kmeans rewrites,
    AQE broadcast decisions — nondeterministic across sessions for
    near-threshold relations — can elide the last above-ceiling
    exchange entirely, which is a strictly better plan, not a vacuous
    contract (VERDICT r12 item 1; the driver's fail-fast run left ~90%
    of the suite unexecuted on exactly that assertion)."""
    exchanges = _exchanges(name, spark)
    assert exchanges, f"{name}: expected at least one hash exchange"
    bound, exempt_below = NARROW_BOUNDS[name]
    offending = [
        (r, round(w, 1))
        for r, w in exchanges
        if w > bound and r > exempt_below
    ]
    assert not offending, (
        f"{name}: corpus-scaled hash exchanges over {bound} B/rec "
        f"(records, B/rec): {offending}; all hash exchanges: "
        f"{[(r, round(w, 1)) for r, w in exchanges]}"
    )


def test_incremental_lsh_rounds_moves_band_keys_plus_one_signature_pass(spark):
    """VERDICT r10 item 3: the incremental LSH index maintains a
    persistent (band, bkey, id) store across K rounds — every per-round
    collision/anti join must ship band-bucket keys only (<= 24 B/rec).
    The ONE allowed wide exchange is the up-front signature assembly
    (doc_id + 64 minhash ints ~= 334 B/rec, the same labeled exception
    `minhash_lsh_candidates` carries at 352): it runs ONCE over the
    arrivals regardless of round count, and the exact-Jaccard
    verification downstream is candidates-bounded and rides it.
    Measured at sf0.001: one 333.9 B/rec signature exchange (corpus
    count) + one 24.0 B/rec band-key exchange."""
    exchanges = _exchanges("incremental_lsh_rounds", spark)
    assert exchanges, "expected hash exchanges"
    wide = [(r, w) for r, w in exchanges if w > 24]
    assert len(wide) == 1 and wide[0][1] <= 352, exchanges
    narrow = [(r, w) for r, w in exchanges if w <= 24]
    assert narrow, exchanges


def test_hermetic_audit_immune_to_leaked_conf_and_foreign_cache(spark):
    """Pin the hermeticity fix itself (VERDICT r11 item 2): simulate
    both leakage channels that made the width contract order-dependent
    in the full suite — a plan-affecting conf left un-restored by an
    earlier test, and a foreign cached relation whose plan fragment
    CacheManager would graft into this query's plan — then assert the
    hermetic measurement still satisfies the contract, and that the
    leaked conf is restored (not clobbered to the session default)
    after measurement."""
    from transit_feed_etl_spark.io import table_par

    name = "incremental_semdedup_rounds"
    bound, exempt_below = NARROW_BOUNDS[name]
    # channel 1: leaked conf — broadcasts off turns every broadcast
    # join into a hash exchange if the pin fails
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # channel 2: foreign cache — persist the embeddings scan (a
    # fragment of the semdedup plan) so CacheManager would substitute
    # an InMemoryTableScan materialized outside the measurement
    foreign = table_par(spark, SF, "embeddings").persist()
    foreign.count()
    try:
        exchanges = _exchanges(name, spark)
        # same never-vacuous implication as the parametrized contract: a
        # LEAKED -1 threshold (pin failure) turns the query's broadcast
        # joins into wide corpus-scaled hash exchanges, which trip this;
        # a leaner all-under-ceiling plan does not
        assert exchanges
        assert not [
            (r, w) for r, w in exchanges if w > bound and r > exempt_below
        ], exchanges
        # the leaked value is the caller's state: restored, not reset
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        foreign.unpersist()


def test_exact_embedding_baseline_moves_vectors_by_design(spark):
    """The LABELED quadratic baseline is the one query allowed to
    shuffle float vectors (the blocked gram kernel must co-locate
    them): pin that its widest exchange IS vector-width, so the
    exception stays explicit rather than silently spreading."""
    widths = [w for _, w in _exchanges("embedding_neardup_pairs", spark)]
    assert widths and max(widths) > 400, widths


def test_hier_assign_never_shuffles_corpus_without_broadcasts(spark):
    """VERDICT r8 item 4: the r8 two-level assigner's docstring claimed
    "the corpus never shuffles during assignment", but its
    va.join(v, "vec_id") planned as a vector-width corpus exchange once
    the corpus outgrew the broadcast threshold — locally AQE's implicit
    broadcast hid the cost. The r9 `hier_assign` routes via per-row
    folds over explicit broadcast hints, so the claim must hold even
    with implicit broadcasts DISABLED: no hash exchange in the
    assignment plan may carry corpus-count records (the only exchanges
    left are centroid-level links/partials)."""
    from pyspark.sql import functions as F

    from transit_feed_etl_spark.caching import release_caches
    from transit_feed_etl_spark.io import table_par
    from transit_feed_etl_spark.operators import vectors as V
    from transit_feed_etl_spark.queries.similarity import (
        hier_assign,
        kmeans_train,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        emb = table_par(spark, SF, "embeddings")
        v = emb.select("vec_id", V.as_double("embedding").alias("v"))
        n = v.count()
        samp = v.filter(F.col("vec_id") % 4 == 0)
        cent = kmeans_train(samp, iters=1, n_cells=16, seed_below=64)
        ex = audit_query(hier_assign(v, cent, n_cells=16))
        recs = [e["records"] for e in ex.get("hash", [])]
        assert all(r < n for r in recs), (n, ex.get("hash"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        release_caches()


def test_blocklist_filter_is_map_only(spark):
    """`blocklist_filter_verdicts` claims pure scan-stage execution —
    the fixed literal blocklist is baked into the plan and hit counting
    is a higher-order array filter, so the query must move ZERO corpus
    rows: no hash exchange of any width (the only exchanges are the
    presentation sort and the testdata round-robin workaround)."""
    ex = hermetic_audit(
        lambda: QUERIES["blocklist_filter_verdicts"].builder(spark, SF), spark
    )
    assert not ex.get("hash"), ex.get("hash")
    assert not ex.get("single"), ex.get("single")


def test_line_dedup_degrades_to_digest_shuffle_without_broadcasts(spark):
    """VERDICT r9 item 4: the r9 shape force-broadcast the >=K
    repeated-line set via an F.broadcast hint — a hint the planner obeys
    even when that set outgrows broadcast range (plausibly 1e8+ digests
    across 100 TB of web text). The r10 shape is hint-free and keeps
    line BODIES off every join: under autoBroadcastJoinThreshold=-1
    (the proxy for the boilerplate set outgrowing the threshold) the
    flag join must degrade to a digest-keyed shuffle — every
    corpus-scaled exchange <= 88 B/rec except the SINGLE body-width
    doc<->removed-set reassembly join — and the values must still match
    the oracle. Measured at sf0.001: digest exchanges 56-75 B/rec, the
    flag join at 64 B/rec, one 449 B/rec reassembly exchange carrying
    exactly the doc count."""
    from tests.oracle_utils import compare, run_oracle
    from transit_feed_etl_spark.caching import release_caches

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = QUERIES["line_dedup_across_docs"]
        ex = audit_query(q.builder(spark, SF))
        widths = [
            e["data_bytes"] / e["records"]
            for e in ex.get("hash", [])
            if e["records"]
        ]
        wide = [w for w in widths if w > 100]
        assert len(wide) == 1, (widths, ex.get("hash"))
        narrow = [w for w in widths if w <= 100]
        assert narrow and max(narrow) <= 88, widths
        problems = compare(q.builder(spark, SF), run_oracle(q.oracle, SF))
        assert not problems, problems[:5]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        release_caches()


def test_classifier_separates_range_and_single_from_hash(spark):
    """Partitioning toString is case-inconsistent across kinds
    (HashPartitioning/RangePartitioning are Expressions and print
    lowercase; RoundRobinPartitioning/SinglePartition print CamelCase).
    The r8 classifier matched 'RangePartitioning' literally and never
    matched — every presentation orderBy landed in the hash
    (data-movement) population (zero range exchanges across all 44
    queries in the r8 artifact was the tell). Pin each kind."""
    from pyspark.sql import functions as F

    base = spark.range(0, 1000, 1, 4)
    # sort key must not be the range column itself: Catalyst knows
    # spark.range's output ordering and elides that sort entirely
    ex = audit_query(base.orderBy((F.col("id") % 7).alias("k")))
    assert ex.get("range"), ex
    assert not ex.get("hash"), ex
    ex = audit_query(base.groupBy((F.col("id") % 7).alias("k")).count())
    assert ex.get("hash"), ex
    assert not ex.get("range"), ex
    ex = audit_query(base.repartition(8))
    assert ex.get("roundrobin"), ex
    assert not ex.get("hash"), ex
    ex = audit_query(base.agg(F.sum("id")))
    assert ex.get("single"), ex
    assert not ex.get("hash"), ex
