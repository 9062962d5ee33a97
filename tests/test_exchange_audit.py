"""Measured exchange-width contract: SCALE.md's central shuffle claims
("the dedup exchange carries digests, never bodies"; "assignment rows
are narrow key/score tuples") asserted against the executed plan's OWN
shuffle metrics (dataSize / recordsWritten), not docstrings.

Width (bytes per shuffled record) is schema-determined, so the bound
holds at every sf — a refactor that starts shuffling document bodies or
float vectors through one of these exchanges multiplies the width and
trips the bound long before any benchmark notices.
"""

from __future__ import annotations

import pytest

from tools.exchange_audit import audit_query
from transit_feed_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

# name -> max bytes/record over ALL hash exchanges in the executed plan
NARROW_BOUNDS = {
    "dedup_exact": 80,             # md5 digest + partial min/count
    "minhash_lsh_candidates": 48,  # (band-bucket key, doc_id) pairs
    "dedup_clusters": 48,          # (node, label) propagation rows
    "pagerank_copurchase": 56,     # (node, rank) rows
    "semdedup_prune": 56,          # (vec_id, cid, cos) assignment rows
    "pq_adc_rerank_topk": 72,      # codes / (qid, nid, score) ADC rows
    "coorder_part_triangles": 72,  # oriented edges + (deg, id) structs
}


def _widths(name, spark):
    ex = audit_query(QUERIES[name].builder(spark, SF))
    return [
        e["data_bytes"] / e["records"]
        for e in ex.get("hash", [])
        if e["records"]
    ]


@pytest.mark.parametrize("name", sorted(NARROW_BOUNDS))
def test_hash_exchanges_stay_key_width(name, spark):
    widths = _widths(name, spark)
    assert widths, f"{name}: expected at least one hash exchange"
    bound = NARROW_BOUNDS[name]
    assert max(widths) <= bound, (name, widths)


def test_exact_embedding_baseline_moves_vectors_by_design(spark):
    """The LABELED quadratic baseline is the one query allowed to
    shuffle float vectors (the blocked gram kernel must co-locate
    them): pin that its widest exchange IS vector-width, so the
    exception stays explicit rather than silently spreading."""
    widths = _widths("embedding_neardup_pairs", spark)
    assert widths and max(widths) > 400, widths
