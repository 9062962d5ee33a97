"""Corrupt-embeddings differential sweep (19th corpus): NULL vector
rows, wrong dimensionality, NULL elements, non-finite values, zero
norms — the out-of-domain inputs the similarity family's precondition
excludes (queries/similarity.py module docstring).

What the round-7 probe showed: ON corrupt input the family's behavior
is engine-specific — 18 of 19 similarity queries silently diverged from
DuckDB or crashed (numpy kernels raise on ragged batches, zip_with pads
with NULLs where DuckDB's range() stops short, NULL scores rank
differently). Making every hot retrieval path NULL-tolerant would tax
the 100 TB plans for data that is upstream garbage; the supported
boundary is `embedding_integrity_audit`: a map-only validation scan
whose is_valid flag filters the corpus BEFORE retrieval.

This sweep pins both halves of that contract:
1. the audit itself agrees with DuckDB exactly ON the corrupt corpus
   (it is the one query whose domain IS corrupt input);
2. retrieval on the audit-filtered corpus restores full cross-engine
   agreement for the whole similarity family (the remediation works).
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from transit_feed_etl_spark.queries import QUERIES
from tests.corpus_utils import make_sf_dir, sweep_queries

DIM = 64

SIM_QUERIES = (
    "cosine_topk_bruteforce",
    "embedding_neardup_pairs",
    "ann_lsh_topk",
    "ivf_ann_topk",
    "embedding_quantization",
    "ivf_kmeans_topk",
    "quantized_cosine_topk",
    "retrieval_join_docs",
    "truncated_cosine_topk",
    "binary_hamming_topk",
    "cascade_retrieval_topk",
    "rrf_fusion_topk",
    "embedding_dedup_clusters",
    "embedding_mean_by_bucket",
    "mmr_diversified_topk",
    "pca_top_component",
    "semdedup_prune",
    "semdedup_prune_sampled",
    "pq_adc_rerank_topk",
    "pca_top2_projections",
    "knn_graph_clustering",
    "embedding_l2_normalize_udf",
)


def _vecs() -> tuple[list[list[float] | None], set[int]]:
    """12 normal vectors + one of each corruption class; returns
    (vectors, the vec_ids the audit must flag invalid)."""
    rng = random.Random(11)

    def rv() -> list[float]:
        return [round(rng.uniform(-1, 1), 3) for _ in range(DIM)]

    vecs: list[list[float] | None] = [rv() for _ in range(12)]
    bad_start = len(vecs)
    vecs.append(None)  # NULL row
    vecs.append(rv()[: DIM // 2])  # wrong dimensionality
    with_null = rv()
    with_null[3] = None  # type: ignore[call-overload]  # NULL element
    vecs.append(with_null)
    with_nan = rv()
    with_nan[0] = float("nan")
    vecs.append(with_nan)  # non-finite (NaN)
    with_inf = rv()
    with_inf[1] = float("inf")
    vecs.append(with_inf)  # non-finite (Inf)
    vecs.append([0.0] * DIM)  # zero norm
    return vecs, set(range(bad_start, len(vecs)))


def _embeddings_table(vecs) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 4 for i in range(len(vecs))], pa.int32()),
        }
    )


@pytest.fixture(scope="module")
def corrupt_sf_dir(tmp_path_factory) -> str:
    vecs, _ = _vecs()
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_corrupt")),
        {"embeddings": _embeddings_table(vecs)},
    )


@pytest.fixture(scope="module")
def cleaned_sf_dir(tmp_path_factory) -> str:
    """The same corpus with the corrupt rows dropped — exactly what
    filtering on the audit's is_valid flag produces."""
    vecs, bad = _vecs()
    clean = [v for i, v in enumerate(vecs) if i not in bad]
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_cleaned")),
        {"embeddings": _embeddings_table(clean)},
    )


def test_audit_agrees_with_oracle_on_corrupt_corpus(spark, corrupt_sf_dir):
    failures = sweep_queries(spark, corrupt_sf_dir, ["embedding_integrity_audit"])
    assert not failures, failures


def test_audit_flags_exactly_the_corrupt_rows(spark, corrupt_sf_dir):
    vecs, bad = _vecs()
    rows = {
        r["vec_id"]: r
        for r in QUERIES["embedding_integrity_audit"]
        .builder(spark, corrupt_sf_dir)
        .collect()
    }
    assert set(rows) == set(range(len(vecs)))
    flagged = {vid for vid, r in rows.items() if not r["is_valid"]}
    assert flagged == bad
    # each corruption class is attributed to its own flag
    null_id, short_id, nullelem_id, nan_id, inf_id, zero_id = sorted(bad)
    assert rows[null_id]["is_null"] and rows[null_id]["n_dims"] is None
    assert rows[short_id]["wrong_dim"] and rows[short_id]["n_dims"] == DIM // 2
    assert rows[nullelem_id]["has_null_elem"]
    assert rows[nan_id]["has_nonfinite"] and rows[inf_id]["has_nonfinite"]
    assert rows[zero_id]["zero_norm"]
    # valid rows carry no flags
    for vid, r in rows.items():
        if vid not in bad:
            assert r["is_valid"] and r["n_dims"] == DIM


def test_similarity_family_agrees_after_audit_filter(spark, cleaned_sf_dir):
    """The documented remediation: retrieval on the is_valid subset must
    restore full cross-engine agreement (on the RAW corrupt corpus the
    r7 probe showed 18 of the then-19 queries diverge or crash —
    out-of-domain by contract)."""
    failures = sweep_queries(spark, cleaned_sf_dir, SIM_QUERIES)
    assert not failures, failures
