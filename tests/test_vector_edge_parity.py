"""Vector-edge differential sweep for the similarity family.

Two classes probed when first written:
- EXACT-DUPLICATE vectors (maximal score ties): every retrieval query
  must agree with DuckDB — the (score DESC, id ASC) tie-break totality
  claim, verified here as the permanent sweep;
- ZERO-NORM vectors: cosine is undefined; under ANSI the engine fails
  FAST with DIVIDE_BY_ZERO rather than emitting NaN neighbors — pinned
  below as the documented input-domain precondition
  (queries/similarity.py module docstring).
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from transit_feed_etl_spark.queries import QUERIES
from tests.corpus_utils import make_sf_dir, sweep_queries

DIM = 64  # the embeddings table's fixed dimensionality

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


def embeddings_table(vecs: list[list[float]]) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 4 for i in range(len(vecs))], pa.int32()),
        }
    )


@pytest.fixture(scope="module")
def ties_vec_sf_dir(tmp_path_factory) -> str:
    rng = random.Random(7)
    base = [round(rng.uniform(-1, 1), 3) for _ in range(DIM)]
    vecs = [
        list(base)
        if i % 3 == 0
        else [round(rng.uniform(-1, 1), 3) for _ in range(DIM)]
        for i in range(30)
    ]
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_vecties")),
        {"embeddings": embeddings_table(vecs)},
    )


def test_similarity_family_agrees_on_duplicate_vectors(spark, ties_vec_sf_dir):
    failures = sweep_queries(spark, ties_vec_sf_dir, SIM_QUERIES)
    assert not failures, failures


def test_zero_norm_vectors_fail_fast(spark, tmp_path):
    """The documented precondition: a zero-norm embedding must FAIL the
    cosine query under ANSI (DIVIDE_BY_ZERO), not silently rank NaN
    neighbors. If this starts passing, the domain note in
    queries/similarity.py needs revisiting."""
    rng = random.Random(3)
    vecs = [[0.0] * DIM] + [
        [round(rng.uniform(-1, 1), 3) for _ in range(DIM)] for _ in range(9)
    ]
    out = make_sf_dir(str(tmp_path / "sf_zero"), {"embeddings": embeddings_table(vecs)})
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO|ArithmeticException"):
        QUERIES["cosine_topk_bruteforce"].builder(spark, out).collect()
