"""Magnitude-extreme embeddings differential sweep (15th adversarial
corpus, added round 6).

The embeddings column is stored as float32, whose finite range tops out
at ~3.4e38: a norm or dot product computed IN float32 overflows to Inf
for entries as small as ~2e19 (64 * x^2 > 3.4e38), and squares of
denormal-scale entries flush to zero. Every engine path therefore
widens to float64 before arithmetic (`operators/vectors.py:as_double`,
the blocked kernel's explicit `astype(np.float64)`), where the worst
float32-representable case (64 * (3.4e38)^2 ~ 7e78) is comfortably
finite — and the DuckDB oracles must widen identically. This sweep pins
that claim over a corpus of near-float32-max, denormal-scale, and
mixed huge/tiny vectors: a future "optimization" that scores tiles in
float32 (a tempting 2x memory win in the gram kernel) or an oracle that
lets DuckDB evaluate list arithmetic in FLOAT diverges here instantly.

Zero-norm stays out of scope (pinned as fail-fast in
test_vector_edge_parity.py); all vectors here have finite nonzero norm.
"""

from __future__ import annotations

import random

import pytest

from tests.corpus_utils import make_sf_dir, sweep_queries
from tests.test_vector_edge_parity import DIM, SIM_QUERIES, embeddings_table
from transit_feed_etl_spark.queries import QUERIES

F32_NEAR_MAX = 3.0e38  # finite in float32; its square only fits in f64
TINY = 1.0e-42  # denormal in float32; square flushes to 0 in f32


@pytest.fixture(scope="module")
def magvec_sf_dir(tmp_path_factory) -> str:
    rng = random.Random(11)
    vecs: list[list[float]] = []
    for i in range(32):
        kind = i % 4
        if kind == 0:  # near-f32-max magnitude, varied signs
            vecs.append(
                [F32_NEAR_MAX * (1 if (i + j) % 3 else -1) * (0.25 + 0.25 * (j % 4)) for j in range(DIM)]
            )
        elif kind == 1:  # denormal-scale: squares vanish in f32
            vecs.append([TINY * (j % 7 + 1) * (1 if j % 2 else -1) for j in range(DIM)])
        elif kind == 2:  # mixed: one huge component among tiny ones
            v = [TINY * (j + 1) for j in range(DIM)]
            v[i % DIM] = F32_NEAR_MAX * 0.5
            vecs.append(v)
        else:  # ordinary magnitudes as the control group
            vecs.append([round(rng.uniform(-1, 1), 3) for _ in range(DIM)])
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_vecmag")),
        {"embeddings": embeddings_table(vecs)},
    )


# Pinned classification (like test_naninf_parity): which similarity
# queries must AGREE at float32-extreme magnitudes, and which hit a
# documented domain bound. Any drift between these sets trips a test.
AGREE = (
    "cosine_topk_bruteforce",
    "embedding_neardup_pairs",
    "ann_lsh_topk",
    "ivf_ann_topk",
    "embedding_quantization",  # magnitude-free metrics since round 6
    "retrieval_join_docs",
    "truncated_cosine_topk",
    "binary_hamming_topk",
    "cascade_retrieval_topk",
    "rrf_fusion_topk",
    "embedding_dedup_clusters",
    "mmr_diversified_topk",
    "knn_graph_clustering",
    "embedding_l2_normalize_udf",
)
# Queries whose decimal-sum portability trick (means/scatter matrices
# over DECIMAL(25,15)) overflows for |x| ~ 3e38: BOTH engines fail FAST
# and LOUD (Spark NUMERIC_VALUE_OUT_OF_RANGE, DuckDB ConversionError) —
# symmetric refusal, never silent wrong values. The decimal width is
# the price of order-independent exact aggregation on the real corpus
# (|x| <= ~1); production embeddings live there, and out-of-band rows
# now announce themselves.
BOTH_FAIL_FAST = (
    "ivf_kmeans_topk",
    "embedding_mean_by_bucket",
    "pca_top_component",
    "semdedup_prune",
    "semdedup_prune_sampled",  # same DECIMAL(25,15) Lloyd means
    "pq_adc_rerank_topk",  # DECIMAL(25,15) subspace Lloyd means + ADC sum
    "pca_top2_projections",
)


def test_similarity_family_agrees_on_extreme_magnitudes(spark, magvec_sf_dir):
    assert set(AGREE) | set(BOTH_FAIL_FAST) | {"quantized_cosine_topk"} == set(
        SIM_QUERIES
    )
    failures = sweep_queries(spark, magvec_sf_dir, AGREE)
    assert not failures, failures


def test_decimal_mean_family_fails_fast_on_both_engines(spark, magvec_sf_dir):
    """The classified domain bound must stay SYMMETRIC: if either engine
    starts silently succeeding where the other raises, that is exactly
    the silent-wrong-value drift this sweep exists to catch."""
    from tests.oracle_utils import run_oracle

    for name in BOTH_FAIL_FAST:
        q = QUERIES[name]
        with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE|Arithmetic"):
            q.builder(spark, magvec_sf_dir).collect()
        with pytest.raises(Exception, match="Conversion Error|Out of Range"):
            run_oracle(q.oracle, magvec_sf_dir)


def test_quantized_cosine_applies_zero_norm_precondition(spark, magvec_sf_dir):
    """Denormal-scale vectors quantize to ALL ZEROS under the 1e-12
    scale clamp, making qnrm zero: the engine fails FAST under ANSI —
    the quantized extension of the zero-norm precondition — where the
    DuckDB oracle would silently rank inf scores (its float division by
    zero yields inf). The engine's loud refusal is the pinned behavior."""
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO|ArithmeticException"):
        QUERIES["quantized_cosine_topk"].builder(spark, magvec_sf_dir).collect()
