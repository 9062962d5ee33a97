"""NULL/empty/whitespace-text differential sweep: the text/curation
family must agree with DuckDB when documents carry NULL text, empty
strings, whitespace-only text, or single characters — the input-domain
edge where null-propagation bugs live.

Found and fixed by this sweep when first run:
- lang_id_heuristic: NULL toks made every vote NULL, so DuckDB's CASE
  fell through to ELSE 'es' where the engine said 'unknown' — the
  oracle now routes NULL votes to 'unknown';
- pack_sequences: NULL token counts surfaced as NaN in the Arrow batch
  and CRASHED the packing fold's int() — both the query and the
  operator now coalesce to zero-token docs, matching the oracle.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from transit_feed_etl_spark.queries import QUERIES
from tests.oracle_utils import compare, run_oracle

SRC = "/root/testdata/sf0.001"

NULLISH_TEXTS = [None, "", "   ", "\t\n", "real text here", None, "a", "!!!", "word", ""]

SWEEP_QUERIES = (
    "text_token_stats",
    "dedup_exact",
    "dedup_normalized",
    "top_bigrams_corpus",
    "lang_id_heuristic",
    "doc_fingerprints",
    "doc_quality_scores",
    "pii_redaction",
    "chunk_documents",
    "simhash_portable",
    "simhash_portable_pairs",
    "neardup_jaccard_pairs",
    "neardup_jaccard_prefix",
    "doc_repetition_scores",
    "tfidf_top_terms",
    "bm25_scores",
    "doc_unigram_logprob",
    "inverted_index_postings",
    "exact_substring_spans",
    "dup_ngram_doc_stats",
    "bpe_merge_training",
    "bpe_encode_token_counts",
    "quality_filter_verdicts",
    "hash_sample_documents",
    "dataset_split_assignment",
    "pack_sequences",
    "k_anonymity_audit",
    "benchmark_contamination",
    "cross_split_contamination",
    "curation_pipeline_stats",
    "stratified_sample_by_lang",
    "weighted_sample_by_quality",
    "mixture_resample_by_source",
    "training_shard_manifest",
    "dedup_clusters",
    "dedup_keep_best",
    "sorted_neighborhood_pairs",
    "cluster_aware_split",
)


@pytest.fixture(scope="module")
def nulltext_sf_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_nulltext"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(NULLISH_TEXTS)), pa.int64()),
                "text": pa.array(NULLISH_TEXTS, pa.string()),
                "lang": pa.array(["en"] * len(NULLISH_TEXTS), pa.string()),
                "source": pa.array(["web"] * len(NULLISH_TEXTS), pa.string()),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in NULLISH_TEXTS], pa.int64()
                ),
            }
        ),
        os.path.join(out, "documents.parquet"),
    )
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copyfile(f"{SRC}/{t}.parquet", os.path.join(out, f"{t}.parquet"))
    return out


def test_text_family_agrees_on_null_and_empty_text(spark, nulltext_sf_dir):
    failures = {}
    for name in SWEEP_QUERIES:
        q = QUERIES[name]
        if q.oracle is None:
            continue
        try:
            problems = compare(
                q.builder(spark, nulltext_sf_dir),
                run_oracle(q.oracle, nulltext_sf_dir),
            )
        except Exception as e:  # noqa: BLE001 — collect, report all at once
            problems = [f"exception: {e!r}"[:200]]
        if problems:
            failures[name] = problems[:2]
        spark.catalog.clearCache()
    assert not failures, failures
