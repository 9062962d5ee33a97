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

import pytest

from tests.corpus_utils import documents_table, make_sf_dir, sweep_queries

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
    # ADVICE r6: the token-array scalar queries were absent from this
    # sweep, leaving their NULL-text COALESCE asymmetries latent
    "array_setops_tokens",
    "array_functions",
    # r8: global-quantile pruning consumes the token-uniqueness score
    "quality_threshold_prune",
    # r9: HTML boilerplate extraction wraps the raw text in page shells
    # and must recover it exactly (roundtrip_ok) — NULL text, control
    # whitespace (HTML is where control characters actually live) and
    # unicode all ride through the portable-WS collapse
    "html_boilerplate_extract",
    # r9: bigram LM scoring and cross-doc line dedup both consume the
    # token/WS pipelines; NULL text must drop out identically
    "doc_bigram_logprob",
    "line_dedup_across_docs",
    # r10: unrolled digest-store dedup canonicalizes NULL text to ''
    # before hashing (all NULL/empty docs share one digest — exactly
    # one survivor); blocklist counts must report 0 hits / kept on
    # NULL-token rows, not NULL verdicts
    "corpus_dedup_rounds",
    "blocklist_filter_verdicts",
    # r10: NULL-text docs contribute zero tokens to either snapshot
    # half; the smoothed model must stay finite and agree
    "corpus_drift_kl",
    "incremental_lsh_rounds",
)


@pytest.fixture(scope="module")
def nulltext_sf_dir(tmp_path_factory) -> str:
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_nulltext")),
        {"documents": documents_table(NULLISH_TEXTS)},
    )


def test_text_family_agrees_on_null_and_empty_text(spark, nulltext_sf_dir):
    failures = sweep_queries(spark, nulltext_sf_dir, SWEEP_QUERIES)
    assert not failures, failures


# --- long-document corpus (~50 KB repetitive + ~50 KB random) ---------------


@pytest.fixture(scope="module")
def longdocs_sf_dir(tmp_path_factory) -> str:
    import random

    rng = random.Random(5)
    long_rep = ("lorem ipsum dolor sit amet " * 2000).strip()
    long_rand = " ".join(
        "".join(rng.choice("abcdefghij") for _ in range(rng.randint(2, 9)))
        for _ in range(8000)
    )
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_longdocs")),
        {"documents": documents_table([long_rep, long_rand, "short doc", ""])},
    )


LONGDOC_QUERIES = (
    "text_token_stats",
    "doc_quality_scores",
    "doc_repetition_scores",
    "chunk_documents",
    "top_bigrams_corpus",
    "tfidf_top_terms",
    "exact_substring_spans",
    "dup_ngram_doc_stats",
    "pack_sequences",
    "bpe_merge_training",
    "dedup_normalized",
    "simhash_portable",
    "neardup_jaccard_prefix",
    "inverted_index_postings",
)


def test_text_family_agrees_on_long_documents(spark, longdocs_sf_dir):
    """~50 KB documents (repetitive and high-entropy): the heavy text
    operators (shingle explosion, gram hashing, chunking, BPE) must
    stay exact — per-doc size changes cost, never results."""
    failures = sweep_queries(spark, longdocs_sf_dir, LONGDOC_QUERIES)
    assert not failures, failures


# --- all-identical documents (maximal dedup density) ------------------------


@pytest.fixture(scope="module")
def samedocs_sf_dir(tmp_path_factory) -> str:
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_samedocs")),
        {
            "documents": documents_table(
                ["the same exact document text repeated here for everyone"] * 10
            )
        },
    )


SAMEDOC_QUERIES = (
    "dedup_exact",
    "dedup_normalized",
    "neardup_jaccard_pairs",
    "neardup_jaccard_prefix",
    "minhash_lsh_candidates",
    "simhash_portable",
    "simhash_portable_pairs",
    "dedup_clusters",
    "dedup_keep_best",
    "sorted_neighborhood_pairs",
    "cluster_aware_split",
    "tfidf_top_terms",
    "bm25_scores",
    "inverted_index_postings",
    "doc_unigram_logprob",
    "top_bigrams_corpus",
    "exact_substring_spans",
    "dup_ngram_doc_stats",
    "bpe_merge_training",
    "bpe_encode_token_counts",
    "pack_sequences",
    "benchmark_contamination",
    "cross_split_contamination",
    "curation_pipeline_stats",
    "hash_sample_documents",
    "k_anonymity_audit",
    "training_shard_manifest",
    # r10: maximal density is the canonical case for historical dedup —
    # ten identical docs across 4 micro-batch rounds must yield exactly
    # one survivor (the batch-0 minimum doc_id), and the line-dedup
    # boilerplate threshold fires on every synthesized line
    "corpus_dedup_rounds",
    "line_dedup_across_docs",
    # r10: every pair is a band collision; the incremental store path
    # must surface the full quadratic candidate set exactly once
    "incremental_lsh_rounds",
)


def test_dedup_family_agrees_on_identical_corpus(spark, samedocs_sf_dir):
    """Every document identical — maximal dedup density: one cluster of
    the whole corpus, df == N everywhere (idf 0, inverted-index band
    empty), every pair a candidate. The dedup/scoring family must agree
    exactly on this degenerate extreme."""
    failures = sweep_queries(spark, samedocs_sf_dir, SAMEDOC_QUERIES)
    assert not failures, failures
