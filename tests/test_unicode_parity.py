"""Unicode differential sweep for the text-operator family: the
tokenize/lower contract (`F.lower` + `\\W+` split mirrored as DuckDB
`lower` + `string_split_regex`) must hold beyond ASCII — accents,
ligatures, fullwidth forms, Cyrillic, CJK, emoji, German sharp s.

Probed exhaustively when first written: the ONLY divergent codepoint
class found is U+0130 (LATIN CAPITAL LETTER I WITH DOT ABOVE, Turkish
İ) — Java/Spark lowercases it per Unicode SpecialCasing.txt to
'i' + U+0307 COMBINING DOT ABOVE (two codepoints; the combining mark
then splits the token on \\W+), while DuckDB lowercases it to plain
'i'. That one-codepoint divergence is pinned below as a DOCUMENTED
deviation; every other class must agree exactly.
"""

from __future__ import annotations

import pytest

from tests.corpus_utils import documents_table, make_sf_dir, sweep_queries

# Every non-ASCII class that must AGREE (U+0130 deliberately excluded —
# see module docstring and test_u0130_divergence_is_pinned).
UNICODE_TEXTS = [
    "Hello WORLD foo_bar 42",
    "Crème brûlée CAFÉ naïve",
    "日本語 テキスト 漢字",
    "Привет МИР тест",
    "emoji 😀 mix 🚀 end",
    "ß STRASSE straße",
    "tab\tnewline\nmix  spaces",
    "ﬁligature ﬂow",
    "ＦＵＬＬＷＩＤＴＨ　ｔｅｘｔ",
    "mixed ÉCOLE école 1234 _under_",
    "ırmak kırmızı",  # dotless ı (U+0131) round-trips fine
]

TEXT_QUERIES = (
    "text_token_stats",
    "dedup_normalized",
    "top_bigrams_corpus",
    "lang_id_heuristic",
    "doc_fingerprints",
    "doc_quality_scores",
    "pii_redaction",
    "chunk_documents",
    "simhash_portable",
    "neardup_jaccard_pairs",
    "doc_repetition_scores",
    "tfidf_top_terms",
    "quality_threshold_prune",
    "doc_bigram_logprob",
    "line_dedup_across_docs",
    # r10: md5 over unicode text must hash the identical UTF-8 bytes on
    # both engines; blocklist token matching is exact-lowercase
    "corpus_dedup_rounds",
    "blocklist_filter_verdicts",
    "corpus_drift_kl",
)


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory) -> str:
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_unicode")),
        {"documents": documents_table(UNICODE_TEXTS)},
    )


def test_text_queries_agree_on_unicode_corpus(spark, unicode_sf_dir):
    failures = sweep_queries(spark, unicode_sf_dir, TEXT_QUERIES)
    assert not failures, failures


def test_u0130_divergence_is_pinned(spark):
    """The documented deviation: Spark lowercases U+0130 per Unicode
    SpecialCasing ('i' + combining dot -> the mark splits the token),
    DuckDB to plain 'i'. If either engine changes behavior, this test
    fires and the oracle-domain note in the tokenizer docstring must be
    revisited."""
    import duckdb

    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([("İSTANBUL",)], "t string").select(
        F.filter(F.split(F.lower("t"), r"\W+"), lambda x: x != "").alias("toks")
    )
    assert list(sdf.collect()[0]["toks"]) == ["i", "stanbul"]
    (dtoks,) = (
        duckdb.connect()
        .execute(
            "SELECT list_filter(string_split_regex(lower('İSTANBUL'), '\\W+'),"
            " t -> t <> '')"
        )
        .fetchone()
    )
    assert list(dtoks) == ["istanbul"]
