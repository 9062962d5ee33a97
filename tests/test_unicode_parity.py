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

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from transit_feed_etl_spark.queries import QUERIES
from tests.oracle_utils import compare, run_oracle

SRC = "/root/testdata/sf0.001"

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
)


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_unicode"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(UNICODE_TEXTS)), pa.int64()),
                "text": pa.array(UNICODE_TEXTS, pa.string()),
                "lang": pa.array(["en"] * len(UNICODE_TEXTS), pa.string()),
                "source": pa.array(["web"] * len(UNICODE_TEXTS), pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in UNICODE_TEXTS], pa.int64()
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


def test_text_queries_agree_on_unicode_corpus(spark, unicode_sf_dir):
    failures = {}
    for name in TEXT_QUERIES:
        q = QUERIES[name]
        try:
            problems = compare(
                q.builder(spark, unicode_sf_dir),
                run_oracle(q.oracle, unicode_sf_dir),
            )
        except Exception as e:  # noqa: BLE001 — collect, report all at once
            problems = [f"exception: {e!r}"[:200]]
        if problems:
            failures[name] = problems[:2]
        spark.catalog.clearCache()
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
