"""Text-analysis queries over `documents` (EXT operators from
BASELINE.json's north star: language-ID, quality scoring, token counting,
document fingerprinting). All pure Catalyst expressions (higher-order
array functions) — no Python UDFs — so they scale to 100 TB of text as
embarrassingly-parallel map work with zero shuffle.

Oracle mirrors use DuckDB list functions; fingerprints use md5 on both
sides (identical hex output) so value hashes match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table, table_par
from transit_feed_etl_spark.operators import textfns as TX
from transit_feed_etl_spark.registry import register

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')"


@register(
    "text_token_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
    )
    SELECT
      doc_id,
      LENGTH(text) AS n_chars,
      CAST(LEN(toks) AS INT) AS n_tokens,
      CAST(LEN(regexp_extract_all(text, '\\w+|[^\\w \\t\\n\\x0B\\f\\r]')) AS INT) AS n_bpe_tokens,
      ROUND(CASE WHEN LEN(toks) > 0
            THEN CAST(LENGTH(REGEXP_REPLACE(text, '[ \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE) / LEN(toks)
            ELSE 0 END, 6) AS avg_token_len,
      ROUND(CASE WHEN LENGTH(text) > 0
            THEN CAST(LENGTH(REGEXP_REPLACE(text, '[\\w \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
                 / LENGTH(text) ELSE 0 END, 6) AS punct_ratio,
      ROUND(CASE WHEN LEN(toks) > 0
            THEN CAST(LEN(list_filter(toks,
                   t -> list_contains(['the','a','and','of','to','in','is'], t)))
                 AS DOUBLE) / LEN(toks) ELSE 0 END, 6) AS stopword_ratio
    FROM t
    ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality signals: whitespace tokens, BPE-ish regex
    tokens, avg token length, punctuation ratio, stopword ratio."""
    d = table_par(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    d = d.withColumn("toks", toks)
    nt = F.size("toks")
    nonspace = F.length(F.regexp_replace(F.col("text"), rf"[{TX.WS}]", ""))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        nt.alias("n_tokens"),
        TX.bpe_ish_token_count("text").alias("n_bpe_tokens"),
        F.round(
            F.when(nt > 0, nonspace.cast("double") / nt).otherwise(F.lit(0.0)), 6
        ).alias("avg_token_len"),
        F.round(TX.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(TX.stopword_ratio(F.col("toks")), 6).alias("stopword_ratio"),
    ).orderBy("doc_id")


def _votes_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in TX.LANG_MARKERS[lang])
    return f"LEN(list_filter(toks, t -> list_contains([{markers}], t)))"


@register(
    "lang_id_heuristic",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents
    ),
    v AS (
      SELECT doc_id, lang,
             {_votes_sql("en")} AS v_en,
             {_votes_sql("de")} AS v_de,
             {_votes_sql("fr")} AS v_fr,
             {_votes_sql("es")} AS v_es
      FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
      -- NULL text -> NULL toks -> NULL votes: every comparison below is
      -- NULL, which would fall through to ELSE 'es'; route it to
      -- 'unknown' to match the engine (pinned by the null-text sweep)
      CASE WHEN GREATEST(v_en, v_de, v_fr, v_es) IS NULL THEN 'unknown'
           WHEN GREATEST(v_en, v_de, v_fr, v_es) = 0 THEN 'unknown'
           WHEN v_en = GREATEST(v_en, v_de, v_fr, v_es) THEN 'en'
           WHEN v_de = GREATEST(v_en, v_de, v_fr, v_es) THEN 'de'
           WHEN v_fr = GREATEST(v_en, v_de, v_fr, v_es) THEN 'fr'
           ELSE 'es' END AS pred_lang,
      CAST(v_en AS INT) AS v_en, CAST(v_de AS INT) AS v_de,
      CAST(v_fr AS INT) AS v_fr, CAST(v_es AS INT) AS v_es
    FROM v
    ORDER BY doc_id
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-marker votes per language, argmax
    with priority tie-break (en > de > fr > es), 'unknown' on zero votes."""
    d = table_par(spark, sf_dir, "documents").withColumn("toks", TX.tokens("text"))
    votes = {lang: TX.lang_votes(F.col("toks"), lang) for lang in TX.LANG_MARKERS}
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        TX.predict_lang(votes).alias("pred_lang"),
        votes["en"].alias("v_en"),
        votes["de"].alias("v_de"),
        votes["fr"].alias("v_fr"),
        votes["es"].alias("v_es"),
    ).orderBy("doc_id")


@register(
    "doc_fingerprints",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, text,
             list_transform(range(1, GREATEST(LEN(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
      FROM t
    )
    SELECT doc_id,
           MD5(TRIM(REGEXP_REPLACE(LOWER(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS content_fp,
           LIST_MIN(list_transform(shingles, s -> MD5(s))) AS min_shingle_fp,
           CAST(LEN(shingles) AS INT) AS n_shingles
    FROM s
    ORDER BY doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text (exact-dup key) +
    lexicographic-min shingle md5 (1-perm MinHash, near-dup signal)."""
    d = table_par(spark, sf_dir, "documents").withColumn("toks", TX.tokens("text"))
    d = d.withColumn("shingles", TX.word_shingles(F.col("toks"), 3))
    return d.select(
        "doc_id",
        TX.doc_fingerprint("text").alias("content_fp"),
        TX.min_shingle_fingerprint(F.col("shingles")).alias("min_shingle_fp"),
        F.size("shingles").alias("n_shingles"),
    ).orderBy("doc_id")


@register(
    "doc_quality_scores",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, n_chars, {_TOKS_SQL} AS toks FROM documents
    ),
    m AS (
      SELECT doc_id, n_chars,
        CAST(LEN(toks) AS DOUBLE) AS n_tokens,
        CASE WHEN LENGTH(text) > 0
             THEN CAST(LENGTH(REGEXP_REPLACE(text, '[\\w \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
                  / LENGTH(text) ELSE 0 END AS punct_ratio,
        CASE WHEN LEN(toks) > 0
             THEN CAST(LEN(list_filter(toks,
                    t -> list_contains(['the','a','and','of','to','in','is'], t)))
                  AS DOUBLE) / LEN(toks) ELSE 0 END AS stop_ratio,
        CASE WHEN LEN(toks) > 0
             THEN CAST(LEN(list_distinct(toks)) AS DOUBLE) / LEN(toks)
             ELSE 0 END AS uniq_ratio
      FROM t
    )
    SELECT doc_id,
      ROUND(0.25 * LEAST(n_tokens / 100.0, 1.0)
          + 0.25 * (1.0 - LEAST(punct_ratio * 4.0, 1.0))
          + 0.25 * LEAST(stop_ratio * 5.0, 1.0)
          + 0.25 * uniq_ratio, 6) AS quality_score,
      CAST(n_tokens AS INT) AS n_tokens,
      ROUND(uniq_ratio, 6) AS uniq_ratio
    FROM m
    ORDER BY doc_id
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality score in [0,1]: length signal,
    punctuation penalty, stopword naturalness, vocabulary diversity —
    the standard pre-training corpus filter shape."""
    d = table_par(spark, sf_dir, "documents").withColumn("toks", TX.tokens("text"))
    nt = F.size("toks").cast("double")
    punct = TX.punct_ratio("text")
    stop = TX.stopword_ratio(F.col("toks"))
    uniq = F.when(
        F.size("toks") > 0,
        F.size(F.array_distinct("toks")).cast("double") / F.size("toks"),
    ).otherwise(F.lit(0.0))
    score = (
        0.25 * F.least(nt / 100.0, F.lit(1.0))
        + 0.25 * (1.0 - F.least(punct * 4.0, F.lit(1.0)))
        + 0.25 * F.least(stop * 5.0, F.lit(1.0))
        + 0.25 * uniq
    )
    return d.select(
        "doc_id",
        F.round(score, 6).alias("quality_score"),
        F.size("toks").alias("n_tokens"),
        F.round(uniq, 6).alias("uniq_ratio"),
    ).orderBy("doc_id")


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({_TOKS_SQL.strip()}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             ROUND(tf.tf * (LN((1.0 + n.n_docs) / (1.0 + dfreq.df)) + 1.0), 6)
               AS tfidf
      FROM tf, n
      JOIN dfreq ON dfreq.term = tf.term
    )
    SELECT doc_id, term, tf, df, tfidf FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
      FROM scored
    ) WHERE rk <= 3
    ORDER BY doc_id, term
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF scoring (SURVEY §7 Phase 4): term frequency per doc ×
    smoothed inverse document frequency, top-3 terms per document.
    Composition: token explode → (doc,term) count → per-term distinct-doc
    count (broadcast back — the term dictionary is tiny relative to the
    corpus) → window top-k. All shuffles are keyed on terms or doc ids,
    never text; the doc-count scalar joins as a broadcast literal, not a
    driver-side collect embedded in the plan (re-plans cleanly per
    sf_dir). Per-row double math (LN, ×) is IEEE-identical across
    engines, so the oracle hash-matches despite floating point."""
    from transit_feed_etl_spark.caching import persist_tracked

    d = table_par(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    # persist tf and derive df FROM it: COUNT(DISTINCT doc_id) over the
    # raw token relation equals COUNT(*) over tf rows, so the second
    # tokenize+explode pass and its wide (term, doc_id) distinct
    # exchange disappear — df becomes a cheap re-agg of the compact
    # (doc, term) relation (measured 1.2s -> 0.8s at sf0.1)
    tf = persist_tracked(
        toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0),
                6,
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "term")
    )


@register(
    "doc_unigram_logprob",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    n AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab),
    lp AS (
      SELECT tok, CAST(ROUND(LN(cnt / total), 6) AS DECIMAL(18,6)) AS logp
      FROM vocab, n
    )
    SELECT tok.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(lp.logp) AS DOUBLE) AS sum_logprob,
           FLOOR(CAST(SUM(lp.logp) AS DOUBLE) / COUNT(*) * 1000000) / 1000000.0 AS avg_logprob
    FROM tok JOIN lp ON lp.tok = tok.tok
    GROUP BY tok.doc_id
    ORDER BY tok.doc_id
    """,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: per-document sum/mean token
    log-probability under the corpus's own unigram distribution — the
    cheap perplexity proxy used for quality filtering before a real LM
    scores the corpus. Vocabulary (distinct tokens) is aggregated once
    and BROADCAST back onto the exploded token stream — at 100 TB vocab
    << corpus is the standing assumption that makes this a map-side
    join. Determinism: each token's ln() is rounded to 6dp then summed
    as exact DECIMAL, so the per-doc sum is merge-order-independent and
    engine-identical (a raw double sum of logs would drift). avg_logprob
    is FLOORED at 6dp — floor((sum/n)*1e6)/1e6, all-IEEE ops on a
    bit-identical input double — because ROUND(double, 6) is NOT
    portable at half-boundaries: Spark rounds the shortest decimal
    representation HALF_UP while DuckDB rounds the binary double, and
    the r10 sf0.1 sweep caught a doc landing exactly on a boundary
    (the bigram twin, -3.4078655)."""
    d = table_par(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(TX.tokens("text")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("double").alias("total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(F.log(F.col("cnt") / F.col("total")), 6)
        .cast("decimal(18,6)")
        .alias("logp"),
    )
    return (
        tok.join(F.broadcast(lp), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("logp").cast("double").alias("sum_logprob"),
        )
        .withColumn(
            "avg_logprob",
            F.floor(F.col("sum_logprob") / F.col("n_tokens") * 1000000)
            / F.lit(1000000.0),
        )
        .orderBy("doc_id")
    )


_BM25_TERMS = ("key", "row", "fast", "merge")
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "bm25_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    d AS (SELECT doc_id, toks, LEN(toks) AS dl FROM t WHERE LEN(toks) > 0),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(CAST(dl AS DECIMAL(18,3))) AS DOUBLE) / COUNT(*) AS avgdl
      FROM d
    ),
    terms(term) AS (VALUES {", ".join(f"('{t}')" for t in _BM25_TERMS)}),
    df AS (
      SELECT term,
             (SELECT COUNT(*) FROM d
              WHERE list_contains(toks, terms.term)) AS n_term
      FROM terms
    ),
    idf AS (
      SELECT term,
             CAST(ROUND(LN(1.0 + ((SELECT n_docs FROM stats) - n_term + 0.5)
                               / (n_term + 0.5)), 6) AS DECIMAL(18,6)) AS idf
      FROM df
    ),
    tf AS (
      SELECT d.doc_id, i.term, i.idf, d.dl,
             LEN(list_filter(d.toks, x -> x = i.term)) AS tf
      FROM d CROSS JOIN idf i
    )
    SELECT doc_id,
           CAST(SUM(CAST(ROUND(
             CAST(idf AS DOUBLE) * tf * ({_BM25_K1} + 1)
             / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl
                                   / (SELECT avgdl FROM stats))), 6)
             AS DECIMAL(18,6))) AS DOUBLE) AS bm25
    FROM tf
    GROUP BY doc_id
    HAVING SUM(tf) > 0
    ORDER BY doc_id
    """,
)
def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring (k1=1.2, b=0.75) of every document
    against a fixed query-term set — THE lexical retrieval scorer
    (pairs with `tfidf_top_terms`; the dense tiers live in
    similarity.py). Corpus stats (N, avgdl, per-term df) are two tiny
    aggregates broadcast back onto a map-side per-doc score; per-term
    partials round to 6dp then sum as exact decimals so the
    ln()/division double work never drifts across merge orders."""
    d = table_par(spark, sf_dir, "documents")
    d = d.withColumn("toks", TX.tokens("text")).withColumn("dl", F.size("toks"))
    d = d.filter(F.col("dl") > 0)
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("dl").cast("decimal(18,3)")).cast("double") / F.count(F.lit(1))).alias(
            "avgdl"
        ),
    )
    terms = F.array(*[F.lit(t) for t in _BM25_TERMS])
    per_term = d.select(
        "doc_id",
        "dl",
        F.explode(
            F.transform(
                terms,
                lambda t: F.struct(
                    t.alias("term"),
                    F.size(F.filter(F.col("toks"), lambda x: x == t)).alias("tf"),
                ),
            )
        ).alias("e"),
    ).select("doc_id", "dl", F.col("e.term").alias("term"), F.col("e.tf").alias("tf"))
    dfreq = per_term.groupBy("term").agg(
        F.count_if(F.col("tf") > 0).alias("n_term")
    )
    idf = (
        dfreq.crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("n_term") + 0.5)
                    / (F.col("n_term") + 0.5)
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("idf"),
        )
    )
    scored = (
        per_term.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .withColumn(
            "part",
            F.round(
                F.col("idf").cast("double")
                * F.col("tf")
                * (_BM25_K1 + 1)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ).cast("decimal(18,6)"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("part").cast("double").alias("bm25"),
            F.sum("tf").alias("_tf_total"),
        )
        .filter(F.col("_tf_total") > 0)
        .drop("_tf_total")
        .orderBy("doc_id")
    )


@register(
    "inverted_index_postings",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t),
    p AS (
      SELECT term,
             CAST(COUNT(*) AS INT) AS df,
             list(doc_id ORDER BY doc_id) AS postings
      FROM tok GROUP BY term
    )
    SELECT term, df,
           postings[1] AS first_doc, postings[-1] AS last_doc,
           md5(array_to_string(list_transform(postings,
                 d -> CAST(d AS VARCHAR)), ',')) AS postings_md5
    FROM p
    WHERE df BETWEEN 2 AND 50
    ORDER BY df DESC, term
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the classic search-index build
    (term -> sorted posting list of doc ids + document frequency),
    restricted to the useful middle band (2 <= df <= 50: hapaxes index
    nothing, stopword-frequency terms are scanned not indexed). Posting
    lists ship with an md5 over the comma-joined ids so the oracle
    hash-checks CONTENTS, order included, not just shapes.

    Scale: the (doc, term) relation dedups with a partial-aggregatable
    distinct keyed on (doc_id, term); the build is TWO-PASS so giant
    posting lists (stopwords) never materialize: pass 1 computes df with
    an ordinary partial-aggregatable COUNT and filters to the
    2 <= df <= 50 band; pass 2 equi-joins the (doc_id, term) relation on
    the surviving term set and only THEN runs the
    sort_array(collect_list(...)) aggregate — a term that survives the
    band carries at most 50 doc ids into any aggregation buffer, so the
    skewed head of the term distribution (df in the millions at 100 TB)
    is dropped by a scalar count, never collected into a single reducer.
    Sorting per group after collection keeps the result deterministic at
    any partition count. The deduped token relation is cached across the
    two passes (one tokenization), traded for storage; at 100 TB swap
    the cache for recomputation or a checkpointed intermediate."""
    from transit_feed_etl_spark.caching import persist_tracked

    d = table_par(spark, sf_dir, "documents")
    tok = persist_tracked(
        d.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
        .dropDuplicates(["doc_id", "term"])
    )
    # pass 1: df band on a plain count — no lists exist yet
    banded = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).cast("int").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= 50))
    )
    # pass 2: only band-surviving terms reach the list-building aggregate
    p = (
        tok.join(banded, "term")
        .groupBy("term", "df")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
    )
    return (
        p.select(
            "term",
            "df",
            F.element_at("postings", 1).alias("first_doc"),
            F.element_at("postings", -1).alias("last_doc"),
            F.md5(
                F.array_join(
                    F.transform("postings", lambda x: x.cast("string")), ","
                )
            ).alias("postings_md5"),
        )
        .orderBy(F.col("df").desc(), "term")
    )


@register(
    "doc_bigram_logprob",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    d AS (SELECT doc_id, toks FROM t WHERE LEN(toks) >= 2),
    pair AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM d, UNNEST(generate_series(1, LEN(toks) - 1)) AS g(i)
    ),
    v AS (
      SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS vsz
      FROM (SELECT unnest(toks) AS tok FROM t) u
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pair GROUP BY w1, w2),
    pre AS (SELECT w1, COUNT(*) AS c1 FROM pair GROUP BY w1),
    lp AS (
      SELECT b.w1, b.w2,
             CAST(ROUND(LN((b.c12 + 1.0) / (p.c1 + v.vsz)), 6)
                  AS DECIMAL(18,6)) AS logp
      FROM big b JOIN pre p USING (w1), v
    )
    SELECT pair.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(lp.logp) AS DOUBLE) AS sum_logprob,
           FLOOR(CAST(SUM(lp.logp) AS DOUBLE) / COUNT(*) * 1000000) / 1000000.0 AS avg_logprob
    FROM pair JOIN lp ON lp.w1 = pair.w1 AND lp.w2 = pair.w2
    GROUP BY pair.doc_id
    ORDER BY pair.doc_id
    """,
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing: the CCNet-
    style perplexity-proxy quality filter one order up from
    `doc_unigram_logprob`. The model is the corpus's own bigram table —
    P(w2|w1) = (c(w1,w2) + 1) / (c_prefix(w1) + |V|), where c_prefix
    counts w1 as a bigram PREFIX (all positions except doc-final, so
    the conditional rows sum to 1 per prefix) and |V| is the distinct-
    token vocabulary — and each document is scored by the sum/mean
    log-probability of its adjacent token pairs (docs with < 2 tokens
    have no bigrams and no row, both engines).

    Scale design: the pair stream is built map-side (two shifted
    slices zipped, no self-join); bigram and prefix counts are
    key-width groupBys over the pair stream (partial aggs, two short
    tokens per key); the scored model is vocab²-BOUNDED (observed
    bigrams only, << corpus under the same vocab << corpus assumption
    `doc_unigram_logprob` pins) and BROADCAST back onto the pair
    stream, so the only corpus-scaled exchanges carry token pairs,
    never documents. Determinism: per-pair ln() rounded to 6dp then
    summed as exact DECIMAL — merge-order-independent, engine-identical
    (the `doc_unigram_logprob` contract); avg_logprob FLOORED at 6dp
    (not ROUND — see `doc_unigram_logprob`'s portability note; the r10
    sf0.1 sweep caught this query's doc 4599 on the -3.4078655
    half-boundary where the two engines' double ROUND disagree)."""
    from transit_feed_etl_spark.caching import persist_tracked

    d = table_par(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    n = F.size(toks)
    pair = (
        d.select("doc_id", toks.alias("toks"))
        .filter(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, F.size("toks") - 1).alias("w1"),
                    F.slice("toks", 2, F.size("toks") - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    pair = persist_tracked(pair)
    vsz = (
        d.select(F.explode(toks).alias("tok"))
        .agg(F.count_distinct("tok").cast("double").alias("vsz"))
    )
    big = pair.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    pre = pair.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    lp = (
        big.join(pre, "w1")
        .crossJoin(F.broadcast(vsz))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("vsz"))), 6
            )
            .cast("decimal(18,6)")
            .alias("logp"),
        )
    )
    return (
        pair.join(F.broadcast(lp), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("logp").cast("double").alias("sum_logprob"),
        )
        .withColumn(
            "avg_logprob",
            F.floor(F.col("sum_logprob") / F.col("n_bigrams") * 1000000)
            / F.lit(1000000.0),
        )
        .orderBy("doc_id")
    )


# Corpus distribution-drift monitoring: KL(P||Q) between the token
# distributions of two corpus snapshots (halves by doc_id parity — the
# deterministic testdata shim for "last week's crawl vs this week's").
# Add-one smoothing over the UNION vocabulary keeps every term finite.
_DRIFT_TOPK = 20

_DRIFT_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    c AS (
      SELECT tok,
             CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_a,
             CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_b
      FROM t GROUP BY tok
    ),
    n AS (
      SELECT CAST(SUM(c_a) AS BIGINT) AS na, CAST(SUM(c_b) AS BIGINT) AS nb,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM c
    ),
    m AS (
      SELECT c.tok, c.c_a, c.c_b,
             CAST(FLOOR(LN(
               (CAST((c.c_a + 1) AS DOUBLE) * (n.nb + n.v)) /
               (CAST((c.c_b + 1) AS DOUBLE) * (n.na + n.v))
             ) * 1000000) AS BIGINT) AS lnr_micro
      FROM c, n
    ),
    s AS (
      SELECT CAST(SUM(CAST(m.c_a + 1 AS DECIMAL(20,0))
                      * CAST(m.lnr_micro AS DECIMAL(12,0))) AS DOUBLE)
               / ((SELECT na + v FROM n) * 1000000.0) AS total_kl
      FROM m
    )
    SELECT m.tok, m.c_a, m.c_b,
           m.lnr_micro / 1000000.0 AS lnr,
           CAST(CAST(m.c_a + 1 AS DECIMAL(20,0))
                * CAST(m.lnr_micro AS DECIMAL(12,0)) AS DOUBLE)
             / ((SELECT na + v FROM n) * 1000000.0) AS kl_contrib,
           s.total_kl
    FROM m, s
    ORDER BY CAST(m.c_a + 1 AS DECIMAL(20,0))
             * CAST(m.lnr_micro AS DECIMAL(12,0)) DESC, m.tok
    LIMIT {_DRIFT_TOPK}
"""


@register("corpus_drift_kl", oracle=_DRIFT_ORACLE)
def corpus_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot distribution drift: KL(P||Q) between the
    unigram distributions of two corpus halves (doc_id parity — the
    deterministic stand-in for consecutive crawl snapshots), with the
    top-K drift-driving tokens and the corpus-level total. This is the
    monitoring stage a production pipeline runs after every ingest: a
    KL spike means the crawl mix shifted (new spam cluster, a source
    went dark) BEFORE it poisons training. Add-one smoothing over the
    union vocabulary keeps every term finite when a token exists in
    only one snapshot.

    Determinism: the transcendental is isolated per token —
    ln((c_a+1)(NB+V) / ((c_b+1)(NA+V))) over EXACT integer products
    (< 2^53, so the double division is bit-identical cross-engine) —
    then FLOORED at 6dp into integer micro-units (ADVICE r10: ROUND on
    a transcendental double is the exact Spark-vs-DuckDB half-boundary
    hazard the r10 sweep caught in `doc_bigram_logprob`; FLOOR over
    bit-identical IEEE doubles is portable — registry.py documents the
    hazard class). The KL numerator Σ (c_a+1)·lnr_micro is an exact
    integer sum: each product multiplies DECIMAL(20,0) × DECIMAL(12,0)
    operands (ADVICE r11 — a BIGINT product would silently wrap in
    Spark while DuckDB raises, once c_a ≳ 2e11 with |lnr_micro| ~ 3e7;
    the decimal operand widths are exact to c_a < 1e20 and
    |lnr_micro| < 1e12, far beyond the 100 TB domain where
    c_a ≤ total tokens ~ 2e15 and |lnr_micro| ≤ ln(NA+V)·1e6 ~ 4e7,
    and out-of-domain values fail LOUDLY on both engines), summed
    order-independently, and the single final double division by
    (NA+V)·1e6 is shared by every row. Ranking orders by the exact
    integer numerator with tok as total tie-break.

    Scale design: one explode→(tok)-keyed groupBy with partial aggs
    (the `text_token_stats` exchange class — short token keys, two
    longs); the three corpus constants reduce to ONE broadcast row;
    the model/total aggregates are vocab-bounded (<< corpus). No
    per-doc state anywhere — this runs on the full 100 TB stream at
    token-count cost."""
    from transit_feed_etl_spark.caching import persist_tracked

    d = table_par(spark, sf_dir, "documents")
    t = d.select("doc_id", F.explode(TX.tokens("text")).alias("tok"))
    c = t.groupBy("tok").agg(
        F.sum(
            F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)
        ).cast("bigint").alias("c_a"),
        F.sum(
            F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0)
        ).cast("bigint").alias("c_b"),
    )
    c = persist_tracked(c)
    n = c.agg(
        F.sum("c_a").cast("bigint").alias("na"),
        F.sum("c_b").cast("bigint").alias("nb"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    m = c.crossJoin(F.broadcast(n)).select(
        "tok",
        "c_a",
        "c_b",
        F.floor(
            F.log(
                ((F.col("c_a") + 1).cast("double") * (F.col("nb") + F.col("v")))
                / ((F.col("c_b") + 1).cast("double") * (F.col("na") + F.col("v")))
            )
            * 1000000
        )
        .cast("bigint")
        .alias("lnr_micro"),
        (F.col("na") + F.col("v")).alias("denom"),
    )
    m = persist_tracked(m)
    # exact integer product: DECIMAL(20,0) x DECIMAL(12,0) -> (33,0),
    # never the silent-wrap BIGINT multiply (ADVICE r11; docstring)
    prod = (F.col("c_a") + 1).cast("decimal(20,0)") * F.col("lnr_micro").cast(
        "decimal(12,0)"
    )
    s = m.select(prod.alias("num"), "denom").agg(
        (
            F.sum("num").cast("double")
            / (F.first("denom") * F.lit(1000000.0))
        ).alias("total_kl")
    )
    return (
        m.select(
            "tok",
            "c_a",
            "c_b",
            (F.col("lnr_micro") / F.lit(1000000.0)).alias("lnr"),
            (
                prod.cast("double")
                / (F.col("denom") * F.lit(1000000.0))
            ).alias("kl_contrib"),
            prod.alias("_rank"),
        )
        .crossJoin(F.broadcast(s))
        .orderBy(F.col("_rank").desc(), "tok")
        .limit(_DRIFT_TOPK)
        .drop("_rank")
    )
