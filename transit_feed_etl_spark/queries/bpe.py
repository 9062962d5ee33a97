"""Distributed BPE vocabulary induction — tokenizer TRAINING as a
DataFrame computation (the step before token counting in a pretraining
recipe; byte-pair encoding per Sennrich et al. 2016, the construction
behind GPT-style tokenizers).

Each round: count adjacent symbol pairs across the corpus (weighted by
word frequency), pick the most frequent pair (deterministic lexicographic
tie-break), and apply the merge corpus-wide. The interesting distributed
parts:

- The corpus never leaves the cluster: rounds operate on the WORD
  FREQUENCY table (vocab-sized, not corpus-sized) — the standard BPE
  optimization, and exactly the relation a 100 TB corpus reduces to
  after one tokenize+count pass.
- Merge application is a pure string REPLACE thanks to a pipe-wrapped
  symbol encoding: each symbol is stored as ``|sym|`` and a merge of
  (a, b) is ``REPLACE(enc, '|a||b|', '|ab|')``. Left-to-right
  non-overlapping replace IS greedy BPE application, the wrapping makes
  cross-symbol false matches impossible (symbols are \\w-only, so they
  never contain the delimiter), and both engines implement REPLACE with
  identical semantics — which is what lets the DuckDB oracle replay
  TRAINING bit-for-bit, not just the final vocab.
- The per-round argmax is a 1-row broadcast; each round's encoded vocab
  is eagerly localCheckpoint'ed so round k's plan never nests rounds
  1..k-1 (SCALE.md "persist vs lineage cut").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table_par
from transit_feed_etl_spark.operators import textfns as TX
from transit_feed_etl_spark.registry import register

_ROUNDS = 3

_WORDS_SQL = """
      SELECT w AS word, COUNT(*) AS freq
      FROM (SELECT UNNEST(list_filter(string_split_regex(lower(text), '\\W+'),
                                      t -> t <> '')) AS w
            FROM documents)
      GROUP BY w
"""

_ENC0_SQL = f"""
      SELECT word, freq,
             list_reduce(list_transform(string_split(word, ''),
                                        c -> '|' || c || '|'),
                         (a, b) -> a || b) AS enc
      FROM ({_WORDS_SQL}) WHERE LEN(word) >= 2
"""


def _pairs_sql(enc_rel: str) -> str:
    return f"""
      SELECT syms[i] AS a, syms[i + 1] AS b, SUM(freq) AS cnt
      FROM (
        SELECT freq,
               string_split(trim(enc, '|'), '||') AS syms
        FROM {enc_rel}
      ), UNNEST(range(1, LEN(syms))) AS t(i)
      GROUP BY 1, 2
"""


def _bpe_oracle() -> str:
    parts = [f"WITH enc0 AS ({_ENC0_SQL})"]
    for k in range(_ROUNDS):
        parts.append(f""",
    pairs{k} AS ({_pairs_sql(f'enc{k}')}),
    top{k} AS (
      SELECT a, b, cnt FROM pairs{k} ORDER BY cnt DESC, a, b LIMIT 1
    ),
    enc{k + 1} AS (
      SELECT word, freq,
             REPLACE(enc, '|' || t.a || '||' || t.b || '|',
                     '|' || t.a || t.b || '|') AS enc
      FROM enc{k}, top{k} t
    )""")
    selects = " UNION ALL ".join(
        f"SELECT {k + 1} AS round, a AS pair_a, b AS pair_b, "
        f"a || b AS merged, cnt FROM top{k}"
        for k in range(_ROUNDS)
    )
    parts.append(f"\n    SELECT CAST(round AS INT) AS round, pair_a, pair_b,"
                 f" merged, CAST(cnt AS BIGINT) AS cnt"
                 f" FROM ({selects}) ORDER BY round")
    return "".join(parts)


def _learn_merges(
    spark: SparkSession, sf_dir: str
) -> tuple[list[DataFrame], DataFrame]:
    """Shared BPE training loop: returns (per-round 1-row merge frames,
    final encoded word-frequency table). Both the training query (which
    reports the merge table) and the encode query (which applies the
    final encoding back to documents) run this identical computation, so
    their oracles can replay the same unrolled-SQL training."""
    d = table_par(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(TX.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    enc = words.filter(F.length("word") >= 2).select(
        "word",
        "freq",
        F.concat_ws(
            "",
            F.transform(
                F.split("word", ""), lambda c: F.concat(F.lit("|"), c, F.lit("|"))
            ),
        ).alias("enc"),
    ).localCheckpoint()
    merges = []
    for k in range(_ROUNDS):
        syms = F.split(F.expr("trim(BOTH '|' FROM enc)"), r"\|\|")
        with_syms = enc.select("freq", syms.alias("syms"))
        idx = F.when(
            F.size("syms") >= 2, F.sequence(F.lit(1), F.size("syms") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = (
            with_syms.select(
                "freq",
                F.explode(idx).alias("i"),
                F.col("syms"),
            )
            .select(
                F.element_at("syms", F.col("i")).alias("a"),
                F.element_at("syms", F.col("i") + 1).alias("b"),
                "freq",
            )
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .localCheckpoint()  # 1 row; also snapshots the round's argmax
        )
        merges.append(
            top.select(
                F.lit(k + 1).alias("round"),
                F.col("a").alias("pair_a"),
                F.col("b").alias("pair_b"),
                F.concat("a", "b").alias("merged"),
                "cnt",
            )
        )
        enc = enc.crossJoin(F.broadcast(top)).select(
            "word",
            "freq",
            F.replace(
                F.col("enc"),
                F.concat(F.lit("|"), F.col("a"), F.lit("||"), F.col("b"), F.lit("|")),
                F.concat(F.lit("|"), F.col("a"), F.col("b"), F.lit("|")),
            ).alias("enc"),
        ).localCheckpoint()
    return merges, enc


@register("bpe_merge_training", oracle=_bpe_oracle())
def bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {_ROUNDS} BPE merges over the document corpus;
    returns the merge table (round, pair, merged symbol, corpus count) —
    the artifact a tokenizer trainer persists."""
    merges, _ = _learn_merges(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.select(
        F.col("round").cast("int").alias("round"),
        "pair_a",
        "pair_b",
        "merged",
        F.col("cnt").cast("bigint").alias("cnt"),
    ).orderBy("round")


def _bpe_encode_oracle() -> str:
    """Replays training (same CTEs as _bpe_oracle), then applies the
    final encoding back to per-document word counts: a word of k merged
    symbols contributes k tokens; words shorter than 2 chars (absent
    from the merge table) stay single tokens."""
    parts = [f"WITH enc0 AS ({_ENC0_SQL})"]
    for k in range(_ROUNDS):
        parts.append(f""",
    pairs{k} AS ({_pairs_sql(f'enc{k}')}),
    top{k} AS (
      SELECT a, b, cnt FROM pairs{k} ORDER BY cnt DESC, a, b LIMIT 1
    ),
    enc{k + 1} AS (
      SELECT word, freq,
             REPLACE(enc, '|' || t.a || '||' || t.b || '|',
                     '|' || t.a || t.b || '|') AS enc
      FROM enc{k}, top{k} t
    )""")
    parts.append(f""",
    syms AS (
      SELECT word,
             LEN(string_split(trim(enc, '|'), '||')) AS n_syms
      FROM enc{_ROUNDS}
    ),
    wc AS (
      SELECT doc_id, w AS word, COUNT(*) AS c
      FROM (SELECT doc_id,
                   UNNEST(list_filter(string_split_regex(lower(text), '\\W+'),
                                      t -> t <> '')) AS w
            FROM documents)
      GROUP BY 1, 2
    )
    SELECT wc.doc_id,
           CAST(SUM(wc.c) AS BIGINT) AS n_words,
           CAST(SUM(wc.c * COALESCE(s.n_syms, 1)) AS BIGINT) AS n_bpe_tokens
    FROM wc LEFT JOIN syms s ON s.word = wc.word
    GROUP BY wc.doc_id
    ORDER BY wc.doc_id""")
    return "".join(parts)


@register("bpe_encode_token_counts", oracle=_bpe_encode_oracle())
def bpe_encode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode every document with the {_ROUNDS}
    learned BPE merges and report per-document word and BPE-token counts
    — the token-budget accounting pass a pretraining pipeline runs after
    tokenizer training.

    Scale: merges are applied to the WORD-FREQUENCY table (vocab-sized),
    never to the corpus; per-doc counts come from joining doc->word
    counts against the vocab's symbols-per-word — so the corpus-sized
    relations only ever flow through tokenize+count aggregations."""
    _, enc = _learn_merges(spark, sf_dir)
    n_syms = F.size(F.split(F.expr("trim(BOTH '|' FROM enc)"), r"\|\|"))
    vocab = enc.select("word", n_syms.alias("n_syms"))
    d = table_par(spark, sf_dir, "documents")
    wc = (
        d.select("doc_id", F.explode(TX.tokens("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        wc.join(vocab, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum(F.col("c") * F.coalesce("n_syms", F.lit(1)))
            .cast("bigint")
            .alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )
