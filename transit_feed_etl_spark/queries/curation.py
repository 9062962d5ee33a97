"""Training-data curation operators over `documents` (EXT, north star):
deterministic sampling and benchmark-contamination detection — the
selection steps a 100 TB pretraining pipeline runs after dedup/quality.

Design notes:
- Sampling is HASH-determined, not rand(): reproducible across runs,
  engines, and partitionings (rand() is none of those), and it needs no
  shuffle at all — the predicate evaluates per-row in the scan stage
  and pushes down. The hash is the md5-derived portable_hash60
  (operators/minhash.py), so every sample decision value-checks against
  DuckDB.
- Stratified sampling = one window shuffle keyed on the stratum; the
  per-stratum order is (hash, doc_id) — a deterministic uniform
  permutation, so quota k takes a uniform k-subset per stratum.
- Contamination = shingle equi-join of the corpus against the
  benchmark subset: shuffle keys are 8-byte shingle hashes, candidate
  volume is bounded by shared-shingle frequency exactly like the
  near-dup join (queries/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from transit_feed_etl_spark.caching import persist_tracked
from transit_feed_etl_spark.io import table, table_par
from transit_feed_etl_spark.operators import minhash as MH
from transit_feed_etl_spark.operators import textfns as TX
from transit_feed_etl_spark.registry import register

# portable_hash60 of a doc_id, identical in both engines (see
# operators/minhash.py::portable_hash60)
_H60_ID_SQL = (
    "CAST(CAST(CONCAT('0x', SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS UBIGINT) AS BIGINT)"
)


def _h60_id(col: str = "doc_id"):
    return MH.portable_hash60(F.col(col).cast("string"))


@register(
    "hash_sample_documents",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM (SELECT doc_id, lang, n_chars, {_H60_ID_SQL} AS h FROM documents)
    WHERE h % 100 < 10
    ORDER BY doc_id
    """,
)
def hash_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample: keep docs whose portable
    content-id hash falls under the rate cutoff. Reproducible across
    runs/engines/partitionings (rand() is none of those) and entirely
    shuffle-free — the predicate evaluates in the scan stage. At 100 TB
    this is THE way to cut a stable dev subset: re-running selects the
    same documents, and adding new data never reshuffles old decisions."""
    d = table(spark, sf_dir, "documents")
    return (
        d.withColumn("h", _h60_id())
        .filter(F.col("h") % 100 < 10)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "stratified_sample_by_lang",
    oracle=f"""
    SELECT lang, doc_id, rk FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
      FROM (SELECT lang, doc_id, {_H60_ID_SQL} AS h FROM documents)
    )
    WHERE rk <= 20
    ORDER BY lang, rk
    """,
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified quota sampling: a deterministic uniform 20-doc subset
    PER LANGUAGE (order by hash = random-but-reproducible permutation
    within each stratum). The balancing step for multilingual corpora
    where proportional sampling would starve low-resource strata. One
    window shuffle keyed on the stratum; skewed strata split fine
    because the quota evaluates per-partition after AQE."""
    d = table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("h", "doc_id")
    return (
        d.withColumn("h", _h60_id())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "doc_id", "rk")
        .orderBy("lang", "rk")
    )


# Benchmark set stand-in: every 53rd document (the driver testdata has
# no separate eval table; the operator shape is identical when the
# benchmark side is a real held-out relation).
_BENCH_PRED = "doc_id % 53 = 0"
_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')"
_SHINGLES_SQL = f"""
      SELECT doc_id,
             list_distinct(list_transform(range(1, GREATEST(LEN(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
"""


@register(
    "quality_filter_verdicts",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, {_TOKS_SQL} AS toks,
             string_split(text, chr(10)) AS lines
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, GREATEST(LEN(toks), 1)),
                    i -> toks[i] || ' ' || toks[i+1])) AS b
      FROM base WHERE LEN(toks) >= 2
    ),
    bgc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
    bgs AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS tot_c FROM bgc GROUP BY doc_id),
    sig AS (
      SELECT base.doc_id,
             CAST(LEN(toks) AS INT) AS n_tokens,
             ROUND(1.0 - CAST(LEN(list_distinct(lines)) AS DOUBLE)
                   / GREATEST(LEN(lines), 1), 6) AS dup_line_frac,
             ROUND(COALESCE(CAST(bgs.top_c AS DOUBLE) / bgs.tot_c, 0.0), 6)
               AS top_bigram_frac
      FROM base LEFT JOIN bgs ON bgs.doc_id = base.doc_id
    )
    SELECT doc_id, n_tokens, dup_line_frac, top_bigram_frac,
           CASE WHEN n_tokens < 10 THEN 0
                WHEN n_tokens > 10000 THEN 0
                WHEN dup_line_frac > 0.3 THEN 0
                WHEN top_bigram_frac > 0.2 THEN 0 ELSE 1 END AS keep,
           CASE WHEN n_tokens < 10 THEN 'too_short'
                WHEN n_tokens > 10000 THEN 'too_long'
                WHEN dup_line_frac > 0.3 THEN 'repetitive_lines'
                WHEN top_bigram_frac > 0.2 THEN 'repetitive_ngrams'
           END AS drop_reason
    FROM sig
    ORDER BY doc_id
    """,
)
def quality_filter_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality filtering with per-document verdicts and
    drop reasons — the Gopher/C4-style repetition rules: token-count
    bounds, duplicate-line fraction, and top-bigram mass fraction. The
    signals are single-pass Catalyst expressions plus ONE doc-keyed
    aggregate for the bigram stats (partial-aggregatable — the shuffle
    carries (doc, bigram) counts, not text). Rules compare the ROUNDED
    fractions so engine boundary behavior is identical; the whole
    decision table value-checks against DuckDB."""
    d = table_par(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        TX.tokens("text").alias("toks"),
        F.split("text", "\n").alias("lines"),
    )
    bg = base.filter(F.size("toks") >= 2).select(
        "doc_id", F.explode(TX.word_shingles(F.col("toks"), 2)).alias("b")
    )
    bgs = (
        bg.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("tot_c"))
    )
    dup_line = F.round(
        1.0
        - F.size(F.array_distinct("lines")).cast("double")
        / F.greatest(F.size("lines"), F.lit(1)),
        6,
    )
    top_bg = F.round(
        F.coalesce(F.col("top_c").cast("double") / F.col("tot_c"), F.lit(0.0)), 6
    )
    sig = (
        base.join(bgs, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            dup_line.alias("dup_line_frac"),
            top_bg.alias("top_bigram_frac"),
        )
    )
    keep = (
        F.when(F.col("n_tokens") < 10, 0)
        .when(F.col("n_tokens") > 10000, 0)
        .when(F.col("dup_line_frac") > 0.3, 0)
        .when(F.col("top_bigram_frac") > 0.2, 0)
        .otherwise(1)
    )
    reason = (
        F.when(F.col("n_tokens") < 10, "too_short")
        .when(F.col("n_tokens") > 10000, "too_long")
        .when(F.col("dup_line_frac") > 0.3, "repetitive_lines")
        .when(F.col("top_bigram_frac") > 0.2, "repetitive_ngrams")
    )
    return sig.select(
        "doc_id",
        "n_tokens",
        "dup_line_frac",
        "top_bigram_frac",
        keep.alias("keep"),
        reason.alias("drop_reason"),
    ).orderBy("doc_id")


_PACK_BUDGET = 512
_PACK_BUCKETS = 8


@register(
    "pack_sequences",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             CAST(({_H60_ID_SQL}) % {_PACK_BUCKETS} AS INT) AS bucket,
             -- NULL text packs as a zero-token doc (null-text sweep)
             CAST(COALESCE(LEN({_TOKS_SQL}), 0) AS INT) AS n_tokens,
             {_H60_ID_SQL} AS h
      FROM documents
    ),
    o AS (
      SELECT doc_id, bucket, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS rn
      FROM d
    ),
    fill AS (
      -- cnt-based close (not acc > 0): zero-token docs keep acc at 0
      -- and an oversized successor must still open its own pack
      SELECT bucket, rn, doc_id, n_tokens, n_tokens AS acc,
             1 AS cnt, 0 AS pack
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN f.cnt > 0 AND f.acc + o.n_tokens > {_PACK_BUDGET}
                  THEN o.n_tokens ELSE f.acc + o.n_tokens END,
             CASE WHEN f.cnt > 0 AND f.acc + o.n_tokens > {_PACK_BUDGET}
                  THEN 1 ELSE f.cnt + 1 END,
             CASE WHEN f.cnt > 0 AND f.acc + o.n_tokens > {_PACK_BUDGET}
                  THEN f.pack + 1 ELSE f.pack END
      FROM fill f JOIN o ON o.bucket = f.bucket AND o.rn = f.rn + 1
    )
    SELECT doc_id, bucket, CAST(bucket * 100000 + pack AS BIGINT) AS pack_id,
           n_tokens
    FROM fill
    ORDER BY doc_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing (operators/packing.py): documents
    hash-bucketed, each bucket packed by a deterministic next-fit fold
    into <= 512-token packs inside one applyInPandas task. The fold is
    order-deterministic, so the DuckDB oracle replays it row by row as
    a recursive CTE — the packing DECISIONS value-check, not just
    aggregate stats. Packing efficiency is a direct pretraining cost
    multiplier; per-bucket independence is what lets it scale out."""
    from transit_feed_etl_spark.operators.packing import pack_documents

    d = table_par(spark, sf_dir, "documents")
    # NULL text -> NULL toks -> NULL size: pack as a zero-token doc
    # (matches the oracle's COALESCE; the fold itself also guards)
    prepped = d.select(
        "doc_id",
        F.when(F.col("text").isNotNull(), F.size(TX.tokens("text")))
        .otherwise(F.lit(0))
        .alias("n_tokens"),
        _h60_id().alias("h"),
    )
    return pack_documents(
        prepped, budget=_PACK_BUDGET, n_buckets=_PACK_BUCKETS
    ).orderBy("doc_id")


@register(
    "benchmark_contamination",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    e AS (SELECT doc_id, UNNEST(sh) AS s FROM sh WHERE LEN(sh) > 0),
    bench AS (SELECT doc_id, s FROM e WHERE {_BENCH_PRED}),
    train AS (SELECT doc_id, s FROM e WHERE NOT ({_BENCH_PRED})),
    hits AS (
      SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
             COUNT(*) AS n_shared
      FROM train t JOIN bench b ON t.s = b.s
      GROUP BY t.doc_id, b.doc_id
    ),
    sizes AS (SELECT doc_id, LEN(sh) AS n FROM sh)
    SELECT h.train_id, h.bench_id, CAST(h.n_shared AS INT) AS n_shared,
           ROUND(CAST(h.n_shared AS DOUBLE) / sz.n, 6) AS overlap_frac
    FROM hits h JOIN sizes sz ON sz.doc_id = h.bench_id
    WHERE CAST(h.n_shared AS DOUBLE) / sz.n >= 0.5
    ORDER BY train_id, bench_id
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination detection: flag training documents
    sharing >= 50% of a benchmark document's word-3-gram shingles — the
    n-gram-overlap decontamination standard for pretraining corpora
    (the GPT-3/C4 papers' method, expressed as one shingle equi-join).
    Shuffle carries (shingle, doc_id) pairs; the benchmark side is tiny
    (every 53rd doc here), so candidate volume stays bounded. At 100 TB
    the bench shingle relation broadcasts."""
    d = table_par(spark, sf_dir, "documents")
    toks = d.select("doc_id", TX.tokens("text").alias("toks"))
    sh = persist_tracked(
        toks.select(
            "doc_id", F.array_distinct(TX.word_shingles(F.col("toks"), 3)).alias("sh")
        )
    )
    e = sh.select("doc_id", F.explode("sh").alias("s"))
    is_bench = F.col("doc_id") % 53 == 0
    bench = e.filter(is_bench)
    train = e.filter(~is_bench)
    hits = (
        train.alias("t")
        .join(F.broadcast(bench.alias("b")), F.col("t.s") == F.col("b.s"))
        .groupBy(
            F.col("t.doc_id").alias("train_id"), F.col("b.doc_id").alias("bench_id")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = sh.select(F.col("doc_id").alias("bench_id"), F.size("sh").alias("n"))
    frac = F.col("n_shared").cast("double") / F.col("n")
    return (
        hits.join(F.broadcast(sizes), "bench_id")
        .filter(frac >= 0.5)
        .select(
            "train_id",
            "bench_id",
            F.col("n_shared").cast("int").alias("n_shared"),
            F.round(frac, 6).alias("overlap_frac"),
        )
        .orderBy("train_id", "bench_id")
    )


@register(
    "dataset_split_assignment",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, {_H60_ID_SQL} AS hid FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
             CASE WHEN hid % 100 < 90 THEN 'train'
                  WHEN hid % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM h
    )
    SELECT split, lang, COUNT(*) AS n, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM s GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5) by portable content-id
    hash — the split survives re-runs, engine changes, repartitioning,
    and INCREMENTAL data arrival (new docs never flip old assignments —
    rand()/randomSplit guarantee none of those). Assignment is a pure map
    over the scan; the per-(split, lang) audit is the only shuffle."""
    d = table(spark, sf_dir, "documents")
    h = F.col("hid") % 100
    split = (
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test")
    )
    return (
        d.withColumn("hid", _h60_id())
        .withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split", "lang")
    )


@register(
    "weighted_sample_by_quality",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, n_chars,
             LEAST(1.0, n_chars / 500.0) AS wt,
             {_H60_ID_SQL} AS hid
      FROM documents
    )
    SELECT doc_id, lang, n_chars,
           CAST(FLOOR(wt * 1e6) AS BIGINT) AS wt_e6
    FROM w
    WHERE hid % 1000000 < CAST(FLOOR(wt * 1e6) AS BIGINT)
    ORDER BY doc_id
    """,
)
def weighted_sample_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-WEIGHTED deterministic sampling: each document is kept
    with probability proportional to its quality weight (here
    min(1, n_chars/500)), decided by comparing the portable content hash
    against the integer-scaled weight — same reproducibility guarantees
    as `hash_sample_documents` (stable across engines, partitionings,
    and incremental arrival) but with per-document rates: the upsampling
    /downsampling knob every data-mixing recipe needs. Pure scan-stage
    predicate, zero shuffle."""
    d = table(spark, sf_dir, "documents")
    wt = F.least(F.lit(1.0), F.col("n_chars") / 500.0)
    wt_e6 = F.floor(wt * 1e6).cast("long")
    return (
        d.withColumn("hid", _h60_id())
        .withColumn("wt_e6", wt_e6)
        .filter(F.col("hid") % 1000000 < F.col("wt_e6"))
        .select("doc_id", "lang", "n_chars", "wt_e6")
        .orderBy("doc_id")
    )


_MIX_TARGETS = (("src0", 0.5), ("src1", 0.3), ("src2", 0.2))  # target mixture


@register(
    "mixture_resample_by_source",
    oracle=f"""
    WITH tgt(source, share) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
    pool AS (SELECT doc_id, source FROM documents
             WHERE source IN ('src0', 'src1', 'src2')),
    sizes AS (SELECT source, COUNT(*) AS n_src FROM pool GROUP BY source),
    tot AS (SELECT COUNT(*) AS n FROM pool),
    rates AS (
      SELECT s.source,
             LEAST(1.0, t.share * (SELECT n FROM tot) / s.n_src) AS keep_rate
      FROM sizes s JOIN tgt t ON t.source = s.source
    ),
    kept AS (
      SELECT p.doc_id, p.source
      FROM pool p JOIN rates r ON r.source = p.source
      WHERE {_H60_ID_SQL} % 1000000 < CAST(FLOOR(r.keep_rate * 1e6) AS BIGINT)
    )
    SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM kept GROUP BY source ORDER BY source
    """,
)
def mixture_resample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture targeting: down-sample each source toward target
    corpus shares (50/30/20 here) with per-source keep rates derived
    from actual counts, decided per document by the portable content
    hash — deterministic, incremental-stable, and engine-reproducible
    like every sampler in this module. Two tiny aggregates (per-source
    counts) broadcast back onto the scan; the data pass itself is one
    shuffle-free filter. This is the mixing step between curation and
    packing in a training-data recipe."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("source").isin([s for s, _ in _MIX_TARGETS])
    )
    tgt = spark.createDataFrame(list(_MIX_TARGETS), ["source", "share"])
    sizes = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    total = d.agg(F.count(F.lit(1)).alias("n"))
    rates = (
        sizes.join(F.broadcast(tgt), "source")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            F.least(
                F.lit(1.0), F.col("share") * F.col("n") / F.col("n_src")
            ).alias("keep_rate"),
        )
    )
    kept = (
        d.join(F.broadcast(rates), "source")
        .withColumn("hid", _h60_id())
        .filter(
            F.col("hid") % 1000000
            < F.floor(F.col("keep_rate") * 1e6).cast("long")
        )
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


@register(
    "k_anonymity_audit",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, group_size,
           group_size < 5 AS below_k
    FROM g
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit for a release candidate: group by the quasi-
    identifier tuple (nation, market segment) and flag equivalence
    classes smaller than k=5 — the rows a k-anonymity release would
    have to suppress or generalize. Complements pii_redaction (row
    content) with the aggregation-side re-identification check. One
    combinable count aggregation — skew-free at any scale."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .withColumn("below_k", F.col("group_size") < 5)
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "quality_threshold_prune",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\\W+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
             ROUND(CAST(LEN(list_distinct(toks)) AS DOUBLE) / LEN(toks), 6) AS s6
      FROM t WHERE LEN(toks) > 0
    ),
    thr AS (SELECT ROUND(QUANTILE_CONT(s6, 0.2), 6) AS thr FROM s)
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN s6 >= (SELECT thr FROM thr)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(MIN(CASE WHEN s6 >= (SELECT thr FROM thr) THEN s6 END), 6)
             AS min_kept_score,
           (SELECT thr FROM thr) AS threshold
    FROM s GROUP BY lang ORDER BY lang
    """,
)
def quality_threshold_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL-quantile quality pruning — 'drop the bottom 20% by score',
    the corpus-relative filter every curation recipe applies after
    per-document scoring (absolute thresholds like
    `quality_filter_verdicts` drift as the corpus mix shifts; a
    quantile threshold self-calibrates). Score = distinct-token ratio
    (the Gopher repetition signal); threshold = the exact interpolated
    20th percentile over the WHOLE corpus (Spark `percentile` == DuckDB
    `quantile_cont`, rounded to 6dp to absorb last-ulp interpolation
    drift — the `exact_percentiles` contract); keep-or-drop compares
    the 6dp-rounded score against the 6dp-rounded threshold so the
    boundary row set is bit-identical cross-engine.

    Scale design: scoring is scan-stage; the threshold is ONE
    aggregate reduced to a single row and broadcast back onto the scan
    (tiny-anchor join, no corpus shuffle for the filter); the audit is
    one per-lang groupBy. The exact percentile buffers values by
    design here (the yardstick, same stance as `exact_percentiles`);
    the 100 TB swap is one line — `percentile_approx`, the plan-pinned
    bounded-memory path of `approx_percentiles_sketch_only`."""
    d = table_par(spark, sf_dir, "documents").withColumn("toks", TX.tokens("text"))
    s6 = F.round(
        F.size(F.array_distinct("toks")).cast("double") / F.size("toks"), 6
    )
    s = d.filter(F.size("toks") > 0).select("doc_id", "lang", s6.alias("s6"))
    thr = s.agg(F.round(F.percentile("s6", F.lit(0.2)), 6).alias("threshold"))
    kept_score = F.when(F.col("s6") >= F.col("threshold"), F.col("s6"))
    return (
        s.join(F.broadcast(thr))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(F.col("s6") >= F.col("threshold"), 1).otherwise(0)
            ).alias("n_kept"),
            F.round(F.min(kept_score), 6).alias("min_kept_score"),
            F.min("threshold").alias("threshold"),
        )
        .orderBy("lang")
    )


# C4-style blocklist filtering: the "bad words" stage that drops any
# page containing a blocklisted term. The list is fixed and tiny (real
# pipelines ship a few hundred terms); 'dup' occurs in ~5% of the
# synthetic corpus (df=25/500 at sf0.001 — the only moderate-df term in
# the dense synthetic vocabulary) and 'zzzunseen' deliberately never
# occurs, exercising the zero-hit path.
_BLOCKLIST = ("dup", "zzzunseen")
_BLOCKLIST_SQL = "[" + ", ".join(f"'{t}'" for t in _BLOCKLIST) + "]"


@register(
    "blocklist_filter_verdicts",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    SELECT doc_id,
           CAST(COALESCE(LEN(toks), 0) AS INT) AS n_tokens,
           CAST(COALESCE(LEN(list_filter(toks,
                x -> list_contains({_BLOCKLIST_SQL}, x))), 0) AS INT)
             AS n_hits,
           CAST(COALESCE(LEN(list_filter(list_distinct(toks),
                x -> list_contains({_BLOCKLIST_SQL}, x))), 0) AS INT)
             AS n_distinct_hits,
           CAST(COALESCE(LEN(list_filter(toks,
                x -> list_contains({_BLOCKLIST_SQL}, x))), 0) AS INT) > 0
             AS dropped
    FROM t
    ORDER BY doc_id
    """,
)
def blocklist_filter_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist ("bad words") filtering — the canonical crawl
    curation stage that DROPS any page containing a blocklisted term
    (C4 dropped pages on ANY match; RefinedWeb keeps weighted scores —
    both verdicts are derivable from the emitted counts). Complements
    `quality_filter_verdicts` (structural repetition rules) with
    content-term policy filtering.

    Scale design: pure scan-stage projection — the blocklist is a fixed
    literal array baked into the plan (a few hundred terms in real
    pipelines; a broadcast lookup only becomes necessary at many
    thousands), and hit counting is a higher-order array filter over
    the token array, so the query moves ZERO corpus rows: no explode,
    no join, no aggregation — the only exchange is the presentation
    sort. Determinism: counts of exact lowercase token matches; no
    floats anywhere."""
    d = table_par(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    bl = F.array(*[F.lit(t) for t in _BLOCKLIST])
    hits = F.filter(toks, lambda x: F.array_contains(bl, x))
    dhits = F.filter(
        F.array_distinct(toks), lambda x: F.array_contains(bl, x)
    )
    nz = lambda c: F.coalesce(c, F.lit(0)).cast("int")  # noqa: E731
    return (
        d.select(
            "doc_id",
            nz(F.size(toks)).alias("n_tokens"),
            nz(F.size(hits)).alias("n_hits"),
            nz(F.size(dhits)).alias("n_distinct_hits"),
            (nz(F.size(hits)) > 0).alias("dropped"),
        )
        .orderBy("doc_id")
    )
