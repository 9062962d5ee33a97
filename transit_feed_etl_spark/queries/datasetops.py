"""Dataset-maintenance operators: MERGE/upsert, SCD2 history builds,
cross-document duplicated-n-gram stats, and training-shard manifests.

These are the table-maintenance and dataset-assembly steps a 100 TB
training-data pipeline runs around the query engine proper:

- MERGE INTO (upsert) is the reference's catalog-insert (SURVEY A16,
  reference gtfs_rt_assets.py:170-190) generalized to the industry-
  standard three-way action (update / insert / keep). Spark has no
  MERGE over plain parquet, so we express it as the canonical full-
  outer join on the merge key — exactly what Delta/Iceberg compile
  MERGE into, minus the transactional commit.
- SCD2 (slowly-changing-dimension type 2) turns an append-only change
  feed into versioned effective-dated rows — one window over the
  natural key, no self-join.
- Duplicated-n-gram coverage is the cross-document repetition signal
  used by public web-corpus pipelines (Gopher/RefinedWeb/Dolma rules):
  unlike `doc_repetition_scores` (WITHIN-doc repetition,
  queries/cleaning.py) it measures how much of a document duplicates
  text seen in OTHER documents.
- The shard manifest is the last step before tokenization: assign every
  document to a training shard deterministically and emit per-shard
  accounting (doc/char totals + checksum) so a re-run can verify
  shard-level reproducibility without re-reading payloads.

Scale design notes are on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from transit_feed_etl_spark.caching import persist_tracked
from transit_feed_etl_spark.io import table, table_par
from transit_feed_etl_spark.operators import minhash as MH
from transit_feed_etl_spark.operators import textfns as TX
from transit_feed_etl_spark.registry import register

# portable_hash60 of doc_id (same convention as queries/curation.py)
_H60_ID_SQL = (
    "CAST(CAST(CONCAT('0x', SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS UBIGINT) AS BIGINT)"
)
_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')"


@register(
    "merge_upsert_customer_balance",
    oracle="""
    WITH src AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS delta
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    tgt AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 100
    )
    SELECT COALESCE(t.c_custkey, s.user_id) AS custkey,
           CASE WHEN t.c_custkey IS NOT NULL AND s.user_id IS NOT NULL
                  THEN 'update'
                WHEN t.c_custkey IS NULL THEN 'insert'
                ELSE 'keep' END AS action,
           t.c_acctbal AS old_balance,
           s.delta AS delta,
           CASE WHEN s.user_id IS NULL THEN t.c_acctbal
                WHEN t.c_custkey IS NULL THEN s.delta
                ELSE t.c_acctbal + s.delta END AS new_balance
    FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.user_id
    ORDER BY custkey
    """,
)
def merge_upsert_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics over plain DataFrames: a change feed of
    purchase deltas upserted into a balance dimension. MATCHED rows get
    `update` (balance + delta), source-only keys get `insert`, target-
    only keys get `keep` — the full three-action MERGE surface as ONE
    full-outer join, which is precisely the physical plan Delta Lake /
    Iceberg generate for MERGE (generalizes reference catalog insert,
    gtfs_rt_assets.py:170-190).

    Scale: the source side is pre-aggregated (purchase deltas partial-
    agg before the shuffle), so the join carries one row per key per
    side; both sides shuffle on the merge key once. Deltas sum through
    DECIMAL so the merged balance is partitioning-independent."""
    ev = table(spark, sf_dir, "events")
    src = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("delta")
        )
    )
    tgt = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select("c_custkey", "c_acctbal")
    )
    j = tgt.join(src, tgt.c_custkey == src.user_id, "full_outer")
    both = F.col("c_custkey").isNotNull() & F.col("user_id").isNotNull()
    return (
        j.select(
            F.coalesce("c_custkey", "user_id").alias("custkey"),
            F.when(both, "update")
            .when(F.col("c_custkey").isNull(), "insert")
            .otherwise("keep")
            .alias("action"),
            F.col("c_acctbal").alias("old_balance"),
            F.col("delta"),
            F.when(F.col("user_id").isNull(), F.col("c_acctbal"))
            .when(F.col("c_custkey").isNull(), F.col("delta"))
            .otherwise(F.col("c_acctbal") + F.col("delta"))
            .alias("new_balance"),
        )
        .orderBy("custkey")
    )


@register(
    "scd2_purchase_value_history",
    oracle="""
    SELECT user_id, version, value, effective_from, effective_to, is_current
    FROM (
      SELECT user_id,
             ROW_NUMBER() OVER w AS version,
             value,
             ts AS effective_from,
             LEAD(ts) OVER w AS effective_to,
             LEAD(ts) OVER w IS NULL AS is_current
      FROM events
      WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    ORDER BY user_id, version
    """,
)
def scd2_purchase_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension build from an append-only change feed: each
    purchase becomes a versioned row with [effective_from, effective_to)
    validity and an `is_current` flag on the open-ended latest version.
    ONE window shuffle on the natural key — no self-join, no per-key
    driver loop; at 100 TB the change feed shuffles once on user_id and
    every version row is derived from its in-partition successor."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        ev.select(
            "user_id",
            F.row_number().over(w).alias("version"),
            "value",
            F.col("ts").alias("effective_from"),
            nxt.alias("effective_to"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


@register(
    "dup_ngram_doc_stats",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 5
               THEN list_transform(range(1, len(toks) - 3),
                      i -> array_to_string(toks[i:i+4], ' '))
               ELSE [] END) AS gram
      FROM toks
    ),
    g AS (
      SELECT doc_id,
             CAST(CAST(CONCAT('0x', SUBSTR(md5(gram), 1, 15)) AS UBIGINT)
                  AS BIGINT) AS gh
      FROM sh
    ),
    cnt AS (SELECT gh, COUNT(DISTINCT doc_id) AS ndocs FROM g GROUP BY gh),
    per AS (
      SELECT g.doc_id,
             COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN cnt.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_grams
      FROM g JOIN cnt USING (gh)
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           COALESCE(per.n_grams, 0) AS n_grams,
           COALESCE(per.n_dup_grams, 0) AS n_dup_grams,
           CASE WHEN per.n_grams IS NULL THEN 0.0
                ELSE per.n_dup_grams / per.n_grams END AS dup_frac
    FROM documents d LEFT JOIN per USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def dup_ngram_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-document duplicated-n-gram coverage (RefinedWeb/Dolma-style
    dedup signal): the fraction of a document's word 5-grams that also
    occur in at least one OTHER document. Complements
    `doc_repetition_scores` (within-doc repetition) — together they are
    the standard repetition-based quality gate pair.

    Scale: grams shuffle as 8-byte portable hashes (never strings);
    global gram frequencies partial-aggregate map-side, so the exchange
    carries one row per distinct gram per partition, and the join back
    to per-doc grams is an equi-join on the hash. No all-pairs stage
    anywhere — cost is O(total grams), not O(docs^2)."""
    d = table_par(spark, sf_dir, "documents")
    # Two-step projection (tokens as an attribute BEFORE the shingle
    # lambda) — inlining tokens() into word_shingles re-tokenizes the
    # doc per element_at call (~100x measured; operators/minhash.py).
    toks = d.select("doc_id", TX.tokens("text").alias("toks"))
    # Materialize the hashed-gram relation ONCE: it feeds both the
    # global frequency count and the join back (same pattern as the
    # shingle cache in queries/dedup.py); released via release_caches().
    g = persist_tracked(
        toks.select(
            "doc_id",
            F.explode(TX.word_shingles(F.col("toks"), 5)).alias("gram"),
        ).select("doc_id", MH.portable_hash60(F.col("gram")).alias("gh"))
    )
    cnt = g.groupBy("gh").agg(F.countDistinct("doc_id").alias("ndocs"))
    per = (
        g.join(cnt, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0)).alias(
                "n_dup_grams"
            ),
        )
    )
    return (
        d.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.when(F.col("n_grams").isNull(), F.lit(0.0))
            .otherwise(F.col("n_dup_grams") / F.col("n_grams"))
            .alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "training_shard_manifest",
    oracle=f"""
    SELECT h % 16 AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(h % 1000003) AS BIGINT) AS checksum,
           MIN(h) AS min_h,
           MAX(h) AS max_h
    FROM (SELECT n_chars, {_H60_ID_SQL} AS h FROM documents)
    GROUP BY shard_id
    ORDER BY shard_id
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment + per-shard manifest:
    shard = content-id hash mod 16, with doc/char totals and a hash
    checksum per shard. The manifest is what makes a 100 TB tokenization
    run verifiable — re-running the assignment must reproduce identical
    per-shard counts and checksums before any shard is re-tokenized.

    Scale: assignment is a scan-stage expression (zero shuffle — same
    rationale as `hash_sample_documents`); the manifest aggregate
    partial-aggregates into 16 groups, so the exchange carries 16 rows
    per partition regardless of corpus size. Within-shard training order
    is (h, doc_id) — a deterministic uniform permutation needing no
    global sort."""
    d = table(spark, sf_dir, "documents")
    h = MH.portable_hash60(F.col("doc_id").cast("string"))
    return (
        d.select(F.col("n_chars"), h.alias("h"))
        .groupBy((F.col("h") % 16).alias("shard_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("h") % 1000003).alias("checksum"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        )
        .orderBy("shard_id")
    )


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a pre-existing
    aggregate STATE (events before the cutoff) merged with a DELTA
    batch's aggregate (events at/after the cutoff) by re-aggregating the
    union of the two partial states — never re-reading the historical
    raw data. The ORACLE is the full recompute over all events, so the
    parity check proves the merge law (count merges by sum, decimal sums
    merge exactly) rather than just replaying the same plan twice.

    Scale: this is THE pattern for keeping 100 TB rollups fresh — the
    daily job aggregates only the new partition and merges with the
    stored state table; decimal sums make the merged result bit-equal to
    a from-scratch recompute regardless of how history was batched."""
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )

    state = partial(ev.filter(F.col("ts") < cutoff))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    return (
        state.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "exact_substring_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    sh AS (
      SELECT doc_id, CAST(t.i AS INT) AS s, CAST(t.i + 4 AS INT) AS e,
             array_to_string(toks[t.i:t.i+4], ' ') AS gram
      FROM toks, UNNEST(range(1, len(toks) - 3)) AS t(i)
    ),
    g AS (
      SELECT doc_id, s, e,
             CAST(CAST(CONCAT('0x', SUBSTR(md5(gram), 1, 15)) AS UBIGINT)
                  AS BIGINT) AS gh
      FROM sh
    ),
    cnt AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
    dup AS (SELECT g.doc_id, g.s, g.e FROM g JOIN cnt USING (gh)),
    brk AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                  THEN 1 ELSE 0 END AS new_island
      FROM dup
    ),
    isl AS (
      SELECT doc_id, s, e,
             SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM brk
    ),
    spans AS (
      SELECT doc_id, island, MIN(s) AS ss, MAX(e) AS ee
      FROM isl GROUP BY doc_id, island
    ),
    per AS (
      SELECT doc_id, COUNT(*) AS n_spans,
             CAST(SUM(ee - ss + 1) AS BIGINT) AS dup_tokens,
             MAX(ee - ss + 1) AS max_span
      FROM spans GROUP BY doc_id
    ),
    ntk AS (SELECT doc_id, CAST(COALESCE(len(toks), 0) AS INT) AS n_tokens
            FROM toks)
    SELECT d.doc_id, ntk.n_tokens,
           COALESCE(per.n_spans, 0) AS n_spans,
           COALESCE(per.dup_tokens, 0) AS dup_tokens,
           COALESCE(per.max_span, 0) AS max_span,
           CASE WHEN ntk.n_tokens = 0 THEN 0.0
                ELSE COALESCE(per.dup_tokens, 0) / ntk.n_tokens END AS dup_frac
    FROM documents d
    JOIN ntk USING (doc_id)
    LEFT JOIN per USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup SPANS (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): the position-level
    complement of `dup_ngram_doc_stats`. A word 5-gram is "duplicated"
    when it appears in >= 2 distinct documents; each duplicated gram
    covers token positions [p, p+4]; overlapping-or-adjacent covered
    intervals merge into maximal SPANS per document (gaps-and-islands
    over one window). Output per doc: span count, duplicated-token
    total, longest span, duplicated fraction — exactly what the
    span-cutting dedup step needs to decide what to excise. (The
    production recipe uses ~50-token spans over bytes; 5 keeps the
    signal non-trivial on the synthetic corpus.)

    Scale: grams shuffle as 8-byte portable hashes with positions (no
    strings past the scan stage); the duplicated-gram filter is an
    equi-join on the hash against a HAVING-filtered partial-aggregated
    frequency relation; the islands merge is ONE window shuffle keyed on
    doc_id. No all-pairs stage — O(total grams) like the gram-count
    variant, plus one narrow window pass."""
    L = 5
    d = table_par(spark, sf_dir, "documents")
    # two-step projection: tokens as an attribute BEFORE the shingle
    # lambda (the ~100x re-tokenization trap, operators/minhash.py)
    toks = persist_tracked(d.select("doc_id", TX.tokens("text").alias("toks")))
    sh = toks.select(
        "doc_id", F.posexplode(TX.word_shingles(F.col("toks"), L)).alias("pos", "gram")
    )
    g = persist_tracked(
        sh.select(
            "doc_id",
            (F.col("pos") + 1).cast("int").alias("s"),
            (F.col("pos") + L).cast("int").alias("e"),
            MH.portable_hash60(F.col("gram")).alias("gh"),
        )
    )
    dup_gh = (
        g.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("gh")
    )
    dup = g.join(dup_gh, "gh").select("doc_id", "s", "e")
    w_prev = W.partitionBy("doc_id").orderBy("s").rowsBetween(
        W.unboundedPreceding, -1
    )
    w_run = W.partitionBy("doc_id").orderBy("s").rowsBetween(
        W.unboundedPreceding, 0
    )
    isl = dup.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1, 1
        ).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w_run))
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("s").alias("ss"), F.max("e").alias("ee")
    )
    per = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("ee") - F.col("ss") + 1).alias("dup_tokens"),
        F.max(F.col("ee") - F.col("ss") + 1).alias("max_span"),
    )
    # null text -> null toks: F.size(null) is -1 (legacy) or NULL (ANSI),
    # so guard explicitly to match the oracle's COALESCE(len(toks), 0).
    ntk = toks.select(
        "doc_id",
        F.when(F.col("toks").isNotNull(), F.size("toks"))
        .otherwise(F.lit(0))
        .alias("n_tokens"),
    )
    return (
        d.select("doc_id")
        .join(ntk, "doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.coalesce("max_span", F.lit(0)).alias("max_span"),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens")
            )
            .alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


# C4/RefinedWeb-style repeated-line removal: the line width (tokens per
# synthesized line) and the cross-document frequency threshold. The
# testdata documents carry no newlines, so line structure is
# synthesized deterministically — fixed 6-token chunks of the
# WS-collapsed text — the same testdata-shim pattern url_canonical_dedup
# (synthesized URLs) and html_boilerplate_extract (synthesized page
# shells) use; the removal/reconstruction machinery is the real stage.
_LINE_W = 6
_LINE_K = 3

_LINE_DEDUP_ORACLE = f"""
    WITH d0 AS (
      SELECT doc_id, trim(regexp_replace(COALESCE(text, ''),
                          '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS c
      FROM documents
    ),
    d AS (SELECT doc_id, string_split(c, ' ') AS t FROM d0 WHERE c <> ''),
    lines AS (
      SELECT doc_id, CAST(i AS INT) AS line_no,
             array_to_string(t[(i*{_LINE_W}+1):(i*{_LINE_W}+{_LINE_W})], ' ')
               AS line
      FROM d, UNNEST(generate_series(0,
               CAST(CEIL(LEN(t) / {_LINE_W}.0) AS INT) - 1)) AS g(i)
    ),
    freq AS (
      SELECT md5(line) AS h, COUNT(DISTINCT doc_id) AS nd
      FROM lines GROUP BY 1
    ),
    flagged AS (
      SELECT l.doc_id, l.line_no, l.line, (f.nd >= {_LINE_K}) AS is_boiler
      FROM lines l JOIN freq f ON f.h = md5(l.line)
    )
    SELECT doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           COALESCE(string_agg(CASE WHEN NOT is_boiler THEN line END,
                               ' ' ORDER BY line_no), '') AS cleaned_text
    FROM flagged
    GROUP BY doc_id
    ORDER BY doc_id
"""


@register("line_dedup_across_docs", oracle=_LINE_DEDUP_ORACLE)
def line_dedup_across_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-line removal — the C4/CCNet/RefinedWeb
    boilerplate stage that deletes every line occurring in >= K distinct
    documents (cookie banners, nav text, share buttons) and re-emits
    each document's cleaned text. Complements `dup_ngram_doc_stats`
    (which MEASURES cross-doc repetition) by actually REWRITING the
    corpus, and `doc_repetition_scores` (within-doc repetition).

    Line structure is synthesized as fixed 6-token chunks of the
    WS-collapsed text (the testdata carries no newlines — see
    _LINE_DEDUP_ORACLE's header note); docs with empty/NULL text have
    no lines and no row, both engines.

    Scale design (rebuilt r10, VERDICT r9 item 4): line BODIES never
    ride a join. The frequency pass and the flag join both run over the
    narrow (doc_id, line_no, md5) projection, so every exchange of
    corpus-scaled cardinality carries 32-hex digests + two ints — never
    line text (the dedup_exact width contract); cleaned text is rebuilt
    MAP-SIDE from the document row itself (re-synthesize the line array,
    drop the removed positions), keyed by a per-doc removed-positions
    array that joins back on doc_id. The r9 shape instead forced
    `F.broadcast(boiler)` — a hint the planner must obey even when the
    >= K repeated-line set outgrows broadcast range (at 100 TB of web
    text that set is plausibly 1e8+ digests). Hint-free, the planner
    broadcasts both small sides at any realistic sf (AQE sizes them at
    runtime) and degrades to a DIGEST-KEYED shuffle join when they
    outgrow the threshold — contract-tested under
    autoBroadcastJoinThreshold=-1: all corpus-scaled exchanges stay
    digest-width except the single body-width doc<->removed-set
    reassembly join, the one reconstruction exchange the r9 shape paid
    unconditionally as its final regroup (tests/test_exchange_audit.py).
    Determinism: md5 on both engines makes every removal decision
    hash-identical; reassembly keeps the synthesized line order
    (positional filter vs ORDER BY line_no)."""
    d = table_par(spark, sf_dir, "documents")
    collapsed = F.trim(
        F.regexp_replace(
            F.coalesce(F.col("text"), F.lit("")), rf"[{TX.WS}]+", " "
        )
    )
    docs = d.select("doc_id", collapsed.alias("c")).filter(F.col("c") != "")
    toks = F.split(F.col("c"), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(_LINE_W)).cast("int")
    with_lines = docs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(
                F.slice(toks, i * _LINE_W + 1, _LINE_W), " "
            ),
        ).alias("ls"),
    )
    lines_narrow = persist_tracked(
        with_lines.select(
            "doc_id", F.posexplode("ls").alias("line_no", "line")
        ).select("doc_id", "line_no", F.md5("line").alias("h"))
    )
    boiler = (
        lines_narrow.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= _LINE_K)
        .select("h")
    )
    removed_per_doc = (
        lines_narrow.join(boiler, "h")
        .groupBy("doc_id")
        .agg(
            F.collect_set("line_no").alias("rm"),
            F.count(F.lit(1)).alias("n_removed"),
        )
    )
    rm = F.coalesce(F.col("rm"), F.array().cast("array<int>"))
    return (
        with_lines.join(removed_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.size("ls").cast("bigint").alias("n_lines"),
            F.coalesce("n_removed", F.lit(0).cast("bigint")).alias(
                "n_removed"
            ),
            F.array_join(
                F.filter(
                    F.col("ls"), lambda x, i: ~F.array_contains(rm, i)
                ),
                " ",
            ).alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT doc_id, md5(text) AS old_md5 FROM documents WHERE doc_id % 3 <> 0
    ),
    b AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)
               AS new_md5
      FROM documents WHERE doc_id % 3 <> 1
    )
    SELECT doc_id,
           CASE WHEN old_md5 IS NULL THEN 'added'
                WHEN new_md5 IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           old_md5, new_md5
    FROM a FULL JOIN b USING (doc_id)
    WHERE old_md5 IS NULL OR new_md5 IS NULL OR old_md5 <> new_md5
    ORDER BY doc_id
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset versioning: content-level diff between two corpus
    snapshots — the added / removed / changed manifest a pipeline
    publishes alongside each training-set release (and the input to
    incremental downstream refresh: only 'added'+'changed' re-enter the
    dedup/quality stages; 'removed' retracts). Snapshots are the
    deterministic testdata shim (A = doc_id % 3 != 0, B = doc_id % 3
    != 1 — overlapping id ranges so all three statuses occur; B
    additionally modifies every 7th doc's text, the 'changed' class).

    Scale design: each side reduces to (doc_id, 16-byte digest) AT THE
    SCAN — the full-outer join shuffles ~48 B/rec key+digest rows,
    never text; unchanged rows (the vast majority of a real
    snapshot-over-snapshot diff) are dropped by the digest inequality
    before the presentation sort. At 100 TB both snapshots live
    bucketed by doc_id, making the diff a co-located zipper join."""
    d = table(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id", F.md5("text").alias("old_md5")
    )
    b = d.filter(F.col("doc_id") % 3 != 1).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("new_md5"),
    )
    status = (
        F.when(F.col("old_md5").isNull(), "added")
        .when(F.col("new_md5").isNull(), "removed")
        .otherwise("changed")
    )
    return (
        a.join(b, ["doc_id"], "full_outer")
        .filter(
            F.col("old_md5").isNull()
            | F.col("new_md5").isNull()
            | (F.col("old_md5") != F.col("new_md5"))
        )
        .select("doc_id", status.alias("status"), "old_md5", "new_md5")
        .orderBy("doc_id")
    )
