"""Scalar-function surface (SURVEY.md §2 Part B scalar rows; reference
shapes A26 string-format, A27 timestamp-format, A28 stem-extract).

Cross-engine notes (Spark <-> DuckDB):
  format_string <-> printf            (both C-style)
  date_format   <-> strftime          (pattern dialects differ; output equal)
  regexp_extract<-> regexp_extract    (Java regex vs RE2 — stick to the
                                       common subset: \\d \\w [^/] anchors)
  get_json_object <-> json_extract_string
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table
from transit_feed_etl_spark.registry import register


@register(
    "string_functions",
    oracle="""
    SELECT
      doc_id,
      UPPER(lang) AS lang_uc,
      LOWER(source) AS source_lc,
      SUBSTR(text, 1, 20) AS head,
      LENGTH(text) AS n_chars_computed,
      CONCAT(lang, ':', source) AS lang_source,
      REGEXP_EXTRACT(source, '([0-9]+)', 1) AS source_num,
      REPLACE(source, 'src', 'source_') AS source_renamed,
      TRIM('  ' || lang || '  ') AS lang_trimmed,
      LPAD(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id_padded,
      SPLIT_PART(source, 'c', 2) AS after_c,
      CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS mentions_spark
    FROM documents
    ORDER BY doc_id
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions (A26 formatting / A28 extraction shapes,
    reference read_gtfs_rt.py:13-22): case, substring, length, concat,
    regex extract, replace, trim, pad, split, LIKE."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.lower("source").alias("source_lc"),
        F.substring("text", 1, 20).alias("head"),
        F.length("text").alias("n_chars_computed"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
        F.regexp_extract("source", r"([0-9]+)", 1).alias("source_num"),
        F.replace(F.col("source"), F.lit("src"), F.lit("source_")).alias("source_renamed"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("lang_trimmed"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("doc_id_padded"),
        F.split_part(F.col("source"), F.lit("c"), F.lit(2)).alias("after_c"),
        F.when(F.col("text").like("%spark%"), 1).otherwise(0).alias("mentions_spark"),
    ).orderBy("doc_id")


@register(
    "format_popup_strings",
    oracle="""
    SELECT
      event_id,
      -- NB: %.1f is NOT portable (Java HALF_UP vs C binary rounding);
      -- pre-round and render via %s instead.
      -- + 0.0 normalizes negative zero: ROUND(-1e-6, 1) is +0.0 in
      -- Spark but -0.0 in DuckDB (extreme-numerics sweep)
      PRINTF('Event %s | user %d | value %s', event_type, user_id,
             CAST(ROUND(value, 1) + 0.0 AS VARCHAR)) AS popup,
      PRINTF('%05d', event_id) AS padded_id
    FROM events
    WHERE value IS NOT NULL AND user_id < 25
    ORDER BY event_id
    """,
)
def format_popup_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style string formatting (A26, reference read_gtfs_rt.py:16-18
    builds 'Bus {id}<br>Route {route}<br>Speed {speed:.1f}' popups) —
    format_string is JVM-side, no Python round-trip.

    Cross-engine value domain: the double->string cast renders
    |value| >= 1e7 in scientific notation on the JVM ('1.0E11') but
    plain decimal in DuckDB ('100000000000.0') — the oracle contract
    holds for |value| < 1e7 (extreme-numerics sweep)."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("user_id") < 25)
    )
    return ev.select(
        "event_id",
        F.format_string(
            "Event %s | user %d | value %s",
            F.col("event_type"),
            F.col("user_id"),
            (F.round("value", 1) + F.lit(0.0)).cast("string"),
        ).alias("popup"),
        F.format_string("%05d", "event_id").alias("padded_id"),
    ).orderBy("event_id")


@register(
    "timestamp_formatting",
    oracle="""
    SELECT
      event_id,
      STRFTIME(ts, '%Y%m%d_%H%M%S') AS ts_compact,
      STRFTIME(ts, '%Y/%m/%d/%H') AS partition_path,
      STRFTIME(ts, '%M%S') AS file_stem,
      CAST(YEAR(ts) AS INT) AS y,
      CAST(MONTH(ts) AS INT) AS m,
      CAST(DAY(ts) AS INT) AS d,
      CAST(HOUR(ts) AS INT) AS h,
      DATE_TRUNC('hour', ts) AS ts_hour,
      CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS unix_sec
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
)
def timestamp_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp formatting (A27, reference gtfs_rt_assets.py:79,136-138:
    '%Y%m%d_%H%M%S' record stamps, '%Y/%m/%d/%H' partition paths, '%M%S'
    file stems) + calendar extraction + truncation + epoch."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyyMMdd_HHmmss").alias("ts_compact"),
        F.date_format("ts", "yyyy/MM/dd/HH").alias("partition_path"),
        F.date_format("ts", "mmss").alias("file_stem"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_trunc("hour", F.col("ts")).alias("ts_hour"),
        F.unix_timestamp("ts").alias("unix_sec"),
    ).orderBy("event_id")


@register(
    "interval_arithmetic",
    oracle="""
    SELECT
      o_orderkey,
      o_orderdate,
      o_orderdate + INTERVAL 30 DAY AS due_date,
      o_orderdate - INTERVAL 1 HOUR AS hour_before,
      CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
        AS days_since_epoch_start,
      CAST(EXTRACT(DOW FROM o_orderdate) AS INT) AS dow
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
)
def interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic (A18's '-1 hour' lookback shape,
    reference gtfs_rt_assets.py:213) on real TimestampType."""
    od = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return od.select(
        "o_orderkey",
        "o_orderdate",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 1 HOUR")).alias("hour_before"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("days_since_epoch_start"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
    ).orderBy("o_orderkey")


@register(
    "math_functions",
    oracle="""
    SELECT
      event_id,
      ROUND(value, 1) AS v_round1,
      CAST(FLOOR(value) AS BIGINT) AS v_floor,
      CAST(CEIL(value) AS BIGINT) AS v_ceil,
      ABS(value - 10.0) AS v_absdiff,
      ROUND(SQRT(ABS(value)), 6) AS v_sqrt,
      -- ABS keeps the log total: Spark NULLs ln(<=0), DuckDB RAISES —
      -- divergent edge found by the extreme-numerics sweep
      ROUND(LN(ABS(value) + 1.0), 6) AS v_log1p,
      -- value * value, NOT POWER(x, 2.0): pow() goes through libm
      -- (exp/ln) whose last-ulp differs between engines; the plain
      -- multiply is one IEEE op, bit-identical everywhere. No ROUND:
      -- DuckDB's ROUND(x, 6) scales by 1e6 in doubles and loses ulps
      -- past 2^53 where Spark's BigDecimal round is exact
      value * value AS v_sq,
      CAST(TRUNC(value) AS INT) AS v_int,  -- DuckDB int-cast rounds; Spark truncates
      -- DuckDB SIGN -> TINYINT, Spark signum -> DOUBLE: align on INT
      CAST(SIGN(value - 10.0) AS INT) AS v_sign,
      GREATEST(value, 5.0) AS v_hi,
      LEAST(value, 5.0) AS v_lo,
      MOD(user_id, 7) AS user_mod
    FROM events
    WHERE value IS NOT NULL AND event_id < 1000
    ORDER BY event_id
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions (A26 ':.1f' rounding shape and beyond):
    round/floor/ceil/abs/sqrt/ln/power/sign/greatest/least/mod.

    Cross-engine value domain (extreme-numerics sweep,
    tests/test_extreme_parity.py): the int cast bounds |value| < 2^31
    on both engines; the log rides ABS so negatives stay total (Spark
    NULLs ln(<=0) where DuckDB raises)."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("event_id") < 1000)
    )
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(v, 1).alias("v_round1"),
        F.floor(v).alias("v_floor"),
        F.ceil(v).alias("v_ceil"),
        F.abs(v - 10.0).alias("v_absdiff"),
        F.round(F.sqrt(F.abs(v)), 6).alias("v_sqrt"),
        F.round(F.log(F.abs(v) + 1.0), 6).alias("v_log1p"),
        (v * v).alias("v_sq"),
        v.cast("int").alias("v_int"),
        F.signum(v - 10.0).cast("int").alias("v_sign"),
        F.greatest(v, F.lit(5.0)).alias("v_hi"),
        F.least(v, F.lit(5.0)).alias("v_lo"),
        (F.col("user_id") % 7).alias("user_mod"),
    ).orderBy("event_id")


@register(
    "null_semantics",
    oracle="""
    SELECT
      event_id,
      COALESCE(value, -1.0) AS v_coalesce,
      NULLIF(event_type, 'click') AS type_unless_click,
      CASE WHEN value IS NULL THEN 'missing' ELSE 'present' END AS presence,
      CAST(value IS NOT NULL AS INT) AS has_value,
      CAST((value > 10.0) AS INT) AS gt10_true,          -- NULL -> NULL
      CAST(COALESCE(value > 10.0, FALSE) AS INT) AS gt10_3vl,
      CASE WHEN value IS NULL AND user_id % 2 = 0 THEN 'null_even'
           WHEN value IS NULL THEN 'null_odd'
           ELSE 'valued' END AS null_class,
      IFNULL(CAST(value AS VARCHAR), 'n/a') AS v_str
    FROM events
    WHERE event_id < 3000
    ORDER BY event_id
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic and NULL-handling surface (the reference's
    whole data model is null-tolerant, SURVEY §1.1): COALESCE/NULLIF/
    IS NULL classification, NULL-propagating comparisons vs their
    COALESCE-forced boolean forms, IFNULL string fallback.

    Cross-engine value domain: the string-cast column inherits the
    scientific-notation boundaries — the engines agree for
    1e-3 <= |value| < 1e7 and exact zero (JVM renders 1e-6 as '1.0E-6',
    DuckDB as '1e-06'; see also format_popup_strings)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    v = F.col("value")
    return ev.select(
        "event_id",
        F.coalesce(v, F.lit(-1.0)).alias("v_coalesce"),
        F.nullif(F.col("event_type"), F.lit("click")).alias("type_unless_click"),
        F.when(v.isNull(), "missing").otherwise("present").alias("presence"),
        v.isNotNull().cast("int").alias("has_value"),
        (v > 10.0).cast("int").alias("gt10_true"),
        F.coalesce(v > 10.0, F.lit(False)).cast("int").alias("gt10_3vl"),
        F.when(v.isNull() & (F.col("user_id") % 2 == 0), "null_even")
        .when(v.isNull(), "null_odd")
        .otherwise("valued")
        .alias("null_class"),
        F.ifnull(v.cast("string"), F.lit("n/a")).alias("v_str"),
    ).orderBy("event_id")


@register(
    "regex_functions",
    oracle=r"""
    SELECT
      doc_id,
      regexp_extract(source, '([a-z]+)([0-9]*)', 1) AS src_word,
      regexp_replace(lower(text), '[0-9]+', '#', 'g') AS text_masked_head,
      CAST(LEN(regexp_extract_all(text, '[A-Z][a-z]+')) AS INT) AS n_capitalized,
      CASE WHEN regexp_matches(source, '^src[0-9]+$') THEN 1 ELSE 0 END
        AS src_shape_ok,
      regexp_extract(text, '\b([a-z]{4})\b', 1) AS first_4letter
    FROM (SELECT doc_id, source, SUBSTR(text, 1, 80) AS text FROM documents)
    ORDER BY doc_id
    """,
)
def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface over the portable Java/RE2 subset
    (char classes, anchors, word boundaries, capture groups — no
    lookaround, which RE2 lacks): extract, global replace,
    extract_all count, full-match test."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.substring("text", 1, 80).alias("text")
    )
    return d.select(
        "doc_id",
        F.regexp_extract("source", r"([a-z]+)([0-9]*)", 1).alias("src_word"),
        F.regexp_replace(F.lower("text"), r"[0-9]+", "#").alias("text_masked_head"),
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Z][a-z]+"))).alias(
            "n_capitalized"
        ),
        F.col("source").rlike(r"^src[0-9]+$").cast("int").alias("src_shape_ok"),
        F.regexp_extract("text", r"\b([a-z]{4})\b", 1).alias("first_4letter"),
    ).orderBy("doc_id")


@register(
    "array_functions",
    oracle="""
    SELECT doc_id,
           CAST(LEN(toks) AS INT) AS n_toks,
           -- array results serialize to strings: keeps the driver's
           -- value hash on scalar ground while the array ops still run
           -- DuckDB array_to_string of an empty list is NULL; Spark
           -- array_join gives '' — coalesce to match
           COALESCE(array_to_string(list_sort(list_distinct(toks))[1:5], ','), '')
             AS first5_sorted,
           CAST(list_position(toks, 'the') AS INT) AS pos_the,
           CASE WHEN list_contains(toks, 'data') THEN 1 ELSE 0 END AS has_data,
           list_reverse(toks)[1] AS last_tok,
           COALESCE(array_to_string(toks[1:3], '-'), '') AS head_joined,
           COALESCE(array_to_string(list_filter(toks, t -> LEN(t) >= 6)[1:3], ','), '')
             AS long_toks
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')
               AS toks
      FROM documents
    )
    ORDER BY doc_id
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar surface (Part B array/map/json row): sort, distinct,
    slice, position, contains, reverse, join, lambda filter — all
    higher-order Catalyst expressions, no explode and no Python.

    NULL/empty-text edges (pinned by the null-text sweep, ADVICE r6):
    joined-string columns coalesce to '' on BOTH engines (NULL toks and
    empty toks converge — DuckDB's array_to_string of an empty list is
    already NULL, so one COALESCE covers both); has_data mirrors the
    oracle's CASE fallthrough to 0 on NULL toks; last_tok uses
    try_element_at because ANSI element_at(arr, 1) THROWS on a
    zero-token document (found as a crash, not a mismatch, when this
    query first entered the sweep)."""
    from transit_feed_etl_spark.operators import textfns as TX

    d = table(spark, sf_dir, "documents").select(
        "doc_id", TX.tokens("text").alias("toks")
    )
    return d.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.coalesce(
            F.array_join(
                F.slice(F.array_sort(F.array_distinct("toks")), 1, 5), ","
            ),
            F.lit(""),
        ).alias("first5_sorted"),
        F.array_position("toks", "the").cast("int").alias("pos_the"),
        F.coalesce(F.array_contains("toks", "data"), F.lit(False))
        .cast("int")
        .alias("has_data"),
        F.try_element_at(F.reverse("toks"), F.lit(1)).alias("last_tok"),
        F.coalesce(F.array_join(F.slice("toks", 1, 3), "-"), F.lit("")).alias(
            "head_joined"
        ),
        F.coalesce(
            F.array_join(
                F.slice(F.filter("toks", lambda t: F.length(t) >= 6), 1, 3), ","
            ),
            F.lit(""),
        ).alias("long_toks"),
    ).orderBy("doc_id")


@register(
    "bitwise_functions",
    oracle="""
    SELECT event_id,
           user_id & 255 AS low_byte,
           user_id | 4096 AS with_flag,
           xor(user_id, event_id) AS mixed,
           user_id << 3 AS shifted_up,
           user_id >> 2 AS shifted_down,
           CAST(bit_count(CAST(user_id AS BIGINT)) AS INT) AS popcount,
           ~user_id AS inverted
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
)
def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: and/or/xor/shifts/popcount/not — the
    primitive layer under the SimHash/Morton operators, exposed as a
    query so the cross-engine semantics (sign, width) are pinned."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    u = F.col("user_id")
    return ev.select(
        "event_id",
        u.bitwiseAND(F.lit(255)).alias("low_byte"),
        u.bitwiseOR(F.lit(4096)).alias("with_flag"),
        u.bitwiseXOR(F.col("event_id")).alias("mixed"),
        F.shiftleft(u, 3).alias("shifted_up"),
        F.shiftright(u, 2).alias("shifted_down"),
        F.bit_count(u.cast("long")).alias("popcount"),
        F.bitwise_not(u).alias("inverted"),
    ).orderBy("event_id")


@register(
    "json_extraction",
    oracle="""
    WITH j AS (
      -- Spark's get_json_object is LENIENT (malformed JSON -> NULL);
      -- DuckDB's json functions RAISE — the json_valid guard aligns
      -- the engines on the whole input domain (bad-JSON sweep)
      SELECT event_id,
             CASE WHEN json_valid(props) THEN props END AS props
      FROM events WHERE event_id < 2000
    )
    SELECT
      event_id,
      json_extract_string(props, '$.k') AS k_str,
      CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
           THEN 1 ELSE 0 END AS has_k
    FROM j
    ORDER BY event_id
    """,
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props payload column (Part B
    array/map/json row): get_json_object is codegen'd JVM-side.
    Malformed JSON extracts as NULL on both engines (the oracle carries
    a json_valid guard mirroring get_json_object's leniency); a
    non-numeric `k` fails the int cast on BOTH engines (ANSI strict
    cast <-> DuckDB strict CAST)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.when(k.isNotNull(), 1).otherwise(0).alias("has_k"),
    ).orderBy("event_id")


@register(
    "map_entry_stats",
    oracle="""
    SELECT prop_key, COUNT(*) AS n_events,
           MIN(val) AS min_val, MAX(val) AS max_val,
           -- DuckDB SUM(INTEGER) -> HUGEINT, Spark sum(int) -> BIGINT: align
           CAST(SUM(val) AS BIGINT) AS sum_val
    FROM (
      -- json_valid guard: Spark's from_json yields a NULL map for
      -- malformed JSON (explode -> no rows); json_keys(NULL) unnests
      -- to no rows, matching (bad-JSON sweep)
      SELECT t.prop_key,
             CAST(json_extract(e.props, '$.' || t.prop_key) AS INTEGER) AS val
      FROM (SELECT CASE WHEN json_valid(props) THEN props END AS props
            FROM events) e,
           unnest(json_keys(e.props)) AS t(prop_key)
    )
    GROUP BY prop_key
    """,
)
def map_entry_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed surface (Part B array/map/json row): parse the JSON
    payload into a real MapType, explode its entries (key generality —
    no hardcoded key list), aggregate per key. from_json + explode are
    codegen'd JVM-side; the per-key aggregate is partial-aggregatable,
    so at 100 TB the shuffle carries one row per (partition, key), not
    per event.

    Input-domain contract (JSON-edge sweep, test_jsonedge_parity.py):
    unique keys with strictly int-or-null values. from_json is
    DOCUMENT-lenient — one value failing the declared map<string,int>
    coercion nulls the WHOLE map (the document vanishes from the
    explode), and duplicate keys resolve LAST-wins where path
    extraction (and DuckDB) take the first — both behaviors pinned in
    the sweep rather than silently assumed."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    e = ev.select(F.explode(m).alias("prop_key", "val"))
    return e.groupBy("prop_key").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum("val").alias("sum_val"),
    )


@register(
    "url_parse_stats",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || lang
               || '/page?id=' || CAST(doc_id AS VARCHAR) || '&ref=feed' AS url
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'id=([^&]+)', 1) AS id_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u ORDER BY doc_id
    """,
)
def url_parse_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with Spark's NATIVE parse_url (HOST / PATH /
    QUERY-param / PROTOCOL) over deterministically constructed URLs —
    the provenance-tracking step of a crawl-curation pipeline (dedup by
    canonical URL, per-domain quotas). The oracle mirrors parse_url with
    anchored regexes; both are scan-stage projections, zero shuffle."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/page?id="),
        F.col("doc_id").cast("string"),
        F.lit("&ref=feed"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("protocol"),
    ).orderBy("doc_id")


@register(
    "string_edge_functions",
    oracle="""
    SELECT doc_id,
           -- DuckDB initcap-equivalent: first letter upper, rest as-is
           UPPER(SUBSTR(lang, 1, 1)) || SUBSTR(lang, 2) AS lang_cap,
           translate(source, 'src', 'SRC') AS src_translated,
           reverse(lang) AS lang_rev,
           repeat(lang, 3) AS lang_x3,
           LEFT(source, 3) AS src_left3,
           RIGHT(source, 2) AS src_right2,
           ascii(lang) AS lang_ascii,
           lpad(CAST(doc_id AS VARCHAR), 6, '*') AS id_padded
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def string_edge_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-surface fill-in: initcap, translate, reverse, repeat,
    left/right, ascii, lpad — all JVM built-ins in the scan stage."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.initcap("lang").alias("lang_cap"),
        F.translate("source", "src", "SRC").alias("src_translated"),
        F.reverse("lang").alias("lang_rev"),
        F.repeat("lang", 3).alias("lang_x3"),
        F.left("source", F.lit(3)).alias("src_left3"),
        F.right("source", F.lit(2)).alias("src_right2"),
        F.ascii("lang").alias("lang_ascii"),
        F.lpad(F.col("doc_id").cast("string"), 6, "*").alias("id_padded"),
    ).orderBy("doc_id")


@register(
    "calendar_functions",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(month(o_orderdate) AS INT) AS m,
           -- ISO day-of-week 1=Mon..7=Sun in both engines
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           strftime(o_orderdate, '%Y-%m-%d') AS iso
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
)
def calendar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar scalar surface: quarter, month, ISO weekday, day-of-year,
    last_day, add_months, formatting. Spark's dayofweek is 1=Sunday;
    `weekday()+1` gives the ISO 1=Monday convention both engines agree
    on."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus_3m"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso"),
    ).orderBy("o_orderkey")


@register(
    "array_setops_tokens",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')
               AS toks
      FROM documents WHERE doc_id < 50
    ),
    d AS (SELECT doc_id, list_sort(list_distinct(toks)) AS u FROM t)
    SELECT doc_id,
           -- COALESCE: DuckDB's array_to_string([]) is NULL where
           -- Spark's array_join([]) is '' (sf0.001 has a doc with an
           -- empty intersect; sf0.01 does not - caught by the local
           -- small-sf parity run, exactly what it exists for)
           COALESCE(array_to_string(
             list_sort(list_intersect(u, ['the','a','and','of','key','row'])), ','
           ), '') AS common,
           CAST(LEN(list_filter(u,
             x -> NOT list_contains(['the','a','and','of','key','row'], x)))
             AS INT) AS n_rest,
           CAST(LEN(u) AS INT) AS n_uniq
    FROM d ORDER BY doc_id
    """,
)
def array_setops_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations (intersect / except-count / distinct) between
    each document's token set and a fixed vocabulary — all higher-order
    JVM expressions in the scan stage; arrays sorted so set results are
    order-deterministic across engines.  The intersect result is emitted
    as a comma-joined STRING, not a raw array column: the driver's
    pandas canonicalizer hashes cell values and crashes on unhashable
    list cells (CORRECTNESS_r05 `TypeError: unhashable type: 'list'`),
    so driver-eligible queries emit only scalar-hashable columns — the
    registry contract now pins this (tests/test_entry_ordering.py)."""
    from transit_feed_etl_spark.operators import textfns as TX

    vocab = F.array(*[F.lit(x) for x in ("the", "a", "and", "of", "key", "row")])
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    u = F.array_sort(F.array_distinct(TX.tokens("text")))
    d = d.select("doc_id", u.alias("u"))
    return d.select(
        "doc_id",
        # coalesce mirrors the oracle's COALESCE on BOTH null-toks docs
        # (array_join(NULL) is NULL; DuckDB's COALESCE swallows its NULL
        # too) and empty intersects (DuckDB array_to_string([]) is NULL
        # where array_join([]) is '') — ADVICE r6, pinned by the
        # null-text sweep
        F.coalesce(
            F.array_join(F.array_sort(F.array_intersect("u", vocab)), ","),
            F.lit(""),
        ).alias("common"),
        F.size(F.array_except("u", vocab)).alias("n_rest"),
        F.size("u").alias("n_uniq"),
    ).orderBy("doc_id")


@register(
    "error_safe_arithmetic",
    oracle="""
    SELECT doc_id,
           TRY_CAST(lang AS INTEGER) AS lang_as_int,          -- always NULL
           TRY_CAST(CAST(doc_id AS VARCHAR) AS INTEGER) AS id_roundtrip,
           CASE WHEN (doc_id % 5) = 0 THEN NULL
                ELSE CAST(n_chars AS DOUBLE) / (doc_id % 5) END AS safe_div,
           CASE WHEN doc_id = 0 THEN NULL ELSE n_chars // doc_id END AS safe_intdiv
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def error_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe expression surface: try_cast on unparseable
    strings, try_divide by zero, try integer division — NULL instead of
    a runtime error or a silent wrong value. Under ANSI mode (Spark 4
    default) the non-try forms THROW at 100 TB on row one-in-a-billion;
    try_* is the production-safe projection. Oracle mirrors with
    TRY_CAST and explicit zero guards (DuckDB's division semantics)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.try_to_number("lang", F.lit("999")).cast("int").alias("lang_as_int"),
        F.col("doc_id").cast("string").cast("int").alias("id_roundtrip"),
        F.try_divide(F.col("n_chars").cast("double"), F.col("doc_id") % 5).alias(
            "safe_div"
        ),
        F.when(
            F.col("doc_id") != 0,
            F.floor(F.col("n_chars") / F.col("doc_id")).cast("long"),
        ).alias("safe_intdiv"),
    ).orderBy("doc_id")


@register(
    "json_struct_roundtrip",
    oracle="""
    SELECT doc_id,
           '{"id":' || CAST(doc_id AS VARCHAR) || ',"lang":"' || lang
             || '","n":' || CAST(n_chars AS VARCHAR) || '}' AS j,
           CAST(json_extract(
             '{"id":' || CAST(doc_id AS VARCHAR) || ',"lang":"' || lang
               || '","n":' || CAST(n_chars AS VARCHAR) || '}',
             '$.n') AS BIGINT) AS n_back
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def json_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json serialization + re-extraction: struct -> canonical JSON
    text -> field back out. Spark's to_json emits compact key:value
    with struct-declared field order, so the TEXT ITSELF hash-matches
    the oracle's hand-concatenated JSON — serialization is checked
    byte-for-byte, not just parse-equivalent."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    j = F.to_json(
        F.struct(
            F.col("doc_id").alias("id"),
            F.col("lang").alias("lang"),
            F.col("n_chars").alias("n"),
        )
    )
    return d.select(
        "doc_id",
        j.alias("j"),
        F.get_json_object(j, "$.n").cast("long").alias("n_back"),
    ).orderBy("doc_id")


@register(
    "sort_nulls_placement",
    oracle="""
    SELECT * FROM (
      SELECT 'nulls_first_asc' AS probe, l_orderkey, l_linenumber,
             NULLIF(CAST(l_quantity AS INT) % 7, 0) AS v
      FROM lineitem
      ORDER BY v ASC NULLS FIRST, l_orderkey, l_linenumber
      LIMIT 100
    )
    UNION ALL
    SELECT * FROM (
      SELECT 'nulls_last_desc' AS probe, l_orderkey, l_linenumber,
             NULLIF(CAST(l_quantity AS INT) % 7, 0) AS v
      FROM lineitem
      ORDER BY v DESC NULLS LAST, l_orderkey, l_linenumber
      LIMIT 100
    )
    """,
)
def sort_nulls_placement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-placement dialect parity: Spark's default sort puts NULLs
    FIRST ascending / LAST descending, DuckDB defaults to NULLS LAST —
    silent result drift for any top-k over a nullable key unless the
    placement is explicit. Both engines are pinned to the explicit
    forms; the LIMIT makes placement value-observable (which rows
    survive depends on where NULLs sort). TakeOrderedAndProject keeps
    each probe a top-k, never a global sort."""
    li = table(spark, sf_dir, "lineitem")
    v = F.nullif(F.col("l_quantity").cast("int") % 7, F.lit(0)).alias("v")
    base = li.select("l_orderkey", "l_linenumber", v)
    first = (
        base.orderBy(
            F.col("v").asc_nulls_first(), "l_orderkey", "l_linenumber"
        )
        .limit(100)
        .select(F.lit("nulls_first_asc").alias("probe"), "*")
    )
    last = (
        base.orderBy(
            F.col("v").desc_nulls_last(), "l_orderkey", "l_linenumber"
        )
        .limit(100)
        .select(F.lit("nulls_last_desc").alias("probe"), "*")
    )
    return first.unionByName(last)


@register(
    "variant_typed_extraction",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT)
             AS min_k,
           CAST(COUNT(json_extract(props, '$.missing')) AS BIGINT) AS n_missing_hits,
           CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_big
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_typed_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: `parse_json` into
    a VariantType column once, then typed `variant_get` extractions —
    the shredded-access model that replaces per-query `from_json` schema
    declarations (binary variant encoding, no re-parse per field).
    Missing paths yield NULL (counted via n_missing_hits = 0 hits).
    The oracle expresses the same extractions with DuckDB json_extract;
    aggregation keeps everything integer-typed, so no float drift.

    Input-domain contract (JSON-edge sweep, test_jsonedge_parity.py):
    unique keys, int-typed values. Outside it the APIs split by design:
    parse_json REFUSES duplicate keys (VARIANT_DUPLICATE_KEY);
    variant_get(int) COERCES scalars ("12"/100.0/1e2 -> 100, true -> 1)
    where DuckDB's CAST raises, and fails fast (INVALID_VARIANT_CAST)
    on array/object values — the coercion table is pinned in the
    sweep."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "int")
    missing = F.variant_get("v", "$.missing", "int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).cast("int").alias("min_k"),
            F.count(missing).alias("n_missing_hits"),
            F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_big"),
        )
        .orderBy("event_type")
    )
