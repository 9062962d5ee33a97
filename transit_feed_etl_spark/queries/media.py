"""Multimodal-column queries (EXT, north star): binary payload columns
with typed metadata, decoded via Arrow-batched mapInPandas
(operators/multimodal.py; stub codec — the container has no image/audio
libs, see that module's docstring).

`media_decode_stats` is a true differential test of the binary path:
Spark FABRICATES payloads in Catalyst (concat of binary literals +
unhex'd header fields + utf-8 text body), ships them through Arrow to
the Python stub decoder, and returns the parsed metadata; the DuckDB
oracle recomputes the same metadata directly from the construction
formulas. A mismatch anywhere in the binary plumbing (header packing,
Arrow binary transfer, struct unpack) breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table_par
from transit_feed_etl_spark.operators import multimodal as MM
from transit_feed_etl_spark.registry import register


def fabricate_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (media_id, kind, payload) with the stub codec's
    16-byte FAKE header, built entirely JVM-side:
    payload = 'FAKE' || byte(kind) || int32be(width) || int32be(height)
              || utf8(text)."""
    d = table_par(spark, sf_dir, "documents")
    kind_code = (F.col("doc_id") % 3).cast("int")
    width = (F.lit(16) + F.col("doc_id") % 64).cast("int")
    height = (F.lit(9) + F.col("doc_id") % 48).cast("int")

    def be(col: F.Column, n_hex: int) -> F.Column:
        return F.unhex(F.lpad(F.hex(col), n_hex, "0"))

    payload = F.concat(
        F.lit(b"FAKE"),
        be(kind_code, 2),
        be(width, 8),
        be(height, 8),
        F.encode("text", "UTF-8"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), kind_code + 1).alias("kind"),
        payload.alias("payload"),
    )


@register(
    "media_decode_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
                WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
           CAST(16 + doc_id % 64 AS INT) AS width,
           CAST(9 + doc_id % 48 AS INT) AS height,
           CAST(13 + OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes
    FROM documents
    ORDER BY media_id
    """,
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricate binary media payloads in Catalyst, decode them with the
    Arrow-batched stub codec (mapInPandas), return the parsed metadata.
    The oracle derives the expected values straight from the construction
    formulas — the whole binary round-trip must agree byte-for-byte."""
    media = fabricate_media(spark, sf_dir)
    return (
        MM.decode_media(media)
        .select("media_id", "format", "width", "height", "n_bytes")
        .orderBy("media_id")
    )


@register(
    "media_kind_stats",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           COUNT(*) AS n,
           CAST(SUM(13 + OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT (doc_id % 64) || ':' || (doc_id % 48) || ':' || text)
             AS n_distinct_payloads
    FROM documents
    GROUP BY 1
    ORDER BY kind
    """,
)
def media_kind_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Catalyst aggregation over binary payload columns — no decode:
    per-kind counts, total bytes, sha-distinct payload counts (the exact
    dedup pattern applied to media). A payload is distinct iff its
    (width, height, text) tuple is — which the oracle checks
    relationally."""
    return MM.media_stats(fabricate_media(spark, sf_dir))
