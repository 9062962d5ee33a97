"""Oracle-paired queries exercising the Python UDF surface
(operators/pandas_fns.py): scalar pandas_udf, grouped-agg pandas UDAF,
Python UDTF. Each runs real data through the Arrow boundary and must
hash-match a pure-SQL DuckDB recomputation — validating schema mapping,
batch transfer, and null handling, not just the Python bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table, table_par
from transit_feed_etl_spark.operators import pandas_fns as PF
from transit_feed_etl_spark.registry import register


@register(
    "embedding_l2_normalize_udf",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    n AS (
      SELECT vec_id, v,
             SQRT(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM v
    )
    SELECT vec_id,
           CAST(LEN(v) AS INT) AS n_dims,
           ROUND(nrm, 6) AS norm,
           ROUND(v[1] / nrm, 6) AS e_first,
           ROUND(v[LEN(v)] / nrm, 6) AS e_last
    FROM n
    ORDER BY vec_id
    """,
)
def embedding_l2_normalize_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf over array columns: L2-normalize embeddings in
    numpy, then verify norm and boundary elements against the SQL
    recomputation (rounded — numpy pairwise summation vs sequential fold
    differ in the last ulp)."""
    emb = table_par(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    nv = v.select(
        "vec_id",
        F.size("v").alias("n_dims"),
        F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda s, x: s + x
        ).alias("sumsq"),
        PF.l2_normalize()("v").alias("nv"),
    )
    return nv.select(
        "vec_id",
        "n_dims",
        F.round(F.sqrt("sumsq"), 6).alias("norm"),
        F.round(F.element_at("nv", 1), 6).alias("e_first"),
        F.round(F.element_at("nv", F.col("n_dims")), 6).alias("e_last"),
    ).orderBy("vec_id")


@register(
    "midrange_price_udaf",
    oracle="""
    SELECT o_orderpriority,
           (MIN(o_totalprice) + MAX(o_totalprice)) / 2 AS midrange_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def midrange_price_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF ((min+max)/2 — exact and
    order-independent over doubles). The whole group's values stream to
    Python as one Arrow batch; Catalyst handles the shuffle."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            PF.midrange()("o_totalprice").alias("midrange_price"),
            PF.group_count()("o_totalprice").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "sentence_split_udtf",
    oracle="""
    WITH p AS (
      SELECT doc_id, string_split(text, '.') AS parts FROM documents
    ),
    z AS (
      SELECT doc_id,
             UNNEST(range(0, LEN(parts))) AS sent_idx,
             UNNEST(parts) AS sentence
      FROM p
    )
    SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx, sentence
    FROM z
    WHERE regexp_matches(sentence, '\\S')
    ORDER BY doc_id, sent_idx
    """,
)
def sentence_split_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: documents -> one row per non-blank
    sentence, keeping original part indices. Arrow-optimized
    (useArrow=True on the @udtf)."""
    spark.udtf.register("split_sentences", PF.split_sentences_udtf())
    table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM _udtf_docs d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.sent_idx
        """
    )


@register(
    "cogroup_user_view_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, COUNT(*) AS n_views,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT user_id, COUNT(*) AS n_purchases,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(v.user_id, p.user_id) AS user_id,
           CAST(COALESCE(v.n_views, 0) AS BIGINT) AS n_views,
           COALESCE(v.view_value, 0.0) AS view_value,
           CAST(COALESCE(p.n_purchases, 0) AS BIGINT) AS n_purchases,
           COALESCE(p.purchase_value, 0.0) AS purchase_value
    FROM v FULL OUTER JOIN p ON p.user_id = v.user_id
    WHERE COALESCE(v.user_id, p.user_id) < 50
    ORDER BY user_id
    """,
)
def cogroup_user_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`groupBy().cogroup().applyInPandas` — the two-sided custom-merge
    escape hatch (both sides of a key arrive as pandas frames in ONE
    function call; the shape a bespoke merge-asof or interleave needs
    when join+agg can't express it). Both streams shuffle once on
    user_id and co-locate; Python sees two Arrow batches per key. The
    body computes per-side counts/sums with numpy so the FULL-OUTER
    semantics (a key present on one side only) cross the Arrow boundary
    and hash-match the SQL full-join oracle. Decimal-exact sums: the
    per-key frame is summed with math.fsum-equivalent exact pairwise on
    int-scaled values to stay order-independent."""
    import pandas as pd

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")

    def merge(key, vdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        (uid,) = key
        # exact decimal-style sums: scale to micro-units in int64
        vsum = int(round(vdf["value"].fillna(0.0).mul(1e6).round().sum()))
        psum = int(round(pdf["value"].fillna(0.0).mul(1e6).round().sum()))
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_views": [len(vdf)],
                "view_value": [vsum / 1e6],
                "n_purchases": [len(pdf)],
                "purchase_value": [psum / 1e6],
            }
        )

    out_schema = (
        "user_id long, n_views long, view_value double, "
        "n_purchases long, purchase_value double"
    )
    return (
        views.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(merge, out_schema)
        .orderBy("user_id")
    )
