"""Graph analytics queries: PageRank authority scoring over the
customer-supplier co-purchase graph and clustering-coefficient analysis
of the embedding k-NN similarity graph.

Why these belong in a training-data engine: PageRank over a link graph
is the canonical web-corpus quality prior (crawl curation weights pages
by link authority before sampling), and the k-NN graph's local
clustering coefficient measures how cliquish a corpus neighborhood is —
high-clustering regions are near-duplicate families that survive
pairwise dedup thresholds.

Both queries are fully value-oracle-checked: PageRank's power iteration
unrolls into one SQL CTE per iteration (exact-decimal contribution sums
make every iteration bit-reproducible — see operators/graph.py), and the
k-NN graph reuses the rounded-cosine + id-tie-break determinism contract
from similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from transit_feed_etl_spark.caching import persist_tracked
from transit_feed_etl_spark.io import table, table_par
from transit_feed_etl_spark.operators import vectors as V
from transit_feed_etl_spark.operators.graph import pagerank, triangle_count
from transit_feed_etl_spark.registry import register

_DAMPING = 0.85
_ITERS = 3
# repr() round-trips exactly through both Python float() and DuckDB's
# correctly-rounded string->double cast, so BOTH engines iterate with
# bit-identical teleport/damping constants (1.0-0.85 in double is NOT
# the double closest to 0.15 — a naive 0.15 literal would drift an ulp).
_TELEPORT_SQL = f"CAST('{1.0 - _DAMPING!r}' AS DOUBLE)"
_DAMPING_SQL = f"CAST('{_DAMPING!r}' AS DOUBLE)"


def _pagerank_oracle() -> str:
    """Unrolled power iteration: r0 -> r1 -> ... -> r{_ITERS}."""
    iter_ctes = ",\n".join(
        f"""
    r{k + 1} AS (
      SELECT e.dst AS src,
             {_TELEPORT_SQL} / (SELECT n FROM nn)
             + {_DAMPING_SQL}
               * CAST(SUM(CAST(r.rank / d.deg AS DECIMAL(38,30))) AS DOUBLE)
               AS rank
      FROM edges e
      JOIN r{k} r ON r.src = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    )"""
        for k in range(_ITERS)
    )
    return f"""
    WITH raw AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c * 2 AS src, s * 2 + 1 AS dst FROM raw
      UNION ALL
      SELECT s * 2 + 1 AS src, c * 2 AS dst FROM raw
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
    r0 AS (SELECT src, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM deg),
    {iter_ctes}
    SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           CAST((src - (src % 2)) / 2 AS BIGINT) AS entity_key,
           ROUND(rank, 9) AS rank
    FROM r{_ITERS}
    ORDER BY kind, entity_key
    """


@register("pagerank_copurchase", oracle=_pagerank_oracle())
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank ({_ITERS} power iterations, damping 0.85) over the
    symmetrized customer-supplier co-purchase graph (edge = the customer
    ordered from the supplier at least once). Node ids are namespaced
    (customer keys even, supplier keys odd) so the two entity spaces
    share one rank vector.

    Scale: edges repartitioned on src once and persisted; each iteration
    moves only the |V|-row rank vector plus one |E| contribution shuffle
    grouped by dst (operators/graph.py docstring has the cost model)."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # persist: the symmetrized edge list feeds the degree aggregate AND
    # the static (src, dst, deg) relation — without the cache each
    # reference re-ran the lineitem join + distinct (r12, guide §1.2
    # step 1)
    raw = persist_tracked(
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # explode, not unionAll: the two direction branches were separate
    # plan subtrees, each evaluating `raw` once per reference (the
    # triangle_count finding) — identical edge multiset either way
    edges = raw.select(
        F.explode(
            F.array(
                F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    pr = pagerank(edges, iters=_ITERS, damping=_DAMPING)
    node = F.col("node")
    return pr.select(
        F.when(node % 2 == 0, "customer").otherwise("supplier").alias("kind"),
        ((node - (node % 2)) / 2).cast("bigint").alias("entity_key"),
        F.round("rank", 9).alias("rank"),
    ).orderBy("kind", "entity_key")


_KNN_K = 3
_DOT = "list_sum(list_transform(range(1, LEN({a}) + 1), i -> {a}[i] * {b}[i]))"
_NRM = "SQRT(list_sum(list_transform({a}, x -> x * x)))"


@register(
    "knn_graph_clustering",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             FLOOR(({_DOT.format(a="a.v", b="b.v")}
                   / ({_NRM.format(a="a.v")} * {_NRM.format(a="b.v")}))
                   * 10000) / 10000.0 AS score
      FROM v a JOIN v b ON b.vec_id <> a.vec_id
    ),
    knn AS (
      SELECT qid, nid FROM (
        SELECT qid, nid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY score DESC, nid ASC) AS rnk
        FROM scored
      ) WHERE rnk <= {_KNN_K}
    ),
    und AS (
      SELECT DISTINCT LEAST(qid, nid) AS a, GREATEST(qid, nid) AS b FROM knn
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    node_tri AS (
      SELECT node, COUNT(*) AS n_tri FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY node
    ),
    node_deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und
      ) GROUP BY node
    )
    SELECT d.node AS vec_id, CAST(d.deg AS INT) AS degree,
           CAST(COALESCE(t.n_tri, 0) AS INT) AS n_triangles,
           FLOOR((CAST(2.0 * COALESCE(t.n_tri, 0) AS DOUBLE)
                 / (d.deg * (d.deg - 1))) * 1000000) / 1000000.0 AS clustering
    FROM node_deg d LEFT JOIN node_tri t ON t.node = d.node
    ORDER BY vec_id
    """,
)
def knn_graph_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient of the cosine {_KNN_K}-NN graph:
    exact top-{_KNN_K} neighbors per vector (FLOOR-at-4dp score + id
    tie-break, the similarity.py determinism contract), symmetrized,
    then triangles enumerated once each via the ordered three-way
    self-join (x < y < z) and per-node clustering = 2*tri/(deg*(deg-1)).

    Scale: the exact all-pairs k-NN build here is the verification
    baseline — at corpus scale the edge list comes from the banded /
    IVF candidate generators (similarity.py) instead, and the triangle
    join's worst-case fan-out is bounded by k per node, so shuffle
    volume stays O(|V|*k^2). Every node has degree >= {_KNN_K}, so the
    clustering denominator is never zero."""
    emb = table_par(spark, sf_dir, "embeddings")
    v = (
        emb.select("vec_id", V.as_double("embedding").alias("v"))
        .withColumn("nrm", V.l2_norm(F.col("v")))
    )
    q = v.select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    pairs = v.alias("c").join(F.broadcast(q), F.col("vec_id") < F.col("qid"))
    score = (
        F.floor(
            V.dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")) * 10000
        )
        / 10000.0
    )
    # Score each unordered pair ONCE and mirror it: cosine is
    # bit-symmetric (per-element multiply and the norm product commute
    # exactly in IEEE, fold order unchanged), so this halves the 64-dim
    # fold work of the quadratic baseline without touching the oracle.
    half = pairs.select(
        "qid", F.col("vec_id").alias("nid"), score.alias("score")
    )
    scored = half.unionByName(
        half.select(
            F.col("nid").alias("qid"), F.col("qid").alias("nid"), "score"
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    knn = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _KNN_K
    )
    # persist the symmetrized edge list: it feeds all three triangle
    # join aliases plus both degree branches (5 plan references), and
    # without materialization EACH reference re-executes the quadratic
    # all-pairs scoring pass above (guide §1.2 step 1 / §5 caching —
    # reused AND expensive to recompute)
    und = persist_tracked(
        knn.select(
            F.least("qid", "nid").alias("a"), F.greatest("qid", "nid").alias("b")
        ).distinct()
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    )
    # explode, not 3-way unionAll: the union branches re-executed the
    # triangle join once each (the operators/graph.py triangle_count
    # finding, same fix) — identical node multiset either way
    node_tri = (
        tri.select(
            F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    node_deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0))
    return (
        node_deg.join(node_tri, "node", "left")
        .select(
            F.col("node").alias("vec_id"),
            F.col("deg").cast("int").alias("degree"),
            n_tri.cast("int").alias("n_triangles"),
            (
                F.floor(
                    (2.0 * n_tri).cast("double")
                    / (F.col("deg") * (F.col("deg") - 1))
                    * 1000000
                )
                / 1000000.0
            ).alias("clustering"),
        )
        .orderBy("vec_id")
    )


@register(
    "coorder_part_triangles",
    oracle="""
    WITH pp AS (
      SELECT DISTINCT l1.l_orderkey AS ok, l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    e AS (SELECT a, b FROM pp GROUP BY a, b HAVING COUNT(*) >= 2),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    nt AS (
      SELECT node, COUNT(*) AS n_tri FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY node
    ),
    nd AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
      ) GROUP BY node
    )
    SELECT d.node AS part,
           CAST(d.deg AS INT) AS degree,
           CAST(t.n_tri AS INT) AS n_triangles
    FROM nd d JOIN nt t ON t.node = d.node
    ORDER BY part
    """,
)
def coorder_part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the co-ordered-parts affinity graph: parts are
    adjacent when they appear together in >= 2 distinct orders (the
    support filter that turns incidental co-occurrence into affinity,
    and keeps |E| far below the per-order clique expansion); a
    triangle is a mutually-affine part triple — the seed pattern for
    bundle/substitute mining. Emits (part, degree, n_triangles) for
    every part in at least one triangle.

    Runs the compact-forward operator (orient='degree',
    operators/graph.py::triangle_count): every edge points toward its
    higher-(degree, id) endpoint so hub wedge fan-out stays bounded on
    skewed degree distributions — measured flat vs quadratic for the
    id ordering in tools/triangle_probe.py (SCALE.md). The oracle
    enumerates with the simple id ordering; the orientations are
    count-identical (tests/test_graph.py pins the equality), so the
    driver row attests the production orientation against an
    independent formulation.

    Scale: the pair build self-joins lineitem within l_orderkey
    (per-order fan-out bounded by order size, <= 7 in TPC-H); the
    support-2 HAVING prunes the shuffle to repeat pairs; the wedge
    join's skew is handled by the orientation itself."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    pp = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
        )
        .select(
            F.col("l1.l_orderkey").alias("ok"),
            F.col("l1.l_partkey").alias("a"),
            F.col("l2.l_partkey").alias("b"),
        )
        .distinct()
    )
    e = (
        pp.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .select("a", "b")
    )
    # e feeds three consumers (the operator's degree relation, the
    # orientation join, and the degree projection below) — persist so
    # the lineitem self-join + support aggregation runs once, not 3x
    e = persist_tracked(e)
    nt = triangle_count(e, orient="degree")
    nd = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        nd.join(nt, "node")
        .select(
            F.col("node").alias("part"),
            F.col("deg").cast("int").alias("degree"),
            F.col("n_tri").cast("int").alias("n_triangles"),
        )
        .orderBy("part")
    )
