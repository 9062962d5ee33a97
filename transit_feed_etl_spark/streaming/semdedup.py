"""Incremental semantic dedup: SemDeDup over an embedding stream
against PERSISTENT centroid + arrival stores — the streaming face of
`queries/similarity.py::incremental_semdedup_rounds` (the driver-oracled
batch twin builds its rounds from THIS module's `semdedup_round`, so the
green CORRECTNESS row attests the very plan the foreachBatch body runs —
the same construction as streaming/corpus_dedup.py and its
`corpus_dedup_rounds` twin).

This is the daily-increment operational mode: a crawl delivers embedding
micro-batches forever; each arrival must be checked against the WHOLE
history of its cell, not a watermark (yesterday's semantic duplicate is
still a duplicate).

Scale design:
- The CENTROID store is trained once (first batch) and then FROZEN:
  retraining per increment would silently re-partition every historical
  cell and invalidate the stored assignments. Assignment routes through
  the broadcast-tree `hier_assign` walk — the stream never shuffles
  during assignment.
- The ARRIVAL store holds (cell, vec_id, v, nrm) for ALL arrivals, not
  just survivors: the SemDeDup prune decision is precedence-based, not
  survivor-transitive (a new vector is pruned if ANY earlier arrival in
  its cell is cosine-similar, pruned or not). At 100 TB the store is a
  cell-bucketed table, so each batch's new-vs-history join co-partitions
  against it WITHOUT reshuffling history; per-batch cost is
  O(|batch| x cell-occupancy), independent of history length.
- Verdicts are materialized (localCheckpoint) BEFORE the batch is
  appended to the store — a lazy verdict plan re-evaluated after the
  append would pair arrivals against themselves via the store and
  prune everything with cos 1.0.
- foreachBatch is AT-LEAST-ONCE (ADVICE r11): if a batch fails after
  the store write and is retried, a plain append would leave the
  retried batch's own rows in the store — the store join has no
  ida != idb guard, so every vector would pair with its own copy at
  cos 1.0 and be pruned with itself as keeper (and the store would
  double-append). The store write is therefore idempotent per batch:
  each batch OVERWRITES its own `batch_id=N` subpath, and the store
  read for verdict computation excludes the current batch's subpath —
  a retry recomputes identical verdicts against exactly the
  strictly-earlier history. The verdict sink is idempotent the same
  way (per-batch overwrite in `start_semdedup_stream`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

# single source of truth for the prune threshold — a duplicated literal
# here could silently drift from the batch face (ADVICE r11); safe to
# import at module level: queries/similarity.py only imports THIS module
# lazily inside the twin builder, so there is no import cycle
from transit_feed_etl_spark.queries.similarity import _SEMDEDUP_TAU as _TAU


def semdedup_pair_scan(
    batch: DataFrame, store: DataFrame | None, tau: float = _TAU
) -> DataFrame:
    """One round's similar-pair scan: (cell_b, ida, idb, cos6) for every
    in-cell pair whose earlier side precedes `idb`'s arrival, filtered
    at cos6 >= tau. `batch` and `store` carry (vec_id, cell, v, nrm);
    the store holds strictly-earlier arrivals.

    ONE cell-equijoin per round (r13, guide §2.4/§3.1): the a-side is
    the union of the store (tagged pre_a = true — everything in it
    precedes the whole batch) and the batch itself (pre_a = false — in
    one batch, arrival order is id order), and the precedence residual
    `pre_a OR ida < idb` rides the equijoin. The r12 shape ran TWO
    joins per round (in-batch with the id< residual, store with none)
    and unioned their outputs — two broadcast builds and two join
    stages per round for the identical pair set: for a ∈ batch the
    residual reduces to ida < idb, for a ∈ store to true, so the single
    join's pair multiset is exactly the old union, row for row.
    cos6 is FLOOR-truncated at 6dp (r12 repin, the portable IEEE form —
    see queries/similarity.py's module docstring), matching the batch
    face's `_semdedup_prune_from_cells` expression exactly."""
    cos6 = (
        F.floor(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")) * 1000000
        )
        / 1000000.0
    )

    def _a(df: DataFrame, precedes: bool) -> DataFrame:
        return df.select(
            F.col("cell").alias("cell_a"),
            F.col("vec_id").alias("ida"),
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
            F.lit(precedes).alias("pre_a"),
        )

    a = _a(batch, False)
    if store is not None:
        a = _a(store, True).unionByName(a)
    y = batch.select(
        F.col("cell").alias("cell_b"),
        F.col("vec_id").alias("idb"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cand = a.join(
        y,
        (F.col("cell_a") == F.col("cell_b"))
        & (F.col("pre_a") | (F.col("ida") < F.col("idb"))),
    )
    return cand.select("cell_b", "ida", "idb", cos6.alias("cos6")).filter(
        F.col("cos6") >= tau
    )


def semdedup_verdicts(pairs: DataFrame) -> DataFrame:
    """Per-arrival prune verdicts (vec_id, cell, keeper_id, max_cos6)
    from a similar-pair relation. Because a vector's verdict is final
    the round it arrives (its pairs are all in-batch or vs
    strictly-earlier arrivals), this aggregation distributes over
    key-disjoint unions of per-round pair scans: grouping the union of
    K rounds' pairs equals unioning K per-round groupings — the fold
    the batch twin (queries/similarity.py:semdedup_rounds) exploits to
    run ONE verdict aggregation for all rounds (r13, guide §2.3)."""
    return pairs.groupBy(F.col("idb").alias("vec_id")).agg(
        F.min("cell_b").cast("int").alias("cell"),
        F.min("ida").cast("bigint").alias("keeper_id"),
        F.max("cos6").alias("max_cos6"),
    )


def semdedup_round(
    batch: DataFrame, store: DataFrame | None, tau: float = _TAU
) -> DataFrame:
    """Pure-plan core of one semantic-dedup round, shared by the
    streaming foreachBatch body below and the registered batch twin
    (queries/similarity.py:semdedup_rounds — the driver-oracled face of
    this operator): the single-join pair scan + the verdict
    aggregation. Per-round verdicts union to the global recompute —
    the merge law the batch twin's oracle proves."""
    return semdedup_verdicts(semdedup_pair_scan(batch, store, tau))


def _dot(a, b):
    from transit_feed_etl_spark.operators import vectors as V

    return V.dot(a, b)


def _assigned(v: DataFrame, cent: DataFrame, n_cells: int) -> DataFrame:
    """(vec_id, cell, v, nrm) via the frozen-centroid broadcast-tree
    walk, with the store-stable column types."""
    from transit_feed_etl_spark.operators import vectors as V
    from transit_feed_etl_spark.queries.similarity import hier_assign

    return (
        hier_assign(v, cent, n_cells=n_cells)
        .withColumn("nrm", V.l2_norm(F.col("v")))
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("cell").cast("long").alias("cell"),
            "v",
            "nrm",
        )
    )


def ensure_centroids(
    spark: SparkSession,
    cent_path: str,
    first_batch: DataFrame,
    n_cells: int,
    iters: int = 3,
) -> DataFrame:
    """Read the persistent centroid store, or train it ONCE on the first
    batch (seeds = its n_cells lowest vec_ids, the deterministic rule
    the batch twin's oracle unrolls) and freeze it. Frozen centroids are
    the production posture — see module doc."""
    from transit_feed_etl_spark.queries.similarity import kmeans_train

    try:
        return spark.read.parquet(cent_path)
    except AnalysisException:
        seeds = (
            first_batch.orderBy("vec_id")
            .limit(n_cells)
            .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        )
        cent = kmeans_train(
            first_batch, iters=iters, n_cells=n_cells, seeds=seeds
        ).localCheckpoint()
        cent.write.mode("overwrite").parquet(cent_path)
        return cent


def semdedup_batch_against_store(
    batch: DataFrame,
    store_path: str,
    cent_path: str,
    n_cells: int = 16,
    tau: float = _TAU,
    batch_id: int = 0,
) -> DataFrame:
    """One foreachBatch body: assign the batch to cells with the frozen
    centroids (training them if this is the first batch ever), compute
    prune verdicts against the arrival store + in-batch, write the
    batch's arrivals to its OWN `batch_id={batch_id}` store subpath
    (overwrite — idempotent under foreachBatch's at-least-once retry,
    see module doc), and return the verdicts (already materialized).
    The store read drops rows carrying this batch_id so a retry never
    pairs the batch against its own earlier, failed write."""
    spark = batch.sparkSession
    cent = ensure_centroids(spark, cent_path, batch, n_cells)
    m = _assigned(batch, cent, n_cells)
    try:
        store = spark.read.parquet(store_path)
        # partition discovery surfaces batch_id as a column; exclude the
        # current batch's (possibly half-written, now-stale) subpath and
        # drop the column so the round sees the stable store schema
        if "batch_id" in store.columns:
            store = store.filter(
                F.col("batch_id") != F.lit(int(batch_id))
            ).drop("batch_id")
    except AnalysisException:
        store = None
    verdicts = semdedup_round(m, store, tau).localCheckpoint()
    # snapshot BEFORE the store write (see module doc)
    m.write.mode("overwrite").parquet(f"{store_path}/batch_id={int(batch_id)}")
    return verdicts


def start_semdedup_stream(
    spark: SparkSession,
    spool_dir: str,
    out_dir: str,
    store_path: str,
    cent_path: str,
    checkpoint_dir: str,
    n_cells: int = 16,
    tau: float = _TAU,
):
    """File-source embedding stream -> incremental semantic dedup ->
    parquet verdict sink. availableNow trigger: drains whatever is
    spooled, then stops — run per ingestion cycle, or swap in a
    processingTime trigger for continuous operation."""
    from transit_feed_etl_spark.operators import vectors as V

    stream = spark.readStream.schema("vec_id long, embedding array<double>").json(
        spool_dir
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        v = batch.select("vec_id", V.as_double("embedding").alias("v"))
        verdicts = semdedup_batch_against_store(
            v, store_path, cent_path, n_cells=n_cells, tau=tau, batch_id=batch_id
        )
        # per-batch overwrite: a retried batch replaces its own output
        # instead of double-appending (module doc, at-least-once note)
        verdicts.write.mode("overwrite").parquet(f"{out_dir}/batch_id={int(batch_id)}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
