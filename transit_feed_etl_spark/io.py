"""Table loaders for the driver testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf dir.

``spark.read.parquet`` gives Catalyst full pushdown: filters and column
pruning reach the parquet scan (check ``PushedFilters`` / ``ReadSchema``
in ``df.explain("formatted")``).
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# DataFrame plans are immutable, so the loaded frame for a given
# (sf_dir, name) can be shared across queries within one session. The
# memo removes the per-build parquet footer/schema read (~0.2 s per
# table() call) and the table_par partition probe (~0.15 s) — fixed
# driver-side latency that would otherwise tax EVERY query build.
_CACHE: WeakKeyDictionary = WeakKeyDictionary()


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Timestamp semantics contract: every oracle assumes UTC (epoch
    # casts, date_format, interval comparisons). get_spark() pins this,
    # but the DRIVER may hand us its own session — pin it here too so
    # parity never depends on the host JVM's default zone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects. Read nanos as long, then truncate to microseconds —
        # exactly what DuckDB does when it surfaces the column as a
        # microsecond TIMESTAMP, so oracle comparisons agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    per = _CACHE.setdefault(spark, {})
    key = (sf_dir, name, "raw")
    if key not in per:
        per[key] = _load(spark, sf_dir, name)
    return per[key]


def _row_groups(path: str) -> int:
    """Row-group count from the parquet footer (pyarrow metadata-only
    read — no data pages touched). Row groups are parquet's effective
    split granularity: Spark assigns each row group to the byte-range
    split containing its midpoint, so a file with one row group does
    all its scan work in ONE task no matter how many splits exist."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_row_groups


def table_par(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Like :func:`table`, but guarantees the scan feeds at least
    ``defaultParallelism`` partitions.

    The driver testdata is one parquet file with ONE row group per table, so
    the scan is an unsplittable single task; expression-heavy per-row work
    (tokenize/shingle/hash) would serialize onto one core. One cheap
    round-robin shuffle of the raw rows buys full-core downstream map work.
    On a real cluster the input split count already exceeds parallelism and
    this becomes a no-op (guarded, no shuffle is added). The splittability
    probe reads only the parquet footer — pure metadata, no RDD-API plan
    materialization (falls back to the RDD partition count for sources
    where the footer isn't reachable)."""
    per = _CACHE.setdefault(spark, {})
    key = (sf_dir, name, "par")
    if key not in per:
        df = table(spark, sf_dir, name)
        par = spark.sparkContext.defaultParallelism
        try:
            effective = _row_groups(f"{sf_dir}/{name}.parquet")
        except Exception:
            effective = df.rdd.getNumPartitions()
        if effective < par:
            df = df.repartition(par)
        per[key] = df
    return per[key]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
