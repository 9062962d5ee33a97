"""transit_feed_etl_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
repo ``indraneel/transit-feed-etl`` (a Dagster GTFS-realtime ETL pipeline,
surveyed in SURVEY.md) as an idiomatic Spark DataFrame / Spark SQL /
Structured Streaming engine, extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout:
  session.py    — tuned SparkSession factory
  io.py         — table loaders for the driver testdata
  registry.py   — query registry (name -> builder + DuckDB oracle SQL)
  queries/      — the registered query surface (SURVEY.md §2 inventory)
  operators/    — reusable operator implementations (asof, dedup, similarity,
                  catalog/bbox pruning, multimodal)
  pipeline/     — GTFS-RT-shaped ETL parity (flatten, geometry, sink, checks)
  streaming/    — Structured Streaming ingestion + windowed semantics
"""

from transit_feed_etl_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
