"""Import every query module so @register side effects populate the
registry. `from transit_feed_etl_spark.queries import QUERIES` is the
one-stop entry point for the driver contract."""

from transit_feed_etl_spark.registry import QUERIES  # noqa: F401

from transit_feed_etl_spark.queries import (  # noqa: F401,E402
    aggregates,
    analytics,
    asof_queries,
    bpe,
    classifier,
    cleaning,
    curation,
    datasetops,
    dedup,
    graph,
    joins,
    media,
    relational,
    reshape,
    scalar_funcs,
    setops,
    similarity,
    subqueries,
    textops,
    time_windows,
    tpch_extra,
    udf_surface,
    windows,
)
