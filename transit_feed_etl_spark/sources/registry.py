"""Feed registry (A2, reference api_utils.py:29-55 + feeds_config.yaml):
YAML config -> normalized feed dicts -> small DataFrame.

The registry parameterizes ingestion fan-out (one fetch per feed per
tick); as data it is a classic broadcast dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

try:  # pyyaml is common but not guaranteed — gate it (env contract).
    import yaml

    _HAVE_YAML = True
except ImportError:  # pragma: no cover
    _HAVE_YAML = False

FEED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("api_token", T.StringType(), True),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def normalize_feeds(config: dict) -> list[dict]:
    """Normalize {feeds: {id: {url, api_token?, headers?}}} to flat feed
    dicts — the reference's get_all_feeds shape (api_utils.py:44-53)."""
    feeds = []
    for feed_id, spec in (config.get("feeds") or {}).items():
        if not spec or "url" not in spec:
            continue  # skip malformed entries (reference raises; we isolate)
        feeds.append(
            {
                "id": str(feed_id),
                "url": str(spec["url"]),
                "api_token": spec.get("api_token"),
                "headers": dict(spec.get("headers") or {}) or None,
            }
        )
    return feeds


def load_feeds_config(path: str) -> list[dict]:
    if not _HAVE_YAML:
        raise ImportError("pyyaml not available; pass a parsed dict to normalize_feeds")
    with open(path) as f:
        return normalize_feeds(yaml.safe_load(f) or {})


def feeds_dataframe(spark: SparkSession, feeds: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        [(f["id"], f["url"], f["api_token"], f["headers"]) for f in feeds],
        FEED_SCHEMA,
    )
