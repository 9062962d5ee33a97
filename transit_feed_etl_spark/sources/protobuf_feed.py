"""GTFS-realtime protobuf adapter (A3 decode path, reference
gtfs_rt_assets.py:26-49). Optional: the gtfs-realtime bindings
(google.transit) are not in the runtime image, so both the driver-side
parser and the distributed `from_protobuf` path are gated behind
import-try; tests use the JSON/struct-shaped fixtures instead
(FIXTURES.md F2 — semantics identical, no descriptor file needed).
"""

from __future__ import annotations

from datetime import datetime

try:  # pragma: no cover — not present in the v1 image
    from google.transit import gtfs_realtime_pb2

    HAVE_GTFS_PB = True
except ImportError:
    gtfs_realtime_pb2 = None
    HAVE_GTFS_PB = False


def parse_feed_message(payload: bytes, feed_id: str, fetch_ts: datetime) -> dict:
    """Decode a FeedMessage into the RAW_FEED_SCHEMA dict shape
    (feed_id, fetch_ts, entity[]). Mirrors the reference's 11-field
    projection with HasField guards (gtfs_rt_assets.py:33-47) — but the
    null-guarding itself happens downstream in flatten_feed, which maps
    absent sub-messages to NULL structs."""
    if not HAVE_GTFS_PB:
        raise NotImplementedError(
            "google.transit bindings not installed; use the JSON spool shape "
            "(FIXTURES.md F2) or install gtfs-realtime-bindings"
        )
    msg = gtfs_realtime_pb2.FeedMessage()
    msg.ParseFromString(payload)
    entities = []
    for entity in msg.entity:
        if not entity.HasField("vehicle"):
            entities.append({"id": entity.id or None, "vehicle": None})
            continue
        v = entity.vehicle
        entities.append(
            {
                "id": entity.id or None,
                "vehicle": {
                    "vehicle": {"id": v.vehicle.id} if v.HasField("vehicle") else None,
                    "position": (
                        {
                            "latitude": v.position.latitude,
                            "longitude": v.position.longitude,
                            "speed": v.position.speed if v.position.HasField("speed") else None,
                            "bearing": (
                                v.position.bearing if v.position.HasField("bearing") else None
                            ),
                        }
                        if v.HasField("position")
                        else None
                    ),
                    "trip": (
                        {"trip_id": v.trip.trip_id, "route_id": v.trip.route_id}
                        if v.HasField("trip")
                        else None
                    ),
                    "current_stop_sequence": (
                        v.current_stop_sequence
                        if v.HasField("current_stop_sequence")
                        else None
                    ),
                    "current_status": (
                        v.current_status if v.HasField("current_status") else None
                    ),
                },
            }
        )
    return {
        "feed_id": feed_id,
        "fetch_ts": fetch_ts.strftime("%Y-%m-%dT%H:%M:%S"),
        "entity": entities,
    }


def read_binary_feeds(spark, path: str):
    """Distributed raw-payload scan: pre-fetched .pb files as binary rows
    (path, modificationTime, content). Decode via from_protobuf with a
    descriptor file, or mapInPandas + parse_feed_message when bindings
    exist. Parity path for A1 at scale."""
    return spark.read.format("binaryFile").load(path)
