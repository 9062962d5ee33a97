#!/usr/bin/env python
"""Streaming-ingest throughput probe: drive the full foreachBatch
pipeline (flatten -> geometry -> validate/quarantine -> partitioned
parquet sink -> catalog append -> quality check) over a synthetic spool
and measure per-tick latency against the reference's 60 s cadence
envelope (gtfs_rt_assets.py:253-257).

Generates N spool files x M vehicle entities each (the GTFS-RT JSON
shape the ingest contract starts from), drains them with
availableNow=True + maxFilesPerTrigger=1 so every file is its own
micro-batch (the minutely-tick shape), and reports rows/sec plus the
max per-batch wall — the number that must stay under 60 s at
production feed sizes.

Usage: python tools/stream_probe.py [n_files] [entities_per_file]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transit_feed_etl_spark.session import get_spark  # noqa: E402
from transit_feed_etl_spark.streaming.ingest import start_ingest  # noqa: E402

WORK = "/tmp/stream_probe"


def build_spool(n_files: int, per_file: int) -> str:
    spool = os.path.join(WORK, "spool")
    os.makedirs(spool, exist_ok=True)
    for f in range(n_files):
        entities = [
            {
                "id": f"v{f}_{i}",
                "vehicle": {
                    "vehicle": {"id": f"v{f}_{i}"},
                    "position": {
                        "latitude": 40.0 + (i % 100) * 0.001,
                        "longitude": -74.0 + (f % 60) * 0.001,
                        "speed": float(i % 30),
                        "bearing": float(i % 360),
                    },
                    "trip": {"trip_id": f"t{i % 50}", "route_id": f"r{i % 10}"},
                    "current_stop_sequence": i % 40,
                    "current_status": i % 3,
                },
            }
            for i in range(per_file)
        ]
        with open(os.path.join(spool, f"feed_{f:04d}.json"), "w") as fh:
            json.dump(
                {
                    "feed_id": "probe",
                    "fetch_ts": f"2024-03-01T12:{f % 60:02d}:00",
                    "entity": entities,
                },
                fh,
            )
    return spool


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    shutil.rmtree(WORK, ignore_errors=True)
    spool = build_spool(n_files, per_file)
    spark = get_spark(app_name="stream_probe")

    batch_walls: list[float] = []
    t_prev = [time.monotonic()]

    from transit_feed_etl_spark.pipeline.catalog import FileCatalog
    from transit_feed_etl_spark.streaming.ingest import make_batch_processor

    catalog = FileCatalog(spark, os.path.join(WORK, "catalog"))
    process, metrics = make_batch_processor(
        os.path.join(WORK, "out"), catalog, os.path.join(WORK, "quarantine")
    )

    def timed_process(batch, batch_id):
        t0 = time.monotonic()
        process(batch, batch_id)
        batch_walls.append(time.monotonic() - t0)
        t_prev[0] = time.monotonic()

    from transit_feed_etl_spark.pipeline.gtfs import RAW_FEED_SCHEMA

    raw = (
        spark.readStream.schema(RAW_FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(spool)
    )
    t_start = time.monotonic()
    q = (
        raw.writeStream.option(
            "checkpointLocation", os.path.join(WORK, "ckpt")
        )
        .foreachBatch(timed_process)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t_start

    out = {
        "metric": "ingest_throughput",
        "n_batches": metrics.batches,
        "rows": metrics.records,
        "rows_per_sec": round(metrics.records / wall, 1),
        "total_wall_sec": round(wall, 2),
        "max_batch_sec": round(max(batch_walls), 3) if batch_walls else None,
        "p50_batch_sec": round(sorted(batch_walls)[len(batch_walls) // 2], 3)
        if batch_walls
        else None,
        "cadence_envelope_sec": 60,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
