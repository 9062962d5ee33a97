"""Streaming tests: end-to-end spool->ingest->catalog (A23 pipeline as a
Structured Streaming query) and the Phase-3 window/dedup/session/stateful
semantics, driven synchronously with availableNow/processAllAvailable."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from transit_feed_etl_spark.streaming.ingest import start_ingest
from transit_feed_etl_spark.streaming.windows import (
    dedup_within_watermark,
    session_windows,
    stateful_anomaly_counts,
    windowed_counts,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _spool_file(path, feed_id, ts_iso, entities):
    with open(path, "w") as f:
        json.dump({"feed_id": feed_id, "fetch_ts": ts_iso, "entity": entities}, f)


def test_ingest_stream_end_to_end(spark, tmp_path):
    spool = tmp_path / "spool"
    spool.mkdir()
    ent = lambda vid, lat, lon: {  # noqa: E731
        "id": vid,
        "vehicle": {
            "vehicle": {"id": vid},
            "position": {"latitude": lat, "longitude": lon, "speed": 1.0, "bearing": 0.0},
            "trip": {"trip_id": "t", "route_id": "r"},
            "current_stop_sequence": 1,
            "current_status": 2,
        },
    }
    _spool_file(spool / "mta_1.json", "mta", "2024-03-01T12:00:00", [ent("v1", 40.7, -74.0)])
    _spool_file(
        spool / "mta_2.json",
        "mta",
        "2024-03-01T12:01:00",
        [ent("v2", 40.8, -73.9), {"id": "x", "vehicle": None}, ent("bad", 99.0, -500.0)],
    )

    q, metrics, catalog = start_ingest(
        spark,
        str(spool),
        str(tmp_path / "out"),
        str(tmp_path / "catalog"),
        str(tmp_path / "ckpt"),
        quarantine_root=str(tmp_path / "quarantine"),
        available_now=True,
    )
    q.awaitTermination(120)

    assert metrics.records == 2  # v1, v2 (x filtered by A4; bad quarantined by A8)
    assert metrics.quarantined == 1
    assert catalog.total_records() == 2
    assert catalog.check_not_empty()["passed"]
    data = spark.read.parquet(str(tmp_path / "out"))
    assert {r["vehicle_id"] for r in data.collect()} == {"v1", "v2"}
    quar = spark.read.parquet(str(tmp_path / "quarantine"))
    assert quar.collect()[0]["vehicle_id"] == "bad"


def test_ingest_cadence_processing_time_trigger(spark, tmp_path):
    """A23 cadence proof (VERDICT r1 item 9): the ingestion stream runs
    on a real processingTime trigger (scaled 60s -> 1s for test wall
    time; the code path is identical), new spool files are picked up by
    SUBSEQUENT micro-batches, and every batch — flatten, validate,
    partitioned write, catalog append, quality check — completes far
    inside the reference's 60 s per-tick budget
    (gtfs_rt_assets.py:253-257: next cron tick must not overlap)."""
    import time

    spool = tmp_path / "spool_cadence"
    spool.mkdir()
    ent = lambda vid: {  # noqa: E731
        "id": vid,
        "vehicle": {
            "vehicle": {"id": vid},
            "position": {"latitude": 40.7, "longitude": -74.0, "speed": 1.0, "bearing": 0.0},
            "trip": {"trip_id": "t", "route_id": "r"},
            "current_stop_sequence": 1,
            "current_status": 2,
        },
    }
    _spool_file(spool / "b1.json", "mta", "2024-03-01T12:00:00", [ent("v1")])

    q, metrics, catalog = start_ingest(
        spark,
        str(spool),
        str(tmp_path / "cad_out"),
        str(tmp_path / "cad_catalog"),
        str(tmp_path / "cad_ckpt"),
        processing_time="1 second",
    )

    def wait_for(pred, timeout=90.0):
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            if pred():
                return True
            time.sleep(0.25)
        return False

    try:
        # wait on the CHECKS counter: it is the last step of the batch,
        # so records/catalog state are consistent once it advances
        assert wait_for(lambda: len(metrics.checks) >= 1), "first batch never landed"
        batches_after_first = metrics.batches
        # second file arrives AFTER the first batch: a later tick must get it
        _spool_file(spool / "b2.json", "mta", "2024-03-01T12:01:00", [ent("v2")])
        assert wait_for(lambda: len(metrics.checks) >= 2), "second tick never landed"
        assert metrics.batches > batches_after_first
        # per-batch wall time vs the reference's 60 s budget
        exec_ms = [
            p["durationMs"].get("triggerExecution", 0)
            for p in (json.loads(x.json) for x in q.recentProgress)
            if p.get("numInputRows", 0) > 0
        ]
        assert exec_ms, "no non-empty batch progress recorded"
        assert max(exec_ms) < 60_000, f"batch exceeded the 60s budget: {exec_ms}"
        # catalog + quality check ran per non-empty batch and passed
        assert catalog.total_records() == 2
        assert len(metrics.checks) >= 2
        assert all(c["passed"] for c in metrics.checks)
    finally:
        q.stop()


def _stream_events(spark, tmp_path, rows, name):
    src = tmp_path / f"events_src_{name}"
    src.mkdir()
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(src))
    return spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))


def _run_to_memory(stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_stream(spark, tmp_path):
    t = lambda m, s=0: datetime(2024, 3, 1, 12, m, s)  # noqa: E731
    rows = [
        (1, t(0), 1, "click", 1.0),
        (2, t(2), 1, "click", 2.0),
        (3, t(7), 2, "view", 3.0),
    ]
    agg = windowed_counts(
        _stream_events(spark, tmp_path, rows, "win"), window="5 minutes"
    )
    # complete mode: append would hold back windows the watermark hasn't
    # passed, and a drained availableNow stream never advances it further
    _run_to_memory(agg, "win_out", mode="complete")
    out = {(r["window_start"].minute, r["event_type"]): r["n"] for r in
           spark.sql("SELECT * FROM win_out").collect()}
    assert out == {(0, "click"): 2, (5, "view"): 1}


def test_dedup_within_watermark_stream(spark, tmp_path):
    t = lambda m: datetime(2024, 3, 1, 12, m)  # noqa: E731
    rows = [
        (1, t(0), 1, "click", 1.0),
        (1, t(1), 1, "click", 1.0),  # duplicate event_id within watermark
        (2, t(2), 1, "view", 2.0),
    ]
    dd = dedup_within_watermark(
        _stream_events(spark, tmp_path, rows, "dd"), keys=["event_id"]
    )
    _run_to_memory(dd, "dd_out")
    assert spark.sql("SELECT count(*) AS n FROM dd_out").collect()[0]["n"] == 2


def test_session_windows_stream(spark, tmp_path):
    t = lambda h, m: datetime(2024, 3, 1, h, m)  # noqa: E731
    rows = [
        (1, t(12, 0), 7, "click", 1.0),
        (2, t(12, 10), 7, "click", 1.0),   # same session (gap < 30m)
        (3, t(14, 0), 7, "click", 1.0),    # new session
    ]
    sw = session_windows(_stream_events(spark, tmp_path, rows, "sess"), gap="30 minutes")
    _run_to_memory(sw, "sess_out", mode="complete")
    out = sorted(
        (r["session_start"].hour, r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    )
    assert out == [(12, 2), (14, 1)]


def test_stateful_anomaly_operator(spark, tmp_path):
    t = lambda m: datetime(2024, 3, 1, 12, m)  # noqa: E731
    rows = [
        (1, t(0), 1, "click", 1.0),
        (2, t(1), 1, "click", 1.0),
        (3, t(2), 1, "click", 500.0),  # >10x running mean -> anomaly
        (4, t(3), 2, "view", 2.0),
    ]
    st = stateful_anomaly_counts(_stream_events(spark, tmp_path, rows, "anom"))
    _run_to_memory(st, "anom_out", mode="update")
    out = {r["user_id"]: r for r in spark.sql("SELECT * FROM anom_out").collect()}
    assert out[1]["n_anomalies"] >= 1
    assert out[1]["running_total"] == 502.0
    assert out[2]["n_anomalies"] == 0


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics (Part B streaming rows): after the watermark
    passes a window's end, a late-arriving event for that window is
    DROPPED — append mode emits each finalized window exactly once and
    never revises it. (The reference's cron-lookback A18 recomputes its
    1-hour window every run and would silently absorb late rows; the
    watermark contract makes lateness explicit and state bounded.)"""
    t = lambda h, m: datetime(2024, 3, 1, h, m)  # noqa: E731
    src = tmp_path / "late_src"
    src.mkdir()

    def write_batch(rows, mode):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(mode).parquet(str(src))

    # batch 1: window [12:00,12:05) gets one click; 12:30 advances the
    # watermark to 12:20, finalizing and emitting that window
    write_batch([(1, t(12, 0), 1, "click", 1.0), (2, t(12, 30), 1, "view", 1.0)], "overwrite")
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))
    agg = windowed_counts(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory").queryName("late_out").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "late_ckpt")).start()
    )
    try:
        q.processAllAvailable()
        # batch 2: event_id=3 lands in the already-finalized 12:00 window
        # (late beyond the watermark -> dropped); 12:50 advances the
        # watermark past 12:30's window so it finalizes with n=1
        write_batch([(3, t(12, 2), 1, "click", 1.0), (4, t(12, 50), 1, "click", 1.0)], "append")
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        (r["window_start"].hour, r["window_start"].minute, r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # 12:00 window: n=1 (the late click did NOT bump it to 2);
    # 12:30 window: n=1; 12:50 window: unfinalized, not emitted
    assert out == {(12, 0, "click"): 1, (12, 30, "view"): 1}


def test_ingest_stream_geoparquet_mode(spark, tmp_path):
    """geoparquet=True: the streamed output files carry real WKB
    geometry and the GeoParquet 'geo' footer with per-file bbox —
    A12 GeoParquet parity inside the live pipeline."""
    import glob as _glob

    import pyarrow.parquet as pq

    spool = tmp_path / "spool_geo"
    spool.mkdir()
    _spool_file(
        spool / "f.json",
        "mta",
        "2024-03-01T12:00:00",
        [
            {
                "id": "v9",
                "vehicle": {
                    "vehicle": {"id": "v9"},
                    "position": {"latitude": 40.7, "longitude": -74.0,
                                 "speed": 1.0, "bearing": 0.0},
                    "trip": {"trip_id": "t", "route_id": "r"},
                    "current_stop_sequence": 1,
                    "current_status": 2,
                },
            }
        ],
    )
    q, metrics, catalog = start_ingest(
        spark,
        str(spool),
        str(tmp_path / "geo_out"),
        str(tmp_path / "geo_catalog"),
        str(tmp_path / "geo_ckpt"),
        available_now=True,
        geoparquet=True,
    )
    q.awaitTermination(120)
    assert metrics.records == 1
    files = _glob.glob(str(tmp_path / "geo_out") + "/**/*.parquet", recursive=True)
    assert files
    tbl = pq.read_table(files[0])
    geo = json.loads(tbl.schema.metadata[b"geo"])
    assert geo["primary_column"] == "geometry"
    assert geo["columns"]["geometry"]["bbox"] == [-74.0, 40.7, -74.0, 40.7]
    wkb = tbl.to_pandas()["geometry"].iloc[0]
    assert bytes(wkb[:5]) == b"\x01\x01\x00\x00\x00"  # WKB little-endian Point


def test_stream_stream_interval_join(spark, tmp_path):
    """Two live streams joined on key + bounded event-time distance:
    purchases within 30 min of a view match; outside the horizon don't."""
    from transit_feed_etl_spark.streaming.windows import stream_stream_interval_join

    t = lambda h, m: datetime(2024, 3, 1, h, m)  # noqa: E731
    views = [
        (10, t(12, 0), 1, "view", 1.0),
        (11, t(12, 0), 2, "view", 1.0),
    ]
    purchases = [
        (20, t(12, 10), 1, "purchase", 5.0),   # within 30m of view 10
        (21, t(13, 30), 2, "purchase", 7.0),   # 90m later: outside horizon
    ]
    j = stream_stream_interval_join(
        _stream_events(spark, tmp_path, views, "ssj_v"),
        _stream_events(spark, tmp_path, purchases, "ssj_p"),
    )
    _run_to_memory(j, "ssj_out")
    out = [(r["left_id"], r["right_id"], r["lag_seconds"]) for r in
           spark.sql("SELECT * FROM ssj_out").collect()]
    assert out == [(10, 20, 600)]


def test_ingest_checkpoint_recovery_no_duplicates(spark, tmp_path):
    """Restarting the ingest query from its CHECKPOINT processes only the
    files that arrived after the first run — exactly-once per spool file:
    the recovery property that lets a 100 TB ingest crash and resume
    without double-writing or rescanning history."""
    spool = tmp_path / "spool"
    spool.mkdir()
    ent = lambda vid: {  # noqa: E731
        "id": vid,
        "vehicle": {
            "vehicle": {"id": vid},
            "position": {"latitude": 40.0, "longitude": -74.0, "speed": 1.0, "bearing": 0.0},
            "trip": {"trip_id": "t", "route_id": "r"},
            "current_stop_sequence": 1,
            "current_status": 2,
        },
    }
    _spool_file(spool / "a_1.json", "mta", "2024-03-01T12:00:00", [ent("v1")])

    def run_once():
        q, metrics, catalog = start_ingest(
            spark,
            str(spool),
            str(tmp_path / "out"),
            str(tmp_path / "catalog"),
            str(tmp_path / "ckpt"),
            quarantine_root=str(tmp_path / "quarantine"),
            available_now=True,
        )
        q.awaitTermination(120)
        return metrics, catalog

    m1, _ = run_once()
    assert m1.records == 1
    # second file lands while the query is DOWN
    _spool_file(spool / "a_2.json", "mta", "2024-03-01T12:01:00", [ent("v2")])
    m2, catalog = run_once()
    # the restarted run must process ONLY the new file
    assert m2.records == 1, m2.records
    data = spark.read.parquet(str(tmp_path / "out"))
    ids = sorted(r["vehicle_id"] for r in data.collect())
    assert ids == ["v1", "v2"]  # no duplicates, nothing lost
    assert catalog.total_records() == 2


def test_transform_with_state_quota(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: per-user admission quota
    holds ACROSS micro-batches (two files -> two batches via
    maxFilesPerTrigger=1; ValueState carries the running totals).

    Capability gate: the transformWithState state-server protocol is
    protobuf-based; without google.protobuf bindings the engine's
    Python driver worker cannot start (same optional dependency the
    GTFS bindings path documents in sources/protobuf_feed.py)."""
    pytest.importorskip("google.protobuf.descriptor")
    from transit_feed_etl_spark.streaming.stateful import quota_admission

    t = lambda m: datetime(2024, 3, 1, 12, m)  # noqa: E731
    src = tmp_path / "quota_src"
    src.mkdir()
    b1 = [(i, t(i % 60), 1, "click", 1.0) for i in range(4)]
    b2 = [(100 + i, t(i % 60), 1, "click", 1.0) for i in range(4)] + [
        (200, t(0), 2, "view", 1.0)
    ]
    spark.createDataFrame(b1, EVENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(b2, EVENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "f2")
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    _run_to_memory(quota_admission(stream, quota=5), "quota_out", mode="update")
    rows = sorted(
        (r["user_id"], r["batch_seen"], r["batch_admitted"], r["total_admitted"])
        for r in spark.sql("SELECT * FROM quota_out").collect()
    )
    # user 1: batch1 admits all 4; batch2 admits only 1 more (quota 5)
    # user 2: single event admitted
    assert (1, 4, 4, 4) in rows
    assert (1, 4, 1, 5) in rows
    assert (2, 1, 1, 1) in rows


def test_corpus_dedup_across_batches(spark, tmp_path):
    """Historical dedup: a duplicate arriving N batches later must still
    be dropped (state = persistent digest store, not a watermark), the
    first-seen id must survive, and in-batch duplicates collapse to the
    lowest id."""
    import json as _json

    from transit_feed_etl_spark.streaming.corpus_dedup import (
        start_corpus_dedup_stream,
    )

    spool = tmp_path / "spool"
    spool.mkdir()
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def spool_file(name, rows):
        (spool / name).write_text(
            "\n".join(_json.dumps(r) for r in rows) + "\n"
        )

    # batch 1: doc 3 and 5 share content -> 3 survives
    spool_file("b1.json", [
        {"doc_id": 1, "text": "alpha"},
        {"doc_id": 3, "text": "same-content"},
        {"doc_id": 5, "text": "same-content"},
    ])
    q = start_corpus_dedup_stream(spark, str(spool), out, store, ckpt)
    q.awaitTermination(120)

    # batch 2 (separate run, same store): one historical dup, one new
    spool_file("b2.json", [
        {"doc_id": 9, "text": "alpha"},          # dup of batch-1 doc 1
        {"doc_id": 11, "text": "brand-new"},
    ])
    q = start_corpus_dedup_stream(spark, str(spool), out, store, ckpt)
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, "alpha"), (3, "same-content"), (11, "brand-new")}
    # store carries one digest row per appended fresh row
    assert spark.read.parquet(store).distinct().count() == 3


def test_watermark_boundary_event_exactly_at_watermark_is_kept(spark, tmp_path):
    """Boundary exactness pin: after the watermark advances to W, a late
    event with ts == W lands in a window whose END is > W, so the
    window is NOT yet finalized and the event is KEPT; an event one
    window earlier (window end == W) is dropped. This is the precise
    cut users reason about when sizing lateness allowances."""
    t = lambda h, m: datetime(2024, 3, 1, h, m)  # noqa: E731
    src = tmp_path / "wmb_src"
    src.mkdir()

    def write_batch(rows, mode):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            mode
        ).parquet(str(src))

    # batch 1: 12:30 sets max event time; watermark -> 12:20
    write_batch([(1, t(12, 30), 1, "view", 1.0)], "overwrite")
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))
    agg = windowed_counts(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wmb_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wmb_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: ts == watermark (12:20) -> window [12:20, 12:25) is
        # still open -> KEPT; ts 12:19 -> window [12:15, 12:20) whose
        # end == watermark -> finalized -> DROPPED
        write_batch(
            [
                (2, t(12, 20), 1, "click", 1.0),
                (3, t(12, 19), 1, "click", 1.0),
            ],
            "append",
        )
        q.processAllAvailable()
        # batch 3: advance watermark far past everything to flush
        write_batch([(4, t(13, 30), 1, "view", 1.0)], "append")
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        (r["window_start"].hour, r["window_start"].minute, r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM wmb_out").collect()
    }
    assert out.get((12, 20, "click")) == 1  # exactly-at-watermark kept
    assert (12, 15, "click") not in out  # window end == watermark: dropped
    assert out.get((12, 30, "view")) == 1


def test_semdedup_stream_equals_batch_twin(spark, tmp_path):
    """The streaming semantic dedup (streaming/semdedup.py) must emit
    EXACTLY the verdicts of the registered batch twin
    (`semdedup_rounds`, whose oracle proves the from-scratch merge law)
    when fed the same vectors in the same micro-batch order: centroids
    train once on the first batch and freeze (the ensure_centroids rule
    matches the twin's batch-0 modular sample because the test ids are
    dense, so `vec_id % 2 == 0` IS the first spool file), the arrival
    store accumulates across separate stream RUNS (persistent state,
    not a watermark), and a later batch's duplicate of an earlier
    arrival is pruned with the earlier id as keeper."""
    import json as _json

    from transit_feed_etl_spark.operators import vectors as V
    from transit_feed_etl_spark.queries.similarity import semdedup_rounds
    from transit_feed_etl_spark.streaming.semdedup import start_semdedup_stream

    # 12 deterministic 64-d vectors (kmeans_train pins the embeddings
    # table's EMB_DIM=64 contract) in two clear clusters + mild noise;
    # even ids = batch 0 (the training snapshot), odd ids = batch 1.
    def vec(i: int) -> list[float]:
        base = [1.0, 0.0, 0.2, 0.0] if i % 3 else [0.0, 1.0, 0.0, 0.2]
        return [
            round(base[d % 4] + 0.01 * ((i + d) % 5), 6) for d in range(64)
        ]

    rows = [(i, vec(i)) for i in range(12)]
    spool = tmp_path / "spool"
    spool.mkdir()
    out = str(tmp_path / "verdicts")
    store = str(tmp_path / "store")
    cent = str(tmp_path / "centroids")
    ckpt = str(tmp_path / "ckpt")

    def spool_file(name, batch_rows):
        (spool / name).write_text(
            "\n".join(
                _json.dumps({"vec_id": i, "embedding": v})
                for i, v in batch_rows
            )
            + "\n"
        )

    # run 1: batch 0 (even ids) — trains + freezes the centroids
    spool_file("b0.json", [r for r in rows if r[0] % 2 == 0])
    q = start_semdedup_stream(spark, str(spool), out, store, cent, ckpt,
                              n_cells=4)
    q.awaitTermination(120)
    # run 2 (separate stream run, same stores): batch 1 (odd ids)
    spool_file("b1.json", [r for r in rows if r[0] % 2 == 1])
    q = start_semdedup_stream(spark, str(spool), out, store, cent, ckpt,
                              n_cells=4)
    q.awaitTermination(120)

    got = {
        (r["vec_id"], r["cell"], r["keeper_id"], r["max_cos6"])
        for r in spark.read.parquet(out).collect()
    }

    v = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).select("vec_id", V.as_double("embedding").alias("v"))
    want_df = semdedup_rounds(v, n_cells=4, k_batches=2)
    want = {
        (r["vec_id"], r["cell"], r["keeper_id"], r["max_cos6"])
        for r in want_df.collect()
    }
    assert got == want and got, (sorted(got), sorted(want))
    # the arrival store holds every arrival (soft precedence state),
    # not just survivors
    assert spark.read.parquet(store).count() == 12


def test_semdedup_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once (ADVICE r11): re-running a batch
    whose store write already landed must produce EXACTLY the original
    verdicts — the store read excludes the current batch_id's subpath,
    so the retried batch never pairs with its own failed-attempt copy
    (which would prune every vector against itself at cos 1.0) — and
    the per-batch overwrite leaves the store row count unchanged."""
    from transit_feed_etl_spark.operators import vectors as V
    from transit_feed_etl_spark.streaming.semdedup import (
        semdedup_batch_against_store,
    )

    def vec(i: int) -> list[float]:
        base = [1.0, 0.0, 0.2, 0.0] if i % 3 else [0.0, 1.0, 0.0, 0.2]
        return [
            round(base[d % 4] + 0.01 * ((i + d) % 5), 6) for d in range(64)
        ]

    store = str(tmp_path / "store")
    cent = str(tmp_path / "centroids")
    b0 = spark.createDataFrame(
        [(i, vec(i)) for i in range(0, 12, 2)],
        "vec_id long, embedding array<double>",
    ).select("vec_id", V.as_double("embedding").alias("v"))
    v0 = semdedup_batch_against_store(b0, store, cent, n_cells=4, batch_id=0)
    first = {tuple(r) for r in v0.collect()}
    n_store = spark.read.parquet(store).count()
    assert n_store == 6
    # retry of batch 0: store already holds its rows under batch_id=0
    v0r = semdedup_batch_against_store(b0, store, cent, n_cells=4, batch_id=0)
    retried = {tuple(r) for r in v0r.collect()}
    assert retried == first
    # no vector may be "pruned by itself" on the retry
    assert all(r[0] != r[2] for r in retried)
    assert spark.read.parquet(store).count() == n_store


def test_corpus_dedup_batch_retry_is_idempotent(spark, tmp_path):
    """Retry of a corpus-dedup batch whose digest write landed must
    re-emit the SAME fresh rows (a plain append store would anti-join
    the batch against its own digests and silently emit zero rows) and
    leave the digest store unchanged."""
    from transit_feed_etl_spark.streaming.corpus_dedup import (
        dedup_batch_against_store,
    )

    store = str(tmp_path / "store")
    b0 = spark.createDataFrame(
        [(1, "alpha"), (3, "same-content"), (5, "same-content")],
        "doc_id long, text string",
    )
    fresh = dedup_batch_against_store(b0, store, batch_id=0)
    first = {(r["doc_id"], r["text"]) for r in fresh.collect()}
    assert first == {(1, "alpha"), (3, "same-content")}
    fresh_retry = dedup_batch_against_store(b0, store, batch_id=0)
    assert {(r["doc_id"], r["text"]) for r in fresh_retry.collect()} == first
    assert spark.read.parquet(store).count() == 2
    # and a genuinely NEW batch still dedups against history
    b1 = spark.createDataFrame(
        [(9, "alpha"), (11, "brand-new")], "doc_id long, text string"
    )
    fresh1 = dedup_batch_against_store(b1, store, batch_id=1)
    assert {(r["doc_id"], r["text"]) for r in fresh1.collect()} == {
        (11, "brand-new")
    }
