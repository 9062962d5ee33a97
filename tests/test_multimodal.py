"""Multimodal plumbing tests: binary payload columns through
mapInPandas decode/resize/frame-sample stubs (schemas, batch shapes, and
1:N expansion are real; codec bodies are deterministic fakes)."""

from __future__ import annotations

import pytest

from transit_feed_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    media_stats,
    pack_fake_payload,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", pack_fake_payload(0, 640, 480, b"x" * 512), ("png", 640, 480, None)),
        (2, "image", pack_fake_payload(0, 100, 100, b"y" * 128), ("png", 100, 100, None)),
        (3, "video", pack_fake_payload(2, 1920, 1080, b"z" * 1024), ("mp4", 1920, 1080, 5000)),
        (4, "image", b"\x00\x01not-a-real-payload", (None, None, None, None)),
        (5, "audio", None, (None, None, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub(media):
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    assert out[1]["format"] == "png" and out[1]["width"] == 640
    assert out[3]["format"] == "mp4" and out[3]["height"] == 1080
    assert out[4]["format"] is None  # undecodable -> NULLs, row preserved
    assert out[5]["content_sha"] is None and out[5]["n_bytes"] == 0
    assert out[1]["content_sha"] != out[2]["content_sha"]


def test_resize_stub(media):
    out = {r["media_id"]: r for r in resize_images(media, 64, 64).collect()}
    assert set(out) == {1, 2, 3}  # non-fake and null payloads dropped
    assert out[1]["width"] == 64 and out[1]["height"] == 64
    # header rewritten with new dims
    import struct

    magic, kind, w, h = struct.unpack_from(">4sBII", bytes(out[3]["payload"]))
    assert (magic, w, h) == (b"FAKE", 64, 64)


def test_frame_sampling_expansion(media):
    frames = sample_frames(media, every_n_bytes=256, max_frames=3).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert by_id[1] == [0, 1]          # 512-byte body, 256 stride -> 2 frames
    assert by_id[3] == [0, 1, 2]       # 1024-byte body capped at max_frames=3
    assert 4 not in by_id and 5 not in by_id


def test_media_stats_catalyst_only(media):
    stats = {r["kind"]: r for r in media_stats(media).collect()}
    assert stats["image"]["n"] == 3
    assert stats["image"]["n_distinct_payloads"] == 3
    assert stats["video"]["total_bytes"] == 1024 + 13
    assert stats["audio"]["total_bytes"] is None
