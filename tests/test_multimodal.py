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


def test_probe_media_real_formats():
    """Hand-built headers of each real container format decode to the
    right metadata (public layouts; no codec libs involved)."""
    import struct

    from transit_feed_etl_spark.operators.multimodal import probe_media

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00")
    assert probe_media(png) == ("png", 640, 480, None)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert probe_media(gif) == ("gif", 320, 200, None)

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600) + b"\x00" * 4
    assert probe_media(bmp) == ("bmp", 800, 600, None)  # top-down rows

    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 1080, 1920) + b"\x03")
    assert probe_media(jpeg) == ("jpeg", 1920, 1080, None)

    byte_rate = 44100 * 2 * 2
    wav = (b"RIFF" + struct.pack("<I", 36 + byte_rate) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 2, 44100, byte_rate, 4, 16)
           + b"data" + struct.pack("<I", byte_rate))  # exactly 1 s of audio
    assert probe_media(wav) == ("wav", None, None, 1000)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        probe_media(b"\x00" * 64)
    with _pytest.raises(ValueError):
        probe_media(b"\xff\xd8\xff\xe0\x00\x04\x00\x00")  # jpeg, no SOF
    # seg_len < 2 is invalid per spec (the length field includes its
    # own 2 bytes); the walk must bail with ValueError instead of
    # creeping 2 bytes/iteration across the payload (ADVICE r8) —
    # asserted on a dense-0xFF garbage body where the old walk did
    # tens of thousands of iterations before falling off the end
    with _pytest.raises(ValueError):
        probe_media(b"\xff\xd8" + b"\xff\xe1\x00\x00" + b"\xff" * 65536)


def test_pack_wav_is_byte_level_valid_container():
    """The packed WAV parses through the REAL RIFF prober: format, and
    duration derived from byte_rate and the data-chunk size."""
    from transit_feed_etl_spark.operators.multimodal import pack_wav, probe_media

    payload = pack_wav(media_id=7, n_samples=256, sample_rate=8000)
    fmt, w, h, dur = probe_media(payload)
    assert fmt == "wav" and w is None and h is None
    assert dur == int(256 * 2 * 1000 / (8000 * 2))  # 64 ms of audio
    assert len(payload) == 44 + 256 * 2


def test_png_roundtrip_all_filters():
    """pack_png cycles the five PNG row filters; decode_png must invert
    every one of them bit-exactly, including 1-pixel-wide edge cases."""
    import numpy as np

    from transit_feed_etl_spark.operators.multimodal import (
        _bmp_pixels,
        decode_png,
        pack_png,
        probe_media,
    )

    for mid, w, h in [(0, 8, 7), (5, 16, 10), (42, 1, 6), (7, 9, 1)]:
        png = pack_png(mid, w, h)
        kind, pw, ph, _ = probe_media(png)
        assert (kind, pw, ph) == ("png", w, h)
        assert np.array_equal(decode_png(png), _bmp_pixels(mid, w, h))


def test_png_crc_verification_rejects_corruption():
    import pytest

    from transit_feed_etl_spark.operators.multimodal import decode_png, pack_png

    bad = bytearray(pack_png(1, 8, 8))
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
