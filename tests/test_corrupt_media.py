"""Corrupt-media robustness sweep: at 100 TB a single truncated or
bit-flipped payload MUST quarantine as one bad item, never kill the
mapInPandas task (and with it the job). Found and fixed when first
written:

- `probe_media` raised raw ``struct.error`` (not the documented
  ValueError) on payloads that MATCH a container magic but truncate
  before the parsed fields — a 20-byte PNG (signature + 'IHDR' tag but
  no dimensions) and a 20-byte RIFF/WAVE (no byte_rate field) both
  escaped `decode_media`'s ValueError isolation and would have killed
  the whole decode stage;
- `audio_window_features` crashed on NULL payloads (TypeError), on
  payloads shorter than the 44-byte WAV header, and on odd-length PCM
  bodies (numpy frombuffer ValueError) — now quarantine-by-omission,
  the same stance `resize_images`/`sample_frames` already took;
- `decode_png` walked chunk lengths without bounds-checking (a
  declared length past the buffer end -> struct.error on the CRC read)
  and let ``zlib.error`` escape on corrupt IDAT streams;
- `decode_bmp` / `iter_video_frames` read struct fields of truncated
  headers/frame tables -> struct.error.

The pinned contract: every decoder raises ValueError — ONE failure
type — for ANY malformed input, so per-item isolation needs exactly one
except clause; `decode_media` turns that into a NULL-format row with
byte-accurate n_bytes/sha (the quarantine row is still auditable), and
the job always completes.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from transit_feed_etl_spark.operators.multimodal import (
    audio_window_features,
    decode_bmp,
    decode_media,
    decode_png,
    iter_video_frames,
    pack_bmp,
    pack_fake_payload,
    pack_png,
    pack_video,
    pack_wav,
    probe_media,
)

# every corrupt class this sweep pins; all must raise ValueError (never
# struct.error / zlib.error / TypeError) from the strict decoders
CORRUPT_PAYLOADS = {
    "empty": b"",
    "short_garbage": b"\x00\x01",
    "long_garbage": bytes(range(256)) * 4,
    # PNG signature + IHDR tag, truncated before the dimensions
    "png_truncated_ihdr": b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR",
    # valid PNG prefix, chunk declares a length past the buffer end
    "png_oversized_chunk": b"\x89PNG\r\n\x1a\n"
    + struct.pack(">I", 10_000)
    + b"IHDRxxxx",
    # structurally valid chunks but corrupt deflate bytes in IDAT
    "png_corrupt_idat": None,  # built below (needs real CRCs)
    # bit-flipped CRC on a real PNG
    "png_bad_crc": None,  # built below
    # RIFF/WAVE magic, truncated before the fmt byte_rate field
    "wav_truncated_fmt": b"RIFF\x10\x00\x00\x00WAVEfmt ",
    # RIFF/WAVE with a chunk walk that never finds 'data'
    "wav_no_data_chunk": b"RIFF"
    + struct.pack("<I", 36)
    + b"WAVE"
    + b"fmt "
    + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    + b"junk"
    + struct.pack("<I", 4)
    + b"xxxx",
    # BMP magic, truncated header
    "bmp_truncated": b"BM\x36\x00\x00\x00",
    # VID0 magic, frame table truncated
    "vid_truncated_table": b"VID0" + struct.pack("<I", 3) + b"\x01\x00",
    # VID0 frame body shorter than its declared length
    "vid_truncated_body": b"VID0"
    + struct.pack("<I", 1)
    + struct.pack("<I", 1000)
    + b"tiny",
}


def _built_corrupt() -> dict[str, bytes]:
    d = dict(CORRUPT_PAYLOADS)
    good = bytearray(pack_png(1, 4, 3))
    # flip a byte INSIDE the IDAT data (after sig+IHDR chunk: 8+25=33,
    # then IDAT header 8 bytes) so the CRC check trips
    bad_crc = bytearray(good)
    bad_crc[45] ^= 0xFF
    d["png_bad_crc"] = bytes(bad_crc)
    # rebuild a PNG whose IDAT has a VALID crc over INVALID deflate bytes
    from transit_feed_etl_spark.operators.multimodal import _png_chunk

    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0)
    d["png_corrupt_idat"] = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", b"\x00not-deflate\xff")
        + _png_chunk(b"IEND", b"")
    )
    return d


def test_strict_decoders_raise_only_valueerror():
    """The single-failure-type contract: ValueError for every corrupt
    class, never struct.error / zlib.error / TypeError."""
    for name, payload in _built_corrupt().items():
        for dec in (probe_media, decode_png, decode_bmp):
            try:
                dec(payload)
            except ValueError:
                pass
            except Exception as e:  # noqa: BLE001
                raise AssertionError(
                    f"{dec.__name__} on {name}: raised {type(e).__name__}: {e}"
                ) from e
        try:
            list(iter_video_frames(payload))
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"iter_video_frames on {name}: {type(e).__name__}: {e}"
            ) from e
    # None payloads too (a NULL binary cell)
    for dec in (probe_media, decode_png, decode_bmp):
        with pytest.raises(ValueError):
            dec(None)
    with pytest.raises(ValueError):
        list(iter_video_frames(None))


def test_decode_media_quarantines_corrupt_rows(spark):
    """The full Arrow-batched decode stage over a mixed good/corrupt
    frame: the job completes, good rows decode, corrupt rows surface as
    NULL-format rows with byte-accurate n_bytes (auditable quarantine,
    not silent loss)."""
    corrupt = _built_corrupt()
    rows = [(0, bytearray(pack_png(7, 5, 4))), (1, bytearray(pack_wav(3, 256)))]
    rows += [(2, bytearray(pack_fake_payload(0, 9, 9, b"body")))]
    rows += [(3, None)]
    names = sorted(corrupt)
    rows += [(10 + i, bytearray(corrupt[n])) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_media(df).collect()}
    assert set(out) == {r[0] for r in rows}  # every item produced a row
    assert out[0]["format"] == "png" and out[0]["width"] == 5
    assert out[1]["format"] == "wav" and out[1]["duration_ms"] is not None
    assert out[2]["format"] == "png" and out[2]["width"] == 9  # fake header
    assert out[3]["format"] is None and out[3]["n_bytes"] == 0
    # two corruption tiers: HEADER-corrupt rows quarantine to a NULL
    # format; BODY-corrupt rows (valid IHDR, corrupt pixel stream) are
    # correctly reported by the metadata probe — their rejection is the
    # PIXEL decoder's job (test_strict_decoders_raise_only_valueerror)
    body_corrupt = {"png_bad_crc", "png_corrupt_idat"}
    for i, n in enumerate(names):
        r = out[10 + i]
        if n in body_corrupt:
            assert r["format"] == "png", (n, r)
        else:
            assert r["format"] is None, (n, r)
        assert r["n_bytes"] == len(corrupt[n]), n
        assert r["content_sha"] is not None, n


def test_audio_features_skip_corrupt_payloads(spark):
    """Windowed DSP over a frame mixing real PCM with NULL / truncated /
    odd-length payloads: completes, emits windows ONLY for decodable
    rows, zero for quarantined ones."""
    rows = [
        (0, bytearray(pack_wav(5, 256))),   # 4 windows of 64
        (1, None),                          # NULL cell
        (2, bytearray(b"RIFFxxxxWAVE")),    # shorter than the 44-byte header
        (3, bytearray(pack_wav(9, 128)[:-1])),  # odd-length PCM body
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = audio_window_features(df).collect()
    by_id: dict[int, int] = {}
    for r in out:
        by_id[r["media_id"]] = by_id.get(r["media_id"], 0) + 1
    assert by_id.get(0) == 4
    assert 1 not in by_id and 2 not in by_id
    # the odd-length body still yields its full windows (the stray
    # trailing byte is dropped, not the item)
    assert by_id.get(3) == 1
