"""Multimodal column operators (EXT, north star): image/audio/video as
opaque BinaryType payloads + typed metadata structs, processed with
Arrow-batched mapInPandas.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. The codec step itself is STUBBED: the
runtime image has no image/audio libraries, so `decode_image` uses a
clearly-marked deterministic fake header parser (and raises
NotImplementedError for payloads it cannot fake-decode). Swapping in a
real codec (PIL / libvips / ffmpeg) changes only the function body, not
the distributed plan.

Scale notes:
- payloads stay in BinaryType columns end-to-end: parquet stores them
  natively, Arrow moves them to Python in zero-copy batches.
- mapInPandas streams an iterator of batches — constant memory per task
  regardless of partition size; batch size governed by
  spark.sql.execution.arrow.maxRecordsPerBatch.
- repartition before heavy decode so work spreads over all executors
  even when input files are few/large.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

# Fake 16-byte header: magic(4s) kind(B) width(I) height(I) — used by the
# deterministic stub codec below and by tests to fabricate payloads.
_FAKE_MAGIC = b"FAKE"
_FAKE_HDR = ">4sBII"


def pack_fake_payload(kind_code: int, width: int, height: int, body: bytes) -> bytes:
    """Test helper: fabricate a payload the stub codec can 'decode'."""
    return struct.pack(_FAKE_HDR, _FAKE_MAGIC, kind_code, width, height) + body


def probe_media(payload: bytes) -> tuple[str, int | None, int | None, int | None]:
    """REAL container-format metadata probe — pure struct parsing of the
    public PNG/GIF/BMP/JPEG/WAV layouts, no codec libraries:

    returns (format, width, height, duration_ms); raises ValueError for
    unrecognized OR malformed bytes — ValueError is the SINGLE failure
    type (tests/test_corrupt_media.py), so every mapInPandas consumer
    can quarantine bad items with one except clause instead of dying on
    a struct.error mid-task. Pixel/sample DECODING stays out of scope in
    this image (that part needs PIL/ffmpeg); header-level decode — the
    part a curation pipeline actually filters on (dimensions, duration)
    — is real.
    """
    try:
        return _probe_media_unsafe(payload)
    except struct.error as e:  # truncated container past a magic match
        raise ValueError(f"truncated container: {e}") from e


def _probe_media_unsafe(
    payload: bytes,
) -> tuple[str, int | None, int | None, int | None]:
    if payload is None or len(payload) < 12:
        raise ValueError("payload too short")
    # PNG: 8-byte signature, then IHDR chunk: len(4) 'IHDR' w(be32) h(be32)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", payload, 16)
        return "png", w, h, None
    # GIF87a/89a: width/height little-endian uint16 at offset 6
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", payload, 6)
        return "gif", w, h, None
    # BMP: 'BM', BITMAPINFOHEADER width/height int32 LE at 18/22
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack_from("<ii", payload, 18)
        return "bmp", w, abs(h), None  # negative h = top-down rows
    # JPEG: walk segments to the SOF0/SOF2 frame header
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(payload) and payload[i] == 0xFF:
            marker, seg_len = payload[i + 1], struct.unpack_from(">H", payload, i + 2)[0]
            if seg_len < 2:
                # the JPEG length field includes its own 2 bytes, so
                # <2 is invalid per spec; bail instead of creeping 2
                # bytes at a time across a garbage payload (ADVICE r8:
                # O(n) adversarial slowdown on dense-0xFF input)
                raise ValueError("jpeg segment with invalid length")
            if marker in (0xC0, 0xC2) and i + 9 <= len(payload):
                h, w = struct.unpack_from(">HH", payload, i + 5)
                return "jpeg", w, h, None
            i += 2 + seg_len
        raise ValueError("jpeg without SOF frame header")
    # WAV: RIFF container, fmt chunk byte_rate at 28, data chunk size
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        byte_rate = struct.unpack_from("<I", payload, 28)[0]
        i = 36
        while i + 8 <= len(payload):
            cid, csize = payload[i : i + 4], struct.unpack_from("<I", payload, i + 4)[0]
            if cid == b"data":
                dur = int(csize * 1000 / byte_rate) if byte_rate else None
                return "wav", None, None, dur
            i += 8 + csize
        raise ValueError("wav without data chunk")
    raise ValueError("unrecognized container format")


DECODED_SCHEMA = (
    "media_id long, format string, width int, height int, duration_ms int, "
    "n_bytes int, content_sha string"
)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode stage over mapInPandas. Metadata decode is REAL for
    PNG/GIF/BMP/JPEG/WAV (probe_media — pure struct over the public
    container layouts); the synthetic FAKE header keeps a deterministic
    oracle-checkable path; pixel/sample decode would slot into the same
    body via PIL/ffmpeg — the plan, schema and batch shape are final."""

    def _decode_one(payload: bytes) -> tuple[str, int | None, int | None, int | None]:
        try:
            return probe_media(payload)
        except ValueError:
            pass
        if payload is None or len(payload) < struct.calcsize(_FAKE_HDR):
            raise NotImplementedError("undecodable payload (no real codec in image)")
        magic, kind, w, h = struct.unpack_from(_FAKE_HDR, payload)
        if magic != _FAKE_MAGIC:
            raise NotImplementedError("undecodable payload (no real codec in image)")
        fmt = {0: "png", 1: "wav", 2: "mp4"}.get(kind, "bin")
        return fmt, w, h, None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [],
                "format": [],
                "width": [],
                "height": [],
                "duration_ms": [],
                "n_bytes": [],
                "content_sha": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    fmt, w, h, dur = _decode_one(payload)
                except NotImplementedError:
                    fmt, w, h, dur = None, None, None, None
                out["media_id"].append(mid)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(dur)
                out["n_bytes"].append(len(payload) if payload is not None else 0)
                out["content_sha"].append(
                    hashlib.sha256(payload).hexdigest() if payload is not None else None
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stage (STUB): re-packs the fake header with the target
    dimensions and truncates the body proportionally — deterministic, so
    tests can assert exact outputs. Real impl: PIL.Image.resize in the
    same mapInPandas body."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or payload[:4] != _FAKE_MAGIC:
                    continue  # quarantine-by-omission; real impl: side output
                _, kind, w, h = struct.unpack_from(_FAKE_HDR, payload)
                body = payload[struct.calcsize(_FAKE_HDR):]
                scale = (target_w * target_h) / max(w * h, 1)
                new_body = body[: max(int(len(body) * min(scale, 1.0)), 1)]
                rows["media_id"].append(mid)
                rows["width"].append(target_w)
                rows["height"].append(target_h)
                rows["payload"].append(
                    struct.pack(_FAKE_HDR, _FAKE_MAGIC, kind, target_w, target_h)
                    + new_body
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stage (STUB): emits up to `max_frames` fixed-stride
    slices of the body as 'frames' — a 1:N mapInPandas expansion with the
    same iterator/batch shape a real ffmpeg keyframe sampler would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hdr = struct.calcsize(_FAKE_HDR)
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or payload[:4] != _FAKE_MAGIC:
                    continue
                body = payload[hdr:]
                for i in range(min(max(len(body) // every_n_bytes, 1), max_frames)):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_payload"].append(
                        body[i * every_n_bytes : (i + 1) * every_n_bytes]
                    )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(batches, FRAMES_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-Catalyst metadata aggregation over binary columns — no decode
    needed: payload sizes, sha-dedup candidates, per-kind stats."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.countDistinct(F.sha2("payload", 256)).alias("n_distinct_payloads"),
        )
        .orderBy("kind")
    )


# ---- real PCM audio path: WAV pack + windowed DSP features --------------

WAV_HEADER_LEN = 44
AUDIO_WINDOW = 64  # samples per analysis window


def _pcm_samples(media_id: int, n: int) -> "np.ndarray":
    """Deterministic synthetic PCM16 signal: the closed-form generator a
    SQL oracle can recompute sample-by-sample, so the whole
    pack->Arrow->unpack->DSP pipeline is value-differential-checked
    without any audio library. All terms non-negative, so Python %,
    numpy %, Spark pmod-free SQL % agree."""
    import numpy as np

    i = np.arange(n, dtype=np.int64)
    return (((media_id * 31 + i * 17 + (i * i) % 97) % 4096) - 2048).astype(
        np.int16
    )


def pack_wav(media_id: int, n_samples: int, sample_rate: int = 8000) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + little-endian PCM16 data —
    byte-level real: probe_media() parses this container."""
    import numpy as np  # noqa: F401

    pcm = _pcm_samples(media_id, n_samples).tobytes()
    data_len = len(pcm)
    byte_rate = sample_rate * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + data_len)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", data_len)
    )
    assert len(hdr) == WAV_HEADER_LEN
    return hdr + pcm


AUDIO_FEATURES_SCHEMA = (
    "media_id long, window_id int, rms_e4 long, zero_crossings int, peak int"
)


def audio_window_features(df: DataFrame) -> DataFrame:
    """Windowed DSP over PCM bytes (REAL computation, no stub): unpack
    int16 samples with numpy.frombuffer, reshape into fixed 64-sample
    windows, and emit per-window RMS energy, zero-crossing count, and
    peak amplitude — the standard VAD/segmentation features an audio
    curation pipeline computes before any model sees the waveform.
    Arrow-batched mapInPandas; per-row cost is O(n_samples) vectorized
    numpy, zero shuffle. Integer sums are exact in float64 (<< 2^53),
    so RMS is bit-identical to the oracle's closed-form recomputation."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [],
                "window_id": [],
                "rms_e4": [],
                "zero_crossings": [],
                "peak": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # quarantine-by-omission (the resize/sample_frames
                # stance): a NULL / truncated / odd-length payload
                # yields zero windows instead of a task-killing
                # frombuffer error (tests/test_corrupt_media.py)
                if payload is None or len(payload) < WAV_HEADER_LEN + 2:
                    continue
                n_pcm_bytes = (len(payload) - WAV_HEADER_LEN) // 2 * 2
                pcm = np.frombuffer(
                    payload,
                    dtype="<i2",
                    offset=WAV_HEADER_LEN,
                    count=n_pcm_bytes // 2,
                )
                n_win = len(pcm) // AUDIO_WINDOW
                w = (
                    pcm[: n_win * AUDIO_WINDOW]
                    .astype(np.float64)
                    .reshape(n_win, AUDIO_WINDOW)
                )
                # FLOOR-scaled, not round: np.round is HALF_EVEN while SQL
                # ROUND is half-away — floor of the identical double is
                # tie-free (same trick as embedding_quantization)
                rms = np.floor(
                    np.sqrt((w * w).sum(axis=1) / AUDIO_WINDOW) * 1e4
                ).astype(np.int64)
                neg = w < 0
                zc = (neg[:, 1:] != neg[:, :-1]).sum(axis=1)
                peak = np.abs(w).max(axis=1).astype(np.int64)
                out["media_id"].extend([mid] * n_win)
                out["window_id"].extend(range(n_win))
                out["rms_e4"].extend(rms.tolist())
                out["zero_crossings"].extend(zc.astype(int).tolist())
                out["peak"].extend(peak.tolist())
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


# ---- real BMP image path: pack + pixel decode + nearest resize ----------

BMP_HEADER_LEN = 54


def _bmp_pixels(media_id: int, w: int, h: int) -> "np.ndarray":
    """Deterministic RGB image (h, w, 3), uint8 — closed-form so a SQL
    oracle recomputes any pixel: v = (id*7 + x*13 + y*29 + 3*c) % 256."""
    import numpy as np

    y, x, c = np.meshgrid(
        np.arange(h, dtype=np.int64),
        np.arange(w, dtype=np.int64),
        np.arange(3, dtype=np.int64),
        indexing="ij",
    )
    return ((media_id * 7 + x * 13 + y * 29 + 3 * c) % 256).astype(np.uint8)


def pack_bmp(media_id: int, w: int, h: int) -> bytes:
    """Byte-level-valid 24bpp BITMAPINFOHEADER BMP: BGR byte order,
    rows bottom-up, each row padded to 4 bytes — probe_media parses it."""
    import numpy as np

    rgb = _bmp_pixels(media_id, w, h)
    bgr = rgb[:, :, ::-1]  # file stores B,G,R
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    data = rows[::-1].tobytes()  # bottom-up row order
    file_size = BMP_HEADER_LEN + len(data)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, BMP_HEADER_LEN)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    )
    assert len(hdr) == BMP_HEADER_LEN
    return hdr + data


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Real pixel decode (numpy only): returns (h, w, 3) RGB top-down."""
    import numpy as np

    if payload is None or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(payload) < BMP_HEADER_LEN:
        raise ValueError("truncated BMP header")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise ValueError("only 24bpp supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


def resize_nearest(arr: "np.ndarray", factor: int) -> "np.ndarray":
    """Real nearest-neighbor downsample: keep every factor-th pixel
    (top-left anchored) — the resize stage without any imaging library."""
    return arr[::factor, ::factor]


# ---- video path: length-prefixed BMP frame container + frame sampling --

VIDEO_MAGIC = b"VID0"


def pack_video(media_id: int, n_frames: int, w: int, h: int) -> bytes:
    """Minimal video container (documented custom format): 'VID0' +
    u32le frame count, then each frame as u32le length + a REAL 24bpp
    BMP (frame f uses generator id media_id*1000 + f, so every frame's
    pixels are closed-form recomputable)."""
    frames = [pack_bmp(media_id * 1000 + f, w, h) for f in range(n_frames)]
    out = [VIDEO_MAGIC, struct.pack("<I", n_frames)]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


def iter_video_frames(payload: bytes):
    """Yield (frame_index, bmp_bytes) from the VID0 container."""
    if payload is None or len(payload) < 8 or payload[:4] != VIDEO_MAGIC:
        raise ValueError("not a VID0 container")
    (n,) = struct.unpack_from("<I", payload, 4)
    off = 8
    for f in range(n):
        if off + 4 > len(payload):
            raise ValueError("truncated VID0 frame table")
        (flen,) = struct.unpack_from("<I", payload, off)
        off += 4
        if off + flen > len(payload):
            raise ValueError("truncated VID0 frame body")
        yield f, payload[off : off + flen]
        off += flen


# ---- PNG path: REAL encoder/decoder over stdlib zlib (no codec libs) --


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def pack_png(media_id: int, w: int, h: int) -> bytes:
    """Spec-valid 8-bit RGB PNG (color type 2, non-interlaced) of the
    deterministic _bmp_pixels image — signature, IHDR, one IDAT (zlib
    deflate), IEND, all with real CRCs. Row filter types CYCLE through
    all five PNG filters (None/Sub/Up/Average/Paeth, type = row % 5), so
    decoding requires real unfiltering, not just inflate."""
    import zlib

    import numpy as np

    bpp = 3
    raw = _bmp_pixels(media_id, w, h).astype(np.int16).reshape(h, w * bpp)
    out = bytearray()
    zero = np.zeros(bpp, dtype=np.int16)
    prev = np.zeros(w * bpp, dtype=np.int16)
    for r in range(h):
        row = raw[r]
        left = np.concatenate([zero, row[:-bpp]]) if w > 1 else row * 0
        ul = np.concatenate([zero, prev[:-bpp]]) if w > 1 else prev * 0
        ft = r % 5
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (left + prev) // 2
        else:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = row - pred
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> "np.ndarray":
    """REAL PNG pixel decode using only stdlib zlib + numpy: chunk walk
    with CRC verification, inflate, and full five-filter unfiltering.
    Supports the 8-bit RGB non-interlaced profile; returns (h, w, 3)
    uint8 top-down RGB."""
    import zlib

    import numpy as np

    if payload is None or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    off, idat, w, h = 8, b"", None, None
    while off + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, off)
        if off + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        tag = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, off + 8 + ln)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype, inter) != (8, 2, 0):
                raise ValueError("unsupported PNG profile")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        off += 12 + ln
    if w is None:
        raise ValueError("PNG without IHDR")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:  # corrupt deflate stream -> the ONE failure type
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    bpp, stride = 3, w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    recon = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for r in range(h):
        ft = raw[pos]
        pos += 1
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int16
        )
        pos += stride
        prev = recon[r - 1].astype(np.int16) if r else np.zeros(stride, np.int16)
        if ft == 0:
            recon[r] = (row % 256).astype(np.uint8)
        elif ft == 2:
            recon[r] = ((row + prev) % 256).astype(np.uint8)
        else:
            cur = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                elif ft == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"unknown filter type {ft}")
                cur[i] = (row[i] + pred) % 256
            recon[r] = cur.astype(np.uint8)
    return recon.reshape(h, w, 3)
