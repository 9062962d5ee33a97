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


DECODED_SCHEMA = (
    "media_id long, format string, width int, height int, "
    "n_bytes int, content_sha string"
)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode stage over mapInPandas. STUB CODEC: parses the FAKE header
    deterministically; a real deployment replaces `_decode_one` with a
    PIL/ffmpeg call — the plan, schema and batch shape stay identical."""

    def _decode_one(payload: bytes) -> tuple[str, int, int]:
        if payload is None or len(payload) < struct.calcsize(_FAKE_HDR):
            raise NotImplementedError("real codec not available in this image")
        magic, kind, w, h = struct.unpack_from(_FAKE_HDR, payload)
        if magic != _FAKE_MAGIC:
            raise NotImplementedError("real codec not available in this image")
        fmt = {0: "png", 1: "wav", 2: "mp4"}.get(kind, "bin")
        return fmt, w, h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [],
                "format": [],
                "width": [],
                "height": [],
                "n_bytes": [],
                "content_sha": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    fmt, w, h = _decode_one(payload)
                except NotImplementedError:
                    fmt, w, h = None, None, None
                out["media_id"].append(mid)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
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
