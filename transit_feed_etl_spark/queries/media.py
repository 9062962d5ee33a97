"""Multimodal-column queries (EXT, north star): binary payload columns
with typed metadata, decoded via Arrow-batched mapInPandas
(operators/multimodal.py; stub codec — the container has no image/audio
libs, see that module's docstring).

`media_decode_stats` is a true differential test of the binary path:
Spark FABRICATES payloads in Catalyst (concat of binary literals +
unhex'd header fields + utf-8 text body), ships them through Arrow to
the Python stub decoder, and returns the parsed metadata; the DuckDB
oracle recomputes the same metadata directly from the construction
formulas. A mismatch anywhere in the binary plumbing (header packing,
Arrow binary transfer, struct unpack) breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table_par
from transit_feed_etl_spark.operators import multimodal as MM
from transit_feed_etl_spark.registry import register


def fabricate_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (media_id, kind, payload) with the stub codec's
    16-byte FAKE header, built entirely JVM-side:
    payload = 'FAKE' || byte(kind) || int32be(width) || int32be(height)
              || utf8(text)."""
    d = table_par(spark, sf_dir, "documents")
    kind_code = (F.col("doc_id") % 3).cast("int")
    width = (F.lit(16) + F.col("doc_id") % 64).cast("int")
    height = (F.lit(9) + F.col("doc_id") % 48).cast("int")

    def be(col: F.Column, n_hex: int) -> F.Column:
        return F.unhex(F.lpad(F.hex(col), n_hex, "0"))

    payload = F.concat(
        F.lit(b"FAKE"),
        be(kind_code, 2),
        be(width, 8),
        be(height, 8),
        F.encode("text", "UTF-8"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), kind_code + 1).alias("kind"),
        payload.alias("payload"),
    )


@register(
    "media_decode_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
                WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
           CAST(16 + doc_id % 64 AS INT) AS width,
           CAST(9 + doc_id % 48 AS INT) AS height,
           CAST(13 + OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes
    FROM documents
    ORDER BY media_id
    """,
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricate binary media payloads in Catalyst, decode them with the
    Arrow-batched stub codec (mapInPandas), return the parsed metadata.
    The oracle derives the expected values straight from the construction
    formulas — the whole binary round-trip must agree byte-for-byte."""
    media = fabricate_media(spark, sf_dir)
    return (
        MM.decode_media(media)
        .select("media_id", "format", "width", "height", "n_bytes")
        .orderBy("media_id")
    )


def _be(col: F.Column, n_hex: int) -> F.Column:
    return F.unhex(F.lpad(F.hex(col), n_hex, "0"))


def _le(col: F.Column, n_bytes: int) -> F.Column:
    """Little-endian n-byte encoding of an int column, built byte by
    byte JVM-side (no Python in the fabrication path)."""
    return F.concat(
        *[
            F.unhex(
                F.lpad(F.hex(F.shiftright(col, 8 * i).bitwiseAND(F.lit(255))), 2, "0")
            )
            for i in range(n_bytes)
        ]
    )


@register(
    "media_real_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
           CASE WHEN doc_id % 2 = 0 THEN CAST(32 + doc_id % 512 AS INT) END AS width,
           CASE WHEN doc_id % 2 = 0 THEN CAST(16 + doc_id % 256 AS INT) END AS height,
           CASE WHEN doc_id % 2 = 1 THEN
             CAST(FLOOR((1000 + (doc_id % 977) * 4) * 1000.0
                  / ((8000 + (doc_id % 8) * 1000) * (1 + doc_id % 2) * 2)) AS INT)
           END AS duration_ms
    FROM documents
    ORDER BY media_id
    """,
)
def media_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container-format round-trip: fabricate spec-conformant PNG
    and WAV byte streams entirely in Catalyst (binary literals + per-byte
    big/little-endian encodes), ship them through Arrow, and parse them
    with the real struct-level probe (operators/multimodal.py:
    probe_media) — NOT the FAKE stub header. The oracle recomputes
    dimensions/duration from the construction formulas, so the byte
    layouts, endianness handling, and the RIFF chunk walk are all
    differential-checked. Header decode — what curation filters on — is
    real here; PNG PIXEL decode is real too (see image_png_decode_stats,
    stdlib-zlib codec); JPEG pixels stay out of scope (needs a DCT codec)."""
    d = table_par(spark, sf_dir, "documents")
    did = F.col("doc_id")
    w = (F.lit(32) + did % 512).cast("int")
    h = (F.lit(16) + did % 256).cast("int")
    png = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n"),          # signature
        F.lit(b"\x00\x00\x00\x0dIHDR"),       # IHDR length + tag
        _be(w, 8),
        _be(h, 8),
        F.lit(b"\x08\x06\x00\x00\x00"),       # bit depth/color/interlace
    )
    sample_rate = (F.lit(8000) + (did % 8) * 1000).cast("int")
    channels = (F.lit(1) + did % 2).cast("int")
    byte_rate = (sample_rate * channels * 2).cast("int")
    data_size = (F.lit(1000) + (did % 977) * 4).cast("int")
    wav = F.concat(
        F.lit(b"RIFF"),
        _le(data_size + 36, 4),
        F.lit(b"WAVEfmt "),
        _le(F.lit(16), 4),                    # fmt chunk size
        _le(F.lit(1), 2),                     # PCM
        _le(channels, 2),
        _le(sample_rate, 4),
        _le(byte_rate, 4),
        _le(channels * 2, 2),                 # block align
        _le(F.lit(16), 2),                    # bits per sample
        F.lit(b"data"),
        _le(data_size, 4),
    )
    media = d.select(
        did.alias("media_id"),
        F.when(did % 2 == 0, png).otherwise(wav).alias("payload"),
    )
    return (
        MM.decode_media(media)
        .select("media_id", "format", "width", "height", "duration_ms")
        .orderBy("media_id")
    )


@register(
    "media_kind_stats",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           COUNT(*) AS n,
           CAST(SUM(13 + OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT (doc_id % 64) || ':' || (doc_id % 48) || ':' || text)
             AS n_distinct_payloads
    FROM documents
    GROUP BY 1
    ORDER BY kind
    """,
)
def media_kind_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Catalyst aggregation over binary payload columns — no decode:
    per-kind counts, total bytes, sha-distinct payload counts (the exact
    dedup pattern applied to media). A payload is distinct iff its
    (width, height, text) tuple is — which the oracle checks
    relationally."""
    return MM.media_stats(fabricate_media(spark, sf_dir))


@register(
    "audio_energy_features",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 100),
    w AS (
      SELECT doc_id, unnest(range(0, 3 + CAST(doc_id % 3 AS INT))) AS win FROM d
    ),
    s AS (SELECT doc_id, win, unnest(range(0, 64)) AS j FROM w),
    v AS (
      SELECT doc_id, win, j,
             ((doc_id * 31 + (win * 64 + j) * 17
               + ((win * 64 + j) * (win * 64 + j)) % 97) % 4096) - 2048 AS x
      FROM s
    ),
    lagd AS (
      SELECT doc_id, win, j, x,
             LAG(x) OVER (PARTITION BY doc_id, win ORDER BY j) AS px
      FROM v
    )
    SELECT doc_id AS media_id, CAST(win AS INT) AS window_id,
           CAST(FLOOR(SQRT(SUM(CAST(x AS DOUBLE) * x) / 64) * 1e4) AS BIGINT)
             AS rms_e4,
           CAST(SUM(CASE WHEN px IS NOT NULL AND ((x < 0) <> (px < 0))
                    THEN 1 ELSE 0 END) AS INT) AS zero_crossings,
           CAST(MAX(ABS(x)) AS INT) AS peak
    FROM lagd
    GROUP BY doc_id, win
    ORDER BY media_id, window_id
    """,
)
def audio_energy_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio DSP over binary columns: deterministic PCM16 signals
    packed into byte-level-valid RIFF/WAVE containers (probe_media parses
    them), shipped through Arrow, unpacked with numpy.frombuffer, and
    reduced to per-64-sample-window RMS / zero-crossings / peak — the
    VAD-style segmentation features audio curation computes. The oracle
    recomputes every sample from the closed-form generator: any defect in
    header packing, byte order, Arrow binary transfer, or the windowed
    math breaks the hash. No stub anywhere in this path."""
    from transit_feed_etl_spark.operators.multimodal import (
        AUDIO_WINDOW,
        pack_wav,
        audio_window_features,
    )
    import pandas as pd

    d = table_par(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)

    def pack_batches(it):
        for pdf in it:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        pack_wav(mid, AUDIO_WINDOW * (3 + mid % 3)) for mid in ids
                    ],
                }
            )

    wavs = d.select("doc_id").mapInPandas(pack_batches, "media_id long, payload binary")
    return audio_window_features(wavs).orderBy("media_id", "window_id")


@register(
    "image_resize_stats",
    oracle="""
    WITH d AS (
      SELECT doc_id, 8 + CAST(doc_id % 9 AS INT) AS w, 4 + CAST(doc_id % 7 AS INT) AS h
      FROM documents WHERE doc_id < 100
    ),
    xs AS (SELECT doc_id, w, h, unnest(range(0, w, 2)) AS x FROM d),
    pix AS (SELECT doc_id, w, h, x, unnest(range(0, h, 2)) AS y FROM xs),
    ch AS (
      SELECT doc_id, w, h,
             SUM((doc_id * 7 + x * 13 + y * 29 + 0) % 256) AS sr,
             SUM((doc_id * 7 + x * 13 + y * 29 + 3) % 256) AS sg,
             SUM((doc_id * 7 + x * 13 + y * 29 + 6) % 256) AS sb,
             COUNT(*) AS n
      FROM pix GROUP BY doc_id, w, h
    )
    SELECT doc_id AS media_id,
           CAST(w AS INT) AS orig_w, CAST(h AS INT) AS orig_h,
           CAST((w + 1) // 2 AS INT) AS new_w, CAST((h + 1) // 2 AS INT) AS new_h,
           CAST(FLOOR(CAST(sr AS DOUBLE) / n * 1e4) AS BIGINT) AS mean_r_e4,
           CAST(FLOOR(CAST(sg AS DOUBLE) / n * 1e4) AS BIGINT) AS mean_g_e4,
           CAST(FLOOR(CAST(sb AS DOUBLE) / n * 1e4) AS BIGINT) AS mean_b_e4
    FROM ch
    ORDER BY media_id
    """,
)
def image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image path end-to-end, no imaging library: deterministic RGB
    images packed as byte-level-valid 24bpp BMPs (bottom-up rows, BGR,
    4-byte stride padding), pixel-DECODED with numpy, nearest-neighbor
    RESIZED by 2, and reduced to per-channel means. The oracle recomputes
    every sampled pixel from the closed-form generator — a wrong stride,
    row order, channel order, or sampling anchor breaks the hash. This
    closes the decode/resize stub gap for BMP the way the WAV path does
    for audio; PNG pixels are covered by `image_png_decode_stats`
    (stdlib-zlib codec); JPEG stays header-only (codec needs PIL)."""
    from transit_feed_etl_spark.operators.multimodal import (
        decode_bmp,
        pack_bmp,
        resize_nearest,
    )
    import numpy as np
    import pandas as pd

    d = table_par(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)

    def batches(it):
        for pdf in it:
            out = {k: [] for k in (
                "media_id", "orig_w", "orig_h", "new_w", "new_h",
                "mean_r_e4", "mean_g_e4", "mean_b_e4",
            )}
            for mid in pdf["doc_id"]:
                w, h = 8 + mid % 9, 4 + mid % 7
                arr = decode_bmp(pack_bmp(mid, w, h))
                small = resize_nearest(arr, 2)
                means = small.astype(np.float64).mean(axis=(0, 1))
                out["media_id"].append(mid)
                out["orig_w"].append(w)
                out["orig_h"].append(h)
                out["new_h"].append(small.shape[0])
                out["new_w"].append(small.shape[1])
                for k, v in zip(("mean_r_e4", "mean_g_e4", "mean_b_e4"), means):
                    out[k].append(int(np.floor(v * 1e4)))
            yield pd.DataFrame(out)

    schema = (
        "media_id long, orig_w int, orig_h int, new_w int, new_h int, "
        "mean_r_e4 long, mean_g_e4 long, mean_b_e4 long"
    )
    return d.select("doc_id").mapInPandas(batches, schema).orderBy("media_id")


@register(
    "video_frame_sample_stats",
    oracle="""
    WITH d AS (
      SELECT doc_id, 4 + CAST(doc_id % 5 AS INT) AS nf FROM documents
      WHERE doc_id < 60
    ),
    fr AS (SELECT doc_id, nf, unnest(range(0, nf, 2)) AS f FROM d),
    xs AS (SELECT doc_id, f, unnest(range(0, 8)) AS x FROM fr),
    pix AS (SELECT doc_id, f, x, unnest(range(0, 4)) AS y FROM xs),
    lum AS (
      SELECT doc_id, f,
             SUM(((doc_id * 1000 + f) * 7 + x * 13 + y * 29 + 0) % 256
                 + ((doc_id * 1000 + f) * 7 + x * 13 + y * 29 + 3) % 256
                 + ((doc_id * 1000 + f) * 7 + x * 13 + y * 29 + 6) % 256) AS s,
             COUNT(*) AS n
      FROM pix GROUP BY doc_id, f
    )
    SELECT doc_id AS media_id, CAST(f AS INT) AS frame_id,
           CAST(FLOOR(CAST(s AS DOUBLE) / (3 * n) * 1e4) AS BIGINT) AS mean_luma_e4
    FROM lum
    ORDER BY media_id, frame_id
    """,
)
def video_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a video container, REAL end-to-end: VID0
    (documented custom framing: magic + u32 count + length-prefixed
    frames) holds real 8x4 24bpp BMPs; every 2nd frame is sampled,
    pixel-decoded with numpy, and reduced to mean luma (channel mean).
    Per-pixel closed-form oracle — wrong frame offsets, stride, or
    sampling cadence breaks the hash. Sampling-before-decoding is the
    100 TB point: only sampled frames pay decode cost, and the container
    scan is sequential byte slicing, not a codec seek."""
    from transit_feed_etl_spark.operators.multimodal import (
        decode_bmp,
        iter_video_frames,
        pack_video,
    )
    import numpy as np
    import pandas as pd

    d = table_par(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)

    def batches(it):
        for pdf in it:
            out = {"media_id": [], "frame_id": [], "mean_luma_e4": []}
            for mid in pdf["doc_id"]:
                payload = pack_video(mid, 4 + mid % 5, 8, 4)
                for f, bmp in iter_video_frames(payload):
                    if f % 2 != 0:
                        continue  # sample every 2nd frame; skip decode cost
                    arr = decode_bmp(bmp).astype(np.float64)
                    out["media_id"].append(mid)
                    out["frame_id"].append(f)
                    out["mean_luma_e4"].append(int(np.floor(arr.mean() * 1e4)))
            yield pd.DataFrame(out)

    schema = "media_id long, frame_id int, mean_luma_e4 long"
    return d.select("doc_id").mapInPandas(batches, schema).orderBy(
        "media_id", "frame_id"
    )


@register(
    "image_avg_hash_neardup",
    oracle="""
    WITH d AS (
      SELECT doc_id, CAST(doc_id % 48 AS BIGINT) AS img
      FROM documents WHERE doc_id < 200
    ),
    imgs AS (SELECT DISTINCT img FROM d),
    px AS (
      SELECT img, xs, ys,
             ( (img*7 + (2*xs)*13 + (2*ys)*29 + 0) % 256
             + (img*7 + (2*xs)*13 + (2*ys)*29 + 3) % 256
             + (img*7 + (2*xs)*13 + (2*ys)*29 + 6) % 256) AS lum
      FROM imgs,
           (SELECT unnest(range(0,8)) AS xs),
           (SELECT unnest(range(0,4)) AS ys)
    ),
    tot AS (SELECT img, SUM(lum) AS total FROM px GROUP BY img),
    h AS (
      SELECT px.img,
             CAST(SUM(CASE WHEN 32*lum > total
                      THEN CAST(1 AS BIGINT) << CAST(ys*8 + xs AS INT)
                      ELSE 0 END) AS BIGINT)
               AS ahash
      FROM px JOIN tot ON px.img = tot.img
      GROUP BY px.img
    ),
    dh AS (SELECT doc_id, ahash FROM d JOIN h ON d.img = h.img)
    SELECT a.doc_id AS media_a, b.doc_id AS media_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
    FROM dh a JOIN dh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ahash, b.ahash)) <= 2
    ORDER BY media_a, media_b
    """,
)
def image_avg_hash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup: 32-bit AVERAGE HASH over the REAL BMP
    pixel path (pack -> byte decode -> nearest-neighbor 2x downsample ->
    integer luma threshold against the image mean), then Hamming <= 2
    pairing via 8x4-bit PIGEONHOLE BANDING — at most 4 corrupted bands
    at distance <= 7 leaves >= 1 intact band, so banding loses nothing
    at the <= 2 threshold (recall 1.0 by construction, same argument as
    simhash_portable_pairs). Scale plan: candidates come from the band
    equi-join (bucket-bounded, never all-pairs); the hash rides the
    banding rows so verification needs no re-join. The oracle recomputes
    every pixel, the threshold, the bit packing, AND the pair set from
    the closed-form generator — a wrong stride, row order, resample
    anchor, or band split breaks the value hash. Integer math end to
    end: brightness-shifted images (nearby ids) genuinely land within
    small Hamming distance (avg-hash is shift-invariant modulo wrap),
    duplicates (same doc_id % 48) at distance 0."""
    import numpy as np
    import pandas as pd

    from transit_feed_etl_spark.operators.multimodal import (
        decode_bmp,
        pack_bmp,
        resize_nearest,
    )

    d = table_par(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def hash_batches(it):
        for pdf in it:
            ids, hashes = [], []
            for did in pdf["doc_id"]:
                arr = decode_bmp(pack_bmp(did % 48, 16, 8))
                small = resize_nearest(arr, 2)  # 4 x 8 x 3, RGB top-down
                lum = small.astype(np.int64).sum(axis=2)  # integer luma
                bits = (32 * lum > lum.sum()).astype(np.int64)
                idx = np.arange(4)[:, None] * 8 + np.arange(8)[None, :]
                ids.append(did)
                hashes.append(int((bits << idx).sum()))
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes})

    hashes = d.select("doc_id").mapInPandas(hash_batches, "doc_id long, ahash long")
    bands = hashes.select(
        "doc_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("ahash", 4 * i).bitwiseAND(F.lit(15)).alias("val"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "ahash", "bv.band", "bv.val")
    a = bands.select(
        F.col("doc_id").alias("media_a"),
        F.col("ahash").alias("hash_a"),
        "band",
        "val",
    )
    b = bands.select(
        F.col("doc_id").alias("media_b"),
        F.col("ahash").alias("hash_b"),
        "band",
        "val",
    )
    ham = F.bit_count(
        F.col("hash_a").bitwiseXOR(F.col("hash_b"))
    ).cast("int")
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "hash_a", "hash_b")
        .distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= 2)
        .select("media_a", "media_b", "hamming")
        .orderBy("media_a", "media_b")
    )


@register(
    "image_png_decode_stats",
    oracle="""
    WITH d AS (
      SELECT doc_id, 8 + CAST(doc_id % 9 AS INT) AS w, 4 + CAST(doc_id % 7 AS INT) AS h
      FROM documents WHERE doc_id < 100
    ),
    xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
    pix AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
    ch AS (
      SELECT doc_id, w, h,
             SUM((doc_id * 7 + x * 13 + y * 29 + 0) % 256) AS sr,
             SUM((doc_id * 7 + x * 13 + y * 29 + 3) % 256) AS sg,
             SUM((doc_id * 7 + x * 13 + y * 29 + 6) % 256) AS sb,
             COUNT(*) AS n
      FROM pix GROUP BY doc_id, w, h
    )
    SELECT doc_id AS media_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sr + sg + sb AS BIGINT) AS px_sum,
           CAST(FLOOR(CAST(sr AS DOUBLE) / n * 1e4) AS BIGINT) AS mean_r_e4,
           CAST(FLOOR(CAST(sg AS DOUBLE) / n * 1e4) AS BIGINT) AS mean_g_e4,
           CAST(FLOOR(CAST(sb AS DOUBLE) / n * 1e4) AS BIGINT) AS mean_b_e4
    FROM ch
    ORDER BY media_id
    """,
)
def image_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG path end-to-end with ZERO codec libraries: deterministic
    RGB images encoded as spec-valid PNGs (zlib deflate, real CRCs, row
    filters cycling through all five PNG filter types), then pixel-
    DECODED back (chunk walk + CRC verify + inflate + full unfiltering,
    operators/multimodal.py:decode_png) and reduced to per-channel
    means + a total pixel checksum. The oracle recomputes every pixel
    from the closed-form generator, so a wrong filter reconstruction,
    CRC, stride, or channel order anywhere in the codec breaks the hash.
    This closes the PNG half of the decode-stub gap the way the BMP/WAV
    paths did; JPEG stays header-only (DCT entropy coding genuinely
    needs a codec library)."""
    import numpy as np
    import pandas as pd

    d = table_par(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)

    def batches(it):
        for pdf in it:
            out = {k: [] for k in (
                "media_id", "width", "height", "px_sum",
                "mean_r_e4", "mean_g_e4", "mean_b_e4",
            )}
            for mid in pdf["doc_id"]:
                w, h = 8 + mid % 9, 4 + mid % 7
                arr = MM.decode_png(MM.pack_png(mid, w, h)).astype(np.float64)
                means = arr.mean(axis=(0, 1))
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["px_sum"].append(int(arr.sum()))
                for k, v in zip(("mean_r_e4", "mean_g_e4", "mean_b_e4"), means):
                    out[k].append(int(np.floor(v * 1e4)))
            yield pd.DataFrame(out)

    schema = (
        "media_id long, width int, height int, px_sum long, "
        "mean_r_e4 long, mean_g_e4 long, mean_b_e4 long"
    )
    return d.select("doc_id").mapInPandas(batches, schema).orderBy("media_id")
