"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
plus typed metadata, processed with Arrow-batched ``mapInPandas``.

Decode support is tiered by what pure stdlib can honestly parse:

- WAV (RIFF PCM16) — REAL decode via the stdlib ``wave`` module; the
  pooled feature is 16 chunk-wise mean |amplitude| values.
- PPM (binary P6) and BMP (24-bit uncompressed) — REAL pixel parse
  (header + raw bytes); the pooled feature is a 4x4 block-mean
  grayscale map.
- JPEG (baseline JFIF, gray or YCbCr, any sampling factors) — REAL
  decode via the from-scratch functions/jpeg.py codec (Huffman + IDCT,
  no external libs); progressive/arithmetic raise there and fall back
  to the stub here.
- PNG (8-bit, non-interlaced, color types 0/2/3/4/6, all filters) —
  REAL decode via functions/png.py (stdlib zlib inflate + unfilter);
  16-bit/Adam7 fall back to the stub.
- Y4M video (YUV4MPEG2: Cmono / C420* / C444) — REAL decode via
  functions/video.py (uncompressed planar parse); frame-sampled and
  pooled to the same FEATURE_DIM grid.
- MJPEG-AVI video — REAL decode via functions/video.py (RIFF walk +
  per-frame baseline-JPEG through functions/jpeg.py).
- everything else (exotic codecs, progressive JPEG, non-MJPEG AVI) —
  STUBBED behind ``_decode_stub`` (deterministic fake fold of the
  payload bytes). Swapping in another real decoder is a one-function
  change inside the same pandas batch loop.

Features are computed with integer sums and a fixed division order, so
the driver-gate oracle can replay them exactly in SQL from the
generator formulas (see plans/pipeline_queries.SQL_MEDIA_FEATURES).
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("payload", BinaryType()),    # opaque encoded bytes
        StructField("width", IntegerType()),     # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),  # pooled embedding
        StructField("n_frames_sampled", IntegerType()),
    ]
)

FEATURE_DIM = 16


def _decode_stub(payload: bytes, kind: str, n_frames: int) -> np.ndarray:
    """Deterministic fake decode: fold payload bytes into a FEATURE_DIM
    vector (stands in for decode -> resize -> model -> pool).
    Replace with a real codec when the libs exist; raise otherwise is
    NOT used here so the pipeline stays runnable end-to-end."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.pad(arr, (0, pad))
    frames = arr.reshape(-1, FEATURE_DIM)
    step = max(1, len(frames) // max(1, n_frames))
    return frames[::step][:n_frames].mean(axis=0)


def _decode_wav(payload: bytes) -> np.ndarray:
    """RIFF PCM16 -> int16 samples of the first channel (stdlib wave)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2").reshape(-1, nch)[:, 0]


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM -> uint8 pixel array (h, w, 3)."""
    parts = []
    pos = 2  # past 'P6'
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while not payload[end : end + 1].isspace():
            end += 1
        parts.append(int(payload[pos:end]))
        pos = end
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    pos += 1  # single whitespace after maxval
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> uint8 pixel array (h, w, 3) in RGB
    order (BMP stores BGR rows bottom-up, 4-byte padded)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


def _wav_feature(samples: np.ndarray) -> np.ndarray:
    """16 chunk-wise mean |amplitude| values in [0, 1); chunk of sample
    i is (i*16)//n — integer sums then one division, SQL-replayable."""
    n = len(samples)
    if n == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    idx = (np.arange(n) * FEATURE_DIM) // n
    absv = np.abs(samples.astype(np.int64))
    sums = np.bincount(idx, weights=absv, minlength=FEATURE_DIM)
    cnts = np.bincount(idx, minlength=FEATURE_DIM)
    out = np.where(cnts > 0, sums * 1.0 / np.maximum(cnts, 1) / 32768.0, 0.0)
    return out.astype(np.float32)


def _image_sums(px: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer (sums, counts) of the 4x4 block map for one frame —
    accepts (h, w, 3) RGB or (h, w) grayscale. Pixel at (y, x) lands
    in block (y*4)//h, (x*4)//w."""
    h, w = px.shape[:2]
    yb = (np.arange(h) * 4) // h
    xb = (np.arange(w) * 4) // w
    j = yb[:, None] * 4 + xb[None, :]
    if px.ndim == 3:
        j = j.repeat(px.shape[2])
    sums = np.bincount(
        j.ravel(), weights=px.ravel().astype(np.int64), minlength=FEATURE_DIM
    )
    cnts = np.bincount(j.ravel(), minlength=FEATURE_DIM)
    return sums, cnts


def _image_feature(px: np.ndarray) -> np.ndarray:
    """4x4 block-mean grayscale map in [0, 1]: channel entry at flat
    index idx (y = idx//(w*3), x = (idx%(w*3))//3) lands in block
    (y*4)//h, (x*4)//w — integer sums, SQL-replayable."""
    sums, cnts = _image_sums(px)
    out = np.where(cnts > 0, sums * 1.0 / (np.maximum(cnts, 1) * 255), 0.0)
    return out.astype(np.float32)


def _video_feature(frames, n_frames: int) -> tuple[np.ndarray, int]:
    """Pool FEATURE_DIM over a frame sample: step = max(1,
    total//n_frames), frames[::step][:n_frames] (the same stride rule
    as the stub), INTEGER sums accumulated across the sampled frames
    with ONE final division — so the driver-gate oracle can replay the
    pooled value exactly from the generator formulas in SQL."""
    step = max(1, len(frames) // max(1, n_frames))
    sampled = frames[::step][:n_frames]
    sums = np.zeros(FEATURE_DIM, dtype=np.int64)
    cnts = np.zeros(FEATURE_DIM, dtype=np.int64)
    for fr in sampled:
        s, c = _image_sums(fr)
        sums += s.astype(np.int64)
        cnts += c
    out = np.where(cnts > 0, sums * 1.0 / (np.maximum(cnts, 1) * 255), 0.0)
    return out.astype(np.float32), len(sampled)


def decode_feature(payload: bytes, kind: str, n_frames: int) -> tuple[np.ndarray, int]:
    """(pooled FEATURE_DIM vector, n_frames_sampled). Real decode for
    WAV / PPM / BMP / baseline-JPEG / PNG / Y4M / MJPEG-AVI by
    magic-byte sniff; deterministic stub otherwise (exotic codecs,
    progressive JPEG)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _wav_feature(_decode_wav(payload)), FEATURE_DIM
    if payload[:9] == b"YUV4MPEG2":
        from ..functions.video import decode_y4m

        try:
            return _video_feature(decode_y4m(payload), n_frames)
        except ValueError:
            pass  # unsupported colorspace -> documented stub below
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from ..functions.video import decode_mjpeg_avi

        try:
            return _video_feature(decode_mjpeg_avi(payload), n_frames)
        except ValueError:
            pass  # non-MJPEG AVI -> documented stub below
    if payload[:2] == b"P6":
        return _image_feature(_decode_ppm(payload)), 1
    if payload[:2] == b"BM":
        return _image_feature(_decode_bmp(payload)), 1
    if payload[:2] == b"\xff\xd8":
        from ..functions.jpeg import decode_baseline_jpeg

        try:
            return _image_feature(decode_baseline_jpeg(payload)), 1
        except ValueError:
            pass  # non-baseline JPEG -> documented stub below
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from ..functions.png import decode_png

        try:
            return _image_feature(decode_png(payload)), 1
        except ValueError:
            pass  # 16-bit / interlaced -> documented stub below
    stub_frames = int(min(n_frames, max(1, len(payload) // FEATURE_DIM)))
    return _decode_stub(payload, kind, n_frames), stub_frames


def extract_media_features(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """mapInPandas over Arrow batches: one vectorized pass per batch;
    output schema is fixed (FEATURE_SCHEMA) so downstream plans are
    stable regardless of the decoder implementation."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_feature(p, k, n_frames)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].str.len().astype("int32"),
                    "feature": [f.tolist() for f, _ in decoded],
                    "n_frames_sampled": pd.Series(
                        [nf for _, nf in decoded], dtype="int32"
                    ),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def synthetic_media_real(spark, n: int = 500) -> DataFrame:
    """Deterministic media table with REAL codec payloads across all
    six real decoders. All content derives from closed-form integer
    formulas so the driver-gate oracle can recompute the decoded
    features in SQL without parsing bytes:

    audio (id%6==0): PCM16 WAV, ns = 160 + id % 200 samples at 8 kHz,
        sample_i = ((id*31 + i*17) % 2001) - 1000
    ppm (id%6==1):   w = 4 + id % 13, h = 4 + id % 7,
        channel entry at flat idx (row-major RGB) = (id*7 + idx) % 256
    png (id%6==2):   RGB, w = 5 + id % 11, h = 5 + id % 5,
        channel entry at flat idx = (id*13 + idx*5) % 256
        (lossless codec -> decode is the formula verbatim;
        n_bytes = 68 + h + 3*w*h via level-0 stored deflate)
    jpeg (id%6==3):  Wb = 2 + id % 3, Hb = 1 + id % 2 blocks of 8x8;
        block at flat index b is the constant (id*11 + b*29) % 256
        (functions/jpeg.py constant-block mosaic — decode is EXACT);
        payload padded to exactly 175 + 4*Wb*Hb bytes
    y4m (id%6==4):   Cmono 16x16 @25fps, nf = 2 + id % 7 frames,
        frame f constant luma (id*19 + f*37) % 256 (uncompressed ->
        decode exact; n_bytes = 38 + nf*262)
    avi (id%6==5):   MJPEG-AVI 32x32 @25fps, nf = 2 + id % 5 frames,
        frame f is a 4x4 constant-block mosaic with block b value
        (id*11 + f*29 + b*13) % 256, each frame padded to 240 bytes
        (n_bytes = 224 + nf*248; the 4x4 feature grid aligns 1:1 with
        the 8x8 mosaic blocks, so pooled feature j over sampled frames
        is avg of ((id*11 + f*29 + j*13) % 256) / 255)
    """
    from ..functions.jpeg import GRAY_MOSAIC_OVERHEAD, encode_gray_blocks_jpeg
    from ..functions.png import encode_rgb_png
    from ..functions.video import encode_mjpeg_avi, encode_y4m

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                if mid % 6 == 0:
                    ns = 160 + mid % 200
                    samples = (
                        ((mid * 31 + np.arange(ns) * 17) % 2001) - 1000
                    ).astype("<i2")
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(2)
                        w.setframerate(8000)
                        w.writeframes(samples.tobytes())
                    rows.append(
                        (mid, "audio", buf.getvalue(), 0, 0, ns * 1000 // 8000)
                    )
                elif mid % 6 == 1:
                    wd, ht = 4 + mid % 13, 4 + mid % 7
                    px = ((mid * 7 + np.arange(wd * ht * 3)) % 256).astype(np.uint8)
                    payload = f"P6\n{wd} {ht}\n255\n".encode() + px.tobytes()
                    rows.append((mid, "image", payload, wd, ht, 0))
                elif mid % 6 == 2:
                    wd, ht = 5 + mid % 11, 5 + mid % 5
                    px = (
                        (mid * 13 + np.arange(wd * ht * 3) * 5) % 256
                    ).astype(np.uint8).reshape(ht, wd, 3)
                    rows.append((mid, "image", encode_rgb_png(px), wd, ht, 0))
                elif mid % 6 == 3:
                    wb, hb = 2 + mid % 3, 1 + mid % 2
                    blocks = (
                        (mid * 11 + np.arange(hb * wb) * 29) % 256
                    ).astype(np.uint8).reshape(hb, wb)
                    payload = encode_gray_blocks_jpeg(
                        blocks, pad_to=GRAY_MOSAIC_OVERHEAD + 4 * wb * hb + 8
                    )
                    rows.append((mid, "image", payload, wb * 8, hb * 8, 0))
                elif mid % 6 == 4:
                    nf = 2 + mid % 7
                    frames = np.broadcast_to(
                        ((mid * 19 + np.arange(nf) * 37) % 256)
                        .astype(np.uint8)[:, None, None],
                        (nf, 16, 16),
                    ).copy()
                    rows.append(
                        (mid, "video", encode_y4m(frames), 16, 16, nf * 40)
                    )
                else:
                    nf = 2 + mid % 5
                    jfs = []
                    for f in range(nf):
                        blocks = (
                            (mid * 11 + f * 29 + np.arange(16) * 13) % 256
                        ).astype(np.uint8).reshape(4, 4)
                        jfs.append(encode_gray_blocks_jpeg(blocks, pad_to=240))
                    rows.append(
                        (mid, "video", encode_mjpeg_avi(jfs, 32, 32), 32, 32, nf * 40)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height", "duration_ms",
                ],
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def synthetic_media(spark, n: int = 200, seed: int = 5) -> DataFrame:
    """Deterministic fake media table with binary payloads (for tests
    and the bench; payload = repeated md5 bytes of the id)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), 3) + 1).cast("int"),
    )
    reps = (F.pmod(F.xxhash64("id", F.lit(seed + 1)), 20) + 1).cast("int")
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.to_binary(
            F.repeat(F.md5(F.col("id").cast("string")), reps), F.lit("hex")
        ).alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 2)), 1920) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 3)), 1080) + 1).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 4)), 60000) + 1).cast("int").alias("duration_ms"),
    )
