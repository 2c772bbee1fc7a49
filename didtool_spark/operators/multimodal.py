"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
plus typed metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition-preserving
transforms, UDF signatures — is real and tested. The codec step itself
(JPEG decode, audio resample, video frame extraction) is STUBBED behind
``_decode_stub`` because the image/audio libraries are not in this
container: it produces a deterministic fake "decoded" feature vector
from the payload bytes. Swapping in a real decoder is a one-function
change (replace ``_decode_stub`` with PIL/torchaudio/PyAV calls inside
the same pandas batch loop).
"""

from __future__ import annotations

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


def extract_media_features(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """mapInPandas over Arrow batches: one vectorized pass per batch;
    output schema is fixed (FEATURE_SCHEMA) so downstream plans are
    stable regardless of the decoder implementation."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(p, k, n_frames)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].str.len().astype("int32"),
                    "feature": [f.tolist() for f in feats],
                    "n_frames_sampled": np.minimum(
                        n_frames,
                        np.maximum(
                            1, pdf["payload"].str.len() // FEATURE_DIM
                        ),
                    ).astype("int32"),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


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
