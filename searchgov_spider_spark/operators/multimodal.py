"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs through ``mapInPandas`` so
each Arrow batch is processed vectorized.  The actual codec step is STUBBED
(decode libraries are not present in this environment): ``fake_decode=True``
produces a deterministic hash-derived feature vector so the Spark-side
plumbing — schema, partitioning, batch shape, UDF signature — is fully real
and testable; ``fake_decode=False`` raises NotImplementedError where a real
pillow/ffmpeg call would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: blake2b-seeded unit vector."""
    digest = hashlib.blake2b(payload, digest_size=dim * 4).digest()
    arr = np.frombuffer(digest, dtype=np.uint32).astype(np.float32)
    arr = (arr / np.float32(2**32)) * 2 - 1
    norm = float(np.linalg.norm(arr)) or 1.0
    return arr / norm


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Batch feature extraction over binary media via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    nbytes.append(0)
                    continue
                raw = bytes(payload)
                if not fake_decode:
                    raise NotImplementedError(
                        "real media decode requires pillow/ffmpeg; not available in this environment"
                    )
                feats.append(_fake_features(raw).tolist())
                nbytes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        payload = hashlib.blake2b(f"media:{i}".encode(), digest_size=64).digest() * (i % 4 + 1)
        rows.append((i, mtype, bytearray(payload), (64, 64, 1000 * (i % 7), "fake")))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
