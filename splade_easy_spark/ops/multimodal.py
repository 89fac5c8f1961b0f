"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side contract is real and tested — schema, Arrow batch shape,
``mapInPandas`` signatures, partition behavior.  The actual media decode is
STUBBED (the sandbox has no image/audio libraries): ``decode_fn=None``
raises ``NotImplementedError`` at call time, while tests inject the
deterministic fake decoder below.  Swapping in PIL/ffmpeg later touches
only the decode function, not the Spark plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def fake_decode(payload: bytes, modality: str, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded feature
    vector.  Stable across processes — usable in tests and oracles."""
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    h = hashlib.sha256(modality.encode() + b"|" + payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] | None = None,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """media → (media_id, modality, n_bytes, feature ARRAY<FLOAT>) via an
    Arrow-batched ``mapInPandas`` (the shape a real decode/resize/
    frame-sample stage would use).  ``decode_fn=None`` ⇒ stub error."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn is None:
                raise NotImplementedError(
                    "media decode requires an image/audio library; inject decode_fn"
                )
            feats = [
                None if p is None else [float(x) for x in decode_fn(p, m)]
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Per-modality payload stats — pure Catalyst, no decode needed."""
    return (
        media.groupBy("modality")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("payload").isNull(), 1).otherwise(0)).alias("n_null"),
            F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("total_bytes"),
            F.max(F.coalesce(F.length("payload"), F.lit(0))).alias("max_bytes"),
        )
        .orderBy("modality")
    )


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads derived
    from the row index — no external data)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mods = ["image", "audio", "video"]
        for pdf in batches:
            rows = {"media_id": [], "modality": [], "payload": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                m = mods[i % 3]
                payload = None if i % 17 == 13 else hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 5)
                rows["media_id"].append(f"m_{i:06d}")
                rows["modality"].append(m)
                rows["payload"].append(payload)
                rows["meta"].append({"w": str(64 + i % 512), "h": str(64 + (i * 7) % 512)} if m == "image" else {"dur_ms": str(100 + i)})
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
