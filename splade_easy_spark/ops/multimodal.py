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


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 32,
    extract_fn: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Video frame sampling plumbing: one input row → one row per sampled
    frame (``media_id, frame_idx, n_frames, frame``), the fan-out shape a
    real ffmpeg-backed sampler produces.  The frame *count* comes from the
    typed metadata (``meta['dur_ms']``), so the plan's row multiplication
    is decided without touching payload bytes; ``extract_fn(payload,
    frame_idx) -> bytes`` does the actual decode+seek and is STUBBED
    (``None`` raises) — tests inject ``fake_extract_frame``.

    Scale shape: ``mapInPandas`` over the media table's own partitioning —
    the fan-out is per-row local (no shuffle); downstream feature stages
    group by ``media_id`` only if they need cross-frame pooling."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "n_frames": [], "frame": []}
            for mid, mod, payload, meta in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"], pdf["meta"]
            ):
                if mod != "video" or payload is None:
                    continue
                if extract_fn is None:
                    raise NotImplementedError(
                        "frame extraction requires a video library; inject extract_fn"
                    )
                dur = int((meta or {}).get("dur_ms", "0"))
                n = max(1, min(max_frames, dur // every_ms + 1))
                for k in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(k)
                    rows["n_frames"].append(n)
                    rows["frame"].append(extract_fn(payload, k))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def fake_extract_frame(payload: bytes, frame_idx: int) -> bytes:
    """Deterministic frame stand-in: sha256(payload | idx) — stable across
    processes, distinct per frame."""
    return hashlib.sha256(payload + b"|" + str(frame_idx).encode()).digest()


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize plumbing: same schema out as in, payload transformed
    and the typed metadata's ``w``/``h`` updated to the target size (the
    metadata stays authoritative without decoding downstream).  Non-image
    rows pass through untouched.  ``resize_fn(payload, w, h) -> bytes``
    is the stubbed PIL seam; tests inject ``fake_resize``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for mod, payload, meta in zip(
                pdf["modality"], pdf["payload"], pdf["meta"]
            ):
                if mod != "image" or payload is None:
                    out_payload.append(payload)
                    out_meta.append(meta)
                    continue
                if resize_fn is None:
                    raise NotImplementedError(
                        "image resize requires an image library; inject resize_fn"
                    )
                m = dict(meta or {})
                m["w"], m["h"] = str(width), str(height)
                out_payload.append(resize_fn(payload, width, height))
                out_meta.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: sha256(payload | w×h), truncated to
    a size proportional to the target area (so byte-size assertions have
    teeth)."""
    h = hashlib.sha256(payload + f"|{width}x{height}".encode()).digest()
    target = max(16, (width * height) // 64)
    return (h * (target // len(h) + 1))[:target]
