"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as vectorized pandas
kernels over `mapInPandas`. The decode step itself is STUBBED (no
image/audio libraries in this environment): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic fake
decoder (seeded by the payload hash) produces stable pseudo-features so the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is fully real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    STUB: real decoding needs an image library not present in this
    container. With fake=True, returns a deterministic 8x8x3 array derived
    from the payload digest (stable across runs/machines).
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library (e.g. Pillow); "
            "not available in this environment — pass fake=True for tests"
        )
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


FEATURE_DIM = 16
_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, feature array<float>) via mapInPandas — the real plumbing:
    Arrow batches in, per-batch numpy feature extraction, Arrow batches out.
    The decode call is the stub boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                img = decode_image(payload, fake=fake).astype(np.float32)
                # channel means/stds + 2x2 pooled luma: a real feature shape
                luma = img.mean(axis=2)
                pooled = luma.reshape(4, 2, 4, 2).mean(axis=(1, 3)).ravel()
                f = np.concatenate([img.mean(axis=(0, 1)), img.std(axis=(0, 1)), pooled[:10]])
                feats.append(f[:FEATURE_DIM].astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(run, schema=_FEATURES_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def frame_sample(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Sample one frame per `every_ms` of video duration.

    STUB decode: frame payloads are deterministic digests of
    (payload, frame_idx); the row-explosion plumbing (one input row ->
    duration//every_ms output rows) is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if not fake:
                    raise NotImplementedError("video decoding not available; use fake=True")
                n_frames = max(int((dur or 0) // every_ms), 0)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(
                        hashlib.sha256((payload or b"") + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        run, schema=_FRAME_SCHEMA
    )


def generate_media(spark, n_rows: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                int(rng.integers(500, 5000)) if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
