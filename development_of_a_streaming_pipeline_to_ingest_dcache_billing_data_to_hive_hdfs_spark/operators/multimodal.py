"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side architecture is real and tested — schema contracts, batch
iteration, partition sizing — while the codec step itself is stubbed
(Pillow/librosa/av are not in this container): ``decode_image`` raises
NotImplementedError unless ``fake=True``, which substitutes a
deterministic content-hash-seeded feature vector so the distributed
plumbing can be exercised and asserted end-to-end.

At 100 TB: binary payloads dominate partition size, so media tables are
repartitioned by target *bytes* (``media_repartition``), not row counts,
before any decode pass; the decode itself is embarrassingly parallel
mapInPandas with no shuffle.
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
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real codec: features seeded from the
    content hash, so tests get stable, content-dependent vectors."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    return np.random.default_rng(seed).standard_normal(FEATURE_DIM).astype(np.float32)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Real decode requires an image codec (not in this container)."""
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image decode requires Pillow/opencv, not available in this "
        "environment; pass fake=True for the deterministic test stub"
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media frame → per-item feature vectors via Arrow-batched
    mapInPandas. No shuffle; each partition streams pandas batches."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(p, fake=fake).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": feats,
                }
            )

    return media.mapInPandas(op, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: content- and
    dimension-dependent bytes of the right nominal size (w*h*3 capped)."""
    seed = hashlib.sha256(payload + f"{width}x{height}".encode()).digest()
    out_len = min(width * height * 3, 4096)
    return (seed * (out_len // len(seed) + 1))[:out_len]


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize pass over an image table via Arrow-batched mapInPandas —
    same no-shuffle shape as extract_features; the pixel work is the
    stubbed codec step (real impl drops in Pillow/opencv here)."""
    if not fake:
        raise NotImplementedError(
            "image resize requires Pillow/opencv; pass fake=True for the stub"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [
                        _fake_resize(p, width, height) if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(op, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (media_id, frame_idx, ts_ms, payload). Row expansion happens inside
    mapInPandas — no shuffle, output size = duration/every_ms per video;
    the frame decode is the stubbed codec step (real impl: pyav)."""
    if not fake:
        raise NotImplementedError(
            "video frame extraction requires pyav/ffmpeg; pass fake=True for the stub"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for _, row in pdf.iterrows():
                dur = row["duration_ms"]
                if row["payload"] is None or dur is None or pd.isna(dur):
                    continue
                n_frames = max(1, int(dur) // every_ms)
                for i in range(n_frames):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    tss.append(i * every_ms)
                    h = hashlib.sha256(bytes(row["payload"]) + i.to_bytes(4, "big"))
                    payloads.append(h.digest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "payload": payloads}
            )

    return media.mapInPandas(op, FRAMES_SCHEMA)


def media_repartition(media: DataFrame, target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Repartition a media table by estimated payload bytes so each task
    handles ~target_bytes of binary data regardless of row width."""
    stats = media.select(F.sum(F.length("payload")).alias("total")).first()
    total = stats["total"] or 0
    n = max(1, int(total // target_bytes) + 1)
    return media.repartition(n)
