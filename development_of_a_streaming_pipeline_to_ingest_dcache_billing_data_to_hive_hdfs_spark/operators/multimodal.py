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


def media_repartition(media: DataFrame, target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Repartition a media table by estimated payload bytes so each task
    handles ~target_bytes of binary data regardless of row width."""
    stats = media.select(F.sum(F.length("payload")).alias("total")).first()
    total = stats["total"] or 0
    n = max(1, int(total // target_bytes) + 1)
    return media.repartition(n)
