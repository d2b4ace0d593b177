"""Multimodal span processing: typed metadata + feature plumbing for the
media spans carried through the extraction output.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extraction run as Arrow-batched pandas transforms over
``mapInPandas``.  The image/audio codec libraries are not present in this
environment, so the decode step is STUBBED — ``decode_stub`` raises
NotImplementedError unless ``deterministic_fake=True``, in which case it
produces a seeded fake decode (stable shape/bytes) so the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and
tested end-to-end.  Swapping in a real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("content_digest", StringType()),
        StructField("thumbnail", BinaryType()),
    ]
)


def media_type_of(ref: str) -> str:
    if ref is None:
        return "unknown"
    low = ref.lower()
    if low.endswith((".jpg", ".jpeg", ".png", ".gif")) or "/img/" in low:
        return "image"
    if low.endswith((".mp4", ".webm", ".avi")) or "/vid/" in low:
        return "video"
    if low.endswith((".mp3", ".wav", ".flac")) or "/aud/" in low:
        return "audio"
    return "unknown"


def decode_stub(ref: str, payload: bytes | None, deterministic_fake: bool = False):
    """Decode a media payload.  REAL CODECS ARE NOT AVAILABLE HERE — this is
    the documented stub seam.  With ``deterministic_fake`` it synthesizes a
    stable (width, height, n_frames, thumbnail) from the ref hash; without
    it, it raises (the production deployment plugs Pillow/ffmpeg here)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "environment; pass deterministic_fake=True for plumbing tests"
        )
    h = hashlib.md5((ref or "").encode()).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    n_frames = 1 if media_type_of(ref) == "image" else 1 + h[2]
    rng = np.frombuffer(h * 4, dtype=np.uint8)
    thumbnail = rng[:32].tobytes()
    return width, height, n_frames, thumbnail


def media_features(
    media_df: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """(media_ref[, payload:binary]) -> typed media feature rows.

    Arrow-batched; one vectorized pass per batch.  Partitioning contract:
    media rows are independent — any partitioning works; payloads at 100 TB
    live in object storage referenced by media_ref and are range-read
    inside the UDF (here: absent/None)."""
    has_payload = "payload" in media_df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, ref in enumerate(pdf["media_ref"]):
                payload = pdf["payload"].iloc[i] if has_payload else None
                w, h, nf, thumb = decode_stub(
                    ref, payload, deterministic_fake=deterministic_fake
                )
                rows.append(
                    (
                        ref,
                        media_type_of(ref),
                        len(payload) if payload is not None else 0,
                        w,
                        h,
                        nf,
                        hashlib.md5((ref or "").encode()).hexdigest(),
                        thumb,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_FEATURES.fields]
            )

    return media_df.mapInPandas(run, schema=MEDIA_FEATURES)
