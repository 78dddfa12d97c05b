"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

A 100 TB training-data pipeline carries media alongside text. The
Spark-side design is real and tested — schema, partitioning, Arrow
batch shape, UDF signatures — while the actual codec work is stubbed:
this container has no image/audio libraries, so decode raises
NotImplementedError unless the deterministic fake decoder is selected
(fake mode hashes bytes into a fixed-shape feature vector, which keeps
the plumbing testable end-to-end).

Schema convention:
  media(media_id long, kind string, payload binary,
        meta struct<width:int, height:int, sample_rate:int,
                    n_frames:int, mime:string>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, mime:string>"
)

FEATURE_DIM = 16


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+featurizer: expand the
    payload digest into a unit vector. Same bytes -> same features on
    any executor."""
    h = hashlib.blake2b(payload or b"", digest_size=dim * 4).digest()
    arr = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
    arr = arr / max(np.linalg.norm(arr), 1e-12)
    return [float(x) for x in arr]


def decode_and_featurize(
    media: DataFrame, mode: str = "fake", batch_hint: int | None = None
) -> DataFrame:
    """payload binary -> features array<float> via mapInPandas.

    mode='real' is the integration point for actual codecs (PIL,
    torchaudio, pyav ...) — deliberately NotImplemented here;
    mode='fake' runs the identical Spark plumbing with the
    deterministic fake featurizer.
    """
    if mode not in ("fake", "real"):
        raise ValueError(mode)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real media decoding requires codec libraries not "
                    "present in this environment; use mode='fake'"
                )
            feats = [ _fake_feature(p) for p in pdf["payload"] ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        op, schema="media_id long, kind string, features array<float>"
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Stub image resize: real implementation decodes + resamples per
    Arrow batch; here only metadata is rewritten (payload untouched) so
    the pipeline shape (projection + struct rewrite) is real."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.mime").alias("mime"),
        ),
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_idx)
    for frames 0, n, 2n, ... of each video — pure JVM explode over the
    metadata; the decode of each sampled frame is the stubbed part."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture: binary payloads derived from the id."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.blake2b(f"media{i}".encode(), digest_size=32).digest()
        meta = (
            64 + (i % 4) * 32,
            64 + (i % 3) * 32,
            16000 if kind == "audio" else 0,
            30 * (i % 5 + 1) if kind == "video" else 0,
            f"x-fake/{kind}",
        )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
