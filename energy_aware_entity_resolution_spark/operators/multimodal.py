"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

A 100 TB training-data pipeline carries media alongside text. The
Spark-side design — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested. Decoding:

- mode='real' DECODES uncompressed container formats with no codec
  library at all: WAV/PCM audio (stdlib ``wave`` + numpy) and 24-bit
  uncompressed BMP images (manual header parse), each featurized to a
  fixed FEATURE_DIM vector (audio: RMS/ZCR/duration + log-spectral
  profile; image: per-channel stats + 3x3 gray thumbnail + aspect).
  BMP images additionally support REAL resize (decode -> nearest-
  neighbor resample -> re-encode, resize_images mode='real').
  Compressed formats (jpeg/png/mp3/mp4 ...) raise NotImplementedError
  — those genuinely need codec libraries absent from this container;
  the dispatch point is `_REAL_DECODERS`.
- mode='fake' hashes bytes into a fixed-shape unit vector — the
  deterministic stand-in that keeps plumbing testable for any mime.

Schema convention:
  media(media_id long, kind string, payload binary,
        meta struct<width:int, height:int, sample_rate:int,
                    n_frames:int, mime:string>)
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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


# --------------------------------------------------- real decoders
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (mono float waveform in [-1,1], sample_rate).
    Stdlib wave + numpy only — no codec library."""
    with wave.open(io.BytesIO(payload)) as w:
        sr = w.getframerate()
        n, sw, ch = w.getnframes(), w.getsampwidth(), w.getnchannels()
        raw = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[sw]
    arr = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:
        arr -= 128.0  # 8-bit WAV is unsigned
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    peak = np.abs(arr).max()
    return (arr / peak if peak > 0 else arr), sr


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (height, width, 3) uint8 RGB.
    Manual header parse — no codec library."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    img = np.zeros((height, width, 3), dtype=np.uint8)
    for r in range(height):
        off = data_off + r * row_bytes
        row = np.frombuffer(payload, dtype=np.uint8, count=width * 3, offset=off)
        y = height - 1 - r if bottom_up else r
        img[y] = row.reshape(width, 3)[:, ::-1]  # BGR -> RGB
    return img


def _wav_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    x, sr = decode_wav(payload)
    n = len(x)
    rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if n > 1 else 0.0
    dur = n / sr if sr else 0.0
    spec = np.abs(np.fft.rfft(x))
    bins = np.array_split(spec, dim - 3) if len(spec) else []
    prof = [float(np.log1p(b.mean())) if len(b) else 0.0 for b in bins]
    vec = np.array([rms, zcr, dur] + prof, dtype=np.float64)
    return [float(v) for v in vec / max(np.linalg.norm(vec), 1e-12)]


def _bmp_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    img = decode_bmp(payload).astype(np.float64) / 255.0
    h, w, _ = img.shape
    mean_rgb = img.mean(axis=(0, 1))
    std_rgb = img.std(axis=(0, 1))
    gray = img.mean(axis=2)
    # 3x3 thumbnail: block means over an even grid
    ys = np.array_split(np.arange(h), 3)
    xs = np.array_split(np.arange(w), 3)
    thumb = [gray[np.ix_(y, x)].mean() for y in ys for x in xs]
    vec = np.array(
        list(mean_rgb) + list(std_rgb) + thumb + [w / max(h, 1)],
        dtype=np.float64,
    )
    return [float(v) for v in vec / max(np.linalg.norm(vec), 1e-12)]


def encode_bmp(img: np.ndarray) -> bytes:
    """(height, width, 3) uint8 RGB -> uncompressed 24-bit bottom-up
    BMP bytes — the exact inverse of decode_bmp, no codec library."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    data_size = row_bytes * h
    off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", off + data_size, 0, 0, off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
        )
    )
    rows = []
    pad = b"\x00" * (row_bytes - w * 3)
    for r in range(h):
        rows.append(img[h - 1 - r][:, ::-1].tobytes() + pad)  # RGB -> BGR
    return header + b"".join(rows)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (pure numpy index gather)."""
    h, w = img.shape[:2]
    ys = np.minimum(np.arange(height) * h // height, h - 1)
    xs = np.minimum(np.arange(width) * w // width, w - 1)
    return img[np.ix_(ys, xs)]


_REAL_DECODERS = {
    "audio/wav": _wav_features,
    "image/bmp": _bmp_features,
}


def decode_and_featurize(
    media: DataFrame, mode: str = "fake", batch_hint: int | None = None
) -> DataFrame:
    """payload binary -> features array<float> via mapInPandas.

    mode='real' decodes the codec-free formats in `_REAL_DECODERS`
    (WAV, uncompressed BMP) and raises for mimes that genuinely need
    codec libraries; mode='fake' runs the identical Spark plumbing
    with the deterministic hash featurizer for any payload.
    """
    if mode not in ("fake", "real"):
        raise ValueError(mode)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                feats = []
                for payload, meta in zip(pdf["payload"], pdf["meta"]):
                    mime = (meta or {}).get("mime", "")
                    decoder = _REAL_DECODERS.get(mime)
                    if decoder is None:
                        raise NotImplementedError(
                            f"no codec-free decoder for {mime!r}; formats "
                            f"needing codec libraries are out of scope in "
                            f"this environment (supported: "
                            f"{sorted(_REAL_DECODERS)})"
                        )
                    feats.append(decoder(bytes(payload)))
            else:
                feats = [_fake_feature(p) for p in pdf["payload"]]
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


def resize_images(
    media: DataFrame, width: int, height: int, mode: str = "meta"
) -> DataFrame:
    """Image resize over the media table.

    mode='real': decode + nearest-neighbor resample + re-encode per
    Arrow batch (mapInPandas) for the codec-free image format
    (uncompressed 24-bit BMP, decode_bmp/encode_bmp); image rows with
    mimes needing codec libraries raise NotImplementedError (absent in
    this environment); non-image rows pass through untouched.
    mode='meta': metadata-only rewrite (payload untouched) — the
    plumbing-shape stand-in for codec formats.
    """
    if mode == "meta":
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
    if mode != "real":
        raise ValueError(mode)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for kind, payload, meta in zip(
                pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                meta = dict(meta or {})
                if kind != "image":
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                mime = meta.get("mime", "")
                if mime != "image/bmp":
                    raise NotImplementedError(
                        f"no codec-free resize for {mime!r} "
                        "(supported: image/bmp)"
                    )
                img = resize_nearest(decode_bmp(bytes(payload)), width, height)
                payloads.append(bytearray(encode_bmp(img)))
                meta["width"], meta["height"] = width, height
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)


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
