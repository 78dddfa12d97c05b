"""Multimodal binary columns: plumbing (schema, UDF shape,
determinism) + REAL codec-free decoding (WAV via stdlib wave,
uncompressed 24-bit BMP via manual header parse); compressed formats
stay explicitly gated — see operators/multimodal.py."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    decode_bmp,
    decode_wav,
    resize_images,
    sample_frames,
    synthetic_media,
)


def _make_wav(freq_hz: float, sr: int = 8000, n: int = 1600) -> bytes:
    t = np.arange(n) / sr
    pcm = (np.sin(2 * np.pi * freq_hz * t) * 20000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _make_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    data = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = pixels[r][:, ::-1].tobytes()  # RGB -> BGR
        data += row + b"\x00" * (row_bytes - len(row))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return bytes(header + data)


def test_fake_featurize_deterministic_unit_vectors(spark):
    media = synthetic_media(spark, 30).cache()
    f1 = {r["media_id"]: r["features"] for r in decode_and_featurize(media).collect()}
    f2 = {r["media_id"]: r["features"] for r in decode_and_featurize(media).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())
    assert math.isclose(sum(x * x for x in f1[0]), 1.0, abs_tol=1e-6)


def test_real_mode_gated_for_codec_formats(spark):
    """Formats that genuinely need codec libraries stay explicitly
    NotImplemented (synthetic_media uses x-fake/* mimes)."""
    media = synthetic_media(spark, 3)
    with pytest.raises(Exception) as ei:
        decode_and_featurize(media, mode="real").collect()
    assert "codec-free" in str(ei.value)


def test_decode_wav_roundtrip():
    sr, n = 8000, 1600
    x, got_sr = decode_wav(_make_wav(440.0, sr, n))
    assert got_sr == sr and len(x) == n
    # recovered waveform is the sine (unit peak after normalization)
    t = np.arange(n) / sr
    ref = np.sin(2 * np.pi * 440.0 * t)
    assert float(np.corrcoef(x, ref)[0, 1]) > 0.999


def test_decode_bmp_roundtrip_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(_make_bmp(img)), img)


def test_real_decode_featurizes_wav_and_bmp(spark):
    rng = np.random.default_rng(9)
    rows = [
        (0, "audio", bytearray(_make_wav(220.0)), (0, 0, 8000, 0, "audio/wav")),
        (1, "audio", bytearray(_make_wav(1760.0)), (0, 0, 8000, 0, "audio/wav")),
        (
            2,
            "image",
            bytearray(_make_bmp(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))),
            (16, 16, 0, 0, "image/bmp"),
        ),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r["features"]
        for r in decode_and_featurize(media, mode="real").collect()
    }
    assert all(len(v) == 16 for v in out.values())
    for v in out.values():  # unit vectors
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-6)
    # different pitches produce different spectral profiles
    assert out[0] != out[1]
    # deterministic across runs
    again = {
        r["media_id"]: r["features"]
        for r in decode_and_featurize(media, mode="real").collect()
    }
    assert out == again


def test_resize_rewrites_meta_only(spark):
    media = synthetic_media(spark, 9)
    out = resize_images(media, 32, 32)
    rows = out.select("meta.width", "meta.height", "payload").collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows)
    orig = media.select("payload").collect()
    assert [r["payload"] for r in rows] == [r["payload"] for r in orig]


def test_sample_frames_explodes_videos_only(spark):
    media = synthetic_media(spark, 30)
    frames = sample_frames(media, every_n=10)
    kinds = media.select("media_id", "kind").collect()
    video_ids = {r["media_id"] for r in kinds if r["kind"] == "video"}
    got = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert {r["media_id"] for r in got} == video_ids
    for r in frames.collect():
        assert r["frame_idx"] % 10 == 0


def test_encode_bmp_roundtrips_with_decode():
    from energy_aware_entity_resolution_spark.operators.multimodal import (
        encode_bmp,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)  # odd width: row pad
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_resize_images_real_resamples_bmp(spark):
    """mode='real': BMP payload decoded, nearest-neighbor resampled and
    re-encoded distributively; non-image rows pass through byte-equal."""
    from energy_aware_entity_resolution_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
        resize_nearest,
    )

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (12, 8, 3), dtype=np.uint8)
    wav = _make_wav(440.0)
    media = spark.createDataFrame(
        [
            (0, "image", bytearray(_make_bmp(img)), (8, 12, 0, 0, "image/bmp")),
            (1, "audio", bytearray(wav), (0, 0, 8000, 0, "audio/wav")),
        ],
        MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in resize_images(media, 4, 6, mode="real").collect()}
    got = decode_bmp(bytes(out[0]["payload"]))
    assert got.shape == (6, 4, 3)
    assert np.array_equal(got, resize_nearest(img, 4, 6))
    assert out[0]["meta"]["width"] == 4 and out[0]["meta"]["height"] == 6
    assert bytes(out[1]["payload"]) == wav  # non-image untouched
