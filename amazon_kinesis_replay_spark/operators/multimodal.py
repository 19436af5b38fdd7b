"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns with typed metadata; the heavy
decode/transform steps run as Arrow-batched functions over `mapInPandas`
(one Python worker per partition, columnar transfer — never row-at-a-time
UDFs). The actual codec work (PIL/ffmpeg/torchaudio) is NOT available in
this container, so the decode kernels are STUBBED: `decode_*` raise
NotImplementedError unless `fake=True`, which substitutes a deterministic
fake decoder so the Spark-side plumbing (schema, batching, partitioning)
is fully real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, MapType,
    StringType, StructField, StructType,
)

#: Canonical multimodal record schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image | audio | video
    StructField("data", BinaryType(), True),
    StructField("meta", MapType(StringType(), StringType()), True),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("sha1", StringType(), True),
    StructField("features", ArrayType(FloatType()), True),
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame_sha1", StringType(), True),
])


def _fake_decode_image(data: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real image decoder: dimensions and an
    8-dim feature vector derived from the payload digest."""
    digest = hashlib.sha1(data or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feats = [round(b / 255.0, 6) for b in digest[2:10]]
    return width, height, feats


def decode_images(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract image payloads via mapInPandas.

    Real path requires an image codec (PIL) — not present in this
    container; pass fake=True for the deterministic fake decoder.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/opencv (not installed); "
            "call with fake=True for the deterministic test decoder")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "n_bytes": [], "sha1": [], "features": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                w, h, feats = _fake_decode_image(raw)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(raw))
                out["sha1"].append(hashlib.sha1(raw).hexdigest())
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return df.select("media_id", "data").mapInPandas(_decode, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Frame-sample video payloads (every_n-th frame) via mapInPandas.
    Fake decoder treats each 1 KiB slice of the payload as one 'frame'."""
    if not fake:
        raise NotImplementedError(
            "real video frame sampling requires ffmpeg (not installed); "
            "call with fake=True for the deterministic test decoder")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_sha1": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                n_frames = max(1, len(raw) // 1024)
                for idx in range(0, n_frames, every_n):
                    frame = raw[idx * 1024:(idx + 1) * 1024]
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_sha1"].append(hashlib.sha1(frame).hexdigest())
            yield pd.DataFrame(rows)

    return df.select("media_id", "data").mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("sample_rate", IntegerType(), True),
    StructField("duration_s", FloatType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("mfcc", ArrayType(FloatType()), True),
])


def decode_audio(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract audio payloads via mapInPandas (fake
    decoder derives sample rate / duration / a 13-dim MFCC-shaped vector
    from the payload digest; real path needs torchaudio/librosa)."""
    if not fake:
        raise NotImplementedError(
            "real audio decode requires torchaudio/librosa (not installed); "
            "call with fake=True for the deterministic test decoder")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "duration_s": [],
                   "n_bytes": [], "mfcc": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                digest = hashlib.sha1(raw).digest()
                rate = (8000, 16000, 22050, 44100)[digest[0] % 4]
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["duration_s"].append(round(len(raw) / (rate * 2.0), 6))
                out["n_bytes"].append(len(raw))
                out["mfcc"].append(
                    [round(b / 255.0 - 0.5, 6) for b in digest[1:14]])
            yield pd.DataFrame(out)

    return df.select("media_id", "data").mapInPandas(_decode, AUDIO_FEATURES_SCHEMA)


def media_metadata(df: DataFrame, data_col: str = "data") -> DataFrame:
    """JVM-side metadata over binary payloads — no Python needed: byte
    length, md5, magic-byte sniff. The cheap pre-filter that should always
    run BEFORE any Python decode at scale."""
    data = F.col(data_col)
    return df.withColumns({
        "n_bytes": F.octet_length(data).cast("long"),
        "digest": F.md5(data),
        "looks_png": F.hex(F.substring(data, 1, 4)) == F.lit("89504E47"),
    })
