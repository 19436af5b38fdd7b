"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns with typed metadata; the heavy
decode/transform steps run as Arrow-batched functions over `mapInPandas`
(one Python worker per partition, columnar transfer — never row-at-a-time
UDFs).

Decode coverage:
- REAL, pure-Python (no third-party codec): BMP and PPM/PGM image
  headers + pixel-histogram features; WAV (RIFF) audio headers +
  numpy-FFT band-energy features. These formats are uncompressed, so
  header parsing and feature extraction need only struct/numpy.
- STUBBED (codec genuinely unavailable in this container): compressed
  images (PNG/JPEG -> PIL), compressed audio, and video frame decoding
  (ffmpeg). Those raise NotImplementedError; `fake=True` substitutes a
  deterministic fake decoder so the Spark-side plumbing (schema,
  batching, partitioning) stays fully real and testable for them.
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


def _parse_bmp(raw: bytes) -> tuple[int, int, bytes]:
    """Width, height, and the pixel-array bytes of a BMP payload.
    Handles both BITMAPCOREHEADER (12) and BITMAPINFOHEADER-family DIBs;
    negative height (top-down rows) is normalized."""
    import struct
    if len(raw) < 26 or raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", raw, 10)[0]
    dib_size = struct.unpack_from("<I", raw, 14)[0]
    if dib_size == 12:
        w, h = struct.unpack_from("<HH", raw, 18)
    else:
        w, h = struct.unpack_from("<ii", raw, 18)
        h = abs(h)
    return int(w), int(h), raw[pix_off:]


def _parse_ppm(raw: bytes) -> tuple[int, int, bytes]:
    """Width, height, and raster bytes of a binary PPM (P6) / PGM (P5)
    payload. The header is ASCII tokens with '#' comments; exactly one
    whitespace byte separates the maxval from the raster."""
    if raw[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(raw):
        c = raw[i:i + 1]
        if c == b"#":
            i = raw.find(b"\n", i)
            if i < 0:
                raise ValueError("truncated PPM header")
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(raw) and not raw[j:j + 1].isspace():
                j += 1
            tokens.append(raw[i:j])
            i = j
    if len(tokens) < 3 or i >= len(raw):
        raise ValueError("truncated PPM header")
    return int(tokens[0]), int(tokens[1]), raw[i + 1:]


def _pixel_histogram(pixels: bytes, bins: int = 8) -> list[float]:
    """Normalized byte-value histogram over the raster — a real, decoder-
    independent image feature (deterministic; no codec needed for the
    uncompressed formats)."""
    if not pixels:
        return [0.0] * bins
    import numpy as np
    arr = np.frombuffer(pixels, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
    return [round(float(x) / len(arr), 6) for x in hist]


def _real_decode_image(raw: bytes) -> tuple[int, int, list[float]]:
    if raw[:2] == b"BM":
        w, h, pixels = _parse_bmp(raw)
    elif raw[:2] in (b"P6", b"P5"):
        w, h, pixels = _parse_ppm(raw)
    else:
        raise NotImplementedError(
            f"unsupported image magic {raw[:4]!r}: only uncompressed "
            "BMP/PPM/PGM decode without a third-party codec (PIL not "
            "installed); pass fake=True for the deterministic test decoder")
    return w, h, _pixel_histogram(pixels)


def decode_images(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract image payloads via mapInPandas.

    The real path parses uncompressed BMP/PPM/PGM headers and computes a
    pixel-histogram feature vector in pure Python/numpy; compressed
    formats (PNG/JPEG) raise NotImplementedError from the kernel since no
    codec library is installed. fake=True substitutes the deterministic
    fake decoder for any payload.
    """
    decode_one = _fake_decode_image if fake else _real_decode_image

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "n_bytes": [], "sha1": [], "features": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                w, h, feats = decode_one(raw)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(raw))
                out["sha1"].append(hashlib.sha1(raw).hexdigest())
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return df.select("media_id", "data").mapInPandas(_decode, IMAGE_FEATURES_SCHEMA)


def _parse_avi_frames(raw: bytes) -> list[bytes]:
    """Video-frame chunk payloads ('NNdb' uncompressed / 'NNdc' compressed
    for ANY stream number NN — audio-first muxes put video in stream 1) of
    a RIFF/AVI container, in stream order — walks the 'movi' LIST
    recursively, tolerating idx1 and junk chunks. Truncated chunk sizes
    and a frameless container raise (fail loudly, never emit wrong/empty
    frames silently)."""
    import struct
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        i = start
        while i + 8 <= end:
            cid = raw[i:i + 4]
            csz = struct.unpack_from("<I", raw, i + 4)[0]
            body_at = i + 8
            if body_at + csz > end:
                raise ValueError(
                    f"truncated AVI: chunk {cid!r} of {csz} bytes at "
                    f"offset {i} overruns the container")
            if cid == b"LIST":
                walk(body_at + 4, body_at + csz)
            elif cid[:2].isdigit() and cid[2:4] in (b"db", b"dc"):
                frames.append(raw[body_at:body_at + csz])
            i = body_at + csz + (csz & 1)       # word alignment

    walk(12, len(raw))
    if not frames:
        raise ValueError("RIFF/AVI payload contains no video frame chunks")
    return frames


def sample_frames(df: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Frame-sample video payloads (every_n-th frame) via mapInPandas.

    The real path chunk-walks RIFF/AVI containers and samples the actual
    '00db'/'00dc' frame chunks; compressed containers (mp4/mkv need
    ffmpeg) raise NotImplementedError from the kernel. fake=True treats
    each 1 KiB slice of any payload as one 'frame'."""

    def _real_frames(raw: bytes) -> list[bytes]:
        if raw[:4] != b"RIFF":
            raise NotImplementedError(
                f"unsupported video magic {raw[:4]!r}: only RIFF/AVI "
                "containers decode without ffmpeg; pass fake=True for the "
                "deterministic test decoder")
        return _parse_avi_frames(raw)

    def _fake_frames(raw: bytes) -> list[bytes]:
        return [raw[i * 1024:(i + 1) * 1024]
                for i in range(max(1, len(raw) // 1024))]

    frames_of = _fake_frames if fake else _real_frames

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_sha1": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                frames = frames_of(raw)
                for idx in range(0, len(frames), every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_sha1"].append(
                        hashlib.sha1(frames[idx]).hexdigest())
            yield pd.DataFrame(rows)

    return df.select("media_id", "data").mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("sample_rate", IntegerType(), True),
    StructField("duration_s", FloatType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("mfcc", ArrayType(FloatType()), True),
])


def _parse_wav(raw: bytes) -> tuple[int, int, int, bytes]:
    """(sample_rate, channels, bits_per_sample, pcm_data) from a RIFF/WAVE
    payload — chunk-walks the container, so extra chunks (LIST, fact, cue)
    before or after fmt/data are handled."""
    import struct
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate = channels = bits = None
    data = b""
    i = 12
    while i + 8 <= len(raw):
        cid = raw[i:i + 4]
        csz = struct.unpack_from("<I", raw, i + 4)[0]
        body = raw[i + 8:i + 8 + csz]
        if cid == b"fmt " and len(body) >= 16:
            _fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            data = body
        i += 8 + csz + (csz & 1)            # chunks are word-aligned
    if rate is None or not rate or not channels or not bits:
        raise ValueError("WAV missing or malformed fmt chunk")
    return int(rate), int(channels), int(bits), data


def _band_energies(pcm: bytes, bits: int, channels: int,
                   n_bands: int = 13) -> list[float]:
    """Log band energies of the (mono-mixed) PCM16 signal via numpy rfft —
    a real, deterministic spectral feature in the MFCC shape (true MFCCs
    need a mel filterbank + DCT; the plumbing and dimensionality are
    identical)."""
    import numpy as np
    if bits != 16 or not pcm:
        return [0.0] * n_bands
    x = np.frombuffer(pcm[:2 * channels * 65536], dtype="<i2") \
        .astype(np.float64)
    if channels > 1:
        usable = len(x) // channels * channels
        x = x[:usable].reshape(-1, channels).mean(axis=1)
    if len(x) == 0:
        return [0.0] * n_bands
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, n_bands)
    return [round(float(np.log1p(b.mean())) if len(b) else 0.0, 6)
            for b in bands]


def decode_audio(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract audio payloads via mapInPandas.

    The real path chunk-walks RIFF/WAVE headers (sample rate, channels,
    bit depth, exact duration from the data chunk) and computes 13 log
    band energies over the PCM via numpy FFT; compressed audio raises
    NotImplementedError from the kernel (torchaudio/librosa not
    installed). fake=True substitutes the digest-derived fake decoder."""

    def _real_one(raw: bytes):
        if raw[:4] != b"RIFF":
            raise NotImplementedError(
                f"unsupported audio magic {raw[:4]!r}: only uncompressed "
                "WAV decodes without a codec library; pass fake=True for "
                "the deterministic test decoder")
        rate, channels, bits, pcm = _parse_wav(raw)
        duration = len(pcm) / (rate * channels * max(bits // 8, 1))
        return rate, round(duration, 6), _band_energies(pcm, bits, channels)

    def _fake_one(raw: bytes):
        digest = hashlib.sha1(raw).digest()
        rate = (8000, 16000, 22050, 44100)[digest[0] % 4]
        return (rate, round(len(raw) / (rate * 2.0), 6),
                [round(b / 255.0 - 0.5, 6) for b in digest[1:14]])

    decode_one = _fake_one if fake else _real_one

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "duration_s": [],
                   "n_bytes": [], "mfcc": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                rate, duration, mfcc = decode_one(raw)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["duration_s"].append(duration)
                out["n_bytes"].append(len(raw))
                out["mfcc"].append(mfcc)
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
