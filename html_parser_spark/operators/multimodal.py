"""Multimodal column plumbing: image/audio/video as opaque binary.

``decode_real`` REALLY decodes the uncompressed formats the Python
stdlib can handle with no external codec — PPM/PGM (P6/P5) and 24-bit
uncompressed BMP images, and PCM WAV audio (stdlib ``wave``) — and
raises ``NotImplementedError`` for compressed formats (JPEG/PNG/MP3/
H.264) that genuinely need codecs this container doesn't ship.  A
deterministic ``fake_decode`` remains for opaque test payloads.
Everything Spark-side — schema, Arrow batch shape, ``mapInPandas``
signatures, partitioning — is shared by both paths; the real-decode
path is value-checked end-to-end by the driver oracle on synthesized
ASCII-pixel PPMs (``multimodal_real_decode``).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, MapType,
    StringType, StructField, StructType,
)

ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),          # image|audio|video
    StructField("payload", BinaryType(), True),        # opaque bytes
    StructField("meta", MapType(StringType(), StringType()), True),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("content_hash", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("histogram", ArrayType(DoubleType()), True),
])


def _byte_histogram(data: bytes):
    """16-bin normalized histogram over a decoded byte stream (pixel
    bytes / PCM sample bytes), round 6 — same shape as fake_decode."""
    hist = [0.0] * 16
    if data:
        for b in data:
            hist[b >> 4] += 1.0
        total = float(len(data))
        hist = [round(c / total, 6) for c in hist]
    return hist


def _decode_ppm(payload: bytes):
    """Netpbm P6 (RGB) / P5 (gray), binary variants: ASCII header of
    whitespace-separated magic/width/height/maxval (with ``#`` comment
    lines), one whitespace byte, then raw samples."""
    tokens = []
    i = 2  # past magic
    n = len(payload)
    while len(tokens) < 3 and i < n:
        while i < n and payload[i] in b" \t\r\n":
            i += 1
        if i < n and payload[i:i + 1] == b"#":
            while i < n and payload[i] not in b"\r\n":
                i += 1
            continue
        j = i
        while j < n and payload[j] not in b" \t\r\n":
            j += 1
        tokens.append(payload[i:j])
        i = j
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    width, height, maxval = (int(t) for t in tokens)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    i += 1  # the single whitespace after maxval
    channels = 3 if payload[:2] == b"P6" else 1
    need = width * height * channels
    data = payload[i:i + need]
    if len(data) < need:
        raise ValueError("truncated PPM pixel data")
    return width, height, _byte_histogram(data)


def _decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): rows padded
    to 4 bytes, bottom-up (or top-down when height < 0)."""
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24bpp uncompressed BMP is stdlib-decodable (got bpp={bpp}, "
            f"compression={compression})")
    height = abs(height)
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    pixels = bytearray()
    for r in range(height):
        start = data_offset + r * stride
        row = payload[start:start + row_bytes]
        if len(row) < row_bytes:
            raise ValueError("truncated BMP pixel data")
        pixels += row  # padding bytes excluded from the histogram
    return width, height, _byte_histogram(bytes(pixels))


def _decode_wav(payload: bytes):
    """PCM WAV via the stdlib ``wave`` module.  'width' = sample rate,
    'height' = channel count; histogram over the raw PCM byte stream."""
    with wave.open(io.BytesIO(payload)) as w:
        frames = w.readframes(w.getnframes())
        return w.getframerate(), w.getnchannels(), _byte_histogram(frames)


def decode_real(payload: bytes, kind: str):
    """Stdlib-only real decode: PPM/PGM, 24bpp BMP, PCM WAV.  Returns
    (width, height, 16-bin histogram); raises NotImplementedError for
    formats that need external codecs (JPEG/PNG/MP3/H.264/...)."""
    magic = payload[:4]
    if magic[:2] in (b"P6", b"P5"):
        return _decode_ppm(payload)
    if magic[:2] == b"BM":
        return _decode_bmp(payload)
    if magic == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    raise NotImplementedError(
        f"no stdlib decoder for payload magic {magic!r}; compressed formats "
        "(JPEG/PNG/MP3/H.264) need external codecs this container doesn't ship"
    )


def fake_decode(payload: bytes, kind: str):
    """Deterministic stand-in decoder: derives pseudo width/height and a
    16-bin byte histogram from the payload itself."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    hist = [0.0] * 16
    if payload:
        for b in payload:
            hist[b >> 4] += 1.0
        total = float(len(payload))
        hist = [round(c / total, 6) for c in hist]
    return width, height, hist


def extract_features(assets: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow
    batches; no per-row Python UDF overhead)."""
    decode = decode_real if use_real_codec else fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    rows.append((asset_id, kind, None, None, None, None, None))
                    continue
                payload = bytes(payload)
                try:
                    w, h, hist = decode(payload, kind)
                except Exception:
                    # undecodable payload (unknown/compressed format or
                    # truncated data): permissive contract — size + hash
                    # survive, decode-derived features are NULL
                    w = h = hist = None
                rows.append((
                    asset_id, kind, len(payload),
                    hashlib.md5(payload).hexdigest(), w, h, hist,
                ))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "kind", "n_bytes", "content_hash", "width", "height", "histogram"],
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def synth_ppm(asset_id: int) -> bytes:
    """Deterministic P6 PPM whose pixel bytes are the ASCII md5
    hexdigest of the id, repeated — a real decodable image that a SQL
    oracle can reconstruct character-for-character (the driver's
    ``multimodal_real_decode`` twin)."""
    w = 4 + asset_id % 5
    h = 3 + asset_id % 4
    npix = w * h * 3
    digest = hashlib.md5(str(asset_id).encode()).hexdigest().encode()
    pixels = (digest * (npix // len(digest) + 1))[:npix]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels


def synth_bmp(asset_id: int) -> bytes:
    """Deterministic 24bpp BMP (BI_RGB, bottom-up, padded rows)."""
    w = 2 + asset_id % 4
    h = 2 + asset_id % 3
    stride = (w * 3 + 3) & ~3
    pix = bytearray()
    for r in range(h):
        row = bytes((asset_id + r * w * 3 + c) % 256 for c in range(w * 3))
        pix += row + b"\x00" * (stride - w * 3)
    data_offset = 54
    size = data_offset + len(pix)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + dib + bytes(pix)


def synth_wav(asset_id: int) -> bytes:
    """Deterministic 8-bit mono PCM WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(1)
        wv.setframerate(8000)
        frames = bytes((asset_id * 7 + i) % 256 for i in range(64))
        wv.writeframes(frames)
    return buf.getvalue()


def synth_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic asset table for tests/demos.

    Payload bytes are the ASCII sha256 hexdigest of the asset id,
    repeated — opaque binary to the pipeline, but reproducible by a
    SQL oracle (``repeat(sha256(cast(i as varchar)), 1 + i % 7)``) so
    the whole mapInPandas feature path is value-checked end to end.
    """
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).hexdigest().encode() * (1 + i % 7)
        rows.append((i, kinds[i % 3], bytearray(payload), {"src": f"synth://{i}"}))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
