"""Multimodal column plumbing: image/audio/video as opaque binary.

``decode_real`` REALLY decodes the formats this engine can handle
with no external codec — PPM/PGM (P6/P5), 24-bit uncompressed BMP,
8-bit PNG (zlib inflate + full filter reconstruction), baseline and
progressive JPEG (pure-Python Huffman + dequant + IDCT, see
``jpeg.py``), GIF87a/89a (pure-Python LZW + palette mapping +
interlace, see ``gif.py``), and PCM WAV audio (stdlib ``wave``) —
and raises
``NotImplementedError`` for formats that genuinely need codecs this
container doesn't ship (arithmetic-coded JPEG, MP3, H.264).  A
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
import zlib
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
    bytes / PCM sample bytes), round 6 — same shape as fake_decode.
    Counting runs through collections.Counter (C-accelerated), not a
    per-byte Python loop: a 10 MB payload is one C pass, not 10^7
    interpreter iterations inside the extraction kernel."""
    from collections import Counter

    hist = [0.0] * 16
    if data:
        for byte, c in Counter(data).items():
            hist[byte >> 4] += c
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
    channels = 3 if payload[:2] == b"P6" else 1
    need = width * height * channels
    # exactly one whitespace delimiter after maxval — but Windows-written
    # files terminate the header with CRLF, which is one delimiter, not a
    # delimiter plus a pixel byte.  Ambiguous case: a CR-delimited file
    # whose FIRST PIXEL is 0x0A also shows "\r\n" here — disambiguate by
    # size (consume both bytes only if enough pixel data remains; an
    # exactly-sized CR-delimited file keeps its 0x0A pixel).  A
    # non-whitespace byte means a malformed header: raise rather than
    # silently shift the pixels.
    if payload[i:i + 2] == b"\r\n" and n - (i + 2) >= need:
        i += 2
    elif i < n and payload[i] in b" \t\r\n":
        i += 1
    else:
        raise ValueError("missing whitespace delimiter after PPM maxval")
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
    # a malformed header must raise (→ NULL features upstream), not
    # return garbage dimensions: negative/zero width, zero height, or
    # dims the payload can't possibly hold
    if width <= 0 or height == 0 or abs(width) > 1 << 20 or abs(height) > 1 << 20:
        raise ValueError(f"implausible BMP dimensions {width}x{height}")
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Reverse the per-scanline filters (None/Sub/Up/Average/Paeth —
    PNG spec §9) over the decompressed IDAT stream."""
    stride = width * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ft = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        if len(line) < stride:
            raise ValueError("truncated PNG scanline")
        pos += 1 + stride
        if ft == 1:    # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += line
        prev = line
    return bytes(out)


def _decode_png(payload: bytes):
    """Real PNG decode, stdlib only (zlib inflate + filter
    reconstruction): 8-bit depth, color types gray/RGB/gray-alpha/RGBA,
    no interlace.  Returns (width, height, histogram over the
    reconstructed pixel bytes)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG depth {depth} / color type {color} beyond the "
                    "stdlib decoder (8-bit gray/RGB/GA/RGBA only)")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if width <= 0 or height <= 0 or width > 1 << 20 or height > 1 << 20:
        raise ValueError(f"implausible PNG dimensions {width}x{height}")
    # Total pixel budget BEFORE any allocation: per-axis caps alone still
    # allow ~10^12 declared pixels, so a small IDAT zlib bomb declaring
    # huge dims could inflate to terabytes below.  16 Mpix × RGBA bounds
    # the decode buffer at ~68 MB regardless of what the payload claims.
    if width * height > 1 << 24:
        raise ValueError(
            f"PNG pixel budget exceeded: {width}x{height} > {1 << 24} pixels")
    # Bounded inflate: a zlib bomb in IDAT must not allocate beyond what
    # the declared dimensions can hold (the NULL-features contract means
    # a crafted payload gets caught, never OOM-kills the executor).
    expected = height * (width * channels + 1)
    raw = zlib.decompressobj().decompress(bytes(idat), expected)
    if len(raw) < expected:
        raise ValueError("truncated PNG pixel stream")
    pixels = _png_unfilter(raw, width, height, channels)
    return width, height, _byte_histogram(pixels)


def _decode_wav(payload: bytes):
    """PCM WAV via the stdlib ``wave`` module.  'width' = sample rate,
    'height' = channel count; histogram over the raw PCM byte stream."""
    with wave.open(io.BytesIO(payload)) as w:
        frames = w.readframes(w.getnframes())
        return w.getframerate(), w.getnchannels(), _byte_histogram(frames)


def decode_real(payload: bytes, kind: str):
    """Codec-free real decode: PPM/PGM, 24bpp BMP, 8-bit PNG
    (zlib inflate + filter reconstruction), baseline + progressive JPEG
    (pure-Python Huffman + dequant + IDCT), GIF87a/89a (LZW + palette),
    PCM WAV.  Returns (width, height, 16-bin histogram); raises
    NotImplementedError for formats needing external codecs
    (arithmetic JPEG/MP3/H.264/...)."""
    magic = payload[:4]
    if magic[:2] in (b"P6", b"P5"):
        return _decode_ppm(payload)
    if magic[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if magic[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        w, h, pixels = decode_jpeg(payload)
        return w, h, _byte_histogram(pixels)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        w, h, pixels = decode_gif(payload)
        return w, h, _byte_histogram(pixels)
    if magic == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    raise NotImplementedError(
        f"no codec-free decoder for payload magic {magic!r}; "
        "transform-coded audio/video (MP3/H.264) and arithmetic-coded "
        "JPEG need external codecs this container doesn't ship"
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


def synth_png(asset_id: int, color: int = 2, filter_type: int = 0) -> bytes:
    """Deterministic 8-bit PNG with every scanline forward-filtered
    with ``filter_type`` (0-4) — exercises the decoder's filter
    reconstruction for real."""
    w = 3 + asset_id % 5
    h = 2 + asset_id % 4
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    pixels = bytes((asset_id * 13 + i) % 256 for i in range(stride * h))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(stride)
    for r in range(h):
        line = pixels[r * stride:(r + 1) * stride]
        raw.append(filter_type)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if filter_type == 0:
                v = line[i]
            elif filter_type == 1:
                v = line[i] - left
            elif filter_type == 2:
                v = line[i] - up
            elif filter_type == 3:
                v = line[i] - ((left + up) >> 1)
            else:
                v = line[i] - paeth(left, up, ul)
            raw.append(v & 0xFF)
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


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
