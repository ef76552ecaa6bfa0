"""Structural media probing: MP3 frame walk + MP4 (ISO-BMFF) box walk.

The multimodal gap list has always been honest that transform-coded
audio/video (MP3, H.264) cannot be *decoded* without external codecs
(operators/multimodal.py).  What a 100-TB training-data pipeline
actually needs from those assets, though, is almost always *metadata*
— duration, bitrate, sample rate, track dimensions — and that is pure
container structure, fully parseable from the public specs with no
codec: ISO/IEC 11172-3 frame headers for MP3, ISO/IEC 14496-12 box
structure for MP4.  ``probe_media`` walks every MPEG audio frame
(header-by-header, ID3v2/ID3v1 aware) and the full MP4 box tree
(mvhd/tkhd/hdlr) and emits typed features per asset.

Hardening follows the decoder family's contract: strict structural
validation (a bad sync word, an undersized box, or a truncated frame
raises ValueError → NULL features upstream, never garbage), walks are
linear in the payload with strictly increasing offsets (no hang), and
nothing is allocated proportional to declared-but-absent sizes.

The synthesizers emit real containers whose every header field derives
from the asset id, so a SQL oracle reconstructs frame counts, duration
and dimensions in closed form (``media_probe`` driver twin).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

# ISO/IEC 11172-3 Annex B bitrate tables, kbit/s (index 0 = free format,
# rejected below; index 15 is invalid)
_BITRATE_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BITRATE_V2 = {  # MPEG-2 / 2.5 (13818-3)
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLERATE = {  # by version key: 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit size)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    b = payload[6:10]
    if any(x & 0x80 for x in b):
        raise ValueError("ID3v2 size bytes must be syncsafe")
    return 10 + ((b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3])


def probe_mp3(payload: bytes) -> dict:
    """Walk every MPEG audio frame header; returns n_frames, exact
    duration, sample rate, channel count, and CBR/VBR classification.
    Strict: the stream must be wall-to-wall frames (after ID3 tags) —
    a broken sync raises rather than resyncing over garbage."""
    pos = _id3v2_size(payload)
    end = len(payload)
    if payload[end - 128:end - 125] == b"TAG":  # trailing ID3v1
        end -= 128
    n_frames = 0
    samples_num = 0        # duration = samples_num / samplerate (single rate enforced)
    rate0 = None
    bitrates = set()
    channels = None
    layer_out = None
    version_out = None
    while pos < end:
        if pos + 4 > end:
            raise ValueError("truncated MPEG frame header")
        h = struct.unpack_from(">I", payload, pos)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"bad MPEG sync at offset {pos}")
        version = (h >> 19) & 0x3   # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer_bits = (h >> 17) & 0x3  # 3=I, 2=II, 1=III
        if version == 1 or layer_bits == 0:
            raise ValueError("reserved MPEG version/layer")
        layer = 4 - layer_bits      # 1, 2, 3
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        if br_idx in (0, 15):
            raise ValueError("free-format/invalid bitrate index")
        if sr_idx == 3:
            raise ValueError("reserved sample-rate index")
        table = _BITRATE_V1 if version == 3 else _BITRATE_V2
        bitrate = table[layer][br_idx] * 1000
        samplerate = _SAMPLERATE[version][sr_idx]
        if layer == 1:
            frame_len = (12 * bitrate // samplerate + padding) * 4
            samples = 384
        else:
            per = 144 if (version == 3 or layer == 2) else 72  # MPEG2 L3: 576 samples
            frame_len = per * bitrate // samplerate + padding
            samples = 1152 if (version == 3 or layer == 2) else 576
        if frame_len <= 4:
            raise ValueError("degenerate MPEG frame length")
        if pos + frame_len > end:
            raise ValueError("truncated MPEG frame body")
        if rate0 is None:
            rate0, channels = samplerate, (1 if mode == 3 else 2)
            layer_out, version_out = layer, version
        elif samplerate != rate0:
            raise ValueError("sample-rate change mid-stream")
        bitrates.add(bitrate)
        samples_num += samples
        n_frames += 1
        pos += frame_len
    if n_frames == 0:
        raise ValueError("no MPEG frames")
    return {
        "container": "mp3",
        "n_units": n_frames,
        "duration_ms": samples_num * 1000 // rate0,
        "sample_rate": rate0,
        "channels": channels,
        "bit_rate_kbps": (next(iter(bitrates)) // 1000 if len(bitrates) == 1
                          else sum(bitrates) // len(bitrates) // 1000),
        "is_cbr": len(bitrates) == 1,
        "width": None,
        "height": None,
    }


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _walk_boxes(payload: bytes, start: int, end: int, depth: int, out: dict):
    if depth > 8:
        raise ValueError("MP4 box nesting too deep")
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        size = struct.unpack_from(">I", payload, pos)[0]
        btype = payload[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize")
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4 box {btype!r} size out of bounds")
        if btype in _MP4_CONTAINERS:
            _walk_boxes(payload, body, pos + size, depth + 1, out)
        elif btype == b"mvhd":
            ver = payload[body]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", payload, body + 4 + 16)
            else:
                ts, dur = struct.unpack_from(">II", payload, body + 4 + 8)
            if ts == 0:
                raise ValueError("mvhd timescale is zero")
            out["timescale"], out["duration"] = ts, dur
        elif btype == b"tkhd":
            ver = payload[body]
            off = body + 4 + (32 if ver == 1 else 20) + 8 + 2 + 2 + 2 + 2 + 36
            w, h = struct.unpack_from(">II", payload, off)
            w, h = w >> 16, h >> 16   # 16.16 fixed point
            out["n_tracks"] = out.get("n_tracks", 0) + 1
            if w and h:
                out["width"] = max(out.get("width") or 0, w)
                out["height"] = max(out.get("height") or 0, h)
        elif btype == b"hdlr":
            out.setdefault("handlers", []).append(
                payload[body + 8:body + 12].decode("latin1"))
        pos += size


def probe_mp4(payload: bytes) -> dict:
    """Walk the ISO-BMFF box tree: movie duration from mvhd, track
    count + max video dimensions from tkhd, handler types from hdlr."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream (no ftyp)")
    out: dict = {}
    _walk_boxes(payload, 0, len(payload), 0, out)
    if "timescale" not in out:
        raise ValueError("MP4 missing moov/mvhd")
    handlers = out.get("handlers", [])
    return {
        "container": "mp4",
        "n_units": out.get("n_tracks", 0),
        "duration_ms": out["duration"] * 1000 // out["timescale"],
        "sample_rate": out["timescale"],
        "channels": sum(1 for h in handlers if h == "soun") or None,
        "bit_rate_kbps": None,
        "is_cbr": None,
        "width": out.get("width"),
        "height": out.get("height"),
    }


PROBE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("container", StringType(), True),
    StructField("n_units", LongType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("bit_rate_kbps", IntegerType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def probe_media(assets: DataFrame) -> DataFrame:
    """mapInPandas structural probe over binary payloads — same Arrow
    batch shape as multimodal.extract_features; unknown/broken
    containers yield NULL features, never a task failure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(
                    pdf["asset_id"], pdf["kind"], pdf["payload"]):
                meta = dict.fromkeys(
                    ("container", "n_units", "duration_ms", "sample_rate",
                     "channels", "bit_rate_kbps", "width", "height"))
                if payload is not None:
                    b = bytes(payload)
                    try:
                        if len(b) >= 12 and b[4:8] == b"ftyp":
                            meta.update(probe_mp4(b))
                        elif b[:3] == b"ID3" or (
                                len(b) >= 2 and b[0] == 0xFF and b[1] & 0xE0 == 0xE0):
                            meta.update(probe_mp3(b))
                    except Exception:
                        meta = dict.fromkeys(meta)  # hostile payload → NULLs
                rows.append((
                    asset_id, kind, meta["container"], meta["n_units"],
                    meta["duration_ms"], meta["sample_rate"], meta["channels"],
                    meta["bit_rate_kbps"], meta["width"], meta["height"],
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA.fields])

    return assets.mapInPandas(run, PROBE_SCHEMA)


def synth_mp3(asset_id: int) -> bytes:
    """Deterministic MPEG-1 Layer III CBR stream: 3 + id%5 frames,
    bitrate index 1 + id%14, sample-rate index id%3, mono for even
    ids — every probed field is closed-form in the id."""
    n_frames = 3 + asset_id % 5
    br_idx = 1 + asset_id % 14
    sr_idx = asset_id % 3
    mode = 3 if asset_id % 2 == 0 else 0   # mono / stereo
    bitrate = _BITRATE_V1[3][br_idx] * 1000
    samplerate = _SAMPLERATE[3][sr_idx]
    frame_len = 144 * bitrate // samplerate  # padding bit 0
    header = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
        | (br_idx << 12) | (sr_idx << 10) | (mode << 6)
    frame = struct.pack(">I", header) + bytes(
        (asset_id * 17 + i) % 256 for i in range(frame_len - 4))
    # leading ID3v2 tag (8-byte body) + trailing ID3v1 tag, both walked
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 8]) + b"\x00" * 8
    id3v1 = b"TAG" + bytes(125)
    return id3v2 + frame * n_frames + id3v1


def synth_mp4(asset_id: int) -> bytes:
    """Deterministic minimal MP4: ftyp + moov(mvhd + video trak) —
    duration/timescale/dims closed-form in the id."""
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    timescale = 1000 * (1 + asset_id % 4)
    duration = (10 + asset_id) * timescale // 2   # exact halves: ms is integral
    w, hgt = 160 + 16 * (asset_id % 8), 90 + 9 * (asset_id % 8)
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = box(b"mvhd", bytes(4) + bytes(8)
               + struct.pack(">II", timescale, duration) + bytes(80))
    tkhd = box(b"tkhd", bytes(4) + bytes(20) + bytes(8) + bytes(8) + bytes(36)
               + struct.pack(">II", w << 16, hgt << 16))
    hdlr = box(b"hdlr", bytes(8) + b"vide" + bytes(12))
    mdia = box(b"mdia", hdlr)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov
