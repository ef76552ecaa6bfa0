"""Structural media probe tests: MP3 frame walking (ISO 11172-3
headers, ID3 tags, padding, VBR) and MP4 box walking (14496-12 —
version-1 boxes, largesize, size-0, depth/zero-timescale hostility),
plus the Spark mapInPandas path's NULL-on-hostile contract."""

import struct

import pytest

from html_parser_spark.operators.mediaprobe import (
    _BITRATE_V1, _SAMPLERATE, probe_media, probe_mp3, probe_mp4,
    synth_mp3, synth_mp4,
)
from html_parser_spark.operators.multimodal import ASSET_SCHEMA


def _mp3_header(version=3, layer_bits=1, br_idx=9, sr_idx=0, padding=0,
                mode=3) -> int:
    return ((0x7FF << 21) | (version << 19) | (layer_bits << 17) | (1 << 16)
            | (br_idx << 12) | (sr_idx << 10) | (padding << 9) | (mode << 6))


def _mp3_frame(br_idx=9, sr_idx=0, padding=0, mode=3) -> bytes:
    bitrate = _BITRATE_V1[3][br_idx] * 1000
    sr = _SAMPLERATE[3][sr_idx]
    frame_len = 144 * bitrate // sr + padding
    return struct.pack(">I", _mp3_header(
        br_idx=br_idx, sr_idx=sr_idx, padding=padding, mode=mode,
    )) + bytes(frame_len - 4)


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


class TestMp3:
    def test_synth_roundtrip_closed_form(self):
        for i in range(20):
            meta = probe_mp3(synth_mp3(i))
            sr = _SAMPLERATE[3][i % 3]
            nf = 3 + i % 5
            assert meta["container"] == "mp3"
            assert meta["n_units"] == nf
            assert meta["sample_rate"] == sr
            assert meta["channels"] == (1 if i % 2 == 0 else 2)
            assert meta["bit_rate_kbps"] == _BITRATE_V1[3][1 + i % 14]
            assert meta["duration_ms"] == nf * 1152 * 1000 // sr
            assert meta["is_cbr"] is True
            assert meta["width"] is None and meta["height"] is None

    def test_padding_bit_lengthens_frame(self):
        # 44100 Hz Layer III: padded frames are one byte longer; a walk
        # that ignored the bit would desync on the very next header
        meta = probe_mp3(_mp3_frame(padding=1) + _mp3_frame(padding=0))
        assert meta["n_units"] == 2
        assert meta["is_cbr"] is True

    def test_vbr_classified_and_averaged(self):
        meta = probe_mp3(_mp3_frame(br_idx=5) + _mp3_frame(br_idx=9))
        assert meta["is_cbr"] is False
        b5, b9 = _BITRATE_V1[3][5] * 1000, _BITRATE_V1[3][9] * 1000
        assert meta["bit_rate_kbps"] == (b5 + b9) // 2 // 1000

    def test_id3v2_and_id3v1_skipped(self):
        frame = _mp3_frame()
        id3v2 = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 20]) + bytes(20)
        assert probe_mp3(id3v2 + frame + b"TAG" + bytes(125))["n_units"] == 1

    def test_non_syncsafe_id3_size_rejected(self):
        with pytest.raises(ValueError, match="syncsafe"):
            probe_mp3(b"ID3\x03\x00\x00" + bytes([0, 0, 0x80, 0]) + bytes(200))

    @pytest.mark.parametrize("mutate, msg", [
        (lambda f: b"\x00" + f, "bad MPEG sync"),
        (lambda f: struct.pack(">I", _mp3_header(version=1)) + f[4:],
         "reserved MPEG version"),
        (lambda f: struct.pack(">I", _mp3_header(br_idx=0)) + f[4:],
         "free-format"),
        (lambda f: struct.pack(">I", _mp3_header(br_idx=15)) + f[4:],
         "free-format"),
        (lambda f: struct.pack(">I", _mp3_header(sr_idx=3)) + f[4:],
         "reserved sample-rate"),
        (lambda f: f[:-1], "truncated MPEG frame body"),
        (lambda f: b"", "no MPEG frames"),
    ])
    def test_hostile_rejected(self, mutate, msg):
        with pytest.raises(ValueError, match=msg):
            probe_mp3(mutate(_mp3_frame()))

    def test_samplerate_change_rejected(self):
        with pytest.raises(ValueError, match="sample-rate change"):
            probe_mp3(_mp3_frame(sr_idx=0) + _mp3_frame(sr_idx=1))

    def test_truncation_sweep_never_hangs_or_lies(self):
        full = synth_mp3(7)
        for cut in range(len(full)):
            try:
                meta = probe_mp3(full[:cut])
            except ValueError:
                continue
            # a boundary-aligned prefix is a shorter valid stream
            assert 1 <= meta["n_units"] <= 8


class TestMp4:
    def test_synth_roundtrip_closed_form(self):
        for i in range(20):
            meta = probe_mp4(synth_mp4(i))
            assert meta["container"] == "mp4"
            assert meta["n_units"] == 1
            assert meta["duration_ms"] == (10 + i) * 500
            assert meta["sample_rate"] == 1000 * (1 + i % 4)
            assert meta["width"] == 160 + 16 * (i % 8)
            assert meta["height"] == 90 + 9 * (i % 8)
            assert meta["channels"] is None

    def test_version1_mvhd_and_tkhd(self):
        mvhd = _box(b"mvhd", b"\x01" + bytes(3) + bytes(16)
                    + struct.pack(">IQ", 600, 1200) + bytes(80))
        tkhd = _box(b"tkhd", b"\x01" + bytes(3) + bytes(32) + bytes(8)
                    + bytes(8) + bytes(36)
                    + struct.pack(">II", 320 << 16, 240 << 16))
        payload = (_box(b"ftyp", b"isom" + bytes(8))
                   + _box(b"moov", mvhd + _box(b"trak", tkhd)))
        meta = probe_mp4(payload)
        assert meta["duration_ms"] == 2000
        assert (meta["width"], meta["height"]) == (320, 240)

    def test_soun_handler_counted_as_channel(self):
        base = synth_mp4(3)
        hdlr = _box(b"hdlr", bytes(8) + b"soun" + bytes(12))
        tkhd = _box(b"tkhd", bytes(4) + bytes(20) + bytes(8) + bytes(8)
                    + bytes(36) + struct.pack(">II", 0, 0))  # no dims: audio
        trak = _box(b"trak", tkhd + _box(b"mdia", hdlr))
        # splice an audio trak into moov: rebuild moov with a larger size
        moov_off = len(_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2"))
        moov_size = struct.unpack_from(">I", base, moov_off)[0]
        new_moov = struct.pack(">I", moov_size + len(trak)) \
            + base[moov_off + 4:moov_off + moov_size] + trak
        meta = probe_mp4(base[:moov_off] + new_moov)
        assert meta["channels"] == 1
        assert meta["n_units"] == 2

    def test_largesize_and_size0_boxes(self):
        free_body = bytes(16)
        large = struct.pack(">I", 1) + b"free" \
            + struct.pack(">Q", 16 + len(free_body)) + free_body
        tail0 = struct.pack(">I", 0) + b"skip" + bytes(5)  # runs to EOF
        base = synth_mp4(0)
        meta = probe_mp4(base + large + tail0)
        assert meta["duration_ms"] == probe_mp4(base)["duration_ms"]

    @pytest.mark.parametrize("payload, msg", [
        (b"\x00" * 16, "no ftyp"),
        (_box(b"ftyp", b"isom") + struct.pack(">I", 999) + b"moov",
         "out of bounds"),
        (_box(b"ftyp", b"isom") + struct.pack(">I", 1) + b"free" + bytes(4),
         "truncated MP4 largesize"),
        (_box(b"ftyp", b"isom") + struct.pack(">I", 4) + b"moov",
         "out of bounds"),  # size smaller than its own header
        (_box(b"ftyp", b"isom"), "missing moov/mvhd"),
    ])
    def test_hostile_rejected(self, payload, msg):
        with pytest.raises(ValueError, match=msg):
            probe_mp4(payload)

    def test_zero_timescale_rejected(self):
        mvhd = _box(b"mvhd", bytes(4) + bytes(8)
                    + struct.pack(">II", 0, 100) + bytes(80))
        payload = _box(b"ftyp", b"isom") + _box(b"moov", mvhd)
        with pytest.raises(ValueError, match="timescale is zero"):
            probe_mp4(payload)

    def test_nesting_bomb_rejected(self):
        inner = _box(b"trak", b"")
        for _ in range(10):
            inner = _box(b"trak", inner)
        with pytest.raises(ValueError, match="nesting too deep"):
            probe_mp4(_box(b"ftyp", b"isom") + inner)

    def test_truncation_sweep_never_hangs(self):
        full = synth_mp4(5)
        for cut in range(len(full)):
            try:
                probe_mp4(full[:cut])
            except ValueError:
                pass


class TestSparkPath:
    def test_mixed_batch_with_hostiles(self, spark):
        rows = [
            (0, "audio", bytearray(synth_mp3(0)), {}),
            (1, "video", bytearray(synth_mp4(1)), {}),
            (2, "audio", bytearray(b"\xff\xfb garbage not frames"), {}),
            (3, "video", bytearray(b"\x00\x00\x00\x08ftyp"), {}),
            (4, "audio", None, {}),
            (5, "other", bytearray(b"plain text"), {}),
        ]
        out = {r["asset_id"]: r.asDict() for r in probe_media(
            spark.createDataFrame(rows, ASSET_SCHEMA)).collect()}
        assert out[0]["container"] == "mp3"
        assert out[0]["duration_ms"] == probe_mp3(synth_mp3(0))["duration_ms"]
        assert out[1]["container"] == "mp4"
        assert out[1]["width"] == probe_mp4(synth_mp4(1))["width"]
        for hostile in (2, 3, 4, 5):
            assert out[hostile]["container"] is None
            assert out[hostile]["duration_ms"] is None
