"""Video-container triage tests over hand-built MP4 (ISOBMFF) and
Matroska/WebM (EBML) streams — every byte of the fixtures is
constructed in the test, so the walkers' offset arithmetic is pinned
exactly."""

from __future__ import annotations

import struct

import pytest

from wrf_to_geodataframe_spark.sources.video import mkv_info, mp4_info


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(version: int, body: bytes) -> bytes:
    return bytes([version, 0, 0, 0]) + body


def _mp4(duration=90_000, ts=1_000, w=640, h=360, codec=b"avc1",
         mvhd_v=0) -> bytes:
    if mvhd_v == 1:
        mvhd = _full(1, struct.pack(">QQIQ", 0, 0, ts, duration)
                     + bytes(80))
    else:
        mvhd = _full(0, struct.pack(">IIII", 0, 0, ts, duration)
                     + bytes(76))
    tkhd = _full(0, bytes(72) + struct.pack(">II", w << 16, h << 16))
    entry = struct.pack(">I", 86) + codec + bytes(78)
    stsd = _full(0, struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", _box(b"stsd", stsd))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", _box(b"tkhd", tkhd) + mdia)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    return _box(b"ftyp", b"isom" + bytes(8)) + moov


def test_mp4_info_v0_and_v1():
    info = mp4_info(_mp4())
    assert info["brand"] == "isom"
    assert info["duration_ms"] == 90_000  # 90000 ticks / 1000 Hz
    assert info["tracks"] == [
        {"width": 640, "height": 360, "codec": "avc1"}
    ]
    info = mp4_info(_mp4(duration=48_000, ts=24_000, w=1920, h=1080,
                         codec=b"hvc1", mvhd_v=1))
    assert info["duration_ms"] == 2_000
    assert info["tracks"][0] == {
        "width": 1920, "height": 1080, "codec": "hvc1",
    }


def test_mp4_largesize_box():
    b = _mp4()
    # rewrap moov as a size==1 (64-bit largesize) box
    i = b.find(b"moov") - 4
    size = struct.unpack(">I", b[i:i + 4])[0]
    big = (b[:i] + struct.pack(">I", 1) + b"moov"
           + struct.pack(">Q", size + 8) + b[i + 8:])
    assert mp4_info(big)["duration_ms"] == 90_000


def test_mp4_rejections():
    with pytest.raises(ValueError, match="no ftyp"):
        mp4_info(b"\x00" * 32)
    with pytest.raises(ValueError, match="no moov"):
        mp4_info(_box(b"ftyp", b"isom" + bytes(8)))
    bad = bytearray(_mp4())
    i = bad.find(b"moov") - 4
    bad[i:i + 4] = struct.pack(">I", 7)  # size < 8
    with pytest.raises(ValueError, match="bad box size"):
        mp4_info(bytes(bad))


def _ebml_id(v: int) -> bytes:
    n = (v.bit_length() + 7) // 8
    return v.to_bytes(n, "big")


def _ebml_size(n: int) -> bytes:
    # 1-byte form when it fits, else 2-byte
    if n < 0x7F:
        return bytes([0x80 | n])
    assert n < 0x3FFF
    return bytes([0x40 | (n >> 8), n & 0xFF])


def _el(eid: int, body: bytes) -> bytes:
    return _ebml_id(eid) + _ebml_size(len(body)) + body


def _mkv(doctype=b"webm", scale=1_000_000, dur=2_500.0,
         w=1280, h=720, codec=b"V_VP9") -> bytes:
    header = _el(0x1A45DFA3, _el(0x4282, doctype))
    info = _el(0x1549A966,
               _el(0x2AD7B1, scale.to_bytes(4, "big"))
               + _el(0x4489, struct.pack(">d", dur)))
    video = _el(0xE0, _el(0xB0, w.to_bytes(2, "big"))
                + _el(0xBA, h.to_bytes(2, "big")))
    track = _el(0xAE, _el(0x83, b"\x01") + _el(0x86, codec) + video)
    audio_trk = _el(0xAE, _el(0x83, b"\x02") + _el(0x86, b"A_OPUS"))
    tracks = _el(0x1654AE6B, track + audio_trk)
    segment = _el(0x18538067, info + tracks)
    return header + segment


def test_mkv_info():
    info = mkv_info(_mkv())
    assert info["doctype"] == "webm"
    assert info["duration_ms"] == 2_500  # 2500 ticks * 1ms/tick
    assert info["tracks"] == [
        {"type": "video", "codec": "V_VP9", "width": 1280, "height": 720},
        {"type": "audio", "codec": "A_OPUS", "width": None, "height": None},
    ]


def test_mkv_float32_duration_and_scale():
    header = _el(0x1A45DFA3, _el(0x4282, b"matroska"))
    info = _el(0x1549A966,
               _el(0x2AD7B1, (500_000).to_bytes(4, "big"))
               + _el(0x4489, struct.pack(">f", 1000.0)))
    seg = _el(0x18538067, info)
    out = mkv_info(header + seg)
    assert out["doctype"] == "matroska"
    assert out["duration_ms"] == 500  # 1000 ticks * 0.5ms


def test_mkv_rejections():
    with pytest.raises(ValueError, match="not an EBML"):
        mkv_info(b"RIFF....")
    trunc = _mkv()[:-3]
    with pytest.raises(ValueError, match="truncated|overruns"):
        mkv_info(trunc)
