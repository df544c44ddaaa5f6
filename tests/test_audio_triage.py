"""Compressed-audio triage tests over hand-built MP3/Ogg/FLAC headers
— every fixture byte constructed in the test, pinning the bit-field
arithmetic exactly."""

from __future__ import annotations

import struct

import pytest

from wrf_to_geodataframe_spark.sources.audio_triage import (
    flac_info,
    mp3_info,
    ogg_info,
)


def _mp3_header(ver=3, layer_bits=1, br_idx=9, sr_idx=0, mode=1) -> int:
    # ver 3 = MPEG1; layer_bits 1 = Layer III; br_idx 9 @ L3/V1 = 128k
    return (0x7FF << 21) | (ver << 19) | (layer_bits << 17) | (1 << 16) \
        | (br_idx << 12) | (sr_idx << 10) | (mode << 6)


def test_mp3_basic_and_id3_skip():
    frame = struct.pack(">I", _mp3_header()) + bytes(414)
    blob = frame * 10
    info = mp3_info(blob)
    assert (info["version"], info["layer"]) == ("v1", 3)
    assert (info["bitrate"], info["sample_rate"]) == (128_000, 44_100)
    assert info["channels"] == 2
    # 4180 bytes at 128 kbps -> 261 ms
    assert info["duration_ms"] == len(blob) * 8 * 1000 // 128_000
    # ID3v2 with syncsafe size 0x0203 = 259 bytes of tag
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0x02, 0x03]) + bytes(259)
    assert mp3_info(id3 + blob)["bitrate"] == 128_000
    # mono mode
    mono = struct.pack(">I", _mp3_header(mode=3)) + bytes(414)
    assert mp3_info(mono)["channels"] == 1


def test_mp3_rejections():
    with pytest.raises(ValueError, match="no frame sync"):
        mp3_info(b"\x00" * 64)
    with pytest.raises(ValueError, match="free/reserved"):
        mp3_info(struct.pack(">I", _mp3_header(br_idx=15)))


def _ogg_page(body: bytes, htype=0, granule=0, seq=0) -> bytes:
    segs = []
    n = len(body)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    return (b"OggS\x00" + bytes([htype])
            + struct.pack("<q", granule) + struct.pack("<I", 7)
            + struct.pack("<I", seq) + struct.pack("<I", 0)
            + bytes([len(segs)]) + bytes(segs) + body)


def test_ogg_vorbis_and_opus():
    vid = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
           + struct.pack("<I", 44_100) + bytes(11))
    blob = (_ogg_page(vid, htype=0x02)
            + _ogg_page(b"\x05vorbisdata", granule=88_200)
            + _ogg_page(b"x", htype=0x04, granule=441_000))
    info = ogg_info(blob)
    assert info["codec"] == "vorbis"
    assert (info["channels"], info["sample_rate"]) == (2, 44_100)
    assert info["duration_ms"] == 10_000  # 441000 samples @ 44.1k
    oid = (b"OpusHead\x01" + bytes([1]) + struct.pack("<H", 312)
           + struct.pack("<I", 48_000) + bytes(3))
    blob = (_ogg_page(oid, htype=0x02)
            + _ogg_page(b"d", htype=0x04, granule=96_000))
    info = ogg_info(blob)
    assert info["codec"] == "opus"
    assert (info["channels"], info["duration_ms"]) == (1, 2_000)


def test_ogg_rejections():
    with pytest.raises(ValueError, match="not an Ogg"):
        ogg_info(b"RIFF" * 8)
    page = _ogg_page(b"\x01vorbis" + bytes(20), htype=0x02)
    with pytest.raises(ValueError, match="truncated"):
        ogg_info(page[:-3])
    with pytest.raises(ValueError, match="not BOS"):
        ogg_info(_ogg_page(b"\x01vorbis" + bytes(20), htype=0))


def test_flac_streaminfo():
    # 44100 Hz, 2 ch, 16 bit, 132300 samples (3 s)
    rate, ch, bits, total = 44_100, 2, 16, 132_300
    si = bytearray(34)
    si[10] = rate >> 12
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0xF) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4)
    si[13] = (((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    si[14:18] = struct.pack(">I", total & 0xFFFFFFFF)
    blob = b"fLaC" + bytes([0x80]) + b"\x00\x00\x22" + bytes(si)
    info = flac_info(blob)
    assert info == {
        "sample_rate": rate, "channels": ch, "bits": bits,
        "total_samples": total, "duration_ms": 3_000,
    }
    with pytest.raises(ValueError, match="not a FLAC"):
        flac_info(b"OggS" + bytes(40))
    with pytest.raises(ValueError, match="STREAMINFO"):
        flac_info(b"fLaC" + bytes([0x84]) + b"\x00\x00\x22" + bytes(34))
