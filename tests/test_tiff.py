"""TIFF codec unit tests: palette/MinIsWhite/sub-byte decode paths,
PackBits + TIFF-LZW goldens, and corruption rejections (interop lives
in ``test_tiff_interop.py``)."""

from __future__ import annotations

import random
import struct

import pytest

from wrf_to_geodataframe_spark.sources.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
    tiff_info,
    tlzw_decode,
    tlzw_encode,
)


def test_packbits_spec_example():
    """The TIFF 6.0 section 9 worked example."""
    raw = bytes.fromhex("aa aa aa 80 00 2a aa aa aa aa 80 00"
                        " 2a 22 aa aa aa aa aa aa aa aa aa aa".replace(" ", ""))
    enc = bytes.fromhex("fe aa 02 80 00 2a fd aa 03 80 00 2a 22 f7 aa"
                        .replace(" ", ""))
    assert packbits_decode(enc, len(raw)) == raw
    # our encoder round-trips it (byte stream may differ, data must not)
    assert packbits_decode(packbits_encode(raw), len(raw)) == raw


def test_tlzw_early_change_width_boundary():
    """Low-entropy data crossing the 511/1023 table sizes exercises the
    early width change; a GIF-style late change corrupts from the
    boundary on."""
    rnd = random.Random(2)
    data = bytes(rnd.randrange(3) for _ in range(20000))
    assert tlzw_decode(tlzw_encode(data), len(data)) == data


def test_palette_tiff_expands_through_colormap():
    """Hand-built palette IFD: 16-bit colormap entries scale to 8-bit
    RGB output."""
    # build via encode_tiff then patch photometric+colormap? simpler:
    # construct a minimal palette TIFF by hand
    w, h = 4, 2
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0])
    cmap_r = [0x0000, 0x1100, 0xFF00, 0xABCD]
    cmap_g = [0x2200, 0x3300, 0x0000, 0x8000]
    cmap_b = [0x4400, 0x5500, 0x1234, 0xFFFF]
    # pad colormap to 2^8 entries (bits=8)
    n = 256
    cm = cmap_r + [0] * (n - 4) + cmap_g + [0] * (n - 4) + cmap_b + [0] * (n - 4)
    tags = []
    def tag(t, typ, cnt, val_or_off):
        tags.append(struct.pack("<HHII", t, typ, cnt, val_or_off))
    data_off = 8 + 2 + 12 * 9 + 4
    cmap_off = data_off
    strip_off = cmap_off + 2 * len(cm)
    tag(256, 4, 1, w); tag(257, 4, 1, h); tag(258, 3, 1, 8)
    tag(259, 3, 1, 1); tag(262, 3, 1, 3)  # palette photometric
    tag(273, 4, 1, strip_off); tag(277, 3, 1, 1)
    tag(279, 4, 1, len(idx)); tag(320, 3, len(cm), cmap_off)
    b = (b"II\x2a\x00" + struct.pack("<I", 8) + struct.pack("<H", 9)
         + b"".join(tags) + struct.pack("<I", 0)
         + b"".join(struct.pack("<H", v) for v in cm) + idx)
    dw, dh, dc, px = decode_tiff(b)
    assert (dw, dh, dc) == (w, h, 3)
    assert px[0:3] == bytes([0x00, 0x22, 0x44])
    assert px[6:9] == bytes([0xFF, 0x00, 0x12])
    assert px[9:12] == bytes([0xAB, 0x80, 0xFF])


def test_sub_byte_palette_expands_raw_indices():
    """4-bit palette TIFF: indices must expand through the colormap
    (ADVICE r6 — the depth!=8 branch used to return scaled grayscale
    and never reach the photometric==3 expansion)."""
    w, h = 4, 2
    # 4-bit indices 0,1,2,3 / 3,2,1,0 packed two per byte, MSB first
    strip = bytes([0x01, 0x23, 0x32, 0x10])
    cmap_r = [0x0000, 0x1100, 0xFF00, 0xABCD]
    cmap_g = [0x2200, 0x3300, 0x0000, 0x8000]
    cmap_b = [0x4400, 0x5500, 0x1234, 0xFFFF]
    n = 16  # 2^4 entries per plane
    cm = (cmap_r + [0] * (n - 4) + cmap_g + [0] * (n - 4)
          + cmap_b + [0] * (n - 4))
    tags = []

    def tag(t, typ, cnt, val_or_off):
        tags.append(struct.pack("<HHII", t, typ, cnt, val_or_off))

    data_off = 8 + 2 + 12 * 9 + 4
    cmap_off = data_off
    strip_off = cmap_off + 2 * len(cm)
    tag(256, 4, 1, w); tag(257, 4, 1, h); tag(258, 3, 1, 4)
    tag(259, 3, 1, 1); tag(262, 3, 1, 3)  # palette photometric
    tag(273, 4, 1, strip_off); tag(277, 3, 1, 1)
    tag(279, 4, 1, len(strip)); tag(320, 3, len(cm), cmap_off)
    b = (b"II\x2a\x00" + struct.pack("<I", 8) + struct.pack("<H", 9)
         + b"".join(tags) + struct.pack("<I", 0)
         + b"".join(struct.pack("<H", v) for v in cm) + strip)
    dw, dh, dc, px = decode_tiff(b)
    assert (dw, dh, dc) == (w, h, 3)
    assert px[0:3] == bytes([0x00, 0x22, 0x44])    # index 0
    assert px[3:6] == bytes([0x11, 0x33, 0x55])    # index 1
    assert px[6:9] == bytes([0xFF, 0x00, 0x12])    # index 2
    assert px[9:12] == bytes([0xAB, 0x80, 0xFF])   # index 3
    assert px[12:15] == px[9:12]                   # row 2 reversed
    assert px[21:24] == px[0:3]


def test_min_is_white_inverts():
    w, h = 3, 1
    b = bytearray(encode_tiff(bytes([0, 128, 255]), w, h, 1))
    # flip photometric 1 -> 0 (MinIsWhite); tag 262 short value
    i = b.find(struct.pack("<HHI", 262, 3, 1))
    assert i > 0
    b[i + 8] = 0
    _, _, _, px = decode_tiff(bytes(b))
    assert px == bytes([255, 127, 0])


def test_one_bit_bilevel():
    """1-bit grayscale packs 8 pixels per byte, MSB first."""
    w, h = 10, 1
    tags = []
    def tag(t, typ, cnt, val):
        tags.append(struct.pack("<HHII", t, typ, cnt, val))
    strip = bytes([0b10110001, 0b01000000])
    strip_off = 8 + 2 + 12 * 8 + 4
    tag(256, 4, 1, w); tag(257, 4, 1, h); tag(258, 3, 1, 1)
    tag(259, 3, 1, 1); tag(262, 3, 1, 1)
    tag(273, 4, 1, strip_off); tag(277, 3, 1, 1); tag(279, 4, 1, 2)
    b = (b"II\x2a\x00" + struct.pack("<I", 8) + struct.pack("<H", 8)
         + b"".join(tags) + struct.pack("<I", 0) + strip)
    dw, dh, dc, px = decode_tiff(b)
    assert (dw, dh, dc) == (w, h, 1)
    assert px == bytes(255 * v for v in [1, 0, 1, 1, 0, 0, 0, 1, 0, 1])


def test_info_and_rejections():
    b = encode_tiff(bytes(12), 2, 2, 3, compression=5)
    info = tiff_info(b)
    assert (info["width"], info["height"], info["compression"]) == (2, 2, 5)
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"PK\x03\x04" + b[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_tiff(b[:20])
    big = bytearray(b)
    i = big.find(struct.pack("<HHI", 259, 3, 1))
    big[i + 8] = 99  # unknown compression id
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(big))


def test_big_endian_round_trip():
    rnd = random.Random(9)
    px = bytes(rnd.randrange(256) for _ in range(6 * 4 * 3))
    b = encode_tiff(px, 6, 4, 3, compression=8, predictor=2,
                    big_endian=True)
    assert b[:2] == b"MM"
    assert decode_tiff(b) == (6, 4, 3, px)


def test_hypothesis_round_trip_fuzz():
    """Property: any 8-bit buffer round-trips under any supported
    compression/predictor/strip/byte-order combination."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 20), st.integers(1, 12),
        st.sampled_from([1, 3, 4]),
        st.sampled_from([1, 5, 8, 32773]),
        st.booleans(), st.integers(0, 5), st.booleans(),
        st.randoms(use_true_random=False),
    )
    def prop(w, h, ch, comp, pred2, rps, be, rnd):
        pred = 2 if (pred2 and comp in (5, 8)) else 1
        px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
        b = encode_tiff(px, w, h, ch, comp, pred, rps, be)
        assert decode_tiff(b) == (w, h, ch, px)

    prop()
