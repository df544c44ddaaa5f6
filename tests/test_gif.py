"""GIF codec unit tests: hand-computed LZW goldens, feature
round-trips (palette sizes, interlace, transparency, table resets,
frame compositing), container triage, and corruption rejections."""

from __future__ import annotations

import random

import pytest

from wrf_to_geodataframe_spark.sources.gif import (
    decode_gif,
    encode_gif,
    gif_info,
    lzw_decode,
    lzw_encode,
)


def _expand(pal: bytes, idx: bytes) -> bytes:
    return b"".join(pal[3 * i : 3 * i + 3] for i in idx)


def test_lzw_hand_golden():
    """mcs=2 over [1,1,1,1]: codes must be CLEAR,1,6,1,EOI at width 3,
    LSB-first packed to exactly 0x8C 0x53 — pins the bit order, the
    cScSc table growth, and the final-pending-string emission."""
    assert lzw_encode(bytes([1, 1, 1, 1]), 2) == bytes([0x8C, 0x53])
    assert lzw_decode(bytes([0x8C, 0x53]), 2) == bytes([1, 1, 1, 1])


def test_lzw_cscsc_degenerate_code():
    """A stream may reference the entry being defined (code ==
    len(table)); [1,1,1] encodes to CLEAR,1,6(=prev+prev[0]),EOI."""
    enc = lzw_encode(bytes([1, 1, 1]), 2)
    assert lzw_decode(enc, 2) == bytes([1, 1, 1])


def test_lzw_width_growth_boundary():
    """All-distinct pairs force steady table growth across the 8- and
    16-entry width boundaries for mcs=2 (width 3 -> 4 -> 5)."""
    rnd = random.Random(3)
    data = bytes(rnd.randrange(4) for _ in range(4000))
    assert lzw_decode(lzw_encode(data, 2), 2) == data


def test_lzw_table_reset_at_4095():
    """256-symbol random data overflows the 12-bit table; the encoder
    must emit CLEAR and resynchronize."""
    rnd = random.Random(9)
    data = bytes(rnd.randrange(256) for _ in range(60_000))
    assert lzw_decode(lzw_encode(data, 8), 8) == data


def test_lzw_missing_leading_clear_tolerated():
    """Some encoders omit the initial CLEAR; the decoder initializes
    the table implicitly.  Width-3 code 1 then EOI: bits 100 101 ->
    byte 0b00101001 = 0x29."""
    assert lzw_decode(bytes([0x29]), 2) == bytes([1])


@pytest.mark.parametrize("ncol", [2, 5, 16, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_round_trip_palette_sizes(ncol, interlace):
    rnd = random.Random(ncol * 2 + interlace)
    w, h = 13, 11
    pal = bytes(rnd.randrange(256) for _ in range(3 * ncol))
    idx = bytes(rnd.randrange(ncol) for _ in range(w * h))
    b = encode_gif(idx, w, h, pal, interlace=interlace)
    assert decode_gif(b) == (w, h, 3, _expand(pal, idx))
    info = gif_info(b)
    assert info["n_frames"] == 1 and info["interlaced"] == interlace
    # color table padded to a power of two
    assert info["gct_colors"] in (2, 4, 8, 16, 32, 64, 128, 256)
    assert info["gct_colors"] >= ncol


def test_transparency_gives_rgba():
    pal = bytes(range(48))
    idx = bytes([0, 1, 5, 15])
    b = encode_gif(idx, 2, 2, pal, transparent=5)
    w, h, c, px = decode_gif(b)
    assert (w, h, c) == (2, 2, 4)
    # pixel 2 has the transparent index -> alpha 0; others 255
    assert [px[4 * i + 3] for i in range(4)] == [255, 255, 0, 255]
    assert px[8:11] == pal[15:18]
    assert gif_info(b)["transparent"] is True


def test_multi_frame_info_and_first_frame_decode():
    """Two image blocks spliced into one stream: info counts both
    frames; decode returns the FIRST frame only."""
    pal = bytes(range(12))
    b1 = encode_gif(bytes([0, 1, 2, 3]), 2, 2, pal)
    b2 = encode_gif(bytes([3, 2, 1, 0]), 2, 2, pal)
    # splice frame 2's image descriptor block (from 0x2C to before
    # the trailer) into stream 1
    i1 = b1.index(b"\x2c")
    i2 = b2.index(b"\x2c")
    spliced = b1[:-1] + b2[i2:]
    info = gif_info(spliced)
    assert info["n_frames"] == 2
    assert decode_gif(spliced) == decode_gif(b1)


def test_offset_frame_composites_over_background():
    """A 1x1 frame at (1,1) inside a 3x2 screen: every other pixel is
    the background index's color."""
    pal = bytes([10, 11, 12, 20, 21, 22])
    b1 = encode_gif(bytes([1]), 1, 1, pal)
    # rewrite logical screen to 3x2 and the image descriptor offset
    b = bytearray(b1)
    b[6:10] = (3).to_bytes(2, "little") + (2).to_bytes(2, "little")
    i = bytes(b).index(b"\x2c")
    b[i + 1 : i + 5] = (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
    w, h, c, px = decode_gif(bytes(b))
    assert (w, h, c) == (3, 2, 3)
    grid = [px[3 * k : 3 * k + 3] for k in range(6)]
    assert grid[4] == pal[3:6]  # (1,1)
    assert all(g == pal[0:3] for k, g in enumerate(grid) if k != 4)


def test_rejections():
    pal = bytes(range(6))
    good = encode_gif(bytes([0, 1, 1, 0]), 2, 2, pal)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(good[: len(good) - 4])
    with pytest.raises(ValueError):
        gif_info(good[:10])
    with pytest.raises(ValueError, match="palette"):
        encode_gif(bytes([2]), 1, 1, bytes(range(6)))  # index 2 of 2
    with pytest.raises(ValueError, match="indices length"):
        encode_gif(bytes([0]), 2, 2, pal)
    # no frame at all: header + trailer
    with pytest.raises(ValueError, match="no image frame"):
        decode_gif(good[: 13 + 6] + b"\x3b")
    # stream cut exactly after the GCE block-size byte must raise the
    # module's ValueError, not IndexError (ADVICE r6)
    with pytest.raises(ValueError, match="truncated"):
        gif_info(good[: 13 + 6] + b"\x21\xf9\x04")


def test_sub_block_framing_over_255_bytes():
    """Payloads longer than 255 bytes must be split into sub-blocks
    and reassembled."""
    rnd = random.Random(1)
    w, h = 64, 64
    pal = bytes(rnd.randrange(256) for _ in range(48))
    idx = bytes(rnd.randrange(16) for _ in range(w * h))
    b = encode_gif(idx, w, h, pal)
    assert decode_gif(b)[3] == _expand(pal, idx)


def test_gif87a_header_accepted():
    pal = bytes(range(6))
    b = bytearray(encode_gif(bytes([0, 1]), 2, 1, pal))
    b[3:6] = b"87a"
    assert gif_info(bytes(b))["version"] == "87a"
    assert decode_gif(bytes(b))[3] == _expand(pal, bytes([0, 1]))


def test_hypothesis_round_trip_fuzz():
    """Property: any index grid under any palette size round-trips,
    interlaced or not."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 24), st.integers(1, 18), st.integers(2, 256),
        st.booleans(), st.randoms(use_true_random=False),
    )
    def prop(w, h, ncol, interlace, rnd):
        pal = bytes(rnd.randrange(256) for _ in range(3 * ncol))
        idx = bytes(rnd.randrange(ncol) for _ in range(w * h))
        b = encode_gif(idx, w, h, pal, interlace=interlace)
        assert decode_gif(b) == (w, h, 3, _expand(pal, idx))

    prop()
