"""BMP + netpbm codec tests: round-trips across row orders, palette,
RLE8 (runs, absolute mode, escapes), padding, and rejections."""

from __future__ import annotations

import random
import struct

import pytest

from wrf_to_geodataframe_spark.sources.bmp import (
    decode_bmp,
    decode_pnm,
    encode_bmp,
    encode_pnm,
)


@pytest.mark.parametrize("w,h", [(1, 1), (5, 3), (13, 7), (16, 4)])
@pytest.mark.parametrize("top_down", [False, True])
def test_rgb_round_trip(w, h, top_down):
    rnd = random.Random(w * h + top_down)
    px = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    b = encode_bmp(px, w, h, top_down=top_down)
    assert decode_bmp(b) == (w, h, 3, px)
    # negative height encodes top-down
    hh = struct.unpack("<i", b[22:26])[0]
    assert (hh < 0) == top_down


@pytest.mark.parametrize("rle", [False, True])
def test_palette_round_trip(rle):
    rnd = random.Random(9)
    w, h = 13, 7
    pal = [tuple(rnd.randrange(256) for _ in range(3)) for _ in range(16)]
    idx = bytes(rnd.randrange(16) for _ in range(w * h))
    b = encode_bmp(idx, w, h, palette=pal, rle=rle)
    want = b"".join(bytes(pal[i]) for i in idx)
    assert decode_bmp(b) == (w, h, 3, want)


def test_rle8_absolute_mode_and_delta():
    """Hand-built RLE stream: run, absolute block (odd length => pad
    byte), delta skip (skipped pixels stay index 0), EOL, EOB."""
    pal = [(10 * i, 10 * i, 10 * i) for i in range(8)]
    # 6x2 image
    stream = bytes([
        3, 1,            # run: 1 1 1
        0, 3, 2, 3, 4, 0x00,  # absolute: 2 3 4 (+pad)
        0, 0,            # end of line
        2, 5,            # run: 5 5
        0, 2, 2, 0,      # delta: skip 2 right (stay same line)
        2, 6,            # run: 6 6 -> fills to x=6
        0, 1,            # end of bitmap
    ])
    hdr = b"BM" + struct.pack("<IHHI", 0, 0, 0, 54 + 64)
    dib = struct.pack("<IiiHHIIiiII", 40, 6, -2, 1, 8, 1,
                      len(stream), 0, 0, 16, 0)
    palb = b"".join(bytes([c[2], c[1], c[0], 0]) for c in pal) \
        + bytes(4 * 8)
    blob = hdr + dib + palb + stream
    w, h, c, px = decode_bmp(blob)
    assert (w, h, c) == (6, 2, 3)
    rows = [[px[3 * (y * 6 + x)] // 10 for x in range(6)] for y in (0, 1)]
    assert rows[0] == [1, 1, 1, 2, 3, 4]
    assert rows[1] == [5, 5, 0, 0, 6, 6]


def test_bmp_rejections():
    good = encode_bmp(bytes(12), 2, 2)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PM" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-3])
    bad = bytearray(good)
    bad[28] = 4  # bpp 4
    with pytest.raises(ValueError, match="4-bit"):
        decode_bmp(bytes(bad))


@pytest.mark.parametrize("ch", [1, 3])
def test_pnm_round_trip_and_comments(ch):
    rnd = random.Random(ch)
    px = bytes(rnd.randrange(256) for _ in range(9 * 4 * ch))
    assert decode_pnm(encode_pnm(px, 9, 4, ch)) == (9, 4, ch, px)
    b = b"P5 # c\n# c2\n 4\t2 \n255\n" + bytes(range(8))
    assert decode_pnm(b) == (4, 2, 1, bytes(range(8)))
    with pytest.raises(ValueError, match="maxval"):
        decode_pnm(b"P5\n2 2\n65535\n" + bytes(8))


def test_dispatch_includes_bmp_and_pnm(spark):
    """The mixed-format decode dispatch handles BM / P5 / P6 magics."""
    import pandas as pd

    from wrf_to_geodataframe_spark.operators.multimodal import (
        decode_images,
    )

    px = bytes(range(12))
    rows = [
        {"doc_id": 0, "png": encode_bmp(px, 2, 2)},
        {"doc_id": 1, "png": encode_pnm(px, 2, 2, 3)},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {r.doc_id: r for r in decode_images(df).collect()}
    assert bytes(got[0].pixels) == px and got[0].channels == 3
    assert bytes(got[1].pixels) == px and got[1].channels == 3


def test_hypothesis_round_trip_fuzz():
    """Property: any pixel buffer round-trips through the BMP codec —
    RGB (row padding, bottom-up and top-down) and paletted 8-bit with
    and without RLE8."""
    from hypothesis import given, settings, strategies as st

    from wrf_to_geodataframe_spark.sources.bmp import decode_bmp, encode_bmp

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(1, 23), st.integers(1, 11),
        st.sampled_from(["rgb", "pal", "rle"]), st.booleans(),
        st.randoms(use_true_random=False),
    )
    def prop(w, h, kind, top_down, rnd):
        if kind == "rgb":
            px = bytes(rnd.randrange(256) for _ in range(w * h * 3))
            blob = encode_bmp(px, w, h, 3, top_down=top_down)
            assert decode_bmp(blob) == (w, h, 3, px)
            return
        ncol = rnd.randrange(2, 17)
        pal = [tuple(rnd.randrange(256) for _ in range(3)) for _ in range(ncol)]
        if kind == "rle":
            # runs make RLE8 meaningful
            idx = bytearray()
            while len(idx) < w * h:
                idx += bytes([rnd.randrange(ncol)]) * rnd.randrange(1, 9)
            idx = bytes(idx[: w * h])
        else:
            idx = bytes(rnd.randrange(ncol) for _ in range(w * h))
        blob = encode_bmp(idx, w, h, palette=pal,
                          rle=(kind == "rle"), top_down=top_down and kind != "rle")
        want = b"".join(bytes(pal[i]) for i in idx)
        assert decode_bmp(blob) == (w, h, 3, want)

    prop()
