"""Unit goldens for the pure-stdlib PNG codec (sources/png.py): byte-
exact round-trips across every filter type and supported color type,
spec-subset rejections, and corruption detection — the decode kernel the
multimodal suite rows run inside Arrow batches."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from wrf_to_geodataframe_spark.sources.png import decode_png, encode_png


def _pixels(n: int, seed: str = "px") -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"{seed}:{i}".encode()).digest()
        i += 1
    return out[:n]


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_round_trip_each_filter_type(ftype):
    w, h = 19, 23  # odd sizes so no stride is a block multiple
    px = _pixels(w * h, f"f{ftype}")
    data = encode_png(px, w, h, 1, ftype)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert decode_png(data) == (w, h, 1, px)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_round_trip_each_color_type(channels):
    w, h = 17, 11
    px = _pixels(w * h * channels, f"c{channels}")
    data = encode_png(px, w, h, channels, lambda y: y % 5)
    assert decode_png(data) == (w, h, channels, px)


def test_cycling_filters_round_trip_1xN_and_Nx1():
    # bpp-edge geometry: single-column images make a[i-bpp] out of range
    # for every pixel; single-row images make prev all zeros throughout
    for w, h in [(1, 40), (40, 1), (1, 1), (2, 2)]:
        px = _pixels(w * h * 3, f"{w}x{h}")
        assert decode_png(encode_png(px, w, h, 3, lambda y: y % 5)) == (
            w,
            h,
            3,
            px,
        )


def test_constant_and_gradient_images_compress_and_round_trip():
    w, h = 32, 32
    flat = bytes([200]) * (w * h)
    grad = bytes([(x + y) % 256 for y in range(h) for x in range(w)])
    for px in (flat, grad):
        data = encode_png(px, w, h, 1, lambda y: y % 5)
        assert len(data) < len(px)  # filters + deflate actually compress
        assert decode_png(data)[3] == px


def test_multiple_idat_chunks_concatenate():
    w, h = 8, 8
    px = _pixels(w * h)
    data = bytearray(encode_png(px, w, h, 1, 0))
    # split the single IDAT into two by re-chunking its payload
    pos = 8

    def _read_chunk(buf, p):
        (length,) = struct.unpack(">I", buf[p : p + 4])
        return buf[p + 4 : p + 8], bytes(buf[p + 8 : p + 8 + length]), p + 12 + length

    out = bytes(data[:8])
    p = 8
    while p < len(data):
        tag, payload, nxt = _read_chunk(data, p)
        if tag == b"IDAT":
            half = len(payload) // 2
            for part in (payload[:half], payload[half:]):
                out += (
                    struct.pack(">I", len(part))
                    + b"IDAT"
                    + part
                    + struct.pack(">I", zlib.crc32(b"IDAT" + part) & 0xFFFFFFFF)
                )
        else:
            out += bytes(data[p:nxt])
        p = nxt
    assert decode_png(out) == (w, h, 1, px)


def test_crc_corruption_detected():
    data = bytearray(encode_png(_pixels(64), 8, 8, 1, 0))
    data[40] ^= 0xFF  # flip a byte inside IDAT payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_bad_signature_and_truncation_rejected():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x00" * 16)
    ok = encode_png(_pixels(64), 8, 8, 1, 0)
    with pytest.raises(ValueError):
        decode_png(ok[:20])


def test_unsupported_spec_corners_named():
    # spec-invalid depth/type combination: 16-bit palette
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(blob)
    # unknown interlace method (2)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 2)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="interlace"):
        decode_png(blob)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_round_trip_expands_to_rgb(depth):
    """Color type 3 at every allowed depth: indices (filter-cycled,
    bit-packed below depth 8) expand through PLTE to RGB."""
    w, h = 13, 9
    n_colors = min(1 << depth, 7)
    palette = [
        tuple(hashlib.md5(f"pal{k}".encode()).digest()[:3])
        for k in range(n_colors)
    ]
    idx = bytes(b % n_colors for b in _pixels(w * h, f"pi{depth}"))
    data = encode_png(
        idx, w, h, 1, lambda y: y % 5, bit_depth=depth, palette=palette
    )
    gw, gh, gc, px = decode_png(data)
    assert (gw, gh, gc) == (w, h, 3)
    exp = b"".join(bytes(palette[k]) for k in idx)
    assert px == exp


def test_palette_trns_adds_alpha():
    w, h = 8, 5
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    trns = bytes([10, 200])  # entry 2 defaults to opaque
    idx = bytes(b % 3 for b in _pixels(w * h, "pa"))
    gw, gh, gc, px = decode_png(
        encode_png(idx, w, h, 1, 1, palette=palette, trns=trns)
    )
    assert (gw, gh, gc) == (w, h, 4)
    exp = b"".join(
        bytes(palette[k]) + bytes([trns[k] if k < 2 else 255]) for k in idx
    )
    assert px == exp


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_16bit_round_trip_takes_high_byte(channels):
    w, h = 11, 7
    px16 = _pixels(w * h * channels * 2, f"s16c{channels}")
    gw, gh, gc, px = decode_png(
        encode_png(px16, w, h, channels, lambda y: y % 5, bit_depth=16)
    )
    assert (gw, gh, gc) == (w, h, channels)
    assert px == px16[0::2]  # spec 16->8 scaling == high byte


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub_byte_gray_round_trip_scales(depth):
    w, h = 21, 6  # width not a multiple of pixels-per-byte
    mx = (1 << depth) - 1
    vals = bytes(b % (mx + 1) for b in _pixels(w * h, f"g{depth}"))
    gw, gh, gc, px = decode_png(
        encode_png(vals, w, h, 1, lambda y: y % 5, bit_depth=depth)
    )
    assert (gw, gh, gc) == (w, h, 1)
    assert px == bytes(v * 255 // mx for v in vals)


def test_gray_trns_transparent_color_adds_alpha():
    w, h = 6, 4
    px = bytes([0, 50, 100, 50] * 6)
    data = bytearray(encode_png(px, w, h, 1, 0))
    # splice a tRNS chunk (gray key = 50) before IDAT
    trns = struct.pack(">H", 50)
    chunk = (
        struct.pack(">I", 2)
        + b"tRNS"
        + trns
        + struct.pack(">I", zlib.crc32(b"tRNS" + trns) & 0xFFFFFFFF)
    )
    ihdr_end = 8 + 12 + 13
    blob = bytes(data[:ihdr_end]) + chunk + bytes(data[ihdr_end:])
    gw, gh, gc, out = decode_png(blob)
    assert (gw, gh, gc) == (w, h, 2)
    assert out[0::2] == px
    assert all(
        a == (0 if v == 50 else 255) for v, a in zip(px, out[1::2])
    )


def test_encoder_validates_buffer_size():
    with pytest.raises(ValueError, match="bytes"):
        encode_png(b"\x00" * 10, 4, 4, 1)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        channels=st.sampled_from([1, 2, 3, 4]),
        ftype=st.integers(0, 4),
        seed=st.integers(0, 2**31),
    )
    def test_round_trip_property(w, h, channels, ftype, seed):
        """Any geometry x channels x filter round-trips byte-exactly."""
        px = _pixels(w * h * channels, f"{seed}")
        assert decode_png(encode_png(px, w, h, channels, ftype)) == (
            w,
            h,
            channels,
            px,
        )

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_adam7_interlace_round_trip(channels):
    """Adam7: 7 independently-filtered passes must reassemble to the
    exact source pixels, with filters cycling across pass rows."""
    for w, h in [(19, 23), (8, 8), (7, 5), (1, 9), (9, 1), (2, 2), (1, 1)]:
        px = _pixels(w * h * channels, f"a7-{w}x{h}x{channels}")
        data = encode_png(px, w, h, channels, lambda y: y % 5, interlace=True)
        assert decode_png(data) == (w, h, channels, px)
        # and the interlaced bytes differ from the sequential encoding
        # for multi-pixel images (sanity: interlace actually happened)
        if w * h > 1:
            assert data != encode_png(px, w, h, channels, lambda y: y % 5)


def test_adam7_interlace_palette_and_16bit():
    w, h = 13, 11
    palette = [
        tuple(hashlib.md5(f"ap{k}".encode()).digest()[:3]) for k in range(5)
    ]
    idx = bytes(b % 5 for b in _pixels(w * h, "a7p"))
    gw, gh, gc, px = decode_png(
        encode_png(idx, w, h, 1, 2, palette=palette, interlace=True)
    )
    assert (gw, gh, gc) == (w, h, 3)
    assert px == b"".join(bytes(palette[k]) for k in idx)
    px16 = _pixels(w * h * 2, "a716")
    assert decode_png(
        encode_png(px16, w, h, 1, lambda y: y % 5, bit_depth=16, interlace=True)
    ) == (w, h, 1, px16[0::2])


def test_adam7_truncated_pass_rejected():
    px = _pixels(16 * 16)
    data = bytearray(encode_png(px, 16, 16, 1, 0, interlace=True))
    # re-deflate a truncated raw stream under the original chunk framing
    pos = 8
    while bytes(data[pos + 4 : pos + 8]) != b"IDAT":
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 12 + ln
    (ln,) = struct.unpack(">I", data[pos : pos + 4])
    raw = zlib.decompress(bytes(data[pos + 8 : pos + 8 + ln]))
    bad = zlib.compress(raw[:-3], 9)
    chunk = (
        struct.pack(">I", len(bad))
        + b"IDAT"
        + bad
        + struct.pack(">I", zlib.crc32(b"IDAT" + bad) & 0xFFFFFFFF)
    )
    blob = bytes(data[:pos]) + chunk + bytes(data[pos + 12 + ln :])
    with pytest.raises(ValueError, match="interlace|truncated"):
        decode_png(blob)


def test_adam7_interlace_sub_byte_depth():
    """Interlaced 4-bit grayscale: per-pass bit packing at odd pass
    widths must round-trip with full 8-bit scaling."""
    w, h = 21, 13
    vals = bytes(b % 16 for b in _pixels(w * h, "a74"))
    gw, gh, gc, px = decode_png(
        encode_png(vals, w, h, 1, lambda y: y % 5, bit_depth=4, interlace=True)
    )
    assert (gw, gh, gc) == (w, h, 1)
    assert px == bytes(v * 255 // 15 for v in vals)


def test_hypothesis_round_trip_fuzz():
    """Property: any pixel buffer round-trips at any channel count /
    filter choice / interlace setting (VERDICT r6 #8: extend the
    GIF/TIFF fuzz discipline to PNG)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 20), st.integers(1, 14), st.sampled_from([1, 2, 3, 4]),
        st.sampled_from([0, 1, 2, 3, 4, "cycle"]), st.booleans(),
        st.randoms(use_true_random=False),
    )
    def prop(w, h, ch, flt, interlace, rnd):
        px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
        if flt == "cycle":
            flt = lambda y: y % 5  # noqa: E731
        b = encode_png(px, w, h, ch, filter_type=flt, interlace=interlace)
        assert decode_png(b) == (w, h, ch, px)

    prop()


def test_hypothesis_palette_and_depth_fuzz():
    """Property: palette images at every packing depth and 16-bit
    grayscale round-trip."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(1, 17), st.integers(1, 9),
        st.sampled_from([1, 2, 4, 8]), st.booleans(),
        st.randoms(use_true_random=False),
    )
    def prop(w, h, depth, interlace, rnd):
        ncol = min(2 ** depth, 7)
        pal = [tuple(rnd.randrange(256) for _ in range(3)) for _ in range(ncol)]
        idx = bytes(rnd.randrange(ncol) for _ in range(w * h))
        b = encode_png(idx, w, h, 1, bit_depth=depth, palette=pal,
                       interlace=interlace)
        dw, dh, dch, out = decode_png(b)
        want = b"".join(bytes(pal[i]) for i in idx)
        assert (dw, dh, dch, out) == (w, h, 3, want)

    prop()
