"""Baseline JPEG codec goldens (sources/jpeg.py): the bit-exact
constant-even-tile corner the gate row builds on, PSNR envelopes for
the lossy general path, determinism, restart markers, subsampling, and
spec-corner rejections."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from wrf_to_geodataframe_spark.sources.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255**2 / mse) if mse else float("inf")


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 2 + xx) % 256).astype(np.uint8)


def test_constant_even_tiles_round_trip_bit_exact():
    """The analytic corner: constant 8x8 blocks with EVEN values decode
    byte-identically in grayscale (DC quantization at step 16 is exact,
    every AC quantizes to zero) — the property the oracle-checked gate
    row states in closed form."""
    w, h = 24, 32
    img = np.zeros((h, w), np.uint8)
    for bi in range((w // 8) * (h // 8)):
        by, bx = divmod(bi, w // 8)
        v = hashlib.md5(f"tile{bi}".encode()).digest()[0] & 0xFE
        img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
    data = encode_jpeg(img.tobytes(), w, h, 1)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert decode_jpeg(data) == (w, h, 1, img.tobytes())


@pytest.mark.parametrize("quality,floor", [(50, 40), (75, 45), (90, 50)])
def test_grayscale_psnr_envelope(quality, floor):
    img = _gradient(64, 48)
    _, _, _, out = decode_jpeg(
        encode_jpeg(img.tobytes(), 48, 64, 1, quality=quality)
    )
    assert _psnr(img, np.frombuffer(out, np.uint8).reshape(64, 48)) >= floor


@pytest.mark.parametrize("subsample,floor", [(False, 35), (True, 30)])
def test_color_round_trip_psnr(subsample, floor):
    g = _gradient(64, 48)
    rgb = np.stack([g, 255 - g, np.roll(g, 7)], axis=-1)
    gw, gh, gc, out = decode_jpeg(
        encode_jpeg(rgb.tobytes(), 48, 64, 3, quality=75, subsample=subsample)
    )
    assert (gw, gh, gc) == (48, 64, 3)
    assert _psnr(rgb, np.frombuffer(out, np.uint8).reshape(64, 48, 3)) >= floor


def test_encode_decode_deterministic():
    img = _gradient(40, 24)
    d1 = encode_jpeg(img.tobytes(), 24, 40, 1)
    d2 = encode_jpeg(img.tobytes(), 24, 40, 1)
    assert d1 == d2
    assert decode_jpeg(d1) == decode_jpeg(d2)


def test_restart_markers_round_trip():
    img = _gradient(64, 48)
    plain = decode_jpeg(encode_jpeg(img.tobytes(), 48, 64, 1))
    with_rst = decode_jpeg(
        encode_jpeg(img.tobytes(), 48, 64, 1, restart_interval=3)
    )
    assert plain == with_rst


def test_non_multiple_of_8_dimensions():
    img = _gradient(61, 45)
    gw, gh, gc, out = decode_jpeg(
        encode_jpeg(img.tobytes(), 45, 61, 1, quality=90)
    )
    assert (gw, gh, gc) == (45, 61, 1)
    assert _psnr(img, np.frombuffer(out, np.uint8).reshape(61, 45)) >= 45


def test_rejections_name_the_feature():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" * 16)
    # SOF9/SOF10 (arithmetic) are now SUPPORTED; the remaining
    # rejections are the hierarchical modes, named in the error
    sofh = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    blob = (
        b"\xff\xd8"
        + b"\xff\xc7"
        + struct.pack(">H", len(sofh) + 2)
        + sofh
    )
    with pytest.raises(ValueError, match="SOF7"):
        decode_jpeg(blob)
    with pytest.raises(ValueError, match="channels"):
        encode_jpeg(b"\x00" * 32, 4, 4, 2)
    with pytest.raises(ValueError, match="bytes"):
        encode_jpeg(b"\x00" * 10, 4, 4, 1)


def test_all_gray_levels_stay_close():
    # a ramp touching every level: quality 90 keeps max error tiny and
    # the decoder clamps instead of wrapping at the range edges
    img = np.tile(np.arange(256, dtype=np.uint8), (8, 1))
    _, _, _, out = decode_jpeg(encode_jpeg(img.tobytes(), 256, 8, 1, quality=90))
    got = np.frombuffer(out, np.uint8).reshape(8, 256)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 6


def test_truncation_raises_cleanly_everywhere():
    """Any prefix of a valid stream must raise ValueError (never an
    IndexError leaking from the bit reader or marker parser)."""
    img = _gradient(24, 16)
    data = encode_jpeg(img.tobytes(), 16, 24, 1)
    for cut in range(2, len(data) - 1, max(1, len(data) // 60)):
        try:
            decode_jpeg(data[:cut])
        except ValueError:
            pass  # the only acceptable failure type


@pytest.mark.parametrize("channels,al", [(1, 1), (3, 1), (3, 2), (1, 0)])
def test_progressive_decodes_identically_to_baseline(channels, al):
    """Progressive (SOF2: spectral selection + successive approximation
    at precision ``al``) reconstructs the SAME quantized coefficients
    as the baseline encoding, so both streams decode to identical
    pixels — the scan-accumulation machinery (DC first/refine, AC
    first with EOB runs, the G.1.2.3 correction-bit walk) is pinned
    end-to-end."""
    from wrf_to_geodataframe_spark.sources.jpeg import (
        encode_jpeg_progressive,
    )

    g = _gradient(40, 24)
    img = g if channels == 1 else np.stack(
        [g, 255 - g, np.roll(g, 5)], axis=-1
    )
    base = decode_jpeg(encode_jpeg(img.tobytes(), 24, 40, channels))
    prog = decode_jpeg(
        encode_jpeg_progressive(img.tobytes(), 24, 40, channels, al=al)
    )
    assert base == prog


def test_progressive_noisy_odd_dims_identical():
    from wrf_to_geodataframe_spark.sources.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 29, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img.tobytes(), 29, 37, 3, quality=85))
    prog = decode_jpeg(
        encode_jpeg_progressive(img.tobytes(), 29, 37, 3, quality=85)
    )
    assert base == prog


def test_progressive_truncation_raises_cleanly():
    from wrf_to_geodataframe_spark.sources.jpeg import (
        encode_jpeg_progressive,
    )

    img = _gradient(24, 16)
    data = encode_jpeg_progressive(img.tobytes(), 16, 24, 1)
    for cut in range(2, len(data) - 1):
        try:
            decode_jpeg(data[:cut])
        except ValueError:
            pass  # the only acceptable failure type


def test_422_subsampling_round_trip():
    """4:2:2 chroma (sampling (2,1)) exercises the decoder's
    asymmetric-sampling path."""
    g = _gradient(64, 48)
    rgb = np.stack([g, 255 - g, np.roll(g, 7)], axis=-1)
    gw, gh, gc, out = decode_jpeg(
        encode_jpeg(rgb.tobytes(), 48, 64, 3, quality=75, subsample="422")
    )
    assert (gw, gh, gc) == (48, 64, 3)
    assert _psnr(rgb, np.frombuffer(out, np.uint8).reshape(64, 48, 3)) >= 31


def test_byte_corruption_never_escapes_valueerror():
    """Flipping any single byte must either still decode (corruption in
    image data can be survivable) or raise ValueError — never an
    IndexError/KeyError/infinite loop."""
    from wrf_to_geodataframe_spark.sources.jpeg import (
        encode_jpeg_progressive,
    )

    img = _gradient(24, 16)
    for data in (
        encode_jpeg(img.tobytes(), 16, 24, 1),
        encode_jpeg_progressive(img.tobytes(), 16, 24, 1),
    ):
        for i in range(2, len(data), 7):
            blob = bytearray(data)
            blob[i] ^= 0x5A
            try:
                decode_jpeg(bytes(blob))
            except ValueError:
                pass


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        bw=st.integers(1, 4),
        bh=st.integers(1, 5),
        seed=st.integers(0, 2**31),
        progressive=st.booleans(),
    )
    def test_constant_even_tiles_exact_property(bw, bh, seed, progressive):
        """Property form of the gate-row corner: ANY grid of constant
        even-valued 8x8 tiles round-trips bit-exactly through either
        encoding."""
        from wrf_to_geodataframe_spark.sources.jpeg import (
            encode_jpeg_progressive,
        )

        w, h = bw * 8, bh * 8
        img = np.zeros((h, w), np.uint8)
        for bi in range(bw * bh):
            v = hashlib.md5(f"{seed}:{bi}".encode()).digest()[0] & 0xFE
            by, bx = divmod(bi, bw)
            img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
        enc = encode_jpeg_progressive if progressive else encode_jpeg
        assert decode_jpeg(enc(img.tobytes(), w, h, 1)) == (
            w,
            h,
            1,
            img.tobytes(),
        )

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


def test_jpeg_info_header_only_triage():
    from wrf_to_geodataframe_spark.sources.jpeg import (
        encode_jpeg_progressive,
        jpeg_info,
    )

    img = _gradient(24, 16)
    rgb = np.stack([img, 255 - img, np.roll(img, 3)], axis=-1)
    i1 = jpeg_info(encode_jpeg(img.tobytes(), 16, 24, 1))
    assert i1 == {
        "width": 16, "height": 24, "channels": 1,
        "progressive": False, "subsampling": (1, 1), "orientation": None,
        "lossless": False, "precision": 8,
    }
    i2 = jpeg_info(encode_jpeg(rgb.tobytes(), 16, 24, 3, subsample=True))
    assert (i2["channels"], i2["subsampling"], i2["progressive"]) == (3, (2, 2), False)
    i3 = jpeg_info(encode_jpeg_progressive(rgb.tobytes(), 16, 24, 3))
    assert (i3["progressive"], i3["subsampling"]) == (True, (1, 1))


def test_jpeg_info_reads_exif_orientation():
    import struct as _s

    from wrf_to_geodataframe_spark.sources.jpeg import jpeg_info

    img = _gradient(16, 16)
    data = bytearray(encode_jpeg(img.tobytes(), 16, 16, 1))
    # splice an APP1/EXIF segment (little-endian TIFF, orientation=6)
    tiff = (
        b"II" + _s.pack("<HI", 42, 8)
        + _s.pack("<H", 1)  # one IFD entry
        + _s.pack("<HHIHH", 0x0112, 3, 1, 6, 0)
        + _s.pack("<I", 0)
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + _s.pack(">H", len(payload) + 2) + payload
    blob = bytes(data[:2]) + app1 + bytes(data[2:])
    info = jpeg_info(blob)
    assert info["orientation"] == 6
    assert (info["width"], info["height"]) == (16, 16)


def test_lossless_sof3_round_trip_all_predictors():
    """SOF3 lossless must be bit-exact for every Annex-H predictor at
    8-, 12- and 16-bit precision, grayscale and 3-component."""
    import numpy as np

    from wrf_to_geodataframe_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    for p in range(1, 8):
        blob = encode_jpeg_lossless(img.tobytes(), 17, 13, 1, 8, p)
        w, h, c, px = decode_jpeg(blob)
        assert (w, h, c) == (17, 13, 1)
        assert px == img.tobytes(), f"predictor {p}"
    for prec, hi in [(12, 4096), (16, 65536)]:
        im16 = rng.integers(0, hi, (9, 11), dtype=np.uint16)
        blob = encode_jpeg_lossless(
            im16.astype("<u2").tobytes(), 11, 9, 1, prec, 4
        )
        _w, _h, _c, px = decode_jpeg(blob)
        assert np.array_equal(
            np.frombuffer(px, "<u2").reshape(9, 11), im16
        ), prec
    rgb = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    blob = encode_jpeg_lossless(rgb.tobytes(), 5, 7, 3, 8, 7)
    _w, _h, c, px = decode_jpeg(blob)
    assert c == 3 and px == rgb.tobytes()


def test_lossless_point_transform_and_info():
    """Point transform shifts out the Pt low bits (decoder returns
    Rx << Pt); jpeg_info triages SOF3 streams."""
    import numpy as np

    from wrf_to_geodataframe_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
        jpeg_info,
    )

    img = ((np.arange(64).reshape(8, 8) * 4) % 256).astype(np.uint8)
    blob = encode_jpeg_lossless(
        img.tobytes(), 8, 8, 1, 8, 1, point_transform=2
    )
    _w, _h, _c, px = decode_jpeg(blob)
    got = np.frombuffer(px, np.uint8).reshape(8, 8)
    assert np.array_equal(got, (img >> 2) << 2)
    info = jpeg_info(blob)
    assert info["lossless"] is True
    assert info["precision"] == 8
    assert (info["width"], info["height"]) == (8, 8)


def test_ext12_constant_even_tiles_exact_and_psnr():
    """12-bit extended sequential (SOF1): the constant even-valued
    block corner decodes bit-exactly (uint16-LE output), and a smooth
    gradient survives at high PSNR."""
    import numpy as np

    from wrf_to_geodataframe_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg_ext12,
        jpeg_info,
    )

    tile = np.full((16, 16), 2050, np.uint16)
    blob = encode_jpeg_ext12(tile.astype("<u2").tobytes(), 16, 16)
    w, h, c, px = decode_jpeg(blob)
    assert (w, h, c) == (16, 16, 1)
    assert np.array_equal(np.frombuffer(px, "<u2").reshape(16, 16), tile)
    assert jpeg_info(blob)["precision"] == 12

    g = np.linspace(1000, 3000, 24 * 16).reshape(24, 16).astype(np.uint16)
    blob = encode_jpeg_ext12(g.astype("<u2").tobytes(), 16, 24)
    _w, _h, _c, px = decode_jpeg(blob)
    got = np.frombuffer(px, "<u2").reshape(24, 16).astype(float)
    mse = ((got - g.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(4095.0**2 / max(mse, 1e-9))
    assert psnr > 50, psnr
