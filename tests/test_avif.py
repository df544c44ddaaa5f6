"""AVIF decode (gated on the system libavif): encode with libavif's
own aom encoder via ctypes, decode through sources/avif.py, check
fidelity and the triage cross-check.  Skips cleanly when libavif is
absent."""

from __future__ import annotations

import ctypes

import numpy as np
import pytest

from wrf_to_geodataframe_spark.sources.avif import (
    _RGBImage,
    _RWData,
    decode_avif,
    is_avif,
    libavif_present,
)

needs_libavif = pytest.mark.skipif(
    not libavif_present(), reason="libavif absent"
)


def _encode_avif(rgba: np.ndarray, quality_speed: int = 10) -> bytes:
    import wrf_to_geodataframe_spark.sources.avif as A

    lib = A._LIB  # the same handle the production gate loaded
    lib.avifImageCreate.restype = ctypes.c_void_p
    lib.avifEncoderCreate.restype = ctypes.c_void_p
    h, w = rgba.shape[:2]
    img = lib.avifImageCreate(w, h, 8, 1)  # 8-bit YUV444
    rgb = _RGBImage()
    lib.avifRGBImageSetDefaults(ctypes.byref(rgb), ctypes.c_void_p(img))
    rgb.format = 1  # RGBA
    buf = np.ascontiguousarray(rgba)
    rgb.pixels = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    rgb.rowBytes = w * 4
    assert lib.avifImageRGBToYUV(ctypes.c_void_p(img), ctypes.byref(rgb)) == 0
    enc = lib.avifEncoderCreate()
    # speed field (offset 32 in the v0.11 avifEncoder prefix) for fast tests
    ctypes.cast(enc + 32, ctypes.POINTER(ctypes.c_int))[0] = quality_speed
    out = _RWData()
    assert lib.avifEncoderWrite(
        ctypes.c_void_p(enc), ctypes.c_void_p(img), ctypes.byref(out)
    ) == 0
    blob = ctypes.string_at(out.data, out.size)
    lib.avifRWDataFree(ctypes.byref(out))
    lib.avifEncoderDestroy(ctypes.c_void_p(enc))
    lib.avifImageDestroy(ctypes.c_void_p(img))
    return blob


@needs_libavif
def test_avif_round_trip_close():
    rng = np.random.default_rng(2)
    h, w = 24, 40
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 0] = (np.arange(w)[None, :] * 255) // (w - 1)
    img[..., 1] = (np.arange(h)[:, None] * 255) // (h - 1)
    img[..., 2] = 77
    img[..., 3] = 255
    blob = _encode_avif(img)
    assert is_avif(blob)
    dw, dh, ch, px = decode_avif(blob)
    assert (dw, dh, ch) == (w, h, 4)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 4).astype(int)
    assert np.abs(got[..., :3] - img[..., :3].astype(int)).mean() < 4.0
    np.testing.assert_array_equal(got[..., 3], 255)


@needs_libavif
def test_avif_through_spark_decode_dispatch(spark):
    """The mixed-format decode_images dispatch must route ftypavif
    payloads through the gated codec inside Arrow batches."""
    from wrf_to_geodataframe_spark.operators.multimodal import decode_images

    img = np.full((16, 16, 4), 128, np.uint8)
    img[..., 3] = 255
    blob = _encode_avif(img)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, png binary")
    row = decode_images(df).collect()[0]
    assert (row.width, row.height, row.channels) == (16, 16, 4)


def test_avif_absent_is_a_named_error(monkeypatch):
    import wrf_to_geodataframe_spark.sources.avif as A

    monkeypatch.setattr(A, "_LIB", None)
    with pytest.raises(ValueError, match="requires the system libavif"):
        A.decode_avif(b"\x00\x00\x00 ftypavif" + bytes(32))


@needs_libavif
def test_avif_420_subsampling():
    """4:2:0 (subsampled) AVIF decodes through the gated codec.  (An
    encoded-alpha fixture is not constructible here: this container's
    libaom rejects the monochrome alpha encode with
    AVIF_RESULT_ENCODE_ALPHA_FAILED, an encoder-build limitation —
    alpha DECODE goes through the same avifImageYUVToRGB call.)"""
    import wrf_to_geodataframe_spark.sources.avif as A

    lib = A._LIB  # the same handle the production gate loaded
    lib.avifImageCreate.restype = ctypes.c_void_p
    lib.avifEncoderCreate.restype = ctypes.c_void_p
    h, w = 20, 28
    img4 = np.zeros((h, w, 4), np.uint8)
    img4[..., 0] = 200
    img4[..., 1] = ((np.arange(w)[None, :] * 9) % 256).astype(np.uint8)
    img4[..., 3] = 255
    avimg = lib.avifImageCreate(w, h, 8, 3)  # YUV420
    rgb = _RGBImage()
    lib.avifRGBImageSetDefaults(ctypes.byref(rgb), ctypes.c_void_p(avimg))
    rgb.format = 1
    buf = np.ascontiguousarray(img4)
    rgb.pixels = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    rgb.rowBytes = w * 4
    assert lib.avifImageRGBToYUV(ctypes.c_void_p(avimg), ctypes.byref(rgb)) == 0
    enc = lib.avifEncoderCreate()
    ctypes.cast(enc + 32, ctypes.POINTER(ctypes.c_int))[0] = 10
    out = _RWData()
    assert lib.avifEncoderWrite(
        ctypes.c_void_p(enc), ctypes.c_void_p(avimg), ctypes.byref(out)
    ) == 0
    blob = ctypes.string_at(out.data, out.size)
    lib.avifRWDataFree(ctypes.byref(out))
    lib.avifEncoderDestroy(ctypes.c_void_p(enc))
    lib.avifImageDestroy(ctypes.c_void_p(avimg))

    dw, dh, ch, px = decode_avif(blob)
    assert (dw, dh, ch) == (w, h, 4)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 4).astype(int)
    assert np.abs(got[..., :3] - img4[..., :3].astype(int)).mean() < 8.0
    np.testing.assert_array_equal(got[..., 3], 255)


@needs_libavif
def test_avif_10bit_decodes_to_8bit_rgba():
    """High-bit-depth AVIF (10-bit, the common HDR web flavor): the
    binding requests 8-bit RGBA and libavif performs the depth
    conversion — output must track the 10->8 downshift."""
    import wrf_to_geodataframe_spark.sources.avif as A

    lib = A._LIB  # the same handle the production gate loaded
    lib.avifImageCreate.restype = ctypes.c_void_p
    lib.avifEncoderCreate.restype = ctypes.c_void_p
    w, h = 24, 16
    img = lib.avifImageCreate(w, h, 10, 1)
    rgb = _RGBImage()
    lib.avifRGBImageSetDefaults(ctypes.byref(rgb), ctypes.c_void_p(img))
    rng = np.random.default_rng(1)
    rgba16 = rng.integers(0, 1024, (h, w, 4)).astype(np.uint16)
    rgba16[..., 3] = 1023
    rgb.format = 1
    buf = np.ascontiguousarray(rgba16)
    rgb.pixels = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    rgb.rowBytes = w * 8
    assert lib.avifImageRGBToYUV(ctypes.c_void_p(img), ctypes.byref(rgb)) == 0
    enc = lib.avifEncoderCreate()
    ctypes.cast(enc + 32, ctypes.POINTER(ctypes.c_int))[0] = 10
    out = _RWData()
    assert lib.avifEncoderWrite(
        ctypes.c_void_p(enc), ctypes.c_void_p(img), ctypes.byref(out)
    ) == 0
    blob = ctypes.string_at(out.data, out.size)
    lib.avifRWDataFree(ctypes.byref(out))
    lib.avifEncoderDestroy(ctypes.c_void_p(enc))
    lib.avifImageDestroy(ctypes.c_void_p(img))

    dw, dh, ch, px = decode_avif(blob)
    assert (dw, dh, ch) == (w, h, 4)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 4).astype(int)
    want8 = rgba16[..., :3].astype(int) >> 2
    assert np.abs(got[..., :3] - want8).mean() < 4.0


def test_is_avif_mif1_brand_scan_bounded_by_ftyp_box():
    """ADVICE r7: the mif1 compatible-brand scan must stop at the ftyp
    box boundary — an 'avif' byte-string in the NEXT box is not a
    brand declaration."""
    # ftyp box: size 24 = header(8) + major(4) + minor(4) + 2 brands(8)
    ftyp = (24).to_bytes(4, "big") + b"ftypmif1" + b"\x00\x00\x00\x00"
    with_brand = ftyp + b"heicavif" + b"\x00" * 16
    assert __import__(
        "wrf_to_geodataframe_spark.sources.avif", fromlist=["is_avif"]
    ).is_avif(with_brand)
    # same layout, but 'avif' only appears INSIDE the following box
    no_brand = ftyp + b"heicmsf1" + (16).to_bytes(4, "big") + b"mdatavif" + b"\x00" * 8
    from wrf_to_geodataframe_spark.sources.avif import is_avif
    assert not is_avif(no_brand)
    # unaligned 'avif' straddling brand slots also must not match
    mis = (20).to_bytes(4, "big") + b"ftypmif1" + b"\x00\x00\x00\x00" + b"xavi" + b"favi" + b"f\x00\x00\x00"
    assert not is_avif(mis)
