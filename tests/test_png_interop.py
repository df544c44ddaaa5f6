"""Third-party interop for the pure-stdlib PNG codec: cross-validated
against the system libpng via ctypes (the simplified ``png_image``
API — flat struct, no headers needed).  Skips cleanly when absent."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from wrf_to_geodataframe_spark.sources.png import decode_png, encode_png

_PNG_IMAGE_VERSION = 1
_FMT_GRAY = 0
_FMT_RGBA = 3


class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p), ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32), ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32), ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def _libpng():
    for name in ("libpng16.so.16", "libpng.so",
                 ctypes.util.find_library("png16")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


_LIB = _libpng()
needs_libpng = pytest.mark.skipif(_LIB is None, reason="libpng absent")


def _lib_read_rgba(blob: bytes):
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    assert _LIB.png_image_begin_read_from_memory(
        ctypes.byref(img), blob, len(blob)
    ), img.message
    w, h = img.width, img.height
    img.format = _FMT_RGBA
    buf = (ctypes.c_ubyte * (w * h * 4))()
    assert _LIB.png_image_finish_read(
        ctypes.byref(img), None, buf, w * 4, None
    ), img.message
    return w, h, bytes(buf)


def _lib_write_rgba(rgba: bytes, w: int, h: int) -> bytes:
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    img.width, img.height = w, h
    img.format = _FMT_RGBA
    size = ctypes.c_size_t(0)
    assert _LIB.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0, rgba, w * 4, None
    ), img.message
    out = (ctypes.c_ubyte * size.value)()
    assert _LIB.png_image_write_to_memory(
        ctypes.byref(img), out, ctypes.byref(size), 0, rgba, w * 4, None
    ), img.message
    return bytes(out[: size.value])


def _to_rgba(w, h, channels, px: bytes) -> bytes:
    a = np.frombuffer(px, np.uint8).reshape(h, w, channels)
    if channels == 1:
        a = np.concatenate([a, a, a, np.full_like(a, 255)], -1)
    elif channels == 2:
        g, al = a[..., :1], a[..., 1:]
        a = np.concatenate([g, g, g, al], -1)
    elif channels == 3:
        a = np.concatenate([a, np.full_like(a[..., :1], 255)], -1)
    return a.tobytes()


@needs_libpng
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("filt", [0, 2, "cycle"])
def test_libpng_reads_our_8bit_streams(channels, interlace, filt):
    """libpng reads our encoder's output (every color type, Adam7,
    cycled scanline filters) to identical RGBA pixels."""
    rng = np.random.default_rng(channels * 10 + interlace + (filt == 2))
    w, h = 13, 9
    px = rng.integers(0, 256, w * h * channels, dtype=np.uint8).tobytes()
    ft = (lambda y: y % 5) if filt == "cycle" else filt
    blob = encode_png(px, w, h, channels, filter_type=ft,
                      interlace=interlace)
    lw, lh, lrgba = _lib_read_rgba(blob)
    assert (lw, lh) == (w, h)
    assert lrgba == _to_rgba(w, h, channels, px)


@needs_libpng
def test_libpng_reads_our_palette_stream():
    rng = np.random.default_rng(3)
    w, h = 17, 5
    pal = [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(16)]
    idx = rng.integers(0, 16, w * h, dtype=np.uint8).tobytes()
    blob = encode_png(idx, w, h, 1, palette=pal, bit_depth=4)
    lw, lh, lrgba = _lib_read_rgba(blob)
    a = np.frombuffer(lrgba, np.uint8).reshape(h, w, 4)
    for i, b in enumerate(idx[: w]):
        assert tuple(a[0, i, :3]) == pal[b] and a[0, i, 3] == 255


@needs_libpng
def test_we_decode_libpng_streams():
    """libpng-written files (its own filter heuristics and zlib
    settings) decode to identical pixels in our decoder."""
    rng = np.random.default_rng(7)
    w, h = 40, 31
    # smooth gradient so libpng picks non-trivial filters
    base = np.add.outer(np.arange(h) * 7, np.arange(w) * 3) % 256
    rgba = np.stack(
        [base, 255 - base, base // 2, np.full_like(base, 255)], -1
    ).astype(np.uint8).tobytes()
    blob = _lib_write_rgba(rgba, w, h)
    mw, mh, mc, mpx = decode_png(blob)
    assert (mw, mh, mc) == (w, h, 4)
    assert mpx == rgba
