"""Third-party interop for the pure-stdlib TIFF codec: cross-validated
against the system libtiff via ctypes (TIFFOpen / TIFFReadRGBAImage /
TIFFWriteScanline, varargs TIFFSet/GetField with explicit per-call
types).  Skips cleanly when the library is absent."""

from __future__ import annotations

import ctypes
import ctypes.util
import random

import pytest

from wrf_to_geodataframe_spark.sources.tiff import decode_tiff, encode_tiff

_T_WIDTH, _T_HEIGHT, _T_BITS = 256, 257, 258
_T_COMP, _T_PHOTO, _T_SPP = 259, 262, 277
_T_RPS, _T_PLANAR, _T_PRED = 278, 284, 317


def _libtiff():
    for name in ("libtiff.so.6", "libtiff.so.5",
                 ctypes.util.find_library("tiff")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.TIFFOpen.restype = ctypes.c_void_p
        lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        # silence libtiff warnings on stderr
        lib.TIFFSetWarningHandler.restype = ctypes.c_void_p
        lib.TIFFSetWarningHandler(None)
        return lib
    return None


_LIB = _libtiff()
needs_libtiff = pytest.mark.skipif(_LIB is None, reason="libtiff absent")


def _lib_read_rgba(path: str):
    t = _LIB.TIFFOpen(path.encode(), b"r")
    assert t, "libtiff failed to open"
    th = ctypes.c_void_p(t)
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    _LIB.TIFFGetField(th, ctypes.c_uint32(_T_WIDTH), ctypes.byref(w))
    _LIB.TIFFGetField(th, ctypes.c_uint32(_T_HEIGHT), ctypes.byref(h))
    n = w.value * h.value
    raster = (ctypes.c_uint32 * n)()
    assert _LIB.TIFFReadRGBAImage(th, w, h, raster, 0) == 1
    _LIB.TIFFClose(th)
    # bottom-up rows, R in the low byte
    out = bytearray(n * 4)
    for y in range(h.value):
        for x in range(w.value):
            v = raster[(h.value - 1 - y) * w.value + x]
            i = 4 * (y * w.value + x)
            out[i] = v & 0xFF
            out[i + 1] = (v >> 8) & 0xFF
            out[i + 2] = (v >> 16) & 0xFF
            out[i + 3] = (v >> 24) & 0xFF
    return w.value, h.value, bytes(out)


def _lib_write(path: str, px: bytes, w: int, h: int, ch: int,
               comp: int, pred: int = 1, rps: int = 0):
    t = _LIB.TIFFOpen(path.encode(), b"w")
    assert t
    th = ctypes.c_void_p(t)
    setf = _LIB.TIFFSetField
    setf(th, ctypes.c_uint32(_T_WIDTH), ctypes.c_uint32(w))
    setf(th, ctypes.c_uint32(_T_HEIGHT), ctypes.c_uint32(h))
    setf(th, ctypes.c_uint32(_T_BITS), ctypes.c_int(8))
    setf(th, ctypes.c_uint32(_T_SPP), ctypes.c_int(ch))
    setf(th, ctypes.c_uint32(_T_PHOTO), ctypes.c_int(1 if ch == 1 else 2))
    setf(th, ctypes.c_uint32(_T_PLANAR), ctypes.c_int(1))
    setf(th, ctypes.c_uint32(_T_COMP), ctypes.c_int(comp))
    setf(th, ctypes.c_uint32(_T_RPS), ctypes.c_uint32(rps or h))
    if pred == 2:
        setf(th, ctypes.c_uint32(_T_PRED), ctypes.c_int(2))
    stride = w * ch
    buf = (ctypes.c_ubyte * stride)()
    for y in range(h):
        ctypes.memmove(buf, px[y * stride:(y + 1) * stride], stride)
        assert _LIB.TIFFWriteScanline(th, buf, ctypes.c_uint32(y), 0) == 1
    _LIB.TIFFClose(th)


def _to_rgba(px: bytes, ch: int) -> bytes:
    out = bytearray()
    if ch == 1:
        for v in px:
            out += bytes([v, v, v, 255])
    elif ch == 3:
        for i in range(0, len(px), 3):
            out += px[i:i + 3] + b"\xff"
    else:
        return bytes(px)
    return bytes(out)


@needs_libtiff
@pytest.mark.parametrize(
    "ch,comp,pred,rps,be",
    [(1, 1, 1, 0, False), (3, 5, 1, 0, False), (3, 5, 2, 3, False),
     (3, 8, 2, 0, False), (1, 32773, 1, 3, False), (3, 5, 2, 3, True),
     (4, 5, 2, 0, False)],
)
def test_libtiff_reads_our_streams(tmp_path, ch, comp, pred, rps, be):
    """libtiff decodes our encoder's output pixel-exactly across
    compressions (incl. the early-change LZW), the horizontal
    predictor, multi-strip layouts, and both byte orders."""
    rnd = random.Random(ch * 100 + comp + pred + rps)
    w, h = 13, 9
    px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
    p = tmp_path / "x.tif"
    p.write_bytes(encode_tiff(px, w, h, ch, comp, pred, rps, be))
    lw, lh, lrgba = _lib_read_rgba(str(p))
    assert (lw, lh) == (w, h)
    assert lrgba == _to_rgba(px, ch)


@needs_libtiff
@pytest.mark.parametrize(
    "ch,comp,pred", [(1, 1, 1), (3, 5, 1), (3, 5, 2), (1, 8, 2),
                     (3, 32773, 1)],
)
def test_we_decode_libtiff_streams(tmp_path, ch, comp, pred):
    """libtiff-written files (its own LZW/deflate/PackBits encoders
    and strip choices) decode pixel-exactly in our decoder."""
    rnd = random.Random(ch + comp)
    w, h = 37, 21
    if comp == 32773:
        # runs so PackBits actually compresses
        px = bytes(rnd.choice([0, 0, 0, 255, 17]) for _ in range(w * h * ch))
    else:
        px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
    p = tmp_path / "lib.tif"
    _lib_write(str(p), px, w, h, ch, comp, pred, rps=5)
    dw, dh, dc, dpx = decode_tiff(p.read_bytes())
    assert (dw, dh, dc) == (w, h, ch)
    assert dpx == px
