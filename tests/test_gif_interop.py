"""Third-party interop for the pure-stdlib GIF codec: cross-validated
against the system giflib via ctypes (DGifSlurp / EGifPutLine), no
headers needed.  Skips cleanly when the library is absent."""

from __future__ import annotations

import ctypes
import ctypes.util
import random

import pytest

from wrf_to_geodataframe_spark.sources.gif import decode_gif, encode_gif


class _GifImageDesc(ctypes.Structure):
    _fields_ = [
        ("Left", ctypes.c_int), ("Top", ctypes.c_int),
        ("Width", ctypes.c_int), ("Height", ctypes.c_int),
        ("Interlace", ctypes.c_bool), ("ColorMap", ctypes.c_void_p),
    ]


class _SavedImage(ctypes.Structure):
    _fields_ = [
        ("ImageDesc", _GifImageDesc),
        ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
    ]


class _ColorMapObject(ctypes.Structure):
    _fields_ = [
        ("ColorCount", ctypes.c_int), ("BitsPerPixel", ctypes.c_int),
        ("SortFlag", ctypes.c_bool),
        ("Colors", ctypes.POINTER(ctypes.c_ubyte)),
    ]


class _GifFileType(ctypes.Structure):
    _fields_ = [
        ("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
        ("SColorResolution", ctypes.c_int),
        ("SBackGroundColor", ctypes.c_int),
        ("AspectByte", ctypes.c_ubyte),
        ("SColorMap", ctypes.POINTER(_ColorMapObject)),
        ("ImageCount", ctypes.c_int), ("Image", _GifImageDesc),
        ("SavedImages", ctypes.POINTER(_SavedImage)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
        ("Error", ctypes.c_int),
        ("UserData", ctypes.c_void_p), ("Private", ctypes.c_void_p),
    ]


def _giflib():
    for name in ("libgif.so.7", "libgif.so", ctypes.util.find_library("gif")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.DGifOpenFileName.restype = ctypes.POINTER(_GifFileType)
        lib.EGifOpenFileName.restype = ctypes.POINTER(_GifFileType)
        lib.GifMakeMapObject.restype = ctypes.POINTER(_ColorMapObject)
        return lib
    return None


_LIB = _giflib()
needs_giflib = pytest.mark.skipif(_LIB is None, reason="giflib absent")


def _lib_read(path: str):
    """(width, height, indices, palette) of frame 0 via giflib."""
    err = ctypes.c_int()
    g = _LIB.DGifOpenFileName(path.encode(), ctypes.byref(err))
    assert g, err.value
    assert _LIB.DGifSlurp(g) == 1, g.contents.Error
    assert g.contents.ImageCount >= 1
    si = g.contents.SavedImages[0]
    d = si.ImageDesc
    n = d.Width * d.Height
    idx = bytes(ctypes.cast(
        si.RasterBits, ctypes.POINTER(ctypes.c_ubyte * n)
    ).contents)
    cmap = d.ColorMap or g.contents.SColorMap
    cm = ctypes.cast(cmap, ctypes.POINTER(_ColorMapObject)).contents
    pal = bytes(ctypes.cast(
        cm.Colors, ctypes.POINTER(ctypes.c_ubyte * (3 * cm.ColorCount))
    ).contents)
    # copy every scalar BEFORE closing: ctypes struct access is a VIEW
    # into giflib's memory, freed by DGifCloseFile
    width, height, interlace = d.Width, d.Height, bool(d.Interlace)
    _LIB.DGifCloseFile(g, ctypes.byref(err))
    return width, height, idx, pal, interlace


def _lib_write(path: str, idx: bytes, w: int, h: int, pal: bytes):
    err = ctypes.c_int()
    ncol = len(pal) // 3
    # giflib requires a power-of-two color count
    padded = 1
    while padded < ncol:
        padded *= 2
    pal = pal + b"\x00" * (3 * (padded - ncol))
    cmap = _LIB.GifMakeMapObject(
        padded, (ctypes.c_ubyte * len(pal)).from_buffer_copy(pal)
    )
    g = _LIB.EGifOpenFileName(path.encode(), False, ctypes.byref(err))
    assert g, err.value
    assert _LIB.EGifPutScreenDesc(g, w, h, 8, 0, cmap) == 1
    assert _LIB.EGifPutImageDesc(g, 0, 0, w, h, False, None) == 1
    buf = (ctypes.c_ubyte * w).from_buffer_copy(b"\x00" * w)
    for y in range(h):
        row = idx[y * w:(y + 1) * w]
        ctypes.memmove(buf, row, w)
        assert _LIB.EGifPutLine(g, buf, w) == 1
    assert _LIB.EGifCloseFile(g, ctypes.byref(err)) == 1


@needs_giflib
@pytest.mark.parametrize("ncol,interlace", [(4, False), (16, False),
                                            (256, False), (16, True)])
def test_giflib_reads_our_streams(tmp_path, ncol, interlace):
    """giflib slurps our encoder's output to the identical index
    raster and palette — LZW, sub-blocks, and interlace row order."""
    rnd = random.Random(ncol + interlace)
    w, h = 19, 11
    pal = bytes(rnd.randrange(256) for _ in range(3 * ncol))
    idx = bytes(rnd.randrange(ncol) for _ in range(w * h))
    p = tmp_path / "x.gif"
    p.write_bytes(encode_gif(idx, w, h, pal, interlace=interlace))
    lw, lh, lidx, lpal, lint = _lib_read(str(p))
    assert (lw, lh) == (w, h)
    assert lint == interlace
    # giflib's DGifSlurp already deinterlaces into display order
    assert lidx == idx
    assert lpal[: 3 * ncol] == pal


@needs_giflib
def test_we_decode_giflib_streams(tmp_path):
    """giflib-encoded streams (its own LZW encoder) decode to the
    identical expanded pixels in our decoder."""
    rnd = random.Random(3)
    w, h = 33, 27
    ncol = 11
    pal = bytes(rnd.randrange(256) for _ in range(3 * ncol))
    idx = bytes(rnd.randrange(ncol) for _ in range(w * h))
    p = tmp_path / "lib.gif"
    _lib_write(str(p), idx, w, h, pal)
    dw, dh, dc, px = decode_gif(p.read_bytes())
    assert (dw, dh, dc) == (w, h, 3)
    padded_pal = pal + b"\x00" * (3 * (16 - ncol))
    want = b"".join(padded_pal[3 * i: 3 * i + 3] for i in idx)
    assert px == want
