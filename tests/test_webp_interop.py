"""Third-party interop for the pure-Python VP8L (lossless WebP) codec:
cross-validated against the system libwebp via ctypes (flat C ABI —
``WebPDecodeRGBA`` / ``WebPEncodeLosslessRGBA`` / ``WebPGetInfo``), no
headers needed.  Tests skip cleanly when the library is absent."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from wrf_to_geodataframe_spark.sources.webp import (
    decode_webp,
    encode_webp,
    webp_info,
)


def _libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        return lib
    return None


_LIB = _libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None, reason="libwebp absent")


def _lib_decode(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp failed to decode"
    out = ctypes.string_at(p, w.value * h.value * 4)
    return w.value, h.value, out


def _lib_encode(rgba: bytes, w: int, h: int) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n > 0, "libwebp failed to encode"
    return ctypes.string_at(out, n)


@needs_libwebp
@pytest.mark.parametrize("kind", ["random", "gradient", "palette", "flat"])
def test_libwebp_decodes_our_vp8l_streams(kind):
    """Our VP8L encoder's streams decode bit-exactly in libwebp — true
    third-party interop for prefix codes, LSB bit layout, and the
    subtract-green transform."""
    rng = np.random.default_rng(hash(kind) % 2**32)
    w, h = 21, 13
    if kind == "random":
        rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    elif kind == "gradient":
        rgba = np.stack(
            [np.add.outer(np.arange(h), np.arange(w)) % 256] * 4, -1
        ).astype(np.uint8)
    elif kind == "palette":
        pal = rng.integers(0, 256, (7, 4), dtype=np.uint8)
        rgba = pal[rng.integers(0, 7, (h, w))]
    else:
        rgba = np.full((h, w, 4), 137, np.uint8)
    rgba[..., 3] |= 1  # avoid premultiplied-alpha ambiguity at alpha 0
    for sg in (False, True):
        blob = encode_webp(rgba.tobytes(), w, h, subtract_green=sg)
        lw, lh, lout = _lib_decode(blob)
        assert (lw, lh) == (w, h)
        assert lout == rgba.tobytes(), f"subtract_green={sg}"


@needs_libwebp
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_we_decode_libwebp_vp8l_streams(seed):
    """libwebp-encoded lossless streams (its own transform choices:
    predictors, color-cache, LZ77, meta-prefixes, palettes) decode
    bit-exactly in our decoder — the hard direction."""
    rng = np.random.default_rng(seed)
    w, h = 40, 25
    if seed % 2:
        # few-color image: libwebp will choose palette/cache paths
        pal = rng.integers(0, 256, (5, 4), dtype=np.uint8)
        rgba = pal[rng.integers(0, 5, (h, w))]
    else:
        # smooth image: libwebp will choose predictor transforms
        base = np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256
        rgba = np.stack([base, base // 2, 255 - base,
                         np.full_like(base, 255)], -1).astype(np.uint8)
    blob = _lib_encode(rgba.tobytes(), w, h)
    info = webp_info(blob)
    assert (info["width"], info["height"]) == (w, h)
    mw, mh, mc, mout = decode_webp(blob)
    assert (mw, mh, mc) == (w, h, 4)
    assert mout == rgba.tobytes()
