"""Arithmetic-coded JPEG (SOF9, T.81 Annexes D+F): libjpeg interop at
the exact coefficient level, Table D.3 verification against the system
library, and shim-free self-consistency checks.

The cross-validation tests also cover the HUFFMAN codec family
(baseline, progressive, restart markers) — the first third-party
equivalence evidence for the whole ``sources/jpeg.py`` surface."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from tests.jpeg_shim import (
    lib_coefs,
    lib_encode,
    lib_pixels,
    my_coefs,
    shim_path,
)
from wrf_to_geodataframe_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_arith,
    encode_jpeg_progressive,
)

needs_shim = pytest.mark.skipif(
    shim_path() is None, reason="gcc/jpeglib shim unavailable"
)


def _find_libjpeg():
    for name in ("jpeg", "libjpeg.so.62"):
        p = ctypes.util.find_library(name) if name == "jpeg" else name
        if p:
            try:
                return ctypes.CDLL(p)
            except OSError:
                continue
    return None


def test_arith_state_table_matches_spec_constants():
    """Verify the transcription of T.81 Table D.3 against the system
    libjpeg's exported ``jpeg_aritab`` (independent copy of the same
    spec constants); skip silently when the library is absent."""
    lib = _find_libjpeg()
    if lib is None:
        pytest.skip("libjpeg not present")
    from wrf_to_geodataframe_spark.sources.jpeg_arith import _ARITH_TAB

    tab = ctypes.cast(lib.jpeg_aritab, ctypes.POINTER(ctypes.c_uint64))
    for i, (qe, nlps, nmps, switch) in enumerate(_ARITH_TAB):
        v = tab[i] & 0xFFFFFFFF
        assert (v >> 16, v & 0x7F, (v >> 8) & 0xFF, (v >> 7) & 1) == (
            qe, nlps, nmps, switch,
        ), f"Table D.3 entry {i}"


@needs_shim
@pytest.mark.parametrize(
    "w,h,nc,ri",
    [(16, 16, 1, 0), (40, 24, 1, 2), (32, 32, 3, 0), (48, 40, 3, 3),
     (17, 9, 1, 0), (24, 24, 3, 1)],
)
def test_decode_libjpeg_arithmetic_streams_exactly(w, h, nc, ri):
    """libjpeg-encoded SOF9 streams entropy-decode to the identical
    quantized coefficients (gray + color, restart intervals, non-8-
    multiple dimensions)."""
    rng = np.random.default_rng(w * h + nc + ri)
    raw = rng.integers(0, 256, (h, w, nc), dtype=np.uint8).tobytes()
    jpg = lib_encode(raw, w, h, nc, arith=True, restart=ri)
    assert lib_coefs(jpg) == my_coefs(jpg)
    ww, hh, cc, _px = decode_jpeg(jpg)  # pixel path runs too
    assert (ww, hh, cc) == (w, h, nc)


@needs_shim
@pytest.mark.parametrize(
    "w,h,nc,ri",
    [(16, 16, 1, 0), (40, 24, 1, 2), (32, 32, 3, 0), (48, 40, 3, 4),
     (15, 11, 1, 0)],
)
def test_libjpeg_decodes_our_arithmetic_streams_exactly(w, h, nc, ri):
    """Our SOF9 encoder's streams are read by libjpeg to the identical
    coefficients — true third-party interop, not a self round-trip."""
    rng = np.random.default_rng(3 * w + h + nc)
    raw = rng.integers(0, 256, (h, w, nc), dtype=np.uint8).tobytes()
    jpg = encode_jpeg_arith(raw, w, h, nc, quality=85, restart_interval=ri)
    assert lib_coefs(jpg) == my_coefs(jpg)
    lw, lh, ln, lpx = lib_pixels(jpg)
    mw, mh, mn, mpx = decode_jpeg(jpg)
    assert (lw, lh, ln) == (mw, mh, mn)
    a = np.frombuffer(lpx, np.uint8).astype(int)
    b = np.frombuffer(mpx, np.uint8).astype(int)
    # identical coefficients; small divergence is IDCT/color rounding
    assert np.abs(a - b).max() <= 5


@needs_shim
@pytest.mark.parametrize("progressive", [False, True])
@pytest.mark.parametrize("nc", [1, 3])
def test_decode_libjpeg_huffman_streams_exactly(progressive, nc):
    """The HUFFMAN decoder paths (baseline and progressive) reproduce
    libjpeg's entropy decode coefficient-exactly as well."""
    rng = np.random.default_rng(17 + nc + progressive)
    w, h = 40, 32
    raw = rng.integers(0, 256, (h, w, nc), dtype=np.uint8).tobytes()
    jpg = lib_encode(raw, w, h, nc, progressive=progressive)
    assert lib_coefs(jpg) == my_coefs(jpg)


@needs_shim
@pytest.mark.parametrize("encoder", ["baseline", "progressive", "arith"])
def test_libjpeg_reads_every_encoder_identically(encoder):
    """All three of our entropy encoders agree with libjpeg's read of
    their own output (the encoders share the DCT/quant pipeline, so
    coefficient sets also agree across entropy layers)."""
    rng = np.random.default_rng(29)
    w, h = 32, 24
    raw = rng.integers(0, 256, (h, w), dtype=np.uint8).tobytes()
    if encoder == "baseline":
        jpg = encode_jpeg(raw, w, h, 1, quality=80)
    elif encoder == "progressive":
        jpg = encode_jpeg_progressive(raw, w, h, 1, quality=80)
    else:
        jpg = encode_jpeg_arith(raw, w, h, 1, quality=80)
    assert lib_coefs(jpg) == my_coefs(jpg)


def test_arith_and_huffman_encoders_agree_without_shim():
    """Shim-free invariant: the arithmetic and baseline encoders share
    the DCT/quant pipeline, so their decoded coefficient sets are
    identical — only the entropy layer differs."""
    rng = np.random.default_rng(5)
    w, h = 24, 16
    raw = rng.integers(0, 256, (h, w), dtype=np.uint8).tobytes()
    a = my_coefs(encode_jpeg_arith(raw, w, h, 1, quality=70))
    b = my_coefs(encode_jpeg(raw, w, h, 1, quality=70))
    assert a == b


def test_arith_color_restart_self_roundtrip():
    rng = np.random.default_rng(8)
    w, h = 48, 32
    raw = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
    jpg = encode_jpeg_arith(raw, w, h, 3, quality=90, restart_interval=2)
    a = my_coefs(jpg)
    b = my_coefs(encode_jpeg(raw, w, h, 3, quality=90))
    assert a == b


def test_hierarchical_arithmetic_rejected_cleanly():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (8, 8), dtype=np.uint8).tobytes()
    jpg = bytearray(encode_jpeg_arith(raw, 8, 8, 1))
    i = jpg.index(b"\xff\xc9")
    jpg[i + 1] = 0xCB  # flip SOF9 -> SOF11 (lossless arithmetic)
    with pytest.raises(ValueError, match="SOF11"):
        decode_jpeg(bytes(jpg))


def test_truncated_arith_stream_still_terminates():
    """Zero-feed after a premature EOI must not hang or over-read; the
    decode either completes (zero-fed decisions) or raises cleanly."""
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 256, (16, 16), dtype=np.uint8).tobytes()
    jpg = encode_jpeg_arith(raw, 16, 16, 1)
    cut = jpg[: len(jpg) // 2] + b"\xff\xd9"
    try:
        decode_jpeg(cut)
    except ValueError:
        pass


def test_flush_keeps_trailing_stuffed_ff():
    """Regression: a stream whose final data byte is 0xFF (written as
    FF 00) must keep the pair through flush — trimming it decoded one
    DC off by 24 quantization steps on this exact tile pattern (found
    by the sf0.1 gate; byte-identical to libjpeg's own stream)."""
    tiles = [0xE2, 0xAC, 0x6E, 0x88, 0xE2, 0x9A, 0xBA, 0x1E]
    img = np.zeros((32, 16), np.uint8)
    for bi, t in enumerate(tiles):
        by, bx = divmod(bi, 2)
        img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = t & 0xFE
    jpg = encode_jpeg_arith(img.tobytes(), 16, 32, 1)
    i = jpg.find(b"\xff\xda")
    seglen = int.from_bytes(jpg[i + 2:i + 4], "big")
    entropy = jpg[i + 2 + seglen:-2]
    assert entropy.endswith(b"\xff\x00")
    _, _, _, px = decode_jpeg(jpg)
    got = np.frombuffer(px, np.uint8).reshape(32, 16)
    for bi, t in enumerate(tiles):
        by, bx = divmod(bi, 2)
        assert got[by * 8, bx * 8] == (t & 0xFE)


@needs_shim
@pytest.mark.parametrize(
    "w,h,nc", [(16, 16, 1), (40, 32, 1), (32, 32, 3), (24, 17, 3)]
)
def test_decode_libjpeg_progressive_arithmetic_exactly(w, h, nc):
    """libjpeg's SOF10 streams (jpeg_simple_progression script: DC
    first/refine + AC first/refine over several Al levels) entropy-
    decode to identical coefficients."""
    rng = np.random.default_rng(w + 2 * h + nc)
    raw = rng.integers(0, 256, (h, w, nc), dtype=np.uint8).tobytes()
    jpg = lib_encode(raw, w, h, nc, arith=True, progressive=True)
    assert lib_coefs(jpg) == my_coefs(jpg)


@needs_shim
@pytest.mark.parametrize("nc,al", [(1, 1), (1, 2), (3, 1), (3, 2)])
def test_libjpeg_decodes_our_progressive_arithmetic_exactly(nc, al):
    """Our SOF10 encoder's scan script (DC first at Al + refinements,
    AC band at Al + refinements) is read by libjpeg to the identical
    coefficients — and matches the baseline encoder's coefficient
    set."""
    from wrf_to_geodataframe_spark.sources.jpeg import (
        encode_jpeg_arith_progressive,
    )

    rng = np.random.default_rng(41 + nc + al)
    w, h = 40, 24
    raw = rng.integers(0, 256, (h, w, nc), dtype=np.uint8).tobytes()
    jpg = encode_jpeg_arith_progressive(raw, w, h, nc, quality=75, al=al)
    assert lib_coefs(jpg) == my_coefs(jpg)
    assert my_coefs(jpg) == my_coefs(encode_jpeg(raw, w, h, nc, quality=75))


def test_progressive_arithmetic_self_roundtrip_without_shim():
    from wrf_to_geodataframe_spark.sources.jpeg import (
        encode_jpeg_arith_progressive,
    )

    rng = np.random.default_rng(77)
    w, h = 24, 16
    raw = rng.integers(0, 256, (h, w), dtype=np.uint8).tobytes()
    a = my_coefs(encode_jpeg_arith_progressive(raw, w, h, 1, quality=60))
    b = my_coefs(encode_jpeg(raw, w, h, 1, quality=60))
    assert a == b
