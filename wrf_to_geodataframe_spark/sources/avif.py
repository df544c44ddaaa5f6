"""AVIF decode — GATED behind the system libavif (dav1d/aom backed).

Unlike the pure-python codecs, AV1 entropy decoding is out of scope
for a from-scratch implementation (a full AV1 decoder is two orders
of magnitude beyond VP8); the engine instead uses the system libavif
through a flat ctypes binding WHEN PRESENT, and degrades to the
``avif_info`` triage path with a named error when absent — the
documented "gate behind an import-try" discipline for container
libraries.

ABI safety: only the version-stable leading fields of ``avifImage``
are touched, plus ``avifRGBImageSetDefaults``-initialized conversion
structs (v0.11/v1.x layout); every decode cross-checks the
library-reported dimensions against the engine's own ISOBMFF triage
(``sources/webp.avif_info``) and refuses on mismatch rather than
trusting a drifted struct layout.

Scale path: same Arrow ``mapInPandas`` batches as every other codec
(``operators/multimodal.py``); executors without libavif raise the
named error per payload, which the feature-extraction quarantine
handles like any unsupported container.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np


class _RWData(ctypes.Structure):
    _fields_ = [("data", ctypes.POINTER(ctypes.c_uint8)),
                ("size", ctypes.c_size_t)]


_RGB_FIELDS_COMMON = [
    ("width", ctypes.c_uint32), ("height", ctypes.c_uint32),
    ("depth", ctypes.c_uint32), ("format", ctypes.c_int),
    ("chromaUpsampling", ctypes.c_int),
    ("chromaDownsampling", ctypes.c_int),
    ("avoidLibYUV", ctypes.c_int), ("ignoreAlpha", ctypes.c_int),
    ("alphaPremultiplied", ctypes.c_int), ("isFloat", ctypes.c_int),
]
_RGB_FIELDS_TAIL = [
    ("pixels", ctypes.POINTER(ctypes.c_uint8)),
    ("rowBytes", ctypes.c_uint32),
]


class _RGBImage(ctypes.Structure):
    """avifRGBImage, v0.11 layout."""

    _fields_ = _RGB_FIELDS_COMMON + _RGB_FIELDS_TAIL


class _RGBImageV1(ctypes.Structure):
    """avifRGBImage, v1.x layout — adds ``maxThreads`` before the
    pixel pointer."""

    _fields_ = (
        _RGB_FIELDS_COMMON
        + [("maxThreads", ctypes.c_int)]
        + _RGB_FIELDS_TAIL
    )


_AVIF_RGBA = 1  # avifRGBFormat AVIF_RGB_FORMAT_RGBA


def _load():
    for name in ("libavif.so.15", "libavif.so.16", "libavif.so",
                 ctypes.util.find_library("avif")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.avifDecoderCreate.restype = ctypes.c_void_p
            lib.avifImageCreateEmpty.restype = ctypes.c_void_p
            lib.avifDecoderReadMemory.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_char_p,
                ctypes.c_size_t,
            ]
            lib.avifVersion.restype = ctypes.c_char_p
            ver = lib.avifVersion().decode("ascii", "replace")
        except (OSError, AttributeError):
            # a library missing any needed symbol must degrade to the
            # triage gate, never break import for every codec
            continue
        parts = ver.split(".")
        major = parts[0]
        try:
            minor = int(parts[1])
        except (IndexError, ValueError):
            minor = -1
        # 0.x only matches _RGBImage from 0.11 (chromaDownsampling /
        # avoidLibYUV fields appeared then); 0.8-0.10 would put
        # pixels/rowBytes at wrong offsets -> garbage pointer write.
        if major == "0" and minor >= 11:
            return lib, _RGBImage
        if major == "1":
            return lib, _RGBImageV1
        # older/unknown ABI: refuse rather than risk a wrong struct
        continue
    return None, None


_LIB, _RGB_STRUCT = _load()


def libavif_present() -> bool:
    return _LIB is not None


def is_avif(data: bytes) -> bool:
    """Matches ``avif_info``'s brand acceptance: avif/avis majors, or
    an HEIF 'mif1' major that lists avif among its compatible brands
    (a common encoder/muxer output)."""
    if len(data) <= 16 or data[4:8] != b"ftyp":
        return False
    brand = data[8:12]
    if brand in (b"avif", b"avis"):
        return True
    if brand != b"mif1":
        return False
    # compatible-brand scan bounded by the ftyp box itself (4-byte
    # strides from offset 16), never into the following box's bytes
    size = int.from_bytes(data[0:4], "big")
    end = min(size, len(data))
    return any(
        data[p:p + 4] == b"avif" for p in range(16, end - 3, 4)
    )


def decode_avif(data: bytes) -> tuple[int, int, int, bytes]:
    """AVIF -> (width, height, 4, RGBA bytes) through the system
    libavif; raises a named ValueError when the library is absent
    (``avif_info`` still triages dimensions)."""
    if _LIB is None:
        raise ValueError(
            "AVIF decode requires the system libavif (gated codec); "
            "triage via avif_info"
        )
    from wrf_to_geodataframe_spark.sources.webp import avif_info

    triage = avif_info(data)
    dec = _LIB.avifDecoderCreate()
    img = _LIB.avifImageCreateEmpty()
    try:
        r = _LIB.avifDecoderReadMemory(dec, img, data, len(data))
        if r != 0:
            raise ValueError(f"libavif decode failed (result {r})")
        w = ctypes.cast(img, ctypes.POINTER(ctypes.c_uint32))[0]
        h = ctypes.cast(img + 4, ctypes.POINTER(ctypes.c_uint32))[0]
        if (w, h) != (triage["width"], triage["height"]):
            raise ValueError(
                "libavif dimensions disagree with container triage — "
                "refusing (possible ABI drift)"
            )
        rgb = _RGB_STRUCT()
        _LIB.avifRGBImageSetDefaults(ctypes.byref(rgb), ctypes.c_void_p(img))
        rgb.format = _AVIF_RGBA
        rgb.depth = 8
        out = np.empty(w * h * 4, np.uint8)
        rgb.pixels = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        rgb.rowBytes = w * 4
        r = _LIB.avifImageYUVToRGB(ctypes.c_void_p(img), ctypes.byref(rgb))
        if r != 0:
            raise ValueError(f"libavif YUV->RGB failed (result {r})")
        return int(w), int(h), 4, out.tobytes()
    finally:
        _LIB.avifImageDestroy(ctypes.c_void_p(img))
        _LIB.avifDecoderDestroy(ctypes.c_void_p(dec))
