"""JPEG2000 decode — GATED behind the system openjpeg (libopenjp2).

GRIB2 data template 5.40 packs each field as a JPEG2000 codestream —
the operational ECMWF/NCEP dissemination packing.  Like AV1
(sources/avif.py), a from-scratch JPEG2000 decoder (EBCOT/MQ-coder
tier-1 + tier-2 + the 5/3 and 9/7 wavelets) is out of scope for a
clean-room build with no in-container validator; the engine instead
uses the system libopenjp2 through a flat ctypes binding WHEN PRESENT
and degrades to the ``j2k_info`` triage path with a named error when
absent — the documented "gate behind an import-try" discipline.

ABI safety: only the version-stable leading fields of ``opj_image_t``
/ ``opj_image_comp_t`` are read (the 2.x layout, unchanged since
2.1); every decode cross-checks the library-reported dimensions
against the engine's own SIZ-marker triage and refuses on mismatch
rather than trusting a drifted struct layout (the libavif
discipline).

Scale path: 5.40 messages decode inside the same executor tasks as
every other GRIB2 template (one task per file/message batch);
executors without the library raise the named error per message.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np

__all__ = ["decode_j2k", "j2k_info", "openjpeg_present"]


def j2k_info(data: bytes) -> dict:
    """From-scratch triage of a raw JPEG2000 CODESTREAM (SOC+SIZ
    markers, ITU-T T.800 A.5.1) -> {width, height, ncomps, prec,
    signed} without decoding.  GRIB2 5.40 carries raw codestreams
    (not the JP2 container); anything else is rejected loudly."""
    if len(data) < 4 or data[0:2] != b"\xff\x4f":
        raise ValueError("not a JPEG2000 codestream (no SOC marker)")
    if data[2:4] != b"\xff\x51":
        raise ValueError("JPEG2000 codestream without SIZ after SOC")
    if len(data) < 42:
        raise ValueError("truncated JPEG2000 SIZ segment")
    (
        _lsiz, _rsiz, xsiz, ysiz, xosiz, yosiz,
        _xt, _yt, _xto, _yto, csiz,
    ) = struct.unpack_from(">HHIIIIIIIIH", data, 4)
    if csiz < 1 or len(data) < 42 + 3 * csiz:
        raise ValueError("truncated JPEG2000 SIZ component list")
    if xsiz <= xosiz or ysiz <= yosiz:
        raise ValueError(
            "JPEG2000 SIZ with empty reference grid "
            f"(XSiz {xsiz} <= XOSiz {xosiz} or YSiz {ysiz} <= "
            f"YOSiz {yosiz})"
        )
    ssiz = data[42]
    return {
        "width": int(xsiz - xosiz),
        "height": int(ysiz - yosiz),
        "ncomps": int(csiz),
        "prec": (ssiz & 0x7F) + 1,
        "signed": bool(ssiz & 0x80),
    }


class _ImageComp(ctypes.Structure):
    """opj_image_comp_t, 2.x layout (leading fields, stable since
    2.1; only fields up to ``data`` are read)."""

    _fields_ = [
        ("dx", ctypes.c_uint32), ("dy", ctypes.c_uint32),
        ("w", ctypes.c_uint32), ("h", ctypes.c_uint32),
        ("x0", ctypes.c_uint32), ("y0", ctypes.c_uint32),
        ("prec", ctypes.c_uint32), ("bpp", ctypes.c_uint32),
        ("sgnd", ctypes.c_uint32), ("resno_decoded", ctypes.c_uint32),
        ("factor", ctypes.c_uint32),
        ("data", ctypes.POINTER(ctypes.c_int32)),
        ("alpha", ctypes.c_uint16),
    ]


class _Image(ctypes.Structure):
    """opj_image_t, 2.x layout."""

    _fields_ = [
        ("x0", ctypes.c_uint32), ("y0", ctypes.c_uint32),
        ("x1", ctypes.c_uint32), ("y1", ctypes.c_uint32),
        ("numcomps", ctypes.c_uint32),
        ("color_space", ctypes.c_int),
        ("comps", ctypes.POINTER(_ImageComp)),
        ("icc_profile_buf", ctypes.c_void_p),
        ("icc_profile_len", ctypes.c_uint32),
    ]


_READ_FN = ctypes.CFUNCTYPE(
    ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p
)
_SKIP_FN = ctypes.CFUNCTYPE(ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p)
_SEEK_FN = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, ctypes.c_void_p)

_OPJ_CODEC_J2K = 0  # OPJ_CODEC_FORMAT: raw codestream


def _load():
    for name in ("libopenjp2.so.7", "libopenjp2.so",
                 ctypes.util.find_library("openjp2")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.opj_create_decompress.restype = ctypes.c_void_p
            lib.opj_stream_create.restype = ctypes.c_void_p
            lib.opj_stream_create.argtypes = [
                ctypes.c_size_t, ctypes.c_int,
            ]
            lib.opj_read_header.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.POINTER(ctypes.POINTER(_Image)),
            ]
            lib.opj_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(_Image),
            ]
            lib.opj_version.restype = ctypes.c_char_p
            ver = lib.opj_version().decode("ascii", "replace")
        except (OSError, AttributeError):
            continue
        if not ver.startswith("2."):
            # 1.x has a different stream API and image ABI: refuse
            # rather than risk wrong struct offsets
            continue
        return lib
    return None


_LIB = _load()


def openjpeg_present() -> bool:
    return _LIB is not None


def decode_j2k(data: bytes) -> np.ndarray:
    """Raw JPEG2000 codestream -> int64 ndarray (h, w) of component 0
    through the system libopenjp2; raises a named ValueError when the
    library is absent (``j2k_info`` still triages dimensions)."""
    if _LIB is None:
        raise ValueError(
            "JPEG2000 decode requires the system openjpeg library "
            "(libopenjp2, gated codec); triage via j2k_info"
        )
    triage = j2k_info(data)
    buf = ctypes.create_string_buffer(data, len(data))
    pos = {"p": 0}
    n = len(data)

    @_READ_FN
    def _read(out, nbytes, _user):
        take = min(int(nbytes), n - pos["p"])
        if take <= 0:
            return ctypes.c_size_t(-1).value  # OPJ EOF convention
        ctypes.memmove(out, ctypes.byref(buf, pos["p"]), take)
        pos["p"] += take
        return take

    @_SKIP_FN
    def _skip(nbytes, _user):
        pos["p"] = min(n, pos["p"] + int(nbytes))
        return nbytes

    @_SEEK_FN
    def _seek(offset, _user):
        if 0 <= offset <= n:
            pos["p"] = int(offset)
            return 1
        return 0

    codec = _LIB.opj_create_decompress(_OPJ_CODEC_J2K)
    stream = _LIB.opj_stream_create(max(n, 1024), 1)  # input stream
    img_p = ctypes.POINTER(_Image)()
    try:
        # generous zeroed parameter block: opj_set_default_decoder_
        # parameters only WRITES within sizeof(opj_dparameters_t)
        # (< 1 KiB in every 2.x release); opj_setup_decoder reads it
        params = ctypes.create_string_buffer(4096)
        _LIB.opj_set_default_decoder_parameters(params)
        if not _LIB.opj_setup_decoder(
            ctypes.c_void_p(codec), params
        ):
            raise ValueError("opj_setup_decoder failed")
        _LIB.opj_stream_set_read_function(ctypes.c_void_p(stream), _read)
        _LIB.opj_stream_set_skip_function(ctypes.c_void_p(stream), _skip)
        _LIB.opj_stream_set_seek_function(ctypes.c_void_p(stream), _seek)
        _LIB.opj_stream_set_user_data(
            ctypes.c_void_p(stream), None, None
        )
        _LIB.opj_stream_set_user_data_length(
            ctypes.c_void_p(stream), ctypes.c_uint64(n)
        )
        if not _LIB.opj_read_header(
            ctypes.c_void_p(stream), ctypes.c_void_p(codec),
            ctypes.byref(img_p),
        ):
            raise ValueError("opj_read_header failed")
        img = img_p.contents
        w = int(img.x1 - img.x0)
        h = int(img.y1 - img.y0)
        if (w, h) != (triage["width"], triage["height"]):
            raise ValueError(
                "libopenjp2 dimensions disagree with SIZ triage — "
                "refusing (possible ABI drift)"
            )
        if not _LIB.opj_decode(
            ctypes.c_void_p(codec), ctypes.c_void_p(stream), img_p
        ):
            raise ValueError("opj_decode failed")
        _LIB.opj_end_decompress(
            ctypes.c_void_p(codec), ctypes.c_void_p(stream)
        )
        comp = img.comps[0]
        cw, ch = int(comp.w), int(comp.h)
        if (cw, ch) != (w, h):
            raise ValueError(
                f"component 0 is {ch}x{cw}, image is {h}x{w} "
                "(subsampled fields are not valid GRIB2 5.40)"
            )
        out = np.ctypeslib.as_array(comp.data, shape=(ch, cw)).astype(
            "int64"
        )
        return out
    finally:
        if img_p:
            _LIB.opj_image_destroy(img_p)
        _LIB.opj_stream_destroy(ctypes.c_void_p(stream))
        _LIB.opj_destroy_codec(ctypes.c_void_p(codec))
