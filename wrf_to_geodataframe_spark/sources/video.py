"""Video container triage: MP4/MOV (ISOBMFF) and Matroska/WebM (EBML).

North-star multimodal surface (no reference counterpart): a crawl
pipeline must at least TRIAGE video payloads — duration, track
dimensions, codec ids — without decoding any frames.  Implemented
from the public ISO/IEC 14496-12 box structure and the Matroska/EBML
specification:

- ``mp4_info``: box walk (32/64-bit sizes) — ``mvhd`` timescale +
  duration, per-track ``tkhd`` dimensions and ``stsd`` sample-entry
  codec fourcc, brand from ``ftyp``.
- ``mkv_info``: EBML walk (vint ids/sizes) — DocType (matroska/webm),
  Segment>Info TimestampScale + Duration, per-track type/codec id and
  Video PixelWidth/PixelHeight.

Frame/codec payload decode (H.264/VP9/AV1...) is out of scope and
there is nothing to decode at triage level — these emit metadata
rows only, the same role ``webp_info``/``avif_info`` play for
images.  Tested against hand-built containers in
``tests/test_video.py``.
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------------
# ISOBMFF (MP4/MOV)


def _boxes(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4: short largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            raise ValueError("corrupt MP4: bad box size")
        yield btype, body, pos + size
        pos += size


def mp4_info(data: bytes) -> dict:
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISOBMFF file (no ftyp)")
    brand = data[8:12].decode("ascii", "replace")
    out = {
        "brand": brand,
        "duration_ms": None,
        "tracks": [],
    }
    moov = None
    for btype, body, bend in _boxes(data, 0, len(data)):
        if btype == b"moov":
            moov = (body, bend)
            break
    if moov is None:
        raise ValueError("corrupt MP4: no moov box")
    for btype, body, bend in _boxes(data, *moov):
        if btype == b"mvhd":
            ver = data[body]
            if ver == 1:
                ts, dur = struct.unpack(">IQ", data[body + 20 : body + 32])
            else:
                ts, dur = struct.unpack(">II", data[body + 12 : body + 20])
            if ts:
                out["duration_ms"] = dur * 1000 // ts
        elif btype == b"trak":
            trk = {"width": None, "height": None, "codec": None}
            for t2, b2, e2 in _boxes(data, body, bend):
                if t2 == b"tkhd":
                    ver = data[b2]
                    off = b2 + (96 if ver == 1 else 84) - 8
                    w, h = struct.unpack(">II", data[off : off + 8])
                    trk["width"], trk["height"] = w >> 16, h >> 16
                elif t2 == b"mdia":
                    for t3, b3, e3 in _boxes(data, b2, e2):
                        if t3 != b"minf":
                            continue
                        for t4, b4, e4 in _boxes(data, b3, e3):
                            if t4 != b"stbl":
                                continue
                            for t5, b5, e5 in _boxes(data, b4, e4):
                                if t5 == b"stsd":
                                    # FullBox + entry_count, then the
                                    # first sample entry's fourcc
                                    trk["codec"] = data[
                                        b5 + 12 : b5 + 16
                                    ].decode("ascii", "replace")
            out["tracks"].append(trk)
    return out


# ---------------------------------------------------------------------------
# EBML (Matroska / WebM)


def _vint(data: bytes, pos: int, keep_marker: bool):
    """(value, next_pos): EBML variable-length integer; ids KEEP the
    length-marker bit, sizes strip it."""
    if pos >= len(data):
        raise ValueError("truncated EBML: vint at end")
    first = data[pos]
    if first == 0:
        raise ValueError("corrupt EBML: invalid vint")
    length = 1
    mask = 0x80
    while not first & mask:
        length += 1
        mask >>= 1
    if pos + length > len(data):
        raise ValueError("truncated EBML: short vint")
    v = first if keep_marker else first & (mask - 1)
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, pos + length


def _ebml_children(data: bytes, pos: int, end: int):
    while pos < end:
        eid, pos = _vint(data, pos, keep_marker=True)
        size, pos = _vint(data, pos, keep_marker=False)
        if pos + size > end:
            raise ValueError("truncated EBML: element overruns parent")
        yield eid, pos, pos + size
        pos += size


def _uint(data: bytes, a: int, b: int) -> int:
    v = 0
    for i in range(a, b):
        v = (v << 8) | data[i]
    return v


def mkv_info(data: bytes) -> dict:
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML stream")
    out = {"doctype": None, "duration_ms": None, "tracks": []}
    header_end = None
    for eid, a, b in _ebml_children(data, 0, len(data)):
        if eid == 0x1A45DFA3:  # EBML header
            for e2, a2, b2 in _ebml_children(data, a, b):
                if e2 == 0x4282:  # DocType
                    out["doctype"] = data[a2:b2].decode("ascii", "replace")
            header_end = b
        elif eid == 0x18538067:  # Segment
            scale = 1_000_000  # ns per tick default
            duration = None
            for e2, a2, b2 in _ebml_children(data, a, b):
                if e2 == 0x1549A966:  # Info
                    for e3, a3, b3 in _ebml_children(data, a2, b2):
                        if e3 == 0x2AD7B1:  # TimestampScale
                            scale = _uint(data, a3, b3)
                        elif e3 == 0x4489:  # Duration (float)
                            if b3 - a3 == 4:
                                (duration,) = struct.unpack(
                                    ">f", data[a3:b3]
                                )
                            else:
                                (duration,) = struct.unpack(
                                    ">d", data[a3:b3]
                                )
                elif e2 == 0x1654AE6B:  # Tracks
                    for e3, a3, b3 in _ebml_children(data, a2, b2):
                        if e3 != 0xAE:  # TrackEntry
                            continue
                        trk = {"type": None, "codec": None,
                               "width": None, "height": None}
                        for e4, a4, b4 in _ebml_children(data, a3, b3):
                            if e4 == 0x83:  # TrackType
                                trk["type"] = {1: "video", 2: "audio"}.get(
                                    _uint(data, a4, b4),
                                    str(_uint(data, a4, b4)),
                                )
                            elif e4 == 0x86:  # CodecID
                                trk["codec"] = data[a4:b4].decode(
                                    "ascii", "replace"
                                )
                            elif e4 == 0xE0:  # Video
                                for e5, a5, b5 in _ebml_children(
                                    data, a4, b4
                                ):
                                    if e5 == 0xB0:
                                        trk["width"] = _uint(data, a5, b5)
                                    elif e5 == 0xBA:
                                        trk["height"] = _uint(data, a5, b5)
                        out["tracks"].append(trk)
            if duration is not None:
                out["duration_ms"] = int(duration * scale / 1_000_000)
    if out["doctype"] is None and header_end is None:
        raise ValueError("corrupt EBML: no header")
    return out
