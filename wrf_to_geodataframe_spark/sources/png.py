"""Pure-Python PNG codec (stdlib zlib + struct only — the container has
no pillow/cv2, and the engine's other binary readers are already
dependency-free: ``sources/hdf5.py`` ships its own deflate path).

Scope — the subset a training-data pipeline actually meets for raster
payloads (reference has no multimodal surface at all; this is a brief
north-star component):

- 8-bit samples; color types 0 (gray), 2 (RGB), 4 (gray+alpha) and
  6 (RGBA) → 1/3/2/4 channels.  Palette (3), 1/2/4/16-bit depths and
  Adam7 interlace raise ``ValueError`` with the reason.
- All five scanline filters (None/Sub/Up/Average/Paeth) on both the
  encode and decode side — the encoder can cycle filters per scanline
  so a round-trip exercises every unfilter branch.
- Chunk CRCs are verified on read; multiple IDAT chunks concatenate
  per the spec; trailing chunks after IEND are ignored.

The codec runs INSIDE Arrow ``mapInPandas`` batches (see
``operators/multimodal.py``): Spark never sees pixels row-at-a-time,
one Python worker per core decodes a whole Arrow batch of payloads.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> channels (8-bit samples only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_line(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward filter one scanline (encode side)."""
    if ftype == 0:
        return line
    out = bytearray(len(line))
    for i, x in enumerate(line):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
    return bytes(out)


def _unfilter_line(ftype: int, line: bytearray, prev: bytes, bpp: int) -> None:
    """Reconstruct one scanline in place (decode side)."""
    if ftype == 0:
        return
    if ftype not in (1, 2, 3, 4):
        raise ValueError(f"corrupt PNG: filter type {ftype}")
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            line[i] = (line[i] + a) & 0xFF
        elif ftype == 2:
            line[i] = (line[i] + b) & 0xFF
        elif ftype == 3:
            line[i] = (line[i] + (a + b) // 2) & 0xFF
        else:
            line[i] = (line[i] + _paeth(a, b, c)) & 0xFF


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    filter_type=0,
) -> bytes:
    """Encode an 8-bit interleaved pixel buffer as a valid PNG.

    ``filter_type`` is an int applied to every scanline, or a callable
    ``row_index -> int`` (e.g. ``lambda y: y % 5`` to cycle all five
    filters — the round-trip gate row does exactly that so the decoder's
    every unfilter branch is hash-checked)."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"channels must be 1/2/3/4, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {stride * height}"
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0
    )
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        ft = filter_type(y) if callable(filter_type) else filter_type
        raw.append(ft)
        raw += _filter_line(ft, line, prev, channels)
        prev = line
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixels)`` — 8-bit
    interleaved samples, scanlines top-to-bottom.  CRCs are verified;
    unsupported spec corners raise ``ValueError`` naming the feature."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    seen_end = False
    while pos < len(data) and not seen_end:
        if pos + 8 > len(data):
            raise ValueError("corrupt PNG: truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise ValueError("corrupt PNG: truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG: bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG: color type {ctype}")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG: nonzero compression/filter method")
            if interlace != 0:
                raise ValueError("unsupported PNG: Adam7 interlace")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            seen_end = True
        # ancillary chunks (tEXt, pHYs, ...) are skipped
        pos += 12 + length
    if channels < 0:
        raise ValueError("corrupt PNG: missing IHDR")
    if not seen_end:
        raise ValueError("corrupt PNG: missing IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"corrupt PNG: inflated to {len(raw)} bytes, want {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        _unfilter_line(ftype, line, prev, channels)
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)
