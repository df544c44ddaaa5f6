"""Pure-Python PNG codec (stdlib zlib + struct only — the container has
no pillow/cv2, and the engine's other binary readers are already
dependency-free: ``sources/hdf5.py`` ships its own deflate path).

Scope — the subset a training-data pipeline actually meets for raster
payloads (reference has no multimodal surface at all; this is a brief
north-star component):

- All five standard color types: 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA).
- Bit depths 1/2/4/8/16 in the combinations the spec allows
  (gray: all five; palette: 1/2/4/8; RGB/GA/RGBA: 8/16).
- The decoder NORMALIZES to 8-bit interleaved samples — the contract
  ``operators/multimodal.py`` builds on: palette indices expand through
  PLTE to RGB (RGBA when a tRNS chunk supplies per-entry alpha),
  16-bit samples take the high byte (the spec's 16→8 scaling), and
  sub-byte gray scales ``v * 255 / (2^depth - 1)``.  A tRNS
  transparent-color on gray/RGB images adds an alpha channel.
- All five scanline filters (None/Sub/Up/Average/Paeth) on both the
  encode and decode side — the encoder can cycle filters per scanline
  so a round-trip exercises every unfilter branch, at every depth
  (filters operate on packed scanline BYTES with the spec's
  ``bpp = max(1, channels*depth//8)``).
- Adam7 interlace on BOTH sides: the decoder de-interlaces the 7
  independently-filtered sub-images (crawl corpora contain interlaced
  files), the encoder can emit them (``interlace=True``) so round-trip
  goldens cover every pass geometry.
- Chunk CRCs are verified on read; multiple IDAT chunks concatenate
  per the spec; trailing chunks after IEND are ignored.

The codec runs INSIDE Arrow ``mapInPandas`` batches (see
``operators/multimodal.py``): Spark never sees pixels row-at-a-time,
one Python worker per core decodes a whole Arrow batch of payloads.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> raw channel count (palette counts its index as 1)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# channels -> color type for the non-palette encode path
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}
# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]

# spec-allowed (color type -> bit depths)
_ALLOWED_DEPTHS = {
    0: {1, 2, 4, 8, 16},
    2: {8, 16},
    3: {1, 2, 4, 8},
    4: {8, 16},
    6: {8, 16},
}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_line(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward filter one packed scanline (encode side) — fully
    numpy-vectorized: every filter reads only ORIGINAL bytes (never its
    own output), so the whole line computes at once.  Exact uint8
    wraparound via int16 arithmetic + mask."""
    if ftype == 0:
        return bytes(line)
    if ftype not in (1, 2, 3, 4):
        raise ValueError(f"unknown filter type {ftype}")
    x = np.frombuffer(bytes(line), np.uint8).astype(np.int16)
    b = np.frombuffer(bytes(prev), np.uint8).astype(np.int16)
    a = np.zeros_like(x)
    a[bpp:] = x[:-bpp]
    if ftype == 1:
        out = x - a
    elif ftype == 2:
        out = x - b
    elif ftype == 3:
        out = x - (a + b) // 2
    else:  # Paeth: |pred-a|=|b-c|, |pred-b|=|a-c|, |pred-c|=|a+b-2c|
        c = np.zeros_like(b)
        c[bpp:] = b[:-bpp]
        pa = np.abs(b - c)
        pb = np.abs(a - c)
        pc = np.abs(a + b - 2 * c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
        out = x - pred
    return (out & 0xFF).astype(np.uint8).tobytes()


def _unfilter_line(ftype: int, line: bytearray, prev: bytes, bpp: int) -> None:
    """Reconstruct one packed scanline in place (decode side).
    None/Up/Sub are vectorized (Up has no intra-line dependency; Sub's
    recurrence recon[i] = x[i] + recon[i-bpp] is an exact per-residue
    cumulative sum mod 256); Average/Paeth stay byte-sequential — their
    predictor mixes the current line's already-reconstructed left
    neighbor with the previous row, which no prefix trick linearizes."""
    if ftype == 0:
        return
    if ftype == 2:  # Up
        x = np.frombuffer(bytes(line), np.uint8).astype(np.int16)
        b = np.frombuffer(bytes(prev), np.uint8).astype(np.int16)
        line[:] = ((x + b) & 0xFF).astype(np.uint8).tobytes()
        return
    if ftype == 1:  # Sub: prefix sums per byte-residue class
        x = np.frombuffer(bytes(line), np.uint8).astype(np.int64)
        for r in range(min(bpp, len(x))):
            x[r::bpp] = np.cumsum(x[r::bpp])
        line[:] = (x & 0xFF).astype(np.uint8).tobytes()
        return
    if ftype not in (3, 4):
        raise ValueError(f"corrupt PNG: filter type {ftype}")
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 3:
            line[i] = (line[i] + (a + b) // 2) & 0xFF
        else:
            line[i] = (line[i] + _paeth(a, b, c)) & 0xFF


def _pack_bits(samples, width: int, depth: int) -> bytes:
    """Pack one scanline of sub-byte samples MSB-first per the spec
    (vectorized: pad to a whole number of bytes, shift-and-sum)."""
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    n_bytes = (width * depth + 7) // 8
    arr = np.zeros(n_bytes * per_byte, np.uint16)
    arr[:width] = np.frombuffer(bytes(samples[:width]), np.uint8) & mask
    shifts = np.array(
        [8 - depth * (k + 1) for k in range(per_byte)], np.uint16
    )
    packed = (arr.reshape(n_bytes, per_byte) << shifts).sum(axis=1)
    return packed.astype(np.uint8).tobytes()


def _unpack_bits(line, width: int, depth: int):
    """Inverse of :func:`_pack_bits` (trailing pad bits dropped)."""
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    shifts = np.array(
        [8 - depth * (k + 1) for k in range(per_byte)], np.uint8
    )
    arr = np.frombuffer(bytes(line), np.uint8)
    vals = ((arr[:, None] >> shifts) & mask).reshape(-1)
    return vals[:width].astype(np.uint8)


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
    bit_depth: int = 8,
    palette: list[tuple[int, int, int]] | None = None,
    trns: bytes | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode a pixel buffer as a valid PNG.

    - ``bit_depth=8`` (default): ``pixels`` is interleaved 8-bit
      samples, ``channels`` in 1/2/3/4 → color type 0/4/2/6.
    - ``bit_depth=16``: ``pixels`` is interleaved BIG-ENDIAN 16-bit
      samples (2 bytes each), same channel→type mapping.
    - ``palette=[...]`` (list of RGB triples): color type 3.
      ``pixels`` is one INDEX per pixel (one byte each, value <
      ``len(palette)``), ``channels`` must be 1, ``bit_depth`` in
      1/2/4/8 packs the indices; ``trns`` adds per-entry alpha.
    - ``bit_depth`` 1/2/4 without a palette: grayscale, ``pixels`` is
      one byte per pixel holding a value in ``[0, 2^depth)``.

    ``filter_type`` is an int applied to every scanline, or a callable
    ``row_index -> int`` (e.g. ``lambda y: y % 5`` to cycle all five
    filters — the round-trip gate row does exactly that so the
    decoder's every unfilter branch is hash-checked)."""
    if palette is not None:
        if channels != 1:
            raise ValueError("palette PNGs take one index channel")
        if not 1 <= len(palette) <= 256 or any(len(c) != 3 for c in palette):
            raise ValueError("palette must be 1-256 RGB triples")
        ctype = 3
    else:
        if channels not in _COLOR_TYPE:
            raise ValueError(f"channels must be 1/2/3/4, got {channels}")
        ctype = _COLOR_TYPE[channels]
    if bit_depth not in _ALLOWED_DEPTHS[ctype]:
        raise ValueError(
            f"bit depth {bit_depth} not allowed for color type {ctype}"
        )

    # samples per pixel in the INPUT buffer (one byte per sample for
    # depth <= 8, two for 16)
    in_bytes_per_px = channels * (2 if bit_depth == 16 else 1)
    if len(pixels) != width * height * in_bytes_per_px:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want "
            f"{width * height * in_bytes_per_px}"
        )
    if bit_depth < 8:
        mx = (1 << bit_depth) - 1
        if len(pixels) and int(np.frombuffer(bytes(pixels), np.uint8).max()) > mx:
            raise ValueError(f"sample exceeds {bit_depth}-bit range")

    bpp = max(1, channels * bit_depth // 8)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, ctype, 0, 0, 1 if interlace else 0
    )
    arr = np.frombuffer(bytes(pixels), np.uint8).reshape(
        height, width, in_bytes_per_px
    )
    raw = bytearray()
    row_no = 0  # global row counter so a cycling filter_type still cycles
    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    for x0, y0, dx, dy in passes:
        sub = arr[y0::dy, x0::dx]
        h_p, w_p = sub.shape[0], sub.shape[1]
        if h_p == 0 or w_p == 0:
            continue
        prev = bytes((w_p * channels * bit_depth + 7) // 8)
        for i in range(h_p):
            samples = sub[i].reshape(-1).tobytes()
            line = (
                _pack_bits(samples, w_p, bit_depth)
                if bit_depth < 8
                else samples
            )
            ft = filter_type(row_no) if callable(filter_type) else filter_type
            row_no += 1
            raw.append(ft)
            raw += _filter_line(ft, line, prev, bpp)
            prev = line
    out = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", b"".join(bytes(c) for c in palette))
        if trns is not None:
            out += _chunk(b"tRNS", bytes(trns))
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw), 9)) + _chunk(b"IEND", b"")


def _expand_scanline(
    line: bytearray,
    width: int,
    depth: int,
    ctype: int,
    palette: bytes | None,
    trns: bytes | None,
    out_channels: int,
) -> bytes:
    """Packed scanline bytes -> normalized 8-bit interleaved samples
    (numpy-vectorized: palette expansion is a fancy-index gather,
    scaling and tRNS matching are array ops)."""
    channels = _CHANNELS[ctype]
    if ctype == 3:  # palette: indices -> RGB(A)
        idx = (
            _unpack_bits(line, width, depth)
            if depth < 8
            else np.frombuffer(bytes(line), np.uint8)[:width]
        )
        pal = np.frombuffer(palette, np.uint8).reshape(-1, 3)
        if idx.size and int(idx.max()) >= len(pal):
            raise ValueError(
                f"corrupt PNG: palette index {int(idx.max())} out of range"
            )
        rgb = pal[idx]
        if out_channels == 3:
            return rgb.tobytes()
        amap = np.full(256, 255, np.uint8)
        if trns:
            amap[: len(trns)] = np.frombuffer(trns, np.uint8)
        return np.concatenate([rgb, amap[idx][:, None]], axis=1).tobytes()
    if depth == 16:
        arr = np.frombuffer(bytes(line), np.uint8)
        vals = arr[0::2]  # high byte == the spec's 16->8 scaling
        raw = arr[0::2].astype(np.int32) * 256 + arr[1::2]
    elif depth < 8:  # sub-byte gray: scale to full 8-bit range
        mask = (1 << depth) - 1
        idx = _unpack_bits(line, width, depth)
        vals = (idx.astype(np.int32) * 255 // mask).astype(np.uint8)
        raw = idx.astype(np.int32)
    else:
        vals = np.frombuffer(bytes(line), np.uint8)
        raw = vals.astype(np.int32)
    if trns is None or ctype not in (0, 2):
        return vals.tobytes()
    # tRNS on gray/RGB: one transparent color (given at source depth)
    key = np.array(
        struct.unpack(f">{len(trns) // 2}H", trns), np.int32
    )
    match = np.all(raw.reshape(width, channels) == key, axis=1)
    out = np.empty((width, out_channels), np.uint8)
    out[:, :channels] = vals.reshape(width, channels)
    out[:, channels] = np.where(match, 0, 255)
    return out.tobytes()


def decode_png_raw(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode a NON-interlaced PNG to its RAW unfiltered scanline
    samples: ``(width, height, bit_depth, channels, bytes)`` with no
    8-bit normalization (16-bit samples stay big-endian pairs,
    sub-byte rows stay packed with their padding).  The entry point
    data-carrying PNG payloads need — GRIB2 template 5.41
    (sources/grib2.py) stores packed field integers as PNG samples,
    where normalization would destroy the values."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = depth = ctype = -1
    interlace = 0
    idat = bytearray()
    seen_end = False
    while pos < len(data) and not seen_end:
        if pos + 8 > len(data):
            raise ValueError("corrupt PNG: truncated chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise ValueError("corrupt PNG: truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if comp != 0 or filt != 0:
                raise ValueError(
                    "unsupported PNG: nonzero compression/filter method"
                )
            if interlace != 0:
                raise ValueError("raw decode: interlaced PNG")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG: color type {ctype}")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            seen_end = True
        pos += 12 + length
    if ctype < 0 or not seen_end:
        raise ValueError("corrupt PNG: missing IHDR/IEND")
    channels = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = (width * channels * depth + 7) // 8
    bpp = max(1, channels * depth // 8)
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    for _ in range(height):
        if pos + 1 + stride > len(raw):
            raise ValueError("corrupt PNG: truncated scanline")
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        _unfilter_line(ftype, line, prev, bpp)
        prev = bytes(line)
        out += line
    return width, height, depth, channels, bytes(out)


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixels)`` —
    NORMALIZED 8-bit interleaved samples, scanlines top-to-bottom (see
    module docstring for the palette/16-bit/sub-byte normalization).
    CRCs are verified; unsupported spec corners raise ``ValueError``
    naming the feature."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = depth = ctype = -1
    interlace = 0
    palette: bytes | None = None
    trns: bytes | None = None
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
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG: color type {ctype}")
            if depth not in _ALLOWED_DEPTHS[ctype]:
                raise ValueError(
                    f"unsupported PNG: bit depth {depth} for color type {ctype}"
                )
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG: nonzero compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"unsupported PNG: interlace method {interlace}")
        elif tag == b"PLTE":
            if length % 3 or length > 768:
                raise ValueError("corrupt PNG: bad PLTE length")
            palette = bytes(payload)
        elif tag == b"tRNS":
            trns = bytes(payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            seen_end = True
        # other ancillary chunks (tEXt, pHYs, ...) are skipped
        pos += 12 + length
    if ctype < 0:
        raise ValueError("corrupt PNG: missing IHDR")
    if not seen_end:
        raise ValueError("corrupt PNG: missing IEND")
    if ctype == 3 and palette is None:
        raise ValueError("corrupt PNG: color type 3 without PLTE")

    channels = _CHANNELS[ctype]
    if ctype == 3:
        out_channels = 4 if trns else 3
    elif trns is not None and ctype in (0, 2):
        out_channels = channels + 1
    else:
        out_channels = channels

    raw = zlib.decompress(bytes(idat))
    bpp = max(1, channels * depth // 8)

    if interlace == 1:  # Adam7: 7 independently-filtered sub-images
        out = np.zeros((height, width, out_channels), np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            w_p = max(0, (width - x0 + dx - 1) // dx)
            h_p = max(0, (height - y0 + dy - 1) // dy)
            if w_p == 0 or h_p == 0:
                continue
            stride_p = (w_p * channels * depth + 7) // 8
            prev = bytes(stride_p)
            for i in range(h_p):
                if pos + 1 + stride_p > len(raw):
                    raise ValueError("corrupt PNG: truncated interlace pass")
                ftype = raw[pos]
                line = bytearray(raw[pos + 1 : pos + 1 + stride_p])
                pos += 1 + stride_p
                _unfilter_line(ftype, line, prev, bpp)
                prev = bytes(line)
                exp = np.frombuffer(
                    _expand_scanline(
                        line, w_p, depth, ctype, palette, trns, out_channels
                    ),
                    np.uint8,
                ).reshape(w_p, out_channels)
                out[y0 + i * dy, x0::dx, :] = exp
        if pos != len(raw):
            raise ValueError("corrupt PNG: interlace data length mismatch")
        return width, height, out_channels, out.tobytes()

    packed_stride = (width * channels * depth + 7) // 8
    if len(raw) != (packed_stride + 1) * height:
        raise ValueError(
            f"corrupt PNG: inflated to {len(raw)} bytes, "
            f"want {(packed_stride + 1) * height}"
        )
    out = bytearray(width * out_channels * height)
    out_stride = width * out_channels
    prev = bytes(packed_stride)
    for y in range(height):
        ftype = raw[y * (packed_stride + 1)]
        line = bytearray(
            raw[y * (packed_stride + 1) + 1 : (y + 1) * (packed_stride + 1)]
        )
        _unfilter_line(ftype, line, prev, bpp)
        prev = bytes(line)
        out[y * out_stride : (y + 1) * out_stride] = _expand_scanline(
            line, width, depth, ctype, palette, trns, out_channels
        )
    return width, height, out_channels, bytes(out)
