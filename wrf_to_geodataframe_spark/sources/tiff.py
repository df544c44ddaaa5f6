"""Pure-stdlib baseline TIFF codec (TIFF 6.0) for the multimodal path.

North-star multimodal surface (no reference counterpart): TIFF is the
dominant container for scanned-document corpora, so the engine's
decode dispatch should read the baseline profile natively.
Implemented from the public TIFF 6.0 specification (Adobe, 1992):

- ``tiff_info``: header/IFD triage — byte order, dimensions, bits per
  sample, samples per pixel, compression, photometric — without
  decoding strip data.
- ``decode_tiff``: baseline strip-based decode — uncompressed (1),
  PackBits (32773), TIFF-LZW (5: MSB-first bit packing with the
  spec's EARLY code-width change at 511/1023/2047), and Deflate
  (8 / old-style 32946, via zlib) — with the horizontal-differencing
  predictor (tag 317 = 2), photometric 0/1 grayscale (MinIsWhite
  inverted), 2 RGB(A), 3 palette (16-bit color map entries scaled to
  8-bit), 1/4/8-bit samples, chunky planar config, and both byte
  orders ("II" and "MM").
- ``encode_tiff``: single-IFD chunky writer (gray/RGB/RGBA, 8-bit)
  with the same four compressions and optional predictor — enough to
  round-trip any buffer bit-exactly and to drive every decoder branch
  from tests.

Interop is validated against the system libtiff in
``tests/test_tiff_interop.py`` (skips when absent).  Like the other
codecs, this runs inside Arrow ``mapInPandas`` batches via
``operators/multimodal.py``.
"""

from __future__ import annotations

import struct
import zlib

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320
_TAG_SAMPLE_FORMAT = 339

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}


def _read_ifd(b: bytes, eb: str):
    """Parse the first IFD into {tag: [values]}."""
    (off,) = struct.unpack(eb + "I", b[4:8])
    if off + 2 > len(b):
        raise ValueError("truncated TIFF: bad IFD offset")
    (n,) = struct.unpack(eb + "H", b[off : off + 2])
    tags: dict[int, list] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(b):
            raise ValueError("truncated TIFF: short IFD")
        tag, typ, cnt = struct.unpack(eb + "HHI", b[e : e + 8])
        sz = _TYPE_SIZES.get(typ)
        if sz is None:
            continue  # unknown type: skip per spec
        total = sz * cnt
        if total <= 4:
            data = b[e + 8 : e + 8 + total]
        else:
            (voff,) = struct.unpack(eb + "I", b[e + 8 : e + 12])
            data = b[voff : voff + total]
            if len(data) < total:
                raise ValueError("truncated TIFF: value out of range")
        if typ in (1, 6, 7):
            vals = list(data)
        elif typ == 3:
            vals = list(struct.unpack(eb + f"{cnt}H", data))
        elif typ in (4, 9):
            vals = list(struct.unpack(eb + f"{cnt}I", data))
        elif typ == 8:
            vals = list(struct.unpack(eb + f"{cnt}h", data))
        elif typ in (5, 10):
            vals = list(struct.unpack(eb + f"{2 * cnt}I", data))
        elif typ == 11:
            vals = list(struct.unpack(eb + f"{cnt}f", data))
        elif typ == 12:
            vals = list(struct.unpack(eb + f"{cnt}d", data))
        else:  # ASCII
            vals = [data]
        tags[tag] = vals
    return tags


def _header(b: bytes) -> str:
    if b[:2] == b"II" and b[2:4] == b"\x2a\x00":
        return "<"
    if b[:2] == b"MM" and b[2:4] == b"\x00\x2a":
        return ">"
    raise ValueError("not a TIFF stream")


def tiff_info(b: bytes) -> dict:
    eb = _header(b)
    t = _read_ifd(b, eb)
    return {
        "byte_order": "II" if eb == "<" else "MM",
        "width": t.get(_TAG_WIDTH, [0])[0],
        "height": t.get(_TAG_HEIGHT, [0])[0],
        "bits_per_sample": t.get(_TAG_BITS, [1]),
        "samples_per_pixel": t.get(_TAG_SPP, [1])[0],
        "compression": t.get(_TAG_COMPRESSION, [1])[0],
        "photometric": t.get(_TAG_PHOTOMETRIC, [1])[0],
        "n_strips": len(t.get(_TAG_STRIP_OFFSETS, [])),
    }


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 section 9)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            if i + n + 1 > len(data):
                raise ValueError("truncated TIFF: short PackBits literal")
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("truncated TIFF: short PackBits run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i = j + 1
            continue
        # literal stretch until next run of >= 3 (or 2 at buffer end)
        lit = i
        while lit < n and lit - i < 128:
            if (lit + 2 < n and data[lit] == data[lit + 1] == data[lit + 2]):
                break
            lit += 1
        out += bytes([lit - i - 1]) + data[i:lit]
        i = lit
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF-LZW (section 13): MSB-first, 9..12-bit codes, EARLY width change


def tlzw_decode(data: bytes, expected: int) -> bytes:
    CLEAR, EOI = 256, 257
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    out = bytearray()
    acc = nacc = pos = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected:
        while nacc < width:
            if pos >= len(data):
                return bytes(out[:expected])
            acc = (acc << 8) | data[pos]
            pos += 1
            nacc += 8
        code = (acc >> (nacc - width)) & ((1 << width) - 1)
        nacc -= width
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("TIFF LZW: first code not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW: code beyond table")
        out += entry
        prev = entry
        # EARLY change: widen one code sooner than GIF (at size-1)
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out[:expected])


def tlzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nacc = 0

    def put(code: int, width: int):
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = fresh()
    put(CLEAR, width)
    s = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if s + c in table:
            s += c
            continue
        put(table[s], width)
        # EARLY change: the decoder widens when its table size hits
        # (1<<width)-1 right after consuming our emission; its size at
        # that moment equals our next_code at the START of this step
        # (it allocates one step behind us) — widen before allocating
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        table[s + c] = next_code
        next_code += 1
        s = c
        if next_code == 4095:
            put(CLEAR, width)
            table, next_code, width = fresh()
    if s:
        put(table[s], width)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1  # the decoder widens before reading our EOI
    put(EOI, width)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _predict_decode(row: bytearray, spp: int) -> None:
    for i in range(spp, len(row)):
        row[i] = (row[i] + row[i - spp]) & 0xFF


def _predict_encode(row: bytes, spp: int) -> bytes:
    out = bytearray(row)
    for i in range(len(row) - 1, spp - 1, -1):
        out[i] = (row[i] - row[i - spp]) & 0xFF
    return bytes(out)


def decode_tiff(b: bytes) -> tuple[int, int, int, bytes]:
    """Decode the first IFD to (width, height, channels, pixels) with
    normalized 8-bit samples (palette expands to RGB, MinIsWhite
    inverts, sub-byte grayscale scales to full range)."""
    eb = _header(b)
    t = _read_ifd(b, eb)
    w = t.get(_TAG_WIDTH, [0])[0]
    h = t.get(_TAG_HEIGHT, [0])[0]
    if not w or not h:
        raise ValueError("corrupt TIFF: missing dimensions")
    spp = t.get(_TAG_SPP, [1])[0]
    bits = t.get(_TAG_BITS, [1] * spp)
    comp = t.get(_TAG_COMPRESSION, [1])[0]
    photo = t.get(_TAG_PHOTOMETRIC, [1])[0]
    planar = t.get(_TAG_PLANAR, [1])[0]
    pred = t.get(_TAG_PREDICTOR, [1])[0]
    fmt = t.get(_TAG_SAMPLE_FORMAT, [1])[0]
    if planar != 1:
        raise ValueError(f"unsupported TIFF: planar config {planar}")
    if fmt != 1:
        raise ValueError(f"unsupported TIFF: sample format {fmt}")
    if len(set(bits)) != 1:
        raise ValueError(f"unsupported TIFF: mixed bits {bits}")
    depth = bits[0]
    if depth not in (1, 4, 8):
        raise ValueError(f"unsupported TIFF: {depth}-bit samples")
    if depth != 8 and spp != 1:
        raise ValueError("unsupported TIFF: sub-byte multi-sample")
    if pred not in (1, 2):
        raise ValueError(f"unsupported TIFF: predictor {pred}")
    if pred == 2 and depth != 8:
        raise ValueError("unsupported TIFF: predictor on sub-byte data")
    offs = t.get(_TAG_STRIP_OFFSETS, [])
    cnts = t.get(_TAG_STRIP_COUNTS, [])
    if not offs or len(offs) != len(cnts):
        raise ValueError("corrupt TIFF: bad strip tables")
    rps = t.get(_TAG_ROWS_PER_STRIP, [h])[0] or h
    row_bytes = (w * spp * depth + 7) // 8
    rows = []
    for si, (o, c) in enumerate(zip(offs, cnts)):
        nrows = min(rps, h - si * rps)
        if nrows <= 0:
            break
        raw = b[o : o + c]
        if len(raw) < c:
            raise ValueError("truncated TIFF: short strip")
        expected = row_bytes * nrows
        if comp == 1:
            data = raw[:expected]
            if len(data) < expected:
                raise ValueError("truncated TIFF: short strip data")
        elif comp == 32773:
            data = packbits_decode(raw, expected)
        elif comp == 5:
            data = tlzw_decode(raw, expected)
        elif comp in (8, 32946):
            data = zlib.decompress(raw)[:expected]
        else:
            raise ValueError(f"unsupported TIFF: compression {comp}")
        if len(data) < expected:
            raise ValueError("truncated TIFF: strip under-decoded")
        for r in range(nrows):
            row = bytearray(data[r * row_bytes : (r + 1) * row_bytes])
            if pred == 2:
                _predict_decode(row, spp)
            rows.append(bytes(row))
    if len(rows) < h:
        raise ValueError("truncated TIFF: missing rows")
    # normalize to 8-bit samples
    if depth != 8:
        unpacked = []
        for row in rows[:h]:
            vals = []
            for byte in row:
                for k in range(8 // depth):
                    vals.append(
                        (byte >> (8 - depth * (k + 1))) & ((1 << depth) - 1)
                    )
            unpacked.append(vals[:w])
        if photo == 3:
            # sub-byte palette: expand RAW indices through the colormap,
            # never the grayscale-scaled values (they would index past
            # the table or hit the wrong entry entirely)
            cmap = t.get(_TAG_COLORMAP)
            if not cmap or len(cmap) < 3 * (1 << depth):
                raise ValueError("corrupt TIFF: missing color map")
            n = 1 << depth
            out = bytearray(w * h * 3)
            i = 0
            for vals in unpacked:
                for v in vals:
                    out[3 * i] = cmap[v] >> 8
                    out[3 * i + 1] = cmap[n + v] >> 8
                    out[3 * i + 2] = cmap[2 * n + v] >> 8
                    i += 1
            return w, h, 3, bytes(out)
        scale = 255 // ((1 << depth) - 1)
        rows = [bytes(v * scale for v in vals) for vals in unpacked]
        if photo == 0:
            rows = [bytes(255 - v for v in row) for row in rows]
        return w, h, 1, b"".join(rows)
    px = b"".join(rows[:h])
    if photo == 3:
        cmap = t.get(_TAG_COLORMAP)
        if not cmap or len(cmap) < 3 * (1 << depth):
            raise ValueError("corrupt TIFF: missing color map")
        n = 1 << depth
        out = bytearray(w * h * 3)
        for i, v in enumerate(px):
            out[3 * i] = cmap[v] >> 8
            out[3 * i + 1] = cmap[n + v] >> 8
            out[3 * i + 2] = cmap[2 * n + v] >> 8
        return w, h, 3, bytes(out)
    if photo == 0:  # MinIsWhite
        px = bytes(255 - v for v in px)
    return w, h, spp, px


def encode_tiff(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int = 0,
    big_endian: bool = False,
) -> bytes:
    """Encode 8-bit chunky pixels as a single-IFD TIFF (gray / RGB /
    RGBA), compression 1 / 5 / 8 / 32773, optional horizontal
    predictor, multiple strips when ``rows_per_strip`` is set."""
    if channels not in (1, 3, 4):
        raise ValueError(f"channels must be 1/3/4, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    if compression not in (1, 5, 8, 32773):
        raise ValueError(f"unsupported compression {compression}")
    eb = ">" if big_endian else "<"
    rps = rows_per_strip or height
    row_bytes = width * channels
    strips = []
    for y0 in range(0, height, rps):
        nrows = min(rps, height - y0)
        rows = []
        for r in range(nrows):
            row = pixels[(y0 + r) * row_bytes : (y0 + r + 1) * row_bytes]
            if predictor == 2:
                row = _predict_encode(row, channels)
            rows.append(row)
        data = b"".join(rows)
        if compression == 5:
            data = tlzw_encode(data)
        elif compression == 8:
            data = zlib.compress(data)
        elif compression == 32773:
            data = packbits_encode(data)
        strips.append(data)

    photo = 1 if channels == 1 else 2
    entries = []  # (tag, type, count, value-bytes or int list)

    def short(v):
        return (3, 1, [v])

    def longv(v):
        return (4, 1, [v])

    tags = {
        _TAG_WIDTH: longv(width),
        _TAG_HEIGHT: longv(height),
        _TAG_BITS: (3, channels, [8] * channels),
        _TAG_COMPRESSION: short(compression),
        _TAG_PHOTOMETRIC: short(photo),
        _TAG_SPP: short(channels),
        _TAG_ROWS_PER_STRIP: longv(rps),
        _TAG_PLANAR: short(1),
    }
    if predictor == 2:
        tags[_TAG_PREDICTOR] = short(2)
    # layout: header(8) + IFD + values + strip data
    ntags = len(tags) + 2  # + offsets + counts
    ifd_off = 8
    ifd_size = 2 + 12 * ntags + 4
    val_off = ifd_off + ifd_size
    overflow = bytearray()

    def val_bytes(typ, vals):
        if typ == 3:
            return b"".join(struct.pack(eb + "H", v) for v in vals)
        return b"".join(struct.pack(eb + "I", v) for v in vals)

    # strip tables
    tags[_TAG_STRIP_COUNTS] = (4, len(strips), [len(s) for s in strips])
    # offsets filled after overflow area is sized — two passes
    placeholder = (4, len(strips), [0] * len(strips))
    tags[_TAG_STRIP_OFFSETS] = placeholder

    def build(tags):
        nonlocal overflow
        overflow = bytearray()
        out = bytearray()
        for tag in sorted(tags):
            typ, cnt, vals = tags[tag]
            vb = val_bytes(typ, vals)
            if len(vb) <= 4:
                out += struct.pack(eb + "HHI", tag, typ, cnt)
                out += vb + b"\x00" * (4 - len(vb))
            else:
                out += struct.pack(eb + "HHI", tag, typ, cnt)
                out += struct.pack(eb + "I", val_off + len(overflow))
                overflow += vb
        return out

    build(tags)  # size the overflow with placeholder offsets
    data_off = val_off + len(overflow)
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    tags[_TAG_STRIP_OFFSETS] = (4, len(strips), offsets)
    body = build(tags)
    out = bytearray()
    out += (b"II\x2a\x00" if eb == "<" else b"MM\x00\x2a")
    out += struct.pack(eb + "I", ifd_off)
    out += struct.pack(eb + "H", ntags) + body + struct.pack(eb + "I", 0)
    out += overflow
    for s in strips:
        out += s
    return bytes(out)
