"""Pure-stdlib BMP (Windows DIB) and netpbm (PGM/PPM) codecs.

North-star multimodal surface: BMP remains common in scraped archives
and netpbm is the interchange format of classic vision datasets; both
decode/encode natively here.  Implemented from the public
BITMAPINFOHEADER layout and the netpbm format descriptions:

- ``decode_bmp`` / ``encode_bmp``: BITMAPINFOHEADER (40-byte) DIBs —
  24-bit BGR and 8-bit paletted, bottom-up AND top-down (negative
  height) row orders, 4-byte row padding, BI_RGB (0) and BI_RLE8 (1)
  compressions (RLE8 runs, absolute mode with word alignment,
  end-of-line/bitmap and delta escapes).
- ``decode_pnm`` / ``encode_pnm``: binary PGM (P5) / PPM (P6) with
  whitespace/comment-tolerant headers, maxval 255.

Both are transparent containers + a trivial RLE, so the hand goldens
in ``tests/test_bmp.py`` pin them completely.  Dispatched on magic
bytes by ``operators/multimodal.py`` like the other codecs.
"""

from __future__ import annotations

import struct


def decode_bmp(b: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels): 24-bit -> RGB rows
    top-to-bottom; 8-bit palette expands to RGB."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP stream")
    if len(b) < 54:
        raise ValueError("truncated BMP: short header")
    (data_off,) = struct.unpack("<I", b[10:14])
    (hdr_size,) = struct.unpack("<I", b[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP: header size {hdr_size}")
    w, h = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    (comp,) = struct.unpack("<I", b[30:34])
    (colors_used,) = struct.unpack("<I", b[46:50])
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("corrupt BMP: bad dimensions")
    if bpp not in (8, 24):
        raise ValueError(f"unsupported BMP: {bpp}-bit pixels")
    if comp not in (0, 1) or (comp == 1 and bpp != 8):
        raise ValueError(f"unsupported BMP: compression {comp}")
    palette = None
    if bpp == 8:
        n = colors_used or 256
        pal_off = 14 + hdr_size
        pal = b[pal_off : pal_off + 4 * n]
        if len(pal) < 4 * n:
            raise ValueError("truncated BMP: short palette")
        palette = [(pal[4 * i + 2], pal[4 * i + 1], pal[4 * i]) for i in
                   range(n)]
    if comp == 1:
        idx = _rle8_decode(b[data_off:], w, h)
    else:
        stride = (w * (bpp // 8) + 3) & ~3
        need = stride * h
        raw = b[data_off : data_off + need]
        if len(raw) < need:
            raise ValueError("truncated BMP: short pixel data")
        rows = [raw[y * stride : y * stride + w * (bpp // 8)]
                for y in range(h)]
        if not top_down:
            rows.reverse()
        if bpp == 24:
            out = bytearray(w * h * 3)
            i = 0
            for row in rows:
                for x in range(w):
                    out[i] = row[3 * x + 2]
                    out[i + 1] = row[3 * x + 1]
                    out[i + 2] = row[3 * x]
                    i += 3
            return w, h, 3, bytes(out)
        idx = b"".join(rows)
        if top_down is False:
            pass  # already display order
    if comp == 1 and not top_down:
        # RLE8 data is stored bottom-up like uncompressed
        rows = [idx[y * w : (y + 1) * w] for y in range(h)]
        rows.reverse()
        idx = b"".join(rows)
    out = bytearray(w * h * 3)
    for i, v in enumerate(idx):
        if v >= len(palette):
            raise ValueError(f"corrupt BMP: palette index {v}")
        out[3 * i : 3 * i + 3] = bytes(palette[v])
    return w, h, 3, bytes(out)


def _rle8_decode(data: bytes, w: int, h: int) -> bytes:
    out = bytearray(w * h)
    x = y = pos = 0
    while pos + 1 < len(data):
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n:
            for _ in range(n):
                if x < w and y < h:
                    out[y * w + x] = v
                x += 1
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return bytes(out)
        elif v == 2:  # delta
            if pos + 2 > len(data):
                raise ValueError("truncated BMP: short RLE delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: v literal bytes, word-aligned
            if pos + v > len(data):
                raise ValueError("truncated BMP: short RLE literal")
            for k in range(v):
                if x < w and y < h:
                    out[y * w + x] = data[pos + k]
                x += 1
            pos += v + (v & 1)
    raise ValueError("truncated BMP: RLE without end-of-bitmap")


def encode_bmp(
    pixels: bytes, width: int, height: int, channels: int = 3,
    palette: list[tuple[int, int, int]] | None = None,
    rle: bool = False, top_down: bool = False,
) -> bytes:
    """RGB (channels=3, BI_RGB) or paletted 8-bit (palette given,
    pixels are indices; optional BI_RLE8)."""
    if palette is None:
        if channels != 3 or len(pixels) != width * height * 3:
            raise ValueError("RGB BMP needs width*height*3 bytes")
        if rle:
            raise ValueError("RLE8 requires a palette")
        stride = (width * 3 + 3) & ~3
        rows = []
        for y in range(height):
            r = bytearray()
            for x in range(width):
                i = (y * width + x) * 3
                r += bytes([pixels[i + 2], pixels[i + 1], pixels[i]])
            r += b"\x00" * (stride - width * 3)
            rows.append(bytes(r))
        if not top_down:
            rows.reverse()
        data = b"".join(rows)
        bpp, ncol, pal_bytes = 24, 0, b""
        comp = 0
    else:
        if len(pixels) != width * height:
            raise ValueError("paletted BMP needs width*height index bytes")
        if max(pixels, default=0) >= len(palette):
            raise ValueError("palette index out of range")
        ncol = len(palette)
        pal_bytes = b"".join(
            bytes([c[2], c[1], c[0], 0]) for c in palette
        )
        rows = [pixels[y * width : (y + 1) * width] for y in range(height)]
        if not top_down:
            rows.reverse()
        if rle:
            data = _rle8_encode(rows, width)
            comp = 1
        else:
            stride = (width + 3) & ~3
            data = b"".join(
                r + b"\x00" * (stride - width) for r in rows
            )
            comp = 0
        bpp = 8
    data_off = 54 + len(pal_bytes)
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(data), 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, -height if top_down else height,
        1, bpp, comp, len(data), 2835, 2835, ncol, 0,
    )
    return hdr + dib + pal_bytes + data


def _rle8_encode(rows: list[bytes], w: int) -> bytes:
    out = bytearray()
    for ri, row in enumerate(rows):
        x = 0
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            out += bytes([run, row[x]])
            x += run
        out += b"\x00\x00"  # end of line
    out[-2:] = b"\x00\x01"  # last EOL becomes end of bitmap
    return bytes(out)


# ---------------------------------------------------------------------------
# netpbm (PGM P5 / PPM P6)


def decode_pnm(b: bytes) -> tuple[int, int, int, bytes]:
    if b[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM stream")
    channels = 1 if b[:2] == b"P5" else 3
    pos = 2
    vals = []
    while len(vals) < 3:
        if pos >= len(b):
            raise ValueError("truncated PNM: short header")
        c = b[pos : pos + 1]
        if c == b"#":
            nl = b.find(b"\n", pos)
            if nl < 0:
                raise ValueError("truncated PNM: unterminated comment")
            pos = nl + 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            end = pos
            while end < len(b) and b[end : end + 1].isdigit():
                end += 1
            vals.append(int(b[pos:end]))
            pos = end
        else:
            raise ValueError(f"corrupt PNM: unexpected byte {c!r}")
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PNM: maxval {maxval}")
    pos += 1  # single whitespace after maxval
    need = w * h * channels
    px = b[pos : pos + need]
    if len(px) < need:
        raise ValueError("truncated PNM: short pixel data")
    return w, h, channels, px


def encode_pnm(pixels: bytes, width: int, height: int,
               channels: int = 1) -> bytes:
    if channels not in (1, 3):
        raise ValueError("PNM channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    magic = b"P5" if channels == 1 else b"P6"
    return magic + f"\n{width} {height}\n255\n".encode() + pixels
