"""Pure-stdlib GIF codec (GIF87a/GIF89a, LZW) for the multimodal path.

North-star multimodal surface (no reference counterpart — the
reference engine at ``wrf_voronoi.py`` has no image path): GIF remains
ubiquitous in web-crawl corpora (icons, banners, animations), so the
engine's decode dispatch must handle it natively.  Implemented from
the public GIF89a specification (CompuServe, 1990) and the GIF LZW
variant description therein:

- ``gif_info``: header triage — version, logical-screen dimensions,
  global-color-table size, frame count, interlace/transparency flags —
  without decoding any pixel data (container-walk only, skips LZW
  sub-blocks by length).
- ``decode_gif``: full first-frame decode — variable-width LSB-first
  LZW (code widths 3..12, clear/EOI handling, deferred-clear
  tolerance), global and local color tables, the 4-pass interlace row
  ordering, GIF89a graphic-control transparency (transparent index →
  RGBA, otherwise RGB), and frames smaller than / offset inside the
  logical screen (composited over the background index).
- ``encode_gif``: real encoder for palette-indexed buffers — LZW with
  table resets at 4095, optional interlace, optional transparent
  index (emits a GCE), power-of-two-padded color tables.

Like ``sources/png.py`` / ``jpeg.py`` / ``webp.py``, the codec runs
inside Arrow ``mapInPandas`` batches (one image per call), spread
across executors by the repartition in ``operators/multimodal.py``.
"""

from __future__ import annotations

import struct

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    """Row output order of an interlaced frame: the n-th decoded row
    lands at ``order[n]`` in the final image."""
    return [
        y for start, step in _INTERLACE_PASSES for y in range(start, height, step)
    ]


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, LSB-first, clear/EOI codes)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        d, p = self.data, self.pos
        byte, bit = p >> 3, p & 7
        # codes are at most 12 bits -> span at most 3 bytes
        chunk = int.from_bytes(d[byte : byte + 3], "little")
        self.pos = p + n
        return (chunk >> bit) & ((1 << n) - 1)

    def remaining(self) -> int:
        return len(self.data) * 8 - self.pos


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width starting at
    ``min_code_size + 1``, growing when the table fills the current
    width, capped at 12 bits; CLEAR resets, EOI terminates.  Tolerates
    encoders that defer the clear past a full table (table simply
    stops growing, per the spec's deferred-clear note)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    roots = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    out: list[bytes] = []
    while br.remaining() >= width:
        code = br.read(width)
        if code == clear:
            table = list(roots) + [b"", b""]  # roots + clear + eoi slots
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if not table:
                # stream must start with CLEAR per spec, but some
                # encoders omit it; initialize implicitly
                table = list(roots) + [b"", b""]
            if code >= len(table):
                raise ValueError("LZW: first code not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} beyond table size {len(table)}")
        out.append(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return b"".join(out)


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`lzw_decode`: emits CLEAR up front, resets the
    table whenever it reaches 4095 entries (so the decoder never sees
    the deferred-clear corner from our own streams), EOI at the end."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits: list[tuple[int, int]] = []  # (code, width)

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    # Width lockstep: the decoder allocates the entry for our emission
    # e_{k} only while reading e_{k+1}, so at the moment it has read a
    # code its table size equals OUR next_code at the start of that
    # emission step — it widens exactly when that next_code == 1<<width.
    # Hence: emit with the current width, THEN widen on that test, THEN
    # allocate this step's new entry.
    table, next_code, width = fresh()
    bits.append((clear, width))
    s = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if s + c in table:
            s = s + c
            continue
        bits.append((table[s], width))
        if next_code == (1 << width) and width < 12:
            width += 1
        table[s + c] = next_code
        next_code += 1
        s = c
        if next_code == 4096:
            bits.append((clear, width))
            table, next_code, width = fresh()
    if s:
        bits.append((table[s], width))
        if next_code == (1 << width) and width < 12:
            width += 1  # the decoder widens before reading our EOI
    bits.append((eoi, width))
    # pack LSB-first
    acc = 0
    nacc = 0
    out = bytearray()
    for code, w in bits:
        acc |= code << nacc
        nacc += w
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container


def _sub_blocks(b: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``off``; returns
    (payload, offset past the block terminator)."""
    parts = []
    while True:
        if off >= len(b):
            raise ValueError("truncated GIF: unterminated sub-blocks")
        n = b[off]
        off += 1
        if n == 0:
            return b"".join(parts), off
        parts.append(b[off : off + n])
        if len(b[off : off + n]) < n:
            raise ValueError("truncated GIF: short sub-block")
        off += n


def _skip_sub_blocks(b: bytes, off: int) -> int:
    while True:
        if off >= len(b):
            raise ValueError("truncated GIF: unterminated sub-blocks")
        n = b[off]
        off += 1
        if n == 0:
            return off
        off += n


def _header(b: bytes):
    if b[:3] != b"GIF" or b[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF stream")
    if len(b) < 13:
        raise ValueError("truncated GIF: short header")
    version = b[3:6].decode()
    w, h = struct.unpack_from("<HH", b, 6)
    packed = b[10]
    bg_index = b[11]
    gct_flag = bool(packed & 0x80)
    gct_size = 2 << (packed & 0x07) if gct_flag else 0
    off = 13
    gct = b[off : off + 3 * gct_size] if gct_flag else b""
    if gct_flag and len(gct) < 3 * gct_size:
        raise ValueError("truncated GIF: short global color table")
    off += 3 * gct_size
    return version, w, h, bg_index, gct, off


def gif_info(b: bytes) -> dict:
    """Container triage without LZW decode: walks every block, counts
    frames, and reports screen dims + table sizes + flags."""
    version, w, h, bg_index, gct, off = _header(b)
    n_frames = 0
    interlaced = False
    transparent = False
    while off < len(b):
        t = b[off]
        if t == 0x3B:  # trailer
            break
        if t == 0x21:  # extension
            if off + 2 >= len(b):
                raise ValueError("truncated GIF: short extension")
            label = b[off + 1]
            if label == 0xF9 and b[off + 2] >= 4:
                if off + 3 >= len(b):
                    raise ValueError("truncated GIF: short GCE block")
                transparent = transparent or bool(b[off + 3] & 0x01)
            off = _skip_sub_blocks(b, off + 2)
        elif t == 0x2C:  # image descriptor
            if off + 10 > len(b):
                raise ValueError("truncated GIF: short image descriptor")
            packed = b[off + 9]
            interlaced = interlaced or bool(packed & 0x40)
            lct_size = 2 << (packed & 0x07) if packed & 0x80 else 0
            off += 10 + 3 * lct_size
            off += 1  # LZW min code size
            off = _skip_sub_blocks(b, off)
            n_frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{t:02x}")
    return {
        "version": version,
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "gct_colors": len(gct) // 3,
        "interlaced": interlaced,
        "transparent": transparent,
    }


def decode_gif(b: bytes) -> tuple[int, int, int, bytes]:
    """Decode the FIRST frame to (width, height, channels, pixels):
    RGB when no transparency is declared, RGBA otherwise.  The frame is
    composited into the logical screen (background index outside the
    frame rect, per the spec's disposal baseline)."""
    version, sw, sh, bg_index, gct, off = _header(b)
    transparent_idx = -1
    while off < len(b):
        t = b[off]
        if t == 0x3B:
            raise ValueError("GIF has no image frame")
        if t == 0x21:
            if off + 2 >= len(b):
                raise ValueError("truncated GIF: short extension")
            label = b[off + 1]
            if label == 0xF9 and b[off + 2] >= 4:
                if off + 7 > len(b):
                    raise ValueError("truncated GIF: short GCE")
                packed = b[off + 3]
                if packed & 0x01:
                    transparent_idx = b[off + 6]
            off = _skip_sub_blocks(b, off + 2)
            continue
        if t != 0x2C:
            raise ValueError(f"unknown GIF block 0x{t:02x}")
        if off + 11 > len(b):
            raise ValueError("truncated GIF: short image descriptor")
        left, top, fw, fh = struct.unpack_from("<HHHH", b, off + 1)
        packed = b[off + 9]
        interlaced = bool(packed & 0x40)
        lct_size = 2 << (packed & 0x07) if packed & 0x80 else 0
        off += 10
        lct = b[off : off + 3 * lct_size]
        off += 3 * lct_size
        mcs = b[off]
        off += 1
        payload, off = _sub_blocks(b, off)
        idx = lzw_decode(payload, mcs)
        if len(idx) < fw * fh:
            raise ValueError(
                f"GIF frame under-decoded: {len(idx)} < {fw}x{fh}"
            )
        idx = idx[: fw * fh]
        table = lct if lct else gct
        if not table:
            raise ValueError("GIF frame has no color table")
        n_colors = len(table) // 3
        if interlaced:
            deint = bytearray(fw * fh)
            for n, y in enumerate(_interlace_order(fh)):
                deint[y * fw : (y + 1) * fw] = idx[n * fw : (n + 1) * fw]
            idx = bytes(deint)
        # composite into the logical screen
        screen = bytearray([bg_index]) * (sw * sh)
        for y in range(fh):
            if top + y >= sh:
                break
            row = idx[y * fw : y * fw + min(fw, sw - left)]
            screen[(top + y) * sw + left : (top + y) * sw + left + len(row)] = row
        channels = 4 if transparent_idx >= 0 else 3
        out = bytearray(sw * sh * channels)
        for i, ci in enumerate(screen):
            if ci >= n_colors:
                raise ValueError(f"palette index {ci} >= {n_colors} colors")
            out[i * channels : i * channels + 3] = table[3 * ci : 3 * ci + 3]
            if channels == 4:
                out[i * channels + 3] = 0 if ci == transparent_idx else 255
        return sw, sh, channels, bytes(out)
    raise ValueError("GIF has no image frame")


def encode_gif(
    indices: bytes,
    width: int,
    height: int,
    palette: bytes,
    interlace: bool = False,
    transparent: int | None = None,
) -> bytes:
    """Encode a palette-indexed buffer as a single-frame GIF89a with a
    global color table.  ``palette`` is RGB triplets; it is padded to
    the next power of two (min 2) as the format requires."""
    if len(indices) != width * height:
        raise ValueError("indices length != width*height")
    n_colors = len(palette) // 3
    if n_colors < 1 or n_colors > 256 or len(palette) % 3:
        raise ValueError("palette must be 1..256 RGB triplets")
    if max(indices, default=0) >= n_colors:
        raise ValueError("palette index out of range")
    size_exp = 0
    while (2 << size_exp) < n_colors:
        size_exp += 1
    padded = 2 << size_exp
    gct = palette + b"\x00" * (3 * (padded - n_colors))
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | ((7) << 4) | size_exp, 0, 0])  # GCT flag, bg=0
    out += gct
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent & 0xFF, 0])
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes([0x40 if interlace else 0x00])
    if interlace:
        reordered = bytearray()
        for y in _interlace_order(height):
            reordered += indices[y * width : (y + 1) * width]
        indices = bytes(reordered)
    mcs = max(2, size_exp + 1)
    out += bytes([mcs])
    payload = lzw_encode(indices, mcs)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)
