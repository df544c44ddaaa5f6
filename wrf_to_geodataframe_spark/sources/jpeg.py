"""Pure-Python/numpy baseline JPEG codec (stdlib + numpy only — the
container has no pillow/cv2/libjpeg; companion to ``sources/png.py``).

Scope — DCT JPEG (JFIF), the encodings that dominate real web-crawl
corpora:

- Decoder: BASELINE (SOF0/1) and PROGRESSIVE (SOF2 — spectral
  selection AND successive approximation, any spec-legal scan script)
  via a two-phase design: every scan entropy-decodes into per-
  component coefficient arrays (DC first/refine, AC first with EOB
  runs, the G.1.2.3 correction-bit walk), and the image reconstructs
  once at EOI.  Grayscale and 3-component YCbCr with sampling factors
  up to 2x2 (4:4:4, 4:2:2, 4:2:0), byte stuffing, restart markers,
  canonical Huffman tables rebuilt from their (bits, values) wire
  form.  12-bit sample precision decodes on the SOF1/SOF2 paths
  (16-bit DQT entries, uint16-LE output), and LOSSLESS JPEG (SOF3,
  Annex H — all 7 predictors, point transform, 2..16-bit precision,
  1x1 sampling) decodes bit-exactly.  Arithmetic coding and
  hierarchical SOFs raise ``ValueError`` naming the feature.
- Encoders: baseline (grayscale or YCbCr 4:4:4 / 4:2:0, optional
  restart intervals) and progressive (DC + per-component AC band
  scans at successive precisions) — both emit the spec's Annex-K
  example quantization + Huffman tables (scaled by a quality factor)
  and reconstruct identical quantized coefficients, so baseline and
  progressive streams of the same image decode byte-identically (the
  equivalence the tests pin).  ``encode_jpeg_lossless`` (SOF3,
  bit-exact by construction) and ``encode_jpeg_ext12`` (12-bit
  SOF1 grayscale) round out the family.
- All quantization uses DETERMINISTIC round-half-away-from-zero, so
  encode -> decode is bit-reproducible across machines.

Exactness corner the gate row builds on: a constant 8x8 block with an
EVEN sample value survives the whole pipeline bit-exactly in grayscale
(DC = 8*(v-128) is float-exact, (v-128)/2 is an exact integer so
quantization at the luminance table's DC step 16 has no .5 boundary,
and the flat inverse DCT reproduces v) — so structured test images
have a closed-form decode the DuckDB oracle can state analytically,
while the general lossy path is pinned by PSNR and determinism goldens
in pytest.

Runs INSIDE Arrow ``mapInPandas`` batches like the PNG codec — one
Python worker per core transcodes a whole batch of payloads.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --------------------------------------------------------------------------
# Spec tables (JPEG Annex K examples — public standard)

# zigzag scan: ZIGZAG[i] = raster position of the i-th scanned coefficient
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: dct2(b) = C @ b @ C.T
_C = np.array(
    [
        [
            math.sqrt((1.0 if k == 0 else 2.0) / 8.0)
            * math.cos((2 * n + 1) * k * math.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _quant(D: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """Deterministic round-half-away-from-zero quantization."""
    return (np.sign(D) * np.floor(np.abs(D) / Q + 0.5)).astype(np.int32)


def _build_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    if len(vals) < sum(bits):
        raise ValueError("corrupt JPEG: truncated Huffman table")
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("corrupt JPEG: overfull Huffman table")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits, vals) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) -> symbol."""
    out = {}
    for sym, (code, length) in _build_codes(bits, vals).items():
        out[(length, code)] = sym
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos + 1 >= len(self.buf):
            raise ValueError("corrupt JPEG: truncated entropy data")
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:  # stuffed byte
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker reached mid-fill
                raise _RestartPending()
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Skip to just after the next RSTn marker, resetting bit state."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.buf):
            if (
                self.buf[self.pos] == 0xFF
                and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("corrupt JPEG: missing restart marker")


class _RestartPending(Exception):
    pass


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    if table is None:
        raise ValueError("corrupt JPEG: scan references a missing Huffman table")
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG: invalid Huffman code")


def _amplitude(v: int) -> tuple[int, int]:
    """-> (size category, amplitude bits) per the spec's signed coding."""
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


# --------------------------------------------------------------------------
# Encoder


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-style quality scaling of the Annex-K tables (50 = as-is)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((Q_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((Q_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int32), qc.astype(np.int32)


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    Q: np.ndarray,
    dc_codes,
    ac_codes,
    pred: int,
) -> int:
    D = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    q = _quant(D, Q).reshape(-1)[ZIGZAG]
    # DC difference
    diff = int(q[0]) - pred
    s, bits = _amplitude(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    w.write(bits, s)
    # AC run-length coding
    run = 0
    for i in range(1, 64):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s, bits = _amplitude(v)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(bits, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return int(q[0])


def _dht_segment(tc: int, th: int, bits, vals) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment(tq: int, Q: np.ndarray) -> bytes:
    payload = bytes([tq]) + bytes(int(Q.reshape(-1)[ZIGZAG][i]) for i in range(64))
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quality: int = 50,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode interleaved 8-bit pixels as baseline JFIF.

    ``channels`` 1 (grayscale) or 3 (RGB -> YCbCr).  ``subsample``:
    False -> 4:4:4, True or "420" -> 4:2:0 (2x2 mean), "422" -> 4:2:2
    (horizontal mean).  ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * channels}"
        )
    ql, qc = _scaled_tables(quality)
    img = np.frombuffer(bytes(pixels), np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [img[..., 0]]
        subsample = False

    # subsample: False/None -> 4:4:4, True/"420" -> 4:2:0, "422" -> 4:2:2
    if subsample in (False, None):
        hmax, vmax_ = 1, 1
    elif subsample in (True, "420"):
        hmax, vmax_ = 2, 2
    elif subsample == "422":
        hmax, vmax_ = 2, 1
    else:
        raise ValueError(f"subsample must be False/True/'420'/'422', got {subsample!r}")
    # sampling factors per component
    samp = [(hmax, vmax_)] + [(1, 1)] * (len(planes) - 1)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax_
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    def plane_for(ci: int) -> np.ndarray:
        p = planes[ci]
        if ci > 0 and hmax > 1:
            # pad to step multiples, then hmax x vmax_ mean
            ph = -(-p.shape[0] // vmax_) * vmax_
            pw = -(-p.shape[1] // hmax) * hmax
            pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge")
            p = pad.reshape(ph // vmax_, vmax_, pw // hmax, hmax).mean(axis=(1, 3))
        hs, vs = samp[ci]
        need_h = mcus_y * 8 * vs
        need_w = mcus_x * 8 * hs
        return np.pad(
            p,
            ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])),
            "edge",
        )

    padded = [plane_for(ci) for ci in range(len(planes))]

    dc_l = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    w = _BitWriter()
    preds = [0] * len(planes)
    entropy = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.flush()
                entropy += w.out
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                w = _BitWriter()
                preds = [0] * len(planes)
            for ci, p in enumerate(padded):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8]
                        Q = ql if ci == 0 else qc
                        dc = dc_l if ci == 0 else dc_c
                        ac = ac_l if ci == 0 else ac_c
                        preds[ci] = _encode_block(w, block, Q, dc, ac, preds[ci])
            mcu_count += 1
    w.flush()
    entropy += w.out

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, ql)
    if len(planes) > 1:
        out += _dqt_segment(1, qc)
    # SOF0
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if ncomp > 1:
        out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)



# --------------------------------------------------------------------------
# Decoder (two-phase: entropy-decode every scan into per-component
# coefficient arrays, then dequantize + IDCT once at EOI — the structure
# that makes BASELINE and PROGRESSIVE the same machinery: a baseline
# stream is simply one interleaved scan covering band 0..63 at full
# precision)


def _scan_decode_block(
    r: _BitReader,
    coef: np.ndarray,
    dct,
    act,
    ss: int,
    se: int,
    ah: int,
    al: int,
    pred: list,
    ci: int,
    eobrun: list,
) -> None:
    """Decode one block's contribution for the current scan into
    ``coef`` (a flat 64 int32 view in RASTER order; zigzag applied
    here).  Implements all four progressive scan kinds; a baseline
    scan is ss=0, se=63, ah=al=0."""
    if ss == 0:  # DC
        if ah == 0:  # first
            s = _decode_huff(r, dct)
            if s > 15:
                raise ValueError("corrupt JPEG: DC size category > 15")
            pred[ci] += _extend(r.read_bits(s), s)
            coef[0] = pred[ci] << al
        else:  # refinement: one raw bit
            coef[0] |= r.read_bit() << al
        if se == 0:
            return
    k = max(ss, 1)
    if ah == 0:  # AC first (and the baseline AC path: EOB0 == eobrun 0)
        if eobrun[0] > 0:
            eobrun[0] -= 1
            return
        while k <= se:
            rs = _decode_huff(r, act)
            rrun, s = rs >> 4, rs & 0x0F
            if s == 0:
                if rrun == 15:  # ZRL
                    k += 16
                    continue
                eobrun[0] = (1 << rrun) - 1 + r.read_bits(rrun)
                return
            k += rrun
            if k > se:
                raise ValueError("corrupt JPEG: AC index overflow")
            coef[ZIGZAG[k]] = _extend(r.read_bits(s), s) << al
            k += 1
        return
    # AC refinement (ah > 0): the spec G.1.2.3 correction-bit walk
    p1, m1 = 1 << al, -1 << al

    def correct(pos: int) -> None:
        if r.read_bit() and (coef[pos] & p1) == 0:
            coef[pos] += p1 if coef[pos] >= 0 else m1

    def correct_rest(k: int) -> None:
        # an EOB (or a block covered by an EOB run) still refines the
        # band's already-significant coefficients — their correction
        # bits follow in positional order
        while k <= se:
            pos = int(ZIGZAG[k])
            if coef[pos] != 0:
                correct(pos)
            k += 1

    if eobrun[0] > 0:
        eobrun[0] -= 1
        correct_rest(k)
        return
    while k <= se:
        rs = _decode_huff(r, act)
        rrun, s = rs >> 4, rs & 0x0F
        newval = 0
        if s == 0:
            if rrun < 15:
                eobrun[0] = (1 << rrun) - 1 + r.read_bits(rrun)
                correct_rest(k)
                return
            # ZRL: pass 16 zero-history coefficients
        else:
            if s != 1:
                raise ValueError(
                    "corrupt JPEG: refinement magnitude must be 1"
                )
            newval = p1 if r.read_bit() else m1
        while k <= se:
            pos = int(ZIGZAG[k])
            if coef[pos] != 0:
                correct(pos)
            else:
                if rrun == 0:
                    if newval:
                        coef[pos] = newval
                    k += 1
                    break
                rrun -= 1
            k += 1


def _entropy_end(data: bytes, pos: int) -> int:
    """Advance past pad bits to the next real marker (skipping stuffed
    bytes and restart markers)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("corrupt JPEG: no marker after scan")


def _parse_jpeg(data: bytes) -> dict:
    """Marker-walk + entropy-decode every scan (Huffman baseline /
    progressive / lossless, or ARITHMETIC sequential via
    ``jpeg_arith``) into per-component coefficient (or sample) arrays;
    reconstruction happens in :func:`decode_jpeg`."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = -1
    comps: list[dict] = []
    restart_interval = 0
    hmax = vmax = 1
    mcus_x = mcus_y = 0
    saw_scan = False
    precision = 8
    lossless = False
    arith = False
    dac: dict = {}
    comps_pt = 0
    while True:
        if pos + 2 > len(data):
            raise ValueError("corrupt JPEG: truncated marker stream")
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if not saw_scan:
                raise ValueError("corrupt JPEG: EOI before SOS")
            break
        if pos + 2 > len(data):
            raise ValueError("corrupt JPEG: truncated marker stream")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("corrupt JPEG: truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                tbl = np.zeros(64, np.int32)
                if pq == 0:
                    tbl[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], np.uint8)
                    p += 65
                elif pq == 1:  # 16-bit entries (12-bit sample streams)
                    tbl[ZIGZAG] = np.frombuffer(
                        seg[p + 1 : p + 129], ">u2"
                    ).astype(np.int32)
                    p += 129
                else:
                    raise ValueError(f"corrupt JPEG: DQT precision {pq}")
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decode(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):  # +SOF9/10 arith
            precision = seg[0]
            arith = marker in (0xC9, 0xCA)
            if marker == 0xC0 and precision != 8:
                raise ValueError(
                    f"corrupt JPEG: baseline SOF0 must be 8-bit, got {precision}"
                )
            if precision not in (8, 12):
                raise ValueError(f"unsupported JPEG: {precision}-bit samples")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("corrupt JPEG: truncated SOF")
            comps = []
            for i in range(ncomp):
                cid, sf, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": sf >> 4, "v": sf & 0x0F, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax > 2 or vmax > 2:
                raise ValueError(
                    "unsupported JPEG: sampling factors beyond 2x2"
                )
            mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                # padded interleaved block grid; non-interleaved scans
                # use the smaller comp-true grid inside it
                c["bx"] = mcus_x * c["h"]
                c["by"] = mcus_y * c["v"]
                c["tbx"] = (-(-(width * c["h"]) // hmax) + 7) // 8
                c["tby"] = (-(-(height * c["v"]) // vmax) + 7) // 8
                c["coef"] = np.zeros((c["by"], c["bx"], 64), np.int32)
        elif marker == 0xC3:  # SOF3: lossless (Huffman, Annex H)
            precision = seg[0]
            if not 2 <= precision <= 16:
                raise ValueError(
                    f"corrupt JPEG: lossless precision {precision}"
                )
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("corrupt JPEG: truncated SOF")
            comps = []
            for i in range(ncomp):
                cid, sf, _tq = seg[6 + 3 * i : 9 + 3 * i]
                if sf != 0x11:
                    raise ValueError(
                        "unsupported JPEG: lossless with sampling != 1x1"
                    )
                comps.append(
                    {
                        "id": cid,
                        "samples": np.zeros((height, width), np.int32),
                    }
                )
            lossless = True
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB):
            raise ValueError(
                f"unsupported JPEG: SOF{marker - 0xC0} (hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            p = 0
            while p + 1 < len(seg):
                dac[(seg[p] >> 4, seg[p] & 0x0F)] = seg[p + 1]
                p += 2
        elif marker == 0xDA and lossless:  # lossless scan (Annex H)
            if restart_interval:
                raise ValueError(
                    "unsupported JPEG: restart markers in lossless scans"
                )
            ns = seg[0]
            if len(seg) < 4 + 2 * ns:
                raise ValueError("corrupt JPEG: truncated SOS")
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(f"corrupt JPEG: unknown component {cs}")
                scan.append((comp, tt >> 4))
            sel, _se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            pt = ahal & 0x0F
            if not 1 <= sel <= 7:
                raise ValueError(f"corrupt JPEG: lossless predictor {sel}")
            pos += seglen
            r = _BitReader(data, pos)
            default = 1 << (precision - pt - 1)
            for comp, _td in scan:
                comp["out"] = comp["samples"]
            for row in range(height):
                for col in range(width):
                    for comp, td in scan:
                        S = comp["out"]
                        if row == 0 and col == 0:
                            pred = default
                        elif row == 0:
                            pred = int(S[0, col - 1])
                        elif col == 0:
                            pred = int(S[row - 1, 0])
                        else:
                            ra = int(S[row, col - 1])
                            rb = int(S[row - 1, col])
                            rc = int(S[row - 1, col - 1])
                            pred = {
                                1: ra,
                                2: rb,
                                3: rc,
                                4: ra + rb - rc,
                                5: ra + ((rb - rc) >> 1),
                                6: rb + ((ra - rc) >> 1),
                                7: (ra + rb) >> 1,
                            }[sel]
                        s = _decode_huff(r, huff.get((0, td)))
                        if s == 16:  # category 16: diff = 32768, no bits
                            diff = 32768
                        else:
                            diff = _extend(r.read_bits(s), s)
                        S[row, col] = (pred + diff) & 0xFFFF
            saw_scan = True
            comps_pt = pt
            pos = _entropy_end(data, r.pos)
            continue
        elif marker == 0xDA and arith:  # SOS, arithmetic sequential
            from wrf_to_geodataframe_spark.sources import jpeg_arith as _ja

            if not comps:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            if len(seg) < 4 + 2 * ns:
                raise ValueError("corrupt JPEG: truncated SOS")
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(f"corrupt JPEG: unknown component {cs}")
                scan.append((comp, tt >> 4, tt & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not (0 <= ss <= se <= 63):
                raise ValueError(
                    f"corrupt JPEG: spectral band {ss}..{se} out of range"
                )
            if ss > 0 and ns > 1:
                raise ValueError(
                    "corrupt JPEG: interleaved AC progressive scan"
                )
            pos += seglen
            pos = _arith_scan(
                _ja, data, pos, scan, comps, mcus_x, mcus_y,
                restart_interval, dac, ss, se, ah, al,
            )
            saw_scan = True
            continue
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            if len(seg) < 4 + 2 * ns:
                raise ValueError("corrupt JPEG: truncated SOS")
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(f"corrupt JPEG: unknown component {cs}")
                scan.append((comp, tt >> 4, tt & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not (0 <= ss <= se <= 63):
                raise ValueError(
                    f"corrupt JPEG: spectral band {ss}..{se} out of range"
                )
            pos += seglen
            r = _BitReader(data, pos)
            preds = [0] * len(scan)
            eobrun = [0]
            try:
                if ns > 1:  # interleaved: MCU order
                    unit_count = 0
                    for my in range(mcus_y):
                        for mx in range(mcus_x):
                            if (
                                restart_interval
                                and unit_count
                                and unit_count % restart_interval == 0
                            ):
                                r.align_restart()
                                preds = [0] * len(scan)
                                eobrun = [0]
                            for ci, (comp, td, ta) in enumerate(scan):
                                dct = huff.get((0, td))
                                act = huff.get((1, ta))
                                for by in range(comp["v"]):
                                    for bx in range(comp["h"]):
                                        blk = comp["coef"][
                                            my * comp["v"] + by,
                                            mx * comp["h"] + bx,
                                        ]
                                        _scan_decode_block(
                                            r, blk, dct, act, ss, se,
                                            ah, al, preds, ci, eobrun,
                                        )
                            unit_count += 1
                else:  # non-interleaved: the component's true block grid
                    comp, td, ta = scan[0]
                    dct = huff.get((0, td))
                    act = huff.get((1, ta))
                    unit_count = 0
                    for by in range(comp["tby"]):
                        for bx in range(comp["tbx"]):
                            if (
                                restart_interval
                                and unit_count
                                and unit_count % restart_interval == 0
                            ):
                                r.align_restart()
                                preds = [0] * len(scan)
                                eobrun = [0]
                            _scan_decode_block(
                                r, comp["coef"][by, bx], dct, act,
                                ss, se, ah, al, preds, 0, eobrun,
                            )
                            unit_count += 1
            except _RestartPending as exc:
                raise ValueError("corrupt JPEG: restart inside unit") from exc
            saw_scan = True
            pos = _entropy_end(data, r.pos)
            continue
        # APPn/COM/unknown: skip
        pos += seglen

    return {
        "width": width, "height": height, "precision": precision,
        "comps": comps, "qt": qt, "lossless": lossless,
        "comps_pt": comps_pt, "hmax": hmax, "vmax": vmax,
    }


def decode_jpeg_coefficients(data: bytes) -> dict:
    """Entropy-decode to QUANTIZED DCT coefficients without any IDCT:
    returns {"width", "height", "comps": [{"coef": (tby, tbx, 64)
    natural-order int32 array, "tq": table id}, ...], "qt": tables} —
    the representation the libjpeg cross-validation tests compare at
    (exact integers, no transform fuzz)."""
    st = _parse_jpeg(data)
    if st["lossless"]:
        raise ValueError("lossless JPEG has no DCT coefficients")
    comps = [
        {
            "tq": c["tq"],
            "coef": c["coef"][: c["tby"], : c["tbx"]],
        }
        for c in st["comps"]
    ]
    return {
        "width": st["width"], "height": st["height"],
        "comps": comps, "qt": st["qt"],
    }


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode baseline, progressive, lossless, or ARITHMETIC sequential
    JFIF -> (width, height, channels, pixels) with 8-bit interleaved
    output (grayscale stays 1 channel, color decodes to RGB).
    Progressive streams may use spectral selection and successive
    approximation in any spec-legal scan script; every scan accumulates
    into per-component coefficient arrays and the image reconstructs
    once at EOI."""
    st = _parse_jpeg(data)
    width, height, precision = st["width"], st["height"], st["precision"]
    comps, qt, lossless = st["comps"], st["qt"], st["lossless"]
    comps_pt, hmax, vmax = st["comps_pt"], st["hmax"], st["vmax"]

    if lossless:
        # Annex H output: Rx << Pt per sample; > 8-bit precisions
        # return little-endian uint16 buffers
        dtype = np.uint8 if precision <= 8 else "<u2"
        planes = [
            (c["samples"] << comps_pt).astype(dtype) for c in comps
        ]
        out = (
            planes[0]
            if len(planes) == 1
            else np.stack(planes, axis=-1)
        )
        return width, height, len(planes), np.ascontiguousarray(out).tobytes()

    # reconstruct: dequantize + IDCT every block at once (batched
    # einsum — the per-block Python loop would dominate decode time on
    # real photo sizes), then assemble/upsample/crop
    shift = float(1 << (precision - 1))
    vmaxval = float((1 << precision) - 1)
    full = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(
                f"corrupt JPEG: missing quantization table {c['tq']}"
            )
        Q = qt[c["tq"]].reshape(-1).astype(np.float64)
        blks = (c["coef"].astype(np.float64) * Q).reshape(
            c["by"], c["bx"], 8, 8
        )
        px = np.einsum("ij,yxjk,kl->yxil", _C.T, blks, _C) + shift
        # (by, bx, 8, 8) -> (by*8, bx*8)
        plane = px.transpose(0, 2, 1, 3).reshape(c["by"] * 8, c["bx"] * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(plane[:height, :width])
    odt = np.uint8 if precision <= 8 else "<u2"
    if len(full) == 1:
        out = np.clip(np.rint(full[0]), 0, vmaxval).astype(odt)
        return width, height, 1, np.ascontiguousarray(out).tobytes()
    y, cb, cr = full[0], full[1] - shift, full[2] - shift
    rr = y + 1.402 * cr
    gg = y - 0.344136 * cb - 0.714136 * cr
    bb = y + 1.772 * cb
    rgb = np.stack([rr, gg, bb], axis=-1)
    out = np.clip(np.rint(rgb), 0, vmaxval).astype(odt)
    return width, height, 3, np.ascontiguousarray(out).tobytes()




def _next_marker(data, pos):
    """First real marker at/after pos (does NOT skip restart markers —
    the arithmetic scan driver consumes RSTn itself)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            return pos
        pos += 1
    raise ValueError("corrupt JPEG: no marker after scan")


def _arith_scan(_ja, data, pos, scan, comps, mcus_x, mcus_y,
                restart_interval, dac, ss=0, se=63, ah=0, al=0):
    """Drive one ARITHMETIC scan (T.81 F.2.4 sequential, or the four
    progressive scan types of Annex G.2 via ``jpeg_arith``):
    statistics areas are per conditioning-table id (shared across
    components citing the same table), DC context and predictor are
    per component; restart markers re-init the coder, every statistics
    area, and the DC state.  Returns the position of the marker
    terminating the scan's entropy data."""
    dec = _ja._ArithDecoder(data, pos)
    dc_stats: dict = {}
    ac_stats: dict = {}
    fixed = _ja._FixedStats()
    preds = [0] * len(scan)
    dcctx = [0] * len(scan)

    def block(ci, comp, td, ta, blk):
        lohi = dac.get((0, td), 0x10)
        lo, hi = lohi & 0x0F, lohi >> 4
        kx = dac.get((1, ta), 5)
        if ss == 0:
            if ah == 0:  # DC first (or the sequential combined scan)
                dcst = dc_stats.setdefault(td, _ja.make_dc_stats())
                diff, dcctx[ci] = _ja.decode_dc_diff(
                    dec, dcst, dcctx[ci], lo, hi
                )
                preds[ci] += diff
                blk[0] = preds[ci] << al
            else:  # DC refinement: one fixed-bin bit per block
                if dec.decode(fixed, 0):
                    blk[0] |= 1 << al
        if se >= 1 and ah == 0:  # sequential AC / AC first
            acst = ac_stats.setdefault(ta, _ja.make_ac_stats())
            _ja.decode_ac_coefs(
                dec, acst, fixed, kx, blk, ZIGZAG, max(ss, 1), se, al
            )
        elif se >= 1:  # AC refinement
            acst = ac_stats.setdefault(ta, _ja.make_ac_stats())
            _ja.decode_ac_refine(
                dec, acst, fixed, blk, ZIGZAG, max(ss, 1), se, al
            )

    def restart():
        nonlocal dec, preds, dcctx
        mpos = (
            dec.marker_pos if dec.marker_pos >= 0
            else _next_marker(data, dec.pos)
        )
        if mpos + 1 >= len(data) or not 0xD0 <= data[mpos + 1] <= 0xD7:
            raise ValueError("corrupt JPEG: expected restart marker")
        dec = _ja._ArithDecoder(data, mpos + 2)
        for st in dc_stats.values():
            st.reset()
        for st in ac_stats.values():
            st.reset()
        preds = [0] * len(scan)
        dcctx = [0] * len(scan)

    unit = 0
    if len(scan) > 1:  # interleaved MCU order
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                for ci, (comp, td, ta) in enumerate(scan):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            block(ci, comp, td, ta, comp["coef"][
                                my * comp["v"] + by, mx * comp["h"] + bx,
                            ])
                unit += 1
    else:
        comp, td, ta = scan[0]
        for by in range(comp["tby"]):
            for bx in range(comp["tbx"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                block(0, comp, td, ta, comp["coef"][by, bx])
                unit += 1
    return (
        dec.marker_pos if dec.marker_pos >= 0
        else _next_marker(data, dec.pos)
    )


def encode_jpeg_arith(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quality: int = 50,
    restart_interval: int = 0,
) -> bytes:
    """Encode interleaved 8-bit pixels as ARITHMETIC-coded extended
    sequential JFIF (SOF9, T.81 Annexes D+F) — same DCT/quantization
    pipeline as :func:`encode_jpeg`, QM-coded entropy layer instead of
    Huffman (4:4:4; subsampling is orthogonal to the entropy layer).
    Interop is libjpeg-validated in ``tests/test_jpeg_arith.py``."""
    from wrf_to_geodataframe_spark.sources import jpeg_arith as _ja

    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want "
            f"{width * height * channels}"
        )
    ql, qc = _scaled_tables(quality)
    img = np.frombuffer(bytes(pixels), np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img[..., 0]]
    mcus_x = (width + 7) // 8
    mcus_y = (height + 7) // 8
    coefs = []
    for ci, pl in enumerate(planes):
        Q = ql if ci == 0 else qc
        coefs.append(_block_coefs(pl, Q))

    enc = _ja._ArithEncoder()
    dc_stats = {0: _ja.make_dc_stats()}
    ac_stats = {0: _ja.make_ac_stats()}
    if channels == 3:
        dc_stats[1] = _ja.make_dc_stats()
        ac_stats[1] = _ja.make_ac_stats()
    fixed = _ja._FixedStats()
    preds = [0] * channels
    dcctx = [0] * channels
    entropy = bytearray()
    unit = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and unit and unit % restart_interval == 0:
                entropy += enc.flush()
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                enc = _ja._ArithEncoder()
                for st in dc_stats.values():
                    st.reset()
                for st in ac_stats.values():
                    st.reset()
                fixed.reset()
                preds = [0] * channels
                dcctx = [0] * channels
            for ci in range(channels):
                tbl = 0 if ci == 0 else 1
                blk = coefs[ci][my, mx]
                dc = int(blk[0])
                diff = dc - preds[ci]
                preds[ci] = dc
                dcctx[ci] = _ja.encode_dc_diff(
                    enc, dc_stats[tbl], dcctx[ci], diff, 0, 1
                )
                zz = blk[ZIGZAG]
                _ja.encode_ac_coefs(enc, ac_stats[tbl], fixed, 5, zz)
            unit += 1
    entropy += enc.flush()

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, ql)
    if channels > 1:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([channels])
    for ci in range(channels):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc9" + struct.pack(">H", len(sof) + 2) + sof
    # DAC: defaults made explicit (DC L=0 U=1; AC Kx=5) per table
    dacseg = bytearray()
    for tbl in range(2 if channels > 1 else 1):
        dacseg += bytes([0x00 | tbl, 0x10, 0x10 | tbl, 5])
    out += b"\xff\xcc" + struct.pack(">H", len(dacseg) + 2) + dacseg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quality: int = 50,
    al: int = 1,
) -> bytes:
    """Encode as PROGRESSIVE ARITHMETIC JFIF (SOF10, Annex G.2 models
    over the Annex D QM-coder): the same spec-legal scan script as
    :func:`encode_jpeg_progressive` — interleaved DC first at
    precision ``al`` + DC refinements, then per component the full AC
    band at ``al`` + AC refinements — with each scan's statistics
    freshly initialized.  Reconstructs the same quantized coefficients
    as every other encoder in this module; libjpeg-validated in
    ``tests/test_jpeg_arith.py``."""
    from wrf_to_geodataframe_spark.sources import jpeg_arith as _ja

    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want "
            f"{width * height * channels}"
        )
    ql, qc = _scaled_tables(quality)
    img = np.frombuffer(bytes(pixels), np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img[..., 0]]
    coefs = [
        _block_coefs(p, ql if ci == 0 else qc)
        for ci, p in enumerate(planes)
    ]
    nby, nbx = coefs[0].shape[0], coefs[0].shape[1]

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, ql)
    if channels > 1:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([channels])
    for ci in range(channels):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xca" + struct.pack(">H", len(sof) + 2) + sof
    dacseg = bytearray()
    for tbl in range(2 if channels > 1 else 1):
        dacseg += bytes([0x00 | tbl, 0x10, 0x10 | tbl, 5])
    out += b"\xff\xcc" + struct.pack(">H", len(dacseg) + 2) + dacseg

    def sos(comp_ids, ss, se, ah, al_):
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            td = 0 if cid == 1 else 1
            hdr += bytes([cid, (td << 4) | td])
        hdr += bytes([ss, se, (ah << 4) | al_])
        return b"\xff\xda" + struct.pack(">H", len(hdr) + 2) + hdr

    # scan 1: DC first, interleaved, precision al
    enc = _ja._ArithEncoder()
    dc_stats = [_ja.make_dc_stats() for _ in range(channels)]
    preds = [0] * channels
    dcctx = [0] * channels
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(channels):
                tbl = min(ci, 1)
                dc = int(coefs[ci][by, bx, 0]) >> al
                dcctx[ci] = _ja.encode_dc_diff(
                    enc, dc_stats[tbl], dcctx[ci], dc - preds[ci], 0, 1
                )
                preds[ci] = dc
    out += sos(list(range(1, channels + 1)), 0, 0, 0, al) + enc.flush()
    # DC refinements: one fixed-bin bit per block per component
    for a in range(al - 1, -1, -1):
        enc = _ja._ArithEncoder()
        fixed = _ja._FixedStats()
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(channels):
                    enc.encode(
                        fixed, 0, (int(coefs[ci][by, bx, 0]) >> a) & 1
                    )
        out += sos(list(range(1, channels + 1)), 0, 0, a + 1, a) + enc.flush()
    # per component: AC first at precision al, then refinements
    for ci in range(channels):
        enc = _ja._ArithEncoder()
        acst = _ja.make_ac_stats()
        fixed = _ja._FixedStats()
        for by in range(nby):
            for bx in range(nbx):
                zz = coefs[ci][by, bx][ZIGZAG]
                _ja.encode_ac_coefs(enc, acst, fixed, 5, zz, 1, 63, al)
        out += sos([ci + 1], 1, 63, 0, al) + enc.flush()
        for a in range(al - 1, -1, -1):
            enc = _ja._ArithEncoder()
            acst = _ja.make_ac_stats()
            fixed = _ja._FixedStats()
            for by in range(nby):
                for bx in range(nbx):
                    zz = coefs[ci][by, bx][ZIGZAG]
                    _ja.encode_ac_refine(enc, acst, fixed, zz, 1, 63, a)
            out += sos([ci + 1], 1, 63, a + 1, a) + enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Progressive encoder (spectral selection + successive approximation)


def _block_coefs(plane: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """(by, bx, 64) quantized DCT coefficients (raster order) for a
    plane padded to 8-multiples with edge values — every block's DCT
    in one batched einsum."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), "edge")
    blks = (
        p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - 128.0
    )
    D = np.einsum("ij,yxjk,kl->yxil", _C, blks, _C.T)
    qf = Q.reshape(8, 8).astype(np.float64)
    q = np.sign(D) * np.floor(np.abs(D) / qf + 0.5)
    return q.astype(np.int32).reshape(ph // 8, pw // 8, 64)


def _emit_ac_first(w, coefs, al, ac_codes) -> None:
    """One block's AC 1..63 first scan at precision ``al`` (per-block
    EOB; magnitudes truncated toward zero)."""
    run = 0
    for k in range(1, 64):
        v = int(coefs[ZIGZAG[k]])
        t = abs(v) >> al
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            run -= 16
        tv = t if v > 0 else -t
        s, bits = _amplitude(tv)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(bits, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB (run of exactly this block)
        w.write(code, ln)


def _emit_ac_refine(w, coefs, a, ac_codes) -> None:
    """One block's AC refinement scan Ah=a+1 -> Al=a (per-block EOB;
    correction bits ride after each emitted symbol, spec G.1.2.3)."""
    run = 0
    pending: list[int] = []

    def flush() -> None:
        for b in pending:
            w.write(b, 1)
        pending.clear()

    for k in range(1, 64):
        v = int(coefs[ZIGZAG[k]])
        t = abs(v) >> a
        if t == 0:
            run += 1
        elif t == 1:  # newly significant at this precision
            while run > 15:
                code, ln = ac_codes[0xF0]
                w.write(code, ln)
                flush()
                run -= 16
            code, ln = ac_codes[(run << 4) | 1]
            w.write(code, ln)
            w.write(1 if v > 0 else 0, 1)
            flush()
            run = 0
        else:  # already significant: correction bit
            pending.append(t & 1)
    if run or pending:
        code, ln = ac_codes[0x00]
        w.write(code, ln)
        flush()


def encode_jpeg_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quality: int = 50,
    al: int = 1,
) -> bytes:
    """Encode as PROGRESSIVE JFIF (SOF2): a spec-legal scan script with
    both progressive mechanisms — spectral selection (DC scan, then the
    full AC band per component) and successive approximation (first
    scans at precision ``al``, then refinement scans down to full
    precision).  Grayscale or RGB 4:4:4 (the progressive structure is
    the point; chroma subsampling is covered by the baseline path).
    Reconstructs the SAME quantized coefficients as ``encode_jpeg`` at
    equal quality, so both decode to identical pixels — the round-trip
    equivalence the tests pin."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * channels}"
        )
    ql, qc = _scaled_tables(quality)
    img = np.frombuffer(bytes(pixels), np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img[..., 0]]
    coefs = [
        _block_coefs(p, ql if ci == 0 else qc)
        for ci, p in enumerate(planes)
    ]
    nby, nbx = coefs[0].shape[0], coefs[0].shape[1]

    dc_codes = [_build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)] + [
        _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ] * (channels - 1)
    ac_codes = [_build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)] + [
        _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    ] * (channels - 1)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, ql)
    if channels > 1:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([channels])
    for ci in range(channels):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if channels > 1:
        out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)

    def sos(comp_ids, ss, se, ah, al_):
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            td = 0 if cid == 1 else 1
            hdr += bytes([cid, (td << 4) | td])
        hdr += bytes([ss, se, (ah << 4) | al_])
        return b"\xff\xda" + struct.pack(">H", len(hdr) + 2) + hdr

    # scan 1: DC first, interleaved, precision al
    w = _BitWriter()
    preds = [0] * channels
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(channels):
                dc = int(coefs[ci][by, bx, 0]) >> al  # arithmetic shift
                s, bits = _amplitude(dc - preds[ci])
                code, ln = dc_codes[ci][s]
                w.write(code, ln)
                w.write(bits, s)
                preds[ci] = dc
    w.flush()
    out += sos(list(range(1, channels + 1)), 0, 0, 0, al) + w.out
    # DC refinement scans down to full precision (raw bits)
    for a in range(al - 1, -1, -1):
        w = _BitWriter()
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(channels):
                    w.write((int(coefs[ci][by, bx, 0]) >> a) & 1, 1)
        w.flush()
        out += sos(list(range(1, channels + 1)), 0, 0, a + 1, a) + w.out
    # per component: AC first at precision al, then refinements
    for ci in range(channels):
        w = _BitWriter()
        for by in range(nby):
            for bx in range(nbx):
                _emit_ac_first(w, coefs[ci][by, bx], al, ac_codes[ci])
        w.flush()
        out += sos([ci + 1], 1, 63, 0, al) + w.out
        for a in range(al - 1, -1, -1):
            w = _BitWriter()
            for by in range(nby):
                for bx in range(nbx):
                    _emit_ac_refine(w, coefs[ci][by, bx], a, ac_codes[ci])
            w.flush()
            out += sos([ci + 1], 1, 63, a + 1, a) + w.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Lossless JPEG (SOF3, Annex H) and 12-bit extended sequential (SOF1)


# one flat Huffman table covering every lossless diff category 0..16:
# 17 symbols at length 5 (canonical, the all-ones length-5 code unused)
_LL_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LL_VALS = list(range(17))


def encode_jpeg_lossless(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    precision: int = 8,
    predictor: int = 1,
    point_transform: int = 0,
) -> bytes:
    """Encode as lossless JPEG (SOF3, Huffman, Annex H): bit-exact by
    construction.  ``pixels`` is interleaved uint8 (precision <= 8) or
    little-endian uint16 (9..16); ``channels`` components all at 1x1
    sampling (interleaved sample-wise); ``predictor`` 1..7 selects the
    Annex-H prediction; restart markers are not emitted.  The diff
    alphabet uses one flat 5-bit/17-symbol table (spec-legal canonical
    code) shared by every component."""
    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor must be 1..7, got {predictor}")
    if not 2 <= precision <= 16:
        raise ValueError(f"precision must be 2..16, got {precision}")
    dtype = np.uint8 if precision <= 8 else "<u2"
    img = np.frombuffer(bytes(pixels), dtype=dtype).reshape(
        height, width, channels
    ).astype(np.int64)
    pt = point_transform
    img >>= pt
    codes = _build_codes(_LL_BITS, _LL_VALS)
    out = bytearray(b"\xff\xd8")
    out += _dht_segment(0, 0, _LL_BITS, _LL_VALS)
    sof = bytes([precision]) + struct.pack(">HH", height, width)
    sof += bytes([channels])
    for ci in range(channels):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + sof
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    w = _BitWriter()
    default = 1 << (precision - pt - 1)
    for row in range(height):
        for col in range(width):
            for ci in range(channels):
                S = img[:, :, ci]
                if row == 0 and col == 0:
                    pred = default
                elif row == 0:
                    pred = int(S[0, col - 1])
                elif col == 0:
                    pred = int(S[row - 1, 0])
                else:
                    ra = int(S[row, col - 1])
                    rb = int(S[row - 1, col])
                    rc = int(S[row - 1, col - 1])
                    pred = {
                        1: ra,
                        2: rb,
                        3: rc,
                        4: ra + rb - rc,
                        5: ra + ((rb - rc) >> 1),
                        6: rb + ((ra - rc) >> 1),
                        7: (ra + rb) >> 1,
                    }[predictor]
                diff = (int(S[row, col]) - pred) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536  # modulo-2^16 signed representative
                if diff == -32768:
                    code, ln = codes[16]  # category 16: no extra bits
                    w.write(code, ln)
                    continue
                s, bits = _amplitude(diff)
                code, ln = codes[s]
                w.write(code, ln)
                w.write(bits, s)
    w.flush()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_ext12(
    pixels: bytes, width: int, height: int, quality: int = 50
) -> bytes:
    """Encode a little-endian uint16 grayscale buffer (12-bit samples,
    0..4095) as EXTENDED SEQUENTIAL JFIF (SOF1, Huffman, precision 12)
    with the Annex-K example tables.  Those tables top out at DC
    category 11 / AC size 10, which covers moderate-contrast 12-bit
    content (and the gate corner's constant even tiles exactly);
    steeper blocks raise rather than emit an undecodable symbol."""
    ql, _qc = _scaled_tables(quality)
    img = np.frombuffer(bytes(pixels), "<u2").reshape(height, width)
    if img.max() > 4095:
        raise ValueError("12-bit samples must be 0..4095")
    dc_codes = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, ql)
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    sof = bytes([12]) + struct.pack(">HH", height, width) + bytes(
        [1, 1, 0x11, 0]
    )
    out += b"\xff\xc1" + struct.pack(">H", len(sof) + 2) + sof
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    plane = np.pad(
        img.astype(np.float64),
        ((0, ph - height), (0, pw - width)),
        "edge",
    )
    w = _BitWriter()
    pred = 0
    Q = ql.astype(np.float64)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            D = _C @ (block - 2048.0) @ _C.T
            q = _quant(D, Q).reshape(-1)[ZIGZAG]
            diff = int(q[0]) - pred
            s, bits = _amplitude(diff)
            if s > 11:
                raise ValueError(
                    "12-bit DC difference beyond the Annex-K table "
                    "(category > 11) — supply a flatter image or custom "
                    "tables"
                )
            code, ln = dc_codes[s]
            w.write(code, ln)
            w.write(bits, s)
            run = 0
            for i in range(1, 64):
                v = int(q[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    w.write(code, ln)
                    run -= 16
                s, bits = _amplitude(v)
                if s > 10:
                    raise ValueError(
                        "12-bit AC size beyond the Annex-K table"
                    )
                code, ln = ac_codes[(run << 4) | s]
                w.write(code, ln)
                w.write(bits, s)
                run = 0
            if run:
                code, ln = ac_codes[0x00]
                w.write(code, ln)
            pred = int(q[0])
    w.flush()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Header-only metadata (corpus triage without entropy decode)


def _exif_orientation(app1: bytes) -> int | None:
    """EXIF orientation (tag 0x0112) from an APP1 payload, or None.
    Parses the TIFF IFD0 directly; both byte orders."""
    if app1[:6] != b"Exif\x00\x00":
        return None
    t = app1[6:]
    if len(t) < 8:
        return None
    if t[:2] == b"II":
        order = "little"
    elif t[:2] == b"MM":
        order = "big"
    else:
        return None

    def u(pos: int, size: int) -> int:
        return int.from_bytes(t[pos : pos + size], order)

    if u(2, 2) != 42:
        return None
    ifd = u(4, 4)
    if ifd + 2 > len(t):
        return None
    n = u(ifd, 2)
    for i in range(n):
        e = ifd + 2 + 12 * i
        if e + 12 > len(t):
            return None
        if u(e, 2) == 0x0112 and u(e + 2, 2) == 3:  # SHORT
            return u(e + 8, 2)
    return None


def jpeg_info(data: bytes) -> dict:
    """Parse ONLY the marker stream (no entropy decode) ->
    ``{width, height, channels, progressive, subsampling, orientation}``
    — the cheap per-payload triage a crawl pipeline runs before
    deciding what to decode.  ``subsampling`` is the luma sampling pair
    (1, 1)/(2, 1)/(2, 2); ``orientation`` is the EXIF tag (1..8) or
    None."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    out: dict = {
        "width": None,
        "height": None,
        "channels": None,
        "progressive": None,
        "subsampling": None,
        "orientation": None,
        "lossless": None,
        "precision": None,
    }
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD9, 0xDA):  # EOI or start of entropy data: done
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("corrupt JPEG: truncated segment")
        if marker == 0xE1 and out["orientation"] is None:  # APP1/EXIF
            out["orientation"] = _exif_orientation(seg)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            if len(seg) < 6 + 3 * seg[5]:
                raise ValueError("corrupt JPEG: truncated SOF")
            out["height"], out["width"] = struct.unpack(">HH", seg[1:5])
            out["channels"] = seg[5]
            out["progressive"] = marker == 0xC2
            out["lossless"] = marker == 0xC3
            out["precision"] = seg[0]
            sf = seg[7]
            out["subsampling"] = (sf >> 4, sf & 0x0F)
        pos += seglen
    if out["width"] is None:
        raise ValueError("corrupt JPEG: no frame header")
    return out
