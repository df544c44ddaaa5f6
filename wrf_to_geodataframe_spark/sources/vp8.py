"""Lossy VP8 key-frame decoder (RFC 6386) — the "VP8 " payload of
WebP, the dominant WebP flavor in real web crawls (VERDICT r6 gap #2).

Implemented from the public "VP8 Data Format and Decoding Guide"
(RFC 6386): boolean arithmetic decoder, key-frame header, segment /
loop-filter / quantizer side-information, token-partition coefficient
decoding (tree-coded tokens, category extra bits), dequantization,
inverse DCT/WHT, all 16x16 / chroma / 4x4 intra predictors with the
spec's frame-border conventions (127 above / 129 left) and the
shared-top-right quirk for right-column subblocks, and the normal +
simple in-loop deblocking filters.  Constant tables live in
``vp8_tables.py`` (public RFC constants, provenance documented there).

VP8 reconstruction is bit-exact by specification, so the decoder is
cross-validated against the system libwebp plane-for-plane
(``tests/test_vp8_interop.py``): every Y/U/V sample must match
exactly.  Only key frames (intra-only) exist inside WebP files.

Scale path: runs inside the same Arrow ``mapInPandas`` batches as the
other codecs (``operators/multimodal.py``).  Pure-python per-pixel
cost is real; the engine's job at 100 TB is schema/triage/decode
plumbing, and the hot path can swap a native decoder behind the same
signature.
"""

from __future__ import annotations

import numpy as np

from wrf_to_geodataframe_spark.sources.vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)


class Vp8Error(ValueError):
    pass


# ---------------------------------------------------------------------------
# Boolean decoder (RFC 6386 section 7)


class _Bool:
    __slots__ = ("buf", "pos", "range", "value", "bit_count")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.value = (
            (buf[0] << 8 | buf[1]) if len(buf) >= 2
            else (buf[0] << 8 if buf else 0)
        )
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        bigsplit = split << 8
        if self.value >= bigsplit:
            ret = 1
            self.range -= split
            self.value -= bigsplit
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.buf):
                    self.value |= self.buf[self.pos]
                    self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit(128) else v

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


# ---------------------------------------------------------------------------
# Trees and small constant tables (RFC 6386 sections 8-13)

# 16x16 / chroma modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 modes
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROBS = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_PROBS = (142, 114, 183)
_BMODE_TREE = (
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10, -B_RD, -B_VR,
    -B_LD, 14, -B_VL, 16, -B_HD, -B_HU,
)
_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# token tree: values 0..11 are DCT_0..DCT_4, cat1..cat6, EOB last
_EOB, _ZERO = 11, 0
_TOKEN_TREE = (
    -_EOB, 2, -_ZERO, 4, -1, 6, 8, 12, -2, 10, -3, -4,
    14, 16, -5, -6, 18, 20, -7, -8, -9, -10,
)
# tokens 5..10 = categories 1..6: base values and extra-bit probs
_CAT_BASE = (5, 7, 11, 19, 35, 67)
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)

_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# implied 4x4 mode of a non-B_PRED neighbor macroblock (for the
# keyframe bmode above/left context)
_IMPLIED_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# KF_BMODE_PROBS was recovered from libwebp, whose bmode enum orders
# RD/VR before LD/VL (the RFC orders LD,RD,VR,VL) — map this module's
# RFC-numbered modes to libwebp's row/column numbering at lookup
_BMODE_TBL_IDX = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)


def _clamp(v: int, lo: int, hi: int) -> int:
    return lo if v < lo else hi if v > hi else v


def _q_idx(base: int, delta: int) -> int:
    return _clamp(base + delta, 0, 127)


# ---------------------------------------------------------------------------
# Inverse transforms (RFC 6386 section 14.3-14.4)


def _iwht4x4(ip: list) -> list:
    op = [0] * 16
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        op[4 * i] = (a1 + b1 + 3) >> 3
        op[4 * i + 1] = (c1 + d1 + 3) >> 3
        op[4 * i + 2] = (a1 - b1 + 3) >> 3
        op[4 * i + 3] = (d1 - c1 + 3) >> 3
    return op


_C1, _C2 = 20091, 35468  # cospi8sqrt2-1, sinpi8sqrt2 (x65536)


def _idct4x4(ip: list) -> list:
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    op = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _C2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _C1) >> 16)
        t2 = (tmp[r + 3] * _C2) >> 16
        d1 = t1 + t2
        op[r] = (a1 + d1 + 4) >> 3
        op[r + 3] = (a1 - d1 + 4) >> 3
        op[r + 1] = (b1 + c1 + 4) >> 3
        op[r + 2] = (b1 - c1 + 4) >> 3
    return op


# ---------------------------------------------------------------------------
# Header parsing


class _Header:
    pass


def _parse_header(data: bytes):
    if len(data) < 10:
        raise Vp8Error("truncated VP8 frame")
    tag = data[0] | data[1] << 8 | data[2] << 16
    h = _Header()
    h.key_frame = not (tag & 1)
    h.version = (tag >> 1) & 7
    h.show_frame = (tag >> 4) & 1
    part0_size = tag >> 5
    if not h.key_frame:
        raise Vp8Error("VP8 interframe outside a stream context")
    if data[3:6] != b"\x9d\x01\x2a":
        raise Vp8Error("bad VP8 keyframe start code")
    w = data[6] | data[7] << 8
    hh = data[8] | data[9] << 8
    h.width, h.xscale = w & 0x3FFF, w >> 14
    h.height, h.yscale = hh & 0x3FFF, hh >> 14
    if h.width == 0 or h.height == 0:
        raise Vp8Error("zero VP8 dimensions")
    part0 = data[10 : 10 + part0_size]
    if len(part0) < part0_size:
        raise Vp8Error("truncated VP8 first partition")
    rest = data[10 + part0_size :]
    return h, part0, rest


def _parse_side_info(b: _Bool, h: _Header) -> None:
    h.color_space = b.bit(128)
    h.clamping = b.bit(128)

    h.segmentation = b.bit(128)
    h.seg_update_map = 0
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    if h.segmentation:
        h.seg_update_map = b.bit(128)
        update_data = b.bit(128)
        if update_data:
            h.seg_abs = b.bit(128)
            for i in range(4):
                if b.bit(128):
                    h.seg_quant[i] = b.signed_literal(7)
            for i in range(4):
                if b.bit(128):
                    h.seg_lf[i] = b.signed_literal(6)
        if h.seg_update_map:
            for i in range(3):
                if b.bit(128):
                    h.seg_tree_probs[i] = b.literal(8)

    h.filter_type = b.bit(128)  # 1 = simple
    h.filter_level = b.literal(6)
    h.sharpness = b.literal(3)
    h.lf_delta = b.bit(128)
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta:
        if b.bit(128):  # mode_ref_lf_delta_update
            for i in range(4):
                if b.bit(128):
                    h.ref_lf_deltas[i] = b.signed_literal(6)
            for i in range(4):
                if b.bit(128):
                    h.mode_lf_deltas[i] = b.signed_literal(6)

    h.n_parts = 1 << b.literal(2)

    qi = b.literal(7)
    d_y1dc = b.signed_literal(4) if b.bit(128) else 0
    d_y2dc = b.signed_literal(4) if b.bit(128) else 0
    d_y2ac = b.signed_literal(4) if b.bit(128) else 0
    d_uvdc = b.signed_literal(4) if b.bit(128) else 0
    d_uvac = b.signed_literal(4) if b.bit(128) else 0
    h.q_base = qi
    h.q_deltas = (d_y1dc, d_y2dc, d_y2ac, d_uvdc, d_uvac)

    b.bit(128)  # refresh_entropy_probs (keyframe: no effect on us)

    # coefficient probability updates
    probs = bytearray(COEFF_PROBS)
    for i in range(1056):
        if b.bit(COEFF_UPDATE_PROBS[i]):
            probs[i] = b.literal(8)
    h.coeff_probs = bytes(probs)

    h.mb_no_skip = b.bit(128)
    h.prob_skip = b.literal(8) if h.mb_no_skip else 0


def _dequant_factors(h: _Header, segment: int):
    # the segment-adjusted base is NOT clamped before the per-plane
    # deltas — each final index clamps once (libwebp VP8ParseQuant;
    # a pre-clamp changes indices when a large negative segment value
    # underflows and a positive plane delta pulls it back)
    base = h.q_base
    if h.segmentation:
        base = (
            h.seg_quant[segment]
            if h.seg_abs
            else base + h.seg_quant[segment]
        )
    d = h.q_deltas
    y1_dc = DC_QLOOKUP[_q_idx(base, d[0])]
    y1_ac = AC_QLOOKUP[_q_idx(base, 0)]
    y2_dc = DC_QLOOKUP[_q_idx(base, d[1])] * 2
    y2_ac = AC_QLOOKUP[_q_idx(base, d[2])] * 155 // 100
    if y2_ac < 8:
        y2_ac = 8
    uv_dc = DC_QLOOKUP[min(_q_idx(base, d[3]), 117)]
    uv_ac = AC_QLOOKUP[_q_idx(base, d[4])]
    return (y1_dc, y1_ac), (y2_dc, y2_ac), (uv_dc, uv_ac)


# ---------------------------------------------------------------------------
# Coefficient decoding


def _decode_coeffs(
    b: _Bool, probs: bytes, block_type: int, first: int, ctx: int, dq
) -> tuple[list, int]:
    """Decode one 4x4 block's coefficients.  Returns (coeffs in raster
    order, nonzero flag)."""
    out = [0] * 16
    n = first
    nz = 0
    base_t = block_type * 264
    skip_eob = False
    while n < 16:
        p_off = base_t + _BANDS[n] * 33 + ctx * 11
        tok = b.tree(_TOKEN_TREE, probs[p_off : p_off + 11], 2 if skip_eob else 0)
        if tok == _EOB:
            break
        if tok == _ZERO:
            ctx = 0
            skip_eob = True
            n += 1
            continue
        if tok <= 4:
            val = tok
        else:
            cat = tok - 5
            val = _CAT_BASE[cat]
            extra = 0
            for pr in _CAT_PROBS[cat]:
                extra = (extra << 1) | b.bit(pr)
            val += extra
        ctx = 2 if val > 1 else 1
        if b.bit(128):
            val = -val
        out[_ZIGZAG[n]] = val * (dq[0] if n == 0 else dq[1])
        nz = 1
        skip_eob = False
        n += 1
    return out, nz


# ---------------------------------------------------------------------------
# Intra predictors


def _avg2(a, b):
    return (int(a) + int(b) + 1) >> 1


def _avg3(a, b, c):
    return (int(a) + 2 * int(b) + int(c) + 2) >> 2


def _pred_dc(buf, y0, x0, size, have_a, have_l):
    s, cnt = 0, 0
    if have_a:
        s += int(buf[y0 - 1, x0 : x0 + size].sum())
        cnt += size
    if have_l:
        s += int(buf[y0 : y0 + size, x0 - 1].sum())
        cnt += size
    v = 128 if cnt == 0 else (s + (cnt >> 1)) // cnt
    buf[y0 : y0 + size, x0 : x0 + size] = v


def _pred_v(buf, y0, x0, size):
    buf[y0 : y0 + size, x0 : x0 + size] = buf[y0 - 1, x0 : x0 + size]


def _pred_h(buf, y0, x0, size):
    buf[y0 : y0 + size, x0 : x0 + size] = buf[
        y0 : y0 + size, x0 - 1
    ][:, None]


def _pred_tm(buf, y0, x0, size):
    above = buf[y0 - 1, x0 : x0 + size].astype(np.int32)
    left = buf[y0 : y0 + size, x0 - 1].astype(np.int32)
    al = int(buf[y0 - 1, x0 - 1])
    blk = left[:, None] + above[None, :] - al
    buf[y0 : y0 + size, x0 : x0 + size] = np.clip(blk, 0, 255)


def _pred_b(mode, buf, y0, x0):
    """4x4 predictor; edge pixels already materialized in buf."""
    A = [int(buf[y0 - 1, x0 + i]) for i in range(8)]  # above + above-right
    L = [int(buf[y0 + i, x0 - 1]) for i in range(4)]
    P = int(buf[y0 - 1, x0 - 1])
    o = np.empty((4, 4), np.int32)
    if mode == B_DC:
        v = (sum(A[:4]) + sum(L) + 4) >> 3
        o[:, :] = v
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                o[r, c] = _clamp(L[r] + A[c] - P, 0, 255)
    elif mode == B_VE:
        row = [
            _avg3(P, A[0], A[1]),
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]),
        ]
        o[:, :] = np.asarray(row)[None, :]
    elif mode == B_HE:
        col = [
            _avg3(P, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        o[:, :] = np.asarray(col)[:, None]
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                o[r, c] = (
                    _avg3(A[i], A[i + 1], A[i + 2])
                    if i < 6
                    else _avg3(A[6], A[7], A[7])
                )
    elif mode == B_RD:
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = c - r + 3  # 0..6 over e with avg3 window
                o[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
    elif mode == B_VR:
        o[3, 0] = _avg3(L[2], L[1], L[0])
        o[2, 0] = _avg3(L[1], L[0], P)
        o[3, 1] = o[1, 0] = _avg3(L[0], P, A[0])
        o[2, 1] = o[0, 0] = _avg2(P, A[0])
        o[3, 2] = o[1, 1] = _avg3(P, A[0], A[1])
        o[2, 2] = o[0, 1] = _avg2(A[0], A[1])
        o[3, 3] = o[1, 2] = _avg3(A[0], A[1], A[2])
        o[2, 3] = o[0, 2] = _avg2(A[1], A[2])
        o[1, 3] = _avg3(A[1], A[2], A[3])
        o[0, 3] = _avg2(A[2], A[3])
    elif mode == B_VL:
        o[0, 0] = _avg2(A[0], A[1])
        o[1, 0] = _avg3(A[0], A[1], A[2])
        o[2, 0] = o[0, 1] = _avg2(A[1], A[2])
        o[1, 1] = o[3, 0] = _avg3(A[1], A[2], A[3])
        o[2, 1] = o[0, 2] = _avg2(A[2], A[3])
        o[3, 1] = o[1, 2] = _avg3(A[2], A[3], A[4])
        o[2, 2] = o[0, 3] = _avg2(A[3], A[4])
        o[3, 2] = o[1, 3] = _avg3(A[3], A[4], A[5])
        o[2, 3] = _avg3(A[4], A[5], A[6])
        o[3, 3] = _avg3(A[5], A[6], A[7])
    elif mode == B_HD:
        o[3, 0] = _avg2(L[3], L[2])
        o[3, 1] = _avg3(L[3], L[2], L[1])
        o[2, 0] = o[3, 2] = _avg2(L[2], L[1])
        o[2, 1] = o[3, 3] = _avg3(L[2], L[1], L[0])
        o[1, 0] = o[2, 2] = _avg2(L[1], L[0])
        o[1, 1] = o[2, 3] = _avg3(L[1], L[0], P)
        o[0, 0] = o[1, 2] = _avg2(L[0], P)
        o[0, 1] = o[1, 3] = _avg3(L[0], P, A[0])
        o[0, 2] = _avg3(P, A[0], A[1])
        o[0, 3] = _avg3(A[0], A[1], A[2])
    elif mode == B_HU:
        e = L
        o[0, 0] = _avg2(e[0], e[1])
        o[0, 1] = _avg3(e[0], e[1], e[2])
        o[0, 2] = _avg2(e[1], e[2])
        o[0, 3] = _avg3(e[1], e[2], e[3])
        o[1, 0] = o[0, 2]
        o[1, 1] = o[0, 3]
        o[1, 2] = _avg2(e[2], e[3])
        o[1, 3] = _avg3(e[2], e[3], e[3])
        o[2, 0] = o[1, 2]
        o[2, 1] = o[1, 3]
        o[2, 2] = e[3]
        o[2, 3] = e[3]
        o[3, :] = e[3]
    else:
        raise Vp8Error(f"bad b mode {mode}")
    buf[y0 : y0 + 4, x0 : x0 + 4] = o


# ---------------------------------------------------------------------------
# Loop filter (RFC 6386 section 15)


def _c128(v: int) -> int:
    return -128 if v < -128 else 127 if v > 127 else v


def _s2u(v: int) -> int:
    return _c128(v) + 128


def _common_adjust(use_outer, px, i0, i1, i2, i3):
    """px[i0..i3] = P1 P0 Q0 Q1 (unsigned); returns the `a` value."""
    p1, p0, q0, q1 = px[i0] - 128, px[i1] - 128, px[i2] - 128, px[i3] - 128
    a = _c128((_c128(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f = _c128(a + 4) >> 3
    e = _c128(a + 3) >> 3
    px[i2] = _s2u(q0 - f)
    px[i1] = _s2u(p0 + e)
    return f


def _filter_yes(px, interior, edge):
    p3, p2, p1, p0, q0, q1, q2, q3 = (px[i] for i in range(8))
    return (
        abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge
        and abs(p3 - p2) <= interior
        and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior
        and abs(q1 - q0) <= interior
        and abs(q2 - q1) <= interior
        and abs(q3 - q2) <= interior
    )


def _is_hev(px, thresh):
    return abs(px[2] - px[3]) > thresh or abs(px[5] - px[4]) > thresh


def _subblock_filter(px, hev_t, interior, edge):
    if _filter_yes(px, interior, edge):
        hev = _is_hev(px, hev_t)
        a = (_common_adjust(hev, px, 2, 3, 4, 5) + 1) >> 1
        if not hev:
            px[5] = _s2u(px[5] - 128 - a)
            px[2] = _s2u(px[2] - 128 + a)


def _mb_edge_filter(px, hev_t, interior, edge):
    if _filter_yes(px, interior, edge):
        if not _is_hev(px, hev_t):
            p2, p1, p0 = px[1] - 128, px[2] - 128, px[3] - 128
            q0, q1, q2 = px[4] - 128, px[5] - 128, px[6] - 128
            w = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
            a = _c128((27 * w + 63) >> 7)
            px[4] = _s2u(q0 - a)
            px[3] = _s2u(p0 + a)
            a = _c128((18 * w + 63) >> 7)
            px[5] = _s2u(q1 - a)
            px[2] = _s2u(p1 + a)
            a = _c128((9 * w + 63) >> 7)
            px[6] = _s2u(q2 - a)
            px[1] = _s2u(p2 + a)
        else:
            _common_adjust(True, px, 2, 3, 4, 5)


def _simple_filter(px, edge):
    if abs(px[3] - px[4]) * 2 + abs(px[2] - px[5]) // 2 <= edge:
        _common_adjust(True, px, 2, 3, 4, 5)


class _EdgeView:
    """The 8 pixels straddling an edge, as a mutable sequence over the
    plane (vertical=True: along a row, crossing a column edge)."""

    __slots__ = ("plane", "fixed", "start", "vertical")

    def __init__(self, plane, fixed, start, vertical):
        self.plane = plane
        self.fixed = fixed
        self.start = start
        self.vertical = vertical

    def __getitem__(self, i):
        if self.vertical:
            return int(self.plane[self.fixed, self.start + i])
        return int(self.plane[self.start + i, self.fixed])

    def __setitem__(self, i, v):
        if self.vertical:
            self.plane[self.fixed, self.start + i] = v
        else:
            self.plane[self.start + i, self.fixed] = v


def _filter_edge(plane, edge_pos, lo, hi, vertical, kind, hev_t, interior, edge_l):
    for line in range(lo, hi):
        px = _EdgeView(plane, line, edge_pos - 4, vertical)
        if kind == "mb":
            _mb_edge_filter(px, hev_t, interior, edge_l)
        elif kind == "sub":
            _subblock_filter(px, hev_t, interior, edge_l)
        else:
            _simple_filter(px, edge_l)


# ---------------------------------------------------------------------------
# The decoder


def decode_vp8_frame(data: bytes):
    """Decode a VP8 key frame -> (width, height, Y, U, V) numpy uint8
    planes (Y: height x width; U/V: 4:2:0 subsampled, ceil halves)."""
    h, part0, rest = _parse_header(data)
    b = _Bool(part0)
    _parse_side_info(b, h)

    off = 3 * (h.n_parts - 1)
    if len(rest) < off:
        raise Vp8Error("truncated VP8 partition table")
    sizes = [
        rest[3 * i] | rest[3 * i + 1] << 8 | rest[3 * i + 2] << 16
        for i in range(h.n_parts - 1)
    ]
    parts = []
    for i in range(h.n_parts):
        end = off + sizes[i] if i < h.n_parts - 1 else len(rest)
        if end > len(rest):
            raise Vp8Error("truncated VP8 token partition")
        parts.append(_Bool(rest[off:end]))
        off = end

    mb_w = (h.width + 15) >> 4
    mb_h = (h.height + 15) >> 4
    W, H = mb_w * 16, mb_h * 16
    CW, CH = mb_w * 8, mb_h * 8

    # planes with a 1-px top/left border and a 4-px right overhang on Y
    # (top-right reads of right-column subblocks); borders use the spec
    # constants: 127 above (incl. the 127 corner), 129 left
    Y = np.empty((H + 1, W + 5), np.uint8)
    U = np.empty((CH + 1, CW + 1), np.uint8)
    V = np.empty((CH + 1, CW + 1), np.uint8)
    for P in (Y, U, V):
        P[0, :] = 127
        P[1:, 0] = 129

    mb_seg = np.zeros((mb_h, mb_w), np.int8)
    mb_bpred = np.zeros((mb_h, mb_w), bool)
    mb_has_coeff = np.zeros((mb_h, mb_w), bool)

    a_y = np.zeros((mb_w, 4), np.uint8)
    a_u = np.zeros((mb_w, 2), np.uint8)
    a_v = np.zeros((mb_w, 2), np.uint8)
    a_y2 = np.zeros(mb_w, np.uint8)
    above_bm = np.full((mb_w, 4), B_DC, np.uint8)

    probs = h.coeff_probs
    seg = 0
    for mb_y in range(mb_h):
        l_y = np.zeros(4, np.uint8)
        l_u = np.zeros(2, np.uint8)
        l_v = np.zeros(2, np.uint8)
        l_y2 = 0
        left_bm = [B_DC] * 4
        tb = parts[mb_y % h.n_parts]
        for mb_x in range(mb_w):
            # ---- mode parsing (partition 0) ----
            if h.segmentation and h.seg_update_map:
                seg = b.tree(_SEGMENT_TREE, h.seg_tree_probs)
            mb_seg[mb_y, mb_x] = seg
            skip = b.bit(h.prob_skip) if h.mb_no_skip else 0
            ymode = b.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            if ymode == B_PRED:
                bmodes = []
                for sy in range(4):
                    for sx in range(4):
                        am = (
                            int(above_bm[mb_x, sx])
                            if sy == 0
                            else bmodes[(sy - 1) * 4 + sx]
                        )
                        lm = left_bm[sy] if sx == 0 else bmodes[sy * 4 + sx - 1]
                        po = (
                            _BMODE_TBL_IDX[am] * 10 + _BMODE_TBL_IDX[lm]
                        ) * 9
                        bmodes.append(
                            b.tree(_BMODE_TREE, KF_BMODE_PROBS[po : po + 9])
                        )
                above_bm[mb_x] = bmodes[12:16]
                left_bm = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                ib = _IMPLIED_B[ymode]
                bmodes = None
                above_bm[mb_x] = ib
                left_bm = [ib] * 4
            uvmode = b.tree(_UV_MODE_TREE, _KF_UV_PROBS)
            mb_bpred[mb_y, mb_x] = ymode == B_PRED

            dq_y1, dq_y2, dq_uv = _dequant_factors(h, seg)
            has_y2 = ymode != B_PRED

            # ---- residual parsing (token partition) ----
            ycoef = [[0] * 16 for _ in range(16)]
            ucoef = [[0] * 16 for _ in range(4)]
            vcoef = [[0] * 16 for _ in range(4)]
            any_nz = False
            if skip:
                a_y[mb_x] = 0
                l_y[:] = 0
                a_u[mb_x] = 0
                l_u[:] = 0
                a_v[mb_x] = 0
                l_v[:] = 0
                if has_y2:
                    a_y2[mb_x] = 0
                    l_y2 = 0
            else:
                if has_y2:
                    ctx = int(a_y2[mb_x]) + l_y2
                    y2, nz = _decode_coeffs(tb, probs, 1, 0, ctx, dq_y2)
                    a_y2[mb_x] = l_y2 = nz
                    any_nz |= bool(nz)
                    dc16 = _iwht4x4(y2)
                    first, btype = 1, 0
                else:
                    dc16 = None
                    first, btype = 0, 3
                for i in range(16):
                    br, bc = i >> 2, i & 3
                    ctx = int(a_y[mb_x, bc]) + int(l_y[br])
                    coefs, nz = _decode_coeffs(tb, probs, btype, first, ctx, dq_y1)
                    if dc16 is not None:
                        coefs[0] = dc16[i]
                    ycoef[i] = coefs
                    a_y[mb_x, bc] = l_y[br] = nz
                    any_nz |= bool(nz) or (dc16 is not None and dc16[i] != 0)
                for coef, a_c, l_c in ((ucoef, a_u, l_u), (vcoef, a_v, l_v)):
                    for i in range(4):
                        br, bc = i >> 1, i & 1
                        ctx = int(a_c[mb_x, bc]) + int(l_c[br])
                        coefs, nz = _decode_coeffs(tb, probs, 2, 0, ctx, dq_uv)
                        coef[i] = coefs
                        a_c[mb_x, bc] = l_c[br] = nz
                        any_nz |= bool(nz)
            mb_has_coeff[mb_y, mb_x] = any_nz

            # ---- reconstruction ----
            y0, x0 = 1 + 16 * mb_y, 1 + 16 * mb_x
            if ymode == B_PRED:
                tr = Y[y0 - 1, x0 + 16 : x0 + 20].copy()
                for i in range(16):
                    sy, sx = i >> 2, i & 3
                    by, bx = y0 + 4 * sy, x0 + 4 * sx
                    if sx == 3 and sy > 0:
                        # right-column subblocks below the top row read
                        # the SAME 4 above-right pixels of the above MB
                        # row (the VP8 shared-top-right quirk)
                        saved = Y[by - 1, bx + 4 : bx + 8].copy()
                        Y[by - 1, bx + 4 : bx + 8] = tr
                        _pred_b(bmodes[i], Y, by, bx)
                        Y[by - 1, bx + 4 : bx + 8] = saved
                    else:
                        _pred_b(bmodes[i], Y, by, bx)
                    blk = np.asarray(_idct4x4(ycoef[i]), np.int32).reshape(4, 4)
                    tgt = Y[by : by + 4, bx : bx + 4].astype(np.int32) + blk
                    Y[by : by + 4, bx : bx + 4] = np.clip(tgt, 0, 255)
            else:
                if ymode == DC_PRED:
                    _pred_dc(Y, y0, x0, 16, mb_y > 0, mb_x > 0)
                elif ymode == V_PRED:
                    _pred_v(Y, y0, x0, 16)
                elif ymode == H_PRED:
                    _pred_h(Y, y0, x0, 16)
                else:
                    _pred_tm(Y, y0, x0, 16)
                for i in range(16):
                    sy, sx = i >> 2, i & 3
                    by, bx = y0 + 4 * sy, x0 + 4 * sx
                    blk = np.asarray(_idct4x4(ycoef[i]), np.int32).reshape(4, 4)
                    tgt = Y[by : by + 4, bx : bx + 4].astype(np.int32) + blk
                    Y[by : by + 4, bx : bx + 4] = np.clip(tgt, 0, 255)
            cy0, cx0 = 1 + 8 * mb_y, 1 + 8 * mb_x
            for P, coef in ((U, ucoef), (V, vcoef)):
                if uvmode == DC_PRED:
                    _pred_dc(P, cy0, cx0, 8, mb_y > 0, mb_x > 0)
                elif uvmode == V_PRED:
                    _pred_v(P, cy0, cx0, 8)
                elif uvmode == H_PRED:
                    _pred_h(P, cy0, cx0, 8)
                else:
                    _pred_tm(P, cy0, cx0, 8)
                for i in range(4):
                    sy, sx = i >> 1, i & 1
                    by, bx = cy0 + 4 * sy, cx0 + 4 * sx
                    blk = np.asarray(_idct4x4(coef[i]), np.int32).reshape(4, 4)
                    tgt = P[by : by + 4, bx : bx + 4].astype(np.int32) + blk
                    P[by : by + 4, bx : bx + 4] = np.clip(tgt, 0, 255)
        # extend this MB row's right overhang (rightmost MB's top-right
        # reads in the NEXT row replicate the last reconstructed pixel;
        # the mb_y == 0 border row keeps its 127s)
        rows = slice(1 + 16 * mb_y, 1 + 16 * (mb_y + 1))
        Y[rows, W + 1 :] = Y[rows, W : W + 1]

    if h.filter_level > 0:
        _loop_filter(h, Y, U, V, mb_w, mb_h, mb_seg, mb_bpred, mb_has_coeff)

    y_out = Y[1 : 1 + h.height, 1 : 1 + h.width].copy()
    cw, ch = (h.width + 1) >> 1, (h.height + 1) >> 1
    u_out = U[1 : 1 + ch, 1 : 1 + cw].copy()
    v_out = V[1 : 1 + ch, 1 : 1 + cw].copy()
    return h.width, h.height, y_out, u_out, v_out


def _mb_filter_level(h: _Header, seg: int, is_bpred: bool) -> int:
    # the segment-adjusted base is NOT clamped before the lf deltas are
    # added — only one final clamp (libwebp PrecomputeFilterStrengths;
    # an intermediate clamp changes levels when a negative segment
    # delta underflows and a positive ref delta pulls it back)
    level = h.filter_level
    if h.segmentation:
        level = h.seg_lf[seg] if h.seg_abs else level + h.seg_lf[seg]
    if h.lf_delta:
        level += h.ref_lf_deltas[0]  # keyframe: intra-frame delta
        if is_bpred:
            level += h.mode_lf_deltas[0]
    return _clamp(level, 0, 63)


def _loop_filter(h, Y, U, V, mb_w, mb_h, mb_seg, mb_bpred, mb_has_coeff):
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            level = _mb_filter_level(
                h, int(mb_seg[mb_y, mb_x]), bool(mb_bpred[mb_y, mb_x])
            )
            if level == 0:
                continue
            interior = level
            if h.sharpness:
                interior >>= 2 if h.sharpness > 4 else 1
                if interior > 9 - h.sharpness:
                    interior = 9 - h.sharpness
            if interior < 1:
                interior = 1
            hev_t = 2 if level >= 40 else 1 if level >= 15 else 0
            mb_lim = ((level + 2) * 2) + interior
            sub_lim = (level * 2) + interior
            inner = bool(mb_has_coeff[mb_y, mb_x]) or bool(mb_bpred[mb_y, mb_x])
            y0, x0 = 1 + 16 * mb_y, 1 + 16 * mb_x
            c0, cx0 = 1 + 8 * mb_y, 1 + 8 * mb_x
            if h.filter_type:  # simple filter: Y only
                if mb_x > 0:
                    _filter_edge(Y, x0, y0, y0 + 16, True, "s", 0, 0, mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        _filter_edge(Y, x0 + dx, y0, y0 + 16, True, "s", 0, 0, sub_lim)
                if mb_y > 0:
                    _filter_edge(Y, y0, x0, x0 + 16, False, "s", 0, 0, mb_lim)
                if inner:
                    for dy in (4, 8, 12):
                        _filter_edge(Y, y0 + dy, x0, x0 + 16, False, "s", 0, 0, sub_lim)
                continue
            if mb_x > 0:
                _filter_edge(Y, x0, y0, y0 + 16, True, "mb", hev_t, interior, mb_lim)
                _filter_edge(U, cx0, c0, c0 + 8, True, "mb", hev_t, interior, mb_lim)
                _filter_edge(V, cx0, c0, c0 + 8, True, "mb", hev_t, interior, mb_lim)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge(Y, x0 + dx, y0, y0 + 16, True, "sub", hev_t, interior, sub_lim)
                _filter_edge(U, cx0 + 4, c0, c0 + 8, True, "sub", hev_t, interior, sub_lim)
                _filter_edge(V, cx0 + 4, c0, c0 + 8, True, "sub", hev_t, interior, sub_lim)
            if mb_y > 0:
                _filter_edge(Y, y0, x0, x0 + 16, False, "mb", hev_t, interior, mb_lim)
                _filter_edge(U, c0, cx0, cx0 + 8, False, "mb", hev_t, interior, mb_lim)
                _filter_edge(V, c0, cx0, cx0 + 8, False, "mb", hev_t, interior, mb_lim)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge(Y, y0 + dy, x0, x0 + 16, False, "sub", hev_t, interior, sub_lim)
                _filter_edge(U, c0 + 4, cx0, cx0 + 8, False, "sub", hev_t, interior, sub_lim)
                _filter_edge(V, c0 + 4, cx0, cx0 + 8, False, "sub", hev_t, interior, sub_lim)


def _fancy_upsample(c: np.ndarray, w: int, h: int) -> np.ndarray:
    """libwebp's 'fancy' 9-3-3-1 bilinear chroma upsampler: each output
    sample mixes its nearest half-res sample (9), the two adjacent
    ones (3+3) and the diagonal (1), +8 >> 4, with edge replication."""
    ch, cw = c.shape
    yy = np.arange(h)
    xx = np.arange(w)
    ny = np.clip(yy >> 1, 0, ch - 1)
    nx = np.clip(xx >> 1, 0, cw - 1)
    oy = np.clip((yy >> 1) + np.where(yy & 1, 1, -1), 0, ch - 1)
    ox = np.clip((xx >> 1) + np.where(xx & 1, 1, -1), 0, cw - 1)
    c = c.astype(np.int32)
    near = c[np.ix_(ny, nx)]
    horiz = c[np.ix_(ny, ox)]
    vert = c[np.ix_(oy, nx)]
    diag = c[np.ix_(oy, ox)]
    # libwebp's NESTED rounding, not a flat (9n+3h+3v+d+8)>>4 — the
    # diagonal average rounds first, then pairs with the near sample
    # (upsampling.c: diag_12/diag_03 then (diag + nearest) >> 1)
    return (((3 * horiz + 3 * vert + near + diag + 8) >> 3) + near) >> 1


# libwebp's BT.601 limited-range conversion (yuv.h): each product
# TRUNCATES >>8 first (the MultHiVal / _mm_mulhi_epu16 emulation),
# sums with the integer bias, then shifts the 6-bit fix — replicating
# the truncation order is what makes the RGB output bit-exact
_YS, _VR, _UG, _VG, _UB = 19077, 26149, 6419, 13320, 33050
_RC, _GC, _BC = -14234, 8708, -17685


def _mult_hi(v: np.ndarray, coeff: int) -> np.ndarray:
    return (v * coeff) >> 8


def _clip8(v: np.ndarray) -> np.ndarray:
    return np.clip(v >> 6, 0, 255).astype(np.uint8)


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """libwebp-identical YUV->RGB: fancy 9-3-3-1 chroma upsampling +
    the truncating fixed-point BT.601 matrix, so ``decode_webp``'s RGB
    output matches ``WebPDecodeRGB`` BIT-EXACTLY (pinned in
    tests/test_vp8_interop.py), not just the YUV planes."""
    h, w = y.shape
    uu = _fancy_upsample(u, w, h)
    vv = _fancy_upsample(v, w, h)
    yy = _mult_hi(y.astype(np.int32), _YS)
    r = _clip8(yy + _mult_hi(vv, _VR) + _RC)
    g = _clip8(yy - _mult_hi(uu, _UG) - _mult_hi(vv, _VG) + _GC)
    b = _clip8(yy + _mult_hi(uu, _UB) + _BC)
    return np.stack([r, g, b], -1)
