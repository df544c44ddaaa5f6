"""Test helper: re-encode a VP8 key frame's first partition with
mutated header fields (filter type/sharpness, loop-filter deltas, skip
flags) while keeping the token partitions byte-identical.

libwebp's simple encoder never emits some decode-side features (simple
filter, mode/ref lf deltas, per-MB skip flags), so the interop tests
synthesize streams that DO carry them, then require libwebp and the
pure-Python decoder to agree bit-exactly on the result — libwebp
itself validates the synthesized stream.
"""

from __future__ import annotations

import wrf_to_geodataframe_spark.sources.vp8 as V


class BoolEnc:
    """VP8 boolean arithmetic encoder (RFC 6386 section 7.3) — the
    big-int formulation: carries propagate through ``low`` natively."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.nbits = 0

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.low <<= 1
            self.nbits += 1
            self.range <<= 1

    def literal(self, n: int, v: int) -> None:
        for k in range(n - 1, -1, -1):
            self.put(128, (v >> k) & 1)

    def signed_literal(self, n: int, v: int) -> None:
        self.literal(n, abs(v))
        self.put(128, 1 if v < 0 else 0)

    def flag_signed(self, v: int, n: int) -> None:
        if v:
            self.put(128, 1)
            self.signed_literal(n, v)
        else:
            self.put(128, 0)

    def tree(self, tree: tuple, probs, symbol: int, start: int = 0) -> None:
        # find the bit path to -symbol
        path = None

        def walk(i, bits):
            nonlocal path
            for b in (0, 1):
                nxt = tree[i + b]
                if nxt == -symbol and (nxt <= 0):
                    path = bits + [(i >> 1, b)]
                elif nxt > 0:
                    walk(nxt, bits + [(i >> 1, b)])

        walk(start, [])
        assert path is not None, f"symbol {symbol} not in tree"
        for node, b in path:
            self.put(probs[node], b)

    def bytes(self) -> bytes:
        # the code value spans nbits + the 8-bit active window; any value
        # in [low, low + range) decodes identically — emit low itself,
        # padded with trailing zero bytes for the decoder's lookahead
        total = self.nbits + 8
        pad = (-total) % 8
        low = self.low << (pad + 24)
        total += pad + 24
        return low.to_bytes(total // 8, "big")


def parse_part0(payload: bytes):
    """Header fields + per-MB mode records of a keyframe payload."""
    h, p0, rest = V._parse_header(payload)
    b = V._Bool(p0)
    V._parse_side_info(b, h)
    mb_w = (h.width + 15) >> 4
    mb_h = (h.height + 15) >> 4
    mbs = []
    import numpy as np

    above_bm = np.full((mb_w, 4), V.B_DC, np.uint8)
    for mb_y in range(mb_h):
        left_bm = [V.B_DC] * 4
        for mb_x in range(mb_w):
            rec = {}
            if h.segmentation and h.seg_update_map:
                rec["seg"] = b.tree(V._SEGMENT_TREE, h.seg_tree_probs)
            if h.mb_no_skip:
                rec["skip"] = b.bit(h.prob_skip)
            ymode = b.tree(V._KF_YMODE_TREE, V._KF_YMODE_PROBS)
            rec["ymode"] = ymode
            if ymode == V.B_PRED:
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
                            V._BMODE_TBL_IDX[am] * 10 + V._BMODE_TBL_IDX[lm]
                        ) * 9
                        bmodes.append(
                            b.tree(
                                V._BMODE_TREE, V.KF_BMODE_PROBS[po : po + 9]
                            )
                        )
                above_bm[mb_x] = bmodes[12:16]
                left_bm = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
                rec["bmodes"] = bmodes
            else:
                ib = V._IMPLIED_B[ymode]
                above_bm[mb_x] = ib
                left_bm = [ib] * 4
            rec["uvmode"] = b.tree(V._UV_MODE_TREE, V._KF_UV_PROBS)
            mbs.append(rec)
    return h, mbs, rest


def write_part0(h, mbs) -> bytes:
    from wrf_to_geodataframe_spark.sources.vp8_tables import (
        COEFF_UPDATE_PROBS,
    )

    e = BoolEnc()
    e.put(128, h.color_space)
    e.put(128, h.clamping)
    e.put(128, h.segmentation)
    if h.segmentation:
        e.put(128, h.seg_update_map)
        has_data = any(h.seg_quant) or any(h.seg_lf) or h.seg_abs
        e.put(128, 1 if has_data else 0)
        if has_data:
            e.put(128, h.seg_abs)
            for v in h.seg_quant:
                e.flag_signed(v, 7)
            for v in h.seg_lf:
                e.flag_signed(v, 6)
        if h.seg_update_map:
            for p in h.seg_tree_probs:
                if p != 255:
                    e.put(128, 1)
                    e.literal(8, p)
                else:
                    e.put(128, 0)
    e.put(128, h.filter_type)
    e.literal(6, h.filter_level)
    e.literal(3, h.sharpness)
    e.put(128, h.lf_delta)
    if h.lf_delta:
        upd = any(h.ref_lf_deltas) or any(h.mode_lf_deltas)
        e.put(128, 1 if upd else 0)
        if upd:
            for v in h.ref_lf_deltas:
                e.flag_signed(v, 6)
            for v in h.mode_lf_deltas:
                e.flag_signed(v, 6)
    e.literal(2, {1: 0, 2: 1, 4: 2, 8: 3}[h.n_parts])
    e.literal(7, h.q_base)
    for v in h.q_deltas:
        e.flag_signed(v, 4)
    e.put(128, 1)  # refresh_entropy_probs
    from wrf_to_geodataframe_spark.sources.vp8_tables import COEFF_PROBS

    for i in range(1056):
        if h.coeff_probs[i] != COEFF_PROBS[i]:
            e.put(COEFF_UPDATE_PROBS[i], 1)
            e.literal(8, h.coeff_probs[i])
        else:
            e.put(COEFF_UPDATE_PROBS[i], 0)
    e.put(128, h.mb_no_skip)
    if h.mb_no_skip:
        e.literal(8, h.prob_skip)

    import numpy as np

    mb_w = (h.width + 15) >> 4
    above_bm = np.full((mb_w, 4), V.B_DC, np.uint8)
    mb_x = 0
    for rec in mbs:
        if mb_x == 0:
            left_bm = [V.B_DC] * 4
        if h.segmentation and h.seg_update_map:
            e.tree(V._SEGMENT_TREE, h.seg_tree_probs, rec.get("seg", 0))
        if h.mb_no_skip:
            e.put(h.prob_skip, rec.get("skip", 0))
        ymode = rec["ymode"]
        e.tree(V._KF_YMODE_TREE, V._KF_YMODE_PROBS, ymode)
        if ymode == V.B_PRED:
            bmodes = rec["bmodes"]
            k = 0
            for sy in range(4):
                for sx in range(4):
                    am = (
                        int(above_bm[mb_x, sx])
                        if sy == 0
                        else bmodes[(sy - 1) * 4 + sx]
                    )
                    lm = left_bm[sy] if sx == 0 else bmodes[sy * 4 + sx - 1]
                    po = (
                        V._BMODE_TBL_IDX[am] * 10 + V._BMODE_TBL_IDX[lm]
                    ) * 9
                    e.tree(
                        V._BMODE_TREE,
                        V.KF_BMODE_PROBS[po : po + 9],
                        bmodes[k],
                    )
                    k += 1
            above_bm[mb_x] = bmodes[12:16]
            left_bm = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
        else:
            ib = V._IMPLIED_B[ymode]
            above_bm[mb_x] = ib
            left_bm = [ib] * 4
        e.tree(V._UV_MODE_TREE, V._KF_UV_PROBS, rec["uvmode"])
        mb_x = (mb_x + 1) % mb_w
    return e.bytes()


def transcode(payload: bytes, mutate) -> bytes:
    """Rewrite the first partition with ``mutate(h, mbs)`` applied;
    token partitions pass through untouched."""
    h, mbs, rest = parse_part0(payload)
    mutate(h, mbs)
    part0 = write_part0(h, mbs)
    tag = (len(part0) << 5) | (h.show_frame << 4) | (h.version << 1) | 0
    out = bytes(
        [tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF]
    ) + payload[3:10] + part0 + rest
    return out


def wrap_webp(vp8: bytes) -> bytes:
    chunk = b"VP8 " + len(vp8).to_bytes(4, "little") + vp8
    if len(vp8) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
