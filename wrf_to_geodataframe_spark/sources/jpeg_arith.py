"""JPEG arithmetic entropy coding (ITU-T T.81 Annexes D and F).

Implements the QM-coder and the DC/AC conditioning models for
EXTENDED SEQUENTIAL arithmetic-coded JPEG (SOF9), both directions:

- ``_ArithDecoder`` / ``_ArithEncoder``: the binary QM arithmetic
  coder of Annex D — 16-bit interval register renormalized at 0x8000,
  LPS subinterval on top with conditional MPS/LPS exchange, carry
  resolution through a stacked-0xFF byte buffer, and the marker-safe
  byte stuffing convention (a literal 0xFF data byte is written as
  FF 00; the decoder folds FF 00 back to FF and treats FF xx, xx != 0
  as the end of entropy data, feeding zero bytes thereafter).
- ``_ARITH_TAB``: the probability estimation state machine of
  Table D.3 — (Qe, NLPS, NMPS, SWITCH) — 113 adaptive states plus the
  non-adaptive "fixed" state used for AC sign decisions.  The values
  are the spec's constants; the unit tests additionally verify this
  transcription against the system libjpeg's exported ``jpeg_aritab``
  when the library is present.
- DC statistics model (F.1.4.1 / F.2.4.1): 49 bins per conditioning
  table — 5 classes of the previous DIFF (zero / small+ / small- /
  large+ / large-, boundaries from the DAC L/U parameters) x 4
  decisions, a 15-bin shared magnitude-category tree at offset 20 and
  14 magnitude-bit bins at offset 34+1.
- AC statistics model (F.1.4.3 / F.2.4.3): 245 bins per table — 3 per
  coefficient index K (end-of-block, significance, first magnitude
  decisions) plus two 28-bin low/high magnitude areas split at the
  DAC Kx parameter (default 5).

Interop is the design goal, not just self round-trip: the test suite
cross-validates both directions against the system libjpeg
(an independent implementation) at the exact coefficient level.

No reference counterpart (the reference engine has no image path);
part of the north-star multimodal surface alongside ``jpeg.py``.
"""

from __future__ import annotations

# (Qe, Next_Index_LPS, Next_Index_MPS, Switch_MPS) — T.81 Table D.3.
# Index 113 is the non-adaptive equiprobable state (AC sign coding).
_ARITH_TAB = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
]

_FIXED = 113  # non-adaptive state index (AC sign)


class _Stats:
    """A statistics area: per-bin (state index, MPS sense)."""

    __slots__ = ("idx", "mps")

    def __init__(self, n: int):
        self.idx = bytearray(n)
        self.mps = bytearray(n)

    def reset(self) -> None:
        for i in range(len(self.idx)):
            self.idx[i] = 0
            self.mps[i] = 0


class _ArithDecoder:
    """Annex D QM decoder over a byte string, bit-fed: the 16-bit code
    window ``c`` and interval ``a`` double together on renorm, pulling
    one fresh stream bit per shift.  On reaching a marker (FF xx,
    xx != 0) the feed supplies zero bits forever and records the
    marker position — the scan driver uses it to find the entropy
    segment's end."""

    __slots__ = ("data", "pos", "end", "c", "a", "cur", "nbits", "marker_pos")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.marker_pos = -1
        self.cur = 0
        self.nbits = 0
        b0 = self._byte()
        b1 = self._byte()
        self.c = (b0 << 8) | b1
        self.a = 0x10000

    def _byte(self) -> int:
        d = self.data
        if self.marker_pos >= 0:
            return 0
        if self.pos >= len(d):
            self.marker_pos = len(d)
            return 0
        b = d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
        if nxt == 0x00:
            self.pos += 2  # stuffed data byte 0xFF
            return 0xFF
        self.marker_pos = self.pos  # entropy data ends here
        return 0

    def _bit(self) -> int:
        if self.nbits == 0:
            self.cur = self._byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def decode(self, st: _Stats, k: int) -> int:
        qe, nlps, nmps, switch = _ARITH_TAB[st.idx[k]]
        mps = st.mps[k]
        self.a -= qe
        if self.c >= self.a:
            # upper subinterval (nominal LPS, width qe)
            self.c -= self.a
            if self.a < qe:  # conditional exchange: MPS took the top
                d = mps
                st.idx[k] = nmps
            else:
                d = mps ^ 1
                if switch:
                    st.mps[k] = mps ^ 1
                st.idx[k] = nlps
            self.a = qe
        else:
            if self.a >= 0x8000:
                return mps
            if self.a < qe:  # conditional exchange: LPS took the bottom
                d = mps ^ 1
                if switch:
                    st.mps[k] = mps ^ 1
                st.idx[k] = nlps
            else:
                d = mps
                st.idx[k] = nmps
        while self.a < 0x8000:
            self.a <<= 1
            self.c = ((self.c << 1) | self._bit()) & 0xFFFFFFFF
        return d


class _ArithEncoder:
    """Annex D QM encoder: interval base accumulates in ``c`` (fraction
    bits 0..15 aligned with ``a``, completed bits above), a byte spills
    from bits 19..26 every 8 renorm shifts, carries resolve through a
    buffered byte + stacked-0xFF count, and any literal 0xFF data byte
    is written as FF 00 (the decoder's unstuffing convention)."""

    __slots__ = ("out", "c", "a", "ct", "buf", "sc")

    def __init__(self):
        self.out = bytearray()
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.buf = -1  # no byte buffered yet
        self.sc = 0  # stacked 0xFF bytes awaiting carry resolution

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)  # byte stuffing

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: propagate into the buffered byte, stacked FFs
            # wrap to 00
            if self.buf >= 0:
                self._emit(self.buf + 1)
            while self.sc:
                self.out.append(0x00)
                self.sc -= 1
            self.buf = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # may still be carried into
        else:
            if self.buf >= 0:
                self._emit(self.buf)
            while self.sc:
                self._emit(0xFF)
                self.sc -= 1
            self.buf = t
        self.c &= 0x7FFFF

    def encode(self, st: _Stats, k: int, d: int) -> None:
        qe, nlps, nmps, switch = _ARITH_TAB[st.idx[k]]
        mps = st.mps[k]
        self.a -= qe
        if d == mps:
            if self.a >= 0x8000:
                return
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            st.idx[k] = nmps
        else:
            if self.a < qe:  # conditional exchange: LPS takes the bottom
                pass
            else:
                self.c += self.a
                self.a = qe
            if switch:
                st.mps[k] = mps ^ 1
            st.idx[k] = nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def flush(self) -> bytes:
        # CLEARBITS: pick the value in [c, c + a) with the most trailing
        # zero fraction bits
        t = (self.c + self.a - 1) & ~0xFFFF
        if t < self.c:
            t += 0x8000
        self.c = t
        # FINALWRITES
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        if self.buf >= 0:
            self._emit(self.buf)
        while self.sc:
            self._emit(0xFF)
            self.sc -= 1
        # trailing PLAIN zero bytes are redundant (the decoder
        # zero-feeds past the marker) — but a 0x00 that stuffs a
        # preceding 0xFF is part of a significant data byte and must
        # stay, as must the 0xFF itself
        out = self.out
        while out and out[-1] == 0x00 and (len(out) < 2 or out[-2] != 0xFF):
            out.pop()
        return bytes(out)


# ---------------------------------------------------------------------------
# DC / AC conditioning models (Annex F)


def _dc_class(m: int, sign: int, lo: int, hi: int) -> int:
    """Conditioning class of a just-(de)coded DIFF for the NEXT block:
    m is the magnitude-category MSB (0 when |DIFF| == 1), boundaries
    from the DAC L/U parameters (F.1.4.4.1.2)."""
    if m < ((1 << lo) >> 1):
        return 0
    if m > ((1 << hi) >> 1):
        return 12 + sign * 4
    return 4 + sign * 4


def decode_dc_diff(dec: _ArithDecoder, st: _Stats, ctx: int,
                   lo: int, hi: int) -> tuple[int, int]:
    """Returns (diff, next_context_base)."""
    if not dec.decode(st, ctx):
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    m = dec.decode(st, ctx + 2 + sign)
    if m:
        k = 20
        while dec.decode(st, k):
            m <<= 1
            if m == 0x8000:
                raise ValueError("corrupt JPEG: arithmetic DC overflow")
            k += 1
    else:
        k = ctx + 2 + sign  # st+14 never read for m == 0
    nxt = _dc_class(m, sign, lo, hi)
    v = m
    k += 14
    while m > 1:
        m >>= 1
        if dec.decode(st, k):
            v |= m
    v += 1
    return (-v if sign else v), nxt


def encode_dc_diff(enc: _ArithEncoder, st: _Stats, ctx: int, diff: int,
                   lo: int, hi: int) -> int:
    """Returns the next context base."""
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    sz = (-diff if sign else diff) - 1
    if sz:
        enc.encode(st, ctx + 2 + sign, 1)
        # the category tree codes floor(log2(sz)) ones: the decoder
        # starts m = 1 (from the decision above) and doubles per one
        m = 1
        k = 20
        while sz >= (m << 1):
            enc.encode(st, k, 1)
            m <<= 1
            k += 1
        enc.encode(st, k, 0)
    else:
        enc.encode(st, ctx + 2 + sign, 0)
        m = 0
        k = ctx + 2 + sign
    nxt = _dc_class(m, sign, lo, hi)
    k += 14
    b = m >> 1
    while b:
        enc.encode(st, k, 1 if sz & b else 0)
        b >>= 1
    return nxt


def decode_ac_coefs(dec: _ArithDecoder, st: _Stats, fixed: _Stats, kx: int,
                    blk, zig, ss: int = 1, se_band: int = 63,
                    al: int = 0) -> None:
    """Decode AC coefficients of the band ``ss..se_band`` into blk via
    the natural-order map ``zig`` (F.2.4.3).  ``al`` is the successive-
    approximation low bit (progressive AC-first scans store values
    shifted up by ``al``); the sequential scan is the (1, 63, 0)
    case."""
    k = ss
    while k <= se_band:
        se = 3 * (k - 1)
        if dec.decode(st, se):
            return  # EOB
        while not dec.decode(st, se + 1):
            k += 1
            se += 3
            if k > se_band:
                raise ValueError("corrupt JPEG: arithmetic AC run-off")
        sign = dec.decode(fixed, 0)
        m = dec.decode(st, se + 2)
        p = se + 2
        if m and dec.decode(st, p):
            m = 2
            p = 189 if k <= kx else 217
            while dec.decode(st, p):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("corrupt JPEG: arithmetic AC overflow")
                p += 1
        v = m
        p += 14
        while m > 1:
            m >>= 1
            if dec.decode(st, p):
                v |= m
        v += 1
        blk[zig[k]] = (-v if sign else v) << al
        k += 1


def encode_ac_coefs(enc: _ArithEncoder, st: _Stats, fixed: _Stats, kx: int,
                    coefs, ss: int = 1, se_band: int = 63,
                    al: int = 0) -> None:
    """Encode AC coefficients (``coefs`` in ZIGZAG order) of the band
    ``ss..se_band`` at successive-approximation precision ``al``."""
    ke = se_band
    while ke >= ss and (abs(int(coefs[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        se = 3 * (k - 1)
        enc.encode(st, se, 0)  # not EOB
        while (abs(int(coefs[k])) >> al) == 0:
            enc.encode(st, se + 1, 0)
            k += 1
            se += 3
        enc.encode(st, se + 1, 1)
        v = int(coefs[k])
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        sz = ((-v if sign else v) >> al) - 1
        p = se + 2
        if sz:
            enc.encode(st, p, 1)
            if sz >= 2:
                enc.encode(st, p, 1)
                m = 2
                p = 189 if k <= kx else 217
                while sz >= (m << 1):
                    enc.encode(st, p, 1)
                    m <<= 1
                    p += 1
                enc.encode(st, p, 0)
            else:
                enc.encode(st, p, 0)
                m = 1
        else:
            enc.encode(st, p, 0)
            m = 0
        p += 14
        b = m >> 1
        while b:
            enc.encode(st, p, 1 if sz & b else 0)
            b >>= 1
        k += 1
    if k <= se_band:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def decode_ac_refine(dec: _ArithDecoder, st: _Stats, fixed: _Stats,
                     blk, zig, ss: int, se_band: int, al: int) -> None:
    """AC successive-approximation refinement scan (G.2 / F.2.4.3.3):
    per k — EOB decision only beyond the previous scans' EOB index,
    correction bit for already-nonzero coefficients (same 3-per-K
    context area), newly-nonzero significance with a fixed-bin
    sign."""
    p1 = 1 << al
    kex = se_band
    while kex >= ss and blk[zig[kex]] == 0:
        kex -= 1
    k = ss
    while k <= se_band:
        se = 3 * (k - 1)
        if k > kex and dec.decode(st, se):
            return  # EOB
        while True:
            c = int(blk[zig[k]])
            if c:
                if dec.decode(st, se + 2):
                    blk[zig[k]] = c + (p1 if c > 0 else -p1)
                break
            if dec.decode(st, se + 1):
                blk[zig[k]] = -p1 if dec.decode(fixed, 0) else p1
                break
            se += 3
            k += 1
            if k > se_band:
                raise ValueError("corrupt JPEG: arithmetic AC run-off")
        k += 1


def encode_ac_refine(enc: _ArithEncoder, st: _Stats, fixed: _Stats,
                     coefs, ss: int, se_band: int, al: int) -> None:
    """Inverse of :func:`decode_ac_refine` (``coefs`` zigzag order,
    full-precision values; bits above ``al`` were coded by earlier
    scans)."""
    kex = se_band
    while kex >= ss and (abs(int(coefs[kex])) >> (al + 1)) == 0:
        kex -= 1
    kend = se_band
    while kend >= ss and (abs(int(coefs[kend])) >> al) == 0:
        kend -= 1
    k = ss
    while k <= se_band:
        se = 3 * (k - 1)
        if k > kex:
            if k > kend:
                enc.encode(st, se, 1)  # EOB: no bits left in this scan
                return
            enc.encode(st, se, 0)
        while True:
            v = int(coefs[k])
            av = abs(v) >> al
            if abs(v) >> (al + 1):  # previously nonzero: correction bit
                enc.encode(st, se + 2, av & 1)
                break
            if av:  # newly significant at this precision
                enc.encode(st, se + 1, 1)
                enc.encode(fixed, 0, 1 if v < 0 else 0)
                break
            enc.encode(st, se + 1, 0)
            se += 3
            k += 1
        k += 1


class _FixedStats(_Stats):
    """A 1-bin stats area pinned to the non-adaptive state."""

    def __init__(self):
        super().__init__(1)
        self.idx[0] = _FIXED

    def reset(self) -> None:
        self.idx[0] = _FIXED
        self.mps[0] = 0


def make_dc_stats() -> _Stats:
    return _Stats(64)


def make_ac_stats() -> _Stats:
    return _Stats(256)
