"""Szip (CCSDS 121.0-B extended-Rice) codec — the HDF5 ``szip``
filter's payload format (filter id 4), closing the last documented
HDF5 filter gap (VERDICT r6 item #5: NASA Earthdata products).

Implemented from the public CCSDS 121.0-B-2 lossless coding spec and
the documented szlib/libaec behavior (no szip library exists in this
container, so correctness rests on spec-derived GOLDEN bitstreams in
``tests/test_hdf5.py`` — hand-assembled codewords from the standard —
plus encode/decode round-trips; the golden vectors break the
mirrored-bug blindness of self-round-trips).

Format summary (per scanline of ``pixels_per_scanline`` samples,
compressed independently):

- Samples are ``bits``-wide unsigned fields; the bitstream is
  MSB-first.  With the NN (nearest-neighbor predictive) option the
  scanline's FIRST sample is a raw reference; every other sample is
  the standard CCSDS mapped prediction residual.
- Samples group into blocks of ``pixels_per_block`` (the reference
  block carries one fewer).  Each block starts with an ID of
  ``id_len`` bits (3 for bits<=8, 4 for <=16, 5 otherwise):

  =====================  =============================================
  ID 0, ext bit 0        zero-block run; FS-coded count: values 0-3 ->
                         run 1-4 blocks, 4 -> rest of 64-block
                         segment, >=5 -> run of that many blocks
  ID 0, ext bit 1        second extension: samples paired, each pair
                         FS-coded as gamma = (a+b)(a+b+1)/2 + b
  ID i in [1, max-1]     k-split, k = i-1: all FS prefixes first,
                         then all k-bit remainders (k = 0 is pure FS)
  ID max (all ones)      uncompressed: raw ``bits``-wide samples
  =====================  =============================================

Supported: EC and NN modes, 8/16/32-bit samples, LSB/MSB byte
packing, partial trailing blocks/scanlines (encoder pads with the
last sample; decoder truncates to the pixel count).  Not supported
(named error): second extension on a reference block (szlib never
emits it there either).
"""

from __future__ import annotations


class SzipError(ValueError):
    pass


# option mask bits (public szlib API constants)
SZ_EC_OPTION_MASK = 4
SZ_LSB_OPTION_MASK = 8
SZ_MSB_OPTION_MASK = 16
SZ_NN_OPTION_MASK = 32
SZ_RAW_OPTION_MASK = 128

_SEGMENT_BLOCKS = 64  # zero-run "rest of segment" unit


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0  # bit position

    def take(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.buf):
                raise SzipError("truncated szip stream")
            v = (v << 1) | ((self.buf[byte_i] >> (7 - bit_i)) & 1)
            self.pos += 1
        return v

    def fs(self) -> int:
        n = 0
        while True:
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.buf):
                raise SzipError("truncated szip stream (FS code)")
            bit = (self.buf[byte_i] >> (7 - bit_i)) & 1
            self.pos += 1
            if bit:
                return n
            n += 1
            if n > 1 << 28:
                raise SzipError("runaway FS code")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def fs(self, v: int) -> None:
        while v >= 32:
            self.put(0, 32)
            v -= 32
        self.put(1, v + 1)  # v zeros then a 1

    def bytes(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _id_len(bits: int) -> int:
    return 3 if bits <= 8 else 4 if bits <= 16 else 5


def _unmap_nn(d: int, prev: int, smax: int) -> int:
    """Inverse of the CCSDS standard prediction-residual mapping
    (smin = 0, unsigned samples)."""
    theta = min(prev, smax - prev)
    if d <= 2 * theta:
        if d % 2 == 0:
            return prev + d // 2
        return prev - (d + 1) // 2
    # overflow values only occur toward the side with more headroom
    if prev <= smax - prev:
        return prev + (d - theta)
    return prev - (d - theta)


def _map_nn(x: int, prev: int, smax: int) -> int:
    delta = x - prev
    theta = min(prev, smax - prev)
    if 0 <= delta <= theta:
        return 2 * delta
    if -theta <= delta < 0:
        return -2 * delta - 1
    return theta + abs(delta)


def _unpack_samples(raw: bytes, bits: int, msb: bool) -> list[int]:
    bp = (bits + 7) // 8
    if len(raw) % bp:
        raise SzipError("sample buffer not a whole number of samples")
    out = []
    for i in range(0, len(raw), bp):
        chunk = raw[i : i + bp]
        out.append(int.from_bytes(chunk, "big" if msb else "little"))
    return out


def _pack_samples(vals: list[int], bits: int, msb: bool) -> bytes:
    bp = (bits + 7) // 8
    out = bytearray()
    for v in vals:
        out += int(v).to_bytes(bp, "big" if msb else "little")
    return bytes(out)


def szip_decode(
    data: bytes,
    n_pixels: int,
    options_mask: int,
    bits_per_pixel: int,
    pixels_per_block: int,
    pixels_per_scanline: int,
) -> bytes:
    """Decode one szip-compressed buffer (an HDF5 chunk) back to its
    raw little/big-endian sample bytes."""
    bits = bits_per_pixel
    if bits not in (8, 16, 32):
        raise SzipError(f"unsupported szip bits_per_pixel {bits}")
    J = pixels_per_block
    nn = bool(options_mask & SZ_NN_OPTION_MASK)
    msb = not (options_mask & SZ_LSB_OPTION_MASK)
    idl = _id_len(bits)
    id_max = (1 << idl) - 1
    smax = (1 << bits) - 1
    r = _BitReader(data)
    out: list[int] = []

    while len(out) < n_pixels:
        line_n = min(pixels_per_scanline, n_pixels - len(out))
        # the encoder pads the trailing scanline/block to full blocks
        # with copies of the last sample; decode full blocks, truncate
        full_line = pixels_per_scanline
        line: list[int] = []
        ref = None
        if nn:
            ref = r.take(bits)
            line.append(ref)
        blocks = (full_line + J - 1) // J
        bi = 0
        while bi < blocks:
            want = J - 1 if (bi == 0 and nn) else J
            code = r.take(idl)
            if code == 0:
                ext = r.take(1)
                if ext == 0:  # zero-block run
                    fs = r.fs()
                    if fs < 4:
                        run = fs + 1
                    elif fs == 4:
                        run = _SEGMENT_BLOCKS - (bi % _SEGMENT_BLOCKS)
                    else:
                        run = fs
                    run = min(run, blocks - bi)
                    for j in range(run):
                        n = J - 1 if (bi + j == 0 and nn) else J
                        line.extend([0] * n)
                    bi += run
                    continue
                # second extension
                if bi == 0 and nn:
                    raise SzipError(
                        "szip second extension on a reference block"
                    )
                vals: list[int] = []
                while len(vals) < want:
                    gamma = r.fs()
                    m = 0
                    while (m + 1) * (m + 2) // 2 <= gamma:
                        m += 1
                    b = gamma - m * (m + 1) // 2
                    a = m - b
                    vals.extend((a, b))
                line.extend(vals[:want])
            elif code == id_max:  # uncompressed
                line.extend(r.take(bits) for _ in range(want))
            else:  # k-split (k = code - 1; k = 0 is pure FS)
                k = code - 1
                fses = [r.fs() for _ in range(want)]
                if k:
                    line.extend(
                        (fs << k) | r.take(k) for fs in fses
                    )
                else:
                    line.extend(fses)
            bi += 1
        if nn:
            prev = line[0]
            decoded = [prev]
            for d in line[1:]:
                prev = _unmap_nn(d, prev, smax)
                decoded.append(prev)
            line = decoded
        out.extend(line[:line_n])
    return _pack_samples(out[:n_pixels], bits, msb)


def _encode_block(w: _BitWriter, vals: list[int], bits: int) -> None:
    """Pick the cheapest of zero / FS / k-split / raw for one block and
    emit it.  (Second extension is decode-supported but never chosen —
    matching conservative encoders.)"""
    idl = _id_len(bits)
    id_max = (1 << idl) - 1
    if all(v == 0 for v in vals):
        w.put(0, idl)
        w.put(0, 1)
        w.fs(0)  # run of 1
        return
    best_k, best_cost = None, len(vals) * bits  # raw cost
    for k in range(0, id_max - 1):
        cost = sum((v >> k) + 1 + k for v in vals)
        if cost < best_cost:
            best_k, best_cost = k, cost
    if best_k is None:
        w.put(id_max, idl)
        for v in vals:
            w.put(v, bits)
        return
    w.put(best_k + 1, idl)
    for v in vals:
        w.fs(v >> best_k)
    if best_k:
        for v in vals:
            w.put(v & ((1 << best_k) - 1), best_k)


def szip_encode(
    raw: bytes,
    options_mask: int,
    bits_per_pixel: int,
    pixels_per_block: int,
    pixels_per_scanline: int,
) -> bytes:
    """Compress raw sample bytes into an szip buffer ``szip_decode``
    (and szlib/libaec) can read."""
    bits = bits_per_pixel
    if bits not in (8, 16, 32):
        raise SzipError(f"unsupported szip bits_per_pixel {bits}")
    J = pixels_per_block
    nn = bool(options_mask & SZ_NN_OPTION_MASK)
    msb = not (options_mask & SZ_LSB_OPTION_MASK)
    smax = (1 << bits) - 1
    samples = _unpack_samples(raw, bits, msb)
    if any(v > smax for v in samples):
        raise SzipError("sample exceeds bits_per_pixel range")
    w = _BitWriter()
    # every scanline encodes ceil(pps / J) FULL blocks (the decoder
    # truncates back to the pixel count), so pad both a short trailing
    # scanline AND a scanline length that is not a block multiple
    line_slots = ((pixels_per_scanline + J - 1) // J) * J
    for s0 in range(0, len(samples), pixels_per_scanline):
        line = samples[s0 : s0 + pixels_per_scanline]
        if len(line) < line_slots:
            line = line + [line[-1]] * (line_slots - len(line))
        if nn:
            w.put(line[0], bits)
            prev = line[0]
            mapped = []
            for x in line[1:]:
                mapped.append(_map_nn(x, prev, smax))
                prev = x
            first, rest = mapped[: J - 1], mapped[J - 1 :]
        else:
            first, rest = line[:J], line[J:]
        _encode_block(w, first, bits)
        for b0 in range(0, len(rest), J):
            _encode_block(w, rest[b0 : b0 + J], bits)
    return w.bytes()
