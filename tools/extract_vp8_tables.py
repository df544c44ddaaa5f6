"""Regenerate ``wrf_to_geodataframe_spark/sources/vp8_tables.py`` from
the system libwebp shared object.

The VP8 constant tables (default/update coefficient probabilities,
keyframe B-mode probabilities, quantizer lookups) are public constants
of RFC 6386 ("VP8 Data Format and Decoding Guide") and are embedded
verbatim in the open-source libwebp's .rodata.  This container has no
network access and no copy of the RFC text, so the committed table
module is recovered from the library binary, anchored on rows of the
spec tables (e.g. the famous type-0 band-1 default row
``253,136,254,255,228,219,...``) and validated structurally
(contiguity with the adjacent tables, monotone quantizer lookups,
all-128 never-read type-0 band-0 block).  The decoder interop tests
(``tests/test_vp8_interop.py``) then cross-validate the whole stack
bit-exactly against libwebp itself.

Usage: python tools/extract_vp8_tables.py [path-to-libwebp.so]
"""

from __future__ import annotations

import ctypes.util
import struct
import sys


def _find_lib() -> str:
    for cand in (
        "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
        "/usr/lib/libwebp.so.7",
    ):
        try:
            open(cand, "rb").close()
            return cand
        except OSError:
            continue
    name = ctypes.util.find_library("webp")
    if not name:
        raise SystemExit("libwebp not found")
    return name


def extract(path: str) -> dict:
    data = open(path, "rb").read()

    # --- default coefficient probs [4][8][3][11] -------------------------
    # anchor: type 0, band 1, ctx 0 row (band 0 of type 0 is never read —
    # type 0 blocks start at coefficient 1 — and is stored as 33 x 128)
    anchor = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
    a = data.find(anchor)
    if a < 0:
        raise SystemExit("coeff-prob anchor not found")
    start = a - 33
    if data[start:a] != bytes([128]) * 33:
        raise SystemExit("type-0 band-0 placeholder block not found")
    coeffs = data[start : start + 1056]
    if len(coeffs) != 1056 or not all(b >= 1 for b in coeffs):
        raise SystemExit("coeff table sanity check failed")

    # --- update probs [4][8][3][11]: ends exactly where kBModesProba
    # begins; begins with the same never-read 33 x 255 block -------------
    b_anchor = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
    bm = data.find(b_anchor)
    if bm < 0:
        raise SystemExit("kf-bmode anchor not found")
    upd = data[bm - 1056 : bm]
    if upd[:33] != bytes([255]) * 33 or upd[33:35] != bytes([176, 246]):
        raise SystemExit("update-prob table sanity check failed")
    bmode = data[bm : bm + 900]

    # --- quantizer lookups ----------------------------------------------
    act = struct.pack("<4H", 4, 5, 6, 7)
    k = 0
    ac = None
    while True:
        k = data.find(act, k)
        if k < 0:
            break
        vals = struct.unpack("<128H", data[k : k + 256])
        if all(vals[i] <= vals[i + 1] for i in range(127)) and vals[-1] == 284:
            ac = list(vals)
            break
        k += 1
    if ac is None:
        raise SystemExit("AC quant table not found")
    dct = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17])
    k = data.find(dct)
    dc = None
    while k >= 0:
        seg = data[k : k + 128]
        if all(seg[i] <= seg[i + 1] for i in range(127)) and seg[-1] == 157:
            dc = list(seg)
            break
        k = data.find(dct, k + 1)
    if dc is None:
        raise SystemExit("DC quant table not found")
    return {
        "coeffs": list(coeffs),
        "update": list(upd),
        "bmode": list(bmode),
        "ac_q": ac,
        "dc_q": dc,
    }


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else _find_lib()
    t = extract(path)

    def fmt(vals, per_line=16):
        lines = []
        for i in range(0, len(vals), per_line):
            lines.append("    " + ", ".join(str(v) for v in vals[i : i + per_line]) + ",")
        return "\n".join(lines)

    out = f'''"""VP8 (RFC 6386) constant tables — public spec constants recovered
from the system libwebp .rodata by ``tools/extract_vp8_tables.py``
(see its docstring for the anchoring/validation method; the interop
tests cross-validate the decoder bit-exactly against libwebp).

Layouts:
- ``COEFF_PROBS`` / ``COEFF_UPDATE_PROBS``: flat [4][8][3][11]
  (block type, coefficient band, context, tree node).
- ``KF_BMODE_PROBS``: flat [10][10][9] (above mode, left mode, node).
- ``DC_QLOOKUP`` / ``AC_QLOOKUP``: 128-entry quantizer lookups.
"""

COEFF_PROBS = bytes([
{fmt(t["coeffs"])}
])

COEFF_UPDATE_PROBS = bytes([
{fmt(t["update"])}
])

KF_BMODE_PROBS = bytes([
{fmt(t["bmode"])}
])

DC_QLOOKUP = [
{fmt(t["dc_q"])}
]

AC_QLOOKUP = [
{fmt(t["ac_q"])}
]
'''
    dest = "wrf_to_geodataframe_spark/sources/vp8_tables.py"
    with open(dest, "w") as fh:
        fh.write(out)
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
