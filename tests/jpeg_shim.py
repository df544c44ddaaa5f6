"""Compile-on-demand wrapper around the system libjpeg test oracle
(``tools/jpegshim.c``): lets the JPEG tests cross-validate the pure-
Python codec against an independent implementation at the exact
coefficient level.  Everything degrades to a pytest skip when gcc,
jpeglib.h, or libjpeg are absent."""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

_BIN: str | None = None
_TRIED = False


def shim_path() -> str | None:
    """Path of the compiled shim, or None when it cannot be built."""
    global _BIN, _TRIED
    if _TRIED:
        return _BIN
    _TRIED = True
    gcc = shutil.which("gcc") or shutil.which("cc")
    src = os.path.join(os.path.dirname(__file__), "..", "tools", "jpegshim.c")
    if not gcc or not os.path.exists(src):
        return None
    out = os.path.join(tempfile.gettempdir(), f"jpegshim-{os.getuid()}")
    if not os.path.exists(out):
        r = subprocess.run(
            [gcc, "-O2", "-o", out, src, "-ljpeg"], capture_output=True
        )
        if r.returncode != 0:
            return None
    # verify arithmetic support (libjpeg can be built without it)
    r = subprocess.run(
        [out, "encode", "8", "8", "1", "75", "1", "0", "0"],
        input=bytes(64), capture_output=True,
    )
    if r.returncode != 0:
        return None
    _BIN = out
    return _BIN


def lib_encode(raw: bytes, w: int, h: int, nc: int, quality: int = 85,
               arith: bool = False, progressive: bool = False,
               restart: int = 0) -> bytes:
    r = subprocess.run(
        [shim_path(), "encode", str(w), str(h), str(nc), str(quality),
         str(int(arith)), str(int(progressive)), str(restart)],
        input=raw, capture_output=True,
    )
    assert r.returncode == 0, r.stderr.decode()[:400]
    return r.stdout


def lib_coefs(jpg: bytes) -> dict:
    """{(comp, by, bx): [64 natural-order coefficients]} as entropy-
    decoded by libjpeg (jpeg_read_coefficients — no IDCT)."""
    r = subprocess.run([shim_path(), "coef"], input=jpg, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:400]
    out = {}
    for line in r.stdout.splitlines():
        q = line.split()
        out[(int(q[0]), int(q[1]), int(q[2]))] = [int(x) for x in q[3:]]
    return out


def lib_pixels(jpg: bytes):
    r = subprocess.run([shim_path(), "pixels"], input=jpg, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:400]
    hdr, _, rest = r.stdout.partition(b"\n")
    w, h, n = map(int, hdr.split())
    return w, h, n, rest


def my_coefs(jpg: bytes) -> dict:
    """Same layout from the pure-Python entropy decoder."""
    from wrf_to_geodataframe_spark.sources.jpeg import (
        decode_jpeg_coefficients,
    )

    st = decode_jpeg_coefficients(jpg)
    out = {}
    for ci, c in enumerate(st["comps"]):
        a = c["coef"]
        for by in range(a.shape[0]):
            for bx in range(a.shape[1]):
                out[(ci, by, bx)] = a[by, bx].tolist()
    return out
