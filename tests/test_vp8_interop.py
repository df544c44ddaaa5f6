"""Lossy VP8 decoder interop: libwebp encodes (WebPEncodeRGB at
several sizes/qualities), the pure-Python decoder decodes, and the
Y/U/V planes must match libwebp's own WebPDecodeYUV BIT-EXACTLY (VP8
reconstruction incl. the loop filter is exact by spec).  Skips cleanly
when libwebp is absent."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest


def _libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        return lib
    return None


_LIB = _libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None, reason="libwebp absent")


def _lib_encode_lossy(rgb: bytes, w: int, h: int, q: float) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(out))
    assert n > 0, "libwebp lossy encode failed"
    return ctypes.string_at(out, n)


def _lib_decode_yuv(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    yp = _LIB.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    assert yp, "libwebp YUV decode failed"
    W, H = w.value, h.value
    cw, ch = (W + 1) >> 1, (H + 1) >> 1
    y = np.ctypeslib.as_array(yp, (H, stride.value))[:, :W].copy()
    u = np.ctypeslib.as_array(up, (ch, uv_stride.value))[:, :cw].copy()
    v = np.ctypeslib.as_array(vp, (ch, uv_stride.value))[:, :cw].copy()
    return W, H, y, u, v


def _vp8_payload(webp: bytes) -> bytes:
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(webp):
        tag = webp[pos : pos + 4]
        size = int.from_bytes(webp[pos + 4 : pos + 8], "little")
        if tag == b"VP8 ":
            return webp[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _test_image(w: int, h: int, seed: int) -> bytes:
    """Mixed content: smooth gradients (DC/TM territory), hard edges
    (directional modes), and noise patches (B_PRED + dense tokens)."""
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    r = ((xx * 255) // max(w - 1, 1)).astype(np.uint8)
    g = ((yy * 255) // max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) % 256).astype(np.uint8)
    img = np.stack([r, g, b], -1)
    img[h // 3 : 2 * h // 3, w // 4 : w // 2] = (255, 0, 0)
    n = rng.integers(0, 256, (max(h // 4, 1), max(w // 4, 1), 3))
    img[: n.shape[0], : n.shape[1]] = n
    return img.astype(np.uint8).tobytes()


@needs_libwebp
@pytest.mark.parametrize("quality", [10.0, 50.0, 75.0, 95.0])
@pytest.mark.parametrize(
    "size", [(16, 16), (32, 32), (80, 48), (61, 37), (144, 96), (33, 17)]
)
def test_vp8_planes_match_libwebp(quality, size):
    from wrf_to_geodataframe_spark.sources.vp8 import decode_vp8_frame

    w, h = size
    rgb = _test_image(w, h, seed=w * h + int(quality))
    webp = _lib_encode_lossy(rgb, w, h, quality)
    lw, lh, ly, lu, lv = _lib_decode_yuv(webp)
    assert (lw, lh) == (w, h)
    gw, gh, gy, gu, gv = decode_vp8_frame(_vp8_payload(webp))
    assert (gw, gh) == (w, h)
    np.testing.assert_array_equal(gy, ly)
    np.testing.assert_array_equal(gu, lu)
    np.testing.assert_array_equal(gv, lv)


@needs_libwebp
def test_vp8_solid_color_16x16():
    from wrf_to_geodataframe_spark.sources.vp8 import decode_vp8_frame

    rgb = bytes([80, 160, 240]) * (16 * 16)
    webp = _lib_encode_lossy(rgb, 16, 16, 90.0)
    lw, lh, ly, lu, lv = _lib_decode_yuv(webp)
    gw, gh, gy, gu, gv = decode_vp8_frame(_vp8_payload(webp))
    np.testing.assert_array_equal(gy, ly)
    np.testing.assert_array_equal(gu, lu)
    np.testing.assert_array_equal(gv, lv)


def _transcode_case(mutate, w=80, h=48, q=60.0):
    import sys

    sys.path.insert(0, "tests")
    from vp8_transcode import transcode, wrap_webp

    from wrf_to_geodataframe_spark.sources.vp8 import decode_vp8_frame

    rgb = _test_image(w, h, seed=7)
    webp = _lib_encode_lossy(rgb, w, h, q)
    new_payload = transcode(_vp8_payload(webp), mutate)
    new_webp = wrap_webp(new_payload)
    lw, lh, ly, lu, lv = _lib_decode_yuv(new_webp)  # libwebp validates it
    assert (lw, lh) == (w, h)
    gw, gh, gy, gu, gv = decode_vp8_frame(new_payload)
    np.testing.assert_array_equal(gy, ly)
    np.testing.assert_array_equal(gu, lu)
    np.testing.assert_array_equal(gv, lv)


@needs_libwebp
def test_vp8_transcode_identity():
    _transcode_case(lambda h, mbs: None)


@needs_libwebp
def test_vp8_simple_filter():
    """libwebp's encoder never emits filter_type=1; synthesize it."""

    def mut(h, mbs):
        h.filter_type = 1
        h.filter_level = 40

    _transcode_case(mut)


@needs_libwebp
def test_vp8_sharpness_and_level():
    def mut(h, mbs):
        h.sharpness = 5
        h.filter_level = 33

    _transcode_case(mut)


@needs_libwebp
def test_vp8_loop_filter_deltas():
    """mode/ref lf deltas (keyframe: intra ref delta + B_PRED mode
    delta) alter per-MB filter strength."""

    def mut(h, mbs):
        h.lf_delta = 1
        h.ref_lf_deltas = [12, 0, 0, 0]
        h.mode_lf_deltas = [-8, 0, 0, 0]

    _transcode_case(mut)


@needs_libwebp
def test_vp8_skip_flags_enabled():
    """mb_no_coeff_skip with all-unskipped MBs: the per-MB flag is
    parsed but tokens still follow."""

    def mut(h, mbs):
        h.mb_no_skip = 1
        h.prob_skip = 37
        for rec in mbs:
            rec["skip"] = 0

    _transcode_case(mut)


@needs_libwebp
def test_vp8x_alpha_still_decodes_rgba():
    """VP8X + ALPH + VP8 (lossy with transparency): the alpha plane is
    coded losslessly, so it must match libwebp's EXACTLY; the RGB
    channels come from bit-exact YUV but a different (nearest vs
    fancy) chroma upsampler, so they match within a small envelope."""
    _LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    from wrf_to_geodataframe_spark.sources.webp import decode_webp, webp_info

    w, h = 48, 32
    rgb = np.frombuffer(_test_image(w, h, seed=9), np.uint8).reshape(h, w, 3)
    # alpha: gradient + a transparent hole (exercises the filters)
    a = ((np.arange(w)[None, :] * 5 + np.arange(h)[:, None] * 3) % 256
         ).astype(np.uint8)
    a[8:16, 8:24] = 0
    rgba = np.dstack([rgb, a]).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGBA(rgba, w, h, w * 4, 70.0, ctypes.byref(out))
    assert n > 0
    webp = ctypes.string_at(out, n)
    info = webp_info(webp)
    assert info["alpha"], "encoder should have produced a VP8X+ALPH file"

    dw, dh, ch, px = decode_webp(webp)
    assert (dw, dh, ch) == (w, h, 4)
    mine = np.frombuffer(px, np.uint8).reshape(h, w, 4)

    lw, lh = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(webp, len(webp), ctypes.byref(lw), ctypes.byref(lh))
    theirs = np.frombuffer(
        ctypes.string_at(p, lw.value * lh.value * 4), np.uint8
    ).reshape(h, w, 4)

    # RGBA now matches libwebp BIT-EXACTLY: alpha is losslessly
    # coded, and the RGB path replicates the fancy upsampler + the
    # truncating fixed-point matrix
    np.testing.assert_array_equal(mine, theirs)


@needs_libwebp
def test_vp8_random_image_sweep():
    """Breadth sweep: 30 random content/size/quality combos must all
    stay plane-for-plane bit-exact (mode coverage beyond the fixed
    parametrized matrix — noise drives dense tokens and B_PRED, flats
    drive skip-ish MBs, gradients drive TM/V/H)."""
    import random

    from wrf_to_geodataframe_spark.sources.vp8 import decode_vp8_frame

    rnd = random.Random(1234)
    for trial in range(30):
        w = rnd.randrange(8, 180)
        h = rnd.randrange(8, 140)
        q = rnd.choice([5.0, 25.0, 45.0, 65.0, 85.0, 99.0])
        kind = trial % 3
        rng = np.random.default_rng(trial)
        if kind == 0:
            img = rng.integers(0, 256, (h, w, 3))
        elif kind == 1:
            img = np.zeros((h, w, 3), np.int64)
            img[..., 0] = (np.arange(w)[None, :] * 255) // max(w - 1, 1)
            img[..., 1] = (np.arange(h)[:, None] * 255) // max(h - 1, 1)
            img[..., 2] = 128
        else:
            img = np.full((h, w, 3), 77, np.int64)
            img[h // 4 : h // 2, w // 4 : w // 2] = rng.integers(
                0, 256, (h // 2 - h // 4, w // 2 - w // 4, 3)
            )
        rgb = img.astype(np.uint8).tobytes()
        webp = _lib_encode_lossy(rgb, w, h, q)
        lw, lh, ly, lu, lv = _lib_decode_yuv(webp)
        gw, gh, gy, gu, gv = decode_vp8_frame(_vp8_payload(webp))
        assert (gw, gh) == (lw, lh) == (w, h), (trial, w, h, q)
        np.testing.assert_array_equal(gy, ly, err_msg=f"trial {trial} Y")
        np.testing.assert_array_equal(gu, lu, err_msg=f"trial {trial} U")
        np.testing.assert_array_equal(gv, lv, err_msg=f"trial {trial} V")


@needs_libwebp
def test_vp8_loop_filter_param_sweep():
    """Randomized transcode sweep over the loop-filter parameter space
    (sharpness 0-7, levels across the hev thresholds, ref/mode deltas,
    per-segment filter values, simple/normal) — libwebp validates each
    synthesized stream and both decoders must stay bit-exact."""
    import random
    import sys

    sys.path.insert(0, "tests")
    from vp8_transcode import transcode, wrap_webp

    from wrf_to_geodataframe_spark.sources.vp8 import decode_vp8_frame

    w, h = 96, 64
    rgb = _test_image(w, h, seed=21)
    base = _lib_encode_lossy(rgb, w, h, 40.0)  # seg on, real token load
    payload = _vp8_payload(base)
    rnd = random.Random(7)
    for trial in range(24):
        sharp = rnd.randrange(8)
        level = rnd.choice([1, 8, 14, 15, 39, 40, 63])
        ftype = rnd.randrange(2)
        lfd = rnd.randrange(2)

        def mut(hh, mbs):
            hh.sharpness = sharp
            hh.filter_level = level
            hh.filter_type = ftype
            if lfd:
                hh.lf_delta = 1
                hh.ref_lf_deltas = [rnd.randrange(-20, 21), 0, 0, 0]
                hh.mode_lf_deltas = [rnd.randrange(-20, 21), 0, 0, 0]
            if hh.segmentation:
                hh.seg_abs = rnd.randrange(2)
                if hh.seg_abs:
                    hh.seg_lf = [rnd.randrange(0, 64) for _ in range(4)]
                else:
                    hh.seg_lf = [rnd.randrange(-30, 31) for _ in range(4)]

        new_payload = transcode(payload, mut)
        lw, lh, ly, lu, lv = _lib_decode_yuv(wrap_webp(new_payload))
        gw, gh, gy, gu, gv = decode_vp8_frame(new_payload)
        ctx = f"trial {trial}: sharp={sharp} level={level} ft={ftype} lfd={lfd}"
        np.testing.assert_array_equal(gy, ly, err_msg=ctx)
        np.testing.assert_array_equal(gu, lu, err_msg=ctx)
        np.testing.assert_array_equal(gv, lv, err_msg=ctx)


@needs_libwebp
def test_vp8_quantizer_param_sweep():
    """Randomized transcode sweep over the quantizer space: base index
    extremes, all five delta fields at their 4-bit limits, per-segment
    quantizers (absolute and delta) — exercises index clamping, the
    y2 dc x2 / ac x155/100 escalation, and the uv-dc 117 index cap.
    Tokens are independent of the quantizers, so mutated streams stay
    valid and libwebp remains the arbiter."""
    import random
    import sys

    sys.path.insert(0, "tests")
    from vp8_transcode import transcode, wrap_webp

    from wrf_to_geodataframe_spark.sources.vp8 import decode_vp8_frame

    w, h = 80, 48
    rgb = _test_image(w, h, seed=33)
    payload = _vp8_payload(_lib_encode_lossy(rgb, w, h, 55.0))
    rnd = random.Random(11)
    for trial in range(24):
        qb = rnd.choice([0, 1, 5, 38, 63, 100, 126, 127])
        deltas = tuple(rnd.choice([-15, -8, -2, 0, 3, 9, 15]) for _ in range(5))
        sq_abs = rnd.randrange(2)
        sq = [
            rnd.randrange(0, 128) if sq_abs else rnd.randrange(-64, 65)
            for _ in range(4)
        ]

        def mut(hh, mbs):
            hh.q_base = qb
            hh.q_deltas = deltas
            if hh.segmentation:
                hh.seg_abs = sq_abs
                hh.seg_quant = sq

        new_payload = transcode(payload, mut)
        lw, lh, ly, lu, lv = _lib_decode_yuv(wrap_webp(new_payload))
        gw, gh, gy, gu, gv = decode_vp8_frame(new_payload)
        ctx = f"trial {trial}: qb={qb} d={deltas} abs={sq_abs} sq={sq}"
        np.testing.assert_array_equal(gy, ly, err_msg=ctx)
        np.testing.assert_array_equal(gu, lu, err_msg=ctx)
        np.testing.assert_array_equal(gv, lv, err_msg=ctx)


@needs_libwebp
def test_vp8_token_partition_table():
    """Token-partition plumbing: a one-MB-row image re-wrapped as a
    2-partition stream (row 0 -> partition 0, partition 1 present but
    empty) must parse the partition size table and decode identically;
    libwebp validates the synthesized stream."""
    import sys

    sys.path.insert(0, "tests")
    from vp8_transcode import parse_part0, wrap_webp, write_part0

    from wrf_to_geodataframe_spark.sources.vp8 import decode_vp8_frame

    w, h = 64, 16  # one MB row
    rgb = _test_image(w, h, seed=12)
    payload = _vp8_payload(_lib_encode_lossy(rgb, w, h, 60.0))
    hh, mbs, rest = parse_part0(payload)
    assert hh.n_parts == 1
    hh.n_parts = 2
    part0 = write_part0(hh, mbs)
    tag = (len(part0) << 5) | (hh.show_frame << 4) | (hh.version << 1)
    new_payload = (
        bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        + payload[3:10]
        + part0
        + len(rest).to_bytes(3, "little")  # partition 0 size
        + rest
    )
    lw, lh, ly, lu, lv = _lib_decode_yuv(wrap_webp(new_payload))
    gw, gh, gy, gu, gv = decode_vp8_frame(new_payload)
    np.testing.assert_array_equal(gy, ly)
    np.testing.assert_array_equal(gu, lu)
    np.testing.assert_array_equal(gv, lv)


@needs_libwebp
@pytest.mark.parametrize(
    "size,q", [((32, 32), 50.0), ((61, 37), 75.0), ((144, 96), 20.0)]
)
def test_vp8_rgb_output_bit_exact(size, q):
    """decode_webp's RGB surface (fancy 9-3-3-1 upsampler with nested
    rounding + MultHi-truncating BT.601 matrix) must equal
    WebPDecodeRGB byte for byte — the full end-to-end claim, beyond
    the YUV planes."""
    _LIB.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    from wrf_to_geodataframe_spark.sources.webp import decode_webp

    w, h = size
    rgb = _test_image(w, h, seed=h + int(q))
    webp = _lib_encode_lossy(rgb, w, h, q)
    lw, lh = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGB(webp, len(webp), ctypes.byref(lw), ctypes.byref(lh))
    theirs = ctypes.string_at(p, w * h * 3)
    dw, dh, ch, px = decode_webp(webp)
    assert (dw, dh, ch) == (w, h, 3)
    assert px == theirs
