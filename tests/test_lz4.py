"""LZ4 decoder interop + spec tests (sources/lz4.py).

Cross-validation discipline (same as zstd, tests/test_zstd.py): every
frame the system ``lz4`` CLI can produce — levels, block sizes, linked
blocks, content size, block checksums — must decode byte-identically,
WITH checksum verification on (the CLI emits xxHash32 frame checksums
by default, so agreement also validates the from-scratch xxh32).
Spec-level block behavior (overlap copies, malformed inputs) is pinned
with hand-built blocks.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import pytest

from wrf_to_geodataframe_spark.sources.lz4 import (
    Lz4Error,
    is_lz4_frame,
    lz4_block_decompress,
    lz4_frame_decompress,
    xxh32,
)

LZ4_CLI = shutil.which("lz4")

requires_cli = pytest.mark.skipif(LZ4_CLI is None, reason="no lz4 CLI")


def cli_compress(data: bytes, *opts: str) -> bytes:
    p = subprocess.run(
        [LZ4_CLI, "-z", "-c", *opts],
        input=data,
        stdout=subprocess.PIPE,
        check=True,
    )
    return p.stdout


def _corpus() -> dict[str, bytes]:
    rng = __import__("random").Random(0xC0FFEE)
    rand = bytes(rng.getrandbits(8) for _ in range(70_000))
    return {
        "empty": b"",
        "one": b"x",
        "text": b"the quick brown fox jumps over the lazy dog\n" * 400,
        "zeros": b"\x00" * 300_000,
        "random": rand,  # incompressible -> uncompressed blocks
        "mixed": (b"ABCD" * 5000) + rand[:9000] + (b"\x07" * 40_000),
        "big": (b"0123456789abcdef" * 40_000) + rand,  # > one 64KiB block
    }


# -- xxh32 ---------------------------------------------------------------

def test_xxh32_published_vectors():
    # Public reference vectors (xxHash README / test suite)
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", seed=0x9E3779B1) == 0x36B78AE7
    assert xxh32(b"abc") == 0x32D153FF


# -- CLI interop ---------------------------------------------------------

@requires_cli
@pytest.mark.parametrize("level", ["-1", "-6", "-9", "-12"])
def test_cli_frames_all_levels(level):
    for name, data in _corpus().items():
        frame = cli_compress(data, level)
        assert is_lz4_frame(frame), name
        assert lz4_frame_decompress(frame) == data, (name, level)


@requires_cli
@pytest.mark.parametrize(
    "opts",
    [
        ("-B4",),                       # 64 KiB blocks -> multi-block
        ("-B5", "-BD"),                 # linked blocks, 256 KiB
        ("-B4", "-BD"),                 # linked + small blocks
        ("-B7",),
        ("--content-size",),
        ("-BX",),                       # per-block checksums
        ("-B4", "-BD", "-BX", "--content-size", "-9"),
    ],
)
def test_cli_frame_options(opts):
    for name, data in _corpus().items():
        frame = cli_compress(data, *opts)
        assert lz4_frame_decompress(frame) == data, (name, opts)


@requires_cli
def test_concatenated_and_skippable_frames():
    a, b = b"first payload " * 99, b"second\x00payload" * 57
    fa, fb = cli_compress(a, "-9"), cli_compress(b, "-1")
    skip = struct.pack("<II", 0x184D2A50, 7) + b"\xEE" * 7
    assert lz4_frame_decompress(fa + fb) == a + b
    assert lz4_frame_decompress(skip + fa + skip + fb) == a + b
    assert is_lz4_frame(skip)


@requires_cli
def test_checksum_verification_catches_corruption():
    data = b"payload under test " * 500
    frame = bytearray(cli_compress(data, "-1"))
    # flip a bit somewhere inside the block payload (past the header)
    frame[len(frame) // 2] ^= 0x40
    with pytest.raises(Lz4Error):
        lz4_frame_decompress(bytes(frame))


# -- hand-built blocks (spec semantics) ----------------------------------

def test_block_literals_only():
    # token 0x50: 5 literals, end of block
    assert lz4_block_decompress(b"\x50hello", 64) == b"hello"


def test_block_simple_match():
    # 4 literals "abcd", then match offset=4 len=4+4 -> "abcdabcdabcd"
    blk = b"\x44abcd" + struct.pack("<H", 4) + b"\x10\x00" + b"!"
    # token2 0x10: 1 literal "!"?  Build precisely:
    blk = bytes([0x44]) + b"abcd" + struct.pack("<H", 4) + bytes([0x10]) + b"!"
    assert lz4_block_decompress(blk, 64) == b"abcdabcdabcd" + b"!"


def test_block_overlap_rle():
    # 1 literal "A", match offset=1 len=19 -> 20 x "A"
    blk = bytes([0x1F]) + b"A" + struct.pack("<H", 1) + bytes([0x00])
    assert lz4_block_decompress(blk, 64) == b"A" * 20


def test_block_long_lengths():
    # literal length 15+255+3 = 273, then offset 273 match of len 15+4+255+17
    lits = bytes(range(256)) + b"0123456789ABCDEF" + b"Z"
    assert len(lits) == 273
    blk = (
        bytes([0xFF, 255, 3]) + lits
        + struct.pack("<H", 273) + bytes([255, 17])
    )
    out = lz4_block_decompress(blk, 4096)
    want = lits + (lits * 3)[: 15 + 4 + 255 + 17]
    assert out == want


@pytest.mark.parametrize(
    "blk,msg",
    [
        (b"", "empty"),
        (bytes([0x44]) + b"ab", "literal run past end"),
        (bytes([0x04]) + b"abcd" + struct.pack("<H", 0), "zero match offset"),
        (bytes([0x04]) + b"abcd" + struct.pack("<H", 9), "beyond window"),
        (bytes([0xF0, 255]), "truncated literal length"),
        (bytes([0x04]) + b"abcd" + b"\x01", "truncated match offset"),
    ],
)
def test_block_malformed(blk, msg):
    with pytest.raises(Lz4Error):
        lz4_block_decompress(blk, 1 << 20)


def test_block_output_bound_enforced():
    with pytest.raises(Lz4Error):
        lz4_block_decompress(b"\x50hello", 3)


def test_frame_malformed_inputs():
    for bad in [
        b"",
        b"\x00\x00\x00\x00",
        struct.pack("<I", 0x184D2204),  # magic only
        struct.pack("<I", 0x184D2204) + b"\x40\x40\x00",  # bad version
    ]:
        with pytest.raises(Lz4Error):
            lz4_frame_decompress(bad)
