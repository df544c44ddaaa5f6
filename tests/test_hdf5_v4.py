"""HDF5 VERSION-4 data-layout chunk indexes (the libver-latest layout
HDF5 >= 1.10 emits): Single Chunk (plain + filtered), Implicit, and
Fixed Array (client 0/1, unpaged + paged, missing chunks).

Fixtures are hand-assembled from the format spec (III.D layout v4,
III.K fixed array) with explicit offsets — the sink never emits these
structures, so reader and fixture cannot share a mirrored bug.  No
system validator exists in this container (no h5py/h5dump), the same
disclosed basis as the GRIB2/zarr3 goldens."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from wrf_to_geodataframe_spark.sources.hdf5 import read_hdf5
from wrf_to_geodataframe_spark.sources.hdf5_write import (
    _dataspace,
    _datatype,
    _finalize,
    _Hdf5Builder,
    _msg,
    _object_header,
)

_UNDEF = 0xFFFFFFFFFFFFFFFF


def _v4_prefix(chunk_dims_with_elem, flags=0, enc=4):
    body = struct.pack(
        "<BBBBB", 4, 2, flags, len(chunk_dims_with_elem), enc
    )
    for d in chunk_dims_with_elem:
        body += int(d).to_bytes(enc, "little")
    return body


_DEFLATE_MSG = struct.pack("<BB2x4x", 1, 1) + struct.pack(
    "<HHHH", 1, 0, 0, 1
) + struct.pack("<I4x", 6)


def _write(path, arr, layout_body, filtered=False):
    b = _Hdf5Builder()
    msgs = [
        _msg(0x0001, _dataspace(arr.shape)),
        _msg(0x0003, _datatype(arr.dtype)),
    ]
    if filtered:
        msgs.append(_msg(0x000B, _DEFLATE_MSG))
    msgs.append(_msg(0x0008, layout_body(b)))
    b.headers["T2"] = b._alloc(_object_header(msgs))
    _finalize(b, path, None)


def _got(path):
    return read_hdf5(path)["variables"]["T2"]["data"]


def test_single_chunk_unfiltered(tmp_path):
    arr = np.arange(24, dtype="<f8").reshape(4, 6)
    p = str(tmp_path / "s.h5")

    def layout(b):
        addr = b._alloc(arr.tobytes())
        return (
            _v4_prefix((4, 6, 8))
            + bytes([1])  # single chunk
            + struct.pack("<Q", addr)
        )

    _write(p, arr, layout)
    assert np.array_equal(_got(p), arr)


def test_single_chunk_filtered(tmp_path):
    arr = np.arange(24, dtype="<f8").reshape(4, 6)
    comp = zlib.compress(arr.tobytes(), 6)
    p = str(tmp_path / "sf.h5")

    def layout(b):
        addr = b._alloc(comp)
        return (
            _v4_prefix((4, 6, 8), flags=0x02)
            + bytes([1])
            + struct.pack("<QIQ", len(comp), 0, addr)
        )

    _write(p, arr, layout, filtered=True)
    assert np.array_equal(_got(p), arr)


def test_implicit_index(tmp_path):
    """(5, 7) dataset in (2, 3) chunks: 3x3 grid of FULL chunks stored
    contiguously in row-major linear order, edge chunks zero-padded."""
    arr = (np.arange(35, dtype="<i4") * 3).reshape(5, 7)
    p = str(tmp_path / "i.h5")
    chunk = (2, 3)
    grid = (3, 3)

    def layout(b):
        blob = bytearray()
        for by in range(grid[0]):
            for bx in range(grid[1]):
                block = np.zeros(chunk, arr.dtype)
                sy = slice(by * 2, min(by * 2 + 2, 5))
                sx = slice(bx * 3, min(bx * 3 + 3, 7))
                block[: sy.stop - sy.start, : sx.stop - sx.start] = (
                    arr[sy, sx]
                )
                blob += block.tobytes()
        base = b._alloc(bytes(blob))
        return (
            _v4_prefix((2, 3, 4))
            + bytes([2])  # implicit
            + struct.pack("<Q", base)
        )

    _write(p, arr, layout)
    assert np.array_equal(_got(p), arr)


def _fa_layout(b, chunk_addrs, entry_size, page_bits=10,
               client=0, sizes=None, chunk_dims=(2, 3, 4)):
    """Assemble FAHD + FADB (+ pages when nelmts > 2^page_bits) and
    return the layout-message body referencing them."""
    n = len(chunk_addrs)
    elems = bytearray()
    for i, a in enumerate(chunk_addrs):
        e = struct.pack("<Q", a)
        if client == 1:
            size_len = entry_size - 12
            e += int(sizes[i]).to_bytes(size_len, "little")
            e += struct.pack("<I", 0)
        elems += e
    page_size = 1 << page_bits
    fadb = bytearray(b"FADB" + bytes([0, client]))
    fadb += struct.pack("<Q", 0)  # header addr (not verified on read)
    if n > page_size:
        npages = -(-n // page_size)
        fadb += b"\xff" * ((npages + 7) // 8)  # page bitmap: all set
        fadb += struct.pack("<I", 0)  # data-block checksum
        off = 0
        left = n
        while left > 0:
            k = min(page_size, left)
            fadb += elems[off:off + k * entry_size]
            fadb += struct.pack("<I", 0)  # page checksum
            off += k * entry_size
            left -= k
    else:
        fadb += elems + struct.pack("<I", 0)
    dblk = b._alloc(bytes(fadb))
    fahd = (
        b"FAHD"
        + bytes([0, client, entry_size, page_bits])
        + struct.pack("<QQI", n, dblk, 0)
    )
    hdr = b._alloc(fahd)
    return (
        _v4_prefix(chunk_dims)
        + bytes([3])  # fixed array
        + bytes([page_bits])
        + struct.pack("<Q", hdr)
    )


def test_fixed_array_unfiltered(tmp_path):
    arr = (np.arange(35, dtype="<i4") + 7).reshape(5, 7)
    p = str(tmp_path / "fa.h5")

    def layout(b):
        addrs = []
        for by in range(3):
            for bx in range(3):
                block = np.zeros((2, 3), arr.dtype)
                sy = slice(by * 2, min(by * 2 + 2, 5))
                sx = slice(bx * 3, min(bx * 3 + 3, 7))
                block[: sy.stop - sy.start, : sx.stop - sx.start] = (
                    arr[sy, sx]
                )
                addrs.append(b._alloc(block.tobytes()))
        return _fa_layout(b, addrs, entry_size=8)

    _write(p, arr, layout)
    assert np.array_equal(_got(p), arr)


def test_fixed_array_filtered_with_missing_chunk(tmp_path):
    """Client-1 elements (addr + 4-byte size + mask); one chunk never
    written (UNDEF address) -> zeros."""
    arr = np.arange(24, dtype="<f8").reshape(4, 6)
    expect = arr.copy()
    expect[2:4, 3:6] = 0.0  # chunk (1,1) missing
    p = str(tmp_path / "faf.h5")

    def layout(b):
        addrs, sizes = [], []
        for by in range(2):
            for bx in range(2):
                if (by, bx) == (1, 1):
                    addrs.append(_UNDEF)
                    sizes.append(0)
                    continue
                block = arr[by * 2:by * 2 + 2, bx * 3:bx * 3 + 3]
                comp = zlib.compress(
                    np.ascontiguousarray(block).tobytes(), 6
                )
                addrs.append(b._alloc(comp))
                sizes.append(len(comp))
        return _fa_layout(
            b, addrs, entry_size=16, client=1, sizes=sizes,
            chunk_dims=(2, 3, 8),
        )

    _write(p, arr, layout, filtered=True)
    assert np.array_equal(_got(p), expect)


def test_fixed_array_paged(tmp_path):
    """page_bits=2 (4 elements/page) with 9 chunks -> 3 pages with
    per-page checksums and a page bitmap."""
    arr = (np.arange(35, dtype="<i4") * 5 + 1).reshape(5, 7)
    p = str(tmp_path / "fap.h5")

    def layout(b):
        addrs = []
        for by in range(3):
            for bx in range(3):
                block = np.zeros((2, 3), arr.dtype)
                sy = slice(by * 2, min(by * 2 + 2, 5))
                sx = slice(bx * 3, min(bx * 3 + 3, 7))
                block[: sy.stop - sy.start, : sx.stop - sx.start] = (
                    arr[sy, sx]
                )
                addrs.append(b._alloc(block.tobytes()))
        return _fa_layout(b, addrs, entry_size=8, page_bits=2)

    _write(p, arr, layout)
    assert np.array_equal(_got(p), arr)


def test_manifest_and_chunk_scan_support_v4(tmp_path, spark):
    """The kerchunk manifest + the chunk-parallel scan work on a
    v4 fixed-array file exactly as on v1-B-tree files."""
    from wrf_to_geodataframe_spark.sources.hdf5 import hdf5_chunk_manifest
    from wrf_to_geodataframe_spark.sources.netcdf import (
        read_netcdf_chunks,
    )

    ny, nx = 4, 6
    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    arr = (yy * nx + xx).astype("<f8")
    lat = (50.0 + yy * 0.25).astype("<f8")
    lon = (-3.0 + xx * 0.125).astype("<f8")
    p = str(tmp_path / "v4grid.h5")

    b = _Hdf5Builder()

    def contiguous(name, a):
        addr = b._alloc(a.tobytes())
        b.headers[name] = b._alloc(_object_header([
            _msg(0x0001, _dataspace(a.shape)),
            _msg(0x0003, _datatype(a.dtype)),
            _msg(0x0008, struct.pack("<BBQQ", 3, 1, addr, a.nbytes)),
        ]))

    contiguous("XLAT", lat)
    contiguous("XLONG", lon)
    addrs = []
    for by in range(2):
        for bx in range(2):
            block = arr[by * 2:by * 2 + 2, bx * 3:bx * 3 + 3]
            addrs.append(b._alloc(np.ascontiguousarray(block).tobytes()))
    layout = _fa_layout(b, addrs, entry_size=8, chunk_dims=(2, 3, 8))
    b.headers["T2"] = b._alloc(_object_header([
        _msg(0x0001, _dataspace(arr.shape)),
        _msg(0x0003, _datatype(arr.dtype)),
        _msg(0x0008, layout),
    ]))
    _finalize(b, p, None)

    man = hdf5_chunk_manifest(p, "T2", aux_vars=("XLAT", "XLONG"))
    assert man["chunks"] == (2, 3)
    assert len(man["entries"]) == 4
    rows = read_netcdf_chunks(spark, p, "T2", "XLAT", "XLONG").collect()
    assert len(rows) == ny * nx
    for r in rows:
        assert r["value"] == r["y_idx"] * nx + r["x_idx"]
        assert r["lat"] == 50.0 + r["y_idx"] * 0.25


def _bt2_layout(b, records, rec_type, rec_size,
                chunk_dims=(2, 3, 4)):
    """Depth-0 v2 chunk B-tree: BTHD + one BTLF leaf (the any-depth
    walker itself is exercised by the dense-link tests)."""
    leaf = bytearray(b"BTLF" + bytes([0, rec_type]))
    for r in records:
        assert len(r) == rec_size
        leaf += r
    leaf += struct.pack("<I", 0)  # checksum (not verified on read)
    leaf_addr = b._alloc(bytes(leaf))
    hdr = bytearray(b"BTHD" + bytes([0, rec_type]))
    hdr += struct.pack("<IHH", 2048, rec_size, 0)  # node size/rec/depth
    hdr += bytes([85, 40])  # split/merge percent
    hdr += struct.pack("<QHQI", leaf_addr, len(records),
                       len(records), 0)
    hdr_addr = b._alloc(bytes(hdr))
    return (
        _v4_prefix(chunk_dims)
        + bytes([5])  # v2 B-tree index
        + struct.pack("<IBB", 2048, 85, 40)
        + struct.pack("<Q", hdr_addr)
    )


def test_bt2_chunk_index_unfiltered(tmp_path):
    """Record type 10: address + 8-byte scaled offsets per rank."""
    arr = (np.arange(35, dtype="<i4") * 2 + 3).reshape(5, 7)
    p = str(tmp_path / "bt2.h5")

    def layout(b):
        recs = []
        for by in range(3):
            for bx in range(3):
                block = np.zeros((2, 3), arr.dtype)
                sy = slice(by * 2, min(by * 2 + 2, 5))
                sx = slice(bx * 3, min(bx * 3 + 3, 7))
                block[: sy.stop - sy.start, : sx.stop - sx.start] = (
                    arr[sy, sx]
                )
                a = b._alloc(block.tobytes())
                recs.append(struct.pack("<QQQ", a, by, bx))
        return _bt2_layout(b, recs, rec_type=10, rec_size=24)

    _write(p, arr, layout)
    assert np.array_equal(_got(p), arr)


def test_bt2_chunk_index_filtered(tmp_path):
    """Record type 11: address + variable-width chunk size + filter
    mask + scaled offsets."""
    arr = np.arange(24, dtype="<f8").reshape(4, 6)
    p = str(tmp_path / "bt2f.h5")

    def layout(b):
        recs = []
        for by in range(2):
            for bx in range(2):
                block = arr[by * 2:by * 2 + 2, bx * 3:bx * 3 + 3]
                comp = zlib.compress(
                    np.ascontiguousarray(block).tobytes(), 6
                )
                a = b._alloc(comp)
                recs.append(
                    struct.pack("<Q", a)
                    + len(comp).to_bytes(3, "little")  # 3-byte size
                    + struct.pack("<I", 0)
                    + struct.pack("<QQ", by, bx)
                )
        return _bt2_layout(
            b, recs, rec_type=11, rec_size=31, chunk_dims=(2, 3, 8)
        )

    _write(p, arr, layout, filtered=True)
    assert np.array_equal(_got(p), arr)
