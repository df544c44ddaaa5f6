"""NetCDF-4/HDF5 sink (SURVEY.md §2 S4; the reference's ``to_netcdf``
at delphine/regrid.py:330 writes NetCDF-4/HDF5 by default — this
module closes the read/write asymmetry flagged in VERDICT r7 item #2:
the classic writer at sources/netcdf.py covers CDF-1 only).

Pure-python/numpy writer of the exact HDF5 subset the companion reader
(sources/hdf5.py) parses, laid out the way netcdf-c's libhdf5 output
is structured so real tooling (h5py / netCDF4-python, when present)
opens the files too:

- superblock v0 (8-byte offsets/lengths, leaf/internal K = 4/16),
  v1 object headers, symbol-table root group (v1 group B-tree + local
  heap + SNOD, names sorted, empty-string low key);
- one CONTIGUOUS dataset per variable (sinks are small by design —
  the re-densified C3 result grid — so chunking/compression is the
  reader's problem, not the writer's);
- the netCDF-4 dimension-scale convention: every dimension is a 1-D
  dataset with ``CLASS = "DIMENSION_SCALE"``; a dimension with a
  coordinate variable carries its values and ``NAME = <dim>``, a pure
  dimension gets netcdf-c's placeholder ``NAME`` sentinel; data
  variables carry a ``DIMENSION_LIST`` attribute of
  vlen-of-object-reference hvl_t elements resolved through a global
  heap collection (GCOL) — the same encoding the reader resolves at
  sources/hdf5.py:261-303.

All structures used are v1 (no checksummed v2 B-trees / fractal
heaps), so a byte-exact layout is fully determined by the inputs —
writes are deterministic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_UNDEF = 0xFFFFFFFFFFFFFFFF
_PHONY = "This is a netCDF dimension but not a netCDF variable."


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(blob)) + blob


def _dataspace(
    shape: tuple[int, ...], maxshape: tuple[int, ...] | None = None
) -> bytes:
    """v1 dataspace; ``maxshape`` (unlimited = ``_UNDEF``) sets flag
    bit 0 and appends max dims — required for appendable datasets."""
    if not shape:
        return struct.pack("<BBB5x", 1, 0, 0)  # scalar
    body = struct.pack(
        "<BBB5x", 1, len(shape), 1 if maxshape is not None else 0
    ) + b"".join(struct.pack("<Q", s) for s in shape)
    if maxshape is not None:
        body += b"".join(struct.pack("<Q", m) for m in maxshape)
    return body


def _lookup3(data: bytes, init: int = 0) -> int:
    """Jenkins lookup3 ``hashlittle`` — H5_checksum_lookup3, the
    checksum on every piece of libver-latest metadata (extensible
    array blocks here).  Public algorithm (Bob Jenkins, lookup3.c,
    public domain; same function libhdf5 vendors)."""
    M = 0xFFFFFFFF

    def rot(x: int, k: int) -> int:
        return ((x << k) | (x >> (32 - k))) & M

    def mix(a: int, b: int, c: int):
        a = (a - c) & M; a ^= rot(c, 4); c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 6); a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 8); b = (b + a) & M
        a = (a - c) & M; a ^= rot(c, 16); c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 19); a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 4); b = (b + a) & M
        return a, b, c

    a = b = c = (0xDEADBEEF + len(data) + init) & M
    i, left = 0, len(data)
    while left > 12:
        a = (a + int.from_bytes(data[i:i + 4], "little")) & M
        b = (b + int.from_bytes(data[i + 4:i + 8], "little")) & M
        c = (c + int.from_bytes(data[i + 8:i + 12], "little")) & M
        a, b, c = mix(a, b, c)
        i += 12
        left -= 12
    if left == 0:
        return c  # zero-length input: no final mixing
    tail = data[i:] + b"\x00" * (12 - left)
    a = (a + int.from_bytes(tail[0:4], "little")) & M
    b = (b + int.from_bytes(tail[4:8], "little")) & M
    c = (c + int.from_bytes(tail[8:12], "little")) & M
    # final()
    c ^= b; c = (c - rot(b, 14)) & M
    a ^= c; a = (a - rot(c, 11)) & M
    b ^= a; b = (b - rot(a, 25)) & M
    c ^= b; c = (c - rot(b, 16)) & M
    a ^= c; a = (a - rot(c, 4)) & M
    b ^= a; b = (b - rot(a, 14)) & M
    c ^= b; c = (c - rot(b, 24)) & M
    return c


def _datatype(dtype: np.dtype) -> bytes:
    """v1 datatype message for a little-endian numeric numpy dtype."""
    dtype = dtype.newbyteorder("<")
    size = dtype.itemsize
    if dtype.kind == "f":
        # class 1 float, IEEE 754 little-endian bit layout
        if size == 8:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
            bits = (0x20, 0x3F, 0x00)
        elif size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
            bits = (0x20, 0x1F, 0x00)
        else:
            raise ValueError(f"unsupported float size {size}")
        return struct.pack("<BBBBI", 0x11, *bits, size) + props
    if dtype.kind in "iu":
        signed = 0x08 if dtype.kind == "i" else 0x00
        return struct.pack("<BBBBI", 0x10, signed, 0, 0, size) + struct.pack(
            "<HH", 0, size * 8
        )
    if dtype.kind == "S":
        # class 3 fixed string (null-padded ASCII) — netCDF-4's NC_CHAR
        # encoding (size-1 strings), e.g. the WRF 'Times' char arrays
        return struct.pack("<BBBBI", 0x13, 0, 0, 0, size)
    raise ValueError(f"unsupported dtype kind {dtype.kind!r}")


def _dt_string(size: int) -> bytes:
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, size)


def _attribute(name: str, value) -> bytes:
    """v1 attribute message: fixed null-terminated string, numeric
    scalar (int -> int32, float -> float64, numpy scalar -> itself),
    or 1-D numeric array values."""
    nm = name.encode() + b"\x00"
    if isinstance(value, str):
        val = value.encode() + b"\x00"
        dt = _dt_string(len(val))
        ds = _dataspace(())
        raw = val
    else:
        if isinstance(value, (int, np.integer)) and not isinstance(
            value, np.generic
        ):
            arr = np.array(value, dtype="<i4")
        elif isinstance(value, float):
            arr = np.array(value, dtype="<f8")
        else:
            arr = np.asarray(value)
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        dt = _datatype(arr.dtype)
        ds = _dataspace(arr.shape)
        raw = arr.tobytes()
    body = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
    return body + _pad8(nm) + _pad8(dt) + _pad8(ds) + raw


class _Hdf5Builder:
    def __init__(self):
        self.buf = bytearray(96)  # superblock v0 placeholder
        self.headers: dict[str, int] = {}  # dataset name -> header addr

    def _alloc(self, b: bytes) -> int:
        addr = len(self.buf)
        self.buf += b
        return addr

    def _dimension_list(self, scale_addrs: list[int]) -> bytes:
        """DIMENSION_LIST attribute message: one global heap object per
        referenced scale (holding its object-header address), values a
        rank-1 array of hvl_t (count, GCOL address, object index)."""
        objs = b""
        for i, addr in enumerate(scale_addrs, 1):
            objs += struct.pack("<HHIQ", i, 1, 0, 8) + struct.pack("<Q", addr)
        tail = 16  # free-space object (index 0)
        size = 16 + len(objs) + tail
        gcol = self._alloc(
            b"GCOL"
            + struct.pack("<B3xQ", 1, size)
            + objs
            + struct.pack("<HHIQ", 0, 0, 0, tail)
        )
        nm = b"DIMENSION_LIST\x00"
        ref = struct.pack("<BBBBI", 0x17, 0, 0, 0, 8)  # class 7 object ref
        dt = struct.pack("<BBBBI", 0x19, 0, 0, 0, 16) + ref  # class 9 vlen
        ds = _dataspace((len(scale_addrs),))
        val = b"".join(
            struct.pack("<IQI", 1, gcol, i + 1)
            for i in range(len(scale_addrs))
        )
        body = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
        return _msg(0x000C, body + _pad8(nm) + _pad8(dt) + _pad8(ds) + val)


def _chunked_messages(
    b: "_Hdf5Builder",
    arr: np.ndarray,
    chunk: tuple[int, ...] | None,
    method: str = "deflate",
) -> list[bytes]:
    """Dataspace/datatype/filter-pipeline/layout messages for a
    chunked dataset with a single level-0 v1 B-tree chunk index (edge
    chunks zero-padded per the spec).  ``method``: "deflate" =
    shuffle + deflate (netcdf-c's compressed default); "szip" = the
    H5Z_FILTER_SZIP convention (NN + LSB coding for little-endian
    samples, 4-byte LE uncompressed-size prefix per chunk) through
    the pure-python CCSDS codec (sources/szip.py)."""
    if chunk is None:
        chunk = tuple(min(s, 64) for s in arr.shape)
    if len(chunk) != arr.ndim:
        raise ValueError(f"chunk rank {len(chunk)} != data rank {arr.ndim}")
    elem = arr.dtype.itemsize
    if method == "szip":
        from wrf_to_geodataframe_spark.sources.szip import (
            SZ_LSB_OPTION_MASK,
            SZ_NN_OPTION_MASK,
            szip_encode,
        )

        bits = elem * 8
        if bits not in (8, 16, 32):
            raise ValueError(
                f"szip supports 8/16/32-bit samples, not {bits}"
            )
        mask = SZ_NN_OPTION_MASK | SZ_LSB_OPTION_MASK
        ppb = 16
        fastest = int(chunk[-1])
        ppl = max(ppb, min(fastest, 128 * ppb))
    entries = []  # (compressed size, chunk offsets, address)
    grid = [(s + c - 1) // c for s, c in zip(arr.shape, chunk)]
    for idx in np.ndindex(*grid):
        off = tuple(i * c for i, c in zip(idx, chunk))
        block = np.zeros(chunk, arr.dtype)
        sel = tuple(
            slice(o, min(o + c, s))
            for o, c, s in zip(off, chunk, arr.shape)
        )
        trim = tuple(slice(0, s.stop - s.start) for s in sel)
        block[trim] = arr[sel]
        raw = block.tobytes()
        if method == "szip":
            comp = struct.pack("<I", len(raw)) + szip_encode(
                raw, mask, bits, ppb, ppl
            )
        else:
            shuffled = (
                np.frombuffer(raw, np.uint8)
                .reshape(len(raw) // elem, elem)
                .T.tobytes()
            )
            comp = zlib.compress(shuffled, 6)
        entries.append((len(comp), off, b._alloc(comp)))
    ndims = arr.ndim + 1
    node = bytearray()
    node += b"TREE" + struct.pack(
        "<BBHQQ", 1, 0, len(entries), _UNDEF, _UNDEF
    )
    for nbytes, off, addr in entries:
        node += struct.pack("<II", nbytes, 0)
        node += b"".join(struct.pack("<Q", o) for o in off)
        node += struct.pack("<QQ", 0, addr)
    # trailing (2K+1-th) key: a FULL key — size 0, mask 0, and ndims
    # offsets strictly above every real chunk offset (chunk-aligned
    # dataset extent, element-size in the final dim), matching what
    # libhdf5 emits.  libhdf5's H5D__btree_cmp3 compares lookups
    # per-component against this right-most key; a short/zero key makes
    # every chunk except (0,..,0) report "not found" in h5py.
    node += struct.pack("<II", 0, 0)
    node += b"".join(
        struct.pack("<Q", g * c) for g, c in zip(grid, chunk)
    )
    node += struct.pack("<Q", elem)
    btree = b._alloc(bytes(node))
    if method == "szip":
        filters = struct.pack("<BB2x4x", 1, 1)
        filters += struct.pack("<HHHH", 4, 0, 1, 4) + struct.pack(
            "<IIII", mask, bits, ppb, ppl
        )
    else:
        filters = struct.pack("<BB2x4x", 1, 2)
        filters += struct.pack(
            "<HHHH", 2, 0, 0, 1
        ) + struct.pack("<I4x", elem)
        filters += struct.pack(
            "<HHHH", 1, 0, 0, 1
        ) + struct.pack("<I4x", 6)
    layout = struct.pack("<BBB", 3, 2, ndims) + struct.pack("<Q", btree)
    layout += b"".join(struct.pack("<I", c) for c in chunk)
    layout += struct.pack("<I", elem)
    return [
        _msg(0x0001, _dataspace(arr.shape)),
        _msg(0x0003, _datatype(arr.dtype)),
        _msg(0x000B, filters),
        _msg(0x0008, layout),
    ]


# libhdf5's fixed chunk-index creation parameters (H5Dearray.c)
_EA_MAX_NELMTS_BITS = 32
_EA_IDX_BLK_ELMTS = 4
_EA_SUP_BLK_MIN_DATA_PTRS = 4
_EA_DATA_BLK_MIN_ELMTS = 16
_EA_MAX_DBLK_PAGE_NELMTS_BITS = 10


def _earray_messages(
    b: "_Hdf5Builder",
    arr: np.ndarray,
    chunk: tuple[int, ...] | None,
    unlimited_axis: int,
    method: str | None = "deflate",
) -> list[bytes]:
    """Dataspace/datatype/(filter)/v4-layout messages for a chunked
    dataset behind an EXTENSIBLE ARRAY chunk index — the libver-latest
    default for one-unlimited-dimension datasets, i.e. the
    time-appendable NetCDF-4 layout the reference's entry point opens
    (wrf_voronoi.py:115, UNLIMITED ``XTIME``).  Spec III.G: EAHD
    header, EAIB index block (direct elements + direct data-block
    addresses + super-block addresses), EASB super blocks, EADB data
    blocks; libhdf5's default creation parameters; Jenkins-lookup3
    checksums on every block.  Elements are ordered with the unlimited
    dimension swizzled to the SLOWEST position.  Paged data blocks
    (beyond ~131k stored chunks at the default parameters) are
    rejected loudly — appendable sinks that large should shard files
    instead (``write_netcdf_dir``)."""
    if chunk is None:
        chunk = tuple(min(s, 64) for s in arr.shape)
    if len(chunk) != arr.ndim:
        raise ValueError(f"chunk rank {len(chunk)} != data rank {arr.ndim}")
    elem = arr.dtype.itemsize
    chunk_bytes = int(np.prod(chunk, initial=1)) * elem
    client = 0 if method is None else 1
    # variable chunk-size width per H5D__earray_crt_context
    size_len = min(8, 1 + ((chunk_bytes.bit_length() - 1) + 8) // 8)
    elmt_size = 8 if client == 0 else 8 + size_len + 4
    arr_off = (_EA_MAX_NELMTS_BITS + 7) // 8

    # encode chunks in swizzled linear order (unlimited axis slowest)
    grid = [-(-s // c) for s, c in zip(arr.shape, chunk)]
    fixed = [d for d in range(arr.ndim) if d != unlimited_axis]
    elements: list[bytes] = []
    for qu in range(grid[unlimited_axis]):
        def rec(d_i: int, coords: dict):
            if d_i == len(fixed):
                off = tuple(
                    (qu if d == unlimited_axis else coords[d]) * chunk[d]
                    for d in range(arr.ndim)
                )
                block = np.zeros(chunk, arr.dtype)
                sel = tuple(
                    slice(o, min(o + c, s))
                    for o, c, s in zip(off, chunk, arr.shape)
                )
                trim = tuple(slice(0, s.stop - s.start) for s in sel)
                block[trim] = arr[sel]
                raw = block.tobytes()
                if client == 0:
                    elements.append(
                        struct.pack("<Q", b._alloc(raw))
                    )
                else:
                    shuffled = (
                        np.frombuffer(raw, np.uint8)
                        .reshape(len(raw) // elem, elem)
                        .T.tobytes()
                    )
                    comp = zlib.compress(shuffled, 6)
                    elements.append(
                        struct.pack("<Q", b._alloc(comp))
                        + len(comp).to_bytes(size_len, "little")
                        + struct.pack("<I", 0)
                    )
                return
            for v in range(grid[fixed[d_i]]):
                rec(d_i + 1, {**coords, fixed[d_i]: v})
        rec(0, {})
    n = len(elements)

    # super-block geometry (H5EA__hdr_init)
    nsblks_total = 1 + (
        _EA_MAX_NELMTS_BITS - (_EA_DATA_BLK_MIN_ELMTS.bit_length() - 1)
    ) // 2
    geo, start = [], 0
    for s in range(nsblks_total):
        nd = 1 << (s // 2)
        ne = (1 << ((s + 1) // 2)) * _EA_DATA_BLK_MIN_ELMTS
        geo.append((nd, ne, start))
        start += nd * ne
    nsblks_direct = 2 * (_EA_SUP_BLK_MIN_DATA_PTRS.bit_length() - 1)
    ndblk_addrs = 2 * (_EA_SUP_BLK_MIN_DATA_PTRS - 1)
    nsblk_addrs = nsblks_total - nsblks_direct
    page_nelmts = 1 << _EA_MAX_DBLK_PAGE_NELMTS_BITS

    hdr_addr = b._alloc(b"\x00" * 72)  # EAHD patched in below

    def csum(body: bytearray) -> bytes:
        return bytes(body) + struct.pack("<I", _lookup3(bytes(body)))

    def dblock(base: int, nelmts: int) -> int:
        if base >= n:
            return _UNDEF
        if nelmts > page_nelmts:
            raise ValueError(
                f"{n} chunks exceed the unpaged extensible-array "
                "capacity; shard the archive (write_netcdf_dir) instead"
            )
        body = bytearray(b"EADB" + bytes([0, client]))
        body += struct.pack("<Q", hdr_addr)
        body += base.to_bytes(arr_off, "little")
        for i in range(base, base + nelmts):
            body += (
                elements[i] if i < n
                else b"\xff" * 8 + b"\x00" * (elmt_size - 8)
            )
        return b._alloc(csum(body))

    direct = []
    for s in range(nsblks_direct):
        nd, ne, st = geo[s]
        for d in range(nd):
            direct.append(dblock(_EA_IDX_BLK_ELMTS + st + d * ne, ne))
    sblk_addrs = []
    for k in range(nsblk_addrs):
        s = nsblks_direct + k
        nd, ne, st = geo[s]
        if _EA_IDX_BLK_ELMTS + st >= n:
            sblk_addrs.append(_UNDEF)
            continue
        dblks = [
            dblock(_EA_IDX_BLK_ELMTS + st + d * ne, ne)
            for d in range(nd)
        ]
        body = bytearray(b"EASB" + bytes([0, client]))
        body += struct.pack("<Q", hdr_addr)
        body += (_EA_IDX_BLK_ELMTS + st).to_bytes(arr_off, "little")
        body += b"".join(struct.pack("<Q", a) for a in dblks)
        sblk_addrs.append(b._alloc(csum(body)))
    iblk = bytearray(b"EAIB" + bytes([0, client]))
    iblk += struct.pack("<Q", hdr_addr)
    for i in range(_EA_IDX_BLK_ELMTS):
        iblk += (
            elements[i] if i < n
            else b"\xff" * 8 + b"\x00" * (elmt_size - 8)
        )
    iblk += b"".join(struct.pack("<Q", a) for a in direct)
    iblk += b"".join(struct.pack("<Q", a) for a in sblk_addrs)
    iblk_addr = b._alloc(csum(iblk))

    ndblks_alloc = sum(1 for a in direct if a != _UNDEF)
    nsb_alloc = sum(1 for a in sblk_addrs if a != _UNDEF)
    hdr = bytearray(b"EAHD" + bytes([
        0, client, elmt_size, _EA_MAX_NELMTS_BITS, _EA_IDX_BLK_ELMTS,
        _EA_DATA_BLK_MIN_ELMTS, _EA_SUP_BLK_MIN_DATA_PTRS,
        _EA_MAX_DBLK_PAGE_NELMTS_BITS,
    ]))
    hdr += struct.pack(
        "<QQQQQQ", nsb_alloc, 0, ndblks_alloc, 0, n, n
    )
    hdr += struct.pack("<Q", iblk_addr)
    hdr = csum(hdr)
    b.buf[hdr_addr:hdr_addr + 72] = hdr

    maxshape = tuple(
        _UNDEF if d == unlimited_axis else s
        for d, s in enumerate(arr.shape)
    )
    layout = struct.pack("<BBBBB", 4, 2, 0, arr.ndim + 1, 4)
    for c in chunk:
        layout += struct.pack("<I", c)
    layout += struct.pack("<I", elem)
    layout += bytes([4])  # chunk index: extensible array
    layout += bytes([
        _EA_MAX_NELMTS_BITS, _EA_IDX_BLK_ELMTS,
        _EA_SUP_BLK_MIN_DATA_PTRS, _EA_DATA_BLK_MIN_ELMTS,
        _EA_MAX_DBLK_PAGE_NELMTS_BITS,
    ])
    layout += struct.pack("<Q", hdr_addr)
    msgs = [
        _msg(0x0001, _dataspace(arr.shape, maxshape)),
        _msg(0x0003, _datatype(arr.dtype)),
    ]
    if client == 1:
        filters = struct.pack("<BB2x4x", 1, 2)
        filters += struct.pack("<HHHH", 2, 0, 0, 1) + struct.pack(
            "<I4x", elem
        )
        filters += struct.pack("<HHHH", 1, 0, 0, 1) + struct.pack(
            "<I4x", 6
        )
        msgs.append(_msg(0x000B, filters))
    msgs.append(_msg(0x0008, layout))
    return msgs


def write_netcdf4(
    path: str,
    dims: dict[str, int],
    variables: dict[str, dict],
    attrs: dict | None = None,
    compress: bool | str = False,
    chunk: tuple[int, ...] | dict[str, tuple[int, ...]] | None = None,
    unlimited: str | None = None,
) -> None:
    """Write a NetCDF-4 (HDF5) file — the same call shape as
    ``write_netcdf`` (classic).

    ``variables``: name -> {dims: [names], data: numpy array,
    attrs: optional {str: str|int|float|array}}.  A variable named
    like a dimension and 1-D over it becomes that dimension's
    coordinate scale; dimensions without one get netcdf-c's
    placeholder scale.  ``attrs`` become root-group (global)
    attributes.

    ``compress=True`` (or ``"deflate"``) stores DATA variables (never
    the small scales) chunked + shuffle + deflate behind a v1 B-tree
    chunk index — the layout netcdf-c emits for compressed files and
    the one the companion reader's chunk path decodes;
    ``compress="szip"`` uses the H5Z_FILTER_SZIP convention through
    the pure-python CCSDS codec instead (8/16/32-bit samples only).
    ``chunk`` overrides the
    default per-axis chunk shape ``min(axis, 64)`` — either one tuple
    (applied where the rank matches; others keep the default) or a
    dict of variable name -> chunk shape.

    ``unlimited`` names ONE dimension as appendable: chunked data
    variables over it get the libver-latest EXTENSIBLE ARRAY chunk
    index and an unlimited-maxdims dataspace (the time-appendable
    WRF/NetCDF-4 archive shape — reference wrf_voronoi.py:115);
    variables not over it, and the dimension scales, keep the fixed
    layouts.  Requires ``compress`` truthy (EA written here is always
    chunked)."""
    b = _Hdf5Builder()
    dim_order = list(dims)
    if unlimited is not None and unlimited not in dims:
        raise ValueError(f"unlimited dimension {unlimited!r} not in dims")

    def _chunk_for(name: str, arr: np.ndarray):
        if isinstance(chunk, dict):
            return chunk.get(name)
        if chunk is not None and len(chunk) != arr.ndim:
            return None  # rank-mismatched global override: default
        return chunk

    def _write_dataset(name: str, arr: np.ndarray, msgs_extra: list[bytes],
                       chunked: bool = False, unlim_axis: int | None = None):
        arr = np.ascontiguousarray(arr)
        arr = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
        if chunked and arr.ndim >= 1 and arr.size and unlim_axis is not None:
            if compress == "szip":
                raise ValueError(
                    "unlimited + szip is not supported; use deflate"
                )
            msgs = _earray_messages(
                b, arr, _chunk_for(name, arr), unlim_axis,
            )
        elif chunked and arr.ndim >= 1 and arr.size:
            msgs = _chunked_messages(
                b, arr, _chunk_for(name, arr),
                method="szip" if compress == "szip" else "deflate",
            )
        else:
            data_addr = b._alloc(arr.tobytes())
            msgs = [
                _msg(0x0001, _dataspace(arr.shape)),
                _msg(0x0003, _datatype(arr.dtype)),
                _msg(
                    0x0008,
                    struct.pack("<BBQQ", 3, 1, data_addr, arr.nbytes),
                ),
            ]
        msgs += msgs_extra
        b.headers[name] = b._alloc(_object_header(msgs))

    # 1) dimension scales first (DIMENSION_LIST needs their addresses)
    for i, dname in enumerate(dim_order):
        size = dims[dname]
        spec = variables.get(dname)
        is_coord = (
            spec is not None
            and list(spec["dims"]) == [dname]
            and np.asarray(spec["data"]).ndim == 1
        )
        if is_coord:
            data = np.asarray(spec["data"])
            name_attr = dname
        else:
            data = np.zeros(size, dtype="<f4")
            name_attr = f"{_PHONY} {size:10d}"
        scale_attrs = [
            _msg(0x000C, _attribute("CLASS", "DIMENSION_SCALE")),
            _msg(0x000C, _attribute("NAME", name_attr)),
            _msg(0x000C, _attribute("_Netcdf4Dimid", np.int32(i))),
        ]
        if is_coord:
            for k, v in spec.get("attrs", {}).items():
                scale_attrs.append(_msg(0x000C, _attribute(k, v)))
        _write_dataset(dname, data, scale_attrs)

    # 2) data variables, each with a DIMENSION_LIST over its scales
    for name, spec in variables.items():
        if name in b.headers:
            continue  # coordinate variable already written as a scale
        arr = np.asarray(spec["data"])
        vdims = list(spec["dims"])
        if arr.ndim != len(vdims):
            raise ValueError(f"{name}: rank {arr.ndim} != dims {vdims}")
        for d, s in zip(vdims, arr.shape):
            if d not in dims:
                raise ValueError(f"{name}: unknown dimension {d!r}")
            if dims[d] != s:
                raise ValueError(
                    f"{name}: dim {d!r} is {dims[d]}, data axis is {s}"
                )
        extra = [
            _msg(0x000C, _attribute(k, v))
            for k, v in spec.get("attrs", {}).items()
        ]
        extra.append(b._dimension_list([b.headers[d] for d in vdims]))
        _write_dataset(
            name, arr, extra, chunked=compress,
            unlim_axis=(
                vdims.index(unlimited)
                if unlimited is not None and unlimited in vdims
                else None
            ),
        )

    _finalize(b, path, attrs)


def _finalize(b: "_Hdf5Builder", path: str, attrs: dict | None) -> None:
    """Root group (local heap + SNOD + v1 group B-tree) + superblock
    v0, then write the file — shared by the sink and the hand-built
    spec-golden fixtures in tests (e.g. v4-layout files the sink
    itself never emits)."""
    names = sorted(b.headers)
    heap_data = bytearray(8)  # offset 0 = the empty string (low key)
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        heap_data += n.encode() + b"\x00"
        heap_data += b"\x00" * (-len(heap_data) % 8)
    heap_data_addr = b._alloc(bytes(heap_data))
    heap_addr = b._alloc(
        b"HEAP"
        + struct.pack("<B3xQQQ", 0, len(heap_data), _UNDEF, heap_data_addr)
    )
    snod = bytearray(b"SNOD" + struct.pack("<BxH", 1, len(names)))
    for n in names:
        snod += struct.pack("<QQI4x16x", name_off[n], b.headers[n], 0)
    snod_addr = b._alloc(bytes(snod))
    tree = b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, _UNDEF, _UNDEF)
    tree += struct.pack("<QQQ", 0, snod_addr, name_off[names[-1]])
    tree_addr = b._alloc(tree)
    root_msgs = [_msg(0x0011, struct.pack("<QQ", tree_addr, heap_addr))]
    for k, v in (attrs or {}).items():
        root_msgs.append(_msg(0x000C, _attribute(k, v)))
    root_addr = b._alloc(_object_header(root_msgs))

    sb = bytearray()
    sb += b"\x89HDF\r\n\x1a\n"
    sb += struct.pack("<BBBxBBBxHHI", 0, 0, 0, 0, 8, 8, 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, _UNDEF, len(b.buf), _UNDEF)
    sb += struct.pack("<QQI4x", 0, root_addr, 1)  # root STE, cached scratch
    sb += struct.pack("<QQ", tree_addr, heap_addr)
    b.buf[: len(sb)] = sb
    with open(path, "wb") as f:
        f.write(bytes(b.buf))
