"""Deterministic byte-level HDF5 fixture writer (test scaffolding for
``sources/hdf5.py`` — no h5py in this container, so the reader is
validated against files assembled directly from the HDF5 file-format
spec: superblock v0, v1 object headers, symbol-table group, contiguous
and chunked+shuffle+deflate datasets, v1 attributes)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _dataspace(shape: tuple[int, ...]) -> bytes:
    return struct.pack("<BBB5x", 1, len(shape), 0) + b"".join(
        struct.pack("<Q", s) for s in shape
    )


def _dt_float(size: int) -> bytes:
    # class 1 (float), v1, little-endian; proper IEEE property fields
    if size == 8:
        props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        bits = (0x20, 0x3F, 0x00)
    else:
        props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        bits = (0x20, 0x1F, 0x00)
    return struct.pack("<BBBBI", 0x11, *bits, size) + props


def _dt_int(size: int, signed: bool = True) -> bytes:
    return struct.pack(
        "<BBBBI", 0x10, 0x08 if signed else 0x00, 0, 0, size
    ) + struct.pack("<HH", 0, size * 8)


def _dt_str(size: int) -> bytes:
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, size)


def _attr_str(name: str, value: str) -> bytes:
    nm = name.encode() + b"\x00"
    val = value.encode() + b"\x00"
    dt = _dt_str(len(val))
    ds = struct.pack("<BBB5x", 1, 0, 0)  # scalar
    body = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
    return body + _pad8(nm) + _pad8(dt) + _pad8(ds) + val


def _dt_compound(dtype: np.dtype, ver: int = 3) -> bytes:
    """Class-6 compound datatype message for a numpy structured dtype,
    in the v1 (padded names + array fields) or v3 (packed names +
    minimal offsets) member encoding."""
    def member_dt(fmt: np.dtype) -> bytes:
        if fmt.kind == "f":
            return _dt_float(fmt.itemsize)
        if fmt.kind in "iu":
            return _dt_int(fmt.itemsize, fmt.kind == "i")
        if fmt.kind == "S":
            return _dt_str(fmt.itemsize)
        raise ValueError(f"unsupported member kind {fmt.kind}")

    size = dtype.itemsize
    out = b""
    for nm in dtype.names:
        fmt, off = dtype.fields[nm][0], dtype.fields[nm][1]
        if ver == 3:
            out += nm.encode() + b"\x00"
            nb = ((max(size, 1).bit_length() - 1) // 8) + 1
            out += off.to_bytes(nb, "little")
        else:  # v1: padded name, offset, dimensionality block
            out += _pad8(nm.encode() + b"\x00")
            out += struct.pack("<I", off) + bytes(28)
        out += member_dt(fmt)
    n = len(dtype.names)
    return struct.pack("<BBBBI", 0x06 | (ver << 4), n & 0xFF, n >> 8, 0, size) + out


def _attr_compound(name: str, dtype: np.dtype, values, ver: int = 3) -> bytes:
    """v1 attribute message holding a scalar (dict) or rank-1 array
    (list of dicts) of the given compound type."""
    nm = name.encode() + b"\x00"
    dt = _dt_compound(dtype, ver)
    if isinstance(values, dict):
        ds = struct.pack("<BBB5x", 1, 0, 0)  # scalar
        arr = np.array(tuple(values[k] for k in dtype.names), dtype=dtype)
    else:
        ds = _dataspace((len(values),))
        arr = np.array(
            [tuple(v[k] for k in dtype.names) for v in values], dtype=dtype
        )
    body = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
    return body + _pad8(nm) + _pad8(dt) + _pad8(ds) + arr.tobytes()


def _attr_dimension_list(gcol_addr: int, n: int) -> bytes:
    """netCDF-4 DIMENSION_LIST: rank-1 array of vlen-of-object-reference
    (hvl_t = u32 count + u64 GCOL address + u32 heap object index, one
    heap object per dimension holding its scale's header address)."""
    nm = b"DIMENSION_LIST\x00"
    ref = struct.pack("<BBBBI", 0x17, 0, 0, 0, 8)  # class 7 object ref
    dt = struct.pack("<BBBBI", 0x19, 0, 0, 0, 16) + ref  # class 9 vlen
    ds = _dataspace((n,))
    val = b"".join(struct.pack("<IQI", 1, gcol_addr, i + 1) for i in range(n))
    body = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
    return body + _pad8(nm) + _pad8(dt) + _pad8(ds) + val


def _objheader(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(blob)) + blob


class FixtureWriter:
    def __init__(self):
        self.buf = bytearray(b"\x00" * 96)  # superblock placeholder
        self.vars: list[tuple[str, int]] = []  # (name, objhdr addr)

    def alloc(self, b: bytes) -> int:
        addr = len(self.buf)
        self.buf += b
        return addr

    def _dim_list_msg(self, dim_names: list[str]) -> bytes:
        """Allocate a global heap collection holding the referenced
        dimension scales' header addresses; return the DIMENSION_LIST
        attribute message.  The scales must already be added."""
        addr_by_name = dict(self.vars)
        addrs = [addr_by_name[d] for d in dim_names]
        objs = b""
        for i, a in enumerate(addrs, 1):
            objs += struct.pack("<HHIQ", i, 1, 0, 8) + struct.pack("<Q", a)
        objs += b"\x00" * 16  # index-0 terminator
        gcol = self.alloc(
            b"GCOL" + struct.pack("<B3xQ", 1, 16 + len(objs)) + objs
        )
        return _msg(0x000C, _attr_dimension_list(gcol, len(addrs)))

    def _vlen_str_attr_msg(self, name: str, value: str) -> bytes:
        """Scalar vlen-string attribute (netcdf-c NC_STRING layout):
        class-9 vlen (type=string) over a 1-byte class-3 base, value an
        hvl_t into a dedicated global heap collection."""
        data = value.encode()
        objs = struct.pack("<HHIQ", 1, 1, 0, len(data)) + _pad8(data)
        gcol = self.alloc(
            b"GCOL"
            + struct.pack("<B3xQ", 1, 16 + len(objs) + 16)
            + objs
            + b"\x00" * 16
        )
        nm = name.encode() + b"\x00"
        base = struct.pack("<BBBBI", 0x13, 0, 0, 0, 1)
        dt = struct.pack("<BBBBI", 0x19, 1, 0, 0, 16) + base
        ds = struct.pack("<BBB5x", 1, 0, 0)  # scalar
        val = struct.pack("<IQI", len(data), gcol, 1)
        body = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
        return _msg(0x000C, body + _pad8(nm) + _pad8(dt) + _pad8(ds) + val)

    def add_contiguous(
        self, name: str, arr: np.ndarray, attrs=(), dim_refs=None,
        vlen_attrs=(), compound_attrs=()
    ):
        arr = np.ascontiguousarray(arr)
        addr = self.alloc(arr.tobytes())
        if arr.dtype.names:  # compound dataset
            dt = _dt_compound(arr.dtype)
        else:
            dt = {"f": _dt_float, "i": _dt_int}[arr.dtype.kind](
                arr.dtype.itemsize
            )
        msgs = [
            _msg(0x0001, _dataspace(arr.shape)),
            _msg(0x0003, dt),
            _msg(
                0x0008,
                struct.pack("<BBQQ", 3, 1, addr, arr.nbytes),
            ),
        ]
        msgs += [_msg(0x000C, _attr_str(k, v)) for k, v in attrs]
        msgs += [self._vlen_str_attr_msg(k, v) for k, v in vlen_attrs]
        msgs += [
            _msg(0x000C, _attr_compound(k, dt_, v, ver))
            for k, dt_, v, ver in compound_attrs
        ]
        if dim_refs:
            msgs.append(self._dim_list_msg(dim_refs))
        self.vars.append((name, self.alloc(_objheader(msgs))))

    def add_chunked(
        self, name: str, arr: np.ndarray, chunk: tuple[int, ...], dim_refs=None
    ):
        """Chunked + shuffle + deflate, v1 B-tree chunk index."""
        arr = np.ascontiguousarray(arr)
        elem = arr.dtype.itemsize
        rank = arr.ndim
        entries = []  # (nbytes, offsets, addr)
        for idx in np.ndindex(
            *[(s + c - 1) // c for s, c in zip(arr.shape, chunk)]
        ):
            off = tuple(i * c for i, c in zip(idx, chunk))
            block = np.zeros(chunk, arr.dtype)
            sel = tuple(
                slice(o, min(o + c, s)) for o, c, s in zip(off, chunk, arr.shape)
            )
            trim = tuple(slice(0, s.stop - s.start) for s in sel)
            block[trim] = arr[sel]
            raw = block.tobytes()
            n = len(raw) // elem
            shuffled = (
                np.frombuffer(raw, np.uint8)
                .reshape(n, elem)
                .T.tobytes()
            )
            comp = zlib.compress(shuffled, 6)
            entries.append((len(comp), off, self.alloc(comp)))
        # chunk B-tree: one level-0 node
        ndims = rank + 1
        key_size = 8 + 8 * ndims
        node = bytearray()
        node += b"TREE" + struct.pack("<BBHQQ", 1, 0, len(entries), UNDEF, UNDEF)
        for nbytes, off, addr in entries:
            node += struct.pack("<II", nbytes, 0)
            node += b"".join(struct.pack("<Q", o) for o in off)
            node += struct.pack("<QQ", 0, addr)
        node += struct.pack("<II", 0, 0)  # trailing key (truncated ok)
        btree = self.alloc(bytes(node))
        filters = struct.pack("<BB2x4x", 1, 2)
        filters += struct.pack("<HHHH", 2, 0, 0, 1) + struct.pack("<I4x", elem)
        filters += struct.pack("<HHHH", 1, 0, 0, 1) + struct.pack("<I4x", 6)
        layout = struct.pack("<BBB", 3, 2, ndims) + struct.pack("<Q", btree)
        layout += b"".join(struct.pack("<I", c) for c in chunk)
        layout += struct.pack("<I", elem)
        dt = {"f": _dt_float, "i": _dt_int}[arr.dtype.kind](elem)
        msgs = [
            _msg(0x0001, _dataspace(arr.shape)),
            _msg(0x0003, dt),
            _msg(0x000B, filters),
            _msg(0x0008, layout),
        ]
        if dim_refs:
            msgs.append(self._dim_list_msg(dim_refs))
        self.vars.append((name, self.alloc(_objheader(msgs))))

    def finish(self, path: str):
        # local heap: names from offset 8
        names = sorted(n for n, _ in self.vars)
        heap_data = bytearray(8)
        offsets = {}
        for n in names:
            offsets[n] = len(heap_data)
            heap_data += n.encode() + b"\x00"
            heap_data += b"\x00" * (-len(heap_data) % 8)
        data_addr = self.alloc(bytes(heap_data))
        heap_hdr = self.alloc(
            b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF, data_addr)
        )
        snod = bytearray(b"SNOD" + struct.pack("<BxH", 1, len(self.vars)))
        addr_by_name = dict(self.vars)
        for n in names:
            snod += struct.pack("<QQI4x16x", offsets[n], addr_by_name[n], 0)
        snod_addr = self.alloc(bytes(snod))
        tree = b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
        tree += struct.pack("<QQQ", offsets[names[0]], snod_addr, offsets[names[-1]])
        tree_addr = self.alloc(tree)
        root = self.alloc(
            _objheader([_msg(0x0011, struct.pack("<QQ", tree_addr, heap_hdr))])
        )
        sb = bytearray()
        sb += b"\x89HDF\r\n\x1a\n"
        sb += struct.pack("<BBBxBBBxHHI", 0, 0, 0, 0, 8, 8, 4, 16, 0)
        sb += struct.pack("<QQQQ", 0, UNDEF, len(self.buf), UNDEF)
        sb += struct.pack("<QQI4x", 0, root, 1)  # root STE, cached scratch:
        sb += struct.pack("<QQ", tree_addr, heap_hdr)
        self.buf[: len(sb)] = sb
        with open(path, "wb") as f:
            f.write(bytes(self.buf))
