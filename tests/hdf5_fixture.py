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

    def add_vlen_contiguous(self, name: str, values, dim_refs=None):
        """Contiguous dataset of a class-9 vlen datatype: ``values`` is
        a list of python strings (vlen string, netcdf-c NC_STRING
        variables) or of 1-D numpy arrays (vlen numeric sequence).
        Each element's payload goes into one global heap collection;
        the dataset's raw bytes are the hvl_t records."""
        is_str = isinstance(values[0], str)
        objs = b""
        payloads = [
            (v.encode() if is_str else np.ascontiguousarray(v).tobytes())
            for v in values
        ]
        for i, pl in enumerate(payloads, 1):
            objs += struct.pack("<HHIQ", i, 1, 0, len(pl)) + _pad8(pl)
        gcol = self.alloc(
            b"GCOL"
            + struct.pack("<B3xQ", 1, 16 + len(objs) + 16)
            + objs
            + b"\x00" * 16
        )
        hvl = b"".join(
            struct.pack(
                "<IQI",
                (len(v) if is_str else len(v)),
                gcol,
                i + 1,
            )
            for i, v in enumerate(values)
        )
        addr = self.alloc(hvl)
        if is_str:
            base = _dt_str(1)
            dt = struct.pack("<BBBBI", 0x19, 1, 0, 0, 16) + base
        else:
            b = np.asarray(values[0]).dtype
            base = {"f": _dt_float, "i": _dt_int}[b.kind](b.itemsize)
            dt = struct.pack("<BBBBI", 0x19, 0, 0, 0, 16) + base
        msgs = [
            _msg(0x0001, _dataspace((len(values),))),
            _msg(0x0003, dt),
            _msg(0x0008, struct.pack("<BBQQ", 3, 1, addr, len(hvl))),
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

    def add_chunked_szip(
        self,
        name: str,
        arr: np.ndarray,
        chunk: tuple[int, ...],
        options_mask: int,
        pixels_per_block: int = 8,
        pixels_per_scanline: int = 16,
        dim_refs=None,
        skip_first_chunk: bool = False,
    ):
        """Chunked + szip (filter id 4), v1 B-tree chunk index —
        compressed with sources/szip.szip_encode behind the HDF5
        filter's 4-byte little-endian uncompressed-size prefix
        (H5Z_FILTER_SZIP convention).  ``skip_first_chunk`` stores the
        first chunk UNFILTERED with its B-tree filter-mask bit set —
        the optional-filter path real szip files hit on
        incompressible chunks."""
        from wrf_to_geodataframe_spark.sources.szip import szip_encode

        arr = np.ascontiguousarray(arr)
        elem = arr.dtype.itemsize
        rank = arr.ndim
        entries = []
        first = True
        for idx in np.ndindex(
            *[(s + c - 1) // c for s, c in zip(arr.shape, chunk)]
        ):
            off = tuple(i * c for i, c in zip(idx, chunk))
            block = np.zeros(chunk, arr.dtype)
            sel = tuple(
                slice(o, min(o + c, s))
                for o, c, s in zip(off, chunk, arr.shape)
            )
            trim = tuple(slice(0, s.stop - s.start) for s in sel)
            block[trim] = arr[sel]
            raw = block.tobytes()
            if skip_first_chunk and first:
                entries.append((len(raw), 1, off, self.alloc(raw)))
            else:
                comp = struct.pack("<I", len(raw)) + szip_encode(
                    raw, options_mask, elem * 8,
                    pixels_per_block, pixels_per_scanline,
                )
                entries.append((len(comp), 0, off, self.alloc(comp)))
            first = False
        ndims = rank + 1
        key_size = 8 + 8 * ndims
        node = bytearray()
        node += b"TREE" + struct.pack("<BBHQQ", 1, 0, len(entries), UNDEF, UNDEF)
        for nbytes, fmask, off, addr in entries:
            node += struct.pack("<II", nbytes, fmask)
            node += b"".join(struct.pack("<Q", o) for o in off)
            node += struct.pack("<QQ", 0, addr)
        node += struct.pack("<II", 0, 0)
        btree = self.alloc(bytes(node))
        filters = struct.pack("<BB2x4x", 1, 1)
        filters += struct.pack("<HHHH", 4, 0, 0, 4) + struct.pack(
            "<IIII",
            options_mask, elem * 8, pixels_per_block, pixels_per_scanline,
        )
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

    def finish_dense(
        self,
        path: str,
        indirect_root: bool = False,
        bt_depth1: bool = False,
        nested_indirect: bool = False,
        max_direct: int = 4096,
    ):
        """Write the file with the root group in DENSE link storage:
        one link message per variable stored as a fractal-heap managed
        object, indexed by a v2 B-tree — the layout latest-format HDF5
        uses past ~8 links.  ``indirect_root`` forces a root INDIRECT
        heap block (doubling-table path, one message per direct block);
        ``nested_indirect`` additionally packs enough blocks that rows
        past max_direct hold CHILD indirect blocks (implies
        indirect_root).  ``bt_depth1`` shrinks the B-tree node size to
        64 so the name index needs internal nodes; with enough links
        the generic builder below emits depth 2+."""
        off_size, len_size = 4, 2
        heap_id_len = 1 + off_size + len_size
        start_size, table_width = 512, 4
        indirect_root = indirect_root or nested_indirect
        msgs = []
        for name, addr in self.vars:
            nm = name.encode()
            msgs.append(
                struct.pack("<BBB", 1, 0, len(nm)) + nm + struct.pack("<Q", addr)
            )

        dblock_hdr = b"FHDB" + struct.pack("<B", 0) + struct.pack("<Q", 0)
        ids = []  # (virtual offset, length) in self.vars order

        def row_size(k: int) -> int:
            return start_size if k < 2 else start_size << (k - 1)

        if not indirect_root:
            data = bytearray()
            for m in msgs:
                ids.append((len(dblock_hdr) + off_size + len(data), len(m)))
                data += m
            block = dblock_hdr + (0).to_bytes(off_size, "little") + bytes(data)
            block += b"\x00" * (start_size - len(block))
            root_addr = self.alloc(block)
            cur_rows = 0
        else:
            # recursive doubling-table placement: one message per direct
            # block; rows whose block size exceeds max_direct hold child
            # indirect blocks (log2(S/(width*start))+1 rows each)
            queue = list(msgs)

            def blocks_under(bsize: int) -> int:
                if bsize <= max_direct:
                    return 1
                nrows = (bsize // (table_width * start_size)).bit_length()
                return sum(
                    table_width * blocks_under(row_size(k))
                    for k in range(nrows)
                )

            def build_iblock(vbase: int, nrows: int) -> int:
                entries = b""
                base = vbase
                for k in range(nrows):
                    bsize = row_size(k)
                    for j in range(table_width):
                        voff = base + j * bsize
                        if not queue:
                            entries += struct.pack("<Q", UNDEF)
                        elif bsize <= max_direct:
                            m = queue.pop(0)
                            ids.append(
                                (voff + len(dblock_hdr) + off_size, len(m))
                            )
                            blk = (
                                dblock_hdr
                                + voff.to_bytes(off_size, "little")
                                + m
                            )
                            blk += b"\x00" * (bsize - len(blk))
                            entries += struct.pack("<Q", self.alloc(blk))
                        else:
                            crows = (
                                bsize // (table_width * start_size)
                            ).bit_length()
                            entries += struct.pack(
                                "<Q", build_iblock(voff, crows)
                            )
                    base += table_width * bsize
                return self.alloc(
                    b"FHIB"
                    + struct.pack("<B", 0)
                    + struct.pack("<Q", 0)
                    + vbase.to_bytes(off_size, "little")
                    + entries
                    + struct.pack("<I", 0)  # checksum (unverified)
                )

            need, cur_rows = len(msgs), 0
            cap = 0
            while cap < need:
                cap += table_width * blocks_under(row_size(cur_rows))
                cur_rows += 1
            root_addr = build_iblock(0, cur_rows)
            assert not queue, "fixture: messages left unplaced"

        # FRHP header (142 bytes + checksum)
        frhp = bytearray()
        frhp += b"FRHP"
        frhp += struct.pack("<BHHB", 0, heap_id_len, 0, 0)  # ver,idlen,filt,flags
        frhp += struct.pack("<I", 2048)  # max managed object size
        frhp += struct.pack("<Q", 0)  # next huge id
        frhp += struct.pack("<Q", UNDEF)  # huge bt2
        frhp += struct.pack("<QQ", 0, UNDEF)  # free space, fs mgr
        frhp += struct.pack("<QQQQ", 4096, 4096, 0, len(msgs))  # managed
        frhp += struct.pack("<QQQQ", 0, 0, 0, 0)  # huge/tiny sizes+counts
        frhp += struct.pack("<H", table_width)
        frhp += struct.pack("<QQ", start_size, max_direct)
        frhp += struct.pack("<H", off_size * 8)  # max heap size (bits)
        frhp += struct.pack("<H", 1)  # starting rows in root indirect
        frhp += struct.pack("<Q", root_addr)
        frhp += struct.pack("<H", cur_rows)
        frhp += struct.pack("<I", 0)  # checksum (unverified)
        fheap_addr = self.alloc(bytes(frhp))

        # v2 B-tree name index: generic builder, depth chosen by the
        # spec's per-depth capacities (mirrors the reader's sizing)
        rec_size = 4 + heap_id_len
        recs = []
        for (voff, ln), (name, _a) in zip(ids, self.vars):
            recs.append(
                struct.pack("<I", 0)  # name hash (unused by reader)
                + bytes([0])  # managed object id, version 0
                + voff.to_bytes(off_size, "little")
                + ln.to_bytes(len_size, "little")
            )
        node_size = 64 if bt_depth1 else 512

        def enc(v: int) -> int:
            return ((max(v, 1).bit_length() - 1) // 8) + 1

        cap_d = [(node_size - 10) // rec_size]
        tot_d = [cap_d[0]]
        ptr_d = [0]
        while tot_d[-1] < len(recs):
            d = len(cap_d)
            p = 8 + enc(cap_d[d - 1]) + (enc(tot_d[d - 1]) if d >= 2 else 0)
            c = (node_size - 10 - p) // (rec_size + p)
            cap_d.append(c)
            ptr_d.append(p)
            tot_d.append(c + (c + 1) * tot_d[d - 1])
        depth = len(cap_d) - 1

        def build_bt(rs: list[bytes], d: int):
            """-> (addr, nrec in this node, total in subtree)"""
            if d == 0:
                blob = (
                    b"BTLF"
                    + struct.pack("<BB", 0, 5)
                    + b"".join(rs)
                    + struct.pack("<I", 0)
                )
                return self.alloc(blob), len(rs), len(rs)
            subtrees, seps = [], []
            rest = list(rs)
            while rest:
                subtrees.append(rest[: tot_d[d - 1]])
                rest = rest[tot_d[d - 1]:]
                if rest:
                    seps.append(rest[0])
                    rest = rest[1:]
            if len(subtrees) == len(seps):  # separator consumed the tail
                subtrees.append([])
            assert len(seps) <= cap_d[d], "fixture: internal node overflow"
            kids = [build_bt(s, d - 1) for s in subtrees]
            body = b"BTIN" + struct.pack("<BB", 0, 5) + b"".join(seps)
            n1 = enc(cap_d[d - 1])
            for a, n, t in kids:
                body += struct.pack("<Q", a) + n.to_bytes(n1, "little")
                if d >= 2:
                    body += t.to_bytes(enc(tot_d[d - 1]), "little")
            body += struct.pack("<I", 0)  # checksum
            assert len(body) <= node_size, "fixture: node overflow"
            return self.alloc(body), len(seps), len(rs)

        root_bt, root_nrec, _tot = build_bt(recs, depth)
        bthd = (
            b"BTHD"
            + struct.pack("<BB", 0, 5)
            + struct.pack("<I", node_size)
            + struct.pack("<HH", rec_size, depth)
            + struct.pack("<BB", 100, 40)  # split/merge percents
            + struct.pack("<Q", root_bt)
            + struct.pack("<H", root_nrec)
            + struct.pack("<Q", len(ids))
            + struct.pack("<I", 0)  # checksum
        )
        bt2_addr = self.alloc(bthd)

        link_info = struct.pack("<BB", 0, 0) + struct.pack(
            "<QQ", fheap_addr, bt2_addr
        )
        root = self.alloc(_objheader([_msg(0x0002, link_info)]))
        sb = bytearray()
        sb += b"\x89HDF\r\n\x1a\n"
        sb += struct.pack("<BBBxBBBxHHI", 0, 0, 0, 0, 8, 8, 4, 16, 0)
        sb += struct.pack("<QQQQ", 0, UNDEF, len(self.buf), UNDEF)
        sb += struct.pack("<QQI4x", 0, root, 0)  # root STE, no cached scratch
        sb += struct.pack("<QQ", 0, 0)
        self.buf[: len(sb)] = sb
        with open(path, "wb") as f:
            f.write(bytes(self.buf))

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
