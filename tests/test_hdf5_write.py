"""S4 NetCDF-4/HDF5 sink (``sources/hdf5_write.py``): the reference's
default ``to_netcdf`` format (delphine/regrid.py:330), closing the
read/write asymmetry of VERDICT r7 item #2.

Validation: round-trip through the repo's own from-scratch HDF5 reader
(dims, dtypes, values, attributes, dimension-scale wiring), metadata
parity with the classic NetCDF-3 writer for the same logical dataset,
the distributed directory source over a mixed NetCDF-3/NetCDF-4 dir,
and — when h5py / netCDF4-python exist in the environment — the
cross-library interop check (skipped cleanly otherwise; the codec
discipline of tests/test_hdf5.py)."""

from __future__ import annotations

import numpy as np
import pytest

from wrf_to_geodataframe_spark.sources.hdf5 import read_hdf5, read_netcdf_any
from wrf_to_geodataframe_spark.sources.hdf5_write import write_netcdf4
from wrf_to_geodataframe_spark.sources.netcdf import write_netcdf


def _dataset():
    rng = np.random.default_rng(11)
    t2 = rng.normal(280.0, 5.0, (4, 6, 5)).astype(np.float32)
    lat2d = np.linspace(50.0, 53.0, 30).reshape(6, 5)
    lon2d = np.linspace(-4.0, -1.0, 30).reshape(6, 5)
    xs = np.arange(5, dtype=np.float64) * 1000.0
    counts = rng.integers(-100, 100, (6, 5)).astype(np.int16)
    dims = {"t": 4, "y": 6, "x": 5}
    variables = {
        "T2": {
            "dims": ["t", "y", "x"],
            "data": t2,
            "attrs": {"units": "K", "scale_factor": 1.0, "valid_min": -50},
        },
        "XLAT": {"dims": ["y", "x"], "data": lat2d},
        "XLONG": {"dims": ["y", "x"], "data": lon2d},
        "x": {"dims": ["x"], "data": xs, "attrs": {"units": "m"}},
        "counts": {"dims": ["y", "x"], "data": counts},
    }
    return dims, variables


def test_round_trip_through_own_reader(tmp_path):
    dims, variables = _dataset()
    p = str(tmp_path / "out.nc")
    write_netcdf4(p, dims, variables, attrs={"title": "wrf regrid"})
    ds = read_hdf5(p)
    # dims: every declared dimension, sized correctly (y/t are "pure"
    # dimensions -> phony scales; x has a coordinate variable)
    assert ds["dims"] == dims
    # phony scales do not surface as variables; the coordinate var does
    assert set(ds["variables"]) == {"T2", "XLAT", "XLONG", "x", "counts"}
    for name, spec in variables.items():
        got = ds["variables"][name]["data"]
        np.testing.assert_array_equal(got, spec["data"])
        assert got.dtype == np.asarray(spec["data"]).dtype
    # dimension names resolved through DIMENSION_LIST object refs
    assert ds["variables"]["T2"]["dims"] == ["t", "y", "x"]
    assert ds["variables"]["counts"]["dims"] == ["y", "x"]
    assert ds["variables"]["x"]["dims"] == ["x"]
    assert ds["attrs"]["title"] == "wrf regrid"
    a = ds["variables"]["T2"]["attrs"]
    assert a["units"] == "K"
    assert float(a["scale_factor"]) == 1.0
    assert int(a["valid_min"]) == -50
    assert ds["variables"]["x"]["attrs"]["CLASS"] == "DIMENSION_SCALE"


def test_metadata_parity_with_classic_writer(tmp_path):
    """The SAME logical dataset written classic and NetCDF-4 must read
    back with identical dims / variable sets / per-variable dim names
    (the symmetric twin of test_dimension_list_names_match_netcdf3)."""
    v = np.arange(6, dtype=np.float64).reshape(2, 3)
    x_coord = np.array([10.0, 20.0, 30.0])
    dims = {"y": 2, "x": 3}
    variables = {
        "v": {"dims": ["y", "x"], "data": v},
        "x": {"dims": ["x"], "data": x_coord},
    }
    p3 = str(tmp_path / "classic.nc")
    p4 = str(tmp_path / "nc4.nc")
    write_netcdf(p3, dims, variables)
    write_netcdf4(p4, dims, variables)
    d3 = read_netcdf_any(p3)
    d4 = read_netcdf_any(p4)
    assert d3["dims"] == d4["dims"] == dims
    assert set(d3["variables"]) == set(d4["variables"])
    for n in d3["variables"]:
        assert list(d3["variables"][n]["dims"]) == list(
            d4["variables"][n]["dims"]
        )
        np.testing.assert_array_equal(
            d3["variables"][n]["data"], d4["variables"][n]["data"]
        )


def test_numeric_and_array_attributes_round_trip(tmp_path):
    p = str(tmp_path / "a.nc")
    write_netcdf4(
        p,
        dims={"x": 3},
        variables={
            "v": {
                "dims": ["x"],
                "data": np.array([1.0, 2.0, 3.0]),
                "attrs": {
                    "_FillValue": np.float64(-9999.0),
                    "valid_range": np.array([0.0, 100.0]),
                    "levels": np.array([1, 2, 3], dtype=np.int32),
                },
            }
        },
    )
    a = read_hdf5(p)["variables"]["v"]["attrs"]
    assert float(a["_FillValue"]) == -9999.0
    np.testing.assert_array_equal(a["valid_range"], [0.0, 100.0])
    np.testing.assert_array_equal(a["levels"], [1, 2, 3])


def test_rejects_mismatched_dims():
    with pytest.raises(ValueError, match="dim 'x' is 3"):
        write_netcdf4(
            "/dev/null",
            dims={"x": 3},
            variables={"v": {"dims": ["x"], "data": np.zeros(4)}},
        )


def test_distributed_dir_reads_nc4_written_files(spark, tmp_path):
    """write_netcdf4 output flows through the distributed S1 source
    alongside classic files — the full sink->archive->scan loop."""
    from wrf_to_geodataframe_spark.sources.netcdf import read_netcdf_dir

    lat = np.linspace(50.0, 51.0, 6).reshape(2, 3)
    lon = np.linspace(-1.0, 0.0, 6).reshape(2, 3)
    va = np.arange(6, dtype=np.float64).reshape(2, 3)
    vb = va * 10.0
    write_netcdf4(
        str(tmp_path / "a.nc"),
        dims={"y": 2, "x": 3},
        variables={
            "T2": {"dims": ["y", "x"], "data": va},
            "XLAT": {"dims": ["y", "x"], "data": lat},
            "XLONG": {"dims": ["y", "x"], "data": lon},
        },
    )
    write_netcdf(
        str(tmp_path / "b.nc"),
        dims={"y": 2, "x": 3},
        variables={
            "T2": {"dims": ("y", "x"), "data": vb},
            "XLAT": {"dims": ("y", "x"), "data": lat},
            "XLONG": {"dims": ("y", "x"), "data": lon},
        },
    )
    rows = read_netcdf_dir(
        spark, str(tmp_path), "T2", "XLAT", "XLONG"
    ).collect()
    assert len(rows) == 12
    for r in rows:
        src = va if r.file.endswith("a.nc") else vb
        assert r.value == src[r.y_idx, r.x_idx]


def test_interop_with_system_hdf5_libraries(tmp_path):
    """Cross-library check: h5py / netCDF4-python read our output.
    Skipped when neither library exists (this container); runs — and
    must pass — anywhere they do."""
    h5py = pytest.importorskip("h5py")
    dims, variables = _dataset()
    p = str(tmp_path / "interop.nc")
    write_netcdf4(p, dims, variables, attrs={"title": "t"})
    with h5py.File(p, "r") as f:
        assert set(f.keys()) >= {"T2", "XLAT", "XLONG", "x", "counts"}
        np.testing.assert_array_equal(f["T2"][...], variables["T2"]["data"])
        assert f.attrs["title"] in (b"t", "t")
    # the appendable (Extensible Array) layout: h5py must see the
    # unlimited maxshape and read every chunk through the EA index
    pe = str(tmp_path / "interop_ea.nc")
    write_netcdf4(
        pe, dims, variables, compress=True,
        chunk={"T2": (2, 3, 3)}, unlimited="t",
    )
    with h5py.File(pe, "r") as f:
        ds = f["T2"]
        assert ds.maxshape[0] is None  # unlimited t
        np.testing.assert_array_equal(ds[...], variables["T2"]["data"])


def test_compressed_round_trip(tmp_path):
    """compress=True: data variables store chunked+shuffle+deflate
    (v1 B-tree chunk index, zero-padded edge chunks) and read back
    bit-exact; scales stay contiguous; the file actually shrinks on
    compressible data."""
    rng = np.random.default_rng(3)
    t2 = np.repeat(
        rng.normal(280.0, 5.0, (9, 1, 11)), 13, axis=1
    ).astype(np.float32)  # repetition -> compressible
    dims = {"t": 9, "y": 13, "x": 11}
    variables = {
        "T2": {"dims": ["t", "y", "x"], "data": t2},
        "x": {"dims": ["x"], "data": np.arange(11, dtype=np.float64)},
    }
    plain = str(tmp_path / "plain.nc")
    comp = str(tmp_path / "comp.nc")
    write_netcdf4(plain, dims, variables)
    write_netcdf4(comp, dims, variables, compress=True, chunk=(4, 5, 6))
    import os

    assert os.path.getsize(comp) < os.path.getsize(plain)
    for p in (plain, comp):
        ds = read_hdf5(p)
        np.testing.assert_array_equal(ds["variables"]["T2"]["data"], t2)
        assert ds["variables"]["T2"]["dims"] == ["t", "y", "x"]
        np.testing.assert_array_equal(
            ds["variables"]["x"]["data"], np.arange(11.0)
        )
    # default chunk shape path (min(axis, 64)) also round-trips
    comp2 = str(tmp_path / "comp2.nc")
    write_netcdf4(comp2, dims, variables, compress=True)
    np.testing.assert_array_equal(
        read_hdf5(comp2)["variables"]["T2"]["data"], t2
    )


def test_chunk_btree_trailing_key_is_full(tmp_path):
    """The v1 chunk B-tree's 2K+1-th (right-most) key must be a FULL
    key — size 0, mask 0, then ndims uint64 offsets strictly above
    every chunk offset.  libhdf5's H5D__btree_cmp3 compares lookups
    per-component against it, so a short/zero trailing key makes every
    chunk except (0,..,0) unfindable in h5py even though this repo's
    own reader (which walks entries_used) never notices."""
    import struct

    p = str(tmp_path / "c.nc")
    data = np.arange(6 * 8, dtype="float64").reshape(6, 8)
    write_netcdf4(
        p, {"y": 6, "x": 8},
        {"v": {"dims": ["y", "x"], "data": data}},
        compress=True, chunk=(2, 3),
    )
    buf = open(p, "rb").read()
    pos = buf.find(b"TREE")
    assert pos >= 0
    node_type, level, entries = struct.unpack_from("<BBH", buf, pos + 4)
    assert (node_type, level) == (1, 0)
    assert entries == 3 * 3  # ceil(6/2) * ceil(8/3)
    ndims = 3  # rank 2 + element dimension
    key_sz = 4 + 4 + ndims * 8
    off = pos + 4 + 1 + 1 + 2 + 8 + 8
    seen = []
    for _ in range(entries):
        nbytes, mask = struct.unpack_from("<II", buf, off)
        offs = struct.unpack_from("<QQQ", buf, off + 8)
        assert nbytes > 0 and mask == 0 and offs[2] == 0
        seen.append(offs[:2])
        off += key_sz + 8  # key + child pointer
    tr_nbytes, tr_mask = struct.unpack_from("<II", buf, off)
    tr_offs = struct.unpack_from("<QQQ", buf, off + 8)
    assert (tr_nbytes, tr_mask) == (0, 0)
    # chunk-aligned extent: 6->6 (chunks of 2), 8->9 (chunks of 3)
    assert tr_offs == (6, 9, 8)  # last = element size (float64)
    for o in seen:  # strictly above every real chunk offset, per dim
        assert o[0] < tr_offs[0] and o[1] < tr_offs[1]
    # and the file still round-trips through the repo's reader
    back = read_hdf5(p)["variables"]["v"]["data"]
    np.testing.assert_array_equal(back, data)


def test_lookup3_known_vectors():
    """Jenkins lookup3 hashlittle self-test values from lookup3.c."""
    from wrf_to_geodataframe_spark.sources.hdf5_write import _lookup3

    assert _lookup3(b"") == 0xDEADBEEF
    assert _lookup3(b"", 0xDEADBEEF) == 0xBD5B7DDE
    assert _lookup3(b"Four score and seven years ago") == 0x17770551
    assert _lookup3(b"Four score and seven years ago", 1) == 0xCD628161


def test_earray_write_read_roundtrip(tmp_path):
    """unlimited="t" writes the time-appendable layout: EA chunk
    index + unlimited maxdims; the reader's independently-validated
    EA walker (spec-golden fixtures in test_hdf5_v4.py) reads it
    back."""
    import struct

    nt, ny, nx = 9, 4, 6
    vals = np.arange(nt * ny * nx, dtype="float64").reshape(nt, ny, nx)
    p = str(tmp_path / "ea.nc")
    write_netcdf4(
        p, {"t": nt, "y": ny, "x": nx},
        {
            "t": {"dims": ["t"], "data": np.arange(nt, dtype="float64")},
            "T2": {"dims": ["t", "y", "x"], "data": vals},
        },
        compress=True, chunk={"T2": (2, 4, 3)}, unlimited="t",
    )
    out = read_hdf5(p)
    np.testing.assert_array_equal(out["variables"]["T2"]["data"], vals)
    assert out["dims"] == {"t": nt, "y": ny, "x": nx}
    buf = open(p, "rb").read()
    # structural: EAHD present with valid lookup3 checksums everywhere
    from wrf_to_geodataframe_spark.sources.hdf5_write import _lookup3

    for sig, size in [(b"EAHD", 72)]:
        pos = buf.find(sig)
        assert pos >= 0
        body, want = buf[pos:pos + size - 4], buf[pos + size - 4:pos + size]
        assert _lookup3(body) == struct.unpack("<I", want)[0]
    for sig in (b"EAIB", b"EADB"):  # 10 chunks: no super block yet
        pos = buf.find(sig)
        assert pos >= 0, sig


def test_earray_write_spans_super_blocks(tmp_path):
    """400 chunks along t: 4 in the index block, 148 capacity across
    the direct data blocks (super blocks 0-3), the rest under EASB
    super blocks — exercises partially-filled blocks, UNDEF padding,
    and the super-block address path with the default libhdf5
    creation parameters."""
    nt = 800  # chunk (2,) -> 400 chunks
    vals = (np.arange(nt, dtype="float64") * 3 + 1).reshape(nt)
    p = str(tmp_path / "ea_big.nc")
    write_netcdf4(
        p, {"t": nt},
        {"T2": {"dims": ["t"], "data": vals}},
        compress=True, chunk={"T2": (2,)}, unlimited="t",
    )
    out = read_hdf5(p)
    np.testing.assert_array_equal(out["variables"]["T2"]["data"], vals)
    assert b"EASB" in open(p, "rb").read()


def test_earray_manifest_parity_with_btree(tmp_path):
    """hdf5_chunk_manifest over an EA-written file lists the same
    chunk offsets/sizes as the v1-B-tree file of identical content."""
    from wrf_to_geodataframe_spark.sources.hdf5 import hdf5_chunk_manifest

    nt, ny, nx = 6, 4, 6
    vals = np.arange(nt * ny * nx, dtype="float64").reshape(nt, ny, nx)
    pb = str(tmp_path / "bt.nc")
    pe = str(tmp_path / "ea.nc")
    kw = dict(compress=True, chunk={"T2": (2, 4, 3)})
    data = {
        "T2": {"dims": ["t", "y", "x"], "data": vals},
        "XLAT": {"dims": ["y", "x"],
                 "data": np.zeros((ny, nx)) + 50.0},
        "XLONG": {"dims": ["y", "x"],
                  "data": np.zeros((ny, nx)) - 3.0},
    }
    write_netcdf4(pb, {"t": nt, "y": ny, "x": nx}, data, **kw)
    write_netcdf4(pe, {"t": nt, "y": ny, "x": nx}, data, **kw,
                  unlimited="t")
    mb = hdf5_chunk_manifest(pb, "T2", aux_vars=("XLAT", "XLONG"))
    me = hdf5_chunk_manifest(pe, "T2", aux_vars=("XLAT", "XLONG"))
    assert mb["chunks"] == me["chunks"] == (2, 4, 3)
    assert mb["shape"] == me["shape"]
    kb = sorted((e[0], e[2]) for e in mb["entries"])
    ke = sorted((e[0], e[2]) for e in me["entries"])
    assert kb == ke  # same offsets, same compressed sizes


def test_char_array_dataset_round_trip(tmp_path):
    """NC_CHAR-style fixed-string (S1) datasets — the netCDF-4 form of
    WRF's 'Times' (Time, DateStrLen) variable — round-trip through the
    class-3 string datatype."""
    p = str(tmp_path / "times.nc")
    times = np.frombuffer(
        b"2020-03-01_00:00:002020-03-01_01:00:00", dtype="S1"
    ).reshape(2, 19)
    write_netcdf4(
        p, {"t": 2, "s": 19},
        {"Times": {"dims": ["t", "s"], "data": times}},
    )
    back = read_hdf5(p)["variables"]["Times"]["data"]
    assert back.dtype == np.dtype("S1")
    np.testing.assert_array_equal(back, times)
    # and the WRF time-axis decoder accepts the round-tripped array
    from wrf_to_geodataframe_spark.sources.netcdf import _cf_time_axis

    ax = _cf_time_axis(
        {"variables": {"Times": {"data": back, "attrs": {}}}}, "Times"
    )
    assert ax[1] == np.datetime64("2020-03-01T01:00:00")
