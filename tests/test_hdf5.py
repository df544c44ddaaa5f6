"""S1 NetCDF-4/HDF5 scan: spec-subset reader vs byte-level fixtures
(superblock v0, v1 headers, symbol-table group, contiguous + chunked/
shuffle/deflate layouts, v1 string attributes)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.hdf5_fixture import FixtureWriter
from wrf_to_geodataframe_spark.sources.hdf5 import (
    Hdf5Error,
    read_hdf5,
    read_netcdf_any,
)


def _rng():
    return np.random.default_rng(42)


@pytest.fixture()
def nc4_file(tmp_path):
    w = FixtureWriter()
    rng = _rng()
    t2 = rng.normal(280.0, 5.0, (13, 17)).astype(np.float32)
    xlat = np.linspace(-30.0, -10.0, 13 * 17).reshape(13, 17)
    xlong = np.linspace(-60.0, -40.0, 13 * 17).reshape(13, 17)
    counts = rng.integers(-1000, 1000, (13, 17)).astype(np.int16)
    x_axis = np.arange(17, dtype=np.float64) * 1000.0
    w.add_chunked("T2", t2, chunk=(5, 7))
    w.add_contiguous("XLAT", xlat)
    w.add_contiguous("XLONG", xlong)
    w.add_contiguous("counts", counts)
    w.add_contiguous(
        "x", x_axis,
        attrs=[("CLASS", "DIMENSION_SCALE"), ("units", "m")],
    )
    path = str(tmp_path / "wrf.nc")
    w.finish(path)
    return path, t2, xlat, xlong, counts, x_axis


def test_read_contiguous_and_chunked(nc4_file):
    path, t2, xlat, xlong, counts, x_axis = nc4_file
    ds = read_hdf5(path)
    assert set(ds["variables"]) == {"T2", "XLAT", "XLONG", "counts", "x"}
    np.testing.assert_array_equal(ds["variables"]["T2"]["data"], t2)
    np.testing.assert_array_equal(ds["variables"]["XLAT"]["data"], xlat)
    np.testing.assert_array_equal(ds["variables"]["XLONG"]["data"], xlong)
    np.testing.assert_array_equal(ds["variables"]["counts"]["data"], counts)
    np.testing.assert_array_equal(ds["variables"]["x"]["data"], x_axis)
    assert ds["variables"]["T2"]["data"].dtype == np.float32
    assert ds["variables"]["counts"]["data"].dtype == np.int16


def test_dimension_scale_and_attrs(nc4_file):
    path = nc4_file[0]
    ds = read_hdf5(path)
    assert ds["dims"] == {"x": 17}
    assert ds["variables"]["x"]["attrs"]["units"] == "m"
    assert ds["variables"]["x"]["attrs"]["CLASS"] == "DIMENSION_SCALE"


def test_edge_chunks_truncated(tmp_path):
    # 13x17 with 5x7 chunks: right/bottom edge chunks overhang and must
    # be trimmed, not wrapped
    w = FixtureWriter()
    arr = np.arange(13 * 17, dtype=np.float64).reshape(13, 17)
    w.add_chunked("v", arr, chunk=(5, 7))
    path = str(tmp_path / "edge.nc")
    w.finish(path)
    np.testing.assert_array_equal(read_hdf5(path)["variables"]["v"]["data"], arr)


def test_dispatch_by_magic(nc4_file, tmp_path):
    from wrf_to_geodataframe_spark.sources.netcdf import write_netcdf

    path = nc4_file[0]
    assert "T2" in read_netcdf_any(path)["variables"]
    nc3 = str(tmp_path / "classic.nc")
    write_netcdf(
        nc3,
        dims={"y": 2, "x": 3},
        variables={
            "v": {
                "dims": ("y", "x"),
                "data": np.arange(6, dtype=np.float32).reshape(2, 3),
            }
        },
    )
    np.testing.assert_array_equal(
        read_netcdf_any(nc3)["variables"]["v"]["data"],
        np.arange(6, dtype=np.float32).reshape(2, 3),
    )
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"not a netcdf file")
    with pytest.raises(ValueError, match="neither"):
        read_netcdf_any(str(bad))


def test_dimension_list_names_match_netcdf3(tmp_path):
    """VERDICT r4 item #4: the SAME logical dataset written as NetCDF-3
    and as NetCDF-4 (DIMENSION_LIST vlen references + a netcdf-c
    placeholder pure dimension) must read back with IDENTICAL dim-name
    metadata — dims dict, variable set, and per-variable dim names."""
    from wrf_to_geodataframe_spark.sources.netcdf import write_netcdf

    v = np.arange(6, dtype=np.float64).reshape(2, 3)
    x_coord = np.array([10.0, 20.0, 30.0])

    w = FixtureWriter()
    # "y" is a pure dimension: netcdf-c writes a placeholder scale
    w.add_contiguous(
        "y",
        np.zeros(2, dtype=np.float32),
        attrs=[
            ("CLASS", "DIMENSION_SCALE"),
            ("NAME", "This is a netCDF dimension but not a netCDF variable."
                     "         2"),
        ],
    )
    # "x" is a real coordinate variable (its own dimension scale)
    w.add_contiguous(
        "x", x_coord, attrs=[("CLASS", "DIMENSION_SCALE"), ("NAME", "x")]
    )
    w.add_chunked("v", v, chunk=(2, 2), dim_refs=["y", "x"])
    nc4 = str(tmp_path / "twin4.nc")
    w.finish(nc4)

    nc3 = str(tmp_path / "twin3.nc")
    write_netcdf(
        nc3,
        dims={"y": 2, "x": 3},
        variables={
            "x": {"dims": ("x",), "data": x_coord},
            "v": {"dims": ("y", "x"), "data": v},
        },
    )

    d4, d3 = read_netcdf_any(nc4), read_netcdf_any(nc3)
    assert d4["dims"] == d3["dims"] == {"y": 2, "x": 3}
    assert set(d4["variables"]) == set(d3["variables"]) == {"v", "x"}
    for name in ("v", "x"):
        assert list(d4["variables"][name]["dims"]) == list(
            d3["variables"][name]["dims"]
        )
        np.testing.assert_array_equal(
            d4["variables"][name]["data"], d3["variables"][name]["data"]
        )
    assert list(d4["variables"]["v"]["dims"]) == ["y", "x"]


def test_vlen_string_attribute_read_through_global_heap(tmp_path):
    """netcdf-c NC_STRING attributes (title/history) are vlen strings —
    hvl_t into a global heap; the reader must surface the text, not
    skip the attribute."""
    w = FixtureWriter()
    w.add_contiguous(
        "v",
        np.arange(4, dtype=np.float64),
        attrs=[("units", "K")],
        vlen_attrs=[("title", "WRF surface temperature, test slice")],
    )
    path = str(tmp_path / "vl.nc")
    w.finish(path)
    attrs = read_hdf5(path)["variables"]["v"]["attrs"]
    assert attrs["units"] == "K"
    assert attrs["title"] == "WRF surface temperature, test slice"


def test_dimension_list_on_contiguous_dataset(tmp_path):
    w = FixtureWriter()
    w.add_contiguous(
        "t", np.arange(4, dtype=np.float64), attrs=[("CLASS", "DIMENSION_SCALE")]
    )
    w.add_contiguous("temp", np.arange(4, dtype=np.float32), dim_refs=["t"])
    path = str(tmp_path / "c.nc")
    w.finish(path)
    ds = read_hdf5(path)
    assert ds["variables"]["temp"]["dims"] == ["t"]
    assert ds["variables"]["t"]["dims"] == ["t"]  # scale spans itself
    assert ds["dims"] == {"t": 4}


@pytest.mark.parametrize("ver", [1, 3])
def test_compound_attribute_reads_as_struct_dict(tmp_path, ver):
    """Class-6 compound attributes (netcdf-c compound types) surface as
    struct-like dicts whose values match the NetCDF-3 flattened form —
    i.e. exactly what separate scalar attributes scale/offset/label
    would carry in a classic file.  Both the v1 (padded) and v3
    (packed) member encodings are exercised."""
    cal = np.dtype([("scale", "<f8"), ("offset", "<i4"), ("label", "S6")])
    w = FixtureWriter()
    w.add_contiguous(
        "T",
        np.arange(6.0).reshape(2, 3),
        compound_attrs=[
            ("calibration", cal, {"scale": 2.5, "offset": 7, "label": b"kelvin"}, ver)
        ],
    )
    path = str(tmp_path / f"compound_v{ver}.nc")
    w.finish(path)
    ds = read_hdf5(path)
    # NetCDF-3 flattened parity: same values a classic file's plain
    # scale/offset/label attributes would hold
    assert ds["variables"]["T"]["attrs"]["calibration"] == {
        "scale": 2.5,
        "offset": 7,
        "label": "kelvin",
    }


def test_compound_attribute_array_and_reference_list(tmp_path):
    """Rank-1 compound attribute -> list of dicts; the REFERENCE_LIST
    shape netcdf-c writes on every dimension scale (object reference +
    u32 index) parses as plain ints instead of being skipped."""
    reflist = np.dtype([("dataset", "<u8"), ("index", "<u4")])
    w = FixtureWriter()
    w.add_contiguous(
        "x",
        np.arange(4.0),
        attrs=[("CLASS", "DIMENSION_SCALE")],
        compound_attrs=[
            (
                "REFERENCE_LIST",
                reflist,
                [
                    {"dataset": 0x1234, "index": 0},
                    {"dataset": 0x5678, "index": 2},
                ],
                3,
            )
        ],
    )
    path = str(tmp_path / "reflist.nc")
    w.finish(path)
    ds = read_hdf5(path)
    assert ds["variables"]["x"]["attrs"]["REFERENCE_LIST"] == [
        {"dataset": 0x1234, "index": 0},
        {"dataset": 0x5678, "index": 2},
    ]


def test_compound_dataset_reads_as_structured_array(tmp_path):
    arr = np.array(
        [(1.5, 10), (2.5, 20), (3.5, 30)],
        dtype=np.dtype([("val", "<f8"), ("n", "<i4")]),
    )
    w = FixtureWriter()
    w.add_contiguous("obs", arr)
    path = str(tmp_path / "cdata.nc")
    w.finish(path)
    got = read_hdf5(path)["variables"]["obs"]["data"]
    np.testing.assert_array_equal(got["val"], arr["val"])
    np.testing.assert_array_equal(got["n"], arr["n"])


def test_malformed_vlen_attribute_degrades_to_none(tmp_path):
    """ADVICE r5: a DIMENSION_LIST/NC_STRING attribute pointing at a
    corrupt global heap must skip THAT attribute (value None is fine),
    not abort the whole read."""
    w = FixtureWriter()
    w.add_contiguous("good", np.arange(3.0))
    # hand-build a vlen-string attribute whose hvl_t points at an
    # address that is not a GCOL
    import struct as _s

    from tests.hdf5_fixture import _msg, _pad8

    nm = b"broken\x00"
    base = _s.pack("<BBBBI", 0x13, 0, 0, 0, 1)
    dt = _s.pack("<BBBBI", 0x19, 1, 0, 0, 16) + base
    dsp = _s.pack("<BBB5x", 1, 0, 0)
    val = _s.pack("<IQI", 4, 48, 1)  # address 48 = superblock, not GCOL
    body = _s.pack("<BxHHH", 1, len(nm), len(dt), len(dsp))
    attr = _msg(0x000C, body + _pad8(nm) + _pad8(dt) + _pad8(dsp) + val)
    from tests.hdf5_fixture import _dataspace, _dt_float, _objheader

    arr = np.arange(2.0)
    addr = w.alloc(arr.tobytes())
    msgs = [
        _msg(0x0001, _dataspace(arr.shape)),
        _msg(0x0003, _dt_float(8)),
        _msg(0x0008, _s.pack("<BBQQ", 3, 1, addr, arr.nbytes)),
        attr,
    ]
    w.vars.append(("v", w.alloc(_objheader(msgs))))
    path = str(tmp_path / "badvlen.nc")
    w.finish(path)
    ds = read_hdf5(path)
    assert set(ds["variables"]) == {"good", "v"}
    np.testing.assert_array_equal(ds["variables"]["v"]["data"], arr)
    assert ds["variables"]["v"]["attrs"].get("broken") is None


def test_not_hdf5_raises(tmp_path):
    p = tmp_path / "x.h5"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(Hdf5Error, match="signature"):
        read_hdf5(str(p))


def test_grid_ingest_from_hdf5(spark, nc4_file):
    """The S1 ingest contract over an HDF5-backed file: long table with
    explicit (y_idx, x_idx) keys — same shape the NetCDF-3 path emits."""
    from wrf_to_geodataframe_spark.sources.netcdf import read_netcdf_grid

    path, t2, xlat, xlong, _counts, _x = nc4_file
    df = read_netcdf_grid(spark, path, "T2", "XLAT", "XLONG")
    rows = df.orderBy("y_idx", "x_idx").collect()
    assert len(rows) == 13 * 17
    r0 = rows[0]
    assert r0.y_idx == 0 and r0.x_idx == 0
    assert abs(r0.value - float(t2[0, 0])) < 1e-6
    assert abs(r0.lat - xlat[0, 0]) < 1e-12
    last = rows[-1]
    assert last.y_idx == 12 and last.x_idx == 16
    assert abs(last.value - float(t2[12, 16])) < 1e-6


@pytest.mark.parametrize(
    "indirect,depth1", [(False, False), (True, False), (False, True)]
)
def test_dense_link_storage_reads_like_symbol_table(tmp_path, indirect, depth1):
    """DENSE group storage (fractal heap + depth-0 v2 B-tree name
    index — what latest-format HDF5 writes past ~8 links): a 10-var
    root group must read identically to the symbol-table layout —
    for a direct root heap block, a root indirect block whose rows
    are direct blocks, and a depth-1 B-tree (internal root over
    multiple leaves)."""
    rng = np.random.default_rng(7)
    arrays = {
        f"var{i:02d}": rng.normal(0.0, 1.0, (3, 4)) for i in range(10)
    }
    dense = FixtureWriter()
    classic = FixtureWriter()
    for name, arr in arrays.items():
        dense.add_contiguous(name, arr, attrs=[("units", "K")])
        classic.add_contiguous(name, arr, attrs=[("units", "K")])
    pd_path = str(tmp_path / f"dense_{indirect}_{depth1}.nc")
    pc_path = str(tmp_path / "classic.nc")
    dense.finish_dense(pd_path, indirect_root=indirect, bt_depth1=depth1)
    classic.finish(pc_path)
    got = read_hdf5(pd_path)
    want = read_hdf5(pc_path)
    assert set(got["variables"]) == set(want["variables"]) == set(arrays)
    for name in arrays:
        np.testing.assert_array_equal(
            got["variables"][name]["data"], want["variables"][name]["data"]
        )
        assert got["variables"][name]["attrs"] == {"units": "K"}


def test_vlen_string_dataset_reads_as_python_strings(tmp_path):
    """netcdf-c NC_STRING variables are class-9 vlen-string DATASETS:
    each element is an hvl_t resolved through the global heap.  The
    dataset surfaces as an object ndarray of python str, with
    DIMENSION_LIST names resolved like any other variable."""
    w = FixtureWriter()
    names = ["station one", "st2", "", "a much longer station name here"]
    w.add_contiguous(
        "t", np.arange(4, dtype=np.float64),
        attrs=[("CLASS", "DIMENSION_SCALE")],
    )
    w.add_vlen_contiguous("station", names, dim_refs=["t"])
    path = str(tmp_path / "vlen.nc")
    w.finish(path)
    ds = read_hdf5(path)
    got = ds["variables"]["station"]
    assert got["dims"] == ["t"]
    assert got["data"].dtype == object
    assert list(got["data"]) == names


def test_vlen_numeric_sequence_dataset(tmp_path):
    """Class-9 vlen over a numeric base (ragged sequences): each
    element resolves to its own numpy array."""
    w = FixtureWriter()
    seqs = [
        np.array([1.5, 2.5], np.float64),
        np.array([], np.float64),
        np.array([7.0, 8.0, 9.0, 10.0], np.float64),
    ]
    w.add_vlen_contiguous("ragged", seqs)
    path = str(tmp_path / "ragged.nc")
    w.finish(path)
    ds = read_hdf5(path)
    got = ds["variables"]["ragged"]["data"]
    assert got.dtype == object
    assert len(got) == 3
    for g, s in zip(got, seqs):
        np.testing.assert_array_equal(g, s)


def test_dense_nested_indirect_heap_and_deep_btree(tmp_path):
    """Past the direct rows of the doubling table, fractal-heap rows
    hold CHILD indirect blocks; with a 64-byte B-tree node and 40
    links the name index needs depth >= 2 (internal-over-internal,
    whose child pointers carry the extra total-record field).  Both
    paths must read identically to the symbol-table layout."""
    rng = np.random.default_rng(11)
    arrays = {
        f"nst{i:03d}": rng.normal(0.0, 1.0, (2, 3)) for i in range(40)
    }
    dense = FixtureWriter()
    classic = FixtureWriter()
    for name, arr in arrays.items():
        dense.add_contiguous(name, arr)
        classic.add_contiguous(name, arr)
    pd_path = str(tmp_path / "nested.nc")
    pc_path = str(tmp_path / "classic.nc")
    # max_direct == start_size<<4 puts row 5+ into nested indirect
    # blocks; 40 one-message blocks spill well past row 5
    dense.finish_dense(pd_path, nested_indirect=True, bt_depth1=True)
    classic.finish(pc_path)
    raw = open(pd_path, "rb").read()
    i = raw.index(b"BTHD")
    depth = int.from_bytes(raw[i + 12:i + 14], "little")
    assert depth >= 2, depth  # the fixture must genuinely go deep
    assert raw.count(b"FHIB") >= 2  # root + nested child indirect
    got = read_hdf5(pd_path)
    want = read_hdf5(pc_path)
    assert set(got["variables"]) == set(want["variables"]) == set(arrays)
    for name in arrays:
        np.testing.assert_array_equal(
            got["variables"][name]["data"], want["variables"][name]["data"]
        )
