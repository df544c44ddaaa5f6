"""CF time decoding (functions/cftime.py) and its ingest wiring
(``time_var`` on the NetCDF sources)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from wrf_to_geodataframe_spark.functions.cftime import (
    cf_times_to_datetime64,
    parse_cf_time_units,
)
from wrf_to_geodataframe_spark.sources.hdf5_write import write_netcdf4
from wrf_to_geodataframe_spark.sources.netcdf import (
    read_netcdf_dir,
    read_netcdf_grid,
)


def test_parse_units_grammar():
    for units, step, ref in [
        ("hours since 2020-01-01", 3600, "2020-01-01T00:00:00"),
        ("days since 1900-01-01 00:00:00", 86400, "1900-01-01T00:00:00"),
        ("seconds since 1970-1-2 03:04:05", 1, "1970-01-02T03:04:05"),
        ("Hours since 2020-01-01T06:30:00Z", 3600, "2020-01-01T06:30:00"),
        ("minutes since 2001-12-31 23:59:30.5", 60,
         "2001-12-31T23:59:30.500"),
    ]:
        s, base = parse_cf_time_units(units)
        assert s == step, units
        assert base == int(np.datetime64(ref, "ns").astype("int64")), units


def test_parse_units_rejects_garbage():
    for bad in ["fortnights since 2020-01-01", "hours after 2020-01-01",
                "hours since someday"]:
        with pytest.raises(ValueError):
            parse_cf_time_units(bad)


def test_decode_values_and_floats():
    t = cf_times_to_datetime64([0, 6, 12.5], "hours since 2020-03-01")
    assert t[0] == np.datetime64("2020-03-01T00:00:00")
    assert t[1] == np.datetime64("2020-03-01T06:00:00")
    assert t[2] == np.datetime64("2020-03-01T12:30:00")
    d = cf_times_to_datetime64([365], "days since 2019-01-01")
    assert d[0] == np.datetime64("2020-01-01T00:00:00")


def test_pre1678_reference_epoch_exact():
    # 'days since 0001-01-01' is a common CF epoch; the reference
    # itself is OUTSIDE the datetime64[ns] window but base+offset can
    # land inside it.  date(1970,1,1).toordinal()-date(1,1,1).toordinal()
    # == 719162 proleptic-Gregorian days.
    t = cf_times_to_datetime64([719162], "days since 0001-01-01")
    assert t[0] == np.datetime64("1970-01-01T00:00:00")
    t = cf_times_to_datetime64(
        [719162 * 24 + 6], "hours since 0001-01-01"
    )
    assert t[0] == np.datetime64("1970-01-01T06:00:00")


def test_out_of_range_offsets_raise_not_wrap():
    # numpy 1.26 silently wraps np.datetime64('1600-01-01','ns') to
    # 2184-07-20; the loud-rejection contract requires ValueError for
    # any base+offset outside 1677-09-21 .. 2262-04-11.
    with pytest.raises(ValueError, match="representable range"):
        cf_times_to_datetime64([0], "days since 1600-01-01")
    with pytest.raises(ValueError, match="representable range"):
        cf_times_to_datetime64([0], "days since 0001-01-01")
    with pytest.raises(ValueError, match="representable range"):
        cf_times_to_datetime64([200000], "days since 2000-01-01")
    with pytest.raises(ValueError, match="non-finite"):
        cf_times_to_datetime64([float("nan")], "days since 2000-01-01")


def test_model_calendars_rejected():
    with pytest.raises(ValueError):
        cf_times_to_datetime64([0], "days since 2000-01-01",
                               calendar="360_day")
    with pytest.raises(ValueError):
        cf_times_to_datetime64([0], "days since 2000-01-01",
                               calendar="noleap")


def _cf_file(path, nt=4, ny=3, nx=3):
    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    tt = np.arange(nt)
    vals = (
        tt[:, None, None] * 100 + yy * nx + xx
    ).astype("float64")
    write_netcdf4(
        path,
        {"t": nt, "y": ny, "x": nx},
        {
            "t": {"dims": ["t"], "data": tt.astype("float64") * 1.0,
                  "attrs": {"units": "hours since 2020-03-01 00:00:00",
                            "calendar": "standard"}},
            "T2": {"dims": ["t", "y", "x"], "data": vals},
            "XLAT": {"dims": ["y", "x"],
                     "data": (50.0 + yy * 0.25)},
            "XLONG": {"dims": ["y", "x"],
                      "data": (-3.0 + xx * 0.125)},
        },
    )
    return vals


def test_grid_ingest_time_column(spark, tmp_path):
    p = str(tmp_path / "cf.nc")
    vals = _cf_file(p)
    df = read_netcdf_grid(spark, p, "T2", "XLAT", "XLONG", time_var="t")
    rows = df.collect()
    assert len(rows) == 4 * 9
    import datetime

    for r in rows:
        assert r["time"] == datetime.datetime(2020, 3, 1, r["t_idx"])
        assert r["value"] == vals[r["t_idx"], r["y_idx"], r["x_idx"]]


def test_dir_ingest_time_column(spark, tmp_path):
    d = tmp_path / "arch"
    os.makedirs(d)
    _cf_file(str(d / "a.nc"))
    _cf_file(str(d / "b.nc"))
    df = read_netcdf_dir(spark, str(d), "T2", "XLAT", "XLONG",
                         time_var="t")
    assert "time" in df.columns
    assert df.count() == 2 * 4 * 9
    assert df.select("time").distinct().count() == 4


def test_wrf_times_char_array_convention(spark, tmp_path):
    """The WRF 'Times' convention: a (Time, DateStrLen) char array of
    'YYYY-MM-DD_HH:MM:SS' strings with no CF units — every real WRF
    output carries it alongside numeric XTIME; time_var='Times' must
    decode it."""
    import datetime

    nt, ny, nx = 3, 2, 3
    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    vals = (np.arange(nt)[:, None, None] * 100 + yy * nx + xx).astype(
        "float64"
    )
    times = np.array(
        [list(f"2020-03-01_{h:02d}:00:00".encode()) for h in range(nt)],
        dtype="u1",
    ).view("S1")
    from wrf_to_geodataframe_spark.sources.netcdf import (
        read_netcdf,
        read_netcdf_grid,
        write_netcdf,
    )

    p = str(tmp_path / "wrf.nc")
    write_netcdf(
        p,
        {"t": nt, "s": 19, "y": ny, "x": nx},
        {
            "Times": {"dims": ["t", "s"], "data": times},
            "T2": {"dims": ["t", "y", "x"], "data": vals},
            "XLAT": {"dims": ["y", "x"], "data": 50.0 + yy * 0.25},
            "XLONG": {"dims": ["y", "x"], "data": -3.0 + xx * 0.125},
        },
    )
    # the char variable round-trips through the classic reader
    back = read_netcdf(p)["variables"]["Times"]["data"]
    assert back.dtype == np.dtype("S1") and back.shape == (nt, 19)
    rows = read_netcdf_grid(
        spark, p, "T2", "XLAT", "XLONG", time_var="Times"
    ).collect()
    assert len(rows) == nt * ny * nx
    for r in rows:
        assert r["time"] == datetime.datetime(2020, 3, 1, r["t_idx"])
        assert r["value"] == vals[r["t_idx"], r["y_idx"], r["x_idx"]]


def test_wrf_times_malformed_is_loud(tmp_path):
    from wrf_to_geodataframe_spark.sources.netcdf import (
        _cf_time_axis,
    )

    bad = np.array([list(b"not-a-time-string!!")], dtype="u1").view("S1")
    with pytest.raises(ValueError, match="unparseable WRF time"):
        _cf_time_axis(
            {"variables": {"Times": {"data": bad, "attrs": {}}}},
            "Times",
        )
