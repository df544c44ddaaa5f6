"""Malformed-input hygiene for the DRIVER-SIDE archive probes
(operators/wrf.py: ``_first_shard`` / ``wrf_global_attrs`` /
``wrf_file_variables`` — new r15 parsers of untrusted bytes): every
truncation or byte flip of a valid shard must either raise a NAMED
ValueError or return a (possibly value-corrupted — classic/v1 HDF5
metadata carries no checksums) dict, NEVER an uncontrolled
IndexError/struct.error/KeyError escape.  Same property the
executor-side source parsers are held to in test_sources_fuzz.py.

Also pins the documented FIRST-SHARD contract: the probes read the
lexicographically first NetCDF shard only (every shard of one WRF
domain carries the same header), sidecar files are skipped, and a
variable only later shards carry is invisible to the probe."""

from __future__ import annotations

import os
import random

import numpy as np
import pytest

from wrf_to_geodataframe_spark.operators.wrf import (
    _first_shard,
    wrf_file_variables,
    wrf_global_attrs,
)

GATTRS = {
    "MAP_PROJ": 1, "TRUELAT1": 30.0, "TRUELAT2": 60.0,
    "MOAD_CEN_LAT": 40.0, "STAND_LON": -100.0,
    "CEN_LON": -100.5, "CEN_LAT": 38.5, "DX": 4000.0, "DY": 4000.0,
    "WEST-EAST_GRID_DIMENSION": 4, "SOUTH-NORTH_GRID_DIMENSION": 4,
}


def _classic_blob(tmp_path) -> bytes:
    from wrf_to_geodataframe_spark.sources.netcdf import write_netcdf

    p = str(tmp_path / "classic.nc")
    jj, ii = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
    write_netcdf(
        p, {"j": 3, "i": 3},
        {
            "T2": {"dims": ["j", "i"], "data": 288.0 + ii + jj},
            "XLAT": {"dims": ["j", "i"], "data": 38.0 + 0.25 * jj},
            "XLONG": {"dims": ["j", "i"], "data": -101.0 + 0.25 * ii},
        },
        gattrs=GATTRS,
    )
    return open(p, "rb").read()


def _hdf5_blob(tmp_path) -> bytes:
    from wrf_to_geodataframe_spark.sources.hdf5_write import write_netcdf4

    p = str(tmp_path / "nc4.nc")
    jj, ii = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
    write_netcdf4(
        p, {"j": 3, "i": 3},
        {
            "T2": {"dims": ["j", "i"], "data": 288.0 + ii + jj},
            "XLAT": {"dims": ["j", "i"], "data": 38.0 + 0.25 * jj},
        },
        attrs=GATTRS,
    )
    return open(p, "rb").read()


def _probe_both(path: str):
    """Run both probes; only ValueError may escape."""
    for probe in (wrf_global_attrs, wrf_file_variables):
        try:
            out = probe(path)
        except ValueError:
            continue
        assert isinstance(out, dict)


@pytest.mark.parametrize("maker", [_classic_blob, _hdf5_blob])
def test_probe_truncation_prefixes(tmp_path, maker):
    blob = maker(tmp_path)
    p = str(tmp_path / "cut.nc")
    # every prefix: <8 bytes or broken magic -> the no-shard error;
    # longer cuts -> named truncation error or a clean (partial-file)
    # parse once the header region is complete
    for n in range(0, len(blob), 11):
        with open(p, "wb") as f:
            f.write(blob[:n])
        _probe_both(p)


@pytest.mark.parametrize("maker", [_classic_blob, _hdf5_blob])
def test_probe_byte_flips(tmp_path, maker):
    blob = maker(tmp_path)
    rng = random.Random(0x5AFE)
    p = str(tmp_path / "flip.nc")
    # dense over the header region, sampled over the rest
    positions = list(range(8, min(len(blob), 1024))) + [
        rng.randrange(len(blob)) for _ in range(64)
    ]
    for pos in positions:
        mutated = bytearray(blob)
        mutated[pos] ^= 1 << rng.randrange(8)
        with open(p, "wb") as f:
            f.write(bytes(mutated))
        _probe_both(p)


def test_probe_path_resolution_errors(tmp_path):
    with pytest.raises(ValueError, match="no NetCDF"):
        wrf_global_attrs(str(tmp_path / "missing"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no NetCDF"):
        wrf_file_variables(str(empty))
    # a directory of only sidecars (no NetCDF magic) is the same error
    (empty / "0readme.txt").write_bytes(b"not netcdf at all")
    with pytest.raises(ValueError, match="no NetCDF"):
        wrf_global_attrs(str(empty))


def test_first_shard_contract(tmp_path):
    """The documented first-shard semantics: sidecars sorting first
    are skipped; the probe reflects the lexicographically first REAL
    shard, so a variable only later shards carry is invisible — and
    headers are taken from shard one even when later shards differ."""
    from wrf_to_geodataframe_spark.sources.netcdf import write_netcdf

    d = str(tmp_path / "arch")
    os.makedirs(d)
    jj, ii = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
    base = {
        "T2": {"dims": ["j", "i"], "data": 288.0 + ii + jj},
        "XLAT": {"dims": ["j", "i"], "data": 38.0 + 0.25 * jj},
        "XLONG": {"dims": ["j", "i"], "data": -101.0 + 0.25 * ii},
    }
    # a sidecar that sorts BEFORE every shard
    with open(os.path.join(d, "0manifest.json"), "w") as f:
        f.write("{}")
    write_netcdf(
        os.path.join(d, "wrfout_d01_000.nc"), {"j": 3, "i": 3},
        dict(base), gattrs=GATTRS,
    )
    write_netcdf(
        os.path.join(d, "wrfout_d01_001.nc"), {"j": 3, "i": 3},
        dict(base, EXTRA={"dims": ["j", "i"], "data": ii * 1.0}),
        gattrs=dict(GATTRS, TRUELAT1=45.0),
    )
    target, magic = _first_shard(d)
    assert target.endswith("wrfout_d01_000.nc") and magic[:3] == b"CDF"
    vs = wrf_file_variables(d)
    assert "T2" in vs and vs["T2"] == (3, 3)
    assert "EXTRA" not in vs  # later-shard-only variable is invisible
    assert "EXTRA" in wrf_file_variables(
        os.path.join(d, "wrfout_d01_001.nc")
    )
    # attrs likewise come from shard one
    assert wrf_global_attrs(d)["TRUELAT1"] == 30.0
