"""REAL-WORLD interop: the reference repository publishes its own
OUTPUT artifacts (wrf_voronoi_brasil{,_Tm}/ — the Brasil WRF domain's
tessellated cell tables as shapefile sidecars: .dbf attributes, .shx
index, .prj CRS; the .shp geometry file itself is not in the repo).
The engine's from-scratch dBase/ESRI parsers must read the
reference's actual files, not just their own round-trips — the same
two-direction discipline as the codec interop suite.

Read-only use of PUBLIC reference data as test input; skipped when
the reference checkout is absent."""

from __future__ import annotations

import os
import struct

import pytest

REF = "/root/reference"
BR = os.path.join(REF, "wrf_voronoi_brasil", "wrf_voronoi_brasil")
TM = os.path.join(REF, "wrf_voronoi_brasil_Tm", "wrf_voronoi_brasil_Tm")

pytestmark = pytest.mark.skipif(
    not os.path.exists(BR + ".dbf"),
    reason="reference checkout with brasil artifacts not present",
)


def test_reference_brasil_dbf_parses_completely():
    """Both published attribute tables parse record-complete: the
    Brasil domain is the full 187 x 178 mass grid, 1-BASED indices
    (the NCL/Fortran convention the reference's tooling emitted), and
    the Tm table carries the coordinate + T2 columns wrf_voronoi.py
    joins onto the cells."""
    from wrf_to_geodataframe_spark.sources.shapefile import read_dbf

    cells = read_dbf(BR + ".dbf")
    tm = read_dbf(TM + ".dbf")
    assert len(cells) == len(tm) == 187 * 178 == 33286
    assert list(cells[0].keys()) == ["west_east", "south_nort"]
    assert list(tm[0].keys()) == [
        "west_east", "south_nort", "XLONG", "XLAT", "T2",
    ]  # dBase truncates field names at 10 chars: south_north -> south_nort
    we = {r["west_east"] for r in cells}
    sn = {r["south_nort"] for r in cells}
    assert (min(we), max(we)) == (1, 187)
    assert (min(sn), max(sn)) == (1, 178)
    # the key sets agree across the two artifacts, and each is the
    # complete cross product (no missing cells)
    keys = {(r["west_east"], r["south_nort"]) for r in cells}
    assert keys == {(r["west_east"], r["south_nort"]) for r in tm}
    assert len(keys) == 33286


def test_reference_brasil_tm_values_physical():
    """The decoded doubles are the real Brasil-domain values:
    coordinates inside the domain's lon/lat box, T2 in a physical
    surface-temperature band, and the first record pinned to the
    file's actual bytes (a golden against OUR OWN parser drifting)."""
    from wrf_to_geodataframe_spark.sources.shapefile import read_dbf

    tm = read_dbf(TM + ".dbf")
    for r in tm:
        assert -56.0 < r["XLONG"] < -38.0
        assert -31.0 < r["XLAT"] < -17.0
        assert 270.0 < r["T2"] < 315.0
    r0 = tm[0]
    assert (r0["west_east"], r0["south_nort"]) == (1, 1)
    assert abs(r0["XLONG"] - -47.44204330444336) < 1e-12
    assert abs(r0["XLAT"] - -24.44512176513672) < 1e-12
    assert abs(r0["T2"] - 294.47137451171875) < 1e-12


def test_reference_brasil_shx_and_prj_sidecars():
    """The .shx index is exactly header + 8 bytes per record for the
    dbf's record count (the ESRI spec the engine's writer follows),
    its header declares polygon type 5, and the .prj is the WGS84
    geographic CRS — the same CRS family the engine's 4326 sidecar
    writer emits."""
    n = 33286
    size = os.path.getsize(BR + ".shx")
    assert size == 100 + 8 * n
    with open(BR + ".shx", "rb") as f:
        hdr = f.read(100)
    assert struct.unpack(">i", hdr[:4])[0] == 9994  # ESRI magic
    assert struct.unpack("<i", hdr[32:36])[0] == 5  # polygon type
    prj = open(BR + ".prj").read()
    assert prj.startswith("GEOGCS[")
    assert "WGS_1984" in prj and "6378137" in prj
    # both artifact sets carry the identical CRS sidecar
    assert prj == open(TM + ".prj").read()
