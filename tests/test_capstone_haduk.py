"""capstone_haduk_voronoi pins the oracle cannot state: the GPKG's
geometry blobs themselves (aligned-shift cells must come back as their
EXACT unit boxes), the within-drop boundary semantics, and the axis
re-keying."""

from __future__ import annotations

import numpy as np

from wrf_to_geodataframe_spark.suite.tessellation import (
    _HK_NI,
    _HK_NJ,
    _HK_SHIFTS,
    _haduk_chain_to_gpkg,
    _write_haduk_fixture,
)


def test_haduk_gpkg_geometry_and_within_drop(spark):
    from wrf_to_geodataframe_spark.sources.geopackage import read_geopackage

    d = _write_haduk_fixture()
    p, xt, yt, scan = _haduk_chain_to_gpkg(spark, d)
    back = read_geopackage(p)
    # the within-drop keeps exactly the interior sub-grid
    assert len(back) == (_HK_NJ - 2) * (_HK_NI - 2)
    keys = {(r["proj_x"], r["proj_y"]) for r in back}
    assert keys == {
        (1000.0 * i, 1000.0 * j)
        for j in range(1, _HK_NJ - 1) for i in range(1, _HK_NI - 1)
    }
    # aligned-shift cells come back from the GPKG as their EXACT
    # half-spacing boxes (bit-exact through WKT, WKB, and sqlite)
    checked = 0
    for r in back:
        i = int(r["proj_x"] / 1000.0)
        j = int(r["proj_y"] / 1000.0)
        if 5 <= j <= 8:
            continue  # shift-transition rows: non-box cells, skipped
        t = _HK_SHIFTS[j]
        ring = np.asarray(r["geom"], dtype=float)
        want = {
            (i + t - 0.5, j - 0.5), (i + t + 0.5, j - 0.5),
            (i + t + 0.5, j + 0.5), (i + t - 0.5, j + 0.5),
        }
        assert {(x, y) for x, y in ring} == want, (i, j)
        checked += 1
    assert checked == (_HK_NJ - 6) * (_HK_NI - 2)  # 10 aligned rows
