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
