"""S5 plot sink (sources/render.py): scanline rasterization vs the
even-odd PIP kernel, tile-parallel == single-image, deterministic
colormap, PNG validity through the repo's own codec, and the pixel
guard mirroring the reference's smallness check."""

from __future__ import annotations

import numpy as np
import pytest

from wrf_to_geodataframe_spark.geometry.polygons import point_in_polygon
from wrf_to_geodataframe_spark.sources.png import decode_png
from wrf_to_geodataframe_spark.sources.render import (
    colormap_rgb,
    rasterize_polygon,
    render_cells,
    render_cells_png,
    world_file,
)


def test_colormap_endpoints_and_monotone_luma():
    c = colormap_rgb(np.arange(256))
    assert c.shape == (256, 3) and c.dtype == np.uint8
    assert tuple(c[0]) == (68, 1, 84)        # first anchor
    assert tuple(c[255]) == (253, 231, 37)   # last anchor
    # perceptual ramp: integer luma strictly non-decreasing
    luma = c @ np.array([299, 587, 114])
    assert (np.diff(luma.astype("int64")) >= 0).all()
    with pytest.raises(ValueError):
        colormap_rgb(np.array([256]))


def _pip_mask(xs, ys, transform, w, h):
    """Oracle: even-odd PIP of every pixel center (geometry/polygons
    kernel) — the rasterizer must agree wherever no center sits
    exactly on an edge."""
    pw, ph, ox, oy = transform
    poly = np.column_stack([xs, ys])
    out = np.zeros((h, w), dtype=bool)
    for r in range(h):
        for c in range(w):
            out[r, c] = point_in_polygon(
                ox + (c + 0.5) * pw, oy + (r + 0.5) * ph, poly
            )
    return out


@pytest.mark.parametrize("ph", [0.25, -0.25])
def test_rasterizer_agrees_with_pip_kernel(ph):
    rng = np.random.default_rng(7)
    transform = (0.25, ph, 0.0, 0.0 if ph > 0 else 5.0)
    w = h = 20
    for case in range(30):
        n = int(rng.integers(3, 9))
        # random star-shaped simple polygon, vertices OFF the pixel
        # lattice so no center lands exactly on an edge
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(0.4, 2.3, n)
        cx, cy = rng.uniform(1.0, 4.0, 2)
        xs = cx + rad * np.cos(ang) + 0.0013
        ys = (cy if ph > 0 else 5.0 - cy) + rad * np.sin(ang) + 0.0017
        r0, c0, mask = rasterize_polygon(xs, ys, transform, w, h)
        full = np.zeros((h, w), dtype=bool)
        if mask.size:
            full[r0:r0 + mask.shape[0], c0:c0 + mask.shape[1]] = mask
        expect = _pip_mask(xs, ys, transform, w, h)
        np.testing.assert_array_equal(full, expect, err_msg=f"case {case}")


def test_rasterizer_concave_even_odd():
    # L-shape: the notch must stay unfilled (even-odd, not convex fill)
    xs = [0.1, 4.1, 4.1, 2.1, 2.1, 0.1]
    ys = [0.1, 0.1, 2.1, 2.1, 4.1, 4.1]
    transform = (1.0, 1.0, 0.0, 0.0)
    r0, c0, mask = rasterize_polygon(xs, ys, transform, 6, 6)
    full = np.zeros((6, 6), dtype=bool)
    full[r0:r0 + mask.shape[0], c0:c0 + mask.shape[1]] = mask
    expect = _pip_mask(xs, ys, transform, 6, 6)
    np.testing.assert_array_equal(full, expect)
    assert not full[3, 3]  # inside the notch
    assert full[1, 1]


def _cells_df(spark):
    # 2x2 unit squares tiling [0,2)x[0,2), distinct values
    rows = []
    for j in range(2):
        for i in range(2):
            rows.append((
                j * 2 + i,
                [float(i), float(i + 1), float(i + 1), float(i)],
                [float(j), float(j), float(j + 1), float(j + 1)],
                float(j * 2 + i),
            ))
    return spark.createDataFrame(
        rows, "cell_id long, xs array<double>, ys array<double>, v double"
    )


def test_tiles_stitch_to_single_image(spark):
    """Tile-parallel render (3px tiles forcing seams through cell
    interiors) stitches EXACTLY to the one-tile render — the
    distributed==single discipline."""
    cells = _cells_df(spark)
    transform = (0.25, 0.25, 0.0, 0.0)
    png_tiled, wf = render_cells_png(
        spark, cells, "v", transform, 8, 8, tile=3, order_col="cell_id"
    )
    png_one, _ = render_cells_png(
        spark, cells, "v", transform, 8, 8, tile=64, order_col="cell_id"
    )
    assert png_tiled == png_one
    w, h, ch, raw = decode_png(png_one)
    assert (w, h, ch) == (8, 8, 4)
    img = np.frombuffer(raw, "uint8").reshape(8, 8, 4)
    # full coverage: a tessellation leaves no background pixels
    assert (img[:, :, 3] == 255).all()
    # distinct quadrant colors; value order follows the colormap ramp
    q = {(0, 0): img[1, 1], (0, 1): img[1, 6],
         (1, 0): img[6, 1], (1, 1): img[6, 6]}
    assert len({tuple(v) for v in q.values()}) == 4
    assert tuple(q[(0, 0)][:3]) == (68, 1, 84)     # v=0 -> first anchor
    assert tuple(q[(1, 1)][:3]) == (253, 231, 37)  # v=3 -> last anchor
    # world file: pixel size + center-of-first-pixel origin
    lines = wf.strip().splitlines()
    assert float(lines[0]) == 0.25 and float(lines[3]) == 0.25
    assert float(lines[4]) == 0.125 and float(lines[5]) == 0.125


def test_render_tiles_dataframe_shape(spark):
    cells = _cells_df(spark)
    tiles = render_cells(
        spark, cells, "v", (0.25, 0.25, 0.0, 0.0), 8, 8, tile=4,
        order_col="cell_id",
    ).collect()
    assert sorted((r["tile_y"], r["tile_x"]) for r in tiles) == [
        (0, 0), (0, 1), (1, 0), (1, 1)
    ]
    for r in tiles:
        w, h, ch, _raw = decode_png(bytes(r["png"]))
        assert (w, h, ch) == (4, 4, 4)


def test_off_canvas_cells_are_dropped_not_exploded(spark):
    """A cell whose bbox lies entirely off-canvas must not render:
    F.sequence descends when start > stop, so without the pre-explode
    filter a right/below cell generated the whole descending tile
    range (negative tile dims -> crash) and an above/left cell painted
    the wrong part of the image via negative indexing."""
    base = _cells_df(spark)
    extra = spark.createDataFrame(
        [
            # entirely right+below of the 8x8 canvas (pixel 0.25)
            (10, [9.0, 10.0, 10.0, 9.0], [9.0, 9.0, 10.0, 10.0], 1.5),
            # entirely left+above (negative world coords)
            (11, [-5.0, -4.0, -4.0, -5.0], [-5.0, -5.0, -4.0, -4.0], 1.5),
        ],
        "cell_id long, xs array<double>, ys array<double>, v double",
    )
    transform = (0.25, 0.25, 0.0, 0.0)
    png_with, _ = render_cells_png(
        spark, base.unionByName(extra), "v", transform, 8, 8,
        tile=3, order_col="cell_id",
    )
    png_without, _ = render_cells_png(
        spark, base, "v", transform, 8, 8, tile=3, order_col="cell_id"
    )
    # off-canvas cells are inside [vmin, vmax] of the on-canvas values
    # so the colormap scaling is unchanged -> images identical
    assert png_with == png_without


def test_tile_pyramid_rejects_odd_tile_size(spark):
    from wrf_to_geodataframe_spark.sources.render import build_tile_pyramid

    cells = _cells_df(spark)
    tiles = render_cells(
        spark, cells, "v", (0.25, 0.25, 0.0, 0.0), 8, 8, tile=4,
        order_col="cell_id",
    )
    with pytest.raises(ValueError, match="even tile size"):
        build_tile_pyramid(spark, tiles, levels=1, tile=5)


def test_single_image_pixel_guard(spark):
    cells = _cells_df(spark)
    with pytest.raises(ValueError, match="max_pixels"):
        render_cells_png(
            spark, cells, "v", (0.25, 0.25, 0.0, 0.0), 8000, 8000
        )


def test_constant_value_renders_midscale(spark):
    cells = _cells_df(spark).withColumn("v", _lit_one())
    png, _ = render_cells_png(
        spark, cells, "v", (0.5, 0.5, 0.0, 0.0), 4, 4,
        order_col="cell_id",
    )
    w, h, ch, raw = decode_png(png)
    img = np.frombuffer(raw, "uint8").reshape(4, 4, 4)
    mid = colormap_rgb(np.int64(128))
    assert (img[:, :, :3] == mid).all()


def _lit_one():
    from pyspark.sql import functions as F

    return F.lit(1.0)


def test_render_grid_from_long_table(spark):
    """The grid fast path: (y_idx, x_idx, value) rows -> pixel tiles;
    NULLs stay transparent background (the nodata convention); the
    colormap matches the polygon path's on identical values."""
    import pandas as pd

    from wrf_to_geodataframe_spark.sources.render import render_grid

    rows = [
        (y, x, float(y * 6 + x) if (y, x) != (2, 3) else None)
        for y in range(5)
        for x in range(6)
    ]
    grid = spark.createDataFrame(
        pd.DataFrame(rows, columns=["y_idx", "x_idx", "value"])
    )
    tiles = render_grid(spark, grid, tile=4).collect()
    assert sorted((r["tile_y"], r["tile_x"]) for r in tiles) == [
        (0, 0), (0, 1), (1, 0), (1, 1)
    ]
    img = np.zeros((5, 6, 4), dtype="uint8")
    for r in tiles:
        w, h, ch, raw = decode_png(bytes(r["png"]))
        block = np.frombuffer(raw, "uint8").reshape(h, w, ch)
        img[r["tile_y"] * 4:r["tile_y"] * 4 + h,
            r["tile_x"] * 4:r["tile_x"] * 4 + w] = block
    assert img[2, 3, 3] == 0          # NULL cell: transparent
    assert (img[0, 0, :3] == colormap_rgb(np.int64(0))).all()
    assert (img[4, 5, :3] == colormap_rgb(np.int64(255))).all()
    # all non-null pixels painted opaque
    mask = np.ones((5, 6), dtype=bool)
    mask[2, 3] = False
    assert (img[:, :, 3][mask] == 255).all()


def test_write_png_tiles_executor_side(spark, tmp_path):
    import os

    from wrf_to_geodataframe_spark.sources.render import (
        render_cells,
        write_png_tiles,
    )

    cells = _cells_df(spark)
    transform = (0.25, 0.25, 0.0, 0.0)
    tiles = render_cells(
        spark, cells, "v", transform, 8, 8, tile=4, order_col="cell_id"
    )
    out = str(tmp_path / "tiles")
    n = write_png_tiles(tiles, out, transform=transform, tile=4)
    assert n == 4
    names = sorted(os.listdir(out))
    assert names == [
        "tile_0_0.pgw", "tile_0_0.png", "tile_0_1.pgw", "tile_0_1.png",
        "tile_1_0.pgw", "tile_1_0.png", "tile_1_1.pgw", "tile_1_1.png",
    ]
    w, h, ch, _ = decode_png(open(os.path.join(out, "tile_1_1.png"), "rb").read())
    assert (w, h, ch) == (4, 4, 4)
    # tile (1,1)'s world file shifts the origin by one 4px tile
    lines = open(os.path.join(out, "tile_1_1.pgw")).read().splitlines()
    assert float(lines[4]) == 1.0 + 0.125 and float(lines[5]) == 1.0 + 0.125


def test_nan_values_render_as_nodata_not_poison(spark):
    """NaN (the nodata convention GeoTIFF/virtual reads emit) must
    render as background AND not poison the global extent — Spark's
    min/max order NaN above every double, so an unfiltered aggregate
    would wreck every other cell's color."""
    import pandas as pd

    from wrf_to_geodataframe_spark.sources.render import render_grid

    rows = [
        (0, 0, 0.0), (0, 1, float("nan")), (1, 0, 3.0), (1, 1, None),
    ]
    grid = spark.createDataFrame(
        pd.DataFrame(rows, columns=["y_idx", "x_idx", "value"])
    )
    tiles = render_grid(spark, grid, width=2, height=2, tile=4).collect()
    assert len(tiles) == 1
    w, h, ch, raw = decode_png(bytes(tiles[0]["png"]))
    img = np.frombuffer(raw, "uint8").reshape(2, 2, 4)
    assert img[0, 1, 3] == 0 and img[1, 1, 3] == 0   # NaN & NULL: nodata
    # extent is (0, 3), not (0, NaN): endpoints hit the ramp ends
    assert tuple(img[0, 0, :3]) == tuple(colormap_rgb(np.int64(0)))
    assert tuple(img[1, 0, :3]) == tuple(colormap_rgb(np.int64(255)))
    # polygon path: NaN-valued cell drops out, others keep their ramp
    from wrf_to_geodataframe_spark.sources.render import render_cells_png

    cells = _cells_df(spark).withColumn(
        "v", _nan_if_zero()
    )
    png, _ = render_cells_png(
        spark, cells, "v", (0.5, 0.5, 0.0, 0.0), 4, 4,
        order_col="cell_id",
    )
    w, h, ch, raw = decode_png(png)
    img = np.frombuffer(raw, "uint8").reshape(4, 4, 4)
    assert img[0, 0, 3] == 0                          # NaN cell: background
    assert tuple(img[0, 3, :3]) == tuple(colormap_rgb(np.int64(0)))
    assert tuple(img[3, 3, :3]) == tuple(colormap_rgb(np.int64(255)))


def _nan_if_zero():
    from pyspark.sql import functions as F

    return F.when(F.col("v") == 0.0, float("nan")).otherwise(F.col("v"))


def test_tile_pyramid_levels_and_alpha_weighting(spark):
    """build_tile_pyramid: level-1 composes 4 children box-downsampled
    2x into quadrants; alpha-weighted averaging keeps nodata pixels
    from bleeding (a fully transparent block stays transparent, a
    constant opaque block keeps its exact color); level-2 reduces to
    one tile."""
    import pandas as pd

    from wrf_to_geodataframe_spark.sources.png import encode_png
    from wrf_to_geodataframe_spark.sources.render import (
        build_tile_pyramid,
    )

    T = 8  # tiny tiles for the test

    def _tile(rgb, alpha=255):
        img = np.zeros((T, T, 4), dtype="uint8")
        img[:, :, :3] = rgb
        img[:, :, 3] = alpha
        return encode_png(img.tobytes(), T, T, channels=4)

    rows = [
        (0, 0, _tile((10, 20, 30))),
        (0, 1, _tile((50, 60, 70))),
        (1, 0, _tile((90, 100, 110), alpha=0)),   # fully transparent
        (1, 1, _tile((130, 140, 150))),
        (0, 2, _tile((200, 0, 0))),               # second parent, half empty
    ]
    tiles = spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile_y", "tile_x", "png"])
    )
    pyr = build_tile_pyramid(spark, tiles, levels=2, tile=T).collect()
    lv1 = {(r["tile_y"], r["tile_x"]): bytes(r["png"])
           for r in pyr if r["level"] == 1}
    lv2 = [r for r in pyr if r["level"] == 2]
    assert sorted(lv1) == [(0, 0), (0, 1)]
    assert len(lv2) == 1 and (lv2[0]["tile_y"], lv2[0]["tile_x"]) == (0, 0)

    w, h, ch, raw = decode_png(lv1[(0, 0)])
    img = np.frombuffer(raw, "uint8").reshape(T, T, 4)
    hf = T // 2
    # constant opaque children keep exact colors in their quadrants
    assert (img[:hf, :hf, :3] == (10, 20, 30)).all()
    assert (img[:hf, hf:, :3] == (50, 60, 70)).all()
    assert (img[hf:, hf:, :3] == (130, 140, 150)).all()
    assert (img[:hf, :, 3] == 255).all() and (img[hf:, hf:, 3] == 255).all()
    # the transparent child's quadrant stays fully transparent
    assert (img[hf:, :hf, 3] == 0).all()

    # parent (0,1) has only one child (0,2): its other quadrants are
    # empty, the child's quadrant keeps the color
    w, h, ch, raw = decode_png(lv1[(0, 1)])
    img2 = np.frombuffer(raw, "uint8").reshape(T, T, 4)
    assert (img2[:hf, :hf, :3] == (200, 0, 0)).all()
    assert (img2[:, hf:, 3] == 0).all() and (img2[hf:, :, 3] == 0).all()
