"""Spark surfaces of the zarr source/sink (sources/zarr.py):
chunk-parallel distributed scan vs driver read, distributed chunk
sink round-trip, missing-chunk fill, time selection, and the
partitioning/scale-shape assertions."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.sources.zarr import (
    read_zarr_dist,
    read_zarr_grid,
    read_zarr_store,
    write_zarr,
    write_zarr_dist,
)


def _demo_store(path: str, nt=3, ny=10, nx=14, **kw) -> np.ndarray:
    rng = np.random.default_rng(42)
    vals = np.round(rng.standard_normal((nt, ny, nx)) * 8) / 8
    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    write_zarr(
        path,
        {"t": nt, "y": ny, "x": nx},
        {
            "T2": {"dims": ["t", "y", "x"], "data": vals},
            "XLAT": {"dims": ["y", "x"], "data": 50.0 + yy * 0.25},
            "XLONG": {"dims": ["y", "x"], "data": -3.0 + xx * 0.125},
        },
        chunks={"T2": (2, 4, 5), "XLAT": (4, 5), "XLONG": (4, 5)},
        **kw,
    )
    return vals


def _collect_map(df):
    rows = df.select("t_idx", "y_idx", "x_idx", "lat", "lon", "value").collect()
    return {
        (r["t_idx"], r["y_idx"], r["x_idx"]): (r["lat"], r["lon"], r["value"])
        for r in rows
    }


def test_dist_matches_driver_read(spark, tmp_path):
    store = str(tmp_path / "s")
    vals = _demo_store(store)
    dist = _collect_map(read_zarr_dist(spark, store, "T2", "XLAT", "XLONG"))
    assert len(dist) == 3 * 10 * 14
    for (t, y, x), (lat, lon, v) in dist.items():
        assert lat == 50.0 + y * 0.25
        assert lon == -3.0 + x * 0.125
        assert v == vals[t, y, x]


def test_dist_time_index_selection(spark, tmp_path):
    store = str(tmp_path / "s")
    vals = _demo_store(store)
    df = read_zarr_dist(spark, store, "T2", "XLAT", "XLONG", time_index=1)
    m = _collect_map(df)
    assert len(m) == 10 * 14
    assert {t for (t, _, _) in m} == {1}
    for (t, y, x), (_la, _lo, v) in m.items():
        assert v == vals[1, y, x]


def test_dist_2d_variable(spark, tmp_path):
    store = str(tmp_path / "s")
    _demo_store(store)
    df = read_zarr_dist(spark, store, "XLAT", "XLAT", "XLONG")
    m = _collect_map(df)
    assert len(m) == 10 * 14
    assert {t for (t, _, _) in m} == {0}
    for (_t, y, _x), (_la, _lo, v) in m.items():
        assert v == 50.0 + y * 0.25


def test_dist_missing_chunk_yields_fill(spark, tmp_path):
    store = str(tmp_path / "s")
    _demo_store(store)
    os.remove(os.path.join(store, "T2", "0.1.2"))
    df = read_zarr_dist(spark, store, "T2", "XLAT", "XLONG")
    got = df.filter(F.isnan("value") | F.col("value").isNull()).count()
    # fill_value 0.0 (writer default) -> deleted chunk reads as 0, not
    # NaN; count exact zeros in the deleted tile instead
    tile = df.filter(
        (F.col("t_idx") < 2)
        & F.col("y_idx").between(4, 7)
        & F.col("x_idx").between(10, 13)
    )
    assert got == 0
    assert tile.filter(F.col("value") == 0.0).count() == 2 * 4 * 4
    # driver read agrees
    ds = read_zarr_store(store)
    assert (ds["variables"]["T2"]["data"][:2, 4:8, 10:14] == 0).all()


def test_dist_scan_is_chunk_parallel(spark, tmp_path):
    """Scale shape: the manifest has one row per chunk and the scan
    runs as multiple tasks — parsing happens executor-side, nothing
    data-sized on the driver."""
    store = str(tmp_path / "s")
    _demo_store(store)
    df = read_zarr_dist(spark, store, "T2", "XLAT", "XLONG")
    nparts = df.rdd.getNumPartitions()
    assert nparts > 1
    per_key = (
        df.groupBy("chunk_key").count().collect()
    )
    assert len(per_key) == math.prod((2, 3, 3))  # ceil(3/2)*ceil(10/4)*ceil(14/5)


def test_driver_grid_matches_store(spark, tmp_path):
    store = str(tmp_path / "s")
    vals = _demo_store(store, nt=1)
    df = read_zarr_grid(spark, store, "T2", "XLAT", "XLONG", time_index=0)
    rows = df.collect()
    assert len(rows) == 10 * 14
    for r in rows:
        assert r["value"] == vals[0, r["y_idx"], r["x_idx"]]


def test_write_zarr_dist_roundtrip(spark, tmp_path):
    """Long table -> distributed chunk sink -> driver store read:
    values, coords, metadata and chunk layout all round-trip."""
    nt, ny, nx = 2, 9, 11
    src = (
        spark.range(nt * ny * nx)
        .select(
            (F.col("id") / (ny * nx)).cast("long").alias("t_idx"),
            ((F.col("id") / nx) % ny).cast("long").alias("y_idx"),
            (F.col("id") % nx).alias("x_idx"),
        )
        .withColumn("lat", 50.0 + F.col("y_idx") * 0.25)
        .withColumn("lon", -3.0 + F.col("x_idx") * 0.125)
        .withColumn(
            "value",
            (F.col("t_idx") * 1000 + F.col("y_idx") * nx + F.col("x_idx"))
            .cast("double"),
        )
    )
    out = str(tmp_path / "out")
    manifest = write_zarr_dist(
        src, out, chunk_t=1, chunk_y=4, chunk_x=4
    ).collect()
    assert len(manifest) == nt * 3 * 3
    assert sum(r["n_cells"] for r in manifest) == nt * ny * nx
    ds = read_zarr_store(out)
    t2 = ds["variables"]["T2"]
    assert t2["dims"] == ["t", "y", "x"]
    assert t2["data"].shape == (nt, ny, nx)
    for t in range(nt):
        want = t * 1000 + np.arange(ny)[:, None] * nx + np.arange(nx)
        np.testing.assert_array_equal(t2["data"][t], want)
    np.testing.assert_array_equal(
        ds["variables"]["XLAT"]["data"],
        50.0 + np.arange(ny)[:, None] * 0.25 + np.zeros((ny, nx)),
    )
    np.testing.assert_array_equal(
        ds["variables"]["XLONG"]["data"],
        -3.0 + np.zeros((ny, nx)) + np.arange(nx) * 0.125,
    )


def test_write_read_dist_loop(spark, tmp_path):
    """Full distributed loop: dist sink -> dist scan, no driver data."""
    ny, nx = 8, 8
    src = (
        spark.range(ny * nx)
        .select(
            F.lit(0).cast("long").alias("t_idx"),
            (F.col("id") / nx).cast("long").alias("y_idx"),
            (F.col("id") % nx).alias("x_idx"),
        )
        .withColumn("lat", F.col("y_idx") * 1.0)
        .withColumn("lon", F.col("x_idx") * 1.0)
        .withColumn("value", (F.col("y_idx") * 31 + F.col("x_idx")).cast("double"))
    )
    out = str(tmp_path / "loop")
    write_zarr_dist(src, out, chunk_y=3, chunk_x=5).collect()
    back = read_zarr_dist(spark, out, "T2", "XLAT", "XLONG")
    m = _collect_map(back)
    assert len(m) == ny * nx
    for (t, y, x), (lat, lon, v) in m.items():
        assert (lat, lon, v) == (float(y), float(x), float(y * 31 + x))
