"""Smoke + semantics tests for the core suite (SURVEY.md §5 strategy:
oracle checks run via tools/check.py / the driver; these tests pin the
operator semantics on sf0.001 independently of the oracle)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"user_id", "x_idx", "y_idx", "x1", "y1", "x2", "y2",
            "t_min", "t_max", "t_mean"} <= cols


def test_queries_and_oracles_aligned():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    # every oracle refers to a registered query
    assert set(os_) <= set(qs)


def test_flagship_stat_ordering(spark, sf_dir):
    """Per cell: t_min <= t_mean <= t_max (quantization is monotone)."""
    from wrf_to_geodataframe_spark.suite.core import flagship_daily_cell_stats

    bad = (
        flagship_daily_cell_stats(spark, sf_dir)
        .filter(~((F.col("t_min") <= F.col("t_mean")) & (F.col("t_mean") <= F.col("t_max"))))
        .count()
    )
    assert bad == 0


def test_resample_daily_semantics(spark):
    """Daily tumbling window matches a hand-computed mini fixture
    (mirrors wrf_voronoi.py:156-173 semantics)."""
    from wrf_to_geodataframe_spark.operators.resample import daily_stats_period_mean

    rows = [
        # cell 1: day1 values [1, 3] -> min 1 max 3 mean 2; day2 [5] -> 5,5,5
        (datetime.datetime(2024, 1, 1, 1), 1, 1.0),
        (datetime.datetime(2024, 1, 1, 2), 1, 3.0),
        (datetime.datetime(2024, 1, 2, 1), 1, 5.0),
        # cell 2: single day [10, 20]
        (datetime.datetime(2024, 1, 1, 5), 2, 10.0),
        (datetime.datetime(2024, 1, 1, 9), 2, 20.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "cell", "v"])
    out = {
        r["cell"]: r
        for r in daily_stats_period_mean(df, "ts", "v", ["cell"]).collect()
    }
    assert out[1]["t_min"] == 3.0  # mean(1, 5)
    assert out[1]["t_max"] == 4.0  # mean(3, 5)
    assert out[1]["t_mean"] == 3.5  # mean(2, 5)
    assert out[2]["t_min"] == 10.0
    assert out[2]["t_max"] == 20.0
    assert out[2]["t_mean"] == 15.0


def test_grid_cells_partition_unit_boxes(spark, sf_dir):
    """Analytic cells are disjoint unit boxes: area 1, unique (x_idx,y_idx),
    point-in-own-cell (the property J3 verifies in the reference)."""
    from wrf_to_geodataframe_spark.functions.grid import box_area, point_in_box
    from wrf_to_geodataframe_spark.suite.core import grid_cells

    cells = grid_cells(spark, sf_dir)
    n = cells.count()
    assert cells.select("x_idx", "y_idx").distinct().count() == n
    bad_area = cells.filter(
        box_area(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")) != 1.0
    ).count()
    assert bad_area == 0
    outside = cells.filter(
        ~point_in_box(F.col("x"), F.col("y"), F.col("x1"), F.col("y1"),
                      F.col("x2"), F.col("y2"))
    ).count()
    assert outside == 0
