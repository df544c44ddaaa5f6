"""General convex overlay tests: kernel properties + the distributed
operator against hand-computable cases."""

from __future__ import annotations

import numpy as np

from wrf_to_geodataframe_spark.geometry.overlay import (
    convex_clip_polygon,
    overlay_intersection,
)
from wrf_to_geodataframe_spark.geometry.polygons import shoelace_area


def _box(x1, y1, x2, y2):
    return np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], dtype=float)


def _rot(poly, theta, cx=0.0, cy=0.0):
    c, s = np.cos(theta), np.sin(theta)
    p = poly - [cx, cy]
    return p @ np.array([[c, s], [-s, c]]) + [cx, cy]


def test_clip_boxes_matches_interval_arithmetic():
    a, b = _box(0, 0, 2, 2), _box(1, 1, 4, 3)
    inter = convex_clip_polygon(a, b)
    assert np.isclose(shoelace_area(inter), 1.0)
    assert np.isclose(shoelace_area(convex_clip_polygon(b, a)), 1.0)  # symmetric


def test_clip_disjoint_and_contained():
    a = _box(0, 0, 1, 1)
    assert len(convex_clip_polygon(a, _box(5, 5, 6, 6))) == 0
    inner = _box(0.25, 0.25, 0.75, 0.75)
    got = convex_clip_polygon(a, inner)
    assert np.isclose(shoelace_area(got), 0.25)


def test_clip_rotated_square_through_unit_box():
    # 45-degree square centered on the unit box's center, circumscribing
    # it exactly -> intersection is the unit box itself
    diamond = _rot(_box(-0.5, -0.5, 1.5, 1.5), np.pi / 4, 0.5, 0.5)
    inter = convex_clip_polygon(_box(0, 0, 1, 1), diamond)
    assert np.isclose(shoelace_area(inter), 1.0)
    # same-size square rotated 45 deg about the center -> octagon of
    # known area 2*(sqrt(2)-1)
    same = _rot(_box(0, 0, 1, 1), np.pi / 4, 0.5, 0.5)
    inter2 = convex_clip_polygon(_box(0, 0, 1, 1), same)
    assert len(inter2) == 8
    assert np.isclose(shoelace_area(inter2), 2.0 * (np.sqrt(2.0) - 1.0))
    # diamond inscribed at the edge midpoints (rotate + shrink by 1/sqrt2)
    # lies fully inside -> intersection is the diamond itself, area 1/2
    inscribed = (same - 0.5) / np.sqrt(2.0) + 0.5
    inter3 = convex_clip_polygon(_box(0, 0, 1, 1), inscribed)
    assert np.isclose(shoelace_area(inter3), 0.5)


def test_overlay_operator_pairs_and_areas(spark):
    a_rows = [(i, float(i), 0.0, float(i + 1), 1.0) for i in range(4)]
    a = spark.createDataFrame(
        a_rows, "aid long, x1 double, y1 double, x2 double, y2 double"
    )
    from pyspark.sql import functions as F

    def boxpoly(x1, y1, x2, y2):
        return F.array(
            F.array(x1, y1), F.array(x2, y1), F.array(x2, y2), F.array(x1, y2)
        )

    a = a.select(
        "aid",
        boxpoly(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")).alias("a_poly"),
    )
    # one shifted big box overlapping cells 1..3 partially
    b = spark.createDataFrame([(100, 1.5, -0.5, 3.5, 0.5)],
                              "bid long, x1 double, y1 double, x2 double, y2 double")
    b = b.select(
        "bid",
        boxpoly(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")).alias("b_poly"),
    )
    got = {
        (r.aid, r.bid): r.area_inter
        for r in overlay_intersection(a, b, bucket=1.0).collect()
    }
    # box [1.5,3.5]x[-0.5,0.5]: overlaps a1 by 0.5*0.5, a2 by 1*0.5, a3 by 0.5*0.5
    assert set(got) == {(1, 100), (2, 100), (3, 100)}
    assert np.isclose(got[(1, 100)], 0.25)
    assert np.isclose(got[(2, 100)], 0.5)
    assert np.isclose(got[(3, 100)], 0.25)


def test_overlay_reference_point_dedup_no_duplicates(spark):
    """A pair spanning many shared buckets must be reported exactly once."""
    from pyspark.sql import functions as F

    def boxpoly(x1, y1, x2, y2):
        return F.array(
            F.array(x1, y1), F.array(x2, y1), F.array(x2, y2), F.array(x1, y2)
        )

    a = spark.createDataFrame([(1, 0.0, 0.0, 10.0, 10.0)],
                              "aid long, x1 double, y1 double, x2 double, y2 double")
    a = a.select("aid", boxpoly(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")).alias("a_poly"))
    b = spark.createDataFrame([(2, 1.0, 1.0, 9.0, 9.0)],
                              "bid long, x1 double, y1 double, x2 double, y2 double")
    b = b.select("bid", boxpoly(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")).alias("b_poly"))
    rows = overlay_intersection(a, b, bucket=2.0).collect()
    assert len(rows) == 1
    assert np.isclose(rows[0].area_inter, 64.0)
