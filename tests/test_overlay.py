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


# ---------------------------------------------------------------------------
# Concave path: ear clipping, even-odd PIP, and the general overlay


def _L_poly(ox=0.0, oy=0.0):
    """Concave L: union of [ox,ox+2.5]x[oy,oy+1.3] and
    [ox,ox+1.3]x[oy+1.3,oy+2.6] (reflex corner at (ox+1.3, oy+1.3))."""
    return np.array(
        [
            [ox, oy], [ox + 2.5, oy], [ox + 2.5, oy + 1.3],
            [ox + 1.3, oy + 1.3], [ox + 1.3, oy + 2.6], [ox, oy + 2.6],
        ]
    )


def _U_poly():
    """Concave U: [0,3]x[0,1] base with two [.,.]x[1,3] prongs of width 1."""
    return np.array(
        [
            [0.0, 0.0], [3.0, 0.0], [3.0, 3.0], [2.0, 3.0],
            [2.0, 1.0], [1.0, 1.0], [1.0, 3.0], [0.0, 3.0],
        ]
    )


def test_ear_clip_partitions_area_and_count():
    from wrf_to_geodataframe_spark.geometry.polygons import ear_clip

    for poly, want_area in ((_L_poly(), 2.5 * 1.3 + 1.3 * 1.3),
                            (_U_poly(), 3.0 + 2.0 * 2.0)):
        tris = ear_clip(poly)
        assert tris.shape == (len(poly) - 2, 3, 2)
        total = sum(shoelace_area(t) for t in tris)
        assert np.isclose(total, want_area, atol=1e-12)
        # every triangle ccw and non-degenerate
        for t in tris:
            x, y = t[:, 0], t[:, 1]
            signed = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
            assert signed > 1e-12


def test_ear_clip_accepts_cw_input_and_rejects_degenerate():
    import pytest

    from wrf_to_geodataframe_spark.geometry.polygons import ear_clip

    tris = ear_clip(_L_poly()[::-1])  # cw input re-oriented internally
    assert np.isclose(
        sum(shoelace_area(t) for t in tris), 2.5 * 1.3 + 1.3 * 1.3
    )
    # fully collinear ring cleans to nothing -> named error, no loop
    flat = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    with pytest.raises(ValueError, match="degenerates to zero area"):
        ear_clip(flat)
    # (self-intersecting input is a caller contract violation: the
    # kernel terminates — either a named error or an unspecified
    # triangulation — but never loops; simplicity is not detectable
    # in O(n^2) ear clipping)


def test_point_in_polygon_evenodd_concave():
    from wrf_to_geodataframe_spark.geometry.polygons import point_in_polygon

    L = _L_poly()
    assert point_in_polygon(0.5, 0.5, L)          # bottom arm
    assert point_in_polygon(0.5, 2.0, L)          # left arm
    assert not point_in_polygon(2.0, 2.0, L)      # the notch
    assert not point_in_polygon(-0.5, 0.5, L)     # outside left
    assert not point_in_polygon(3.0, 0.5, L)      # outside right
    assert point_in_polygon(1.3, 1.3, L)          # ON the reflex corner
    assert point_in_polygon(0.0, 1.0, L)          # ON the left edge
    U = _U_poly()
    assert point_in_polygon(1.5, 0.5, U)          # base
    assert not point_in_polygon(1.5, 2.0, U)      # between the prongs
    assert point_in_polygon(0.5, 2.5, U) and point_in_polygon(2.5, 2.5, U)


def test_point_in_polygon_col_matches_numpy_kernel(spark):
    """The JVM HOF expression and the Arrow kernel must agree on every
    off-boundary probe of the concave shapes."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.functions.polygons import (
        point_in_polygon_col,
    )
    from wrf_to_geodataframe_spark.geometry.polygons import point_in_polygon

    probes = [
        (x / 10.0 + 0.01, y / 10.0 + 0.01)
        for x in range(-5, 35, 3)
        for y in range(-5, 35, 4)
    ]
    for poly in (_L_poly(0.05, 0.05), _U_poly()):
        want = [point_in_polygon(px, py, poly) for px, py in probes]
        df = spark.createDataFrame(probes, "px double, py double")
        lit_poly = F.array(
            *[F.array(F.lit(float(x)), F.lit(float(y))) for x, y in poly]
        )
        got = [
            r.hit
            for r in df.select(
                point_in_polygon_col(
                    F.col("px"), F.col("py"), lit_poly
                ).alias("hit")
            ).collect()
        ]
        assert got == want


def test_overlay_general_concave_areas(spark):
    """Cell grid x concave L: areas must match the analytic two-
    rectangle decomposition, and a cell inside the notch must vanish."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.geometry.overlay import (
        overlay_intersection_general,
    )

    def boxpoly(x1, y1, x2, y2):
        return F.array(
            F.array(x1, y1), F.array(x2, y1), F.array(x2, y2), F.array(x1, y2)
        )

    cells = [
        (0, 0.0, 0.0, 1.0, 1.0),      # bottom arm: full unit overlap
        (1, 1.5, 1.5, 2.4, 2.5),      # entirely in the notch: no overlap
        (2, 0.0, 0.0, 3.0, 3.0),      # covers the whole L
        (3, 1.0, 1.0, 2.0, 2.0),      # straddles the reflex corner
    ]
    a = spark.createDataFrame(
        cells, "aid long, x1 double, y1 double, x2 double, y2 double"
    ).select(
        "aid",
        boxpoly(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")).alias("a_poly"),
    )
    Lv = _L_poly()
    b = spark.range(1).select(
        F.lit(7).alias("bid"),
        F.array(
            *[F.array(F.lit(float(x)), F.lit(float(y))) for x, y in Lv]
        ).alias("b_poly"),
    )
    got = {
        r.aid: r.area_inter
        for r in overlay_intersection_general(a, b, bucket=1.0).collect()
    }
    L_area = 2.5 * 1.3 + 1.3 * 1.3
    # cell 3 [1,2]^2 vs L: R1 part [1,2]x[1,1.3] = 0.3; R2 part [1,1.3]x[1.3,2] = 0.21
    assert set(got) == {0, 2, 3}
    assert np.isclose(got[0], 1.0, atol=1e-9)
    assert np.isclose(got[2], L_area, atol=1e-9)
    assert np.isclose(got[3], 0.3 + 0.3 * 0.7, atol=1e-9)


def test_overlay_general_conservation_partition(spark):
    """Conservation (A5) on a concave overlay: a unit-cell partition of
    the plane covering the L must receive exactly the L's area."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.geometry.overlay import (
        overlay_intersection_general,
    )

    def boxpoly(x1, y1, x2, y2):
        return F.array(
            F.array(x1, y1), F.array(x2, y1), F.array(x2, y2), F.array(x1, y2)
        )

    cells = [
        (i * 10 + j, i - 1.0, j - 1.0, i + 0.0, j + 0.0)
        for i in range(6)
        for j in range(6)
    ]
    a = spark.createDataFrame(
        cells, "aid long, x1 double, y1 double, x2 double, y2 double"
    ).select(
        "aid",
        boxpoly(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")).alias("a_poly"),
    )
    for poly, want in ((_L_poly(0.3, 0.2), 2.5 * 1.3 + 1.3 * 1.3),
                       (_U_poly(), 3.0 + 4.0)):
        b = spark.range(1).select(
            F.lit(1).alias("bid"),
            F.array(
                *[F.array(F.lit(float(x)), F.lit(float(y))) for x, y in poly]
            ).alias("b_poly"),
        )
        rows = overlay_intersection_general(a, b, bucket=2.0).collect()
        assert np.isclose(sum(r.area_inter for r in rows), want, atol=1e-9)


def test_ear_clip_hypothesis_rectilinear_fuzz():
    """Property fuzz: random rectilinear staircase rings (always
    simple, frequently concave) — triangulation must partition the
    area exactly and the even-odd PIP must agree with the triangle
    union on random probes."""
    from hypothesis import given, settings, strategies as st

    from wrf_to_geodataframe_spark.geometry.polygons import (
        ear_clip,
        point_in_polygon,
        shoelace_area,
    )

    def staircase(rnd, n_steps):
        """Simple rectilinear ring: monotone staircase from (0,0) to
        (n,~h) along the top, closed by the baseline."""
        xs = sorted(rnd.sample(range(1, 40), n_steps))
        pts = [[0.0, 0.0]]
        y = 1.0 + rnd.randrange(5)
        prev_x = 0.0
        for x in xs:
            pts.append([prev_x, y])
            pts.append([float(x), y])
            prev_x = float(x)
            y = 1.0 + rnd.randrange(5)
        pts.append([prev_x, y])
        pts.append([float(xs[-1] + 1), y])
        pts.append([float(xs[-1] + 1), 0.0])
        # orient ccw: the constructed ring is cw (top path then down)
        return np.array(pts[::-1])

    @settings(max_examples=40, deadline=None)
    @given(st.integers(2, 8), st.randoms(use_true_random=False))
    def prop(n_steps, rnd):
        poly = staircase(rnd, n_steps)
        tris = ear_clip(poly)  # collinear chain vertices are cleaned
        assert len(tris) <= len(poly) - 2
        total = sum(shoelace_area(t) for t in tris)
        assert np.isclose(total, shoelace_area(poly), atol=1e-9)
        # PIP vs triangle-union on off-grid probes (never on edges)
        from wrf_to_geodataframe_spark.geometry.polygons import (
            point_in_convex_polygon,
        )

        for _ in range(20):
            px = rnd.randrange(-2, 42) + 0.31
            py = rnd.randrange(-2, 8) + 0.47
            want = any(point_in_convex_polygon(px, py, t) for t in tris)
            assert point_in_polygon(px, py, poly) == want

    prop()


def test_triangulate_rows_quarantines_invalid_rings(spark):
    """invalid='skip' drops a zero-area ring instead of aborting the
    job; invalid='raise' names the offending row."""
    import pytest
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.geometry.overlay import triangulate_rows

    rows = [
        (1, [[0.0, 0.0], [3.0, 0.0], [3.0, 3.0], [2.0, 3.0],
             [2.0, 1.0], [1.0, 1.0], [1.0, 3.0], [0.0, 3.0]]),  # valid U
        (2, [[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]),              # zero area
    ]
    df = spark.createDataFrame(rows, "bid long, b_poly array<array<double>>")
    ok = triangulate_rows(df, "b_poly", invalid="skip").collect()
    assert {r.bid for r in ok} == {1}
    assert len(ok) == 6  # 8-vertex U -> 6 triangles
    with pytest.raises(Exception, match="invalid boundary ring"):
        triangulate_rows(df, "b_poly").collect()


def test_star_polygon_fuzz_pip_and_triangulation():
    """Random star polygons (random radii at sorted angles — simple by
    construction, usually concave): ear-clip area partition holds and
    the even-odd PIP agrees with the triangle union on random probes."""
    from hypothesis import given, settings, strategies as st

    from wrf_to_geodataframe_spark.geometry.polygons import (
        ear_clip,
        point_in_convex_polygon,
        point_in_polygon,
    )

    @settings(max_examples=30, deadline=None)
    @given(st.integers(5, 14), st.randoms(use_true_random=False))
    def prop(n, rnd):
        angles = sorted(rnd.uniform(0, 2 * np.pi) for _ in range(n))
        gaps = [b - a for a, b in zip(angles, angles[1:])]
        gaps.append(2 * np.pi - angles[-1] + angles[0])
        # radial polygons are star-shaped about the origin (hence
        # simple) only when every cyclic angular gap < pi; and nearly
        # coincident rays make sliver rings — skip both
        if min(gaps) < 1e-3 or max(gaps) >= np.pi - 1e-3:
            return
        poly = np.array(
            [
                [r * np.cos(t), r * np.sin(t)]
                for t, r in ((t, rnd.uniform(0.5, 5.0)) for t in angles)
            ]
        )
        tris = ear_clip(poly)
        total = sum(shoelace_area(t) for t in tris)
        assert np.isclose(total, shoelace_area(poly), rtol=1e-9)
        for _ in range(25):
            px, py = rnd.uniform(-6, 6), rnd.uniform(-6, 6)
            want = any(point_in_convex_polygon(px, py, t) for t in tris)
            got = point_in_polygon(px, py, poly)
            # boundary-epsilon disagreements are legitimate: skip probes
            # within a hair of any edge
            d = min(
                abs((b[0]-a[0])*(py-a[1]) - (b[1]-a[1])*(px-a[0]))
                / max(np.hypot(b[0]-a[0], b[1]-a[1]), 1e-9)
                for a, b in zip(poly, np.roll(poly, -1, 0))
            )
            if d < 1e-6:
                continue
            assert got == want

    prop()


def test_parse_wkt_polygon_round_trip(spark):
    """parse_wkt_polygon inverts polygon_wkt exactly on dyadic rings
    (canonical start vertex, closure dropped), and the POINT sentinel
    yields NULL — P8 semantics surviving the parse."""
    import numpy as np
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.functions.polygons import (
        parse_wkt_polygon,
    )
    from wrf_to_geodataframe_spark.geometry.polygons import (
        canonical_ring,
        polygon_wkt,
    )

    rng = np.random.default_rng(0xA11CE)
    polys = []
    for n in (3, 4, 5, 7):
        # random convex-ish dyadic ring: sorted angles around a center
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.integers(1, 64, n) / 16.0
        pts = np.stack([
            np.round(8.0 + r * np.cos(ang), 4),
            np.round(8.0 + r * np.sin(ang), 4),
        ], axis=1)
        # snap to the 2^-4 lattice so the 9-sig-digit WKT is exact
        pts = np.round(pts * 16.0) / 16.0
        polys.append(pts)
    rows = [(i, polygon_wkt(p)) for i, p in enumerate(polys)]
    rows.append((len(polys), "POINT (0 0)"))
    df = spark.createDataFrame(rows, "i long, wkt string")
    out = {
        r.i: r.poly
        for r in df.select(
            "i", parse_wkt_polygon(F.col("wkt")).alias("poly")
        ).collect()
    }
    for i, p in enumerate(polys):
        want = canonical_ring(p)
        got = np.array(out[i])
        assert got.shape == want.shape
        assert (got == want).all(), i  # bit-exact round trip
    assert out[len(polys)] is None  # sentinel -> NULL
