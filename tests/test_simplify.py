"""Douglas-Peucker and monotone-chain hull kernels: edge cases the
suite gate's closed-form construction doesn't reach."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wrf_to_geodataframe_spark.geometry.simplify import (
    convex_hull,
    douglas_peucker_mask,
    hull_area_perimeter,
)


def test_dp_degenerate_closed_chord():
    """Equal endpoints (a closed ring as a polyline): distances fall
    back to point distance, the far vertex survives."""
    xs = np.array([0.0, 1.0, 2.0, 0.0])
    ys = np.array([0.0, 3.0, 0.0, 0.0])
    m = douglas_peucker_mask(xs, ys, 0.5)
    assert m[0] and m[-1] and m[1]


def test_dp_short_inputs():
    for n in (0, 1, 2):
        xs = np.arange(n, dtype="float64")
        m = douglas_peucker_mask(xs, xs, 0.1)
        assert len(m) == n and m.sum() == min(n, 2)


def test_dp_nested_retention():
    """A staircase where simplification must recurse on both sides of
    the first split point."""
    xs = np.array([0.0, 1, 2, 3, 4, 5, 6])
    ys = np.array([0.0, 0, 4, 0, 4, 0, 0])
    # eps=1.0: shoulder points (d = 4/sqrt(20) ~ 0.894) drop, peaks
    # (d = 4 and 8/sqrt(32) ~ 1.414) and the valley (d = 4) survive
    m = douglas_peucker_mask(xs, ys, 1.0)
    assert list(np.nonzero(m)[0]) == [0, 2, 3, 4, 6]


@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_hull_contains_all_points_and_is_convex(pts):
    xs = np.array([p[0] for p in pts], dtype="float64")
    ys = np.array([p[1] for p in pts], dtype="float64")
    hx, hy = convex_hull(xs, ys)
    n = len(hx)
    if n >= 3:
        # strictly convex: every consecutive turn is CCW
        for i in range(n):
            o, a, b = i, (i + 1) % n, (i + 2) % n
            cross = (hx[a] - hx[o]) * (hy[b] - hy[o]) - (
                hy[a] - hy[o]
            ) * (hx[b] - hx[o])
            assert cross > 0
        # all input points inside or on the hull (integer-exact)
        for px, py in zip(xs, ys):
            for i in range(n):
                j = (i + 1) % n
                cross = (hx[j] - hx[i]) * (py - hy[i]) - (
                    hy[j] - hy[i]
                ) * (px - hx[i])
                assert cross >= 0


def test_hull_collinear_points_only():
    xs = np.array([0.0, 1, 2, 3])
    ys = np.array([0.0, 1, 2, 3])
    n, area, per = hull_area_perimeter(xs, ys)
    assert area == 0.0
    assert n <= 2 or area == 0.0


def test_hull_exact_square_with_boundary_noise():
    xs = np.array([0.0, 4, 4, 0, 2, 2, 0, 4, 1, 3])
    ys = np.array([0.0, 0, 4, 4, 0, 4, 2, 2, 1, 3])
    n, area, per = hull_area_perimeter(xs, ys)
    assert (n, area, per) == (4, 16.0, 16.0)
