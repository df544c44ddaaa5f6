"""Polyline simplification (Douglas-Peucker) and convex hull (Andrew
monotone chain) — the two vector-geometry utilities a reference user
reaches for between the regrid and the map (``shapely.simplify`` /
``unary_union().convex_hull`` in the geopandas workflow, cf.
wrf_voronoi.py:149's GPKG hand-off to plotting tools): pure-numpy
kernels shaped for Arrow batches, like the rest of geometry/.

Both kernels are exact over lattice inputs (cross products of
integer-scaled coordinates), which is what lets the suite gate them
against closed-form DuckDB oracles instead of a geometry library.
"""

from __future__ import annotations

import numpy as np


def douglas_peucker_mask(
    xs: np.ndarray, ys: np.ndarray, eps: float
) -> np.ndarray:
    """Boolean keep-mask of the Douglas-Peucker simplification of the
    polyline ``(xs, ys)`` with tolerance ``eps`` (strictly-greater
    retention: a vertex survives iff its perpendicular distance to the
    current chord exceeds ``eps``).  Iterative stack — no recursion
    limit on pathological inputs; endpoints always survive."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    xs = np.asarray(xs, dtype="float64")
    ys = np.asarray(ys, dtype="float64")
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = slice(a + 1, b)
        dx, dy = xs[b] - xs[a], ys[b] - ys[a]
        L2 = dx * dx + dy * dy
        if L2 == 0.0:  # degenerate chord: distance to the point
            d2 = (xs[seg] - xs[a]) ** 2 + (ys[seg] - ys[a]) ** 2
        else:
            cross = (xs[seg] - xs[a]) * dy - (ys[seg] - ys[a]) * dx
            d2 = cross * cross / L2
        i = int(np.argmax(d2))
        if d2[i] > eps * eps:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def convex_hull(
    xs: np.ndarray, ys: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Convex hull of a point set by Andrew's monotone chain, returned
    CCW starting from the lexicographically smallest vertex, STRICT
    turns (collinear boundary points are not hull vertices — the
    shapely convention).  Duplicate points are deduplicated first."""
    pts = np.unique(
        np.stack(
            [np.asarray(xs, "float64"), np.asarray(ys, "float64")],
            axis=1,
        ),
        axis=0,
    )  # sorted lexicographically by (x, y)
    n = len(pts)
    if n <= 2:
        return pts[:, 0], pts[:, 1]

    def _chain(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (
                    p[0] - o[0]
                ) <= 0:  # clockwise or collinear: drop
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = _chain(pts)
    upper = _chain(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return hull[:, 0], hull[:, 1]


def hull_area_perimeter(
    xs: np.ndarray, ys: np.ndarray
) -> tuple[int, float, float]:
    """(n_hull_vertices, shoelace area, perimeter) of the convex hull
    of a point set — the summary triple the suite gate checks."""
    hx, hy = convex_hull(xs, ys)
    n = len(hx)
    if n < 3:
        return n, 0.0, float(
            2.0 * np.hypot(hx[-1] - hx[0], hy[-1] - hy[0]) if n == 2
            else 0.0
        )
    area = 0.5 * float(
        np.sum(hx * np.roll(hy, -1) - np.roll(hx, -1) * hy)
    )
    per = float(np.sum(np.hypot(np.roll(hx, -1) - hx,
                                np.roll(hy, -1) - hy)))
    return n, abs(area), per


def simplify_lines(df, eps: float, x_col: str = "xs", y_col: str = "ys"):
    """Distributed polyline simplification: every row's
    ``array<double>`` vertex columns are replaced by their
    Douglas-Peucker simplification — one Arrow batch per task, zero
    shuffles (a pure map over however the lines are already
    partitioned; 100 TB of line geometries simplify at scan
    parallelism)."""
    import pandas as pd

    cols = df.columns
    schema = df.schema

    def _run(it):
        for pdf in it:
            xs_out, ys_out = [], []
            for xs, ys in zip(pdf[x_col], pdf[y_col]):
                xs = np.asarray(xs, "float64")
                ys = np.asarray(ys, "float64")
                m = douglas_peucker_mask(xs, ys, eps)
                xs_out.append(xs[m])
                ys_out.append(ys[m])
            out = pdf.copy()
            out[x_col] = xs_out
            out[y_col] = ys_out
            yield out[cols]

    return df.mapInPandas(_run, schema)


def hull_summary(df, x_col: str = "xs", y_col: str = "ys"):
    """Distributed convex-hull summary: per row (one point set per
    row), append ``n_hull``, ``hull_area``, ``hull_perimeter``.  Same
    zero-shuffle map shape as :func:`simplify_lines`."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    cols = df.columns
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("n_hull", LongType()),
            StructField("hull_area", DoubleType()),
            StructField("hull_perimeter", DoubleType()),
        ]
    )

    def _run(it):
        for pdf in it:
            ns, areas, pers = [], [], []
            for xs, ys in zip(pdf[x_col], pdf[y_col]):
                n, a, p = hull_area_perimeter(
                    np.asarray(xs, "float64"), np.asarray(ys, "float64")
                )
                ns.append(n)
                areas.append(a)
                pers.append(p)
            out = pdf.copy()
            out["n_hull"] = pd.array(ns, dtype="int64")
            out["hull_area"] = areas
            out["hull_perimeter"] = pers
            yield out[cols + ["n_hull", "hull_area", "hull_perimeter"]]

    return df.mapInPandas(_run, schema)
