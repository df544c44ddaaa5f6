"""Convex-polygon kernels in pure numpy (no shapely/GEOS in this
container; these are the engine's geometry scalar functions, SURVEY.md
§2 G3-G7/G10-G11, executed inside Arrow batches).

Polygons are (n, 2) float64 arrays with counter-clockwise vertex order
(O2 ordering is an invariant here, not a post-pass).  All kernels are
convex-only — every polygon this engine produces (Voronoi cells, their
clips) is convex by construction.
"""

from __future__ import annotations

import numpy as np


def bbox_polygon(xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
    """Axis-aligned rectangle as a ccw polygon (G5)."""
    return np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]], dtype=np.float64
    )


def clip_halfplane(poly: np.ndarray, a: float, b: float, c: float) -> np.ndarray:
    """Sutherland–Hodgman step: intersect a convex ccw polygon with the
    half-plane ``a*x + b*y <= c``; returns a ccw polygon (possibly empty).
    """
    n = len(poly)
    if n == 0:
        return poly
    side = poly @ np.array([a, b]) - c  # <=0 is inside
    out: list[np.ndarray] = []
    for i in range(n):
        j = (i + 1) % n
        pi, pj = poly[i], poly[j]
        si, sj = side[i], side[j]
        if si <= 0.0:
            out.append(pi)
            if sj > 0.0:  # leaving: emit the crossing point
                t = si / (si - sj)
                out.append(pi + t * (pj - pi))
        elif sj <= 0.0:  # entering
            t = si / (si - sj)
            out.append(pi + t * (pj - pi))
    return np.asarray(out, dtype=np.float64).reshape(-1, 2)


def shoelace_area(poly: np.ndarray) -> float:
    """Signed-area magnitude of a ccw polygon (G7)."""
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(
        np.abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    )


def polygon_centroid(poly: np.ndarray) -> tuple[float, float]:
    """Area centroid of a ccw polygon (A7 analog)."""
    if len(poly) < 3:
        if len(poly) == 0:
            return (float("nan"), float("nan"))
        return (float(poly[:, 0].mean()), float(poly[:, 1].mean()))
    x, y = poly[:, 0], poly[:, 1]
    xr, yr = np.roll(x, -1), np.roll(y, -1)
    cross = x * yr - xr * y
    a = cross.sum() / 2.0
    if a == 0.0:
        return (float(x.mean()), float(y.mean()))
    cx = float(((x + xr) * cross).sum() / (6.0 * a))
    cy = float(((y + yr) * cross).sum() / (6.0 * a))
    return (cx, cy)


def point_in_convex_polygon(px: float, py: float, poly: np.ndarray) -> bool:
    """G10 containment for a ccw convex polygon (boundary counts in)."""
    n = len(poly)
    if n < 3:
        return False
    for i in range(n):
        j = (i + 1) % n
        ex, ey = poly[j] - poly[i]
        qx, qy = px - poly[i][0], py - poly[i][1]
        if ex * qy - ey * qx < -1e-12:
            return False
    return True


def is_ccw(poly: np.ndarray) -> bool:
    """O2 orientation check via the signed shoelace sum."""
    if len(poly) < 3:
        return True
    x, y = poly[:, 0], poly[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) >= 0.0


def canonical_ring(poly: np.ndarray) -> np.ndarray:
    """Rotate a ring so the lexicographically smallest (x, y) vertex is
    first — ccw order preserved; makes WKT stable for golden tests."""
    if len(poly) < 3:
        return poly
    k = int(np.lexsort((poly[:, 1], poly[:, 0]))[0])
    return np.roll(poly, -k, axis=0)


def polygon_wkt(poly: np.ndarray, decimals: int = 9) -> str:
    """WKT encoding (closed ring, canonical start vertex); POINT for
    degenerate cells — mirroring the reference's Point(0,0) sentinel
    convention (wrf_voronoi.py:130-137)."""
    if len(poly) < 3:
        return "POINT (0 0)"
    pts = canonical_ring(np.round(poly, decimals))
    ring = ", ".join(f"{p[0]:.{decimals}g} {p[1]:.{decimals}g}" for p in pts)
    first = f"{pts[0][0]:.{decimals}g} {pts[0][1]:.{decimals}g}"
    return f"POLYGON (({ring}, {first}))"
