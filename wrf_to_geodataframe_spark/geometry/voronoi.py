"""Voronoi tessellation (SURVEY.md §2 G1) — the reference's core
capability (``wrf_voronoi.py:19-103`` ``voronoi_finite_polygons_2d``,
invoked at ``:126-137``; also ``haduk_voronoi.py:43-44``,
``delphine/regrid.py:144-145``) re-designed for Spark's execution model.

The reference computes a GLOBAL qhull diagram and then patches the
unbounded regions.  That algorithm needs all points in one memory space
— the exact thing that OOMs it past ~10^6 cells.  This engine uses a
different, decomposable construction:

    per-site half-plane clipping — a site's Voronoi cell (clipped to a
    bounding box) is the bbox intersected with the bisector half-planes
    against its neighbors, processed in increasing distance with the
    SECURITY-RADIUS stop: once the next neighbor is farther than twice
    the site's current max vertex distance R, no remaining point can cut
    the cell, so it is FINAL and provably exact.

Properties that matter here:
- cells are convex and ccw by construction (O2 ordering is free);
- clipping to the bbox replaces the reference's radius-clamp +
  bbox-`within` cleanup (P4) — no infinite regions ever exist;
- the construction is per-site independent given nearby points, which
  is precisely what distributes: tile the plane, replicate each point
  into neighbor tiles within a halo, run the same kernel per tile
  (`applyInPandas`), and certify each cell exact when
  2R <= d(site, tile edge) + halo.  Cells come back with an `exact`
  flag so correctness is checked, not assumed.

Duplicate coordinates degrade to the reference's sentinel convention
(``Point(0, 0)`` for degenerate regions, ``wrf_voronoi.py:134``): only
the first site at a coordinate gets the cell.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from wrf_to_geodataframe_spark.geometry.polygons import (
    bbox_polygon,
    clip_halfplane,
)

DEFAULT_MAX_DRIVER_POINTS = 2_000_000


def _bucket_index(pts: np.ndarray, cell: float):
    """Uniform-grid spatial hash: bucket id per point + bucket -> point
    ids (numpy group-by via argsort)."""
    bx = np.floor(pts[:, 0] / cell).astype(np.int64)
    by = np.floor(pts[:, 1] / cell).astype(np.int64)
    order = np.lexsort((by, bx))
    keys = np.stack([bx[order], by[order]], axis=1)
    uniq, starts = np.unique(keys, axis=0, return_index=True)
    buckets: dict[tuple[int, int], np.ndarray] = {}
    bounds = list(starts) + [len(order)]
    for k in range(len(uniq)):
        buckets[(int(uniq[k, 0]), int(uniq[k, 1]))] = order[bounds[k]:bounds[k + 1]]
    return buckets


def _ring_shell(
    buckets: dict[tuple[int, int], np.ndarray],
    bx: int,
    by: int,
    ring: int,
) -> list[np.ndarray]:
    """Point ids in the perimeter buckets at Chebyshev distance ``ring``
    (the incremental shell — never re-gathers inner rings)."""
    if ring == 0:
        got = buckets.get((bx, by))
        return [got] if got is not None else []
    ids = []
    for i in range(bx - ring, bx + ring + 1):
        for j in (by - ring, by + ring):
            got = buckets.get((i, j))
            if got is not None:
                ids.append(got)
    for j in range(by - ring + 1, by + ring):
        for i in (bx - ring, bx + ring):
            got = buckets.get((i, j))
            if got is not None:
                ids.append(got)
    return ids


def voronoi_cells(
    points: np.ndarray,
    bbox: tuple[float, float, float, float],
    spacing_hint: float | None = None,
    site_mask: np.ndarray | None = None,
) -> list[np.ndarray]:
    """Clipped Voronoi cell (ccw vertex array) per input site.

    Exact for every site: neighbors stream in increasing distance and
    clipping stops at the security radius.  The bucket grid makes the
    expected per-site cost O(#near neighbors), so the whole kernel is
    ~O(n) for grid-like data (vs the reference's global qhull).
    Degenerate sites (duplicates) get an empty array (sentinel).

    ``site_mask`` restricts which sites get cells BUILT (all points
    still act as neighbors) — the tile+halo path only builds home-tile
    cells, skipping halo sites whose (discarded, artificially huge)
    cells would dominate the cost."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n == 0:
        return []
    xmin, ymin, xmax, ymax = bbox
    if spacing_hint is None:
        # ~one point per bucket for uniformish data
        span = max(xmax - xmin, ymax - ymin, 1e-9)
        spacing_hint = span / max(np.sqrt(n), 1.0)
    cell_size = max(spacing_hint, 1e-12)
    buckets = _bucket_index(pts, cell_size)
    diag2 = (xmax - xmin) ** 2 + (ymax - ymin) ** 2
    bkeys = np.array(list(buckets.keys()), dtype=np.int64)
    bminx, bminy = bkeys.min(axis=0)
    bmaxx, bmaxy = bkeys.max(axis=0)

    # sentinel for all-but-first duplicate coordinates
    _, first_idx = np.unique(pts, axis=0, return_index=True)
    keep = np.zeros(n, dtype=bool)
    keep[first_idx] = True

    base = bbox_polygon(xmin, ymin, xmax, ymax)
    empty = np.empty((0, 2), dtype=np.float64)
    out: list[np.ndarray] = [empty] * n
    build = range(n) if site_mask is None else np.nonzero(site_mask)[0]
    for i in build:
        p = pts[i]
        if not keep[i] or not (xmin <= p[0] <= xmax and ymin <= p[1] <= ymax):
            continue
        bx = int(np.floor(p[0] / cell_size))
        by = int(np.floor(p[1] / cell_size))
        poly = base
        done = False
        seen_upto = 0.0  # squared distance horizon covered so far
        pool: list[np.ndarray] = []  # accumulated candidate shells
        ring = 0
        while not done:
            pool.extend(_ring_shell(buckets, bx, by, ring))
            # once the ring square covers every occupied bucket, the
            # candidate pool is the complete point set — no horizon left
            covers_all = (
                bx - ring <= bminx
                and bx + ring >= bmaxx
                and by - ring <= bminy
                and by + ring >= bmaxy
            )
            ring_r = ring * cell_size
            complete2 = diag2 + 1.0 if covers_all else ring_r * ring_r
            cand = (
                np.concatenate(pool) if pool else np.empty(0, dtype=np.int64)
            )
            cand = cand[cand != i]
            d2 = np.sum((pts[cand] - p) ** 2, axis=1)
            # only neighbors inside the guaranteed-complete radius are
            # processed now; farther candidates wait for the next shell
            # so increasing-distance order is never violated
            sel = (d2 >= seen_upto) & (d2 <= complete2)
            order = np.argsort(d2[sel], kind="stable")
            for j, d2j in zip(cand[sel][order], d2[sel][order]):
                if len(poly) == 0:
                    done = True
                    break
                if d2j <= 0.0:
                    # squared distance underflowed to zero: effectively
                    # coincident sites — lowest index wins, others get
                    # the sentinel (reference's Point(0,0) convention)
                    if j < i:
                        poly = empty
                        done = True
                        break
                    continue
                r2 = max(np.sum((poly - p) ** 2, axis=1).max(), 0.0)
                if d2j > 4.0 * r2:
                    done = True  # security radius: cell is final
                    break
                q = pts[j]
                mid = 0.5 * (p + q)
                a, b = q - p
                poly = clip_halfplane(poly, a, b, a * mid[0] + b * mid[1])
            if done:
                break
            if covers_all:
                done = True  # complete pool processed: cell is final
            elif len(poly) > 0:
                r2 = np.sum((poly - p) ** 2, axis=1).max()
                if complete2 > 4.0 * r2:
                    done = True  # every point that could cut was seen
            seen_upto = complete2
            ring += 1
        out[i] = poly if len(poly) >= 3 else empty
    return out


def cells_exactness_radius(
    points: np.ndarray, cells: Sequence[np.ndarray]
) -> np.ndarray:
    """Per-site 2R (twice the max site-to-vertex distance): a cell built
    from a point subset is certainly exact if every absent point is
    farther than this from the site."""
    out = np.zeros(len(points), dtype=np.float64)
    for i, (p, poly) in enumerate(zip(np.asarray(points, float), cells)):
        if len(poly) >= 3:
            out[i] = 2.0 * float(np.sqrt(np.sum((poly - p) ** 2, axis=1).max()))
        else:
            out[i] = np.inf
    return out
