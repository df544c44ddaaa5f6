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
the first site at a coordinate gets the cell.  NEAR-coincident sites —
within ``NEAR_DUP_EPS * (1 + bbox diagonal)`` of each other (L-inf,
chained) — are canonicalized onto that same path before any clipping
(hypothesis r14: separations ~1e-160 square to 0.0 in one pair's
|p-q|^2 but not another's, so one site was sentineled as a duplicate
while a third still clipped against it as distinct, leaving an
unclaimed sliver).  The exactness claim is therefore: exact for the
SNAPPED site set.  An isolated near-dup pair moves by at most eps; a
CHAIN-linked k-site cluster can move its far members by the cluster
span (up to ~k*eps, still ~1e-11 of the domain for any realistic k) —
boundaries shift by no more than that span.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from wrf_to_geodataframe_spark.geometry.polygons import (
    bbox_polygon,
    clip_halfplane,
    point_in_convex_polygon,
)

DEFAULT_MAX_DRIVER_POINTS = 2_000_000

# near-duplicate site snapping threshold, as a fraction of the bbox
# diagonal (see the module docstring and _snap_near_duplicates)
NEAR_DUP_EPS = 1e-12


def _snap_near_duplicates(pts: np.ndarray, snap: float) -> np.ndarray:
    """Canonicalize NEAR-coincident sites (hypothesis r14 regression):
    every cluster of sites within ``snap`` of each other (L-inf,
    chain-linked) collapses onto its lowest-index member BEFORE any
    bisector is built, so all neighbors see one canonical coordinate and
    the existing exact-duplicate sentinel convention applies
    consistently.  Without this, a pair whose squared separation
    underflows to 0.0 is treated as duplicate while a third site still
    clips against both members as distinct — inconsistent half-planes
    that leave a sliver of the bbox unclaimed.

    Detection is the 4-shifted-grid trick: with cell size ``4*snap`` and
    the four ``(0 | 2*snap)`` origin shifts, any pair within ``2*snap``
    shares a cell in at least one grid (1-D: values in different cells
    of one grid straddle its boundary, hence both lie in the shifted
    cell centered on that boundary); candidates are then linked by the
    exact ``L-inf <= snap`` test, so grid placement never decides
    membership (the 2x detection margin absorbs the ~1e-16-relative
    floor noise).  The common no-near-dup case costs four key builds and
    returns the input array unchanged, no copy — which keeps every
    existing cell bit-identical on ordinary inputs."""
    n = len(pts)
    if n < 2 or not (np.isfinite(snap) and snap > 0.0):
        return pts
    cell = 4.0 * snap
    x0, y0 = pts[:, 0].min(), pts[:, 1].min()
    invs: list[np.ndarray] = []
    cand = np.zeros(n, dtype=bool)
    for sx in (0.0, 2.0 * snap):
        for sy in (0.0, 2.0 * snap):
            kx = np.floor((pts[:, 0] - x0 + sx) / cell)
            ky = np.floor((pts[:, 1] - y0 + sy) / cell)
            # complex key = exact (kx, ky) pair compare in one flat unique
            _, inv, cnts = np.unique(
                kx + 1j * ky, return_inverse=True, return_counts=True
            )
            dup = cnts[inv] > 1
            if dup.any():
                cand |= dup
                invs.append(inv)
    if not cand.any():
        return pts

    # EXACT duplicates collapse vectorially BEFORE the pairwise loop:
    # a large coincident pile-up (every copy colliding in one cell)
    # must not pay the O(k^2) Python loop — one np.unique reduces it
    # to a single representative row, and the recursion (depth 1: the
    # unique rows carry no exact duplicates) handles any remaining
    # NEAR-duplicates among the distinct coordinates.  The cluster's
    # canonical coordinate is then the lexicographically smallest
    # member — deterministic under row order and tile subsetting; the
    # sentinel WINNER is still decided by lowest original index in
    # voronoi_cells' keep mask, unchanged.
    uniq, inverse = np.unique(pts, axis=0, return_inverse=True)
    inverse = inverse.reshape(-1)  # numpy <2.1 returns (n, 1) for axis=0
    if len(uniq) < n:
        snapped_u = _snap_near_duplicates(uniq, snap)
        if snapped_u is uniq:
            return pts
        return snapped_u[inverse]

    parent = np.arange(n)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = int(parent[a])
        return a

    idxs = np.nonzero(cand)[0]
    for inv in invs:
        order = np.argsort(inv[idxs], kind="stable")
        g = idxs[order]
        vals = inv[g]
        starts = np.nonzero(np.r_[True, vals[1:] != vals[:-1]])[0]
        bounds = np.r_[starts, len(g)]
        for a, b in zip(bounds[:-1], bounds[1:]):
            grp = g[a:b]
            # pairwise within one 4*snap cell: members of a colliding
            # cell are near-dups (or near-misses) by construction, so
            # the quadratic term only pays where merging happens anyway
            for u in range(1, len(grp)):
                for v in range(u):
                    p, q = int(grp[v]), int(grp[u])
                    if (
                        abs(pts[p, 0] - pts[q, 0]) <= snap
                        and abs(pts[p, 1] - pts[q, 1]) <= snap
                    ):
                        rp, rq = find(p), find(q)
                        if rp != rq:
                            # lower root wins: the representative is
                            # always the cluster's lowest original index
                            if rp < rq:
                                parent[rq] = rp
                            else:
                                parent[rp] = rq
    roots = np.array([find(int(i)) for i in idxs], dtype=np.int64)
    moved = roots != idxs
    if not moved.any():
        return pts
    out = pts.copy()
    out[idxs[moved]] = pts[roots[moved]]
    return out


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


def _clip_batch(P, cnt, a, b, c):
    """Vectorized Sutherland–Hodgman step: clip every padded ccw polygon
    ``P[s, :cnt[s]]`` by its own half-plane a[s]*x + b[s]*y <= c[s].
    Returns (P', cnt') with width grown by at most one column."""
    S, V, _ = P.shape
    idx = np.arange(V)
    vmask = idx[None, :] < cnt[:, None]
    side = a[:, None] * P[..., 0] + b[:, None] * P[..., 1] - c[:, None]
    side = np.where(vmask, side, 1.0)
    jidx = np.where(idx[None, :] + 1 < cnt[:, None], idx[None, :] + 1, 0)
    Pn = np.take_along_axis(P, jidx[..., None], axis=1)
    sn = np.take_along_axis(side, jidx, axis=1)
    inside_i = side <= 0.0
    inside_n = sn <= 0.0
    denom = side - sn
    denom = np.where(denom == 0.0, 1.0, denom)
    t = side / denom
    X = P + t[..., None] * (Pn - P)
    emitV = inside_i & vmask
    emitX = (inside_i ^ inside_n) & vmask
    out = np.empty((S, 2 * V, 2), dtype=np.float64)
    out[:, 0::2] = P
    out[:, 1::2] = X
    mask = np.empty((S, 2 * V), dtype=bool)
    mask[:, 0::2] = emitV
    mask[:, 1::2] = emitX
    order = np.argsort(~mask, axis=1, kind="stable")
    out = np.take_along_axis(out, order[..., None], axis=1)
    newcnt = mask.sum(axis=1)
    width = max(int(newcnt.max()), 3) if len(newcnt) else 3
    return out[:, :width], newcnt


def _batch_cells(
    pts: np.ndarray,
    sites: np.ndarray,
    bbox: tuple[float, float, float, float],
    cell_size: float,
    max_rounds: int = 24,
):
    """Vectorized fast path: build every site's cell simultaneously from
    its 5x5-bucket candidate neighborhood — M clip rounds of whole-array
    numpy ops instead of a Python loop per site.  Returns
    (ok, cells, sentinel): ``ok[k]`` certifies site ``sites[k]`` exact
    (others must go through the exact per-site loop)."""
    xmin, ymin, xmax, ymax = bbox
    n = len(pts)
    bx = np.floor(pts[:, 0] / cell_size).astype(np.int64)
    by = np.floor(pts[:, 1] / cell_size).astype(np.int64)
    bminx, bminy = bx.min(), by.min()
    W = int(bx.max() - bminx) + 1
    H = int(by.max() - bminy) + 1
    if W * H > 8 * n + 64:
        return None  # bucket space too sparse for the dense-grid layout
    key = (bx - bminx) * H + (by - bminy)
    occ = np.bincount(key, minlength=W * H)
    L = int(occ.max())
    if L > 16:
        return None  # pathological duplicate pile-ups: loop handles them
    slots = np.full((W * H + 1, L), -1, dtype=np.int64)
    order = np.argsort(key, kind="stable")
    starts = np.zeros(W * H, dtype=np.int64)
    starts[1:] = np.cumsum(occ)[:-1]
    slot_pos = np.arange(n) - starts[key[order]]
    slots[key[order], slot_pos] = order

    # candidate matrix from the 5x5 neighborhood (complete within 2*cell)
    offs = [(dx, dy) for dx in range(-2, 3) for dy in range(-2, 3)]
    S = len(sites)
    sbx, sby = bx[sites] - bminx, by[sites] - bminy
    nkeys = np.empty((S, len(offs)), dtype=np.int64)
    for k, (dx, dy) in enumerate(offs):
        cx, cy = sbx + dx, sby + dy
        ok = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
        nkeys[:, k] = np.where(ok, cx * H + cy, W * H)
    cand = slots[nkeys].reshape(S, -1)  # (S, 25*L)
    ps = pts[sites]
    valid = (cand >= 0) & (cand != sites[:, None])
    d2 = np.sum((pts[np.where(cand >= 0, cand, 0)] - ps[:, None, :]) ** 2, axis=2)
    d2 = np.where(valid, d2, np.inf)
    dup = valid & (d2 <= 0.0)
    sentinel = (dup & (cand < sites[:, None])).any(axis=1)
    inside = (
        (ps[:, 0] >= xmin) & (ps[:, 0] <= xmax)
        & (ps[:, 1] >= ymin) & (ps[:, 1] <= ymax)
    )
    sentinel |= ~inside
    d2 = np.where(dup, np.inf, d2)

    C = d2.shape[1]
    M = min(max_rounds, C)
    part = np.argpartition(d2, M - 1, axis=1)[:, :M] if M < C else np.argsort(d2, axis=1)
    dM = np.take_along_axis(d2, part, axis=1)
    rord = np.argsort(dM, axis=1, kind="stable")
    slots_sorted = np.take_along_axis(part, rord, axis=1)
    # slot indices -> point ids (cand holds the point id per slot)
    nbr = np.take_along_axis(
        np.where(cand >= 0, cand, 0), slots_sorted, axis=1
    )
    nd2 = np.take_along_axis(dM, rord, axis=1)  # (S, M) ascending
    d_next2 = (
        np.partition(d2, M, axis=1)[:, M] if M < C else np.full(S, np.inf)
    )
    horizon2 = (2.0 * cell_size) ** 2
    cover2 = np.minimum(d_next2, horizon2)

    base = bbox_polygon(xmin, ymin, xmax, ymax)
    P = np.broadcast_to(base, (S, 4, 2)).copy()
    cnt = np.full(S, 4, dtype=np.int64)
    finished = sentinel.copy()
    for j in range(M):
        act = ~finished & np.isfinite(nd2[:, j])
        if not act.any():
            break
        vm = np.arange(P.shape[1])[None, :] < cnt[:, None]
        vd2 = np.where(vm, np.sum((P - ps[:, None, :]) ** 2, axis=2), 0.0)
        r2 = vd2.max(axis=1)
        # security stop must also account for points ABSENT from the 5x5
        # candidate neighborhood: they are only guaranteed farther than
        # the horizon, so the nearest unprocessed distance is the min
        newly_done = act & (np.minimum(nd2[:, j], horizon2) > 4.0 * r2)
        finished |= newly_done
        act &= ~newly_done
        if not act.any():
            continue
        q = pts[nbr[:, j]]
        a = np.where(act, q[:, 0] - ps[:, 0], 0.0)
        b = np.where(act, q[:, 1] - ps[:, 1], 0.0)
        mid = 0.5 * (ps + q)
        c = np.where(act, a * mid[:, 0] + b * mid[:, 1], 1.0)
        P, cnt = _clip_batch(P, cnt, a, b, c)

    vm = np.arange(P.shape[1])[None, :] < cnt[:, None]
    vd2 = np.where(vm, np.sum((P - ps[:, None, :]) ** 2, axis=2), 0.0)
    r2 = vd2.max(axis=1)
    ok = finished | (4.0 * r2 <= cover2)
    ok[sentinel] = True  # sentinels are trivially final
    eps = 1e-9 * (1.0 + np.sqrt((xmax - xmin) ** 2 + (ymax - ymin) ** 2))
    cells: list[np.ndarray] = []
    empty = np.empty((0, 2), dtype=np.float64)
    for k in range(S):
        if sentinel[k] or cnt[k] < 3:
            cells.append(empty)
        else:
            cells.append(_dedup_ring(P[k, : cnt[k]].copy(), eps, ps[k]))
    return ok, cells, sentinel


def _dedup_ring(
    poly: np.ndarray, eps: float, site: np.ndarray | None = None
) -> np.ndarray:
    """Drop near-duplicate consecutive vertices (cyclic).  Clip
    intersections computed on long edges carry ~1e-15 relative error, so
    a later bisector tangent to a vertex can emit the vertex AND an
    epsilon-away crossing point; which pair appears depends on the
    neighbor tie-order, making tile-distributed output differ from the
    driver run by phantom vertices unless normalized here.

    ``site`` guards legitimately-thin cells: merging vertices moves the
    boundary by up to ``eps``, which can evict a site that sits closer
    than ``eps`` to its cell wall (near-coincident neighbors).  If the
    merged ring no longer contains the site, the original ring is kept —
    a deterministic function of the input, so both tessellation paths
    agree."""
    n = len(poly)
    if n < 3:
        return poly
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        j = (i + 1) % n
        if keep[i] and abs(poly[j, 0] - poly[i, 0]) <= eps and abs(
            poly[j, 1] - poly[i, 1]
        ) <= eps:
            keep[j] = False
    out = poly[keep]
    if len(out) < 3:
        return np.empty((0, 2), dtype=np.float64)
    if (
        site is not None
        and len(out) < n
        and not point_in_convex_polygon(site[0], site[1], out)
    ):
        out = poly
    # enforce the ccw invariant (O2) explicitly: clipping preserves
    # orientation for any non-degenerate cell, but an (essentially)
    # zero-area sliver from near-coincident sites can come out with a
    # negative FP signed area — found by hypothesis at denormal scales
    x, y = out[:, 0], out[:, 1]
    if float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) < 0.0:
        out = out[::-1].copy()
    return out


def voronoi_cells(
    points: np.ndarray,
    bbox: tuple[float, float, float, float],
    spacing_hint: float | None = None,
    site_mask: np.ndarray | None = None,
) -> list[np.ndarray]:
    """Clipped Voronoi cell (ccw vertex array) per input site.

    Two physical strategies for one exact semantics:
    - a VECTORIZED batch pass builds all cells simultaneously (M
      sorted-neighbor clip rounds over padded arrays — whole-array numpy
      ops, no per-site Python loop) and certifies each cell with the
      security-radius criterion;
    - sites the batch pass cannot certify (sparse regions, elongated
      boundary cells, duplicate pile-ups) fall back to the per-site
      streaming loop, which is exact for every site: neighbors stream in
      increasing distance and clipping stops at the security radius.

    Degenerate sites (duplicates, outside-bbox) get an empty array
    (sentinel).  ``site_mask`` restricts which sites get cells BUILT
    (all points still act as neighbors) — the tile+halo path only
    builds home-tile cells, skipping halo sites whose (discarded,
    artificially huge) cells would dominate the cost."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n == 0:
        return []
    xmin, ymin, xmax, ymax = bbox
    diag2 = (xmax - xmin) ** 2 + (ymax - ymin) ** 2
    # near-coincident sites collapse onto their cluster's lowest-index
    # member so every bisector sees the same canonical coordinate (the
    # no-op path returns the same array: ordinary inputs are untouched)
    pts = _snap_near_duplicates(pts, NEAR_DUP_EPS * (1.0 + np.sqrt(diag2)))
    if spacing_hint is None:
        # ~one point per bucket for uniformish data
        span = max(xmax - xmin, ymax - ymin, 1e-9)
        spacing_hint = span / max(np.sqrt(n), 1.0)
    cell_size = max(spacing_hint, 1e-12)
    buckets = _bucket_index(pts, cell_size)
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
    _ring_eps = 1e-9 * (1.0 + np.sqrt(diag2))
    build = (
        np.arange(n) if site_mask is None else np.nonzero(site_mask)[0]
    )

    # escalating batch passes: tight buckets certify lattice-like sites
    # cheaply; a wider second pass (horizon 4 x spacing) catches most of
    # the rest; anything still uncertified goes through the exact loop
    for mult in (1.0, 2.0):
        if len(build) < 64:
            break
        got = _batch_cells(pts, build, bbox, cell_size * mult)
        if got is None:
            break
        ok, cells, _sent = got
        for k in np.nonzero(ok)[0]:
            out[build[k]] = cells[k]
        build = build[~ok]  # uncertified sites continue down

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
            if ring > 8 and not done:
                # site borders a large empty region (cell far bigger than
                # the bucket spacing): ring-walking would crawl across
                # thousands of empty buckets.  Switch to one vectorized
                # distance sort over ALL points, then screen candidates
                # in chunks — a candidate can only change the cell if
                # some CURRENT vertex lies on its far side, and the cell
                # only shrinks, so screened-out candidates stay out.
                d2all = np.sum((pts - p) ** 2, axis=1)
                order_all = np.argsort(d2all, kind="stable")
                order_all = order_all[d2all[order_all] >= seen_upto]
                order_all = order_all[order_all != i]
                dups = order_all[d2all[order_all] <= 0.0]
                if (dups < i).any():
                    poly = empty
                order_all = order_all[d2all[order_all] > 0.0]
                k = 0
                while k < len(order_all) and len(poly) > 0:
                    r2 = np.sum((poly - p) ** 2, axis=1).max()
                    if d2all[order_all[k]] > 4.0 * r2:
                        break  # security radius: sorted order ⇒ final
                    chunk = order_all[k:k + 512]
                    q = pts[chunk]
                    ab = q - p  # (C, 2)
                    cc = np.einsum("cd,cd->c", ab, 0.5 * (p + q))
                    side = ab @ poly.T - cc[:, None]  # (C, V)
                    for j in chunk[(side > 0.0).any(axis=1)]:
                        qj = pts[j]
                        mid = 0.5 * (p + qj)
                        a, b = qj - p
                        poly = clip_halfplane(
                            poly, a, b, a * mid[0] + b * mid[1]
                        )
                        if len(poly) == 0:
                            break
                    k += 512
                done = True
        out[i] = _dedup_ring(poly, _ring_eps, p) if len(poly) >= 3 else empty
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
