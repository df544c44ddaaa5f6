"""Arbitrary-polygon predicates as pure column expressions.

The rectilinear fast paths live in ``functions/grid.py``; this module
covers the GENERAL case the reference hits when it loads an admin
boundary shapefile (concave London boroughs, ``wrf_voronoi.py:185-188``
``gdf.intersects(...)`` / ``delphine/regrid.py:177`` ``sjoin``): an
even-odd (crossing-number) point-in-polygon test over the engine's
vertex-array wire format ``array<array<double>>``.

Spark-first shape: the whole test is higher-order array functions
(transform / filter / element_at) over the vertex array — JVM-side,
whole-stage codegen, no Python, and directly usable as a join predicate
against a broadcast boundary table.  The numpy twin for Arrow-batch
kernels is ``geometry/polygons.point_in_polygon``.

Semantics note: this is the pure crossing rule — points strictly
inside/outside are classified exactly; a point exactly ON an edge gets
ray-parity (not closed-boundary) semantics.  The Arrow kernel twin is
closed-boundary; queries that must be boundary-exact should keep test
points off edges (or use the kernel).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def point_in_polygon_col(px: Column, py: Column, poly: Column) -> Column:
    """Even-odd containment of point ``(px, py)`` in the simple polygon
    ``poly`` (``array<array<double>>``, any orientation, closure vertex
    optional) as a boolean column expression.

    For each edge (v_i, v_{i+1 mod n}) that straddles the horizontal
    ray at ``py``, count it when the ray-edge intersection lies right
    of ``px``; odd parity = inside.  Horizontal edges never straddle,
    and the straddle test makes shared vertices count exactly once —
    the standard robust formulation (PNPOLY)."""
    n = F.size(poly)

    def _crosses(v: Column, i: Column) -> Column:
        x1, y1 = v.getItem(0), v.getItem(1)
        nxt = F.element_at(poly, ((i + F.lit(1)) % n) + F.lit(1))
        x2, y2 = nxt.getItem(0), nxt.getItem(1)
        straddles = (y1 > py) != (y2 > py)
        # the divide is guarded by `straddles` (y1 != y2 there); on the
        # non-straddling rows it may produce inf/nan, which the AND
        # discards — doubles never raise
        xs = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        return straddles & (px < xs)

    cnt = F.size(F.filter(F.transform(poly, _crosses), lambda b: b))
    return cnt % 2 == F.lit(1)


def polygon_envelope_cols(poly: Column) -> tuple[Column, Column, Column, Column]:
    """(xmin, ymin, xmax, ymax) of a vertex-array polygon as plain
    columns — the bbox pre-filter that runs before any exact predicate
    (SURVEY.md §4.1 'clip-to-bbox early')."""
    xs = F.transform(poly, lambda p: p.getItem(0))
    ys = F.transform(poly, lambda p: p.getItem(1))
    return F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys)


def parse_wkt_polygon(wkt: Column) -> Column:
    """``POLYGON ((x y, x y, ...))`` WKT text -> the engine's vertex
    array wire format ``array<array<double>>`` (open ring: the WKT
    closure vertex is dropped), as a pure column expression.

    The inverse of ``geometry/polygons.polygon_wkt`` — the bridge that
    lets tessellation output (which travels as WKT, the reference's
    ``shapely``-object boundary at ``delphine/regrid.py:146-160``) feed
    the vertex-array overlay/PIP kernels without leaving the JVM.
    Non-polygon WKT (the ``POINT (0 0)`` sentinel for degenerate
    cells) yields NULL — sentinel semantics (P8) survive the parse.

    Exactness: ``polygon_wkt`` prints 9 significant digits, so the
    text->double round trip is exact precisely when vertices carry at
    most 9 significant decimal digits (every dyadic lattice the suite
    builds on); arbitrary doubles round-trip to ~1e-9 relative."""
    body = F.regexp_extract(wkt, r"^POLYGON \(\((.*)\)\)$", 1)
    ring = F.transform(
        F.split(body, ", "),
        lambda s: F.transform(
            F.split(s, " "), lambda t: t.cast("double")
        ),
    )
    # WKT rings repeat the first vertex last — drop the closure
    return F.when(
        body != F.lit(""), F.slice(ring, F.lit(1), F.size(ring) - F.lit(1))
    )
