"""Reusable conservative (integral-preserving) rectilinear regrid —
the user-facing operator behind the ``regrid_conservative*`` gates
(SURVEY.md §3.3; the reference's ``delphine/regrid.py:206-330``
pipeline, re-expressed as one DataFrame DAG).

The caller supplies source cells as axis-aligned boxes with a value
column, a destination grid spec (origin + spacing in the same
coordinates), an AREA MEASURE, and a QUANTIZER:

- ``area_fn(x1, y1, x2, y2) -> Column`` decides the weighting
  geometry: planar box areas (``functions/polygons.box_area`` — the
  reference's own degrees^2 convention) or exact ellipsoidal areas
  through a coordinate mapping (``functions/crs.ellipsoid_box_area_m2``
  — the equal-area fix; see ``regrid_conservative_equalarea``).  Any
  ADDITIVE measure conserves mass exactly.
- ``quantize(contrib) -> Column[long]`` pins the per-pair contribution
  to an integer so the distributed sum is order-insensitive (the suite
  discipline; ``floor`` and ``round`` at 1e-6 are both in use).

Plan shape (pinned in tests/test_plans.py): the overlay is an
index-arithmetic EXPLODE over destination indices — each source cell
fans out only to the dest cells its envelope touches, never an
all-pairs join; the A4 kernel is one partial-aggregated shuffle; the
destination grid is generated from the extent aggregate and re-attached
with a broadcast left join + fillna(0).  At 100 TB nothing here holds
state beyond (dest-cell count) rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conservative_regrid_rect(
    src: DataFrame,
    value_col: str,
    ox: float,
    oy: float,
    dw: float,
    dh: float,
    area_fn: Callable[[Column, Column, Column, Column], Column],
    quantize: Callable[[Column], Column],
    q_scale: float,
    pad: float = 0.5,
) -> DataFrame:
    """``src``: (x1, y1, x2, y2, x, y, <value_col>) axis-aligned source
    cells (x/y any cell-identifying point inside, used only for the
    extent).  Returns the destination grid (i, j, dx1, dy1, dx2, dy2,
    <value_col>_t as ``value``) with the conservatively transferred
    value, zero-filled where uncovered."""
    cand = (
        src.withColumn(
            "i",
            F.explode(
                F.sequence(
                    F.floor((F.col("x1") - F.lit(ox)) / F.lit(dw)),
                    F.floor((F.col("x2") - F.lit(ox)) / F.lit(dw)),
                )
            ),
        )
        .withColumn(
            "j",
            F.explode(
                F.sequence(
                    F.floor((F.col("y1") - F.lit(oy)) / F.lit(dh)),
                    F.floor((F.col("y2") - F.lit(oy)) / F.lit(dh)),
                )
            ),
        )
        .withColumn(
            "ix1", F.greatest(F.col("x1"), F.lit(ox) + F.lit(dw) * F.col("i"))
        )
        .withColumn(
            "iy1", F.greatest(F.col("y1"), F.lit(oy) + F.lit(dh) * F.col("j"))
        )
        .withColumn(
            "ix2",
            F.least(F.col("x2"), F.lit(ox) + F.lit(dw) * (F.col("i") + 1)),
        )
        .withColumn(
            "iy2",
            F.least(F.col("y2"), F.lit(oy) + F.lit(dh) * (F.col("j") + 1)),
        )
        .filter((F.col("ix2") > F.col("ix1")) & (F.col("iy2") > F.col("iy1")))
    )
    area_src = area_fn(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"))
    area_int = area_fn(
        F.col("ix1"), F.col("iy1"), F.col("ix2"), F.col("iy2")
    )
    contrib_q = quantize(
        F.col(value_col) / area_src * area_int * F.lit(q_scale)
    )
    transferred = cand.groupBy("i", "j").agg(
        (F.sum(contrib_q).cast("double") / F.lit(q_scale)).alias("value")
    )
    bbox = src.agg(
        F.min("x").alias("xmin"), F.min("y").alias("ymin"),
        F.max("x").alias("xmax"), F.max("y").alias("ymax"),
    )
    dest = (
        bbox.select(
            F.explode(
                F.sequence(
                    F.floor((F.col("xmin") - F.lit(pad) - F.lit(ox)) / F.lit(dw)),
                    F.floor((F.col("xmax") + F.lit(pad) - F.lit(ox)) / F.lit(dw)),
                )
            ).alias("i"),
            "ymin", "ymax",
        )
        .select(
            "i",
            F.explode(
                F.sequence(
                    F.floor((F.col("ymin") - F.lit(pad) - F.lit(oy)) / F.lit(dh)),
                    F.floor((F.col("ymax") + F.lit(pad) - F.lit(oy)) / F.lit(dh)),
                )
            ).alias("j"),
        )
    )
    return (
        dest.join(transferred, ["i", "j"], "left")
        .select(
            "i", "j",
            (F.lit(ox) + F.lit(dw) * F.col("i")).alias("dx1"),
            (F.lit(oy) + F.lit(dh) * F.col("j")).alias("dy1"),
            (F.lit(ox) + F.lit(dw) * (F.col("i") + 1)).alias("dx2"),
            (F.lit(oy) + F.lit(dh) * (F.col("j") + 1)).alias("dy2"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
        )
    )
