"""General polygon overlay intersection (SURVEY.md §2 J4,
``delphine/regrid.py:267-270`` ``gpd.overlay(gdf_pop, gdf_grid,
"intersection")``) for CONVEX polygons (every polygon this engine
produces — Voronoi cells and their clips — is convex).

Distributed shape (§4.1 bucket decomposition):

1. each side derives its envelope from the vertex array (plain array
   expressions) and EXPLODES to every integer bucket the envelope
   touches — the spatial-index replacement;
2. candidates come from the bucket EQUI join; a pair appearing in many
   shared buckets is kept exactly once by the REFERENCE-POINT rule (only
   the bucket containing the envelope-intersection's lower-left corner
   reports it) — dedup without a distinct shuffle;
3. an Arrow-batched kernel (mapInPandas) runs Sutherland–Hodgman
   convex-vs-convex clipping per candidate and emits the intersection
   area (+ WKT), filtered to area > 0.

Polygons travel as ``array<array<double>>`` columns (ccw vertex lists) —
the engine's geometry wire format next to WKT.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.geometry.polygons import (
    clip_halfplane,
    polygon_wkt,
    shoelace_area,
)


def convex_clip_polygon(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two convex ccw polygons: clip ``a`` by every edge
    half-plane of ``b`` (G6 general form)."""
    poly = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    nb = len(b)
    for k in range(nb):
        if len(poly) == 0:
            break
        x1, y1 = b[k]
        x2, y2 = b[(k + 1) % nb]
        # inside of a ccw edge is the left side: (e x (p - v1)) >= 0
        # as a half-plane a*x + b*y <= c with (a, b) = (ey, -ex)
        ex, ey = x2 - x1, y2 - y1
        poly = clip_halfplane(poly, ey, -ex, ey * x1 - ex * y1)
    return poly


def _env(poly: Column, idx: int, agg: str) -> Column:
    comp = F.transform(poly, lambda p: F.element_at(p, idx + 1))
    return F.array_min(comp) if agg == "min" else F.array_max(comp)


def with_envelope(df: DataFrame, poly_col: str, prefix: str = "env_") -> DataFrame:
    """Attach envelope columns derived from the vertex array (G5)."""
    p = F.col(poly_col)
    return (
        df.withColumn(prefix + "x1", _env(p, 0, "min"))
        .withColumn(prefix + "y1", _env(p, 1, "min"))
        .withColumn(prefix + "x2", _env(p, 0, "max"))
        .withColumn(prefix + "y2", _env(p, 1, "max"))
    )


def _bucketed(df: DataFrame, bucket: float, side: str) -> DataFrame:
    b = F.lit(float(bucket))
    return df.withColumn(
        "bx",
        F.explode(
            F.sequence(
                F.floor(F.col(f"{side}x1") / b), F.floor(F.col(f"{side}x2") / b)
            )
        ),
    ).withColumn(
        "by",
        F.explode(
            F.sequence(
                F.floor(F.col(f"{side}y1") / b), F.floor(F.col(f"{side}y2") / b)
            )
        ),
    )


def overlay_intersection(
    a_df: DataFrame,
    b_df: DataFrame,
    a_poly: str = "a_poly",
    b_poly: str = "b_poly",
    bucket: float = 2.0,
    keep_wkt: bool = False,
) -> DataFrame:
    """All intersecting pairs of two convex-polygon tables with the
    intersection area (and optionally WKT) attached.

    ``a_df``/``b_df`` carry their own key columns plus the vertex-array
    polygon column; all non-polygon columns pass through."""
    a = with_envelope(a_df, a_poly, "a_env_")
    b = with_envelope(b_df, b_poly, "b_env_")
    ab = _bucketed(a, bucket, "a_env_")
    bb = _bucketed(b, bucket, "b_env_")
    joined = ab.join(bb, ["bx", "by"])
    # envelopes must overlap at all
    joined = joined.filter(
        (F.col("a_env_x1") <= F.col("b_env_x2"))
        & (F.col("b_env_x1") <= F.col("a_env_x2"))
        & (F.col("a_env_y1") <= F.col("b_env_y2"))
        & (F.col("b_env_y1") <= F.col("a_env_y2"))
    )
    # reference-point dedup: only the bucket containing the envelope
    # intersection's lower-left corner reports the pair
    bkt = F.lit(float(bucket))
    rx = F.greatest(F.col("a_env_x1"), F.col("b_env_x1"))
    ry = F.greatest(F.col("a_env_y1"), F.col("b_env_y1"))
    joined = joined.filter(
        (F.floor(rx / bkt) == F.col("bx")) & (F.floor(ry / bkt) == F.col("by"))
    ).drop("bx", "by", *[c for c in joined.columns if c.startswith(("a_env_", "b_env_"))])

    out_fields = [f for f in joined.schema.fields if f.name not in (a_poly, b_poly)]
    schema_parts = [f"{f.name} {f.dataType.simpleString()}" for f in out_fields]
    schema_parts.append("area_inter double")
    if keep_wkt:
        schema_parts.append("wkt_inter string")
    out_schema = ", ".join(schema_parts)
    pass_cols = [f.name for f in out_fields]

    def clip_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            areas = np.empty(len(pdf), dtype=np.float64)
            wkts: list[str] = []
            pa, pb = pdf[a_poly], pdf[b_poly]
            for r in range(len(pdf)):
                inter = convex_clip_polygon(
                    np.asarray([list(v) for v in pa.iloc[r]], dtype=np.float64),
                    np.asarray([list(v) for v in pb.iloc[r]], dtype=np.float64),
                )
                areas[r] = shoelace_area(inter)
                if keep_wkt:
                    wkts.append(polygon_wkt(inter))
            out = pdf[pass_cols].copy()
            out["area_inter"] = areas
            if keep_wkt:
                out["wkt_inter"] = wkts
            yield out

    return joined.mapInPandas(clip_batches, out_schema).filter(
        F.col("area_inter") > 0.0
    )
