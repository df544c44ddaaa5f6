"""Dynamical diagnostics — horizontal-derivative fields (the
wrf-python `avo`/`updraft_helicity`/`helicity` family) as pure
DataFrame window arithmetic.

The reference stops at scalar surface fields; the first DYNAMICAL
quantities its users compute (vorticity, helicity) need horizontal
finite differences across the grid — re-expressed here as lag/lead
windows over grid pencils, exactly like operators/vertical.destagger:

- **d/dx** partitions by everything except x and orders by x (each
  partition one row-pencil, length = grid width — thousands of
  parallel groups, never a global sort); **d/dy** symmetrically.
  Cross-derivatives therefore cost two pencil shuffles — both on
  uniform keys, both size-bounded by one pencil per task.
- Centered differences on the INTERIOR; boundary points yield NULL
  (stated convention — wrf-python falls back to one-sided stencils
  at walls; callers needing walls can destagger-pad first).

Exactness: (f[i+1] - f[i-1]) / (2 dx) is one subtraction and one
division — IEEE exact-rounded, so closed-form oracles (the analytic
derivative of a polynomial test field) match bit-for-bit when inputs
are dyadic.  Only the Coriolis sin() is libm; gates scale-and-round.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OMEGA_E = 7.292e-5  # Earth's angular velocity [rad s-1]


def coriolis_parameter(lat_deg) -> Column:
    """f = 2 Omega sin(lat) [s-1]."""
    lat = F.col(lat_deg) if isinstance(lat_deg, str) else lat_deg
    return F.lit(2.0 * OMEGA_E) * F.sin(F.radians(lat))


def centered_diff(
    df: DataFrame,
    value_col: str,
    axis_col: str,
    spacing: float,
    group_cols: list[str],
    out_col: str,
) -> DataFrame:
    """Centered first derivative of ``value_col`` along ``axis_col``:
    (f[i+1] - f[i-1]) / (2 h) within each ``group_cols`` pencil.
    Boundary rows (no neighbor on one side) carry NULL.  Assumes the
    axis index is dense per pencil (unit steps) — the neighbor is
    validated on the COORDINATE so a hole in the pencil yields NULL,
    never a wrong-stride difference."""
    w = Window.partitionBy(*group_cols).orderBy(axis_col)
    nxt_ok = F.lead(axis_col).over(w) == F.col(axis_col) + 1
    prv_ok = F.lag(axis_col).over(w) == F.col(axis_col) - 1
    d = F.when(
        nxt_ok & prv_ok,
        (F.lead(value_col).over(w) - F.lag(value_col).over(w))
        / F.lit(2.0 * spacing),
    )
    return df.withColumn(out_col, d)


def absolute_vorticity(
    df: DataFrame,
    u_col: str,
    v_col: str,
    x_col: str,
    y_col: str,
    dx: float,
    dy: float,
    lat_col: str | None = None,
    group_cols: list[str] | None = None,
    out_col: str = "avo",
) -> DataFrame:
    """Absolute vorticity [s-1] (wrf-python `avo`, uniform-grid form):
    avo = dv/dx - du/dy + f.  Two pencil windows (one per derivative
    axis), interior points only (boundaries NULL); ``lat_col`` adds
    the Coriolis term, omit it for relative vorticity; extra
    ``group_cols`` (time, level) keep pencils per-slab."""
    extra = list(group_cols or [])
    d = centered_diff(df, v_col, x_col, dx, extra + [y_col], "_dvdx")
    d = centered_diff(d, u_col, y_col, dy, extra + [x_col], "_dudy")
    avo = F.col("_dvdx") - F.col("_dudy")
    if lat_col is not None:
        avo = avo + coriolis_parameter(lat_col)
    return d.withColumn(out_col, avo).drop("_dvdx", "_dudy")


def updraft_helicity(
    df: DataFrame,
    w_col: str,
    u_col: str,
    v_col: str,
    x_col: str,
    y_col: str,
    z_col: str,
    k_col: str,
    dx: float,
    dy: float,
    dz_col: str,
    z_bottom: float = 2000.0,
    z_top: float = 5000.0,
    out_col: str = "uh",
) -> DataFrame:
    """Updraft helicity [m2 s-2] (the wrf-python `updraft_helicity`
    quantity): UH = integral over z in [z_bottom, z_top] of w * zeta
    dz per atmospheric column, with zeta the relative vorticity at
    each model level.  One pencil-window pass per derivative axis
    (partitioned by level so each slab differentiates independently),
    then one partial-aggregated groupBy summing the band — levels
    outside the band or on the lateral boundary contribute nothing."""
    zeta = absolute_vorticity(
        df, u_col, v_col, x_col, y_col, dx, dy,
        lat_col=None, group_cols=[k_col], out_col="_zeta",
    )
    in_band = (F.col(z_col) >= F.lit(float(z_bottom))) & (
        F.col(z_col) <= F.lit(float(z_top))
    )
    term = F.when(
        in_band & F.col("_zeta").isNotNull(),
        F.col(w_col) * F.col("_zeta") * F.col(dz_col),
    ).otherwise(F.lit(0.0))
    return (
        zeta.groupBy(x_col, y_col)
        .agg(F.sum(term).alias(out_col))
    )


def storm_relative_helicity(
    df: DataFrame,
    u_col: str,
    v_col: str,
    z_col: str,
    k_col: str,
    col_keys: list[str],
    c_u: float = 0.0,
    c_v: float = 0.0,
    depth: float = 3000.0,
    out_col: str = "srh",
) -> DataFrame:
    """Storm-relative helicity [m2 s-2] (wrf-python `helicity`):
    SRH = -integral_0^depth (V - C) x dV/dz . k dz, evaluated on
    model half-layers as the standard discrete sum

        sum over adjacent level pairs (k, k+1) below ``depth`` of
        (u_{k+1} - c_u)(v_k - c_v) - (u_k - c_u)(v_{k+1} - c_v)

    (the hodograph cross-product form — each term is the signed area
    swept by the storm-relative wind between two levels, which is the
    published AMS definition; NWS convention flips sign so positive
    SRH means cyclonic turning).  One lead window per column pencil
    (length = #levels) + one partial-agg groupBy."""
    w = Window.partitionBy(*col_keys).orderBy(k_col)
    pair = (
        df.withColumn("_u2", F.lead(u_col).over(w))
        .withColumn("_v2", F.lead(v_col).over(w))
        .withColumn("_z2", F.lead(z_col).over(w))
    )
    term = F.when(
        F.col("_z2").isNotNull()
        & (F.col(z_col) <= F.lit(float(depth)))
        & (F.col("_z2") <= F.lit(float(depth))),
        (F.col("_u2") - F.lit(float(c_u)))
        * (F.col(v_col) - F.lit(float(c_v)))
        - (F.col(u_col) - F.lit(float(c_u)))
        * (F.col("_v2") - F.lit(float(c_v))),
    ).otherwise(F.lit(0.0))
    return pair.groupBy(*col_keys).agg(F.sum(term).alias(out_col))


__all__ = [
    "OMEGA_E",
    "absolute_vorticity",
    "centered_diff",
    "coriolis_parameter",
    "storm_relative_helicity",
    "updraft_helicity",
]


def _cite() -> None:
    """Parity notes: the reference (C-H-Simpson/wrf_to_geodataframe)
    converts WRF scalar fields to GeoDataFrames (wrf_voronoi.py) and
    leaves dynamics to wrf-python; these operators cover the getvar
    names `avo` (uniform-grid form without map factors — stated),
    `updraft_helicity`, `helicity`."""
