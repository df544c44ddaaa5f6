"""Dynamics suite: the wrf-python vorticity/helicity staples
(operators/dynamics.py) as oracle-gated queries.

Oracle-independence (suite/__init__ taxonomy): these are the STRONG
side of class B — the engine finds finite-difference stencils with
lag/lead windows over grid pencils, while the oracle computes the
ANALYTIC derivative of the polynomial test field in closed form (no
window, no neighbor search), so the hash checks the window mechanics
against independent arithmetic (the v1_destagger pattern).

Exactness: every synthetic field is dyadic-rational (power-of-two
denominators) and the grid spacings are powers of two, so centered
differences, products, and per-column sums are all exactly
representable — order-independent and hash-exact with NO quantization
(the dyadic corollary of the suite's integer rule; see
v3_precipitable_water).  Only m3's Coriolis sin() is libm, handled by
scale-and-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.operators.dynamics import (
    OMEGA_E,
    absolute_vorticity,
    coriolis_parameter,
    storm_relative_helicity,
    updraft_helicity,
)
from wrf_to_geodataframe_spark.session import load_table

_DW = 4  # dynamics-lattice width: user_id -> (x, y) = (uid % 4, uid // 4)
_DXY = 512.0  # grid spacing [m], power of two so differences stay dyadic
_DK = 10  # model levels per column


def _lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete _DW-wide lattice over the dense y rows present in
    events: every row-pencil is full (x = 0.._DW-1) and the y values
    are dense, so interior/boundary is a closed-form condition the
    oracle can state without replaying the window search."""
    ys = load_table(spark, sf_dir, "events").select(
        F.floor(F.col("user_id") / _DW).alias("y")
    ).distinct()
    return ys.select(
        "y",
        F.explode(F.sequence(F.lit(0), F.lit(_DW - 1))).alias("x"),
    )


_D_YS_SQL = f"""
    SELECT DISTINCT CAST(floor(user_id / {_DW}.0) AS BIGINT) AS y
    FROM events
"""


def m3_absolute_vorticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABSOLUTE VORTICITY (wrf-python `avo`): avo = dv/dx - du/dy + f
    over a complete lattice, centered differences on the interior and
    NULL on the boundary (operators/dynamics.py).  Fields u = (3y^2 +
    x)/8 and v = (5x^2 + y)/4 have exact dyadic centered differences
    (dv/dx = 5x/1024, du/dy = 3y/2048 at 512 m spacing); the output is
    scaled to 1e-5 s^-1 units and rounded, absorbing the ~1e-20
    cross-engine sin() drift in the Coriolis term."""
    d = _lattice(spark, sf_dir).select(
        "y", "x",
        (
            (F.col("y") * F.col("y") * 3.0 + F.col("x")) / 8.0
        ).alias("u"),
        (
            (F.col("x") * F.col("x") * 5.0 + F.col("y")) / 4.0
        ).alias("v"),
        (F.lit(20.0) + (F.col("y") % 160) * 0.25).alias("lat"),
    )
    out = absolute_vorticity(
        d, "u", "v", "x", "y", _DXY, _DXY, lat_col="lat", out_col="avo"
    )
    return out.select(
        F.col("y").alias("y_idx"),
        F.col("x").cast("long").alias("x_idx"),
        F.round(F.col("avo") * 100000.0, 6).alias("avo5"),
    )


_M3_SQL = f"""
WITH ys AS ({_D_YS_SQL}),
ym AS (SELECT max(y) AS ymax FROM ys),
cells AS (
    SELECT y, x FROM ys, generate_series(0, {_DW - 1}) AS t(x)
)
SELECT y AS y_idx, CAST(x AS BIGINT) AS x_idx,
       CASE WHEN x BETWEEN 1 AND {_DW - 2}
             AND y BETWEEN 1 AND (SELECT ymax FROM ym) - 1
            THEN round(
              ((5.0 * x) / 1024.0 - (3.0 * y) / 2048.0
               + {2.0 * OMEGA_E!r}
                 * sin(radians(20.0 + (y % 160) * 0.25))) * 100000.0, 6)
       END AS avo5
FROM cells
"""


def m4_updraft_helicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDRAFT HELICITY (wrf-python `updraft_helicity`): per-column
    integral of w * zeta over the 2-5 km band (operators/dynamics.py)
    — one pencil window per derivative axis partitioned by level,
    then one partial-agg groupBy.  Level-dependent dyadic fields make
    zeta = (5x(k+2) - 3y(k+1))/4096 exact, w spans negative/zero/
    positive arms, and the 6-term band sum is exactly representable —
    hash-exact with no rounding.  Lateral-boundary columns sum to
    exactly 0.0 (their zeta is NULL at every level)."""
    lev = _lattice(spark, sf_dir).select(
        "y", "x",
        F.explode(F.sequence(F.lit(0), F.lit(_DK - 1))).alias("k"),
    ).select(
        "y", "x", "k",
        (
            (F.col("y") * F.col("y") * (F.col("k") + 1) * 3.0 + F.col("x"))
            / 16.0
        ).alias("u"),
        (
            (F.col("x") * F.col("x") * (F.col("k") + 2) * 5.0 + F.col("y"))
            / 16.0
        ).alias("v"),
        (((F.col("x") + F.col("y") + F.col("k")) % 5 - 1.0) / 4.0).alias("w"),
        (F.col("k") * 500.0 + 250.0).alias("z"),
        F.lit(500.0).alias("dz"),
    )
    out = updraft_helicity(
        lev, "w", "u", "v", "x", "y", "z", "k", _DXY, _DXY, "dz",
        z_bottom=2000.0, z_top=5000.0, out_col="uh",
    )
    return out.select(
        F.col("y").alias("y_idx"),
        F.col("x").cast("long").alias("x_idx"),
        "uh",
    )


_M4_SQL = f"""
WITH ys AS ({_D_YS_SQL}),
ym AS (SELECT max(y) AS ymax FROM ys),
cells AS (
    SELECT y, x FROM ys, generate_series(0, {_DW - 1}) AS t(x)
),
lev AS (
    SELECT y, x, k,
           CASE WHEN x BETWEEN 1 AND {_DW - 2}
                 AND y BETWEEN 1 AND (SELECT ymax FROM ym) - 1
                THEN ((5.0 * x * (k + 2)) / 4096.0
                      - (3.0 * y * (k + 1)) / 4096.0)
           END AS zeta,
           ((x + y + k) % 5 - 1.0) / 4.0 AS w,
           k * 500.0 + 250.0 AS z
    FROM cells, generate_series(0, {_DK - 1}) AS t2(k)
)
SELECT y AS y_idx, CAST(x AS BIGINT) AS x_idx,
       sum(CASE WHEN z >= 2000.0 AND z <= 5000.0 AND zeta IS NOT NULL
                THEN w * zeta * 500.0 ELSE 0.0 END) AS uh
FROM lev GROUP BY y, x
"""


def m5_storm_rel_helicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORM-RELATIVE HELICITY (wrf-python `helicity`): the 0-3 km
    hodograph cross-product sum per column with a fixed storm motion
    (operators/dynamics.py) — one lead window per column pencil plus
    one partial-agg groupBy.  Dyadic wind profiles make every pair
    term exact; the oracle states each adjacent-pair term in closed
    form from the analytic profile (no window)."""
    lev = _lattice(spark, sf_dir).select(
        "y", "x",
        F.explode(F.sequence(F.lit(0), F.lit(_DK - 1))).alias("k"),
    ).select(
        "y", "x", "k",
        (
            (F.col("k") * F.col("k") * 2.0 + F.col("x")) / 8.0
        ).alias("u"),
        ((F.col("k") * 3.0 + F.col("y") % 8) / 4.0).alias("v"),
        (F.col("k") * 500.0).alias("z"),
    )
    out = storm_relative_helicity(
        lev, "u", "v", "z", "k", ["y", "x"],
        c_u=1.25, c_v=-0.5, depth=3000.0, out_col="srh",
    )
    return out.select(
        F.col("y").alias("y_idx"),
        F.col("x").cast("long").alias("x_idx"),
        "srh",
    )


_M5_SQL = f"""
WITH ys AS ({_D_YS_SQL}),
cells AS (
    SELECT y, x FROM ys, generate_series(0, {_DW - 1}) AS t(x)
),
pairs AS (
    SELECT y, x,
           (((k+1)*(k+1) * 2.0 + x) / 8.0 - 1.25)
             * ((k * 3.0 + y % 8) / 4.0 - (-0.5))
           - ((k*k * 2.0 + x) / 8.0 - 1.25)
             * (((k+1) * 3.0 + y % 8) / 4.0 - (-0.5)) AS term
    FROM cells, generate_series(0, 5) AS t2(k)
)
SELECT y AS y_idx, CAST(x AS BIGINT) AS x_idx, sum(term) AS srh
FROM pairs GROUP BY y, x
"""


QUERIES = {
    "m3_absolute_vorticity": m3_absolute_vorticity,
    "m4_updraft_helicity": m4_updraft_helicity,
    "m5_storm_rel_helicity": m5_storm_rel_helicity,
}

ORACLE = {
    "m3_absolute_vorticity": _M3_SQL,
    "m4_updraft_helicity": _M4_SQL,
    "m5_storm_rel_helicity": _M5_SQL,
}
