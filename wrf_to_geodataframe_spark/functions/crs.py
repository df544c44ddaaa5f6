"""CRS transforms (SURVEY.md §2 G8, wrf_voronoi.py:188 ``.to_crs``).

pyproj is not in this container, so the engine implements the transforms
it needs from the published formulas — as BUILT-IN column expressions
(JVM-side, codegen-friendly), with a vectorized pandas_udf variant for
parity testing the "external library in executors" path the reference
uses.

Spherical Web Mercator (EPSG:4326 -> EPSG:3857), R = 6378137:
    x = R * radians(lon)
    y = R * ln(tan(pi/4 + radians(lat)/2))

Cross-engine note: ``ln``/``tan`` differ from DuckDB's libm in the last
bit for ~7% of inputs, so oracle-checked outputs must be rounded (cm
precision leaves ~9 orders of margin).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

R_EARTH = 6378137.0


def lonlat_to_webmercator_x(lon: Column) -> Column:
    return F.lit(R_EARTH) * F.radians(lon)


def lonlat_to_webmercator_y(lat: Column) -> Column:
    return F.lit(R_EARTH) * F.log(
        F.tan(F.lit(math.pi) / 4 + F.radians(lat) / 2)
    )


def webmercator_to_lon(x: Column) -> Column:
    return F.degrees(x / F.lit(R_EARTH))


def webmercator_to_lat(y: Column) -> Column:
    return F.degrees(
        F.lit(2.0) * F.atan(F.exp(y / F.lit(R_EARTH))) - F.lit(math.pi / 2)
    )


# ---------------------------------------------------------------------------
# EPSG:27700 — OSGB36 British National Grid (the reference's ACTUAL target
# CRS, wrf_voronoi.py:188 ``.to_crs("EPSG:27700")``).  Two published steps:
#
# 1. WGS84 -> OSGB36 datum shift: geodetic -> cartesian, 7-parameter
#    Helmert (position-vector convention; the standard small transform,
#    ~3.5 m vs the OSTN15 grid pyproj would use — validated at 3.6 m on
#    the OS guide's worked-example station), cartesian -> geodetic by
#    fixed-point iteration (7 unrolled steps, contraction factor e^2
#    ~6.7e-3 => sub-micron).
# 2. Transverse Mercator on Airy 1830 with the National Grid parameters
#    (F0, phi0 49N, lam0 2W, E0 400000, N0 -100000), the OS guide
#    Annex C series — reproduces the guide's worked example to the mm
#    (651409.903 E, 313177.270 N).
#
# Constants are precomputed Python floats so the Spark expressions and
# the DuckDB oracle embed the IDENTICAL literals.

AIRY_A = 6377563.396
AIRY_B = 6356256.909
OSGB_F0 = 0.9996012717
OSGB_PHI0 = math.radians(49.0)
OSGB_LAM0 = math.radians(-2.0)
OSGB_E0 = 400000.0
OSGB_N0 = -100000.0
E2_AIRY = 0.006670540074149084  # (a^2-b^2)/a^2, Airy 1830
E2_WGS = 0.006694379990197585  # WGS84 (b = a*(1 - 1/298.257223563))
WGS_A = 6378137.0
# M-series coefficients in n = (a-b)/(a+b)
MA_C = 1.0016767257673973  # 1 + n + 5/4 n^2 + 5/4 n^3
MB_C = 0.0050280722824740985  # 3n + 3n^2 + 21/8 n^3
MC_C = 5.258157614724851e-06  # 15/8 (n^2 + n^3)
MD_C = 6.831502002843111e-09  # 35/24 n^3
# Helmert WGS84 -> OSGB36 (negation of the published OSGB36 -> WGS84 set)
H_TX, H_TY, H_TZ = -446.448, 125.157, -542.060
H_S1 = 1.0000204894  # 1 + 20.4894 ppm
H_RX = -7.281901490265231e-07  # -0.1502" in radians
H_RY = -1.1974897923405538e-06  # -0.2470"
H_RZ = -4.082616008623402e-06  # -0.8421"


def lonlat_to_osgb(df, lon, lat, out_e: str = "easting", out_n: str = "northing"):
    """Append OSGB36 ``easting``/``northing`` columns for WGS84 ``lon``/
    ``lat`` columns — built-in JVM expressions only, staged through named
    intermediate columns (each stage references the previous stage's
    aliases, keeping the expression tree linear in formula length)."""
    d = df.withColumns({"_phi": F.radians(lat), "_lam": F.radians(lon)})
    d = d.withColumns({"_sp": F.sin("_phi"), "_cp": F.cos("_phi")})
    d = d.withColumn(
        "_nu1", F.lit(WGS_A) / F.sqrt(F.lit(1.0) - F.lit(E2_WGS) * F.col("_sp") * F.col("_sp"))
    )
    d = d.withColumns(
        {
            "_X": F.col("_nu1") * F.col("_cp") * F.cos("_lam"),
            "_Y": F.col("_nu1") * F.col("_cp") * F.sin("_lam"),
            "_Z": (F.lit(1.0) - F.lit(E2_WGS)) * F.col("_nu1") * F.col("_sp"),
        }
    )
    d = d.withColumns(
        {
            "_XP": F.lit(H_TX) + F.lit(H_S1) * F.col("_X") - F.lit(H_RZ) * F.col("_Y") + F.lit(H_RY) * F.col("_Z"),
            "_YP": F.lit(H_TY) + F.lit(H_RZ) * F.col("_X") + F.lit(H_S1) * F.col("_Y") - F.lit(H_RX) * F.col("_Z"),
            "_ZP": F.lit(H_TZ) - F.lit(H_RY) * F.col("_X") + F.lit(H_RX) * F.col("_Y") + F.lit(H_S1) * F.col("_Z"),
        }
    )
    d = d.withColumns(
        {
            "_p": F.sqrt(F.col("_XP") * F.col("_XP") + F.col("_YP") * F.col("_YP")),
            "_lam2": F.atan2(F.col("_YP"), F.col("_XP")),
        }
    )
    d = d.withColumn(
        "_phi2", F.atan2(F.col("_ZP"), F.col("_p") * (F.lit(1.0) - F.lit(E2_AIRY)))
    )
    for _ in range(7):
        d = d.withColumn("_sphi", F.sin("_phi2")).withColumn(
            "_phi2",
            F.atan2(
                F.col("_ZP")
                + F.lit(E2_AIRY)
                * (F.lit(AIRY_A) / F.sqrt(F.lit(1.0) - F.lit(E2_AIRY) * F.col("_sphi") * F.col("_sphi")))
                * F.col("_sphi"),
                F.col("_p"),
            ),
        )
    d = d.withColumns(
        {
            "_s2": F.sin("_phi2"),
            "_c2": F.cos("_phi2"),
            "_t2": F.tan("_phi2"),
            "_dl": F.col("_lam2") - F.lit(OSGB_LAM0),
            "_dphi": F.col("_phi2") - F.lit(OSGB_PHI0),
            "_sphi0": F.col("_phi2") + F.lit(OSGB_PHI0),
        }
    )
    af0, bf0 = AIRY_A * OSGB_F0, AIRY_B * OSGB_F0
    d = d.withColumns(
        {
            "_nu": F.lit(af0) / F.sqrt(F.lit(1.0) - F.lit(E2_AIRY) * F.col("_s2") * F.col("_s2")),
            "_rho_d": F.lit(1.0) - F.lit(E2_AIRY) * F.col("_s2") * F.col("_s2"),
        }
    )
    d = d.withColumn(
        "_rho",
        F.lit(af0) * (F.lit(1.0) - F.lit(E2_AIRY)) / (F.col("_rho_d") * F.sqrt(F.col("_rho_d"))),
    )
    d = d.withColumns(
        {
            "_eta2": F.col("_nu") / F.col("_rho") - F.lit(1.0),
            "_t22": F.col("_t2") * F.col("_t2"),
            "_c23": F.col("_c2") * F.col("_c2") * F.col("_c2"),
            "_M": F.lit(bf0)
            * (
                F.lit(MA_C) * F.col("_dphi")
                - F.lit(MB_C) * F.sin("_dphi") * F.cos("_sphi0")
                + F.lit(MC_C) * F.sin(F.lit(2.0) * F.col("_dphi")) * F.cos(F.lit(2.0) * F.col("_sphi0"))
                - F.lit(MD_C) * F.sin(F.lit(3.0) * F.col("_dphi")) * F.cos(F.lit(3.0) * F.col("_sphi0"))
            ),
        }
    )
    d = d.withColumns(
        {
            "_c25": F.col("_c23") * F.col("_c2") * F.col("_c2"),
            "_t24": F.col("_t22") * F.col("_t22"),
            "_dl2": F.col("_dl") * F.col("_dl"),
        }
    )
    e_expr = (
        F.lit(OSGB_E0)
        + F.col("_nu") * F.col("_c2") * F.col("_dl")
        + F.col("_nu") / F.lit(6.0) * F.col("_c23")
        * (F.col("_nu") / F.col("_rho") - F.col("_t22"))
        * F.col("_dl2") * F.col("_dl")
        + F.col("_nu") / F.lit(120.0) * F.col("_c25")
        * (
            F.lit(5.0) - F.lit(18.0) * F.col("_t22") + F.col("_t24")
            + F.lit(14.0) * F.col("_eta2")
            - F.lit(58.0) * F.col("_t22") * F.col("_eta2")
        )
        * F.col("_dl2") * F.col("_dl2") * F.col("_dl")
    )
    n_expr = (
        F.col("_M") + F.lit(OSGB_N0)
        + F.col("_nu") / F.lit(2.0) * F.col("_s2") * F.col("_c2") * F.col("_dl2")
        + F.col("_nu") / F.lit(24.0) * F.col("_s2") * F.col("_c23")
        * (F.lit(5.0) - F.col("_t22") + F.lit(9.0) * F.col("_eta2"))
        * F.col("_dl2") * F.col("_dl2")
        + F.col("_nu") / F.lit(720.0) * F.col("_s2") * F.col("_c25")
        * (F.lit(61.0) - F.lit(58.0) * F.col("_t22") + F.col("_t24"))
        * F.col("_dl2") * F.col("_dl2") * F.col("_dl2")
    )
    d = d.withColumns({out_e: e_expr, out_n: n_expr})
    return d.drop(*[c for c in d.columns if c.startswith("_")])


def osgb_pandas_udf():
    """Arrow-vectorized numpy twin of :func:`lonlat_to_osgb` (the shape a
    pyproj transform would take in executors); parity-tested against the
    expression path and the OS guide worked example."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<easting: double, northing: double>")
    def _transform(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        phi = np.radians(lat.to_numpy(np.float64))
        lam = np.radians(lon.to_numpy(np.float64))
        sp, cp = np.sin(phi), np.cos(phi)
        nu1 = WGS_A / np.sqrt(1 - E2_WGS * sp * sp)
        X, Y, Z = nu1 * cp * np.cos(lam), nu1 * cp * np.sin(lam), (1 - E2_WGS) * nu1 * sp
        Xp = H_TX + H_S1 * X - H_RZ * Y + H_RY * Z
        Yp = H_TY + H_RZ * X + H_S1 * Y - H_RX * Z
        Zp = H_TZ - H_RY * X + H_RX * Y + H_S1 * Z
        p = np.sqrt(Xp * Xp + Yp * Yp)
        phi2 = np.arctan2(Zp, p * (1 - E2_AIRY))
        for _ in range(7):
            s = np.sin(phi2)
            phi2 = np.arctan2(
                Zp + E2_AIRY * (AIRY_A / np.sqrt(1 - E2_AIRY * s * s)) * s, p
            )
        lam2 = np.arctan2(Yp, Xp)
        s2, c2, t2 = np.sin(phi2), np.cos(phi2), np.tan(phi2)
        af0, bf0 = AIRY_A * OSGB_F0, AIRY_B * OSGB_F0
        nu = af0 / np.sqrt(1 - E2_AIRY * s2 * s2)
        rho = af0 * (1 - E2_AIRY) * (1 - E2_AIRY * s2 * s2) ** -1.5
        eta2 = nu / rho - 1
        dphi, sphi = phi2 - OSGB_PHI0, phi2 + OSGB_PHI0
        M = bf0 * (
            MA_C * dphi
            - MB_C * np.sin(dphi) * np.cos(sphi)
            + MC_C * np.sin(2 * dphi) * np.cos(2 * sphi)
            - MD_C * np.sin(3 * dphi) * np.cos(3 * sphi)
        )
        dl = lam2 - OSGB_LAM0
        t22, t24, c23, c25 = t2 * t2, t2 ** 4, c2 ** 3, c2 ** 5
        E = (
            OSGB_E0 + nu * c2 * dl
            + nu / 6 * c23 * (nu / rho - t22) * dl ** 3
            + nu / 120 * c25 * (5 - 18 * t22 + t24 + 14 * eta2 - 58 * t22 * eta2) * dl ** 5
        )
        N = (
            M + OSGB_N0 + nu / 2 * s2 * c2 * dl * dl
            + nu / 24 * s2 * c23 * (5 - t22 + 9 * eta2) * dl ** 4
            + nu / 720 * s2 * c25 * (61 - 58 * t22 + t24) * dl ** 6
        )
        return pd.DataFrame({"easting": E, "northing": N})

    return _transform


def osgb36_geodetic_to_grid_numpy(phi, lam):
    """TM core alone (OSGB36 geodetic radians -> grid E/N) — exposed for
    the worked-example test, which states OSGB36 coordinates directly."""
    s2, c2, t2 = np.sin(phi), np.cos(phi), np.tan(phi)
    af0, bf0 = AIRY_A * OSGB_F0, AIRY_B * OSGB_F0
    nu = af0 / np.sqrt(1 - E2_AIRY * s2 * s2)
    rho = af0 * (1 - E2_AIRY) * (1 - E2_AIRY * s2 * s2) ** -1.5
    eta2 = nu / rho - 1
    dphi, sphi = phi - OSGB_PHI0, phi + OSGB_PHI0
    M = bf0 * (
        MA_C * dphi
        - MB_C * np.sin(dphi) * np.cos(sphi)
        + MC_C * np.sin(2 * dphi) * np.cos(2 * sphi)
        - MD_C * np.sin(3 * dphi) * np.cos(3 * sphi)
    )
    dl = lam - OSGB_LAM0
    t22, t24, c23, c25 = t2 * t2, t2 ** 4, c2 ** 3, c2 ** 5
    E = (
        OSGB_E0 + nu * c2 * dl
        + nu / 6 * c23 * (nu / rho - t22) * dl ** 3
        + nu / 120 * c25 * (5 - 18 * t22 + t24 + 14 * eta2 - 58 * t22 * eta2) * dl ** 5
    )
    N = (
        M + OSGB_N0 + nu / 2 * s2 * c2 * dl * dl
        + nu / 24 * s2 * c23 * (5 - t22 + 9 * eta2) * dl ** 4
        + nu / 720 * s2 * c25 * (61 - 58 * t22 + t24) * dl ** 6
    )
    return E, N


def webmercator_pandas_udf():
    """The pandas_udf (Arrow-vectorized numpy) variant — how a pyproj
    transform would run in executors; kept for parity testing against
    the expression path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<x: double, y: double>")
    def _transform(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        lam = np.radians(lon.to_numpy(np.float64))
        phi = np.radians(lat.to_numpy(np.float64))
        return pd.DataFrame(
            {
                "x": R_EARTH * lam,
                "y": R_EARTH * np.log(np.tan(np.pi / 4 + phi / 2)),
            }
        )

    return _transform


# ---------------------------------------------------------------------------
# Inverse chain: EPSG:27700 grid E/N -> WGS84 lon/lat.  The reference only
# projects forward (to_crs at wrf_voronoi.py:188), but a round-trip API is
# what any consumer doing I/O in both CRSs needs, and the round-trip
# property test pins both directions against each other.
#
# Inverse TM per the OS guide Annex C (C.3): iterate phi' until the
# meridian arc M(phi') matches N - N0 (contraction ~e^2, 8 iterations =>
# sub-nanometre), then the VII..XIIA series.  Datum shift back is the
# EXACT Helmert inverse (fixed-point solve of the forward transform,
# contraction ~2e-5 per iteration), so forward∘inverse closes to
# ~1e-10 deg — model error vs OSTN15 remains the forward's ~3.5 m.


def osgb_grid_to_geodetic_numpy(E, N):
    """Inverse TM core alone (grid E/N -> OSGB36 geodetic radians)."""
    af0, bf0 = AIRY_A * OSGB_F0, AIRY_B * OSGB_F0
    phi = (N - OSGB_N0) / af0 + OSGB_PHI0
    for _ in range(8):
        dphi, sphi = phi - OSGB_PHI0, phi + OSGB_PHI0
        M = bf0 * (
            MA_C * dphi
            - MB_C * np.sin(dphi) * np.cos(sphi)
            + MC_C * np.sin(2 * dphi) * np.cos(2 * sphi)
            - MD_C * np.sin(3 * dphi) * np.cos(3 * sphi)
        )
        phi = phi + (N - OSGB_N0 - M) / af0
    s2, c2, t2 = np.sin(phi), np.cos(phi), np.tan(phi)
    nu = af0 / np.sqrt(1 - E2_AIRY * s2 * s2)
    rho = af0 * (1 - E2_AIRY) * (1 - E2_AIRY * s2 * s2) ** -1.5
    eta2 = nu / rho - 1
    t22 = t2 * t2
    t24 = t22 * t22
    VII = t2 / (2 * rho * nu)
    VIII = t2 / (24 * rho * nu**3) * (5 + 3 * t22 + eta2 - 9 * t22 * eta2)
    IX = t2 / (720 * rho * nu**5) * (61 + 90 * t22 + 45 * t24)
    sec = 1.0 / c2
    X = sec / nu
    XI = sec / (6 * nu**3) * (nu / rho + 2 * t22)
    XII = sec / (120 * nu**5) * (5 + 28 * t22 + 24 * t24)
    XIIA = sec / (5040 * nu**7) * (61 + 662 * t22 + 1320 * t24 + 720 * t22 * t24)
    dE = E - OSGB_E0
    dE2 = dE * dE
    phi_out = phi - VII * dE2 + VIII * dE2 * dE2 - IX * dE2 * dE2 * dE2
    lam_out = (
        OSGB_LAM0
        + X * dE
        - XI * dE2 * dE
        + XII * dE2 * dE2 * dE
        - XIIA * dE2 * dE2 * dE2 * dE
    )
    return phi_out, lam_out


def osgb_to_lonlat_numpy(E, N):
    """Full inverse chain: grid E/N -> OSGB36 geodetic -> Airy cartesian
    -> inverse Helmert -> WGS84 geodetic (degrees lon/lat)."""
    phi, lam = osgb_grid_to_geodetic_numpy(np.asarray(E, float), np.asarray(N, float))
    sp, cp = np.sin(phi), np.cos(phi)
    nu1 = AIRY_A / np.sqrt(1 - E2_AIRY * sp * sp)
    X = nu1 * cp * np.cos(lam)
    Y = nu1 * cp * np.sin(lam)
    Z = (1 - E2_AIRY) * nu1 * sp
    # exact Helmert inverse by fixed-point: the forward is X' = T + M X
    # with M = I + (S + R); solve X = (X' - T) - (M - I) X, contraction
    # ||M - I|| ~ 2e-5, 3 iterations => relative error ~1e-14 (the
    # naive negated-parameter inverse leaves ~5 mm of second-order
    # residual, which the round-trip test would see)
    bX, bY, bZ = X - H_TX, Y - H_TY, Z - H_TZ
    Xp, Yp, Zp = bX, bY, bZ
    ds = H_S1 - 1.0
    for _ in range(3):
        Xp, Yp, Zp = (
            bX - (ds * Xp - H_RZ * Yp + H_RY * Zp),
            bY - (H_RZ * Xp + ds * Yp - H_RX * Zp),
            bZ - (-H_RY * Xp + H_RX * Yp + ds * Zp),
        )
    p = np.sqrt(Xp * Xp + Yp * Yp)
    phi2 = np.arctan2(Zp, p * (1 - E2_WGS))
    for _ in range(7):
        s = np.sin(phi2)
        phi2 = np.arctan2(
            Zp + E2_WGS * (WGS_A / np.sqrt(1 - E2_WGS * s * s)) * s, p
        )
    lam2 = np.arctan2(Yp, Xp)
    return np.degrees(lam2), np.degrees(phi2)


def osgb_inverse_pandas_udf():
    """Arrow-vectorized inverse transform (grid E/N -> WGS84 lon/lat) for
    executor-side use, mirroring :func:`osgb_pandas_udf`."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<lon: double, lat: double>")
    def _transform(easting: pd.Series, northing: pd.Series) -> pd.DataFrame:
        lon, lat = osgb_to_lonlat_numpy(
            easting.to_numpy(np.float64), northing.to_numpy(np.float64)
        )
        return pd.DataFrame({"lon": lon, "lat": lat})

    return _transform
