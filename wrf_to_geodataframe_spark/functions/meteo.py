"""Meteorological diagnostics — the wrf-python `getvar` staples
(`tk`, `rh`, `td`, `uvmet`, wind speed/direction, hypsometric SLP) as
built-in JVM column expressions.

The reference converts raw WRF fields to GeoDataFrames; what its users
compute NEXT is almost always one of these diagnostics (wrf-python's
most-requested variables).  All formulas are the standard public ones
(WRF/ARW users' guide, Bolton 1980 for saturation vapor pressure,
wrf-python's documented definitions); each is one codegen expression —
no Python evaluation anywhere, so they compose into any scan at
100 TB for free.

Like the CRS family, the transcendental-bearing diagnostics (exp/log/
pow/trig) are class-B oracle material: a SQL oracle restates the same
literals, and the INDEPENDENT evidence is property tests
(tests/test_meteo.py): tk == theta at the reference pressure, rh = 100
exactly at saturation mixing ratio, td == t at saturation (Magnus
consistency), uvmet preserves wind speed bit-for-bit at any rotation
and is the identity on the standard longitude.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

P1000MB = 100000.0  # reference pressure [Pa]
RD_OVER_CP = 2.0 / 7.0  # dry-air R/cp
EPS = 0.622  # Rd/Rv
ES_BASE = 6.112  # Bolton 1980 saturation vapor pressure at 0C [hPa]
ES_A = 17.67
ES_B = 243.5  # [C]
CELSIUS = 273.15
G0 = 9.81  # [m s-2]
RD = 287.047  # [J kg-1 K-1]


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def temperature_k(theta, p) -> Column:
    """Air temperature [K] from potential temperature [K] and pressure
    [Pa]: tk = theta * (p / p0)^(Rd/cp) (wrf-python `tk`)."""
    return _c(theta) * F.pow(_c(p) / F.lit(P1000MB), F.lit(RD_OVER_CP))


def sat_vapor_pressure_hpa(t_k) -> Column:
    """Bolton (1980) saturation vapor pressure [hPa] over water:
    es = 6.112 exp(17.67 tc / (tc + 243.5)), tc in Celsius."""
    tc = _c(t_k) - F.lit(CELSIUS)
    return F.lit(ES_BASE) * F.exp(
        F.lit(ES_A) * tc / (tc + F.lit(ES_B))
    )


def vapor_pressure_hpa(p, qv) -> Column:
    """Actual vapor pressure [hPa] from pressure [Pa] and water-vapor
    mixing ratio [kg/kg]: e = (p/100) qv / (eps + qv)."""
    return (_c(p) / F.lit(100.0)) * _c(qv) / (F.lit(EPS) + _c(qv))


def relative_humidity(t_k, p, qv) -> Column:
    """RH [%] = 100 e / es (wrf-python `rh`, uncapped — values above
    100 mean supersaturation in the input, not an error)."""
    return (
        F.lit(100.0)
        * vapor_pressure_hpa(p, qv)
        / sat_vapor_pressure_hpa(t_k)
    )


def dewpoint_k(p, qv) -> Column:
    """Dewpoint [K] by inverting Bolton's es at the actual vapor
    pressure (wrf-python `td`): td_c = 243.5 ln(e/6.112) /
    (17.67 - ln(e/6.112))."""
    loge = F.log(vapor_pressure_hpa(p, qv) / F.lit(ES_BASE))
    return F.lit(ES_B) * loge / (F.lit(ES_A) - loge) + F.lit(CELSIUS)


def lcc_cone(truelat1d: float, truelat2d: float) -> float:
    """Lambert-conformal cone constant (WRF's map-projection rotation
    factor; the spherical LCC n of functions/crs.py)."""
    t1, t2 = math.radians(truelat1d), math.radians(truelat2d)
    if abs(truelat1d - truelat2d) < 1e-10:
        return math.sin(t1)
    return math.log(math.cos(t1) / math.cos(t2)) / math.log(
        math.tan(math.pi / 4 + t2 / 2) / math.tan(math.pi / 4 + t1 / 2)
    )


def uvmet(u, v, lon, stand_lon_d: float, cone: float):
    """(u_earth, v_earth): rotate grid-relative LCC winds to
    earth-relative (wrf-python `uvmet`): alpha = cone * (lon -
    stand_lon), ue = v sin(alpha) + u cos(alpha), ve = v cos(alpha) -
    u sin(alpha).  A pure rotation — wind SPEED is preserved exactly
    (property-tested) and alpha = 0 on the standard longitude."""
    alpha = F.radians((_c(lon) - F.lit(stand_lon_d)) * F.lit(cone))
    sa, ca = F.sin(alpha), F.cos(alpha)
    return (
        _c(v) * sa + _c(u) * ca,
        _c(v) * ca - _c(u) * sa,
    )


def wind_speed(u, v) -> Column:
    """|V| = sqrt(u^2 + v^2)."""
    return F.sqrt(_c(u) * _c(u) + _c(v) * _c(v))


def wind_dir_met(u, v) -> Column:
    """Meteorological wind direction [deg, 0..360): the direction the
    wind blows FROM — 270 - atan2(v, u) in degrees, wrapped."""
    return F.pmod(
        F.lit(270.0) - F.degrees(F.atan2(_c(v), _c(u))), F.lit(360.0)
    )


def slp_hypsometric(p_sfc, z_sfc, t_k) -> Column:
    """Sea-level pressure [Pa] by the hypsometric reduction
    slp = p exp(g z / (Rd T)) — the textbook barometric form over the
    surface layer (the full WRF `slp` walks the 3-D column; this is
    the standard single-level reduction, stated as such)."""
    return _c(p_sfc) * F.exp(
        F.lit(G0) * _c(z_sfc) / (F.lit(RD) * _c(t_k))
    )
