"""Meteorological diagnostics (functions/meteo.py): physical
identities that hold exactly (or to fp round-off), independent of the
class-B formula-replay oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.functions.meteo import (
    EPS,
    P1000MB,
    dewpoint_k,
    geopotential_height,
    lcc_cone,
    lcl_temperature_k,
    reflectivity_dbz,
    relative_humidity,
    sat_vapor_pressure_hpa,
    slp_hypsometric,
    temperature_k,
    theta_e_bolton,
    uvmet,
    virtual_temperature,
    wet_bulb_stull_c,
    wind_dir_met,
    wind_speed,
)


def _one(spark, *cols):
    return spark.range(1).select(*cols).collect()[0]


def test_tk_equals_theta_at_reference_pressure(spark):
    r = _one(
        spark,
        temperature_k(F.lit(300.0), F.lit(P1000MB)).alias("tk"),
        temperature_k(F.lit(300.0), F.lit(50000.0)).alias("tk5"),
    )
    assert r.tk == 300.0  # pow(1, c) exact
    # half pressure: colder than theta by the dry-adiabatic factor
    assert r.tk5 == pytest.approx(300.0 * 0.5 ** (2.0 / 7.0), rel=1e-12)


def test_rh_is_100_at_saturation_and_td_equals_t(spark):
    """Build qv_sat from es at (t, p): then e == es so RH == 100 and
    the Magnus inversion returns td == t (the consistency identity the
    two formulas must share)."""
    t, p = 285.0, 98000.0
    es = 6.112 * math.exp(17.67 * (t - 273.15) / ((t - 273.15) + 243.5))
    qv_sat = EPS * es / (p / 100.0 - es)
    r = _one(
        spark,
        relative_humidity(F.lit(t), F.lit(p), F.lit(qv_sat)).alias("rh"),
        dewpoint_k(F.lit(p), F.lit(qv_sat)).alias("td"),
        sat_vapor_pressure_hpa(F.lit(t)).alias("es"),
    )
    assert r.es == pytest.approx(es, rel=1e-12)
    assert r.rh == pytest.approx(100.0, rel=1e-12)
    assert r.td == pytest.approx(t, rel=1e-12)


def test_uvmet_preserves_speed_and_is_identity_on_stand_lon(spark):
    cone = lcc_cone(30.0, 60.0)
    assert 0.0 < cone < 1.0
    # single true latitude: cone degenerates to sin(lat)
    assert lcc_cone(45.0, 45.0) == pytest.approx(
        math.sin(math.radians(45.0)), rel=1e-12
    )
    rows = (
        spark.range(60)
        .select(
            (F.col("id") * 1.7 - 50.0).alias("u"),
            (F.col("id") * -0.9 + 20.0).alias("v"),
            (F.col("id") * 2.5 - 70.0).alias("lon"),
        )
    )
    ue, ve = uvmet(F.col("u"), F.col("v"), F.col("lon"), 5.0, cone)
    got = rows.select(
        wind_speed(F.col("u"), F.col("v")).alias("s0"),
        wind_speed(ue, ve).alias("s1"),
        "lon", "u", "v", ue.alias("ue"), ve.alias("ve"),
    ).collect()
    for r in got:
        assert r.s1 == pytest.approx(r.s0, rel=1e-12)
    ue0, ve0 = uvmet(F.lit(3.0), F.lit(4.0), F.lit(5.0), 5.0, cone)
    r = _one(spark, ue0.alias("ue"), ve0.alias("ve"))
    assert (r.ue, r.ve) == (3.0, 4.0)  # alpha = 0 exactly


def test_wind_dir_met_cardinal_points(spark):
    cases = [
        (0.0, -5.0, 0.0),    # wind FROM north blows southward (v<0)
        (-5.0, 0.0, 90.0),   # from east
        (0.0, 5.0, 180.0),   # from south
        (5.0, 0.0, 270.0),   # from west
    ]
    for u, v, want in cases:
        r = _one(spark, wind_dir_met(F.lit(u), F.lit(v)).alias("d"))
        assert r.d == pytest.approx(want, abs=1e-9), (u, v)


def test_virtual_temperature_and_geopotential_height(spark):
    r = _one(
        spark,
        virtual_temperature(F.lit(290.0), F.lit(0.0)).alias("dry"),
        virtual_temperature(F.lit(290.0), F.lit(0.01)).alias("moist"),
        geopotential_height(F.lit(0.0), F.lit(9810.0)).alias("z"),
    )
    assert r.dry == 290.0  # dry air: tv == t exactly (eps/eps cancels)
    # exact eps-form (wrf-python TVIRTUAL): t (eps+qv)/(eps(1+qv))
    assert r.moist == pytest.approx(
        290.0 * (0.622 + 0.01) / (0.622 * 1.01), rel=1e-12
    )
    assert r.z == pytest.approx(1000.0, rel=1e-12)


def test_theta_e_exceeds_tk_and_lcl_below_t(spark):
    """Latent heat only ADDS: theta_e > theta > tk below p0, and the
    LCL of a subsaturated parcel is colder than the parcel (Bolton
    eq. 21 consistency); theta_e increases with moisture."""
    t, p = 295.0, 95000.0
    theta = t * (P1000MB / p) ** (2.0 / 7.0)
    r = _one(
        spark,
        lcl_temperature_k(F.lit(t), F.lit(p), F.lit(0.008)).alias("tl"),
        theta_e_bolton(F.lit(t), F.lit(p), F.lit(0.008)).alias("e8"),
        theta_e_bolton(F.lit(t), F.lit(p), F.lit(0.012)).alias("e12"),
    )
    assert r.tl < t  # subsaturated: must lift (cool) to condense
    assert r.e8 > theta  # latent-heat term adds to theta
    assert r.e12 > r.e8  # more moisture, more latent heat


def test_wet_bulb_between_dewpoint_and_temperature(spark):
    """The wet-bulb sits between Td and T for subsaturated air, and
    approaches T at RH -> 100 (Stull 2011 fit, +-0.3 K)."""
    t, p = 293.15, 100000.0  # 20 C
    es = 6.112 * math.exp(17.67 * 20.0 / (20.0 + 243.5))
    for frac in (0.3, 0.6, 0.9):
        e = frac * es
        qv = EPS * e / (p / 100.0 - e)
        r = _one(
            spark,
            relative_humidity(F.lit(t), F.lit(p), F.lit(qv)).alias("rh"),
            dewpoint_k(F.lit(p), F.lit(qv)).alias("td"),
        )
        tw = _one(
            spark, wet_bulb_stull_c(F.lit(t), F.lit(r.rh)).alias("tw")
        ).tw
        td_c = r.td - 273.15
        assert td_c - 0.5 < tw < 20.0 + 0.3, (frac, tw, td_c)
    r99 = _one(spark, wet_bulb_stull_c(F.lit(t), F.lit(99.0)).alias("tw"))
    assert r99.tw == pytest.approx(20.0, abs=0.5)


def test_reflectivity_floor_and_rain_monotonicity(spark):
    """No hydrometeors -> the -30 dBZ floor (z_e clamps at 0.001);
    more rain -> strictly larger dBZ; adding snow/graupel adds
    reflectivity on top of rain."""
    t, p, qv = 280.0, 90000.0, 0.005
    r = _one(
        spark,
        reflectivity_dbz(
            F.lit(t), F.lit(p), F.lit(qv), F.lit(0.0),
            F.lit(0.0), F.lit(0.0),
        ).alias("clear"),
        reflectivity_dbz(
            F.lit(t), F.lit(p), F.lit(qv), F.lit(1e-4)
        ).alias("light"),
        reflectivity_dbz(
            F.lit(t), F.lit(p), F.lit(qv), F.lit(2e-3)
        ).alias("heavy"),
        reflectivity_dbz(
            F.lit(t), F.lit(p), F.lit(qv), F.lit(1e-4),
            F.lit(1e-4), F.lit(1e-4),
        ).alias("mixed"),
    )
    assert r.clear == pytest.approx(-30.0, abs=1e-9)
    assert -30.0 < r.light < r.heavy
    assert 30.0 < r.heavy < 60.0  # heavy rain sits in the real-world band
    assert r.mixed > r.light


def test_slp_hypsometric_monotone_and_sea_level_identity(spark):
    r = _one(
        spark,
        slp_hypsometric(F.lit(98000.0), F.lit(0.0), F.lit(290.0)).alias("a"),
        slp_hypsometric(F.lit(98000.0), F.lit(500.0), F.lit(290.0)).alias("b"),
        slp_hypsometric(F.lit(98000.0), F.lit(500.0), F.lit(250.0)).alias("c"),
    )
    assert r.a == 98000.0  # z = 0: exp(0) exact
    assert r.b > 98000.0  # reduction adds the column below
    assert r.c > r.b  # colder column -> denser -> larger correction


def test_omega_sign_and_hydrostatic_magnitude(spark):
    """Updraft (w > 0) gives negative omega; at surface density
    (~1.2 kg/m3) 1 m/s maps to ~ -12 Pa/s; dry air reduces to
    -g p w / (Rd t) exactly."""
    from wrf_to_geodataframe_spark.functions.meteo import omega_from_w

    r = _one(
        spark,
        omega_from_w(F.lit(1.0), F.lit(288.0), F.lit(101325.0),
                     F.lit(0.0)).alias("up"),
        omega_from_w(F.lit(-2.0), F.lit(288.0), F.lit(101325.0),
                     F.lit(0.0)).alias("down"),
    )
    assert r.up == pytest.approx(
        -9.81 * 101325.0 / (287.047 * 288.0), rel=1e-12
    )
    assert -13.0 < r.up < -11.0
    assert r.down == pytest.approx(-2.0 * r.up, rel=1e-12)


def test_reflectivity_clamps_negative_mixing_ratios(spark):
    """Tiny negative q (advection undershoot in real wrfout) must hit
    the -30 dBZ floor, not NaN."""
    r = _one(
        spark,
        reflectivity_dbz(
            F.lit(280.0), F.lit(90000.0), F.lit(0.005), F.lit(-1e-12),
            F.lit(-1e-15), F.lit(-1e-9),
        ).alias("d"),
    )
    assert r.d == pytest.approx(-30.0, abs=1e-9)
