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
    lcc_cone,
    relative_humidity,
    sat_vapor_pressure_hpa,
    slp_hypsometric,
    temperature_k,
    uvmet,
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
