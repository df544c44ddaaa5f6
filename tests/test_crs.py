"""G8 CRS transform: expression path vs Arrow pandas_udf path parity,
and round-trip inversion."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.functions.crs import (
    lonlat_to_webmercator_x,
    lonlat_to_webmercator_y,
    webmercator_pandas_udf,
    webmercator_to_lat,
    webmercator_to_lon,
)


def _lonlat_df(spark):
    return spark.range(100).select(
        (F.col("id").cast("double") * 0.7 - 35.0).alias("lon"),
        (F.col("id").cast("double") * 0.8 - 40.0).alias("lat"),
    )


def test_expression_and_pandas_udf_agree(spark):
    df = _lonlat_df(spark)
    udf = webmercator_pandas_udf()
    rows = df.select(
        lonlat_to_webmercator_x(F.col("lon")).alias("ex"),
        lonlat_to_webmercator_y(F.col("lat")).alias("ey"),
        udf(F.col("lon"), F.col("lat")).alias("u"),
    ).collect()
    for r in rows:
        # numpy and JVM trig agree to ~1 ulp; meters-scale values
        assert abs(r.ex - r.u.x) < 1e-6
        assert abs(r.ey - r.u.y) < 1e-6


def test_roundtrip_inverse(spark):
    df = _lonlat_df(spark)
    rows = df.select(
        "lon", "lat",
        webmercator_to_lon(lonlat_to_webmercator_x(F.col("lon"))).alias("lon2"),
        webmercator_to_lat(lonlat_to_webmercator_y(F.col("lat"))).alias("lat2"),
    ).collect()
    for r in rows:
        assert abs(r.lon - r.lon2) < 1e-9
        assert abs(r.lat - r.lat2) < 1e-9


def test_known_value(spark):
    # equator/prime meridian maps to origin; lat 45 known closed form
    rows = (
        spark.createDataFrame([(0.0, 0.0), (180.0, 45.0)], "lon double, lat double")
        .select(
            lonlat_to_webmercator_x(F.col("lon")).alias("x"),
            lonlat_to_webmercator_y(F.col("lat")).alias("y"),
        )
        .collect()
    )
    assert rows[0].x == 0.0
    assert abs(rows[0].y) < 1e-8  # tan(pi/4) != 1.0 exactly in FP
    assert abs(rows[1].x - 6378137.0 * math.pi) < 1e-6
    assert abs(rows[1].y - 6378137.0 * math.log(math.tan(3 * math.pi / 8))) < 1e-6


# ---------------------------------------------------------------------------
# EPSG:27700 (OSGB36 / British National Grid)

from wrf_to_geodataframe_spark.functions.crs import (  # noqa: E402
    lonlat_to_osgb,
    osgb36_geodetic_to_grid_numpy,
    osgb_pandas_udf,
)


def test_osgb_tm_matches_os_worked_example():
    """OS guide Annex C worked example: 52deg39'27.2531\"N 1deg43'4.5177\"E
    (OSGB36 geodetic) -> 651409.903 E, 313177.270 N."""
    phi = math.radians(52 + 39 / 60 + 27.2531 / 3600)
    lam = math.radians(1 + 43 / 60 + 4.5177 / 3600)
    E, N = osgb36_geodetic_to_grid_numpy(phi, lam)
    assert abs(E - 651409.903) < 2e-3
    assert abs(N - 313177.270) < 2e-3


def test_osgb_full_chain_within_helmert_envelope(spark):
    """The same station's ETRS89 coordinates through the full WGS84 chain
    (cartesian -> Helmert -> TM) must land within the documented accuracy
    of the small Helmert transform (~3.5 m vs the OSTN grid truth)."""
    lat = 52 + 39 / 60 + 28.8282 / 3600
    lon = 1 + 42 / 60 + 57.8663 / 3600
    df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
    r = lonlat_to_osgb(df, F.col("lon"), F.col("lat")).collect()[0]
    assert abs(r.easting - 651409.903) < 5.0
    assert abs(r.northing - 313177.270) < 5.0


def test_osgb_expression_and_pandas_udf_agree(spark):
    df = spark.range(200).select(
        (F.col("id") % 20 * 0.4 - 7.0).alias("lon"),
        (F.floor(F.col("id") / 20) * 1.1 + 50.0).alias("lat"),
    )
    udf = osgb_pandas_udf()
    rows = (
        lonlat_to_osgb(df, F.col("lon"), F.col("lat"))
        .withColumn("u", udf(F.col("lon"), F.col("lat")))
        .collect()
    )
    for r in rows:
        # same formulas, JVM vs numpy libm: agree far below mm
        assert abs(r.easting - r.u.easting) < 1e-6
        assert abs(r.northing - r.u.northing) < 1e-6


def test_osgb_inverse_round_trips_forward(spark):
    """WGS84 -> grid -> WGS84 must close to a few mm over a GB-wide
    lattice.  The bound is 5e-8 deg (~5 mm): the inverse TM iterates to
    sub-nanometre and the Helmert inverse is an exact fixed-point
    solve, but any 2-D datum chain drops the intermediate ellipsoidal
    height (the Helmert-shifted point is ~50 m off the Airy ellipsoid),
    and reconstructing at h=0 costs ~1.5 mm — the same closure a
    pyproj 2-D 7-parameter pipeline has, and 3 orders below the 3.5 m
    Helmert-vs-OSTN15 model error."""
    import numpy as np

    from wrf_to_geodataframe_spark.functions.crs import (
        osgb_inverse_pandas_udf,
        osgb_pandas_udf,
    )

    lons = np.linspace(-6.0, 1.5, 6)
    lats = np.linspace(50.0, 58.5, 6)
    rows = [
        (float(lo), float(la)) for lo in lons for la in lats
    ]
    df = spark.createDataFrame(rows, "lon double, lat double")
    fwd = osgb_pandas_udf()
    inv = osgb_inverse_pandas_udf()
    out = (
        df.withColumn("en", fwd("lon", "lat"))
        .withColumn("ll", inv("en.easting", "en.northing"))
        .select("lon", "lat", "ll.lon", "ll.lat")
        .collect()
    )
    assert len(out) == 36
    for lon, lat, lon2, lat2 in out:
        # 5e-8 deg ~ 5 mm (see docstring for the height-drop floor)
        assert abs(lon2 - lon) < 5e-8, (lon, lon2)
        assert abs(lat2 - lat) < 5e-8, (lat, lat2)


def test_osgb_inverse_tm_matches_worked_example():
    """Inverse TM alone reproduces the OS guide worked-example OSGB36
    geodetic coordinates from its published E/N to ~1e-10 rad."""
    import math

    import numpy as np

    from wrf_to_geodataframe_spark.functions.crs import (
        osgb_grid_to_geodetic_numpy,
    )

    phi_want = math.radians(52 + 39 / 60 + 27.2531 / 3600)
    lam_want = math.radians(1 + 43 / 60 + 4.5177 / 3600)
    phi, lam = osgb_grid_to_geodetic_numpy(
        np.array([651409.903]), np.array([313177.270])
    )
    assert abs(phi[0] - phi_want) < 1e-9
    assert abs(lam[0] - lam_want) < 1e-9
