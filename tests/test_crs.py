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
