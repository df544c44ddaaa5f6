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
