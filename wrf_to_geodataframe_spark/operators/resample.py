"""Temporal resampling (SURVEY.md §2 A2/A3).

The reference resamples hourly temperature to daily min/max/mean and then
averages over the whole period, as three separate xarray passes
(``wrf_voronoi.py:156-173``: ``ds.resample(XTIME="1D").min().mean("XTIME")``
etc.).  Here both levels are single shuffles and all three statistics are
computed in ONE aggregation each — a 3× scan saving over the reference,
and partial (map-side) aggregation halves the shuffled bytes for free.

Quantization: with ``quantize=None`` the stats are plain double
min/max/avg (xarray-equivalent, but double sums are partition-order
dependent in the last bits).  With ``quantize=10**k`` every value is
floored to an exact BIGINT at 10^-k resolution before any multi-row sum,
making the result bit-exact under ANY execution order — the form the
DuckDB-oracle suite needs (SURVEY.md §7 hard-thing #4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quant(col: Column, q: int) -> Column:
    return F.floor(col * F.lit(float(q))).cast("long")


def resample_daily(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    quantize: int | None = None,
) -> DataFrame:
    """Tumbling 1-day window per key: min/max/mean of ``value_col``.

    Batch equivalent of ``ds.resample(XTIME="1D")`` at
    ``wrf_voronoi.py:157,163,169`` — one groupBy instead of three.
    Output: ``keys + [day, v_min, v_max, v_mean]`` (``*_q`` BIGINT
    columns when ``quantize`` is set).
    """
    g = df.groupBy(F.to_date(F.col(ts_col)).alias("day"), *[F.col(k) for k in keys])
    if quantize is None:
        return g.agg(
            F.min(value_col).alias("v_min"),
            F.max(value_col).alias("v_max"),
            F.avg(value_col).alias("v_mean"),
        )
    v = _quant(F.col(value_col), quantize)
    return g.agg(
        F.min(v).alias("v_min_q"),
        F.max(v).alias("v_max_q"),
        # daily mean re-quantized: exact-int sum / count, then one
        # deterministic floor — stays in the exact-BIGINT domain
        F.floor(F.sum(v).cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("v_mean_q"),
    )


def period_mean_of_daily(
    daily: DataFrame,
    keys: Sequence[str],
    quantize: int | None = None,
) -> DataFrame:
    """Second-stage mean over days (SURVEY.md §2 A3,
    ``wrf_voronoi.py:160,166,172`` ``.mean("XTIME")``): per-key period
    average of the daily statistics → ``t_min/t_max/t_mean`` columns,
    mirroring the reference's ``Tmin``/``Tmax``/``Tmean``."""
    g = daily.groupBy(*[F.col(k) for k in keys])
    if quantize is None:
        return g.agg(
            F.avg("v_min").alias("t_min"),
            F.avg("v_max").alias("t_max"),
            F.avg("v_mean").alias("t_mean"),
        )
    q = F.lit(float(quantize))
    n = F.count(F.lit(1))
    return g.agg(
        (F.sum("v_min_q").cast("double") / n / q).alias("t_min"),
        (F.sum("v_max_q").cast("double") / n / q).alias("t_max"),
        (F.sum("v_mean_q").cast("double") / n / q).alias("t_mean"),
    )


def daily_stats_period_mean(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    quantize: int | None = None,
) -> DataFrame:
    """The reference's flagship analysis (``wrf_voronoi.py:156-173``):
    daily min/max/mean per cell, then period mean of each daily stat.

    Two shuffles total (day+keys, then keys); both stages benefit from
    partial aggregation, and the second shuffle is strictly smaller than
    the first, so the plan scales linearly with input rows.
    """
    return period_mean_of_daily(
        resample_daily(df, ts_col, value_col, keys, quantize), keys, quantize
    )
