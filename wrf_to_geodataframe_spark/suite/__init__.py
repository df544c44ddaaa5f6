"""The engine's query suite: every implemented operator from SURVEY.md §2
(plus the large-scale pipeline extensions) as a named query with — where
SQL-expressible — a matching DuckDB oracle.

Numeric discipline (SURVEY.md §7 "hard things" #4): any aggregate that
sums floating-point values across rows is order-dependent in the last
bits, and Spark and DuckDB will not sum in the same order.  Every query
here therefore quantizes values to integers (``floor(x * 10^k)`` as
BIGINT) before multi-row sums/averages — integer sums are exact and
order-insensitive — and performs the final scalar division in double,
which is deterministic.  ``min``/``max``/``count`` stay on raw doubles
(exact under any order).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wrf_to_geodataframe_spark.suite import (
    conversions,
    core,
    pipeline,
    relational,
    spatial,
    tessellation,
)

_GROUPS = [core, relational, conversions, spatial, tessellation, pipeline]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for g in _GROUPS:
        overlap = set(out) & set(g.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(g.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for g in _GROUPS:
        out.update(g.ORACLE)
    return out
