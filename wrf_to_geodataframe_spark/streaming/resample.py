"""Streaming mirror of the A2 temporal resample (SURVEY.md §2.8).

The reference's ``resample(XTIME="1D")`` is a batch tumbling window; the
streaming form is the same logical aggregation declared over an unbounded
source: ``withWatermark`` bounds state (late rows beyond the watermark
are dropped and their windows finalized), ``window(ts, '1 day')`` is the
tumbling bucket, and the min/max/avg agg is identical to
operators/resample.py — one shuffle, state store per (window, key).

Scale notes: state size is O(open windows x keys); the watermark is what
makes that finite at 100 TB/day ingest.  In production this runs in
append mode (only finalized windows emitted); the equality test uses
complete mode because a bounded availableNow source never advances the
watermark past its own tail.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_events_stream(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """File-source stream over a parquet directory (each new file is a
    micro-batch input — the standard landing-zone pattern)."""
    return spark.readStream.schema(schema).parquet(path)


def stream_resample_daily(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming daily min/max/mean per key with late-data bound.

    Output columns match operators/resample.py's batch shape
    (``day, *keys, v_min, v_max, v_mean``) so batch and stream results
    are directly comparable — the equivalence is asserted in
    tests/test_streaming.py."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "1 day").alias("w"),
            *[F.col(k) for k in keys],
        )
        .agg(
            F.min(value_col).alias("v_min"),
            F.max(value_col).alias("v_max"),
            F.avg(value_col).alias("v_mean"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("day"),
            *[F.col(k) for k in keys],
            "v_min",
            "v_max",
            "v_mean",
        )
    )
