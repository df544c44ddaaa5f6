"""Bucketed-table helpers: shuffle-free co-located joins at scale.

The 100 TB story for repeated large-x-large joins (fact-to-fact, the
flagship events/lineitem shapes): pre-bucket BOTH tables on the join
key with ``bucketBy`` so every subsequent join is planned WITHOUT a
shuffle exchange on either side — the bucket layout IS the hash
partitioning, persisted on disk.  This is standard Spark machinery
(`DataFrameWriter.bucketBy` + a table catalog); these helpers wrap the
session-local-warehouse ceremony and the plan checks so pipelines (and
tests) can assert the no-exchange property instead of hoping for it.

Cost model (docstring contract for users): bucketing pays ONE shuffle
at write time and amortizes it over every later join/aggregation on
the bucket key; at 1000 executors the join stage reads bucket i of
both tables on the same task with zero network traffic.  Bucket count
should target HDFS-block-sized buckets (~128-256 MB) — a parameter,
not a constant, because it scales with table size.

No reference counterpart (the reference holds everything in one numpy
process); this is engine-level scale machinery like
``operators/skew.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet-backed bucketed (and per-bucket
    sorted, for SMJ-without-sort plans) table in the session catalog."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *keys
    )
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys —
    planned shuffle-free when bucket specs line up."""
    return spark.table(left).join(spark.table(right), on)


def join_is_shuffle_free(df: DataFrame) -> bool:
    """True when the physical plan contains NO shuffle exchange —
    the property bucketing exists to buy.  (AQE keeps the exchanges
    it inserted visible in the pre-execution plan, so this is checked
    on ``executedPlan`` before any action.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
