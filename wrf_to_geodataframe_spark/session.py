"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same configuration
keys are the ones that matter on a 1000-executor cluster (AQE, shuffle
partitioning, Arrow batching), so nothing here is local-only.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "wrf_to_geodataframe_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Defaults chosen for the 100 TB design point, not just local tests:

    - AQE on (runtime shuffle-partition coalescing, skew-join splitting,
      broadcast-join conversion after runtime stats) — the engine's main
      answer to skewed grids and unknown selectivities.
    - Arrow execution for every pandas_udf / applyInPandas boundary.
    - UTC session timezone so temporal bucketing (daily resample, SURVEY
      §2 A2) is deterministic and oracle-comparable.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def sf_path(sf_dir: str, table: str) -> str:
    """Path of one driver-generated parquet table under an sf directory."""
    return os.path.join(sf_dir, f"{table}.parquet")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) — Spark has no
    nanosecond timestamp type, so these need special handling."""
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    if os.path.isdir(path):
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not parts:
            return []
        path = os.path.join(path, parts[0])
    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pt.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, table: str):
    """Scan one testdata table; column pruning/filter pushdown handled by
    Catalyst (the reference prunes by hand, wrf_voronoi.py:114-118).

    Parquet TIMESTAMP(NANOS) columns (e.g. ``events.ts``) are read as raw
    nanos (``nanosAsLong``) and truncated to microsecond timestamps with
    exact integer division — the same ns→µs truncation DuckDB applies, so
    oracle comparisons stay bit-identical.
    """
    from pyspark.sql import functions as F

    # Temporal bucketing (to_date in A2) must be timezone-stable no matter
    # who built the session — the driver harness uses its own SparkSession.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = sf_path(sf_dir, table)
    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df
