"""Time-series analytics over the event stream — the A-family's
calendar operators generalized to the analyses a reference user runs
after the regrid (delphine/regrid.py resamples to daily means and then
thresholds/aggregates downstream): climatology removal, run-length
episodes, and sequence-transition statistics.

Numeric discipline (suite/__init__.py header): values quantize to a
BIGINT lattice before any cross-row sum, so Spark's and DuckDB's
summation orders cannot diverge; the only double divisions are one
per OUTPUT ROW, which is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.session import load_table

_Q = 100  # events.value carries 2 decimals; floor(value*100) is exact


def ts_climatology_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIURNAL-CLIMATOLOGY ANOMALY (the reference's "subtract the mean
    annual/daily cycle" step re-expressed on the events stream): per
    (event_type, hour-of-day) climatology, then the largest positive
    and negative departures from it.

    Exactness: with ``vq = floor(value*100)`` (BIGINT) the anomaly's
    NUMERATOR ``vq*n - sum(vq)`` is exact integer arithmetic — the
    per-row double division by ``100*n`` happens once per output row.
    One scan, one partial-agg shuffle (the climatology), and the
    anomaly extrema come from a second aggregation over the SAME
    grouped rows — a self-join-free two-level agg: at 100 TB this is
    two map-side-combinable shuffles on a 24×|types| key space."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hod"),
        F.floor(F.col("value") * _Q).cast("bigint").alias("vq"),
    )
    clim = ev.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vq").alias("sq")
    )
    return (
        ev.join(F.broadcast(clim), ["event_type", "hod"])
        .withColumn("dev", F.col("vq") * F.col("n") - F.col("sq"))
        .groupBy("event_type", "hod")
        .agg(
            F.max("n").alias("n"),
            (F.max("sq") / F.max("n") / _Q).alias("clim_mean"),
            (F.max("dev") / (F.max("n") * float(_Q))).alias("max_pos_anom"),
            (F.min("dev") / (F.max("n") * float(_Q))).alias("max_neg_anom"),
        )
    )


_TS_CLIM_SQL = f"""
WITH q AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hod,
         CAST(FLOOR(value * {_Q}) AS BIGINT) AS vq
  FROM events
), c AS (
  SELECT event_type, hod, COUNT(*) AS n, SUM(vq) AS sq
  FROM q GROUP BY 1, 2
)
SELECT q.event_type, q.hod,
       MAX(c.n) AS n,
       MAX(c.sq) * 1.0 / MAX(c.n) / {_Q} AS clim_mean,
       MAX(q.vq * c.n - c.sq) / (MAX(c.n) * {_Q}.0) AS max_pos_anom,
       MIN(q.vq * c.n - c.sq) / (MAX(c.n) * {_Q}.0) AS max_neg_anom
FROM q JOIN c USING (event_type, hod)
GROUP BY 1, 2
"""


_STREAK_T = 15.0  # daily-max threshold defining an "episode day"


def ts_streak_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPISODE RUN-LENGTHS (the heat-wave query: longest streak of
    consecutive DAYS whose daily maximum exceeds a threshold, per
    entity) via gaps-and-islands — ``day_number - row_number`` is
    constant exactly on consecutive-day runs, so islands fall out of
    one window function with NO self-join and NO iteration.

    Days are integer offsets (``datediff`` from the epoch of the
    dataset) rather than DATE values end to end — exact arithmetic and
    no calendar-dtype mismatch between engines.  Scale shape: the
    daily-max aggregation is a map-side-combinable shuffle on
    (user, day); the window partitions by user — the same key — so AQE
    coalesces the two into one exchange."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
            .cast("bigint")
            .alias("day"),
            "value",
        )
        .groupBy("user_id", "day")
        .agg(F.max("value").alias("dmax"))
        .filter(F.col("dmax") > _STREAK_T)
    )
    w = Window.partitionBy("user_id").orderBy("day")
    runs = (
        daily.withColumn(
            "island", F.col("day") - F.row_number().over(w)
        )
        .groupBy("user_id", "island")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("day").alias("run_start"),
        )
    )
    return runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_run"),
        F.count(F.lit(1)).alias("n_runs"),
        F.min("run_start").alias("first_run_start"),
    )


_TS_STREAK_SQL = f"""
WITH daily AS (
  SELECT user_id,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         MAX(value) AS dmax
  FROM events GROUP BY 1, 2
  HAVING MAX(value) > {_STREAK_T}
), runs AS (
  SELECT user_id,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
             AS island,
         day
  FROM daily
), islands AS (
  SELECT user_id, island, COUNT(*) AS run_len, MIN(day) AS run_start
  FROM runs GROUP BY 1, 2
)
SELECT user_id, MAX(run_len) AS longest_run, COUNT(*) AS n_runs,
       MIN(run_start) AS first_run_start
FROM islands GROUP BY 1
"""


def ts_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE TRANSITION MATRIX: per-entity event streams ordered by
    time, counting each (previous event_type -> event_type) bigram —
    the Markov-chain summary of behavioral/weather-regime sequences
    (and the sequence analog of the token bigrams in quality_lm_score,
    suite/pipeline.py).  Ties in ``ts`` break on event_id so both
    engines see one deterministic sequence.

    Scale shape: one window shuffle partitioned by user (bounded
    per-partition state), then a map-side-combinable count on a
    |types|^2 key space — no self-join on the sequence."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_TS_TRANS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type, event_type,
       COUNT(*) AS n_transitions,
       COUNT(DISTINCT user_id) AS n_users
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def ts_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAST-SQUARES TREND per event type — the climate-trend query
    (slope of value against day index) with EVERY cross-row sum kept
    in exact BIGINT: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx) and
    intercept = (Sy*Sxx - Sx*Sxy) / same, where x is the integer day
    offset and y the quantized value — the two double divisions happen
    once per OUTPUT row, so Spark and DuckDB agree bitwise.  (Built-in
    ``regr_slope`` sums doubles in engine-specific order; this closed
    form is the quantization discipline applied to regression.)

    One scan, one map-side-combinable shuffle on |types| keys."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
        .cast("bigint")
        .alias("x"),
        F.floor(F.col("value") * _Q).cast("bigint").alias("y"),
    )
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        "event_type",
        "n",
        ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         / den / _Q).alias("slope_per_day"),
        ((F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
         / den / _Q).alias("intercept"),
    )


_TS_TREND_SQL = f"""
WITH q AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         CAST(FLOOR(value * {_Q}) AS BIGINT) AS y
  FROM events
), a AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(x AS BIGINT)) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS BIGINT) * y) AS sxy,
         SUM(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS sxx
  FROM q GROUP BY 1
)
SELECT event_type, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) / {_Q} AS slope_per_day,
       CAST(sy * sxx - sx * sxy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) / {_Q} AS intercept
FROM a
"""


# Morton spread of a 16-bit integer via multiply-and-mask (the shifts
# written as *2^k so the SAME formula text runs on Spark and DuckDB)
def _morton_spread(col: str) -> str:
    v = f"CAST({col} AS BIGINT)"
    v = f"(({v} | ({v} * 65536)) & 281470681808895)"   # 0x0000FFFF0000FFFF
    v = f"(({v} | ({v} * 256)) & 71777214294589695)"   # 0x00FF00FF00FF00FF
    v = f"(({v} | ({v} * 16)) & 1085102592571150095)"  # 0x0F0F0F0F0F0F0F0F
    v = f"(({v} | ({v} * 4)) & 3689348814741910323)"   # 0x3333333333333333
    v = f"(({v} | ({v} * 2)) & 6148914691236517205)"   # 0x5555555555555555
    return v


def ts_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton) LAYOUT KEY — the space-filling-curve clustering
    key used to sort a 100-TB spatial table so that bbox queries touch
    few row groups (the `OPTIMIZE ZORDER BY` idea as a pure-SQL
    expression): 16-bit y/x cell indices interleave via five
    multiply-and-mask rounds (no UDF, whole-stage-codegen friendly; the
    identical formula text is the oracle, so the bit arithmetic itself
    is under the gate).  Returns per-z-bucket occupancy — adjacent
    buckets are spatially adjacent quads, which is the locality
    property the sort exploits.

    Scale shape: the key is a projection (zero shuffle); the bucket
    histogram is one map-side-combinable aggregation."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("pmod(event_id, 64)").cast("bigint").alias("yc"),
        F.expr("pmod(user_id * 7 + event_id, 64)")
        .cast("bigint")
        .alias("xc"),
        F.floor(F.col("value") * _Q).cast("bigint").alias("vq"),
    )
    z = f"({_morton_spread('yc')} * 2) | {_morton_spread('xc')}"
    return (
        # FLOOR, not CAST: DuckDB CAST(double->BIGINT) rounds to
        # nearest while Spark truncates — floor agrees on both
        ev.withColumn(
            "zbucket", F.expr(f"CAST(FLOOR(({z}) / 256) AS BIGINT)")
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("vq").alias("sum_vq"),
        )
    )


_ZS_Y = _morton_spread("yc")
_ZS_X = _morton_spread("xc")
_TS_ZORDER_SQL = f"""
WITH q AS (
  SELECT CAST(event_id % 64 AS BIGINT) AS yc,
         CAST((user_id * 7 + event_id) % 64 AS BIGINT) AS xc,
         CAST(FLOOR(value * {_Q}) AS BIGINT) AS vq
  FROM events
)
SELECT CAST(FLOOR((({_ZS_Y} * 2) | {_ZS_X}) / 256) AS BIGINT) AS zbucket,
       COUNT(*) AS n_cells,
       CAST(SUM(vq) AS BIGINT) AS sum_vq
FROM q GROUP BY 1
"""


QUERIES = {
    "ts_climatology_anomaly": ts_climatology_anomaly,
    "ts_streak_runs": ts_streak_runs,
    "ts_transition_matrix": ts_transition_matrix,
    "ts_trend_per_type": ts_trend_per_type,
    "ts_zorder_layout": ts_zorder_layout,
}

ORACLE = {
    "ts_climatology_anomaly": _TS_CLIM_SQL,
    "ts_streak_runs": _TS_STREAK_SQL,
    "ts_transition_matrix": _TS_TRANS_SQL,
    "ts_trend_per_type": _TS_TREND_SQL,
    "ts_zorder_layout": _TS_ZORDER_SQL,
}
