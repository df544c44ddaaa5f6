"""Independent semantics tests for the relational suite — hand-computed
expectations on tiny in-memory frames, NOT the mirrored DuckDB oracle
(which validates execution, not intent)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

UTC = dt.timezone.utc


def test_window_rank_picks_latest_per_key(spark):
    rows = [
        (1, 10, dt.datetime(2024, 1, 1, 5, tzinfo=UTC), 1.0),
        (2, 10, dt.datetime(2024, 1, 2, 5, tzinfo=UTC), 2.0),  # latest for 10
        (3, 20, dt.datetime(2024, 1, 1, 0, tzinfo=UTC), 3.0),  # only row for 20
        (4, 10, dt.datetime(2024, 1, 2, 5, tzinfo=UTC), 4.0),  # ts tie -> higher id
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    out = {
        r["user_id"]: r["event_id"]
        for r in df.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    }
    assert out == {10: 4, 20: 3}


def test_set_ops_semantics(spark):
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    b = spark.createDataFrame([(2,), (4,)], "k long")
    assert sorted(r.k for r in a.union(b).distinct().collect()) == [1, 2, 3, 4]
    assert sorted(r.k for r in a.intersect(b).collect()) == [2]
    # subtract = EXCEPT DISTINCT: duplicates in a collapse, matches drop
    assert sorted(r.k for r in a.subtract(b).collect()) == [1, 3]


def test_json_extract_and_null_handling(spark):
    df = spark.createDataFrame(
        [('{"k": 7}',), ('{"x": 1}',), (None,)], "props string"
    )
    k = F.get_json_object("props", "$.k").cast("long")
    got = df.select(k.alias("k")).collect()
    assert [r.k for r in got] == [7, None, None]


def test_rollup_produces_subtotals_and_grand_total(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1)], "t string, d int"
    )
    rows = df.rollup("t", "d").agg(F.count(F.lit(1)).alias("n")).collect()
    got = {(r.t, r.d): r.n for r in rows}
    assert got[("a", 1)] == 1 and got[("a", 2)] == 1 and got[("b", 1)] == 1
    assert got[("a", None)] == 2 and got[("b", None)] == 1  # subtotals
    assert got[(None, None)] == 3  # grand total


def test_rolling_mean_frame_bounds(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)], "i long, v double"
    )
    w = Window.orderBy("i").rowsBetween(-2, Window.currentRow)
    got = [r.m for r in df.select((F.avg("v").over(w)).alias("m")).collect()]
    assert got == [1.0, 1.5, 2.0, 3.0]


def test_time_slice_is_second_distinct_day(spark, sf_dir):
    from wrf_to_geodataframe_spark.session import load_table
    from wrf_to_geodataframe_spark.suite.relational import p3_time_slice

    events = load_table(spark, sf_dir, "events")
    days = sorted(
        r.day for r in events.select(F.to_date("ts").alias("day")).distinct().collect()
    )
    out_days = {r.day.date() for r in p3_time_slice(spark, sf_dir).collect()}
    assert out_days == {days[1]}  # isel(time=1): the SECOND timestep


def test_except_distinct_drops_all_error_pairs(spark, sf_dir):
    from wrf_to_geodataframe_spark.suite.relational import set_except

    out = set_except(spark, sf_dir).collect()
    assert len(out) > 0
    assert all(r.event_type != "error" for r in out)
