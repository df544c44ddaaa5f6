"""Streaming A2 mirror: the windowed streaming aggregation must produce
exactly the batch resample's rows once the bounded source is drained."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_resample_matches_batch(spark, sf_dir, tmp_path):
    from wrf_to_geodataframe_spark.operators.resample import resample_daily
    from wrf_to_geodataframe_spark.session import load_table
    from wrf_to_geodataframe_spark.streaming.resample import (
        read_events_stream,
        stream_resample_daily,
    )

    events = load_table(spark, sf_dir, "events").select("ts", "user_id", "value")
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)  # landing-zone directory for the file source

    stream = read_events_stream(spark, src, events.schema)
    assert stream.isStreaming
    agg = stream_resample_daily(stream, "ts", "value", ["user_id"])

    q = (
        agg.writeStream.format("memory")
        .queryName("daily_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    got = {
        (r.day, r.user_id): (r.v_min, r.v_max, r.v_mean)
        for r in spark.table("daily_stream").collect()
    }
    want = {
        (r.day, r.user_id): (r.v_min, r.v_max, r.v_mean)
        for r in resample_daily(events, "ts", "value", ["user_id"]).collect()
    }
    assert set(got) == set(want)
    for k, (mn, mx, mean) in want.items():
        gmn, gmx, gmean = got[k]
        assert gmn == mn and gmx == mx
        assert abs(gmean - mean) < 1e-9


def test_watermark_is_declared(spark, sf_dir, tmp_path):
    """The plan must carry the event-time watermark (the state bound —
    without it the 100 TB streaming story is a memory leak)."""
    from wrf_to_geodataframe_spark.session import load_table
    from wrf_to_geodataframe_spark.streaming.resample import (
        read_events_stream,
        stream_resample_daily,
    )

    events = load_table(spark, sf_dir, "events").select("ts", "user_id", "value")
    src = str(tmp_path / "events_stream_wm")
    events.write.parquet(src)
    agg = stream_resample_daily(
        read_events_stream(spark, src, events.schema), "ts", "value", ["user_id"]
    )
    assert "EventTimeWatermark" in agg._jdf.queryExecution().logical().toString()
