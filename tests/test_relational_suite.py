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


def _asof_union_window(spark, ev_rows, probe_rows):
    """Run the engine's asof composition on in-memory frames (same code
    shape as suite.relational.j_asof_join, parameterized for fixtures)."""
    ev = spark.createDataFrame(
        ev_rows, "user_id long, ts timestamp, event_id long, value double"
    )
    probes = spark.createDataFrame(probe_rows, "user_id long, t timestamp")
    tagged_p = probes.select(
        "user_id", "t", F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    tagged_e = ev.select(
        "user_id", F.col("ts").alias("t"), F.lit(1).alias("tag"),
        "event_id", "value",
    )
    u = tagged_p.unionByName(tagged_e)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    le = F.last(
        F.when(F.col("tag") == 1, F.struct("t", "event_id", "value")),
        ignorenulls=True,
    ).over(w)
    return (
        u.withColumn("le", le)
        .filter((F.col("tag") == 0) & F.col("le").isNotNull())
        .select("user_id", "t", F.col("le.event_id").alias("asof_id"))
        .collect()
    )


def test_asof_join_strictly_before_and_latest(spark):
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m, tzinfo=UTC)
    ev = [
        (1, t(9), 100, 1.0),
        (1, t(11, 30), 101, 2.0),
        (1, t(12), 102, 3.0),   # exactly at the noon probe -> excluded (strict <)
        (1, t(13), 103, 4.0),   # after the probe -> excluded
        (2, t(14), 200, 5.0),   # first event after probe -> user 2 has no match
    ]
    probes = [(1, t(12)), (2, t(12))]
    got = {
        (r.user_id, r.t.replace(tzinfo=UTC)): r.asof_id
        for r in _asof_union_window(spark, ev, probes)
    }
    # user 1: latest strictly before noon is 11:30 (not the 12:00 tie)
    assert got == {(1, t(12)): 101}


def test_range_join_pairs_within_window_across_bucket_boundary(spark):
    from wrf_to_geodataframe_spark.suite.relational import j_range_join

    # fixture via the real query on sf0.001, validated against a naive
    # O(n^2) pandas computation
    out = j_range_join(spark, "/root/testdata/sf0.001")
    got = {(r.da, r.db): r.delta_us for r in out.collect()}
    import pandas as pd

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    exp = {}
    for _, grp in ev.groupby("user_id"):
        g = grp.sort_values("ts")
        # unit-robust epoch micros (testdata has shipped both ns and us)
        ts = g["ts"].astype("datetime64[us]").astype("int64")
        ids = g["event_id"].to_numpy()
        tv = ts.to_numpy()
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                d = int(tv[j] - tv[i])
                if 0 < d < 3_600_000_000:
                    exp[(int(ids[i]), int(ids[j]))] = d
    assert got == exp


def test_sample_hash_is_partition_invariant(spark):
    from wrf_to_geodataframe_spark.suite.relational import sample_hash

    base = {
        (r.l_returnflag, r.n_sampled, r.price_cents)
        for r in sample_hash(spark, "/root/testdata/sf0.001").collect()
    }
    # same query over a repartitioned copy must select the same rows
    from wrf_to_geodataframe_spark.functions.text import hash60

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").repartition(17)
    key = F.concat(
        F.col("l_orderkey").cast("string"), F.lit("_"),
        F.col("l_linenumber").cast("string"),
    )
    again = {
        (r.l_returnflag, r.n_sampled, r.price_cents)
        for r in li.filter(hash60(key) % 20 == 0)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("price_cents"),
        )
        .collect()
    }
    assert base == again


def test_unpivot_roundtrips_wide_stats(spark):
    from wrf_to_geodataframe_spark.suite.relational import unpivot_long

    out = unpivot_long(spark, "/root/testdata/sf0.001").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, {})[r.metric] = r.metric_value
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exp = {
        r.user_id: {"n_events": float(r.n), "v_min": r.mn, "v_max": r.mx}
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    assert by_user == exp


def test_asof_join_matches_naive_reference_randomized(spark):
    """Randomized cross-check of the union+window asof composition
    against a naive per-probe scan (fixed seed, includes equal-ts
    probe/event collisions)."""
    import numpy as np

    rng = np.random.default_rng(11)
    n_ev, n_probe = 300, 60
    ev_rows = []
    base = dt.datetime(2024, 3, 1, tzinfo=UTC)
    for i in range(n_ev):
        u = int(rng.integers(0, 5))
        # coarse second resolution ensures some exact ts collisions
        ts = base + dt.timedelta(seconds=int(rng.integers(0, 500)))
        ev_rows.append((u, ts, i, float(rng.uniform(0, 100))))
    probe_rows = []
    for _ in range(n_probe):
        u = int(rng.integers(0, 5))
        ts = base + dt.timedelta(seconds=int(rng.integers(0, 500)))
        probe_rows.append((u, ts))
    probe_rows = sorted(set(probe_rows))
    got = {
        (r.user_id, r.t.replace(tzinfo=UTC)): r.asof_id
        for r in _asof_union_window(spark, ev_rows, probe_rows)
    }
    exp = {}
    for u, pts in probe_rows:
        cands = [
            (ts, eid) for (eu, ts, eid, _v) in ev_rows if eu == u and ts < pts
        ]
        if cands:
            exp[(u, pts)] = max(cands)[1]  # latest ts, then highest id
    assert got == exp


def test_funnel_requires_strict_order(spark, tmp_path):
    """Funnel semantics: a click BEFORE the first view must not count,
    and a purchase only counts after a qualifying click."""
    import pandas as pd

    rows = [
        # user 1: click(1h) < view(2h) -> click doesn't qualify; the
        # 3h click does; purchase at 4h qualifies
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "view"),
        (1, "2024-01-01 03:00:00", "click"),
        (1, "2024-01-01 04:00:00", "purchase"),
        # user 2: purchase before any click -> stops at view
        (2, "2024-01-01 01:00:00", "view"),
        (2, "2024-01-01 02:00:00", "purchase"),
        # user 3: no view at all -> absent from the funnel
        (3, "2024-01-01 01:00:00", "click"),
    ]
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[0] for r in rows],
            "event_type": [r[2] for r in rows],
            "value": 1.0,
            "props": "{}",
        }
    ).to_parquet(str(tmp_path / "events.parquet"))
    from wrf_to_geodataframe_spark.suite.relational import (
        funnel_view_click_purchase,
    )

    out = {r.user_id: r for r in funnel_view_click_purchase(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}
    assert out[1].t_click.hour == 3 and out[1].t_purchase.hour == 4
    assert out[2].t_click is None and out[2].t_purchase is None
