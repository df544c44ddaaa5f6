"""Vertical operators (operators/vertical.py): destagger and
interplevel against independent numpy references, including boundary
and out-of-range semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.operators.vertical import (
    destagger,
    interplevel,
)


def test_destagger_matches_numpy_mean(spark):
    rng = np.random.default_rng(7)
    rows = []
    vals = {}
    for g in range(6):
        v = rng.normal(size=11)
        vals[g] = v
        rows += [(g, i, float(v[i])) for i in range(11)]
    df = spark.createDataFrame(rows, "g long, i long, u double")
    got = {
        (r.g, r.i): r.u_m
        for r in destagger(df, "i", "u", ["g"]).collect()
    }
    for g, v in vals.items():
        m = 0.5 * (v[:-1] + v[1:])
        for i in range(10):
            assert got[(g, i)] == pytest.approx(m[i], rel=0, abs=0)
    assert len(got) == 60  # last staggered point dropped per pencil


def test_interplevel_matches_numpy_reference(spark):
    """Random strictly-decreasing pressure columns with per-column
    level counts; targets bracketed at DIFFERENT k per column; NULL
    where out of range; exact level hit returns the level's value."""
    rng = np.random.default_rng(11)
    rows = []
    cols = {}
    for c in range(40):
        nk = rng.integers(4, 12)
        p = np.sort(rng.uniform(100.0, 1000.0, size=nk))[::-1]
        f = rng.normal(size=nk)
        cols[c] = (p, f)
        rows += [
            (c, float(p[k]), float(f[k])) for k in range(nk)
        ]
    df = spark.createDataFrame(rows, "c long, p double, f double")
    target = 480.0
    got = {
        r.c: r.f_interp
        for r in interplevel(df, "p", "f", target, ["c"]).collect()
    }
    assert len(got) == 40
    for c, (p, f) in cols.items():
        if p[0] < target or p[-1] > target:
            assert got[c] is None, c
            continue
        k = int(np.searchsorted(-p, -target, side="left"))
        if p[k] == target:
            want = f[k]
        else:
            k1 = k - 1
            want = f[k1] + (f[k] - f[k1]) * (p[k1] - target) / (
                p[k1] - p[k]
            )
        assert got[c] == pytest.approx(want, rel=1e-12), c


def test_interplevel_exact_level_hit_single_row(spark):
    """A target exactly on an interior level yields that level's value
    ONCE (the double-bracket tie dedupes), and a target equal to the
    bottom level interpolates with factor 1 -> the bottom value."""
    rows = [(0, 900.0, 1.0), (0, 800.0, 2.0), (0, 700.0, 3.0)]
    df = spark.createDataFrame(rows, "c long, p double, f double")
    out = interplevel(df, "p", "f", 800.0, ["c"]).collect()
    assert len(out) == 1 and out[0].f_interp == 2.0
    out2 = interplevel(df, "p", "f", 900.0, ["c"]).collect()
    assert len(out2) == 1 and out2[0].f_interp == 1.0


def test_precipitable_water_matches_numpy_integral(spark):
    rng = np.random.default_rng(3)
    rows, want = [], {}
    for c in range(20):
        nk = int(rng.integers(3, 12))
        qv = rng.integers(1, 20, size=nk) / 1024.0  # dyadic
        dp = rng.integers(50, 120, size=nk) * 100.0
        want[c] = float((qv * dp).sum() / 9810.0)
        rows += [(c, float(qv[k]), float(dp[k])) for k in range(nk)]
    from wrf_to_geodataframe_spark.operators.vertical import (
        precipitable_water,
    )

    df = spark.createDataFrame(rows, "c long, qv double, dp double")
    got = {
        r.c: r.pw_mm
        for r in precipitable_water(df, "qv", "dp", ["c"]).collect()
    }
    for c in want:
        assert got[c] == pytest.approx(want[c], rel=1e-15), c


def test_cloud_top_temperature_picks_highest_cloudy_level(spark):
    from wrf_to_geodataframe_spark.operators.vertical import (
        cloud_top_temperature,
    )

    rows = [
        # column 0: cloud at k=2 (p=820) and k=5 (p=550) -> pick p=550
        (0, 1000.0, 280.0, 0.0),
        (0, 820.0, 270.0, 2e-4),
        (0, 550.0, 250.0, 1e-4),
        (0, 400.0, 230.0, 0.0),
        # column 1: clear sky -> NULL
        (1, 1000.0, 281.0, 0.0),
        (1, 500.0, 240.0, 9e-7),  # below threshold
    ]
    df = spark.createDataFrame(rows, "c long, p double, t double, qcl double")
    got = {
        r.c: r.ctt_k
        for r in cloud_top_temperature(df, "p", "t", "qcl", ["c"]).collect()
    }
    assert got[0] == 250.0
    assert got[1] is None
