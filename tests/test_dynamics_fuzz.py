"""Seeded randomized fuzz for the stencil/interp operators: random
grids WITH HOLES, batched into one DataFrame per test (one Spark
action for all cases), replayed against explicit numpy/python rules —
the hole conventions are exactly what the gates' complete lattices
never exercise."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.operators.dynamics import (
    centered_diff,
    smooth2d,
)
from wrf_to_geodataframe_spark.operators.vertical import vinterp


def test_centered_diff_random_holes_match_python(spark):
    """30 random pencils, each with random missing coordinates: the
    stencil must yield (f[i+1]-f[i-1])/2h exactly where BOTH dense
    neighbors exist and NULL everywhere else."""
    rng = np.random.default_rng(123)
    rows, want = [], {}
    for g in range(30):
        xs = sorted(rng.choice(20, size=rng.integers(3, 15),
                               replace=False).tolist())
        vals = {x: float(rng.integers(-1024, 1024)) / 32.0 for x in xs}
        for x in xs:
            rows.append((g, x, vals[x]))
            if (x - 1) in vals and (x + 1) in vals:
                want[(g, x)] = (vals[x + 1] - vals[x - 1]) / 8.0
            else:
                want[(g, x)] = None
    df = spark.createDataFrame(rows, "g long, x long, f double")
    got = {
        (r.g, r.x): r.d
        for r in centered_diff(df, "f", "x", 4.0, ["g"], "d").collect()
    }
    assert got == want


def test_smooth2d_random_holes_match_python(spark):
    """Random grids with ~20% of cells missing: a cell smooths only
    when all four dense neighbors are present rows, otherwise it
    passes through unchanged — for one and two passes."""
    rng = np.random.default_rng(321)
    for passes in (1, 2):
        nx, ny = 9, 7
        present = rng.random((ny, nx)) > 0.2
        vals = rng.integers(-256, 256, size=(ny, nx)) / 16.0

        def one_pass(p, v):
            out = {}
            for y in range(ny):
                for x in range(nx):
                    if not p[y, x]:
                        continue
                    ok = (
                        x > 0 and x < nx - 1 and y > 0 and y < ny - 1
                        and p[y, x - 1] and p[y, x + 1]
                        and p[y - 1, x] and p[y + 1, x]
                    )
                    if ok:
                        out[(y, x)] = v[y, x] / 2.0 + (
                            (v[y, x + 1] + v[y, x - 1])
                            + (v[y + 1, x] + v[y - 1, x])
                        ) / 8.0
                    else:
                        out[(y, x)] = v[y, x]
            return out

        state = {
            (y, x): float(vals[y, x])
            for y in range(ny)
            for x in range(nx)
            if present[y, x]
        }
        for _ in range(passes):
            grid = np.zeros((ny, nx))
            for (y, x), v in state.items():
                grid[y, x] = v
            state = one_pass(present, grid)
        rows = [
            (y, x, float(vals[y, x]))
            for y in range(ny)
            for x in range(nx)
            if present[y, x]
        ]
        df = spark.createDataFrame(rows, "y long, x long, f double")
        got = {
            (r.y, r.x): r.fs
            for r in smooth2d(
                df, "f", "x", "y", passes=passes, out_col="fs"
            ).collect()
        }
        assert got == state, passes


def test_vinterp_random_columns_match_python(spark):
    """40 random columns with random strictly-decreasing level sets
    and random targets: bracket interpolation, the smallest-p1 tie
    rule for exact interior hits, NULL out of range."""
    rng = np.random.default_rng(777)
    targets = [900.0, 600.0, 250.0]
    rows, want = [], {}
    for c in range(40):
        nk = int(rng.integers(2, 12))
        ps = sorted(
            rng.choice(np.arange(100, 1100, 25), size=nk,
                       replace=False).tolist(),
            reverse=True,
        )
        fs = [float(rng.integers(-512, 512)) / 8.0 for _ in range(nk)]
        for p, f in zip(ps, fs):
            rows.append((c, float(p), f))
        for t in targets:
            hit = None
            for k in range(nk - 1):
                p1, p2 = float(ps[k]), float(ps[k + 1])
                if p1 >= t >= p2:
                    v = fs[k] + (fs[k + 1] - fs[k]) * (p1 - t) / (p1 - p2)
                    # tie rule: the smallest qualifying p1 wins
                    if hit is None or p1 < hit[0]:
                        hit = (p1, v)
            want[(c, t)] = None if hit is None else hit[1]
    df = spark.createDataFrame(rows, "c long, p double, f double")
    got = {
        (r.c, r.level): r.fv
        for r in vinterp(
            df, "p", "f", targets, ["c"], out_col="fv"
        ).collect()
    }
    assert got == want
