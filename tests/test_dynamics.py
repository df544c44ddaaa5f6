"""Dynamics operators (operators/dynamics.py): physical identities and
a numpy finite-difference cross-check, independent of the class-B
closed-form oracles in suite/dynamics.py."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.operators.dynamics import (
    OMEGA_E,
    absolute_vorticity,
    centered_diff,
    coriolis_parameter,
    storm_relative_helicity,
    updraft_helicity,
)


def _grid(spark, nx, ny):
    return (
        spark.range(ny)
        .select(F.col("id").alias("y"))
        .select(
            "y",
            F.explode(F.sequence(F.lit(0), F.lit(nx - 1))).alias("x"),
        )
    )


def test_centered_diff_matches_numpy_interior(spark):
    """Random dyadic field: the lag/lead stencil must equal numpy's
    explicit (f[i+1]-f[i-1])/(2h) on the interior, NULL at both ends."""
    rng = np.random.default_rng(7)
    vals = rng.integers(-512, 512, size=(5, 9)) / 16.0
    rows = [
        (int(y), int(x), float(vals[y, x]))
        for y in range(5)
        for x in range(9)
    ]
    df = spark.createDataFrame(rows, "y long, x long, f double")
    got = {
        (r.y, r.x): r.dfdx
        for r in centered_diff(df, "f", "x", 2.0, ["y"], "dfdx").collect()
    }
    for y in range(5):
        for x in range(9):
            if x in (0, 8):
                assert got[(y, x)] is None
            else:
                want = (vals[y, x + 1] - vals[y, x - 1]) / 4.0
                assert got[(y, x)] == want, (y, x)


def test_centered_diff_hole_in_pencil_yields_null(spark):
    """A missing neighbor coordinate must produce NULL, never a
    wrong-stride difference."""
    rows = [(0, 0, 1.0), (0, 1, 2.0), (0, 3, 4.0), (0, 4, 8.0)]
    df = spark.createDataFrame(rows, "y long, x long, f double")
    got = {
        r.x: r.d
        for r in centered_diff(df, "f", "x", 1.0, ["y"], "d").collect()
    }
    assert got[1] is None  # right neighbor x=2 missing
    assert got[3] is None  # left neighbor x=2 missing


def test_solid_body_rotation_vorticity(spark):
    """u = -omega y_m, v = omega x_m has relative vorticity exactly
    2 omega everywhere in the interior."""
    omega, dx = 0.125, 4.0
    d = _grid(spark, 6, 6).select(
        "y", "x",
        (F.lit(-omega) * F.col("y") * dx).alias("u"),
        (F.lit(omega) * F.col("x") * dx).alias("v"),
    )
    out = absolute_vorticity(d, "u", "v", "x", "y", dx, dx).collect()
    interior = [r for r in out if r.avo is not None]
    assert len(interior) == 16
    for r in interior:
        assert r.avo == 2 * omega


def test_coriolis_parameter_limits(spark):
    r = (
        spark.range(1)
        .select(
            coriolis_parameter(F.lit(90.0)).alias("pole"),
            coriolis_parameter(F.lit(0.0)).alias("equator"),
            coriolis_parameter(F.lit(-90.0)).alias("south"),
        )
        .collect()[0]
    )
    assert r.pole == pytest.approx(2 * OMEGA_E, rel=1e-12)
    assert r.equator == pytest.approx(0.0, abs=1e-20)
    assert r.south == pytest.approx(-2 * OMEGA_E, rel=1e-12)


def test_updraft_helicity_solid_body_constant_w(spark):
    """Constant w over solid-body rotation: UH = w * 2 omega * (band
    thickness), independent of position — and the lateral boundary
    sums to exactly zero."""
    omega, dx, w0 = 0.0625, 8.0, 0.5
    nk = 8
    lev = _grid(spark, 5, 5).select(
        "y", "x",
        F.explode(F.sequence(F.lit(0), F.lit(nk - 1))).alias("k"),
    ).select(
        "y", "x", "k",
        (F.lit(-omega) * F.col("y") * dx).alias("u"),
        (F.lit(omega) * F.col("x") * dx).alias("v"),
        F.lit(w0).alias("w"),
        (F.col("k") * 500.0 + 250.0).alias("z"),
        F.lit(500.0).alias("dz"),
    )
    out = updraft_helicity(
        lev, "w", "u", "v", "x", "y", "z", "k", dx, dx, "dz",
        z_bottom=2000.0, z_top=5000.0,
    ).collect()
    # band levels: z in {2250, 2750, 3250, 3750} -> 4 * 500 m = 2000 m
    want = w0 * 2 * omega * 2000.0
    for r in out:
        interior = 1 <= r.x <= 3 and 1 <= r.y <= 3
        assert r.uh == (want if interior else 0.0), (r.x, r.y)


def test_srh_straight_hodograph_through_storm_motion_is_zero(spark):
    """A straight-line hodograph with the storm motion ON the line
    sweeps zero area: SRH == 0 exactly.  Shifting the motion off the
    line by dv makes each pair term (u_{k+1}-u_k) * dv."""
    nk = 7
    lev = _grid(spark, 2, 2).select(
        "y", "x",
        F.explode(F.sequence(F.lit(0), F.lit(nk - 1))).alias("k"),
    ).select(
        "y", "x", "k",
        (F.col("k") * 2.0).alias("u"),
        F.lit(3.0).alias("v"),
        (F.col("k") * 500.0).alias("z"),
    )
    on_line = storm_relative_helicity(
        lev, "u", "v", "z", "k", ["y", "x"], c_u=1.0, c_v=3.0,
        depth=3000.0,
    ).collect()
    for r in on_line:
        assert r.srh == 0.0
    off_line = storm_relative_helicity(
        lev, "u", "v", "z", "k", ["y", "x"], c_u=1.0, c_v=2.0,
        depth=3000.0,
    ).collect()
    # pairs k=0..5 all inside depth; each term (u2-u1)*(v-cv) = 2*1
    for r in off_line:
        assert r.srh == pytest.approx(12.0, abs=1e-12)


def test_srh_estimated_motion_matches_explicit_with_same_c(spark):
    """The no-c default must equal the explicit-motion path fed the
    hand-computed Davies & Johns estimate (0-6 km trapezoid mean wind,
    75% speed, 30 degrees right): the linear decomposition and the
    per-pair form are the same sum up to float associativity."""
    nk = 5  # z = 0, 1000, ..., 4000 — every pair inside the 6 km layer
    lev = _grid(spark, 2, 2).select(
        "y", "x",
        F.explode(F.sequence(F.lit(0), F.lit(nk - 1))).alias("k"),
    ).select(
        "y", "x", "k",
        (F.col("k") * 2.0).alias("u"),
        (F.col("k") * F.col("k") / 4.0).alias("v"),
        (F.col("k") * 1000.0).alias("z"),
    )
    # trapezoid mean over the 4 layers of the analytic profile
    u_prof = [k * 2.0 for k in range(nk)]
    v_prof = [k * k / 4.0 for k in range(nk)]
    sdh = 1000.0 * (nk - 1)
    su = sum(0.5 * 1000.0 * (u_prof[k] + u_prof[k + 1]) for k in range(nk - 1))
    sv = sum(0.5 * 1000.0 * (v_prof[k] + v_prof[k + 1]) for k in range(nk - 1))
    ua, va = su / sdh, sv / sdh
    c30, s30 = 0.8660254037844387, 0.5
    cu = 0.75 * (c30 * ua + s30 * va)
    cv = 0.75 * (c30 * va - s30 * ua)
    est = storm_relative_helicity(
        lev, "u", "v", "z", "k", ["y", "x"], depth=3000.0,
    ).collect()
    exp = storm_relative_helicity(
        lev, "u", "v", "z", "k", ["y", "x"], c_u=cu, c_v=cv, depth=3000.0,
    ).collect()
    e = {(r.y, r.x): r.srh for r in est}
    x = {(r.y, r.x): r.srh for r in exp}
    assert set(e) == set(x)
    for key in e:
        assert e[key] == pytest.approx(x[key], rel=1e-12, abs=1e-12)
    # mixing one explicit component with one estimated is a named error
    with pytest.raises(TypeError, match="BOTH c_u and c_v"):
        storm_relative_helicity(lev, "u", "v", "z", "k", ["y", "x"], c_u=1.0)


def test_srh_circular_hodograph_sweeps_circle_area(spark):
    """A full-circle hodograph centered on the storm motion sweeps
    twice its enclosed area in cross-product magnitude (the shoelace
    identity, here the inscribed regular N-gon): counterclockwise
    turning gives -2A in this convention (clockwise turning — the
    NH-supercell-favorable sense — is positive)."""
    n, radius = 12, 5.0
    rows = [
        (
            0,
            0,
            k,
            radius * math.cos(2 * math.pi * k / n),
            radius * math.sin(2 * math.pi * k / n),
            float(k),
        )
        for k in range(n + 1)
    ]
    lev = spark.createDataFrame(
        rows, "y long, x long, k long, u double, v double, z double"
    )
    out = storm_relative_helicity(
        lev, "u", "v", "z", "k", ["y", "x"], c_u=0.0, c_v=0.0,
        depth=1e9,
    ).collect()
    ngon_area = 0.5 * n * radius * radius * math.sin(2 * math.pi / n)
    assert out[0].srh == pytest.approx(-2 * ngon_area, rel=1e-12)


def test_smooth2d_preserves_constant_and_matches_numpy(spark):
    """A constant field is a fixed point of the smoother; a random
    dyadic field must match the explicit numpy stencil with boundary
    passthrough, for both one and two passes."""
    from wrf_to_geodataframe_spark.operators.dynamics import smooth2d

    rng = np.random.default_rng(11)
    vals = rng.integers(-256, 256, size=(6, 5)) / 8.0

    def np_pass(a):
        out = a.copy()
        out[1:-1, 1:-1] = a[1:-1, 1:-1] / 2.0 + (
            (a[1:-1, :-2] + a[1:-1, 2:]) + (a[:-2, 1:-1] + a[2:, 1:-1])
        ) / 8.0
        return out

    rows = [
        (y, x, float(vals[y, x])) for y in range(6) for x in range(5)
    ]
    df = spark.createDataFrame(rows, "y long, x long, f double")
    for passes in (1, 2):
        want = vals
        for _ in range(passes):
            want = np_pass(want)
        got = {
            (r.y, r.x): r.fs
            for r in smooth2d(df, "f", "x", "y", passes=passes,
                              out_col="fs").collect()
        }
        for y in range(6):
            for x in range(5):
                assert got[(y, x)] == want[y, x], (passes, y, x)
    const = df.withColumn("f", F.lit(3.25))
    for r in smooth2d(const, "f", "x", "y", passes=3,
                      out_col="fs").collect():
        assert r.fs == 3.25


def test_potential_vorticity_solid_body_uniform_lapse(spark):
    """Solid-body rotation (zeta = 2 omega) with a uniform theta
    lapse: PV = -g * 2 omega * dtheta/dp exactly at every interior
    point."""
    from wrf_to_geodataframe_spark.operators.dynamics import (
        potential_vorticity,
    )

    omega, dx = 0.0625, 8.0
    lev = _grid(spark, 5, 5).select(
        "y", "x",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("k"),
    ).select(
        "y", "x", "k",
        (F.lit(-omega) * F.col("y") * dx).alias("u"),
        (F.lit(omega) * F.col("x") * dx).alias("v"),
        (F.lit(300.0) + F.col("k") * 4.0).alias("theta"),
        (F.lit(100000.0) - F.col("k") * 10000.0).alias("p"),
    )
    out = potential_vorticity(
        lev, "u", "v", "theta", "p", "x", "y", "k", dx, dx
    ).collect()
    want = -9.81 * (2 * omega) * (8.0 / -20000.0)
    n_interior = 0
    for r in out:
        interior = 1 <= r.x <= 3 and 1 <= r.y <= 3 and 1 <= r.k <= 3
        if interior:
            assert r.pv == want, (r.x, r.y, r.k)
            n_interior += 1
        else:
            assert r.pv is None, (r.x, r.y, r.k)
    assert n_interior == 27


def test_cloud_fraction_clamps_and_null_band(spark):
    """rh >= 95 saturates the ramp at exactly 1, rh <= 75 floors at
    exactly 0, and a band with no levels yields NULL (distinct from
    dry-but-sampled 0.0)."""
    from wrf_to_geodataframe_spark.operators.vertical import cloud_fraction

    rows = [
        # column 0: low saturated, mid dry, no high levels at all
        (0, 90000.0, 99.0), (0, 85000.0, 80.0), (0, 70000.0, 60.0),
        # column 1: interpolated mid value 85 -> ramp 0.5
        (1, 90000.0, 10.0), (1, 60000.0, 85.0), (1, 30000.0, 96.0),
    ]
    df = spark.createDataFrame(rows, "cid long, p double, rh double")
    got = {
        r.cid: (r.cf_low, r.cf_mid, r.cf_high)
        for r in cloud_fraction(df, "p", "rh", ["cid"]).collect()
    }
    assert got[0][0] == 1.0  # 99 saturates; the 80-rh level also low
    assert got[0][1] == 0.0  # mid has only the dry 70000 Pa level
    assert got[0][2] is None  # no high levels
    assert got[1] == (0.0, 0.5, 1.0)


def test_wrf_dynamics_end_to_end_from_netcdf(spark, tmp_path):
    """The dynamics post-processing flow end to end on a REAL NetCDF
    file through the engine's own scan: write (k, j, i) U/V model
    winds with the classic writer, ingest through the distributed dir
    scan, derive per-level relative vorticity with the pencil
    windows, smooth it with one smooth2d pass, sample a cross-section
    line with the broadcast vertcross — and match a pure-numpy replay
    of the identical stencils EXACTLY (dyadic fields, power-of-two
    spacing)."""
    import os as _os

    from wrf_to_geodataframe_spark.operators.dynamics import (
        absolute_vorticity,
        smooth2d,
    )
    from wrf_to_geodataframe_spark.operators.vertical import vertcross
    from wrf_to_geodataframe_spark.sources.netcdf import (
        read_netcdf_dir,
        write_netcdf,
    )

    nk, nj, ni, dx = 3, 8, 10, 512.0
    kk, jj, ii = np.meshgrid(
        np.arange(nk), np.arange(nj), np.arange(ni), indexing="ij"
    )
    u = (3.0 * jj * jj * (kk + 1) + ii) / 16.0
    v = (5.0 * ii * ii * (kk + 2) + jj) / 16.0
    d = str(tmp_path / "arch")
    _os.makedirs(d)
    write_netcdf(
        _os.path.join(d, "wrfout.nc"),
        {"k": nk, "j": nj, "i": ni},
        {
            "U": {"dims": ["k", "j", "i"], "data": u},
            "V": {"dims": ["k", "j", "i"], "data": v},
            "XLAT": {"dims": ["j", "i"],
                     "data": 40.0 + jj[0] * 0.5},
            "XLONG": {"dims": ["j", "i"],
                      "data": -5.0 + ii[0] * 0.5},
        },
    )
    uu = read_netcdf_dir(spark, d, "U", "XLAT", "XLONG").select(
        F.col("t_idx").alias("k"), "y_idx", "x_idx",
        F.col("value").alias("u"),
    )
    vv = read_netcdf_dir(spark, d, "V", "XLAT", "XLONG").select(
        F.col("t_idx").alias("k"), "y_idx", "x_idx",
        F.col("value").alias("v"),
    )
    lev = uu.join(vv, ["k", "y_idx", "x_idx"])
    zeta = absolute_vorticity(
        lev, "u", "v", "x_idx", "y_idx", dx, dx, group_cols=["k"],
        out_col="zeta",
    ).filter(F.col("zeta").isNotNull())
    sm = smooth2d(
        zeta, "zeta", "x_idx", "y_idx", passes=1, group_cols=["k"],
        out_col="zs",
    )
    got = {
        (r.s, r.k): r.vc
        for r in vertcross(
            sm, "zs", "k", "x_idx", "y_idx", (2.25, 2.25), (6.75, 4.5), 5
        ).collect()
    }
    assert len(got) == 5 * nk

    # ---- numpy replay of the identical stencils
    zeta_np = np.full((nk, nj, ni), np.nan)
    zeta_np[:, 1:-1, 1:-1] = (
        v[:, 1:-1, 2:] - v[:, 1:-1, :-2]
        - (u[:, 2:, 1:-1] - u[:, :-2, 1:-1])
    ) / (2.0 * dx)
    # cropped to the non-null region, smoothed with boundary passthrough
    crop = zeta_np[:, 1:-1, 1:-1]
    smn = crop.copy()
    smn[:, 1:-1, 1:-1] = crop[:, 1:-1, 1:-1] / 2.0 + (
        (crop[:, 1:-1, :-2] + crop[:, 1:-1, 2:])
        + (crop[:, :-2, 1:-1] + crop[:, 2:, 1:-1])
    ) / 8.0
    for s in range(5):
        xi = 2.25 + s * (4.5 / 4.0)
        yi = 2.25 + s * (2.25 / 4.0)
        cx, cy = int(np.floor(xi)), int(np.floor(yi))
        fx, fy = xi - cx, yi - cy
        for k in range(nk):
            # cropped-grid indices are offset by the dropped boundary
            g = smn[k, cy - 1: cy + 1, cx - 1: cx + 1]
            want = (
                (1 - fx) * (1 - fy) * g[0, 0]
                + fx * (1 - fy) * g[0, 1]
                + (1 - fx) * fy * g[1, 0]
                + fx * fy * g[1, 1]
            )
            assert got[(s, k)] == want, (s, k)
