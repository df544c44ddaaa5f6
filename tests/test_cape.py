"""CAPE/CIN (operators/vertical.surface_cape + the meteo.py moist
adiabat): physics identities and a pure-numpy replay — the
structurally different cross-checks behind the m6 gate's class-B
oracle (suite/__init__ taxonomy), plus the lattice-margin
measurement the gate's floor-quantization relies on."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.operators.vertical import surface_cape

EPS, CELSIUS = 0.622, 273.15


def _es_hpa(t):
    return 6.112 * np.exp(17.67 * (t - CELSIUS) / ((t - CELSIUS) + 243.5))


def _qvs(t, p):
    e = _es_hpa(t)
    return EPS * e / (p / 100.0 - e)


def _pi_sat(t, p):
    qs = _qvs(t, p)
    return (1000.0 / (p / 100.0)) ** (0.2854 * (1 - 0.28 * qs)) * np.exp(
        (3.376 / t - 0.00254) * 1000 * qs * (1 + 0.81 * qs)
    )


def _bisect(the0, p, iters=40):
    lo, hi = 150.0, 350.0
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        if mid * _pi_sat(mid, p) < the0:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def _theta_e(t, p, qv):
    e = (p / 100.0) * qv / (EPS + qv)
    tl = 2840.0 / (3.5 * np.log(t) - np.log(e) - 4.805) + 55.0
    return (
        t
        * (1000.0 / (p / 100.0)) ** (0.2854 * (1 - 0.28 * qv))
        * np.exp((3.376 / tl - 0.00254) * 1000 * qv * (1 + 0.81 * qv))
    )


def _numpy_cape(levels, quant=1.0e4):
    """Pure-python replay of surface_cape for ONE column of
    (p, t, qv, dz) tuples ordered surface-first."""
    p0, t0, qv0, _ = levels[0]
    the0 = _theta_e(t0, p0, qv0)
    e0 = (p0 / 100.0) * qv0 / (EPS + qv0)
    tl = 2840.0 / (3.5 * np.log(t0) - np.log(e0) - 4.805) + 55.0
    plcl = p0 * (tl / t0) ** 3.5
    bs = []
    for p, t, qv, dz in levels:
        if p >= plcl:
            tp, qvp = t0 * (p / p0) ** (2.0 / 7.0), qv0
        else:
            tp = _bisect(the0, p)
            qvp = _qvs(tp, p)
        tvp, tve = (tp * (EPS + qvp) / (EPS * (1 + qvp)),
                    t * (EPS + qv) / (EPS * (1 + qv)))
        bs.append((p, 9.81 * (tvp - tve) / tve, dz))
    cape = sum(np.floor(max(b, 0) * dz * quant) for _, b, dz in bs) / quant
    plfc = max((p for p, b, _ in bs if b > 0), default=None)
    if plfc is None:
        return cape, None
    cin = (
        sum(np.floor(min(b, 0) * dz * quant) for p, b, dz in bs if p > plfc)
        / quant
    )
    return cape, cin


def _sounding_df(spark, columns):
    rows = [
        (cid, k, float(p), float(t), float(qv), float(dz))
        for cid, levels in enumerate(columns)
        for k, (p, t, qv, dz) in enumerate(levels)
    ]
    return spark.createDataFrame(
        rows, "cid long, k long, p double, t double, qv double, dz double"
    )


UNSTABLE = [
    (100000.0 - 9000.0 * k, 302.0 - 6.5 * k,
     max(0.017578125 - 0.00146484375 * k, 0.000244140625), 500.0)
    for k in range(10)
]
STABLE = [
    (100000.0 - 9000.0 * k, 300.0 - 2.0 * k, 0.001953125, 500.0)
    for k in range(10)
]


def test_cape_matches_numpy_replay_bitwise(spark):
    got = {
        r.cid: (r.cape, r.cin)
        for r in surface_cape(
            _sounding_df(spark, [UNSTABLE, STABLE]),
            "p", "t", "qv", "dz", ["cid"],
        ).collect()
    }
    for cid, levels in enumerate([UNSTABLE, STABLE]):
        cape, cin = _numpy_cape(levels)
        assert got[cid][0] == cape, cid
        assert got[cid][1] == cin, cid


def test_stable_sounding_zero_cape_null_cin(spark):
    out = surface_cape(
        _sounding_df(spark, [STABLE]), "p", "t", "qv", "dz", ["cid"]
    ).collect()[0]
    assert out.cape == 0.0
    assert out.cin is None


def test_unstable_sounding_positive_cape_negative_cin(spark):
    out = surface_cape(
        _sounding_df(spark, [UNSTABLE]), "p", "t", "qv", "dz", ["cid"]
    ).collect()[0]
    assert 100.0 < out.cape < 5000.0  # convectively active range
    assert out.cin <= 0.0


def test_more_surface_moisture_more_cape(spark):
    def moisten(levels, extra):
        out = list(levels)
        p, t, qv, dz = out[0]
        out[0] = (p, t, qv + extra, dz)
        return out

    df = _sounding_df(
        spark, [UNSTABLE, moisten(UNSTABLE, 0.001953125)]
    )
    got = {
        r.cid: r.cape
        for r in surface_cape(df, "p", "t", "qv", "dz", ["cid"]).collect()
    }
    assert got[1] > got[0]


def test_bisection_inverts_theta_e_closure(spark):
    """theta_e evaluated AT the bisection's output (saturated) must
    reproduce theta_e0 — the inversion closure, checked through the
    Spark expression itself."""
    from wrf_to_geodataframe_spark.functions.meteo import (
        moist_adiabat_t_k,
        qv_sat,
        theta_e_bolton,
    )

    df = spark.createDataFrame(
        [(340.0, 80000.0), (330.0, 55000.0), (352.0, 92000.0)],
        "the0 double, p double",
    )
    tp = moist_adiabat_t_k(F.col("the0"), F.col("p"))
    closure = theta_e_bolton(tp, F.col("p"), qv_sat(tp, F.col("p")))
    for r in df.select("the0", closure.alias("back")).collect():
        # Bolton's T_L(T, es(T)) is ~0.1% off the exact identity at
        # saturation; the closure holds to that published accuracy
        assert r.back == pytest.approx(r.the0, rel=2e-3)


def test_m6_gate_margins_at_all_sfs(spark):
    """The m6 gate floors per-level contributions onto a 1e-4 J/kg
    lattice; cross-engine libm drift is ~1e-9 lattice units, so
    measure that every synthetic profile keeps its contributions,
    buoyancy signs, and LCL comparisons far from the decision
    boundaries (the pca_project_variance margin pattern)."""
    for sf in ("0.001", "0.01", "0.1"):
        n = (
            spark.read.parquet(f"/root/testdata/sf{sf}/events.parquet")
            .agg(F.countDistinct("user_id"))
            .collect()[0][0]
        )
        min_lat, min_b, min_plcl = 1e9, 1e9, 1e9
        for y in range((n - 1) // 4 + 1):
            for x in range(4):
                t0 = 302.0 + (x % 3) * 0.5 + (y % 5) * 0.25
                qv0 = max(
                    0.015625 + ((x + y) % 4) * 0.001953125, 0.000244140625
                )
                lapse = 3.0 if (x + y) % 5 == 4 else 6.5
                levels = [
                    (
                        100000.0 - 9000.0 * k,
                        t0 - lapse * k,
                        max(
                            0.015625
                            + ((x + y) % 4) * 0.001953125
                            - 0.00146484375 * k,
                            0.000244140625,
                        ),
                        500.0 + 20.0 * k,
                    )
                    for k in range(10)
                ]
                p0 = levels[0][0]
                the0 = _theta_e(t0, p0, qv0)
                e0 = (p0 / 100.0) * qv0 / (EPS + qv0)
                tl = 2840.0 / (3.5 * np.log(t0) - np.log(e0) - 4.805) + 55.0
                plcl = p0 * (tl / t0) ** 3.5
                for p, t, qv, dz in levels:
                    min_plcl = min(min_plcl, abs(p - plcl))
                    if p >= plcl:
                        tp, qvp = t0 * (p / p0) ** (2.0 / 7.0), qv0
                    else:
                        tp = _bisect(the0, p)
                        qvp = _qvs(tp, p)
                    tvp, tve = (tp * (EPS + qvp) / (EPS * (1 + qvp)),
                    t * (EPS + qv) / (EPS * (1 + qv)))
                    b = 9.81 * (tvp - tve) / tve
                    if b != 0.0:
                        min_b = min(min_b, abs(b))
                        for c in (max(b, 0) * dz * 1e4, min(b, 0) * dz * 1e4):
                            if c != 0.0:
                                min_lat = min(
                                    min_lat,
                                    min(c - np.floor(c), np.ceil(c) - c),
                                )
        assert min_lat > 1e-4, sf  # >= 1e5 x the drift scale
        assert min_b > 1e-4, sf
        assert min_plcl > 1.0, sf  # Pa


ELEVATED = [
    # dry surface layer, moisture maximum at k=2 (the MU parcel)
    (100000.0 - 9000.0 * k, 300.0 - 6.5 * k,
     (0.001953125 if k != 2 else 0.017578125), 500.0)
    for k in range(10)
]


def _numpy_mu_cape(levels, depth=30000.0, quant=1.0e4):
    """Replay of the most-unstable path: argmax theta_e in the lowest
    ``depth`` Pa, then the surface_cape integration from that level."""
    psfc = max(p for p, _, _, _ in levels)
    cand = [(p, t, qv, dz) for p, t, qv, dz in levels if p >= psfc - depth]
    p0, t0, qv0, _ = max(cand, key=lambda r: _theta_e(r[1], r[0], r[2]))
    the0 = _theta_e(t0, p0, qv0)
    e0 = (p0 / 100.0) * qv0 / (EPS + qv0)
    tl = 2840.0 / (3.5 * np.log(t0) - np.log(e0) - 4.805) + 55.0
    plcl = p0 * (tl / t0) ** 3.5
    bs = []
    for p, t, qv, dz in levels:
        if p > p0:
            continue
        if p >= plcl:
            tp, qvp = t0 * (p / p0) ** (2.0 / 7.0), qv0
        else:
            tp = _bisect(the0, p)
            qvp = _qvs(tp, p)
        tvp, tve = (tp * (EPS + qvp) / (EPS * (1 + qvp)),
                    t * (EPS + qv) / (EPS * (1 + qv)))
        bs.append((p, 9.81 * (tvp - tve) / tve, dz))
    cape = sum(np.floor(max(b, 0) * dz * quant) for _, b, dz in bs) / quant
    plfc = max((p for p, b, _ in bs if b > 0), default=None)
    if plfc is None:
        return cape, None
    cin = (
        sum(np.floor(min(b, 0) * dz * quant) for p, b, dz in bs if p > plfc)
        / quant
    )
    return cape, cin


def test_mu_cape_matches_numpy_replay_bitwise(spark):
    got = {
        r.cid: (r.cape, r.cin)
        for r in surface_cape(
            _sounding_df(spark, [UNSTABLE, STABLE, ELEVATED]),
            "p", "t", "qv", "dz", ["cid"], parcel="most_unstable",
        ).collect()
    }
    for cid, levels in enumerate([UNSTABLE, STABLE, ELEVATED]):
        cape, cin = _numpy_mu_cape(levels)
        assert got[cid][0] == cape, cid
        assert got[cid][1] == cin, cid


def test_mu_cape_at_least_surface_cape(spark):
    """The most-unstable parcel maximizes theta_e, so MU-CAPE >=
    SB-CAPE on every sounding (equality when the surface parcel IS the
    max-theta_e one)."""
    df = _sounding_df(spark, [UNSTABLE, STABLE, ELEVATED])
    sb = {
        r.cid: r.cape
        for r in surface_cape(
            df, "p", "t", "qv", "dz", ["cid"]
        ).collect()
    }
    mu = {
        r.cid: r.cape
        for r in surface_cape(
            df, "p", "t", "qv", "dz", ["cid"], parcel="most_unstable"
        ).collect()
    }
    for cid in sb:
        assert mu[cid] >= sb[cid], cid
    # UNSTABLE's surface parcel is its moisture max -> identical result
    assert mu[0] == sb[0]
    # ELEVATED's dry surface gives ~no CAPE; the k=2 parcel is live
    assert sb[2] == 0.0
    assert mu[2] > 100.0


def test_mu_cape_rejects_unknown_parcel(spark):
    with pytest.raises(ValueError, match="parcel"):
        surface_cape(
            _sounding_df(spark, [STABLE]), "p", "t", "qv", "dz",
            ["cid"], parcel="bogus",
        )


def test_cape_3d_truncation_identity_and_numpy(spark):
    """cape_3d's TRUNCATION IDENTITY: the parcel at level kp sees
    exactly the column truncated below kp, so its row equals BOTH
    surface_cape over the filtered frame and the numpy replay of the
    level suffix — bitwise, since the integration tail is shared
    code."""
    from wrf_to_geodataframe_spark.operators.vertical import cape_3d

    df = _sounding_df(spark, [UNSTABLE, STABLE])
    got = {
        (r.cid, r.k): (r.cape, r.cin)
        for r in cape_3d(
            df, "p", "t", "qv", "dz", "k", ["cid"]
        ).collect()
    }
    assert len(got) == 2 * 10
    for cid, levels in enumerate([UNSTABLE, STABLE]):
        for kp in (0, 3, 7, 9):
            want = _numpy_cape(levels[kp:])
            cape, cin = got[(cid, kp)]
            assert cape == want[0], (cid, kp)
            assert cin == want[1], (cid, kp)
    # spark-side identity against surface_cape on the truncated frame
    for kp in (2, 5):
        trunc = {
            r.cid: (r.cape, r.cin)
            for r in surface_cape(
                df.filter(F.col("k") >= kp),
                "p", "t", "qv", "dz", ["cid"],
            ).collect()
        }
        for cid in (0, 1):
            assert got[(cid, kp)] == trunc[cid], (cid, kp)


def test_lcl_lfc_heights_numpy_replay(spark):
    """The z_col form's lcl/lfc (wrf-python cape_2d's other two
    fields) against a pure-python replay: lcl = z0 + (T0 - T_lcl)
    cp/g bitwise, lfc = z at the highest-pressure B > 0 level
    (bitwise, exact dyadics), NULL lfc on the stable sounding while
    lcl is still defined."""
    from wrf_to_geodataframe_spark.functions.meteo import (
        G0,
        RD,
        RD_OVER_CP,
    )
    from wrf_to_geodataframe_spark.operators.vertical import surface_cape
    from wrf_to_geodataframe_spark.session import release_persisted

    cols = [UNSTABLE, STABLE]
    df = _sounding_df(spark, cols).withColumn(
        "z", F.lit(256.0) * F.col("k") + F.lit(128.0)
    )
    out = {
        r.cid: (r.cape, r.cin, r.lcl, r.lfc)
        for r in surface_cape(
            df, "p", "t", "qv", "dz", ["cid"], z_col="z"
        ).collect()
    }
    release_persisted()
    for cid, levels in enumerate(cols):
        p0, t0, qv0, _ = levels[0]
        e0 = (p0 / 100.0) * qv0 / (EPS + qv0)
        tl = 2840.0 / (3.5 * np.log(t0) - np.log(e0) - 4.805) + 55.0
        plcl = p0 * (tl / t0) ** 3.5
        # replay B per level for the LFC
        the0 = _theta_e(t0, p0, qv0)
        zs, bs = [], []
        for k, (p, t, qv, dz) in enumerate(levels):
            if p >= plcl:
                tp, qvp = t0 * (p / p0) ** (2.0 / 7.0), qv0
            else:
                tp = _bisect(the0, p)
                qvp = _qvs(tp, p)
            tvp = tp * (EPS + qvp) / (EPS * (1 + qvp))
            tve = t * (EPS + qv) / (EPS * (1 + qv))
            bs.append(9.81 * (tvp - tve) / tve)
            zs.append(256.0 * k + 128.0)
        want_lcl = 128.0 + (t0 - tl) * (RD / RD_OVER_CP / G0)
        pos = [i for i, b in enumerate(bs) if b > 0]
        want_lfc = zs[min(pos)] if pos else None
        got = out[cid]
        assert got[2] == want_lcl, cid  # bitwise: same float ops
        if want_lfc is None:
            assert got[3] is None
            assert got[1] is None  # cin NULL convention shared
        else:
            assert got[3] == want_lfc, cid
    # mu parcel carries its own origin height
    mu = surface_cape(
        df, "p", "t", "qv", "dz", ["cid"],
        parcel="most_unstable", z_col="z",
    ).collect()
    release_persisted()
    assert {r.cid for r in mu} == {0, 1}
    for r in mu:
        assert r.lcl is not None
