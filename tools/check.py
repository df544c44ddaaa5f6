"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the same scale factor, then compares row count, schema (normalized
arrow-ish dtypes) and order-insensitive values — flagging ANY cell that is
not bit-identical, because the driver hashes values and a single
last-bit float difference fails the hash.

Usage:  python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all columns (string repr for
    unsortable types) — order-insensitive canonical form."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if isinstance(v, (list, np.ndarray, dict, bytes)) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    issues = []
    if len(spark_df) != len(oracle_df):
        return [f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}"]
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return [f"columns spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"]
    s, o = _canon(spark_df), _canon(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if str(sv.dtype) != str(ov.dtype):
            issues.append(f"dtype[{c}] spark={sv.dtype} oracle={ov.dtype}")
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
            a, b = sv.to_numpy(float), ov.to_numpy(float)
            # BIT-PATTERN compare (uint64 view), not float ==: the driver
            # hashes raw encodings, so -0.0 vs +0.0 (which == calls equal)
            # fails its hash — the r12 m12_omega_mdbz escape.  NaNs are
            # payload-normalized first (any NaN == any NaN).
            an, bn = a.copy(), b.copy()
            an[np.isnan(an)] = np.nan
            bn[np.isnan(bn)] = np.nan
            eq = an.view(np.uint64) == bn.view(np.uint64)
            if not eq.all():
                bad = np.flatnonzero(~eq)
                d = np.nanmax(np.abs(a[bad] - b[bad]))
                issues.append(
                    f"values[{c}] {len(bad)} cells differ bitwise, "
                    f"maxdiff={d:.3e}"
                )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                bad = int((~eq).sum())
                i = int(np.flatnonzero(~eq.to_numpy())[0])
                issues.append(f"values[{c}] {bad} cells differ, e.g. {sv.iloc[i]!r} vs {ov.iloc[i]!r}")
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # hostile-session mode: the driver harness builds its OWN session
        # with none of get_spark's defaults — replicate that (non-UTC
        # timezone, default shuffle partitions, no Arrow tuning) so the
        # gate proves load_table pins everything semantics-critical
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-vanilla")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from wrf_to_geodataframe_spark.session import get_spark

        spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark.catalog.clearCache()  # drop prior queries' persisted intermediates
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            n_fail += 1
            continue
        issues = compare(name, sdf, odf)
        if issues:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for i in issues:
                print(f"     {i}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
