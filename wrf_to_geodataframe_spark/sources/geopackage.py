"""GeoPackage sink (SURVEY.md §2 S3, ``to_file(..., driver="GPKG")`` at
wrf_voronoi.py:149): write a polygon layer into a .gpkg using the
stdlib sqlite3 module + hand-built GPKG geometry blobs (header per the
OGC GeoPackage spec, then standard WKB).

The reference's outputs are small (<= ~10^5 cells), so the GPKG sink
is a deliberate driver-side collect (SURVEY.md §7 hard-thing #6);
large results use :func:`write_geoparquet` — a fully distributed
``df.write.parquet`` of the WKB-encoded geometry with CRS metadata on
the field, round-tripped by :func:`read_geoparquet`.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pandas as pd


def polygon_wkb(ring: np.ndarray) -> bytes:
    """Little-endian WKB POLYGON with one (closed, ccw) ring."""
    ring = np.asarray(ring, dtype="<f8")
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    head = struct.pack("<BII", 1, 3, 1)  # LE, wkbPolygon, 1 ring
    return head + struct.pack("<I", len(ring)) + ring.tobytes()


def parse_polygon_wkb(wkb: bytes) -> np.ndarray:
    """Inverse of :func:`polygon_wkb` (round-trip verification)."""
    endian, geom_type, nrings = struct.unpack_from("<BII", wkb, 0)
    assert endian == 1 and geom_type == 3 and nrings >= 1
    (npts,) = struct.unpack_from("<I", wkb, 9)
    pts = np.frombuffer(wkb, dtype="<f8", count=npts * 2, offset=13).reshape(-1, 2)
    return pts[:-1].copy() if npts and np.array_equal(pts[0], pts[-1]) else pts.copy()


def _gpkg_geom_blob(ring: np.ndarray, srs_id: int) -> bytes:
    """GPKG geometry blob: magic 'GP', version 0, flags (LE byte order,
    envelope type 1), srs_id, [minx maxx miny maxy], WKB."""
    ring = np.asarray(ring, dtype="<f8")
    flags = 0b00000011  # envelope=1 (xy), little-endian
    env = struct.pack(
        "<dddd",
        float(ring[:, 0].min()), float(ring[:, 0].max()),
        float(ring[:, 1].min()), float(ring[:, 1].max()),
    )
    return b"GP" + struct.pack("<BBi", 0, flags, srs_id) + env + polygon_wkb(ring)


def write_geopackage(
    path: str,
    layer: str,
    rows: list[dict],
    geom_key: str = "geom",
    srs_id: int = 4326,
) -> None:
    """Write one polygon layer.  ``rows``: dicts with ``geom_key`` -> an
    (n, 2) vertex array plus scalar attribute keys (str/int/float)."""
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
    cur.execute("PRAGMA user_version = 10300")
    cur.executescript(
        """
        CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
          srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
          organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
          definition TEXT NOT NULL, description TEXT);
        CREATE TABLE IF NOT EXISTS gpkg_contents (
          table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
          identifier TEXT UNIQUE, description TEXT DEFAULT '',
          last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
          min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
          srs_id INTEGER);
        CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
          table_name TEXT NOT NULL, column_name TEXT NOT NULL,
          geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
          z TINYINT NOT NULL, m TINYINT NOT NULL,
          CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name));
        """
    )
    cur.execute(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        ("WGS 84", 4326, "EPSG", 4326, "GEOGCS[\"WGS 84\"]", None),
    )

    attr_keys = [k for k in rows[0] if k != geom_key] if rows else []

    def sql_type(v) -> str:
        if isinstance(v, bool):
            return "BOOLEAN"
        if isinstance(v, (int, np.integer)):
            return "INTEGER"
        if isinstance(v, (float, np.floating)):
            return "DOUBLE"
        return "TEXT"

    def col_type(k: str) -> str:
        # derive from the first NON-None value so a leading NULL doesn't
        # mistype the whole column as TEXT
        for r in rows:
            if r.get(k) is not None:
                return sql_type(r[k])
        return "TEXT"

    cols = ", ".join(f'"{k}" {col_type(k)}' for k in attr_keys)
    cur.execute(
        f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
        f'geom BLOB{", " + cols if cols else ""})'
    )
    allx, ally = [], []
    for r in rows:
        ring = np.asarray(r[geom_key], dtype=float)
        allx += [ring[:, 0].min(), ring[:, 0].max()]
        ally += [ring[:, 1].min(), ring[:, 1].max()]
        cur.execute(
            f'INSERT INTO "{layer}" (geom{"".join("," + chr(34) + k + chr(34) for k in attr_keys)}) '
            f'VALUES (?{", ?" * len(attr_keys)})',
            [_gpkg_geom_blob(ring, srs_id)] + [
                r[k].item() if isinstance(r[k], np.generic) else r[k]
                for k in attr_keys
            ],
        )
    # empty layer => NULL extent in gpkg_contents (per the GPKG spec an
    # unknown/empty extent is represented as NULLs, not a crash)
    extent = (
        (min(allx), min(ally), max(allx), max(ally))
        if allx
        else (None, None, None, None)
    )
    cur.execute(
        "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
        "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
        (layer, "features", layer, *extent, srs_id),
    )
    cur.execute(
        "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
        (layer, "geom", "POLYGON", srs_id),
    )
    con.commit()
    con.close()


def with_wkb_column(df, poly_col: str, out_col: str = "wkb"):
    """Attach a WKB BinaryType column encoding the vertex-array polygon —
    the GeoParquet-compatible scale sink: ``df.write.parquet`` of the
    result is the distributed alternative to the driver-side GPKG
    collect (SURVEY.md §2 S3 scale note).  Arrow-vectorized pandas_udf;
    inverse is :func:`parse_polygon_wkb`."""
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("binary")
    def _encode(polys: pd.Series) -> pd.Series:
        return polys.map(
            lambda p: polygon_wkb(np.asarray([list(v) for v in p], dtype=float))
            if p is not None and len(p) >= 3
            else None
        )

    return df.withColumn(out_col, _encode(col(poly_col)))


def write_geoparquet(
    df,
    path: str,
    poly_col: str = "geom",
    geom_col: str = "geometry",
    crs: str = "OGC:CRS84",
    mode: str = "error",
) -> None:
    """Distributed GeoParquet-style sink — the at-scale alternative to
    the driver-side GPKG collect: every executor writes its own part
    files via ``df.write.parquet``, nothing funnels through the driver.

    The vertex-array polygon column is encoded as standard WKB (the
    GeoParquet geometry encoding; Arrow-vectorized pandas_udf) and the
    geometry field carries ``{version, encoding, geometry_types, crs}``
    metadata, persisted in the parquet footer's Spark schema and
    restored by :func:`read_geoparquet`.  Any engine that reads parquet
    sees a plain WKB binary column (DuckDB: ``ST_GeomFromWKB``,
    geopandas: ``shapely.wkb.loads``); stamping the OGC ``geo`` footer
    key for metadata-aware readers is a driver-side pyarrow post-pass
    if ever needed."""
    import json

    from pyspark.sql.functions import col

    meta = {
        "geoparquet": json.dumps(
            {
                "version": "1.1.0",
                "encoding": "WKB",
                "geometry_types": ["Polygon"],
                "crs": crs,
            }
        )
    }
    out = with_wkb_column(df, poly_col, "__wkb__").drop(poly_col)
    out = out.withColumn(geom_col, col("__wkb__").alias(geom_col, metadata=meta))
    out.drop("__wkb__").write.mode(mode).parquet(path)


def read_geoparquet(spark, path: str, geom_col: str = "geometry"):
    """Read a :func:`write_geoparquet` dataset -> (DataFrame, geo meta
    dict or None).  Geometry stays WKB; :func:`parse_polygon_wkb`
    recovers vertex arrays."""
    import json

    df = spark.read.parquet(path)
    meta = None
    for f in df.schema.fields:
        if f.name == geom_col and f.metadata and "geoparquet" in f.metadata:
            meta = json.loads(f.metadata["geoparquet"])
    return df, meta


def write_cells_geopackage(df, path: str, layer: str = "cells") -> None:
    """S3 sink for a tessellation result DataFrame (geometry/tessellate
    schema: wkt unused here, envelope-based ring from x1..y2 when no
    vertex array is present).

    Driver-side ``toPandas`` by design — small outputs only (the
    reference's demonstrated scale is <= ~10^5 cells).  Past ~10^5 rows
    use :func:`write_geoparquet`, which writes WKB part files from the
    executors with no driver collect."""
    pdf = df.toPandas()
    rows = []
    for _, r in pdf.iterrows():
        if "geom" in pdf.columns:
            ring = np.asarray([list(v) for v in r["geom"]], dtype=float)
        else:
            ring = np.array(
                [[r.x1, r.y1], [r.x2, r.y1], [r.x2, r.y2], [r.x1, r.y2]]
            )
        attrs = {
            k: r[k]
            for k in pdf.columns
            if k not in ("geom", "wkt") and np.isscalar(r[k])
        }
        rows.append({"geom": ring, **attrs})
    write_geopackage(path, layer, rows)
