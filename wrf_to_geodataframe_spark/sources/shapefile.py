"""Shapefile scan (SURVEY.md §2 S2, ``gpd.read_file`` at
wrf_voronoi.py:185-187): pure-struct parser for .shp (point/polyline/
polygon) + .dbf (dBase III attributes), from the public ESRI spec.

Returns the engine's wire format — one row per shape with the vertex
array (outer ring for polygons), WKT, and the DBF attribute columns.
The reference reads a borough boundary file this way and broadcasts it
into P5; such files are small, so a driver-side parse +
``createDataFrame`` is the right physical plan (at scale: binaryFile +
mapInPandas, one file per task).
"""

from __future__ import annotations

import struct

import numpy as np

SHP_POINT, SHP_POLYLINE, SHP_POLYGON = 1, 3, 5


def read_shp(path: str) -> list[dict]:
    """Parse a .shp file -> [{fid, shape_type, parts: [np.ndarray]}]."""
    with open(path, "rb") as f:
        buf = f.read()
    (magic,) = struct.unpack_from(">i", buf, 0)
    if magic != 9994:
        raise ValueError(f"{path}: not a shapefile (bad magic {magic})")
    (flen_words,) = struct.unpack_from(">i", buf, 24)
    end = flen_words * 2
    out = []
    pos = 100
    while pos < end:
        recno, content_words = struct.unpack_from(">ii", buf, pos)
        pos += 8
        (stype,) = struct.unpack_from("<i", buf, pos)
        if stype == SHP_POINT:
            x, y = struct.unpack_from("<dd", buf, pos + 4)
            parts = [np.array([[x, y]])]
        elif stype in (SHP_POLYLINE, SHP_POLYGON):
            nparts, npoints = struct.unpack_from("<ii", buf, pos + 36)
            part_idx = list(
                struct.unpack_from(f"<{nparts}i", buf, pos + 44)
            ) + [npoints]
            pts = np.frombuffer(
                buf, dtype="<f8", count=npoints * 2, offset=pos + 44 + 4 * nparts
            ).reshape(-1, 2)
            parts = [
                pts[part_idx[k]:part_idx[k + 1]].copy() for k in range(nparts)
            ]
        elif stype == 0:  # null shape
            parts = []
        else:
            raise NotImplementedError(f"shape type {stype}")
        out.append({"fid": recno, "shape_type": stype, "parts": parts})
        pos += 8 + content_words * 2 - 8  # content includes the type int
    return out


def read_dbf(path: str) -> list[dict]:
    """Parse a dBase III .dbf -> one attribute dict per record
    (C -> str, N/F -> float/int, L -> bool)."""
    with open(path, "rb") as f:
        buf = f.read()
    nrec, hsize, rsize = struct.unpack_from("<iHH", buf, 4)
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        name = buf[pos:pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    out = []
    pos = hsize
    for _ in range(nrec):
        if buf[pos:pos + 1] == b"*":  # deleted
            pos += rsize
            continue
        rec, off = {}, pos + 1
        for name, ftype, flen, fdec in fields:
            raw = buf[off:off + flen].decode("ascii", errors="replace").strip()
            off += flen
            if ftype in ("N", "F"):
                if raw == "":
                    rec[name] = None
                elif fdec or ftype == "F" or "." in raw:
                    rec[name] = float(raw)
                else:
                    rec[name] = int(raw)
            elif ftype == "L":
                rec[name] = raw.upper() in ("T", "Y")
            else:
                rec[name] = raw
        out.append(rec)
        pos += rsize
    return out


def read_shapefile(spark, shp_path: str):
    """S2: .shp + (optional) .dbf -> DataFrame with fid, vertex-array
    geometry (outer ring), WKT, and attribute columns."""
    import os

    import pandas as pd

    from wrf_to_geodataframe_spark.geometry.polygons import polygon_wkt

    shapes = read_shp(shp_path)
    dbf_path = shp_path[:-4] + ".dbf"
    attrs = read_dbf(dbf_path) if os.path.exists(dbf_path) else [{}] * len(shapes)
    rows = []
    for shp, att in zip(shapes, attrs):
        ring = shp["parts"][0] if shp["parts"] else np.empty((0, 2))
        # .shp outer rings are CLOCKWISE per spec; the engine's
        # convention is ccw (O2) — reverse on ingest
        if shp["shape_type"] == SHP_POLYGON and len(ring) >= 3:
            ring = ring[::-1].copy()
            if np.allclose(ring[0], ring[-1]):
                ring = ring[:-1]  # drop the closing duplicate
        rows.append(
            {
                "fid": shp["fid"],
                "shape_type": shp["shape_type"],
                "geom": [[float(x), float(y)] for x, y in ring],
                "wkt": polygon_wkt(ring)
                if shp["shape_type"] == SHP_POLYGON
                else None,
                **att,
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))
