"""Malformed-input hygiene for the round-8 sources: every TRUNCATION
or byte-flip of a valid stream must raise the module's own error type
(or return a correct result, for flips the format's checksums don't
cover) — never an uncontrolled IndexError/struct.error/segfault.
Same property the WARC/zstd parsers are held to."""

from __future__ import annotations

import numpy as np
import pytest

from wrf_to_geodataframe_spark.sources.geotiff import (
    GeoTiffError,
    read_geotiff,
    write_geotiff,
)
from wrf_to_geodataframe_spark.sources.grib2 import (
    Grib2Error,
    read_grib2_bytes,
    write_grib2,
)
from wrf_to_geodataframe_spark.sources.zarr import ZarrError
from wrf_to_geodataframe_spark.sources.zarr3 import (
    _decode_chunk as _z3_decode,
)


def _grib_blob(tmp_path) -> bytes:
    p = str(tmp_path / "m.grib2")
    vals = np.arange(24, dtype="float64").reshape(4, 6)
    write_grib2(
        p,
        [
            {"values": vals, "lat0": 50.0, "lon0": 0.0, "dlat": -0.5,
             "dlon": 0.5,
             "packing": {"template": 3, "order": 2, "ref": 0.0,
                         "e": 0, "d": 0, "group_size": 5}},
            {"values": vals, "lat0": 50.0, "lon0": 0.0, "dlat": -0.5,
             "dlon": 0.5, "packing": {"template": 4}},
        ],
    )
    return open(p, "rb").read()


def test_grib2_truncation_prefixes(tmp_path):
    blob = _grib_blob(tmp_path)
    ok = read_grib2_bytes(blob)
    assert len(ok) == 2
    for n in range(0, len(blob), 7):
        try:
            read_grib2_bytes(blob[:n])
        except Grib2Error:
            pass
        # a prefix can never parse cleanly: total length mismatches
        else:
            pytest.fail(f"prefix of {n} bytes parsed without error")


def test_grib2_byte_flips(tmp_path):
    blob = _grib_blob(tmp_path)
    base = read_grib2_bytes(blob)
    rng = np.random.default_rng(0xF11)
    for _ in range(120):
        i = int(rng.integers(len(blob)))
        bad = bytearray(blob)
        bad[i] ^= 1 << int(rng.integers(8))
        try:
            out = read_grib2_bytes(bytes(bad))
        except Grib2Error:
            continue
        except (ValueError, OverflowError) as e:
            # numpy-size errors must still be ValueError family with
            # context, never IndexError/struct.error
            continue
        # GRIB2 carries no payload checksum: a flip inside packed data
        # may legally decode to different values — shapes must hold
        assert len(out) <= 2
        for m in out:
            assert m["values"].shape == (4, 6)


def test_geotiff_truncation_prefixes(tmp_path):
    p = str(tmp_path / "t.tif")
    rng = np.random.default_rng(2)
    write_geotiff(p, rng.standard_normal((20, 20)).astype("float32"),
                  tiled=True, tile=(16, 16), compression=8, predictor=3)
    blob = open(p, "rb").read()
    read_geotiff(blob)
    for n in range(0, len(blob), 5):
        try:
            read_geotiff(blob[:n])
        except GeoTiffError:
            pass
        else:
            pytest.fail(f"prefix of {n} bytes parsed without error")


def test_zarr3_chunk_decode_truncation():
    import struct as _struct
    import zlib as _zlib

    from wrf_to_geodataframe_spark.sources.zarr3 import crc32c

    vals = np.arange(64, dtype="<f8").tobytes()
    co = _zlib.compressobj(5, _zlib.DEFLATED, 31)
    gz = co.compress(vals) + co.flush()
    blob = gz + _struct.pack("<I", crc32c(gz))
    meta = {
        "dtype": np.dtype("<f8"),
        "codecs": [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "gzip", "configuration": {"level": 5}},
            {"name": "crc32c"},
        ],
    }
    ok = _z3_decode(blob, meta, (64,))
    np.testing.assert_array_equal(ok, np.arange(64.0))
    for n in range(len(blob)):
        with pytest.raises((ZarrError, _zlib.error)):
            _z3_decode(blob[:n], meta, (64,))


def _nc4_blobs(tmp_path):
    """Two NetCDF-4 twins of the same small grid: v1-B-tree chunked
    and Extensible-Array chunked (the appendable layout)."""
    from wrf_to_geodataframe_spark.sources.hdf5_write import write_netcdf4

    vals = np.arange(6 * 4 * 6, dtype="float64").reshape(6, 4, 6)
    blobs = []
    for i, unlim in enumerate([None, "t"]):
        p = str(tmp_path / f"f{i}.nc")
        write_netcdf4(
            p, {"t": 6, "y": 4, "x": 6},
            {"T2": {"dims": ["t", "y", "x"], "data": vals}},
            compress=True, chunk={"T2": (2, 4, 3)}, unlimited=unlim,
        )
        blobs.append(open(p, "rb").read())
    return blobs


def test_hdf5_truncation_prefixes(tmp_path):
    """Every truncation of a valid NetCDF-4 file (both chunk-index
    layouts) must raise Hdf5Error — never IndexError/struct.error —
    through BOTH executor entries (read_hdf5_bytes and, via a temp
    file, hdf5_chunk_manifest)."""
    from wrf_to_geodataframe_spark.sources.hdf5 import (
        Hdf5Error,
        hdf5_chunk_manifest,
        read_hdf5_bytes,
    )

    for blob in _nc4_blobs(tmp_path):
        n = len(blob)
        for cut in sorted({8, 64, 97, 300, 1021, n // 2, n - 3}):
            try:
                read_hdf5_bytes(blob[:cut])
            except Hdf5Error:
                pass
        # manifest path: a handful of cuts through a real file
        for cut in (97, n // 2, n - 3):
            p = str(tmp_path / "cut.nc")
            with open(p, "wb") as f:
                f.write(blob[:cut])
            try:
                hdf5_chunk_manifest(p, "T2")
            except Hdf5Error:
                pass


def test_hdf5_byte_flips(tmp_path):
    """Byte flips must either raise Hdf5Error or decode SOMETHING
    (v1 metadata has no checksums, so data flips are undetectable by
    design) — never an uncontrolled error type."""
    import random

    from wrf_to_geodataframe_spark.sources.hdf5 import (
        Hdf5Error,
        read_hdf5_bytes,
    )

    rng = random.Random(0xEA)
    for blob in _nc4_blobs(tmp_path):
        for _ in range(120):
            pos = rng.randrange(len(blob))
            bit = 1 << rng.randrange(8)
            mutated = bytearray(blob)
            mutated[pos] ^= bit
            try:
                read_hdf5_bytes(bytes(mutated))
            except Hdf5Error:
                pass


def test_shapefile_truncation_and_flips(tmp_path):
    """Truncations and byte flips of a valid .shp/.dbf pair must
    either parse or raise ShapefileError — never IndexError /
    struct.error / a silent hang (negative counts and zero-length
    records are guarded)."""
    import numpy as np

    from wrf_to_geodataframe_spark.sources.shapefile import (
        ShapefileError,
        read_dbf,
        read_shp,
        write_shapefile,
    )

    rings = [
        [[0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [0.0, 1.0]],
        [[5.0, 5.0], [7.0, 5.0], [6.0, 7.0]],
    ]
    shp = str(tmp_path / "f.shp")
    write_shapefile(shp, rings, [{"name": "a", "code": 1},
                                 {"name": "b", "code": 2}])
    for ext in (".shp", ".dbf"):
        path = shp[:-4] + ext
        reader = read_shp if ext == ".shp" else read_dbf
        with open(path, "rb") as f:
            blob = f.read()
        n = len(blob)
        for cut in sorted({4, 30, 99, 101, n // 2, n - 2}):
            p = str(tmp_path / f"cut{ext}")
            with open(p, "wb") as f:
                f.write(blob[:cut])
            try:
                reader(p)
            except ShapefileError:
                pass
        rng = np.random.default_rng(5)
        for _ in range(80):
            bad = bytearray(blob)
            i = int(rng.integers(0, n))
            bad[i] ^= int(rng.integers(1, 256))
            p = str(tmp_path / f"flip{ext}")
            with open(p, "wb") as f:
                f.write(bytes(bad))
            try:
                reader(p)
            except ShapefileError:
                pass
