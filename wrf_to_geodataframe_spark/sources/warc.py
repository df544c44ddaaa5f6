"""WARC (Web ARChive, ISO 28500) reader: the Common Crawl ingestion
surface.

North-star LLM-pipeline source (no reference counterpart): web-scale
text corpora arrive as WARC files — record-oriented archives of HTTP
exchanges — so the engine ingests them natively and hands each record
to the curation pipeline (url_dedup / text_quality / dedup_*) as
ordinary rows.

Implemented from the public ISO 28500 / WARC 1.0-1.1 format:

- ``iter_warc_records(buf)``: record iterator over one WARC file
  buffer — version line, CRLF-terminated named headers, exactly
  ``Content-Length`` payload bytes, the mandatory CRLF CRLF record
  separator — tolerant of per-record-gzipped archives (the Common
  Crawl layout: each record is its own gzip member; Python's zlib
  consumes members sequentially) AND of zstd-compressed archives
  (.warc.zst per the IIPC warc-zstd convention: per-record zstd
  frames, optional leading skippable-frame dictionary — decoded by
  the from-scratch RFC 8878 implementation in sources/zstd.py, or
  the system libzstd when present).
- ``parse_http_response(payload)``: status code, response headers,
  and body split for ``response`` records (the part a text pipeline
  actually wants).
- ``read_warc(spark, path)``: distributed Spark source —
  ``binaryFile`` scan (one task per archive file, the unit Common
  Crawl shards at: ~1 GB per .warc.gz, thousands of files per crawl)
  with record parsing inside ``mapInPandas`` Arrow batches.  Schema:
  (warc_type, record_id, target_uri, warc_date, content_type,
  http_status, http_content_type, body binary).

At 100 TB the parallelism unit is the archive FILE (gzip members
cannot be split mid-stream without an index), which matches how
Common Crawl is sharded; downstream repartitioning redistributes
records once parsed.
"""

from __future__ import annotations

import zlib
from typing import Iterator

_CRLF = b"\r\n"


def _gunzip_members(buf: bytes) -> bytes:
    """Decompress the archive's member layout: per-record gzip
    (.warc.gz, the classic Common Crawl shape), zstd frames
    (.warc.zst, the IIPC warc-zstd convention — per-record frames
    with an optional leading skippable-frame dictionary;
    sources/zstd.py), or plain uncompressed WARC."""
    if len(buf) >= 4:
        from wrf_to_geodataframe_spark.sources.zstd import (
            is_zstd,
            warc_zstd_decompress,
        )

        if is_zstd(buf):
            return warc_zstd_decompress(buf)
    if buf[:2] != b"\x1f\x8b":
        return buf
    out = []
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(buf[pos:]))
        out.append(d.flush())
        consumed = len(buf) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("corrupt WARC: gzip member consumed nothing")
        pos += consumed
    return b"".join(out)


def iter_warc_records(buf: bytes):
    """Yield (headers: dict, payload: bytes) per record.  Header names
    are lower-cased; the version line is checked."""
    data = _gunzip_members(bytes(buf))
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("truncated WARC: no version line terminator")
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"corrupt WARC: bad version line {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("truncated WARC: unterminated headers")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            if b":" not in line:
                raise ValueError(f"corrupt WARC: bad header {line[:40]!r}")
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("corrupt WARC: missing Content-Length") from exc
        payload = data[pos : pos + length]
        if len(payload) < length:
            raise ValueError("truncated WARC: short payload")
        pos += length
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("corrupt WARC: missing record separator")
        pos += 4
        yield headers, payload


def parse_http_response(payload: bytes):
    """(status: int | None, headers: dict, body: bytes) for an HTTP
    response payload; (None, {}, payload) when it is not HTTP."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return None, {}, payload
    head = payload[:sep].split(_CRLF)
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        return None, {}, payload
    headers = {}
    for line in head[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
    return status, headers, payload[sep + 4 :]


def read_warc(spark, path: str):
    """Distributed WARC scan: every archive file becomes one task;
    records parse inside Arrow batches."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("warc_type", StringType()),
            StructField("record_id", StringType()),
            StructField("target_uri", StringType()),
            StructField("warc_date", StringType()),
            StructField("content_type", StringType()),
            StructField("http_status", LongType()),
            StructField("http_content_type", StringType()),
            StructField("body", BinaryType()),
        ]
    )

    files = spark.read.format("binaryFile").load(path)

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = {f.name: [] for f in schema.fields}
            for buf in pdf["content"]:
                for headers, payload in iter_warc_records(bytes(buf)):
                    status, hh, body = parse_http_response(payload)
                    rows["warc_type"].append(headers.get("warc-type"))
                    rows["record_id"].append(headers.get("warc-record-id"))
                    rows["target_uri"].append(
                        headers.get("warc-target-uri")
                    )
                    rows["warc_date"].append(headers.get("warc-date"))
                    rows["content_type"].append(
                        headers.get("content-type")
                    )
                    rows["http_status"].append(status)
                    rows["http_content_type"].append(
                        hh.get("content-type")
                    )
                    rows["body"].append(body)
            out = pd.DataFrame(rows)
            out["http_status"] = out["http_status"].astype("Int64")
            yield out

    return files.select("content").mapInPandas(_batches, schema)
