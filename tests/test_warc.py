"""WARC reader tests: hand-built archives (plain and per-record
gzipped, the Common Crawl layout), HTTP payload split, the Spark
source end-to-end, and a composition into the curation surface."""

from __future__ import annotations

import gzip

import pytest

from wrf_to_geodataframe_spark.sources.warc import (
    iter_warc_records,
    parse_http_response,
    read_warc,
)


def _record(wtype: str, uri: str | None, payload: bytes,
            rid: str = "<urn:uuid:1>") -> bytes:
    h = [
        b"WARC/1.0",
        b"WARC-Type: " + wtype.encode(),
        b"WARC-Record-ID: " + rid.encode(),
        b"WARC-Date: 2026-08-14T00:00:00Z",
    ]
    if uri:
        h.append(b"WARC-Target-URI: " + uri.encode())
    h.append(b"Content-Type: application/http;msgtype=response")
    h.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200,
          ctype: bytes = b"text/html") -> bytes:
    return (b"HTTP/1.1 " + str(status).encode() + b" OK\r\n"
            b"Content-Type: " + ctype + b"\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            b"\r\n" + body)


def _archive() -> bytes:
    return (
        _record("warcinfo", None, b"robots: classic\r\n")
        + _record("response", "https://example.com/a",
                  _http(b"hello world page one"))
        + _record("response", "https://example.com/b",
                  _http(b"second doc body", status=404))
        + _record("request", "https://example.com/a",
                  b"GET /a HTTP/1.1\r\n\r\n")
    )


def test_iter_records_plain_and_gzipped():
    for blob in (_archive(),
                 b"".join(gzip.compress(r) for r in [
                     _record("warcinfo", None, b"x"),
                     _record("response", "https://e.com",
                             _http(b"per-member gzip")),
                 ])):
        recs = list(iter_warc_records(blob))
        assert recs[0][0]["warc-type"] == "warcinfo"
        assert all("content-length" in h for h, _ in recs)


def test_http_split():
    status, headers, body = parse_http_response(_http(b"payload!"))
    assert status == 200
    assert headers["content-type"] == "text/html"
    assert body == b"payload!"
    s, h, b = parse_http_response(b"GET / HTTP...not a response")
    assert s is None and b.startswith(b"GET")


def test_corruption_rejections():
    good = _archive()
    with pytest.raises(ValueError, match="bad version"):
        list(iter_warc_records(b"NOPE/1.0\r\n\r\n"))
    with pytest.raises(ValueError, match="short payload"):
        # cut inside the LAST record's payload (19 B) + separator (4 B)
        list(iter_warc_records(good[: len(good) - 8]))
    bad = good.replace(b"Content-Length", b"X-Length", 1)
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(bad))


def test_read_warc_spark_source(spark, tmp_path):
    (tmp_path / "crawl-00.warc").write_bytes(_archive())
    (tmp_path / "crawl-01.warc.gz").write_bytes(
        gzip.compress(_record("response", "https://example.com/c",
                              _http(b"third body from gz")))
    )
    df = read_warc(spark, str(tmp_path))
    recs = df.collect()
    assert len(recs) == 5
    # the request and response for /a share the URI; split by type
    by_type = {(r.target_uri, r.warc_type): r for r in recs}
    resp_a = by_type[("https://example.com/a", "response")]
    assert resp_a.http_status == 200
    assert bytes(resp_a.body) == b"hello world page one"
    assert by_type[("https://example.com/b", "response")].http_status == 404
    assert bytes(
        by_type[("https://example.com/c", "response")].body
    ) == b"third body from gz"


def test_warc_feeds_the_curation_surface(spark, tmp_path):
    """End-to-end: WARC responses become a documents-shaped table the
    pipeline operators run on directly."""
    from pyspark.sql import functions as F

    (tmp_path / "c.warc").write_bytes(_archive())
    docs = (
        read_warc(spark, str(tmp_path))
        .filter((F.col("warc_type") == "response")
                & (F.col("http_status") == 200))
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("body").cast("string").alias("text"),
            F.col("target_uri"),
        )
    )
    out = docs.select(
        "target_uri",
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
    ).collect()
    assert {(r.target_uri, r.n_words) for r in out} == {
        ("https://example.com/a", 4),
    }


# ------------------------------------------------------- fuzz (r7 #8)

from hypothesis import given, settings
from hypothesis import strategies as st

_hname = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ-",
    min_size=1, max_size=20,
).filter(lambda s: s.lower() not in ("content-length", "warc-type"))
_hval = st.text(
    alphabet=st.characters(
        codec="latin-1", exclude_characters="\r\n"
    ),
    max_size=40,
).map(str.strip)


def _serialize(records) -> bytes:
    out = []
    for wtype, payload, extra in records:
        lines = [b"WARC/1.0", b"WARC-Type: " + wtype.encode()]
        for k, v in extra.items():
            lines.append(k.encode("latin-1") + b": " + v.encode("latin-1"))
        lines.append(b"Content-Length: " + str(len(payload)).encode())
        out.append(
            b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        )
    return b"".join(out)


@settings(max_examples=100, deadline=None)
@given(
    records=st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "warcinfo", "metadata"]),
            st.binary(max_size=500),
            st.dictionaries(_hname, _hval, max_size=4),
        ),
        min_size=1,
        max_size=6,
    ),
    per_record_gzip=st.booleans(),
)
def test_fuzz_warc_serialize_parse_round_trip(records, per_record_gzip):
    # header names are case-insensitive on parse: drop case collisions
    records = [
        (t, p, {k: v for k, v in
                {kk.lower(): (kk, vv) for kk, vv in e.items()}.values()})
        for t, p, e in records
    ]
    blob = (
        b"".join(
            gzip.compress(_serialize([r])) for r in records
        )
        if per_record_gzip
        else _serialize(records)
    )
    got = list(iter_warc_records(blob))
    assert len(got) == len(records)
    for (wtype, payload, extra), (headers, gpayload) in zip(records, got):
        assert headers["warc-type"] == wtype
        assert gpayload == payload
        for k, v in extra.items():
            if k.lower() not in ("warc-type",):
                assert headers[k.lower()] == v


@settings(max_examples=100, deadline=None)
@given(
    records=st.lists(
        st.tuples(
            st.sampled_from(["response", "request"]),
            st.binary(max_size=300),
            st.just({}),
        ),
        min_size=1,
        max_size=4,
    ),
    data=st.data(),
)
def test_fuzz_warc_truncation_never_yields_garbage(records, data):
    """Cutting an archive at ANY byte either raises a named ValueError
    or yields an exact prefix of the true record list — never a
    corrupted or phantom record."""
    blob = _serialize(records)
    full = list(iter_warc_records(blob))
    cut = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
    try:
        got = list(iter_warc_records(blob[:cut]))
    except ValueError:
        return
    assert got == full[: len(got)]
