"""Filesystem indirection for the virtual layer's BYTE-RANGE reads.

The kerchunk pattern's production shape is: index ONCE (a POSIX view
of the archive — the HDF5/GRIB2 walkers mmap metadata pages), then
answer every query from byte ranges.  The repeated read path must
therefore work wherever the archive actually lives at cluster scale —
an object store or a remote filesystem — not just on local mounts.

``open_binary``/``getsize`` dispatch on the path: plain paths (and
``file://``) use the standard library; ``http://``/``https://`` use a
BUILT-IN stdlib Range-request reader (zero dependencies — tested for
real against an in-process ``http.server`` in
tests/test_virtual.py); other URL schemes (``s3://…``, ``gs://…``) go
through **fsspec** when it is installed and raise a NAMED error when
it is not (the gated optional-dependency discipline — fsspec is the
de-facto public filesystem abstraction the kerchunk ecosystem itself
uses; it is not in this container, so tests exercise that dispatch
through an injected stub).  All returned file objects support
``seek``/``read``, which is all the chunk scanner needs."""

from __future__ import annotations

import os

__all__ = ["getsize", "is_remote", "open_binary"]

# Fail LOUDLY on a stalled server rather than hanging an executor task
# forever: every ranged GET gets this socket timeout.
HTTP_TIMEOUT_S = 30.0

# s3:// byte-range reads WITHOUT fsspec: when an S3 endpoint is
# configured, s3://bucket/key maps to the PATH-STYLE URL
# {endpoint}/bucket/key and reads go through the same stdlib ranged-GET
# reader as http:// — the address form every S3-compatible gateway
# (MinIO, LocalStack, Ceph RGW, public-bucket endpoints) serves.
# Requests are UNSIGNED (public buckets / gateways with ambient auth);
# private SigV4-signed buckets still need fsspec+s3fs.  The endpoint is
# resolved at CALL time, in order:
#   1. the Spark local property below — set it driver-side with
#      ``spark.sparkContext.setLocalProperty(S3_ENDPOINT_PROP, url)``;
#      Spark propagates local properties to every python worker, so
#      this works per-job on a live cluster with no executor restart;
#   2. the LIBRARY-OWNED ``WRF_S3_ENDPOINT`` env var (set it via
#      ``spark.executorEnv.WRF_S3_ENDPOINT`` at cluster launch);
#   3. the AWS SDK's ``AWS_ENDPOINT_URL`` env var, but ONLY when
#      s3fs is NOT installed: that variable belongs to the AWS SDK,
#      and an s3fs environment that sets it alongside credentials
#      (MinIO/LocalStack with auth) expects SIGNED SigV4 reads —
#      silently rerouting those onto the unsigned stdlib reader would
#      turn working private-bucket reads into 401/403s.  With s3fs
#      present, AWS_ENDPOINT_URL flows to it untouched; opting into
#      the stdlib reader anyway takes the library-owned var or the
#      Spark property, both of which this library does own.  The
#      probe is for s3fs specifically — fsspec alone (a ubiquitous
#      transitive dependency) cannot serve s3:// reads, so gating on
#      it would turn a working unsigned read into an ImportError.
S3_ENDPOINT_PROP = "wrf_to_geodataframe_spark.s3.endpoint"
S3_ENDPOINT_ENV = "WRF_S3_ENDPOINT"
_AWS_ENDPOINT_ENV = "AWS_ENDPOINT_URL"


def _s3fs_available() -> bool:
    import importlib.util

    try:
        return importlib.util.find_spec("s3fs") is not None
    except Exception:
        return False


def _s3_endpoint() -> str | None:
    """The configured S3 endpoint, or None (-> fsspec dispatch)."""
    try:
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is not None:
            v = tc.getLocalProperty(S3_ENDPOINT_PROP)
            if v:
                return v
        else:
            from pyspark import SparkContext

            sc = SparkContext._active_spark_context
            if sc is not None:
                v = sc.getLocalProperty(S3_ENDPOINT_PROP)
                if v:
                    return v
    except Exception:
        pass  # no pyspark on the path / no live context: env only
    v = os.environ.get(S3_ENDPOINT_ENV)
    if v:
        return v
    # AWS SDK var: honored only as a last resort when no s3fs exists
    # to do the signed read — see the resolution-order comment above.
    v = os.environ.get(_AWS_ENDPOINT_ENV)
    if v and not _s3fs_available():
        return v
    return None


def _s3_to_http(path: str, endpoint: str) -> str:
    """s3://bucket/key -> {endpoint}/bucket/key (path-style).  The key
    is percent-encoded ('/' kept) so names with '#', '?', spaces or
    '%' address the right object instead of being parsed as URL
    syntax."""
    import urllib.parse

    rest = path[len("s3://"):]
    if "/" not in rest or not rest.split("/", 1)[1]:
        raise ValueError(f"{path}: expected s3://bucket/key")
    bucket, key = rest.split("/", 1)
    return (endpoint.rstrip("/") + "/" + bucket + "/"
            + urllib.parse.quote(key, safe="/"))


class HttpRangeFile:
    """Seekable read-only view over an HTTP(S) object using stdlib
    ``urllib`` Range requests: each ``read(n)`` issues ONE ranged GET
    for exactly the bytes asked for — the repeated-read path of the
    virtual layer (never a full-object download).  A server that
    ignores Range (responds 200) fails LOUDLY: silently downloading a
    multi-TB archive member is worse than an error."""

    def __init__(self, url: str):
        self.url = url
        self._pos = 0
        self._size = None  # filled lazily by size()

    def size(self) -> int:
        if self._size is None:
            import urllib.request

            req = urllib.request.Request(
                self.url, headers={"Range": "bytes=0-0"}
            )
            with urllib.request.urlopen(req, timeout=HTTP_TIMEOUT_S) as resp:
                if resp.status == 206:
                    cr = resp.headers.get("Content-Range", "")
                    # "bytes 0-0/N"
                    self._size = int(cr.rsplit("/", 1)[1])
                    resp.read()
                else:
                    raise ValueError(
                        f"{self.url}: server answered {resp.status} to a "
                        "Range request — byte-range reads need an "
                        "HTTP server with Range support"
                    )
        return self._size

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = int(offset)
        elif whence == 1:
            self._pos += int(offset)
        elif whence == 2:
            self._pos = self.size() + int(offset)
        else:
            raise ValueError(f"whence {whence}")
        return self._pos

    def tell(self) -> int:
        return self._pos

    def read(self, n: int = -1) -> bytes:
        import urllib.request

        if n is not None and n == 0:
            return b""
        if n is None or n < 0:
            end = self.size() - 1
        else:
            end = self._pos + int(n) - 1
        if self._size is not None and self._pos >= self._size:
            return b""  # known EOF: save the doomed request
        req = urllib.request.Request(
            self.url, headers={"Range": f"bytes={self._pos}-{end}"}
        )
        import urllib.error

        try:
            with urllib.request.urlopen(req, timeout=HTTP_TIMEOUT_S) as resp:
                if resp.status != 206:
                    raise ValueError(
                        f"{self.url}: server answered {resp.status} to "
                        "a Range request — byte-range reads need an "
                        "HTTP server with Range support"
                    )
                data = resp.read()
        except urllib.error.HTTPError as exc:
            if exc.code == 416:  # asked past EOF: nothing to read
                return b""
            raise
        self._pos += len(data)
        return data

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def is_remote(path: str) -> bool:
    """URL-style paths with a scheme other than ``file`` are remote."""
    if "://" not in path:
        return False
    scheme = path.split("://", 1)[0]
    return scheme != "file"


def _strip_file_scheme(path: str) -> str:
    return path[7:] if path.startswith("file://") else path


def _fsspec():
    try:
        import fsspec
    except ImportError as exc:
        raise ValueError(
            "remote paths need the fsspec package (the public "
            "filesystem abstraction); install it or mount the "
            "archive as a local path"
        ) from exc
    return fsspec


def _is_http(path: str) -> bool:
    return path.startswith(("http://", "https://"))


def open_binary(path: str):
    """Open ``path`` for seekable binary reads — local via ``open``,
    http(s) via the built-in stdlib Range reader, s3 via the same
    reader when an endpoint is configured (see S3_ENDPOINT_PROP),
    other remote schemes via fsspec."""
    if _is_http(path):
        return HttpRangeFile(path)
    if path.startswith("s3://"):
        ep = _s3_endpoint()
        if ep:
            return HttpRangeFile(_s3_to_http(path, ep))
    if is_remote(path):
        return _fsspec().open(path, "rb").open()
    return open(_strip_file_scheme(path), "rb")


def getsize(path: str) -> int:
    if _is_http(path):
        return HttpRangeFile(path).size()
    if path.startswith("s3://"):
        ep = _s3_endpoint()
        if ep:
            return HttpRangeFile(_s3_to_http(path, ep)).size()
    if is_remote(path):
        fs, rel = _fsspec().core.url_to_fs(path)
        return int(fs.size(rel))
    return os.path.getsize(_strip_file_scheme(path))
