"""Filesystem indirection for the virtual layer's BYTE-RANGE reads.

The kerchunk pattern's production shape is: index ONCE (a POSIX view
of the archive — the HDF5/GRIB2 walkers mmap metadata pages), then
answer every query from byte ranges.  The repeated read path must
therefore work wherever the archive actually lives at cluster scale —
an object store or a remote filesystem — not just on local mounts.

``open_binary``/``getsize`` dispatch on the path: plain paths (and
``file://``) use the standard library; URL-style paths
(``s3://…``, ``gs://…``, ``https://…``) go through **fsspec** when it
is installed and raise a NAMED error when it is not (the gated
optional-dependency discipline — fsspec is the de-facto public
filesystem abstraction the kerchunk ecosystem itself uses; it is not
in this container, so tests exercise the dispatch through an injected
stub).  fsspec file objects support ``seek``/``read``, which is all
the chunk scanner needs."""

from __future__ import annotations

import os

__all__ = ["getsize", "is_remote", "open_binary"]


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


def open_binary(path: str):
    """Open ``path`` for seekable binary reads — local via ``open``,
    remote via fsspec."""
    if is_remote(path):
        return _fsspec().open(path, "rb").open()
    return open(_strip_file_scheme(path), "rb")


def getsize(path: str) -> int:
    if is_remote(path):
        fs, rel = _fsspec().core.url_to_fs(path)
        return int(fs.size(rel))
    return os.path.getsize(_strip_file_scheme(path))
