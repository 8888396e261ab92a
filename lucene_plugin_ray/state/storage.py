"""Storage abstraction for index roots (SURVEY.md §2.11 storage roots).

≙ the reference's ``BfsDirectory`` (service/src/main/java/com/caucho/lucene/
bfs/BfsDirectory.java:26-360): Lucene's Directory over a shared blob store so
writers and readers on DIFFERENT nodes see one index.  Here: an index root is
either a plain local path (direct-OS fast path — atomic ``os.rename`` commit,
``np.memmap`` reads) or an fsspec URL (``s3://…``, ``gcs://…``, ``file://…``,
``memory://…``) where every node resolves the same shared filesystem.

Commit protocol by backend:

* **local path** — payload files are written into a hidden tmp dir, then one
  atomic ``os.rename(tmp, final)`` publishes the segment (crash → no final
  dir → rebuild).
* **URL root** — object stores have no atomic rename, so payload files are
  written under the FINAL name and ``meta.json`` is written LAST; a segment
  without ``meta.json`` is invisible (the resume check keys on it), and the
  index itself only becomes visible when the manifest — one single-object
  PUT, atomic on every real object store — is written after all segments.
  Together: manifest-last commit, per-segment meta-last resume.

``memory://`` is per-process (fsspec MemoryFileSystem) — fine for unit tests
of this protocol, but a multi-worker build needs a genuinely shared scheme
(``file://``, ``s3://``).
"""

from __future__ import annotations

import json
import os
import posixpath
import shutil


def is_url(path: str) -> bool:
    return "://" in path


def _fs(path: str):
    """(filesystem, fs-internal path) for a URL.  fsspec caches instances."""
    import fsspec

    return fsspec.core.url_to_fs(path)


def join(base: str, *parts: str) -> str:
    if is_url(base):
        return posixpath.join(base, *parts)
    return os.path.join(base, *parts)


def exists(path: str) -> bool:
    if is_url(path):
        fs, p = _fs(path)
        return fs.exists(p)
    return os.path.exists(path)


def isdir(path: str) -> bool:
    if is_url(path):
        fs, p = _fs(path)
        return fs.isdir(p)
    return os.path.isdir(path)


def makedirs(path: str) -> None:
    if is_url(path):
        fs, p = _fs(path)
        fs.makedirs(p, exist_ok=True)
    else:
        os.makedirs(path, exist_ok=True)


def rmtree(path: str) -> None:
    if is_url(path):
        fs, p = _fs(path)
        if fs.exists(p):
            fs.rm(p, recursive=True)
    else:
        shutil.rmtree(path, ignore_errors=True)


def listdir_names(path: str) -> list[str]:
    """Basenames of direct children (for manifest discovery)."""
    if is_url(path):
        fs, p = _fs(path)
        if not fs.isdir(p):
            return []
        return [posixpath.basename(x.rstrip("/")) for x in fs.ls(p, detail=False)]
    if not os.path.isdir(path):
        return []
    return os.listdir(path)


def read_bytes(path: str) -> bytes:
    if is_url(path):
        fs, p = _fs(path)
        return fs.cat_file(p)
    with open(path, "rb") as f:
        return f.read()


def file_size(path: str) -> int:
    if is_url(path):
        fs, p = _fs(path)
        return int(fs.info(p)["size"])
    return os.path.getsize(path)


def read_bytes_range(path: str, start: int, end: int) -> bytes:
    """Bytes ``[start, end)`` of one file — a ranged GET on object stores
    (fsspec ``cat_file(start=, end=)``), a seek+read locally.  The remote
    segment reader's page-granular fetch path (state/segment.py
    _LazyRegion) is the only consumer."""
    if is_url(path):
        fs, p = _fs(path)
        return fs.cat_file(p, start=start, end=end)
    with open(path, "rb") as f:
        f.seek(start)
        return f.read(end - start)


def write_bytes(path: str, data: bytes) -> None:
    if is_url(path):
        fs, p = _fs(path)
        with fs.open(p, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)


def read_json(path: str) -> dict:
    return json.loads(read_bytes(path).decode())


def write_json(path: str, obj: dict, *, atomic: bool = False, indent=None) -> None:
    """``atomic`` (local only): tmp + rename.  URL backends rely on the
    single-object PUT being atomic (true of real object stores)."""
    data = json.dumps(obj, indent=indent).encode()
    if atomic and not is_url(path):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.rename(tmp, path)
    else:
        write_bytes(path, data)


def write_parquet(table, path: str) -> None:
    import pyarrow.parquet as pq

    if is_url(path):
        fs, p = _fs(path)
        with fs.open(p, "wb") as f:
            pq.write_table(table, f)
    else:
        pq.write_table(table, path)


def read_parquet(path: str):
    import pyarrow.parquet as pq

    if is_url(path):
        fs, p = _fs(path)
        with fs.open(p, "rb") as f:
            return pq.read_table(f)
    return pq.read_table(path)
