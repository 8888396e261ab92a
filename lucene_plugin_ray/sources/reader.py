"""Metadata-free Parquet reads (S4 source hygiene).

Parquet files written by pandas embed a ``b'pandas'`` schema-metadata blob.
``pa.Schema`` objects carrying metadata are UNHASHABLE (``hash(schema)``
raises ``unhashable type: 'dict'``), which knocks Ray Data off its
schema-deduplication fast path on every block concat — one
"Failed to hash the schemas (for deduplication)" warning per map task at
scale, plus the full ``unify_schemas`` walk instead of an O(1) set probe.

``read_parquet_clean`` strips the metadata at the READ by handing
``ray.data.read_parquet`` an explicit projected schema rebuilt from the file
footer (fields only, no file-level metadata), preserving the caller's column
order and the column-pruning contract (SURVEY.md §7.4: prune at the read).
Falls back to a plain read when the footer can't be inspected (e.g. remote
fsspec roots without a local listing).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def _clean_schema(path: str, columns: list[str] | None) -> pa.Schema | None:
    f = path
    if os.path.isdir(path):
        hits = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not hits:
            return None
        f = hits[0]
    if not os.path.isfile(f):
        return None
    try:
        full = pq.read_schema(f)
        fields = (
            [full.field(c) for c in columns] if columns is not None else list(full)
        )
        return pa.schema(fields)  # drops file-level (pandas) metadata
    except Exception:
        return None


def read_parquet_clean(
    path: str, columns: list[str] | None = None, **kwargs
) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` with an explicit metadata-free schema."""
    schema = _clean_schema(path, columns)
    if schema is not None:
        kwargs.setdefault("schema", schema)
    return ray.data.read_parquet(path, columns=columns, **kwargs)
