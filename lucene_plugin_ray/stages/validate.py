"""Ingest validation + normalization (SURVEY.md §2.2 M5/M6/M8, §1.2).

A stateless zero-copy ``map_batches`` stage that:

* fills the constant "default" collection when the column is absent
  (SURVEY.md §1.2 "collection partition column"),
* sanitizes collection names by STRIPPING Lucene query-special characters
  (M5, ≙ LuceneIndexBean.escape, LuceneIndexBean.java:553-586),
* drops invalid rows — null/empty url, null warc_ts (M6, ≙ facade validation
  LuceneFacadeImpl.java:97-130 which throws LuceneException; the batch
  analogue routes them out of the pipeline and counts them),
* computes ``text_sha256`` — the byte-identity invariant artifact: the build
  carries the hash of EXACTLY the bytes it indexes, so tests can assert
  sha256(indexed text) == sha256(input text) per url (M8/§1.2: Arrow strings
  are already UTF-8, so indexText's getBytes(UTF_8) bridge at
  LuceneIndexBean.java:300-301 reduces to identity),
* assigns the document partition ``_p`` (fnv1a(collection\\x00url) % P).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.hashing import (
    fnv1a_bytes_column,
    mix64_np,
    sha256_column,
)

# Character class version of the M5 strip set for vectorized regex replace.
_SANITIZE_PATTERN = r'[+\-!(){}\[\]^"~*?:\\]'


def sanitize_collection_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.replace_substring_regex(arr, pattern=_SANITIZE_PATTERN, replacement="")


class ValidateAndPartition:
    """Callable for ``ds.map_batches(..., batch_format="pyarrow")``.

    ``reject_dir`` (optional) routes invalid rows to a side-output Parquet
    directory instead of silently dropping them — the batch analogue of the
    reference throwing LuceneException on bad input (M6,
    LuceneFacadeImpl.java:97-130)."""

    def __init__(self, cfg: IndexConfig, reject_dir: str | None = None):
        self.cfg = cfg
        self.reject_dir = reject_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lucene_plugin_ray.stages.segment_write import limit_intra_task_threads

        limit_intra_task_threads()
        cfg = self.cfg
        n = batch.num_rows
        if cfg.collection_column in batch.column_names:
            coll = pc.cast(batch[cfg.collection_column].combine_chunks(), pa.string())
            coll = pc.fill_null(coll, "default")
            coll = sanitize_collection_column(coll)
            batch = batch.drop_columns([cfg.collection_column])
        else:
            coll = pa.array(["default"] * n, type=pa.string())
        batch = batch.append_column("collection", coll)

        url = batch[cfg.url_column]
        valid = pc.fill_null(
            pc.and_kleene(
                pc.and_kleene(
                    url.is_valid(), pc.not_equal(pc.cast(url, pa.string()), "")
                ),
                batch[cfg.ts_column].is_valid(),
            ),
            False,
        )
        if pc.any(pc.invert(valid)).as_py():
            if self.reject_dir:
                import os
                import uuid

                import pyarrow.parquet as pq

                os.makedirs(self.reject_dir, exist_ok=True)
                rejects = batch.filter(pc.invert(valid))
                if "html" in rejects.column_names:
                    rejects = rejects.drop_columns(["html"])
                pq.write_table(
                    rejects,
                    os.path.join(self.reject_dir, f"rejects-{uuid.uuid4().hex}.parquet"),
                )
            batch = batch.filter(valid)

        text = batch[cfg.text_column].combine_chunks() if cfg.text_column in batch.column_names else pa.array([None] * batch.num_rows, type=pa.string())
        batch = batch.append_column("text_sha256", sha256_column(pc.fill_null(pc.cast(text, pa.string()), "")))

        key = pc.binary_join_element_wise(
            batch["collection"].combine_chunks(),
            pc.cast(batch[cfg.url_column].combine_chunks(), pa.string()),
            "\x00",
        )
        p = (mix64_np(fnv1a_bytes_column(key)) % np.uint64(cfg.num_partitions)).astype(
            np.int32
        )
        batch = batch.append_column("_p", pa.array(p, type=pa.int32()))
        # project away everything the shuffle doesn't need (notably the
        # `html` binary payload — SURVEY.md §7.4 "Wide rows": the tokenize
        # shuffle must never carry multi-MB blobs)
        needed = {
            cfg.url_column, cfg.ts_column, cfg.text_column, *cfg.field_columns,
            "collection", "text_sha256", "_p",
        }
        drop = [c for c in batch.column_names if c not in needed]
        return batch.drop_columns(drop) if drop else batch
