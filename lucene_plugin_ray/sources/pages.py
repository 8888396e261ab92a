"""Corpus sources (SURVEY.md §2.1 S1/S4).

``read_pages`` is the canonical source: a Parquet table in the
BASELINE.json input_hint shape (url, warc_ts, html, text, lang).  Columns are
pruned AT THE READ (S4 → ray.data.read_parquet(columns=...)): the conformance
path never ships the `html` binary payload through the tokenize stages
(SURVEY.md §7.4 "Wide rows").

``documents_as_pages`` adapts the driver testdata table
(/root/testdata/sf*/documents.parquet: doc_id, text, lang, source, n_chars —
TESTDATA.md) into the pages shape (FIXTURES.md §7 degenerate mapping):
url = doc://{doc_id:010d} (zero-padded so url order == doc_id order within a
partition), warc_ts = epoch + doc_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.sources.reader import read_parquet_clean

_EPOCH_US = 1_600_000_000_000_000


def read_pages(path: str, cfg: IndexConfig, with_html: bool = False) -> "ray.data.Dataset":
    """Read a pages-shaped Parquet corpus with column pruning at the read."""
    cols = [cfg.url_column, cfg.ts_column, cfg.text_column, *cfg.field_columns]
    if with_html:
        cols.append("html")
    return read_parquet_clean(path, columns=cols)


def _doc_urls(doc_ids: pa.Array) -> pa.Array:
    padded = pc.utf8_lpad(pc.cast(doc_ids, pa.string()), 10, "0")
    return pc.binary_join_element_wise("doc://", padded, "")


def documents_to_pages_batch(batch: pa.Table) -> pa.Table:
    """Vectorized documents → pages adapter (map_batches body)."""
    ids = batch["doc_id"].combine_chunks()
    ts = pc.add(pc.cast(ids, pa.int64()), _EPOCH_US)
    out = pa.table(
        {
            "url": _doc_urls(ids),
            "warc_ts": pc.cast(ts, pa.timestamp("us")),
            "text": pc.cast(batch["text"].combine_chunks(), pa.string()),
            "lang": pc.cast(batch["lang"].combine_chunks(), pa.string()),
            "source": pc.cast(batch["source"].combine_chunks(), pa.string()),
        }
    )
    return out


def documents_as_pages(sf_dir: str) -> "ray.data.Dataset":
    """Driver testdata documents table in pages shape."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return ds.map_batches(documents_to_pages_batch, batch_format="pyarrow", zero_copy_batch=True)


def url_to_doc_id(urls: pa.Array) -> pa.Array:
    """Inverse of the doc:// mapping (query results → doc_id)."""
    return pc.cast(pc.utf8_slice_codeunits(urls, 6, 99), pa.int64())
