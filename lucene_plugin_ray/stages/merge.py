"""K3 — segment merge / generation compaction (SURVEY.md §2.7).

≙ Lucene's TieredMergePolicy + ConcurrentMergeScheduler background merges
(LuceneIndexBean.java:671-686): multiple generations' segments for the same
(collection, document-partition) are merged into one segment of a new
generation, dropping tombstoned/cleared docs, and the new manifest is marked
``compacted`` so query engines ignore all older generations.

Execution is an actor-pool stage over a small dataset of merge tasks (one row
per (collection, partition)):

    ray.data.from_items(tasks).map_batches(MergeWorker, concurrency=N)

Each merge is partition-local: inputs are docid-disjoint, url-sorted doc
tables (upsert tombstones guarantee url-uniqueness across generations), so
the merged doc order is a k-way merge of sorted runs, docid remapping is
monotonic per input, and posting lists concatenate in docid order after
remap.  Merge fan-in respects ``cfg.merge_fanin`` (mirroring
maxMergeAtOnce=10, LuceneIndexBean.java:97): more than ``fanin`` generations
are compacted in waves by ``compact_index``.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.docid import DOCID_STRIDE
from lucene_plugin_ray.stages.segment_write import encode_and_write_segment
from lucene_plugin_ray.state.segment import SegmentReader


def merge_segments_for_partition(
    seg_paths: list[str],
    alive_masks: list[np.ndarray],
    coll: str,
    p: int,
    cfg: IndexConfig,
    generation: int,
) -> dict:
    """Merge k input segments (ascending generation) of one (collection,
    partition) into a single segment of ``generation``.  Returns the manifest
    row.  Idempotent via the same lineage-digest skip as the build path."""
    from lucene_plugin_ray.stages.segment_write import limit_intra_task_threads

    limit_intra_task_threads()
    t0 = time.monotonic()
    readers = [SegmentReader(path) for path in seg_paths]
    fields = cfg.fields()

    # ---- merged doc table: k-way merge of url-sorted alive doc runs ----
    urls_parts, sha_parts, ts_parts, seg_ids, local_ids = [], [], [], [], []
    dl_parts: dict[str, list[np.ndarray]] = {f: [] for f in fields}
    for si, (r, alive) in enumerate(zip(readers, alive_masks)):
        idx = np.flatnonzero(alive)
        urls_parts.append(r.urls[idx])
        sha_parts.append(r.text_sha256[idx])
        ts_parts.append(r.warc_ts[idx])
        for f in fields:
            dl_parts[f].append(r.doc_len.get(f, np.zeros(r.n_docs, np.int32))[idx])
        seg_ids.append(np.full(idx.size, si, dtype=np.int32))
        local_ids.append(idx)
    urls = np.concatenate(urls_parts) if urls_parts else np.empty(0, object)
    order = np.argsort(urls, kind="stable")  # urls unique across inputs
    urls = urls[order]
    shas = np.concatenate(sha_parts)[order] if urls.size else np.empty(0, object)
    tss = np.concatenate(ts_parts)[order] if urls.size else np.empty(0, np.int64)
    seg_of = np.concatenate(seg_ids)[order] if urls.size else np.empty(0, np.int32)
    loc_of = np.concatenate(local_ids)[order] if urls.size else np.empty(0, np.int64)
    n_docs = urls.size
    dl_arrays = {
        f: (np.concatenate(parts)[order] if n_docs else np.empty(0, np.int32))
        for f, parts in dl_parts.items()
    }

    # old (segment, local docid) → new rank (monotonic per input)
    remap: list[np.ndarray] = []
    new_rank = np.arange(n_docs, dtype=np.int64)
    for si, r in enumerate(readers):
        m = np.full(r.n_docs, -1, dtype=np.int64)
        sel = seg_of == si
        m[loc_of[sel]] = new_rank[sel]
        remap.append(m)

    doc_base = p * DOCID_STRIDE

    # ---- gather + remap postings from every input's term dictionary ----
    f_parts, t_parts, d_parts, tf_parts = [], [], [], []
    for si, r in enumerate(readers):
        for row in range(len(r._terms)):
            docids, tfs = r.postings(row)
            nid = remap[si][r.local_ids(docids)]
            ok = nid >= 0
            if not ok.any():
                continue
            nid, tfs = nid[ok], tfs[ok]
            f_parts.append(np.full(nid.size, r._fields[row], dtype=object))
            t_parts.append(np.full(nid.size, r._terms[row], dtype=object))
            d_parts.append(doc_base + nid)
            tf_parts.append(tfs.astype(np.int32))

    post_table = None
    if d_parts:
        post_table = pa.table(
            {
                "field": pa.array(np.concatenate(f_parts), type=pa.string()),
                "term": pa.array(np.concatenate(t_parts), type=pa.string()),
                "docid": pa.array(np.concatenate(d_parts), type=pa.int64()),
                "tf": pa.array(np.concatenate(tf_parts), type=pa.int32()),
            }
        )
    return encode_and_write_segment(
        coll,
        p,
        doc_base,
        cfg,
        generation,
        pa.array(urls, type=pa.string()),
        pa.array(shas, type=pa.string()),
        pa.array(tss, type=pa.int64()),
        dl_arrays,
        post_table,
        t0,
    )
