"""Index repartitioning — change the document-partition count of an
existing index WITHOUT the original corpus (the Lucene misc-module index
surgery: IndexSplitter / MultiPassIndexSplitter split an index by docs,
IndexWriter.addIndexes re-combines — re-sharding from the inverted data
with no re-extraction and no re-analysis).

Why it matters at 100 TB: the index is a small fraction of the corpus it
was built from, and growing a cluster (P partitions → P') otherwise means
re-reading and re-analyzing the raw corpus.  This pass touches only index
bytes.

Shape — a single-pass two-stage shuffle, NOT Lucene's multi-pass design
(MultiPassIndexSplitter re-reads the whole index once PER target slice;
here every old segment is decoded exactly ONCE):

  stage 1 (map, one task per (collection, OLD partition)):
      decode that partition's live chain with the same bulk-varint path the
      merge/compaction uses, mask to the LIVE view (tombstones + LWW
      already folded into the engine's alive masks), hash every live url to
      its NEW partition, and emit one coarse BLOCK per target partition —
      doc arrays + the segment vocab + (vid, row-ref, tf[, position
      sub-streams]) posting arrays, serialized as one binary payload.  The
      exchange is keyed by (collection, new partition) and is INDEX-sized
      (≪ corpus-sized) — the same cost class as a compaction plus one
      shuffle of what compaction already rewrites.
  stage 2 (reduce, ``groupby(collection, p_new).map_groups``):
      k-way union of the blocks exactly like a generation merge — global
      url sort ⇒ new docids, per-block row-ref remap, vocab union + one
      lexsort via the SHARED ``prepare_postings_from_parts`` (the K3 merge
      path's kernel), then ``encode_and_write_segment`` into a fresh gen-0
      segment of the destination root.

The destination is a NEW root (never in place), written with the build's
own commit protocol and marked ``repartitioned_from`` in the manifest.
Scores are bit-identical to the source by construction: the live doc set —
hence n_docs, sum_dl and every df — is unchanged; only docids move
(pinned by tests/test_repartition.py across query shapes incl. phrase).
"""

from __future__ import annotations

import io
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.docid import DOCID_STRIDE
from lucene_plugin_ray.functions.hashing import partition_column
from lucene_plugin_ray.stages.merge import (
    _bulk_decode_positions,
    _bulk_decode_postings,
    _gather_pos_substreams,
    prepare_postings_from_parts,
)
from lucene_plugin_ray.state import storage
from lucene_plugin_ray.state.segment import SegmentReader


def _split_segment_blocks(
    path: str, alive: np.ndarray, coll: str, new_partitions: int,
    fields: list[str],
) -> list[dict]:
    """Decode ONE segment once and split its live docs + postings into one
    block per target partition.  Returns [{p_new, block(bytes)}, ...]."""
    r = SegmentReader(path)
    idx = np.flatnonzero(alive)
    if idx.size == 0:
        return []
    urls_alive = r.urls[idx]
    pnew = partition_column(
        pa.array([coll] * idx.size, type=pa.string()),
        pa.array(urls_alive, type=pa.string()),
        new_partitions,
    ).astype(np.int64)
    # alive-array rank of every local docid (-1 = dead)
    alive_rank = np.full(r.n_docs, -1, dtype=np.int64)
    alive_rank[idx] = np.arange(idx.size, dtype=np.int64)

    nt = len(r._terms)
    have_post = nt > 0
    if have_post:
        df = r._df.astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(df)])
        total = int(starts[-1])
        deltas, tfs_all = _bulk_decode_postings(r, df, total)
        cum = np.cumsum(deltas.astype(np.int64))
        term_base = (
            np.concatenate(([0], cum[starts[1:-1] - 1]))
            if nt > 1 else np.zeros(1, np.int64)
        )
        lid = cum - np.repeat(term_base, df) - 1 - r.doc_base
        post_rank = alive_rank[lid]
        post_target = np.where(post_rank >= 0, pnew[np.maximum(post_rank, 0)], -1)
        vid_all = np.repeat(np.arange(nt, dtype=np.int64), df)
        pd_all = None
        if r.has_positions:
            pd_all = _bulk_decode_positions(r, int(tfs_all.sum()))

    shas_alive = r.text_sha256[idx]
    tss_alive = r.warc_ts[idx]
    dl_alive = {
        f: r.doc_len.get(f, np.zeros(r.n_docs, np.int32))[idx] for f in fields
    }

    # within-target rank for EVERY alive doc in one pass (not one
    # idx.size-array fill per target): stable sort by target groups docs,
    # rank = position - group start
    targets, counts = np.unique(pnew, return_counts=True)
    grp_order = np.argsort(pnew, kind="stable")
    starts_g = np.concatenate([[0], np.cumsum(counts)])
    rank_in_target = np.empty(idx.size, dtype=np.int64)
    rank_in_target[grp_order] = np.arange(idx.size, dtype=np.int64) - np.repeat(
        starts_g[:-1], counts
    )

    out = []
    for gi, k in enumerate(targets):
        # stable sort ⇒ ascending original (url-ascending) order in-group
        docsel = grp_order[starts_g[gi] : starts_g[gi + 1]]
        payload: dict[str, np.ndarray] = {
            "urls": urls_alive[docsel],
            "shas": shas_alive[docsel],
            "tss": tss_alive[docsel].astype(np.int64),
        }
        for f in fields:
            payload[f"dl_{f}"] = dl_alive[f][docsel]
        if have_post:
            pk = post_target == k
            # ship only the vocab rows this target actually references —
            # never the whole dictionary once per target
            u, inv = np.unique(vid_all[pk], return_inverse=True)
            payload["vocab_f"] = r._fields[u]
            payload["vocab_t"] = r._terms[u]
            payload["vid"] = inv
            payload["rowref"] = rank_in_target[post_rank[pk]]
            payload["tf"] = tfs_all[pk].astype(np.int64)
            if pd_all is not None:
                payload["pos"] = _gather_pos_substreams(
                    pd_all, tfs_all.astype(np.int64), keep=pk
                )
        buf = io.BytesIO()
        np.savez(buf, **payload)
        out.append({"p_new": int(k), "block": buf.getvalue()})
    return out


def _split_batch(
    batch: pa.Table, new_partitions: int, fields: list[str]
) -> pa.Table:
    """Stage-1 task: one (collection, old partition) row per batch —
    decodes the partition's live chain ONCE, emits target-keyed blocks.
    A plain task-pool function (no actor state → no constructor-args
    restart hazard, and a killed task simply retries)."""
    from lucene_plugin_ray.stages.segment_write import limit_intra_task_threads

    limit_intra_task_threads()
    rows = []
    for task in batch.to_pylist():
        for gi, (path, mask) in enumerate(zip(task["paths"], task["masks"])):
            for b in _split_segment_blocks(
                path, np.array(mask, dtype=bool), task["collection"],
                new_partitions, fields,
            ):
                rows.append(
                    {
                        "collection": task["collection"],
                        "p_new": b["p_new"],
                        # deterministic reduce order: (old partition,
                        # position in its ascending-generation chain)
                        "src_p": int(task["partition"]),
                        "src_i": gi,
                        "block": b["block"],
                    }
                )
    return pa.Table.from_pylist(rows, schema=_BLOCK_SCHEMA)


_BLOCK_SCHEMA = pa.schema(
    [
        ("collection", pa.string()),
        ("p_new", pa.int64()),
        ("src_p", pa.int64()),
        ("src_i", pa.int64()),
        ("block", pa.large_binary()),
    ]
)


def _build_partition(group: pa.Table, cfg: IndexConfig, fields: list[str]) -> pa.Table:
    """Stage-2 reducer: all blocks of ONE (collection, p_new) → one gen-0
    segment, via the same union/remap/lexsort kernel as a generation merge."""
    from lucene_plugin_ray.stages.segment_write import (
        MANIFEST_ROW_SCHEMA,
        encode_and_write_segment,
        limit_intra_task_threads,
    )

    limit_intra_task_threads()
    t0 = time.monotonic()
    group = group.sort_by([("src_p", "ascending"), ("src_i", "ascending")])
    coll = group["collection"][0].as_py()
    p = int(group["p_new"][0].as_py())
    blocks = [
        np.load(io.BytesIO(b.as_py()), allow_pickle=True)
        for b in group["block"]
    ]

    urls_parts = [b["urls"] for b in blocks]
    urls = np.concatenate(urls_parts)
    order = np.argsort(urls, kind="stable")
    n_docs = urls.size
    sorted_urls = urls[order]
    if n_docs > 1:
        dup = sorted_urls[1:] == sorted_urls[:-1]
        if dup.any():
            ex = sorted_urls[1:][dup][:3].tolist()
            raise ValueError(
                f"duplicate live url(s) in collection {coll!r} (e.g. "
                f"{ex}): the single-live-doc-per-url invariant would "
                "break — for overlapping corpora replicate one index and "
                "apply the other as a delta (upsert) instead of merging"
            )
    if n_docs > DOCID_STRIDE:
        raise ValueError(
            f"partition {p} of collection {coll!r} would hold {n_docs} docs "
            f"> DOCID_STRIDE ({DOCID_STRIDE}) — choose a larger "
            "new_partitions"
        )
    urls = sorted_urls
    shas = np.concatenate([b["shas"] for b in blocks])[order]
    tss = np.concatenate([b["tss"] for b in blocks])[order]
    dl_arrays = {
        f: np.concatenate([b[f"dl_{f}"] for b in blocks])[order].astype(
            np.int32
        )
        for f in fields
    }
    # block-local row-ref → global new rank
    sizes = np.array([u.size for u in urls_parts], dtype=np.int64)
    block_of = np.repeat(np.arange(len(blocks), dtype=np.int64), sizes)[order]
    loc_of = np.concatenate(
        [np.arange(s, dtype=np.int64) for s in sizes]
    )[order]
    new_rank = np.arange(n_docs, dtype=np.int64)
    remap = []
    for bi, s in enumerate(sizes):
        m = np.full(int(s), -1, dtype=np.int64)
        sel = block_of == bi
        m[loc_of[sel]] = new_rank[sel]
        remap.append(m)

    doc_base = p * DOCID_STRIDE
    vocab_f_parts, vocab_t_parts = [], []
    vid_parts, did_parts, tf_parts, pd_parts = [], [], [], []
    # positions survive iff every block that CONTRIBUTES postings carries
    # them — a zero-term block (live docs, no tokens) is vacuously
    # positions-capable, exactly like SegmentReader.has_positions on an
    # empty dictionary (else a stopword-only delta would silently strip
    # positions from every destination partition its urls hash to)
    have_pos = all(
        "pos" in b for b in blocks if "vid" in b and b["vid"].size
    )
    vocab_offset = 0
    for bi, b in enumerate(blocks):
        if "vid" not in b or b["vid"].size == 0:
            continue
        vocab_f_parts.append(b["vocab_f"])
        vocab_t_parts.append(b["vocab_t"])
        vid_parts.append(b["vid"] + vocab_offset)
        did_parts.append(doc_base + remap[bi][b["rowref"]])
        tf_parts.append(b["tf"])
        if have_pos:
            pd_parts.append(b["pos"])
        vocab_offset += b["vocab_t"].size
    prepared = prepare_postings_from_parts(
        vocab_f_parts, vocab_t_parts, vid_parts, did_parts, tf_parts,
        pd_parts, have_pos,
    )
    row = encode_and_write_segment(
        coll, p, doc_base, cfg, 0,
        pa.array(urls, type=pa.string()),
        pa.array(shas, type=pa.string()),
        pa.array(tss, type=pa.int64()),
        dl_arrays, None, t0, prepared=prepared,
    )
    return pa.Table.from_pylist([row], schema=MANIFEST_ROW_SCHEMA)


def repartition_index(
    src_root: str,
    dst_root: str,
    new_partitions: int,
    cfg: IndexConfig | None = None,
    concurrency: int | None = None,
):
    """Re-shard the live query view of ``src_root`` into ``dst_root`` with
    ``new_partitions`` document partitions — one single pass over the index,
    no original corpus needed.  Returns the destination's gen-0 Manifest.

    The destination serves every query with BIT-IDENTICAL results (urls,
    scores, facet counts, term vectors): the live doc set and therefore all
    corpus statistics are unchanged; only the (partition, docid) layout
    moves.  ``cfg`` (optional) supplies analyzer-independent knobs; the
    field list and block size are inherited from the SOURCE manifest so the
    destination decodes exactly like the source."""
    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.state.manifest import (
        Manifest,
        aggregate_collections,
        load_manifest_chain,
        write_manifest,
    )

    if new_partitions < 1:
        raise ValueError("new_partitions must be >= 1")
    if dst_root.rstrip("/") == src_root.rstrip("/"):
        raise ValueError("source and destination roots are the same")
    from lucene_plugin_ray.state.manifest import list_generations

    if storage.isdir(dst_root) and list_generations(dst_root):
        raise FileExistsError(f"{dst_root} already holds an index")
    chain = load_manifest_chain(src_root)
    src_fields = list(chain[-1].fields)
    base_cfg = cfg or IndexConfig(index_root=src_root)
    text_col = base_cfg.text_column
    if text_col not in src_fields:
        raise ValueError(
            f"source index never analyzed text column {text_col!r} "
            f"(its fields: {src_fields})"
        )
    src_cfg = IndexConfig(
        index_root=src_root,
        num_partitions=chain[-1].num_partitions,
        text_column=text_col,
        field_columns=tuple(f for f in src_fields if f != text_col),
        block_size=chain[-1].block_size or base_cfg.block_size,
    )
    from lucene_plugin_ray.pipelines.build import live_merge_tasks

    eng = SearchEngine(src_root, cfg=src_cfg)
    tasks = live_merge_tasks(eng)
    # the forward term-vector sidecar survives a re-shard: inherit it when
    # the caller asks OR any live source segment carries tv.parquet
    # (silently dropping it would degrade aux reads to the reconstruction
    # path after every repartition)
    src_has_tv = any(
        seg.reader.has_tv
        for segs in eng._segments.values()
        for seg in segs
    )
    dst_cfg = IndexConfig(
        index_root=dst_root,
        num_partitions=new_partitions,
        text_column=text_col,
        field_columns=src_cfg.field_columns,
        block_size=src_cfg.block_size,
        store_term_vectors=base_cfg.store_term_vectors or src_has_tv,
    )

    rows: list[dict] = []
    if tasks:
        fields = list(src_cfg.fields())
        kwargs = {"concurrency": concurrency} if concurrency else {}
        blocks = ray.data.from_items(tasks).map_batches(
            _split_batch,
            fn_kwargs={"new_partitions": new_partitions, "fields": fields},
            batch_size=1,
            batch_format="pyarrow",
            zero_copy_batch=True,
            **kwargs,
        )
        built = blocks.groupby(["collection", "p_new"]).map_groups(
            lambda g: _build_partition(g, dst_cfg, fields),
            batch_format="pyarrow",
        )
        rows = [r for t in built.iter_batches(batch_format="pyarrow")
                for r in t.to_pylist()]

    manifest = Manifest(
        generation=0,
        num_partitions=new_partitions,
        block_size=dst_cfg.block_size,
        fields=src_fields,
        partitions=rows,
        collections=aggregate_collections(rows),
        extra={
            "compacted": True,
            "repartitioned_from": src_root,
            "old_partitions": chain[-1].num_partitions,
            "source_generation": chain[-1].generation,
        },
    )
    write_manifest(dst_root, manifest)
    return manifest


def merge_indexes(
    src_roots: "list[str]",
    dst_root: str,
    num_partitions: int | None = None,
    cfg: IndexConfig | None = None,
    concurrency: int | None = None,
):
    """Physically merge several independently built indexes into ONE new
    root — Lucene ``IndexWriter.addIndexes(Directory…)``: the live query
    views of every source are decoded once and re-shuffled into a fresh
    gen-0 index, no original corpus needed.  Returns the destination's
    Manifest.

    Exactly the repartitioner's two-stage shape with the task list drawn
    from EVERY source: stage 1 decodes each (root, collection, partition)
    live chain once and emits target-keyed blocks; stage 2 is the shared
    union/remap kernel.  The destination answers every query identically
    to an index built over the UNION corpus (urls, scores, facets — the
    live doc set and therefore every corpus statistic is the union's by
    construction; pinned in tests).

    Field lists may differ per source: the destination's field list is
    the ORDER-PRESERVING UNION (first root's order, unseen fields
    appended) — a source lacking a field contributes doc_len 0 and no
    postings for it, exactly the append-only field-evolution semantics.
    Duplicate live urls across sources are a LOUD error (Lucene's
    addIndexes concatenates blindly; this engine's url-keyed upsert
    invariant cannot — replicate one index and apply the other corpus as
    a delta instead).  ``num_partitions`` defaults to the max source
    partition count."""
    from lucene_plugin_ray.pipelines.build import live_merge_tasks
    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.state.manifest import (
        Manifest,
        aggregate_collections,
        list_generations,
        load_manifest_chain,
        write_manifest,
    )

    if not src_roots or len(src_roots) < 2:
        raise ValueError(
            "merge_indexes needs at least two source roots (one source "
            "is repartition_index)"
        )
    norm = [r.rstrip("/") for r in src_roots]
    if len(set(norm)) != len(norm):
        raise ValueError("duplicate source roots")
    if dst_root.rstrip("/") in norm:
        raise ValueError("destination must differ from every source root")
    if storage.isdir(dst_root) and list_generations(dst_root):
        raise FileExistsError(f"{dst_root} already holds an index")

    base_cfg = cfg or IndexConfig(index_root=src_roots[0])
    text_col = base_cfg.text_column
    chains = [load_manifest_chain(r) for r in src_roots]
    union_fields: list[str] = []
    for ch in chains:
        for f in ch[-1].fields:
            if f not in union_fields:
                union_fields.append(f)
    for r, ch in zip(src_roots, chains):
        if text_col not in ch[-1].fields:
            raise ValueError(
                f"source {r} never analyzed text column {text_col!r} "
                f"(its fields: {list(ch[-1].fields)})"
            )
    P = (
        max(ch[-1].num_partitions for ch in chains)
        if num_partitions is None
        else int(num_partitions)
    )
    if P < 1:
        # explicit 0 must be loud, not a silent fallback to the default
        raise ValueError("num_partitions must be >= 1")
    block_size = chains[0][-1].block_size or base_cfg.block_size
    dst_cfg = IndexConfig(
        index_root=dst_root,
        num_partitions=P,
        text_column=text_col,
        field_columns=tuple(f for f in union_fields if f != text_col),
        block_size=block_size,
        # sidecar inheritance resolved below once the sources' live
        # segments are known (any source with tv.parquet -> dst writes it)
    )

    tasks: list[dict] = []
    any_src_tv = False
    # IndexOptions compatibility (Lucene addIndexes refuses mismatched
    # postings formats): a positions-less source block silently flips the
    # destination's have_pos off for every partition its urls hash to —
    # partition-hash-dependent data loss — so mixed positions capability
    # across sources is a LOUD error.  Vacuous segments (empty
    # dictionaries) are compatible with either side, exactly like the
    # reducer's own contributing-blocks rule.
    root_pos: list[bool | None] = []
    for ri, (root, ch) in enumerate(zip(src_roots, chains)):
        src_cfg = IndexConfig(
            index_root=root,
            num_partitions=ch[-1].num_partitions,
            text_column=text_col,
            field_columns=tuple(
                f for f in ch[-1].fields if f != text_col
            ),
            block_size=ch[-1].block_size or block_size,
        )
        eng = SearchEngine(root, cfg=src_cfg)
        if any(
            seg.reader.has_tv
            for segs in eng._segments.values()
            for seg in segs
        ):
            any_src_tv = True
        pos_votes: set[bool] = set()
        for t in live_merge_tasks(eng):
            for path in t["paths"]:
                r = SegmentReader(path)
                if len(r._terms):  # non-vacuous segments vote
                    pos_votes.add(bool(r.has_positions))
            # globalize the deterministic reduce key across roots
            t = dict(t)
            t["partition"] = ri * 1_000_000 + int(t["partition"])
            tasks.append(t)
        if len(pos_votes) > 1:
            raise ValueError(
                f"source {root} mixes positions-bearing and positions-less "
                "segments — rebuild it before merging"
            )
        root_pos.append(pos_votes.pop() if pos_votes else None)
    decided = {v for v in root_pos if v is not None}
    if len(decided) > 1:
        with_pos = [r for r, v in zip(src_roots, root_pos) if v]
        without = [r for r, v in zip(src_roots, root_pos) if v is False]
        raise ValueError(
            "sources disagree on positions capability (IndexOptions "
            f"mismatch — Lucene addIndexes refuses too): with positions "
            f"{with_pos}, without {without}; rebuild one side"
        )

    if base_cfg.store_term_vectors or any_src_tv:
        import dataclasses

        dst_cfg = dataclasses.replace(dst_cfg, store_term_vectors=True)

    rows: list[dict] = []
    if tasks:
        fields = [text_col, *dst_cfg.field_columns]
        kwargs = {"concurrency": concurrency} if concurrency else {}
        blocks = ray.data.from_items(tasks).map_batches(
            _split_batch,
            fn_kwargs={"new_partitions": P, "fields": fields},
            batch_size=1,
            batch_format="pyarrow",
            zero_copy_batch=True,
            **kwargs,
        )
        built = blocks.groupby(["collection", "p_new"]).map_groups(
            lambda g: _build_partition(g, dst_cfg, fields),
            batch_format="pyarrow",
        )
        rows = [r for t in built.iter_batches(batch_format="pyarrow")
                for r in t.to_pylist()]

    manifest = Manifest(
        generation=0,
        num_partitions=P,
        block_size=block_size,
        fields=union_fields,
        partitions=rows,
        collections=aggregate_collections(rows),
        extra={
            "compacted": True,
            "merged_from": [str(r) for r in src_roots],
            "source_generations": [
                int(ch[-1].generation) for ch in chains
            ],
        },
    )
    write_manifest(dst_root, manifest)
    return manifest
