"""Index build pipelines (SURVEY.md §3.1 write path).

Full batch build — ONE Ray Data DAG, one all-to-all exchange:

    ray.data.read_parquet(corpus, columns=needed)     # S1; prune at the read
      → map_batches(ValidateAndPartition, pyarrow)    # M5+M6+M8, partition id
      → groupby("_p").map_groups(build_partition)     # D1+docids+M4+A1+A4+S5
      → take_all() of P small manifest rows           # driver-side commit
      → write_manifest(gen)                           # atomic (≙ commit)

The single shuffle is keyed by the uniform document hash partition — never by
the Zipf-skewed term (SURVEY.md §7.3: stop-word removal + doc-partitioned
posting build kill term skew in the build; the term-keyed path with salting
lives in stages/term_stats.py for global term statistics).

Incremental build (``build_delta``) appends a new generation: new docs become
delta segments; every (collection, url) key present in the delta (plus any
explicit deletes) is tombstoned so older generations' versions become
invisible (≙ updateDocument delete-then-add, LuceneIndexBean.java:256,343,
and the NRT visibility window §2.10 — one delta generation per batch).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.sources.reader import read_parquet_clean
from lucene_plugin_ray.stages.segment_write import build_partition_segment
from lucene_plugin_ray.stages.validate import ValidateAndPartition
from lucene_plugin_ray.state.manifest import (
    Manifest,
    aggregate_collections,
    list_generations,
    load_manifest,
    load_manifest_chain,
    write_manifest,
    write_tombstones,
)


def _as_dataset(corpus, cfg: IndexConfig | None = None) -> "ray.data.Dataset":
    if isinstance(corpus, ray.data.Dataset):
        return corpus
    if isinstance(corpus, pa.Table):
        return ray.data.from_arrow(corpus)
    if isinstance(corpus, str):
        if cfg is not None:
            # prune at the read (S4): only columns the build consumes leave
            # storage — `html` and friends never enter the pipeline
            import pyarrow.dataset as pads

            avail = set(pads.dataset(corpus).schema.names)
            want = [
                c
                for c in (
                    cfg.url_column, cfg.ts_column, cfg.text_column,
                    *cfg.field_columns, cfg.collection_column,
                )
                if c in avail
            ]
            return read_parquet_clean(corpus, columns=want)
        return read_parquet_clean(corpus)
    raise TypeError(f"unsupported corpus type {type(corpus)}")


def _validate_cfg_against(cfg: IndexConfig, prev: Manifest) -> None:
    """Reject a cfg that is incompatible with the stored index.

    Partition stability is load-bearing: cross-generation upsert shadowing
    (drop_stale_vs_prior, resolve_live_partition) is keyed per partition, so a
    delta with a different ``num_partitions`` would silently leave duplicate
    live copies of a url.  ``block_size`` governs posting decode; ``fields``
    govern which columns are analyzed.  All three must match the manifest."""
    if cfg.num_partitions != prev.num_partitions:
        raise ValueError(
            f"cfg.num_partitions={cfg.num_partitions} != index "
            f"num_partitions={prev.num_partitions}; partitioning is an index "
            "property and cannot change across generations"
        )
    if prev.block_size is not None and cfg.block_size != prev.block_size:
        raise ValueError(
            f"cfg.block_size={cfg.block_size} != index block_size="
            f"{prev.block_size}; segments are encoded with the build-time "
            "block size"
        )
    # APPEND-ONLY field evolution (reference parity: indexMap can introduce
    # new field names over an index's life, LuceneIndexBean.java:338-341):
    # a delta may EXTEND the analyzed-field list, never reorder, rename or
    # drop stored fields.  Safe because every query path resolves fields
    # per SEGMENT (old segments answer empty for a new field), the merge
    # path unions (field, term) vocabularies and zero-fills missing
    # doc_len columns, and BM25 avgdl for a new field divides its (new-
    # generation-only) dl sum by the GLOBAL doc count — old docs genuinely
    # have field length 0.
    new_f, old_f = list(cfg.fields()), list(prev.fields)
    if new_f[: len(old_f)] != old_f:
        raise ValueError(
            f"cfg fields {new_f} do not extend index fields {old_f}: "
            "fields may only be APPENDED across generations (never "
            "reordered, renamed or dropped)"
        )


def _delete_key_array(deletes: pa.Table | None) -> pa.Array | None:
    """(collection, url) delete table → 'collection\\x00url' key array."""
    if deletes is None or deletes.num_rows == 0:
        return None
    from lucene_plugin_ray.stages.validate import sanitize_collection_column

    coll = sanitize_collection_column(deletes["collection"].combine_chunks())
    return pc.binary_join_element_wise(coll, deletes["url"].combine_chunks(), "\x00")


def _run_build(
    ds: "ray.data.Dataset",
    cfg: IndexConfig,
    generation: int,
    deletes: pa.Table | None,
    prior_spec: dict | None = None,
) -> list[dict]:
    """The build DAG.  ``prior_spec`` (delta builds only) maps partition →
    list of existing live segment paths plus the tombstone chain; workers
    resolve the live prior keys PARTITION-LOCALLY (state/segment.py
    live_prior_table) for the cross-generation last-write-wins join — the
    driver never materializes index keys."""
    ds = ds.map_batches(
        ValidateAndPartition(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.tokenize_batch_size,
    )
    delete_keys = _delete_key_array(deletes)
    delete_ref = ray.put(delete_keys) if delete_keys is not None else None
    prior_ref = ray.put(prior_spec) if prior_spec is not None else None

    def _build_group(group: pa.Table) -> pa.Table:
        from lucene_plugin_ray.state.segment import live_prior_table

        p = int(group["_p"][0].as_py())
        dk = ray.get(delete_ref) if delete_ref is not None else None
        prior = None
        if prior_ref is not None:
            spec = ray.get(prior_ref)
            paths = spec["groups"].get(p, [])
            if paths:
                tomb = [
                    (g, {c: set(u) for c, u in d.items()})
                    for g, d in spec["tombstones"]
                ]
                prior = live_prior_table(paths, tomb)
        return build_partition_segment(
            group, p, cfg, generation, delete_keys=dk, prior=prior
        )

    rows_ds = ds.groupby("_p").map_groups(_build_group, batch_format="pyarrow")
    # P × #collections small manifest rows — safe to materialize on the driver
    return [r for r in rows_ds.take_all()]


def _prior_spec_from_chain(chain) -> dict:
    """Serializable description of the live index for delta workers:
    partition → segment paths (cleared collections excluded) + delete
    tombstone chain."""
    from lucene_plugin_ray.state.manifest import load_tombstones

    cleared_at: dict[str, int] = {}
    tombstones: list[tuple[int, dict[str, list[str]]]] = []
    for m in chain:
        t = load_tombstones(m.tombstone_path)
        if t is not None and t.num_rows:
            by_coll: dict[str, list[str]] = {}
            for c, u in zip(t["collection"].to_pylist(), t["url"].to_pylist()):
                by_coll.setdefault(c, []).append(u)
            tombstones.append((m.generation, by_coll))
        for c in m.cleared_collections:
            cleared_at[c] = m.generation
    groups: dict[int, list[str]] = {}
    for m in chain:
        for row in m.partitions:
            if cleared_at.get(row["collection"], -1) > row["generation"]:
                continue
            groups.setdefault(int(row["partition"]), []).append(row["path"])
    return {"groups": groups, "tombstones": tombstones}


def build_index(
    corpus,
    cfg: IndexConfig,
    deletes: pa.Table | None = None,
) -> Manifest:
    """Full batch build → generation 0 manifest.

    ``corpus``: ray.data.Dataset, pyarrow Table, or parquet path.
    ``deletes``: optional (collection, url) table applied as a build-time
    anti-join (D2 batch mode).
    """
    if list_generations(cfg.index_root):
        raise FileExistsError(
            f"{cfg.index_root} already holds an index; use build_delta() or a "
            "fresh index_root"
        )
    rows = _run_build(_as_dataset(corpus, cfg), cfg, generation=0, deletes=deletes)
    manifest = Manifest(
        generation=0,
        num_partitions=cfg.num_partitions,
        block_size=cfg.block_size,
        fields=list(cfg.fields()),
        partitions=rows,
        collections=aggregate_collections(rows),
    )
    write_manifest(cfg.index_root, manifest)
    return manifest


def build_delta(
    corpus,
    cfg: IndexConfig,
    deletes: pa.Table | None = None,
) -> Manifest:
    """Incremental build: a new generation of delta segments.

    Cross-generation upsert is implicit and exact: delta rows that are STALER
    than the live indexed version (max (warc_ts, sha)) are dropped during the
    partition-local segment build, so a key in a newer generation always
    shadows older copies (query-side resolve_live_partition).  No upsert
    tombstone files are needed; explicit ``deletes`` become a tombstone file
    and also anti-join the delta itself.  (≙ the reference's soft-commit
    window: one delta generation per incremental batch, SURVEY.md §2.10.)
    """
    chain = load_manifest_chain(cfg.index_root)
    _validate_cfg_against(cfg, chain[-1])
    gen = chain[-1].generation + 1

    prior_spec = _prior_spec_from_chain(chain)
    rows = _run_build(
        _as_dataset(corpus, cfg), cfg, generation=gen, deletes=deletes,
        prior_spec=prior_spec,
    )

    tomb_path = None
    if deletes is not None and deletes.num_rows:
        from lucene_plugin_ray.stages.validate import sanitize_collection_column

        coll = sanitize_collection_column(deletes["collection"].combine_chunks())
        tomb = pa.table({"collection": coll, "url": deletes["url"].combine_chunks()})
        tomb_path = write_tombstones(cfg.index_root, gen, tomb)

    manifest = Manifest(
        generation=gen,
        num_partitions=cfg.num_partitions,
        block_size=cfg.block_size,
        fields=list(cfg.fields()),
        partitions=rows,
        collections=aggregate_collections(rows),
        tombstone_path=tomb_path,
        parent_generation=chain[-1].generation,
    )
    write_manifest(cfg.index_root, manifest)
    return manifest


def delete_docs(cfg: IndexConfig, deletes: pa.Table) -> Manifest:
    """D2 incremental delete: a tombstone-only generation (no segments).
    ≙ writer.deleteDocuments(pkTerm) (LuceneIndexBean.java:462-488)."""
    prev = load_manifest(cfg.index_root)
    _validate_cfg_against(cfg, prev)
    gen = prev.generation + 1
    from lucene_plugin_ray.stages.validate import sanitize_collection_column

    coll = sanitize_collection_column(deletes["collection"].combine_chunks())
    tomb = pa.table({"collection": coll, "url": deletes["url"].combine_chunks()})
    tomb_path = write_tombstones(cfg.index_root, gen, tomb)
    manifest = Manifest(
        generation=gen,
        num_partitions=cfg.num_partitions,
        block_size=cfg.block_size,
        fields=list(cfg.fields()),
        partitions=[],
        collections={},
        tombstone_path=tomb_path,
        parent_generation=prev.generation,
    )
    write_manifest(cfg.index_root, manifest)
    return manifest


def live_merge_tasks(eng) -> list[dict]:
    """Enumerate the live query view of an open :class:`SearchEngine` as
    merge tasks — one per (collection, partition), its segment chain in
    ascending-generation order with per-segment alive masks (tombstones +
    LWW already folded).  The ONE definition of "what a merge reads",
    shared by compaction and the repartitioner so the two cannot drift."""
    tasks = []
    for coll, segs in eng._segments.items():
        by_p: dict[int, list] = {}
        for ls in segs:
            by_p.setdefault(ls.reader.partition, []).append(ls)
        for p, group in by_p.items():
            group.sort(key=lambda ls: ls.reader.generation)
            tasks.append(
                {
                    "collection": coll,
                    "partition": p,
                    "paths": [ls.reader.path for ls in group],
                    "masks": [ls.alive.tolist() for ls in group],
                }
            )
    return tasks


def compact_index(cfg: IndexConfig) -> Manifest:
    """K3 generation compaction: merge every (collection, partition)'s
    segments across the live chain into one segment of a new generation and
    mark the manifest ``compacted`` (older generations become dead weight on
    disk, ignored by readers — ≙ Lucene background merges,
    LuceneIndexBean.java:671-686).

    Runs as an actor-pool merge stage over a dataset of merge tasks; each
    task is partition-local (SURVEY.md §7.2 "k-way merge — actor pool").
    """
    import numpy as np

    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.stages.merge import merge_segments_for_partition
    from lucene_plugin_ray.stages.segment_write import MANIFEST_ROW_SCHEMA

    chain = load_manifest_chain(cfg.index_root)
    _validate_cfg_against(cfg, chain[-1])
    eng = SearchEngine(cfg.index_root, cfg=cfg)
    gen = chain[-1].generation + 1

    tasks = live_merge_tasks(eng)

    def _merge_batch(batch: pa.Table, *, cfg=cfg, gen=gen) -> pa.Table:
        # task-pool merge stage (one merge per batch row): a worker killed
        # mid-merge is a plain task retry against the idempotent segment
        # writer — no constructor-ref actor restart hazard
        # (core_worker.cc:2246; the round-4 task-pool rule)
        out = []
        for row in batch.to_pylist():
            masks = [np.array(m, dtype=bool) for m in row["masks"]]
            out.append(
                merge_segments_for_partition(
                    row["paths"], masks, row["collection"],
                    int(row["partition"]), cfg, gen,
                )
            )
        return pa.Table.from_pylist(out, schema=MANIFEST_ROW_SCHEMA)

    rows = (
        ray.data.from_items(tasks)
        .map_batches(
            _merge_batch,
            batch_size=1,
            batch_format="pyarrow",
        )
        .take_all()
    )
    manifest = Manifest(
        generation=gen,
        num_partitions=cfg.num_partitions,
        block_size=cfg.block_size,
        fields=list(cfg.fields()),
        partitions=rows,
        collections=aggregate_collections(rows),
        parent_generation=chain[-1].generation,
        extra={"compacted": True, "merged_generations": [m.generation for m in chain]},
    )
    write_manifest(cfg.index_root, manifest)
    return manifest


def maybe_compact(cfg: IndexConfig, segments_per_tier: int | None = None) -> Manifest | None:
    """Tiered auto-compaction policy: compact when the live manifest chain
    holds >= ``segments_per_tier`` generations (default: cfg.merge_fanin,
    mirroring the reference's TieredMergePolicy segmentsPerTier=10 /
    maxMergeAtOnce=10, LuceneIndexBean.java:97-98,683-684), else no-op.
    The policy-check is one manifest read; the merge itself is the K3
    actor-pool stage (compact_index) — the batch stand-in for Lucene's
    background ConcurrentMergeScheduler."""
    tier = segments_per_tier if segments_per_tier is not None else cfg.merge_fanin
    chain = load_manifest_chain(cfg.index_root)
    if len(chain) < tier:
        return None
    return compact_index(cfg)


def clear_collection(cfg: IndexConfig, collection: str) -> Manifest:
    """D3 clear: marker generation — all older segments of the collection
    become invisible (≙ delete-by-query __collectionKey__:<c>,
    LuceneIndexBean.java:511-540; TestSearchCollection.java:44-52)."""
    from lucene_plugin_ray.functions.analysis import sanitize_collection

    prev = load_manifest(cfg.index_root)
    _validate_cfg_against(cfg, prev)
    gen = prev.generation + 1
    manifest = Manifest(
        generation=gen,
        num_partitions=cfg.num_partitions,
        block_size=cfg.block_size,
        fields=list(cfg.fields()),
        partitions=[],
        collections={},
        cleared_collections=[sanitize_collection(collection)],
        parent_generation=prev.generation,
    )
    write_manifest(cfg.index_root, manifest)
    return manifest
