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
from lucene_plugin_ray.stages.segment_write import build_partition_segment
from lucene_plugin_ray.stages.validate import ValidateAndPartition
from lucene_plugin_ray.state.manifest import (
    Manifest,
    aggregate_collections,
    list_generations,
    load_manifest,
    write_manifest,
    write_tombstones,
)


def _as_dataset(corpus) -> "ray.data.Dataset":
    if isinstance(corpus, ray.data.Dataset):
        return corpus
    if isinstance(corpus, pa.Table):
        return ray.data.from_arrow(corpus)
    if isinstance(corpus, str):
        return ray.data.read_parquet(corpus)
    raise TypeError(f"unsupported corpus type {type(corpus)}")


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
) -> list[dict]:
    ds = ds.map_batches(
        ValidateAndPartition(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.tokenize_batch_size,
    )
    delete_keys = _delete_key_array(deletes)
    delete_ref = ray.put(delete_keys) if delete_keys is not None else None

    def _build_group(group: pa.Table) -> pa.Table:
        p = int(group["_p"][0].as_py())
        dk = ray.get(delete_ref) if delete_ref is not None else None
        return build_partition_segment(group, p, cfg, generation, delete_keys=dk)

    rows_ds = ds.groupby("_p").map_groups(_build_group, batch_format="pyarrow")
    # P × #collections small manifest rows — safe to materialize on the driver
    return [r for r in rows_ds.take_all()]


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
    rows = _run_build(_as_dataset(corpus), cfg, generation=0, deletes=deletes)
    manifest = Manifest(
        generation=0,
        num_partitions=cfg.num_partitions,
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
    """Incremental build: new generation of delta segments + tombstones.

    Tombstones = every (collection, url) key present in the delta (upsert:
    the delta version supersedes all older generations) plus explicit
    ``deletes``.  Explicit deletes also anti-join the delta itself.
    """
    prev = load_manifest(cfg.index_root)
    gen = prev.generation + 1

    ds = _as_dataset(corpus)
    rows = _run_build(ds, cfg, generation=gen, deletes=deletes)

    # tombstone keys: distinct delta keys (+ explicit deletes)
    norm = ds.map_batches(
        ValidateAndPartition(cfg), batch_format="pyarrow", zero_copy_batch=True
    )
    key_rows = norm.select_columns(["collection", cfg.url_column]).take_all()
    seen = {(r["collection"], r[cfg.url_column]) for r in key_rows}
    if deletes is not None:
        from lucene_plugin_ray.stages.validate import sanitize_collection_column

        coll = sanitize_collection_column(deletes["collection"].combine_chunks())
        seen.update(zip(coll.to_pylist(), deletes["url"].to_pylist()))
    tomb = pa.table(
        {
            "collection": pa.array([c for c, _ in sorted(seen)], type=pa.string()),
            "url": pa.array([u for _, u in sorted(seen)], type=pa.string()),
        }
    )
    tomb_path = write_tombstones(cfg.index_root, gen, tomb)

    manifest = Manifest(
        generation=gen,
        num_partitions=cfg.num_partitions,
        fields=list(cfg.fields()),
        partitions=rows,
        collections=aggregate_collections(rows),
        tombstone_path=tomb_path,
        parent_generation=prev.generation,
    )
    write_manifest(cfg.index_root, manifest)
    return manifest


def delete_docs(cfg: IndexConfig, deletes: pa.Table) -> Manifest:
    """D2 incremental delete: a tombstone-only generation (no segments).
    ≙ writer.deleteDocuments(pkTerm) (LuceneIndexBean.java:462-488)."""
    prev = load_manifest(cfg.index_root)
    gen = prev.generation + 1
    from lucene_plugin_ray.stages.validate import sanitize_collection_column

    coll = sanitize_collection_column(deletes["collection"].combine_chunks())
    tomb = pa.table({"collection": coll, "url": deletes["url"].combine_chunks()})
    tomb_path = write_tombstones(cfg.index_root, gen, tomb)
    manifest = Manifest(
        generation=gen,
        num_partitions=cfg.num_partitions,
        fields=list(cfg.fields()),
        partitions=[],
        collections={},
        tombstone_path=tomb_path,
        parent_generation=prev.generation,
    )
    write_manifest(cfg.index_root, manifest)
    return manifest


def clear_collection(cfg: IndexConfig, collection: str) -> Manifest:
    """D3 clear: marker generation — all older segments of the collection
    become invisible (≙ delete-by-query __collectionKey__:<c>,
    LuceneIndexBean.java:511-540; TestSearchCollection.java:44-52)."""
    from lucene_plugin_ray.functions.analysis import sanitize_collection

    prev = load_manifest(cfg.index_root)
    gen = prev.generation + 1
    manifest = Manifest(
        generation=gen,
        num_partitions=cfg.num_partitions,
        fields=list(cfg.fields()),
        partitions=[],
        collections={},
        cleared_collections=[sanitize_collection(collection)],
        parent_generation=prev.generation,
    )
    write_manifest(cfg.index_root, manifest)
    return manifest
