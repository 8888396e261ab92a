"""Index replication — the Lucene replicator-module analogue
(org.apache.lucene.replicator: ``Replicator`` publishes an ``IndexRevision``
— the file set of one commit point — and ``ReplicationClient`` polls,
copies ONLY the files it does not already hold, then syncs the commit so a
reader on the replica always sees a complete commit or the previous one,
never a partial state).

The reference itself gets replication "for free" by putting the Lucene
Directory on the shared BFS blob store (BfsDirectory.java:26-360 — every
node reads the one copy), a deployment this engine already supports via
fsspec URL roots (state/storage.py).  ``replicate_index`` is the OTHER
classic Lucene deployment: independent index roots with segment-level
incremental copy, for read-replica fleets / cross-zone DR where searchers
must not share the writer's store.

Ray-Data-first shape (same as check_index): the unit of transfer is one
segment directory — an immutable commit artifact — so the byte copy fans
out as ``from_items(segments) → map_batches`` across the cluster while the
driver only touches manifests (|generations| · P rows).  The incremental
contract is the ReplicationClient rule "copy only what is missing": a dst
segment whose ``meta.json`` already records the same ``input_digest`` is
skipped wholesale (meta.json is written LAST, so its presence proves the
payload is complete — the build's own resume invariant), and a dst segment
holding a DIFFERENT digest at the same path is a loud error, never an
overwrite.  Commit protocol mirrors the build's end to end: payload files
first and ``meta.json`` last per segment, then the path-rewritten manifests
published in ascending generation order — a reader polling dst sees a
consistent prefix of the source chain at every instant.

What is replicated is the QUERY VIEW: ``load_manifest_chain`` — everything
from the latest compaction point up to the requested generation (the same
set every search evaluates).  Pre-compaction history is not copied; Lucene's
replicator likewise ships only the current revision, not the commit log.

Scale notes: per-task memory is bounded by the largest single segment file,
which is bounded by the partition size by construction (DOCID_STRIDE docs);
manifest paths are rewritten from ``src_root`` to ``dst_root`` (they are
absolute in the manifest rows AND inside each segment's meta.json — both
are rewritten, so the replica passes check_index and serves queries/deltas
exactly like the source).
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray
import ray.data

from lucene_plugin_ray.state import storage

REPLICATE_ROW_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),        # 'segment' | 'tombstone' | 'manifest'
        ("collection", pa.string()),  # '*' for tombstone/manifest rows
        ("partition", pa.int32()),    # -1 for tombstone/manifest rows
        ("generation", pa.int64()),
        ("src_path", pa.string()),
        ("dst_path", pa.string()),
        ("files", pa.int64()),
        ("bytes_copied", pa.int64()),
        ("skipped", pa.bool_()),      # already present at dst (digest match)
    ]
)


def _rewrite_path(path: str, src_root: str, dst_root: str) -> str:
    """Re-root an absolute manifest path from src_root to dst_root."""
    src = src_root.rstrip("/")
    if path == src:
        return dst_root
    if not path.startswith(src + "/"):
        raise ValueError(
            f"manifest path {path!r} is not under the source root {src!r} — "
            "cannot replicate an index whose artifacts live outside its root"
        )
    rel = path[len(src) + 1 :]
    return storage.join(dst_root, *rel.split("/"))


def _copy_file(src: str, dst: str) -> int:
    data = storage.read_bytes(src)
    storage.write_bytes(dst, data)
    return len(data)


def _copy_segment(item: dict) -> dict:
    """Copy one segment directory (payload files first, meta.json LAST with
    the manifest row re-rooted to dst).  Skips when dst already committed the
    same input_digest; raises on a digest CONFLICT (dst is another index)."""
    src_dir, dst_dir = item["src_path"], item["dst_path"]
    digest = item["input_digest"]
    dst_meta = storage.join(dst_dir, "meta.json")
    if storage.exists(dst_meta):
        have = storage.read_json(dst_meta).get("input_digest")
        if have == digest:
            return {**_report_base(item), "files": 0, "bytes_copied": 0,
                    "skipped": True}
        raise ValueError(
            f"replica segment {dst_dir} holds input_digest {have!r} but the "
            f"source has {digest!r} — destination root already contains a "
            "different index; refusing to overwrite"
        )
    storage.makedirs(dst_dir)
    names = sorted(storage.listdir_names(src_dir))
    n_bytes = 0
    for name in names:
        if name == "meta.json":
            continue
        n_bytes += _copy_file(
            storage.join(src_dir, name), storage.join(dst_dir, name)
        )
    # meta.json LAST — the replica segment's commit record, with the
    # embedded manifest row pointing at its NEW home (check_index parity)
    meta = storage.read_json(storage.join(src_dir, "meta.json"))
    row = dict(meta.get("manifest_row", {}))
    if row:
        row["path"] = dst_dir
        meta["manifest_row"] = row
    meta_bytes = len(json.dumps(meta).encode())
    storage.write_json(dst_meta, meta, atomic=not storage.is_url(dst_meta))
    return {**_report_base(item), "files": len(names),
            "bytes_copied": n_bytes + meta_bytes, "skipped": False}


def _copy_tombstone(item: dict) -> dict:
    dst = item["dst_path"]
    if storage.exists(dst):
        # tombstone files are immutable per generation — present means done,
        # but only if the BYTES agree (a same-corpus index that diverged by
        # deletes must be a loud refusal, same rule as the segment digests)
        if storage.read_bytes(dst) != storage.read_bytes(item["src_path"]):
            raise ValueError(
                f"replica tombstone {dst} differs from the source's — "
                "destination root already contains a different index; "
                "refusing to overwrite"
            )
        return {**_report_base(item), "files": 0, "bytes_copied": 0,
                "skipped": True}
    parent = dst.rsplit("/", 1)[0]
    storage.makedirs(parent)
    # referenced only by the LATER manifest write → final-name write is safe
    # (same rationale as manifest.write_tombstones)
    n = _copy_file(item["src_path"], dst)
    return {**_report_base(item), "files": 1, "bytes_copied": n,
            "skipped": False}


def _report_base(item: dict) -> dict:
    return {
        "kind": item["kind"],
        "collection": item["collection"],
        "partition": item["partition"],
        "generation": item["generation"],
        "src_path": item["src_path"],
        "dst_path": item["dst_path"],
    }


def _copy_batch(batch: pa.Table) -> pa.Table:
    rows = []
    for item in batch.to_pylist():
        if item["kind"] == "segment":
            rows.append(_copy_segment(item))
        else:
            rows.append(_copy_tombstone(item))
    return pa.Table.from_pylist(rows, schema=REPLICATE_ROW_SCHEMA)


def replicate_index(
    src_root: str,
    dst_root: str,
    generation: int | None = None,
    concurrency: int | None = None,
) -> pa.Table:
    """Replicate the query view of ``src_root`` (manifest chain at
    ``generation``, default latest) into ``dst_root`` — incremental: only
    segments/tombstones/manifests missing from dst are transferred.  Returns
    one REPLICATE_ROW_SCHEMA row per artifact (``skipped`` marks the
    already-present ones).  Either root may be a local path or an fsspec URL
    (local→s3 backup, s3→local restore, local→local replica all share this
    one code path)."""
    from lucene_plugin_ray.state.manifest import (
        Manifest,
        load_manifest_chain,
        write_manifest,
    )

    if dst_root.rstrip("/") == src_root.rstrip("/"):
        raise ValueError("source and destination roots are the same")
    chain = load_manifest_chain(src_root, generation)
    if not chain:
        # a generation below every surviving manifest (e.g. pre-compaction)
        # must not masquerade as a successful empty backup
        raise ValueError(
            f"no manifest at or below generation {generation} under "
            f"{src_root}"
        )

    items: list[dict] = []
    for m in chain:
        for row in m.partitions:
            items.append(
                {
                    "kind": "segment",
                    "collection": row["collection"],
                    "partition": int(row["partition"]),
                    "generation": int(m.generation),
                    "src_path": row["path"],
                    "dst_path": _rewrite_path(row["path"], src_root, dst_root),
                    "input_digest": row["input_digest"],
                }
            )
        if m.tombstone_path:
            items.append(
                {
                    "kind": "tombstone",
                    "collection": "*",
                    "partition": -1,
                    "generation": int(m.generation),
                    "src_path": m.tombstone_path,
                    "dst_path": _rewrite_path(
                        m.tombstone_path, src_root, dst_root
                    ),
                    "input_digest": "",
                }
            )

    parts: list[pa.Table] = []
    if items:
        kwargs = {"concurrency": concurrency} if concurrency else {}
        copied = ray.data.from_items(items).map_batches(
            _copy_batch,
            batch_format="pyarrow",
            batch_size=1,  # one artifact per task: I/O-bound, fan wide
            zero_copy_batch=True,
            **kwargs,
        )
        parts.extend(copied.iter_batches(batch_format="pyarrow"))

    # manifests LAST, ascending — each publish is the replica's atomic
    # commit of that generation (readers see a consistent chain prefix)
    manifest_rows: list[dict] = []
    for m in chain:
        dst_path = storage.join(dst_root, f"manifest-{m.generation}.json")
        d = m.to_json()
        d["partitions"] = [
            {**row, "path": _rewrite_path(row["path"], src_root, dst_root)}
            for row in d["partitions"]
        ]
        if d.get("tombstone_path"):
            d["tombstone_path"] = _rewrite_path(
                d["tombstone_path"], src_root, dst_root
            )
        if storage.exists(dst_path):
            # skip only on CONTENT equality (after path rewrite) — a dst
            # manifest with the same generation number but different
            # segments/tombstones/clears is a diverged index, not a resume.
            # Segment digests alone cannot catch this: delete/clear
            # generations carry no partitions (build.py delete manifests).
            if storage.read_json(dst_path) != d:
                raise ValueError(
                    f"replica manifest {dst_path} differs from the "
                    "source's — destination root already contains a "
                    "different index; refusing to overwrite"
                )
            manifest_rows.append(
                {
                    "kind": "manifest", "collection": "*", "partition": -1,
                    "generation": int(m.generation),
                    "src_path": storage.join(
                        src_root, f"manifest-{m.generation}.json"
                    ),
                    "dst_path": dst_path, "files": 0, "bytes_copied": 0,
                    "skipped": True,
                }
            )
            continue
        write_manifest(dst_root, Manifest.from_json(d))
        manifest_rows.append(
            {
                "kind": "manifest", "collection": "*", "partition": -1,
                "generation": int(m.generation),
                "src_path": storage.join(
                    src_root, f"manifest-{m.generation}.json"
                ),
                "dst_path": dst_path,
                "files": 1,
                "bytes_copied": 0,
                "skipped": False,
            }
        )
    parts.append(pa.Table.from_pylist(manifest_rows, schema=REPLICATE_ROW_SCHEMA))

    out = pa.concat_tables(
        [t.cast(REPLICATE_ROW_SCHEMA) for t in parts if t.num_rows]
        or [REPLICATE_ROW_SCHEMA.empty_table()]
    )
    return out.sort_by(
        [("generation", "ascending"), ("kind", "ascending"),
         ("collection", "ascending"), ("partition", "ascending")]
    )
