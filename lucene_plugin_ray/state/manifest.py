"""Manifest — the atomic commit point of a build (SURVEY.md §2.10).

≙ the reference's Lucene commit + searcher-generation machinery
(LuceneIndexBean.java:490-509 commit; update sequence 106,603-606; soft-commit
policy SearcherUpdateServiceImpl.java:101-127): a build (full or delta)
publishes ``manifest-<g>.json`` atomically (tmp + rename); queries pin a
generation.  The (16 docs ∨ 1 s) NRT visibility window becomes "one delta
generation per incremental batch".

The manifest carries per-partition lineage + metrics (north rule: "per-
partition lineage + metrics are checkpointed so index builds resume
mid-shuffle"): each row records the partition's input digest, output path,
row counts, posting counts, bytes and wall time.  A re-run of the same build
skips partitions whose digest matches (see stages/segment_write.py).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

import pyarrow as pa

from lucene_plugin_ray.state import storage

_MANIFEST_RE = re.compile(r"^manifest-(\d+)\.json$")


@dataclass
class Manifest:
    generation: int
    num_partitions: int
    fields: list[str]
    partitions: list[dict]                      # MANIFEST_ROW_SCHEMA rows
    collections: dict[str, dict]                # coll → {n_docs, sum_dl:{field:int}}
    tombstone_path: str | None = None           # parquet of (collection,url) killed AT this gen
    cleared_collections: list[str] = field(default_factory=list)
    parent_generation: int | None = None
    extra: dict = field(default_factory=dict)
    # Posting-block size the segments were encoded with.  Persisted so query
    # engines decode with the BUILD-time block size (not the query-time cfg)
    # and so delta builds can reject a mismatched cfg.  None only in
    # pre-round-2 manifests (treated as DEFAULT_BLOCK_SIZE).
    block_size: int | None = None

    def to_json(self) -> dict:
        return {
            "generation": self.generation,
            "num_partitions": self.num_partitions,
            "block_size": self.block_size,
            "fields": self.fields,
            "partitions": self.partitions,
            "collections": self.collections,
            "tombstone_path": self.tombstone_path,
            "cleared_collections": self.cleared_collections,
            "parent_generation": self.parent_generation,
            "extra": self.extra,
        }

    @staticmethod
    def from_json(d: dict) -> "Manifest":
        return Manifest(
            generation=d["generation"],
            num_partitions=d["num_partitions"],
            block_size=d.get("block_size"),
            fields=list(d["fields"]),
            partitions=list(d["partitions"]),
            collections=dict(d["collections"]),
            tombstone_path=d.get("tombstone_path"),
            cleared_collections=list(d.get("cleared_collections", [])),
            parent_generation=d.get("parent_generation"),
            extra=dict(d.get("extra", {})),
        )


def aggregate_collections(partitions: list[dict]) -> dict[str, dict]:
    """Global per-(collection, field) stats = sum over partition segments.
    Integer sums → exact, order-independent (A3 avgdl = sum_dl / n_docs)."""
    out: dict[str, dict] = {}
    for row in partitions:
        coll = row["collection"]
        stats = out.setdefault(coll, {"n_docs": 0, "sum_dl": {}})
        stats["n_docs"] += int(row["n_docs"])
        for f, s in json.loads(row["sum_dl_json"]).items():
            stats["sum_dl"][f] = stats["sum_dl"].get(f, 0) + int(s)
    return out


def write_manifest(index_root: str, manifest: Manifest) -> str:
    storage.makedirs(index_root)
    path = storage.join(index_root, f"manifest-{manifest.generation}.json")
    # atomic commit (≙ Lucene commit point): tmp+rename locally, a single
    # atomic object PUT on URL roots (storage.py commit protocol)
    storage.write_json(path, manifest.to_json(), atomic=True, indent=1)
    return path


def write_tombstones(index_root: str, generation: int, keys: pa.Table) -> str:
    """Persist (collection, url) tombstones for generation ``generation``."""
    d = storage.join(index_root, "tombstones")
    storage.makedirs(d)
    path = storage.join(d, f"gen-{generation}.parquet")
    if storage.is_url(path):
        # referenced only by a LATER manifest write → final-name write is safe
        storage.write_parquet(keys, path)
    else:
        import os

        import pyarrow.parquet as pq

        tmp = path + ".tmp"
        pq.write_table(keys, tmp)
        os.rename(tmp, path)
    return path


def load_tombstones(path: str | None) -> pa.Table | None:
    if not path or not storage.exists(path):
        return None
    return storage.read_parquet(path)


def list_generations(index_root: str) -> list[int]:
    gens = []
    for name in storage.listdir_names(index_root):
        m = _MANIFEST_RE.match(name)
        if m:
            gens.append(int(m.group(1)))
    return sorted(gens)


def load_manifest(index_root: str, generation: int | None = None) -> Manifest:
    gens = list_generations(index_root)
    if not gens:
        raise FileNotFoundError(f"no manifest under {index_root}")
    g = generation if generation is not None else gens[-1]
    return Manifest.from_json(
        storage.read_json(storage.join(index_root, f"manifest-{g}.json"))
    )


def load_manifest_chain(index_root: str, generation: int | None = None) -> list[Manifest]:
    """All manifests up to and including ``generation`` (ascending).  Queries
    evaluate the chain: newer tombstones/clears mask older segments.  A
    manifest marked ``compacted`` (written by compact_index, K3) subsumes all
    older generations — the chain starts there."""
    gens = list_generations(index_root)
    if not gens:
        raise FileNotFoundError(f"no manifest under {index_root}")
    g = generation if generation is not None else gens[-1]
    chain = [load_manifest(index_root, x) for x in gens if x <= g]
    for i in range(len(chain) - 1, -1, -1):
        if chain[i].extra.get("compacted"):
            return chain[i:]
    return chain
