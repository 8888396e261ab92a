"""Deterministic docid assignment (SURVEY.md §7.3 "docid assignment").

Docids are a pure function of (deduped key set, num_partitions) — NOT of
arrival order, block order, or cluster size:

    partition p(doc) = fnv1a(collection + '\\x00' + url) % P
    within p: docs sorted by (collection, url) ascending, local_rank = 0..n_p-1
    docid = p * DOCID_STRIDE + local_rank          (DOCID_STRIDE = 2^40)

Strided (sparse) ids instead of dense ranks: dense ids need the global
cumulative partition-count vector — a barrier between the dedup shuffle and
segment writing — while the stride makes docid assignment fully single-pass
(each partition task computes its ids locally) yet still deterministic.  The
orderings are identical either way: docid ascending == (partition,
local_rank) lexicographic, so score tiebreaks don't depend on the choice.

The brute-force oracle recomputes the same function independently
(pipelines/oracle.py).  NOTE: docids are unique only WITHIN one generation —
a delta generation reuses the same p·STRIDE bases — so the engine's GLOBAL
score tiebreak is (score desc, URL asc), which is invariant under
generations, partitioning and compaction; within a single segment the docid
order coincides with url order (docids are url-ranks), so per-segment
selection by docid remains consistent with the global url tiebreak.

Why hash partitions instead of a global range sort: partitioning is one
map_batches pass instead of a full distributed sample-sort of 10^12 rows;
uniformity comes from the hash (urls ~unique).  Within-partition sort is
local to a segment-build task.
"""

from __future__ import annotations

import numpy as np

from lucene_plugin_ray.functions.hashing import partition_of_key

DOCID_STRIDE = 1 << 40  # max docs per partition; 10^12 docs ⇒ P ≥ ~1000


def partition_bases(partition_counts: dict[int, int], num_partitions: int) -> np.ndarray:
    """base[p] = cumulative doc counts of partitions < p (int64, len P+1).
    (Used for dense docid presentation / stats, not for assignment.)"""
    counts = np.zeros(num_partitions, dtype=np.int64)
    for p, c in partition_counts.items():
        counts[int(p)] = int(c)
    bases = np.zeros(num_partitions + 1, dtype=np.int64)
    np.cumsum(counts, out=bases[1:])
    return bases


def assign_docids_reference(
    keys: list[tuple[str, str]], num_partitions: int
) -> dict[tuple[str, str], int]:
    """Pure-Python reference implementation for the oracle and tests.

    ``keys`` = deduped (collection, url) pairs, any order.  Returns the
    key→docid map the distributed build must reproduce exactly.
    """
    parts: list[list[tuple[str, str]]] = [[] for _ in range(num_partitions)]
    for coll, url in keys:
        parts[partition_of_key(coll, url, num_partitions)].append((coll, url))
    out: dict[tuple[str, str], int] = {}
    for p in range(num_partitions):
        for rank, key in enumerate(sorted(parts[p])):
            out[key] = p * DOCID_STRIDE + rank
    return out
