"""Vectorized keyed aggregation — the engine's replacement for
``Dataset.groupby(keys).aggregate(Sum/Min/Max/Count...)`` at large group
counts.

Ray Data's built-in Aggregate evaluates its accumulators per GROUP with
Python-level overhead: measured on this host (32 cpus, Ray 2.49), a plain
``groupby("orderkey").aggregate(Max, Sum)`` over 300k rows / 130k groups
costs **15 s**, while the same fold expressed as a hash-bucket exchange +
per-bucket ``pyarrow.Table.group_by`` costs **0.3 s** (50×).  The shape:

1. ``map_batches``: append ``__bucket = mix64(fnv1a(keys)) % B`` (vectorized
   per key column, xor-combined across columns);
2. ``groupby("__bucket").map_groups``: B Python calls TOTAL (not per key
   group), each one vectorized Arrow ``group_by`` over ~rows/B rows.

Scale notes: the exchange is the same all-to-all a groupby costs; B bounds
reducer fan-in (raise it with cluster size; each bucket's rows must fit a
worker).  Key skew: a head key's rows all land in ONE bucket, so map-side
partial aggregation before the fold remains the skew treatment exactly as
before — after a combiner, a head key contributes ≤ one row per input
batch and its bucket stays uniform.  Output row order is whatever the
buckets emit — callers sort, as they already did after Ray's Aggregate.
Deterministic CONTENT requires order-independent aggregates: integer sums /
min / max / count (the repo's integer-units convention exists for this);
float sums would pick up association noise and must keep quantized inputs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_plugin_ray.functions.hashing import fnv1a_bytes_column, mix64_np

# Reducer fan-out for the bucket exchange.  SIZE IT TO THE DATA, not the
# cluster: each bucket's post-combiner rows must fit one worker's heap, so
# B ≳ fold_input_rows / target_rows_per_bucket — 64 suits the sandbox
# corpora; a 10^12-doc deployment folding doc-keyed rows needs B in the
# tens of thousands (same arithmetic as IndexConfig.num_partitions).  Set
# once per deployment via LPR_FOLD_BUCKETS (README cluster section) or per
# call via num_buckets=.
_DEFAULT_BUCKETS = int(os.environ.get("LPR_FOLD_BUCKETS", "64"))

# (column, arrow_fn, alias) — arrow_fn is a pyarrow group_by aggregation
# name: "sum", "min", "max", "count", "count_all", "mean"
AggSpec = tuple


def _hash_key_columns(batch: pa.Table, keys: list[str]) -> np.ndarray:
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        col = batch[k].combine_chunks()
        if pa.types.is_integer(col.type):
            if col.null_count:
                # bucket placement only needs determinism: null rows hash
                # like 0 here, while the per-bucket Arrow group_by still
                # groups on the ORIGINAL column, so null keeps its own
                # group (a null->NaN->uint64 cast would be C-undefined)
                col = pc.fill_null(col, 0)
            kh = mix64_np(col.to_numpy(zero_copy_only=False).astype(np.uint64))
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type) \
                or pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            # string/binary hashed over raw bytes — no UTF-8 cast (sha
            # digests ride as raw binary in some ops)
            kh = mix64_np(fnv1a_bytes_column(col))
        else:
            kh = mix64_np(fnv1a_bytes_column(pc.cast(col, pa.string())))
        h = mix64_np(h ^ kh)
    return h


def bucketed_groups(
    ds,
    keys: "list[str] | str",
    fn,
    num_buckets: int | None = None,
):
    """Hash-bucketed group processing: co-locate all rows of each key
    combination in one of ``num_buckets`` buckets and call ``fn`` once per
    BUCKET (a pyarrow Table holding many whole key groups), not once per
    key group — the companion to :func:`keyed_fold` for ops whose
    per-group logic doesn't fit a builtin aggregate (sessionization,
    rolling windows, per-key pair generation).  ``fn`` must handle multiple
    keys per call (sort by key first; a key's rows never split across
    buckets).  Same scale notes as keyed_fold."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if num_buckets is None:
        num_buckets = _DEFAULT_BUCKETS

    def _bucket(batch: pa.Table) -> pa.Table:
        b = (
            (_hash_key_columns(batch, keys) % np.uint64(num_buckets))
            .astype(np.int64)
        )
        return batch.append_column("__bucket", pa.array(b, pa.int64()))

    def _call(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns(["__bucket"]))

    return (
        ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(_call, batch_format="pyarrow")
    )


def keyed_fold(
    ds,
    keys: "list[str] | str",
    aggs: "list[AggSpec]",
    num_buckets: int | None = None,
):
    """``ds.groupby(keys).aggregate(...)`` with vectorized reducers.

    ``aggs``: ``[(column, fn, alias), ...]`` with ``fn`` a pyarrow
    ``group_by`` aggregation name (``count_all`` passes column=None).
    Returns a Dataset of one row per distinct key combination with columns
    ``keys + aliases`` (unsorted — sort downstream if order matters).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    arrow_aggs = [
        (([] if fn == "count_all" else col), fn) for col, fn, _ in aggs
    ]
    out_names = [
        (f"{col}_{fn}" if fn != "count_all" else "count_all")
        for col, fn, _ in aggs
    ]
    aliases = [alias for _, _, alias in aggs]

    def _fold(group: pa.Table) -> pa.Table:
        agg = group.group_by(keys).aggregate(arrow_aggs)
        cols: dict[str, pa.Array] = {k: agg[k].combine_chunks() for k in keys}
        for name, alias in zip(out_names, aliases):
            cols[alias] = agg[name].combine_chunks()
        return pa.table(cols)

    return bucketed_groups(ds, keys, _fold, num_buckets=num_buckets)


def triangular_pairs(
    sizes: np.ndarray, starts: np.ndarray
) -> "tuple[np.ndarray, np.ndarray]":
    """All within-group index pairs (i < j) for many groups at once:
    group g (size m_g, rows starting at starts[g]) contributes
    m_g·(m_g−1)/2 pairs; returns the two flat row-index arrays.  The
    triangular pair rank decodes arithmetically —
    i = ⌊(2m−1−√((2m−1)²−8k))/2⌋ — exact in float64 for m ≤ ~2^25, far
    above every caller's bucket cap (64).  Shared by dedup_minhash's LSH
    pair expansion and simhash_pairs' band buckets."""
    m = sizes.astype(np.int64)
    per = m * (m - 1) // 2
    total = int(per.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e
    segp = np.repeat(np.arange(m.size), per)
    k = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(per) - per, per)
    mf = m[segp].astype(np.float64)
    i = np.floor((2 * mf - 1 - np.sqrt((2 * mf - 1) ** 2 - 8 * k)) / 2).astype(
        np.int64
    )
    j = k - i * (2 * m[segp] - i - 1) // 2 + i + 1
    b0 = starts.astype(np.int64)[segp]
    return b0 + i, b0 + j
