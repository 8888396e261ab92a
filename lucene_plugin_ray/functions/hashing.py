"""Stable hashing utilities.

Everything that partitions data uses these — never Python's builtin ``hash``
(randomized per process) — so partition assignment, docids, and therefore
scores/tiebreaks are identical across runs, processes and cluster sizes
(SURVEY.md §7.4 "Determinism end-to-end").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# FNV-1a 64-bit constants — a stable, vectorizable string hash.
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a_bytes_column(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized FNV-1a 64 over a string/binary Arrow column → uint64 array.

    Operates on the raw UTF-8 buffer with numpy (no Python loop over rows):
    processes the flat byte buffer position-by-position within the max row
    length, masking rows that have already ended.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    arr = arr.fill_null("")
    raw_offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)
    offsets = raw_offsets[arr.offset : arr.offset + n + 1].astype(np.int64)
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, np.uint8)
    )
    lengths = offsets[1:] - offsets[:-1]
    maxlen = int(lengths.max()) if n else 0
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    starts = offsets[:-1]
    for k in range(maxlen):
        alive = lengths > k
        if not alive.any():
            break
        idx = starts[alive] + k
        b = data[idx].astype(np.uint64)
        h[alive] = (h[alive] ^ b) * _FNV_PRIME
    return h


def fnv1a_str(s: str) -> int:
    """Scalar FNV-1a 64 (bit-identical to the column version)."""
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


_M = 0xFFFFFFFFFFFFFFFF


def mix64(h: int) -> int:
    """splitmix64 finalizer — FNV-1a's low-order bits avalanche poorly on
    similar-suffix keys (URLs), so every modulo-based partition assignment
    mixes first.  Scalar version."""
    z = (h + 0x9E3779B97F4A7C15) & _M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M
    return z ^ (z >> 31)


def mix64_np(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 wraparound semantics)."""
    z = h + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def partition_of_key(collection: str, url: str, num_partitions: int) -> int:
    """Document partition assignment: mixed FNV-1a over 'collection\\x00url'."""
    return mix64(fnv1a_str(collection + "\x00" + url)) % num_partitions


def partition_column(
    collections: pa.Array | pa.ChunkedArray,
    urls: pa.Array | pa.ChunkedArray,
    num_partitions: int,
) -> np.ndarray:
    """Vectorized partition assignment for a batch → int32 array."""
    key = pc.binary_join_element_wise(
        pc.cast(collections, pa.string()), pc.cast(urls, pa.string()), "\x00"
    )
    return (mix64_np(fnv1a_bytes_column(key)) % np.uint64(num_partitions)).astype(
        np.int32
    )


def sha256_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Per-row sha256 hexdigest of a string/binary column (byte-identity
    invariant, SURVEY.md §1.2).  hashlib releases the GIL; rows are hashed in
    a tight loop over the Arrow buffer views (no decode to Python str)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = []
    for v in arr:
        if not v.is_valid:
            out.append(None)
        else:
            raw = v.as_buffer()
            out.append(hashlib.sha256(raw).hexdigest())
    return pa.array(out, type=pa.string())


def sha256_binary_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Per-row sha256 as 32 RAW bytes (``binary`` column) — for INTERNAL
    exchange keys that never reach an output: 36 B/row through a shuffle
    instead of the hexdigest's 68 (sha256_column stays the public,
    oracle-comparable form)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = []
    for v in arr:
        if not v.is_valid:
            out.append(None)
        else:
            out.append(hashlib.sha256(v.as_buffer()).digest())
    return pa.array(out, type=pa.binary())


_HEX_CHARS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
# hex outputs larger than this need int64 offsets (large_string); module
# constant so tests can exercise the branch without a 2 GiB allocation
_HEX_SMALL_MAX = np.iinfo(np.int32).max


def hex_encode_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized lowercase hex of a binary column → string column
    (large_string when the hex output exceeds 2^31 bytes).

    One pass over the flat data buffer (two numpy gathers through a 16-entry
    nibble table) plus a doubled offsets vector — no per-row Python loop.
    Null rows stay null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.string())
    if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    filled = arr.fill_null(b"") if arr.null_count else arr
    raw_offsets = np.frombuffer(filled.buffers()[1], dtype=off_dtype)
    offsets = raw_offsets[filled.offset : filled.offset + n + 1].astype(np.int64)
    data_buf = filled.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, np.uint8)
    )
    seg = data[offsets[0] : offsets[-1]]
    out = np.empty(seg.size * 2, dtype=np.uint8)
    out[0::2] = _HEX_CHARS[seg >> 4]
    out[1::2] = _HEX_CHARS[seg & 0x0F]
    doubled = (offsets - offsets[0]) * 2  # int64
    if int(doubled[-1]) > _HEX_SMALL_MAX:
        # hex output exceeds a 32-bit offset buffer → emit large_string
        # (int64 offsets) instead of silently overflowing the cast
        hexarr = pa.LargeStringArray.from_buffers(
            n,
            pa.py_buffer(doubled.tobytes()),
            pa.py_buffer(out.tobytes()),
            None,
            0,
        )
    else:
        hexarr = pa.StringArray.from_buffers(
            n,
            pa.py_buffer(doubled.astype(np.int32).tobytes()),
            pa.py_buffer(out.tobytes()),
            None,
            0,
        )
    if arr.null_count:
        # re-apply nulls via the compute kernel — avoids hand-slicing the
        # (bit-packed, offset-carrying) validity buffer
        hexarr = pc.if_else(arr.is_valid(), hexarr, pa.scalar(None, hexarr.type))
    return hexarr
