"""Posting-list codec: delta + varint (LEB128) with per-block max metadata.

Implements the at-rest posting format mandated by the north star
(BASELINE.json: "sorted, delta+varint-compressed posting lists with per-block
max-score metadata").  ≙ the role of Lucene's postings format written through
the Directory abstraction (reference: LuceneIndexBean.java:701-718,
BfsDirectory.java:26-179) — re-designed for columnar batch I/O, not copied.

Layout per term (one contiguous byte region inside a segment's postings.bin):

    [varint docid-delta stream][varint tf stream]

* docid deltas are cumulative across the WHOLE term: delta[i] = docid[i] -
  docid[i-1] with implicit docid[-1] = -1, so every delta >= 1 and the whole
  region decodes with ONE vectorized varint pass + cumsum.
* Block structure is metadata-only (block size B docids, default 128):
  per block b we record
      blk_doff[b]   — byte offset of the block's first docid delta
      blk_toff[b]   — byte offset of the block's first tf varint
      blk_maxdoc[b] — last (= max) docid in the block, ABSOLUTE
      blk_maxtf[b]  — max tf in the block (block-max WAND bound)
  A block decodes standalone: cumsum(deltas) + blk_maxdoc[b-1] (or -1 for
  b=0).  blk_maxdoc doubles as the skip list (docid-ordered → searchsorted).

All encode/decode paths are numpy-vectorized — no Python loop over postings.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE_DEFAULT = 128


def _nbytes_of(v: np.ndarray) -> np.ndarray:
    """Varint byte length per value — K bounded comparisons, no shift loop."""
    maxv = int(v.max()) if v.size else 0
    nb = np.ones(v.size, dtype=np.int64)
    k = 1
    while maxv >= (1 << (7 * k)) and k < 10:
        nb += v >= np.uint64(1 << (7 * k))
        k += 1
    return nb


def varint_encode(values: np.ndarray, nbytes: np.ndarray | None = None) -> np.ndarray:
    """Vectorized LEB128 encode of a uint64 array → uint8 byte array.

    Builds an (n, K) byte matrix (K = max varint width present, typically
    2-3) and compacts it with one boolean gather — ~3 full-vector passes
    total, no per-byte fancy indexing (the hot path of segment encoding).
    ``nbytes`` (optional) skips recomputing per-value widths."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, np.uint8)
    if nbytes is None:
        nbytes = _nbytes_of(v)
    K = int(nbytes.max())
    if K == 1:  # all single-byte (common for tf streams)
        return v.astype(np.uint8)
    total = int(nbytes.sum())
    if total <= 3 * v.size:
        # mostly-narrow stream (docid deltas / position deltas): K scatter
        # passes over SHRINKING subsets beat the dense (n, K) matrix — a
        # single wide outlier (e.g. a large first delta) no longer forces
        # an n×K materialization.  ~1.4× faster at the measured mixes.
        starts = np.cumsum(nbytes) - nbytes
        out = np.empty(total, np.uint8)
        byte0 = (v & np.uint64(0x7F)).astype(np.uint8)
        byte0 |= (nbytes > 1).astype(np.uint8) << 7
        out[starts] = byte0
        for k in range(1, K):
            m = nbytes > k
            idx = starts[m] + k
            byte = ((v[m] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(
                np.uint8
            )
            cont = ((nbytes[m] - 1) > k).astype(np.uint8) << 7
            out[idx] = byte | cont
        return out
    # wide stream: dense byte matrix + one boolean compaction
    bm = np.empty((v.size, K), dtype=np.uint8)
    for k in range(K):
        col = ((v >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        bm[:, k] = col
    # continuation bit on every byte except each value's last
    pos = np.arange(K, dtype=np.int64)
    keep = pos[None, :] < nbytes[:, None]
    cont = pos[None, :] < (nbytes - 1)[:, None]
    bm[cont] |= 0x80
    return bm[keep]


def varint_decode(buf: np.ndarray, count: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode of a uint8 array → uint64 values.

    Decodes every varint in ``buf``; ``count`` (if given) asserts how many.
    """
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, np.uint64)
    if count is not None and count == b.size:
        # all varints are single-byte (dense deltas / small tfs) → plain cast
        return b.astype(np.uint64)
    is_end = b < 0x80
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    idx = np.arange(b.size, dtype=np.int64)
    within = idx - np.repeat(starts, lengths)
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * within.astype(np.uint64)
    )
    values = np.add.reduceat(contrib, starts)
    if count is not None and values.size != count:
        raise ValueError(f"expected {count} varints, decoded {values.size}")
    return values


def encode_postings(
    docids: np.ndarray, tfs: np.ndarray, block_size: int = BLOCK_SIZE_DEFAULT
) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """Encode one term's (strictly-increasing docids, tfs) posting list.

    Returns ``(bytes, meta)`` with meta arrays ``blk_doff, blk_toff,
    blk_maxdoc, blk_maxtf`` (see module docstring).
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = docids.size
    if n == 0:
        raise ValueError("empty posting list")
    deltas = np.empty(n, np.uint64)
    deltas[0] = np.uint64(docids[0] + 1)  # implicit previous docid = -1
    if n > 1:
        d = np.diff(docids)
        if (d <= 0).any():
            raise ValueError("docids must be strictly increasing")
        deltas[1:] = d.astype(np.uint64)

    # per-varint byte lengths for offset computation (same formula as encode)
    def _vlen(vals: np.ndarray) -> np.ndarray:
        nb = np.ones(vals.shape, dtype=np.int64)
        tmp = vals >> np.uint64(7)
        while (tmp > 0).any():
            nb[tmp > 0] += 1
            tmp >>= np.uint64(7)
        return nb

    dlens = _vlen(deltas)
    tvals = tfs.astype(np.uint64)
    tlens = _vlen(tvals)
    dbytes = varint_encode(deltas)
    tbytes = varint_encode(tvals)
    buf = np.concatenate([dbytes, tbytes])

    nblocks = (n + block_size - 1) // block_size
    bstarts = np.arange(nblocks, dtype=np.int64) * block_size
    bends = np.minimum(bstarts + block_size, n)
    dcum = np.concatenate([[0], np.cumsum(dlens)])
    tcum = np.concatenate([[0], np.cumsum(tlens)])
    blk_doff = dcum[bstarts]
    blk_toff = dbytes.size + tcum[bstarts]
    blk_maxdoc = docids[bends - 1]
    blk_maxtf = np.maximum.reduceat(tfs, bstarts).astype(np.int32)
    return buf, {
        "blk_doff": blk_doff.astype(np.int64),
        "blk_toff": blk_toff.astype(np.int64),
        "blk_maxdoc": blk_maxdoc.astype(np.int64),
        "blk_maxtf": blk_maxtf,
    }


def decode_postings(buf: np.ndarray, df: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one term's full region → (docids int64, tfs int32)."""
    vals = varint_decode(buf, count=2 * df)
    deltas = vals[:df]
    docids = np.cumsum(deltas.astype(np.int64)) - 1
    tfs = vals[df:].astype(np.int32)
    return docids, tfs


def _varint_lengths(vals: np.ndarray) -> np.ndarray:
    """Byte length of each value's varint encoding (vectorized)."""
    return _nbytes_of(np.ascontiguousarray(vals, dtype=np.uint64))


def encode_many_postings(
    starts: np.ndarray,
    docids: np.ndarray,
    tfs: np.ndarray,
    block_size: int = BLOCK_SIZE_DEFAULT,
) -> tuple[np.ndarray, dict[str, np.ndarray], np.ndarray]:
    """Bulk-encode MANY posting lists in one vectorized pass (the segment
    writer's hot path — no Python loop over terms).

    ``starts``: int64 array of length T+1 — term t's postings are
    ``docids[starts[t]:starts[t+1]]`` (strictly increasing within a term).

    Returns ``(buf, term_meta, block_counts)``:

    * ``buf``  — the postings file bytes: [all docid-delta varints][all tf
      varints].  Offsets below are ABSOLUTE into ``buf``.
    * ``term_meta`` — per-term arrays: ``doff`` (docid-delta start), ``toff``
      (tf start) — end offsets are the next term's start (or the stream end;
      ``doff_end``/``toff_end`` included explicitly for convenience) — plus
      flat per-block arrays ``blk_doff, blk_toff, blk_maxdoc, blk_maxtf``.
    * ``block_counts`` — int32 per-term block counts (to re-nest the flat
      block arrays as Arrow list columns).
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    n = docids.size
    nterms = starts.size - 1
    if n == 0 or nterms == 0:
        raise ValueError("empty postings")

    deltas = np.empty(n, np.uint64)
    if n > 1:
        d = np.diff(docids)
        interior = np.ones(n, dtype=bool)
        interior[starts[:-1]] = False
        if (d[interior[1:]] <= 0).any():
            raise ValueError("docids must be strictly increasing within a term")
        deltas[1:] = d.astype(np.uint64)
    if (docids[starts[:-1]] < 0).any():
        raise ValueError("negative docid")
    deltas[starts[:-1]] = (docids[starts[:-1]] + 1).astype(np.uint64)

    tvals = tfs.astype(np.uint64)
    dlens = _varint_lengths(deltas)
    tlens = _varint_lengths(tvals)
    dcum = np.concatenate([[0], np.cumsum(dlens)])
    tcum = np.concatenate([[0], np.cumsum(tlens)])
    dtotal = int(dcum[-1])

    dbytes = varint_encode(deltas, nbytes=dlens)
    tbytes = varint_encode(tvals, nbytes=tlens)
    buf = np.concatenate([dbytes, tbytes])

    dfs = np.diff(starts)
    # flat block starts across all terms
    nblocks = (dfs + block_size - 1) // block_size
    total_blocks = int(nblocks.sum())
    bcum = np.concatenate([[0], np.cumsum(nblocks)])
    # local block index within its term
    local = np.arange(total_blocks, dtype=np.int64) - np.repeat(bcum[:-1], nblocks)
    term_of_block = np.repeat(np.arange(nterms, dtype=np.int64), nblocks)
    bstart = starts[term_of_block] + local * block_size
    bend = np.minimum(bstart + block_size, starts[term_of_block + 1])

    blk_maxdoc = docids[bend - 1]
    blk_maxtf = np.maximum.reduceat(tfs, bstart).astype(np.int32) if total_blocks else np.empty(0, np.int32)
    blk_doff = dcum[bstart]
    blk_toff = dtotal + tcum[bstart]

    term_meta = {
        "doff": dcum[starts[:-1]],
        "doff_end": dcum[starts[1:]],
        "toff": dtotal + tcum[starts[:-1]],
        "toff_end": dtotal + tcum[starts[1:]],
        "blk_doff": blk_doff.astype(np.int64),
        "blk_toff": blk_toff.astype(np.int64),
        "blk_maxdoc": blk_maxdoc.astype(np.int64),
        "blk_maxtf": blk_maxtf,
    }
    return buf, term_meta, nblocks.astype(np.int32)


def decode_region(
    buf: np.ndarray, doff: int, doff_end: int, toff: int, toff_end: int, df: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one term's full posting list from a bulk-encoded buffer
    (absolute offsets, see :func:`encode_many_postings`)."""
    deltas = varint_decode(buf[doff:doff_end], count=df)
    docids = np.cumsum(deltas.astype(np.int64)) - 1
    tfs = varint_decode(buf[toff:toff_end], count=df).astype(np.int32)
    return docids, tfs


def decode_block_abs(
    buf: np.ndarray,
    blk_doff: np.ndarray,
    blk_toff: np.ndarray,
    blk_maxdoc: np.ndarray,
    b: int,
    df: int,
    doff_end: int,
    toff_end: int,
    block_size: int = BLOCK_SIZE_DEFAULT,
) -> tuple[np.ndarray, np.ndarray]:
    """Standalone decode of one block given a term's absolute block offsets
    (block-max WAND path)."""
    nblocks = len(blk_doff)
    nvals = min(block_size, df - b * block_size)
    d0 = int(blk_doff[b])
    d1 = int(blk_doff[b + 1]) if b + 1 < nblocks else doff_end
    t0 = int(blk_toff[b])
    t1 = int(blk_toff[b + 1]) if b + 1 < nblocks else toff_end
    deltas = varint_decode(buf[d0:d1], count=nvals)
    prev = int(blk_maxdoc[b - 1]) if b > 0 else -1
    docids = np.cumsum(deltas.astype(np.int64)) + prev
    tfs = varint_decode(buf[t0:t1], count=nvals).astype(np.int32)
    return docids, tfs


def decode_block(
    buf: np.ndarray,
    meta: dict[str, np.ndarray],
    b: int,
    df: int,
    block_size: int = BLOCK_SIZE_DEFAULT,
) -> tuple[np.ndarray, np.ndarray]:
    """Standalone decode of block ``b`` (for block-max WAND skipping).

    ``buf`` is the term's full byte region; only the block's byte ranges are
    touched.  Returns (docids absolute, tfs) for the block.
    """
    nblocks = (df + block_size - 1) // block_size
    if not 0 <= b < nblocks:
        raise IndexError(b)
    n = min(block_size, df - b * block_size)
    d0 = int(meta["blk_doff"][b])
    d1 = int(meta["blk_doff"][b + 1]) if b + 1 < nblocks else int(meta["blk_toff"][0])
    t0 = int(meta["blk_toff"][b])
    t1 = int(meta["blk_toff"][b + 1]) if b + 1 < nblocks else buf.size
    deltas = varint_decode(buf[d0:d1], count=n)
    prev = int(meta["blk_maxdoc"][b - 1]) if b > 0 else -1
    docids = np.cumsum(deltas.astype(np.int64)) + prev
    tfs = varint_decode(buf[t0:t1], count=n).astype(np.int32)
    return docids, tfs


# ---------------------------------------------------------------------------
# positional postings (phrase-query support)
# ---------------------------------------------------------------------------
# Layout: one contiguous varint stream per SEGMENT in positions.bin.  Term t's
# region is [poff[t], poff_end[t]); inside it, positions are grouped per
# posting (same (term, doc) order as the docid/tf streams) and delta-encoded
# WITHIN each doc with implicit previous position -1 (so every delta >= 1 and
# a doc's sub-stream is self-contained — merge can re-interleave docs without
# re-deriving absolute positions).  ≙ Lucene's .prx/positions data written by
# TextField's default IndexOptions DOCS_AND_FREQS_AND_POSITIONS
# (reference: LuceneContentHandler.java:21-26 uses TextField, whose postings
# always carry positions in Lucene 5.2.1) — re-designed for bulk columnar
# encode/decode, not copied.


def positions_to_deltas(pos: np.ndarray, doc_starts: np.ndarray) -> np.ndarray:
    """Absolute positions (strictly increasing within each doc sub-stream
    starting at ``doc_starts``) → per-doc delta stream (uint64)."""
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    if pos.size == 0:
        return np.empty(0, np.uint64)
    deltas = np.empty(pos.size, np.int64)
    deltas[0] = pos[0] + 1
    deltas[1:] = np.diff(pos)
    deltas[doc_starts] = pos[doc_starts] + 1
    if (deltas <= 0).any():
        raise ValueError("positions must be strictly increasing within a doc")
    return deltas.astype(np.uint64)


def encode_many_positions(
    term_tok_starts: np.ndarray, deltas: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bulk-encode every term's position deltas in one vectorized pass.

    ``term_tok_starts``: int64[T+1] — term t's deltas are
    ``deltas[term_tok_starts[t]:term_tok_starts[t+1]]``.

    Returns ``(buf, poff, poff_end)`` with absolute byte offsets into buf.
    """
    deltas = np.ascontiguousarray(deltas, dtype=np.uint64)
    starts = np.ascontiguousarray(term_tok_starts, dtype=np.int64)
    lens = _varint_lengths(deltas) if deltas.size else np.empty(0, np.int64)
    cum = np.concatenate([[0], np.cumsum(lens)])
    buf = varint_encode(deltas, nbytes=lens) if deltas.size else np.empty(0, np.uint8)
    return buf, cum[starts[:-1]], cum[starts[1:]]


def decode_positions_region(
    buf: np.ndarray, poff: int, poff_end: int, tfs: np.ndarray
) -> np.ndarray:
    """Decode one term's position region → flat ABSOLUTE positions aligned
    with ``np.repeat(docids, tfs)`` (per-doc sub-stream boundaries are the
    cumsum of ``tfs``)."""
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    deltas = varint_decode(buf[poff:poff_end], count=total)
    if total == 0:
        return np.empty(0, np.int64)
    cum = np.cumsum(deltas.astype(np.int64))
    starts = np.concatenate([[0], np.cumsum(tfs)])[:-1]
    base = cum[starts] - deltas[starts].astype(np.int64)
    return cum - np.repeat(base, tfs) - 1
