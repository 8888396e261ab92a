"""Unit tests for the varint/delta posting codec (SURVEY.md §5.2 layer 1)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_plugin_ray.functions.codec import (
    decode_block,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_known():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**35, 2**63 - 1], dtype=np.uint64)
    buf = varint_encode(vals)
    assert varint_decode(buf, count=len(vals)).tolist() == vals.tolist()
    # 127 → 1 byte, 128 → 2 bytes
    assert varint_encode(np.array([127], np.uint64)).size == 1
    assert varint_encode(np.array([128], np.uint64)).size == 2


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr), count=len(arr)).tolist() == vals


def _random_postings(rng, n, maxdoc):
    docids = np.sort(rng.choice(maxdoc, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    return docids, tfs


def test_postings_roundtrip_and_blockmeta():
    rng = np.random.default_rng(7)
    for n in [1, 5, 128, 129, 1000]:
        docids, tfs = _random_postings(rng, n, 100_000)
        buf, meta = encode_postings(docids, tfs, block_size=128)
        d2, t2 = decode_postings(buf, n)
        assert d2.tolist() == docids.tolist()
        assert t2.tolist() == tfs.tolist()
        nblocks = (n + 127) // 128
        assert len(meta["blk_maxdoc"]) == nblocks
        # block-max metadata is exact
        for b in range(nblocks):
            lo, hi = b * 128, min((b + 1) * 128, n)
            assert meta["blk_maxdoc"][b] == docids[hi - 1]
            assert meta["blk_maxtf"][b] == tfs[lo:hi].max()
            bd, bt = decode_block(buf, meta, b, n, block_size=128)
            assert bd.tolist() == docids[lo:hi].tolist()
            assert bt.tolist() == tfs[lo:hi].tolist()


def test_postings_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 3]), np.array([1, 1]))
    with pytest.raises(ValueError):
        encode_postings(np.array([], dtype=np.int64), np.array([], dtype=np.int64))


def test_docid_zero_and_dense():
    docids = np.arange(0, 500, dtype=np.int64)
    tfs = np.ones(500, dtype=np.int64)
    buf, meta = encode_postings(docids, tfs)
    d2, t2 = decode_postings(buf, 500)
    assert d2[0] == 0 and d2[-1] == 499
    # dense deltas are 1 byte each → docid stream ≈ 500 bytes
    assert meta["blk_toff"][0] == 500
