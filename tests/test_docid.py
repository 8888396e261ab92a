"""Unit tests for stable hashing and deterministic docid assignment."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_plugin_ray.functions.docid import assign_docids_reference, partition_bases
from lucene_plugin_ray.functions.hashing import (
    fnv1a_bytes_column,
    fnv1a_str,
    partition_column,
    partition_of_key,
    sha256_column,
)


def test_fnv1a_scalar_vs_column():
    vals = ["", "a", "hello world", "https://site-0001.example/x", "\x00weird"]
    col = fnv1a_bytes_column(pa.array(vals))
    assert col.tolist() == [fnv1a_str(v) for v in vals]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=30), max_size=10))
def test_fnv1a_property(vals):
    col = fnv1a_bytes_column(pa.array(vals, type=pa.string()))
    assert col.tolist() == [fnv1a_str(v) for v in vals]


def test_fnv1a_sliced_array():
    arr = pa.array(["aa", "bb", "cc", "dd"]).slice(1, 2)
    assert fnv1a_bytes_column(arr).tolist() == [fnv1a_str("bb"), fnv1a_str("cc")]


def test_partition_column_matches_scalar():
    colls = pa.array(["default", "foo", "default"])
    urls = pa.array(["u1", "u2", "u3"])
    got = partition_column(colls, urls, 8)
    exp = [partition_of_key(c, u, 8) for c, u in [("default", "u1"), ("foo", "u2"), ("default", "u3")]]
    assert got.tolist() == exp


def test_docid_assignment_deterministic_and_strided():
    from lucene_plugin_ray.functions.docid import DOCID_STRIDE

    keys = [("default", f"url{i}") for i in range(100)] + [("other", "urlX")]
    m1 = assign_docids_reference(keys, 8)
    m2 = assign_docids_reference(list(reversed(keys)), 8)  # order-independent
    assert m1 == m2
    assert len(set(m1.values())) == 101  # unique
    # within a partition, ids are contiguous local ranks in (coll,url) order
    for (coll, url), d in m1.items():
        p, rank = divmod(d, DOCID_STRIDE)
        assert p == partition_of_key(coll, url, 8)
        assert 0 <= rank < 101


def test_partition_bases():
    bases = partition_bases({0: 3, 2: 5}, 4)
    assert bases.tolist() == [0, 3, 3, 8, 8]


def test_sha256_column():
    import hashlib

    vals = ["abc", "", None, "mary had a lamb"]
    got = sha256_column(pa.array(vals)).to_pylist()
    exp = [hashlib.sha256(v.encode()).hexdigest() if v is not None else None for v in vals]
    assert got == exp
