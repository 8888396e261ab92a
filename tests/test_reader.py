"""reader.read_parquet_clean — metadata-free schemas at the read.

pandas-written parquet embeds a b'pandas' schema-metadata dict; pa.Schema
objects carrying metadata are unhashable (hash() raises), which defeats Ray
Data's schema-dedup fast path on every block concat.  These tests pin the
driver-side schema derivation; the Ray-side effect (zero "Failed to hash the
schemas" warnings) is exercised by every pipeline test that reads testdata.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_plugin_ray.sources.reader import _clean_schema


@pytest.fixture()
def pandas_parquet(tmp_path):
    path = os.path.join(tmp_path, "t.parquet")
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"], "c": [0.5, 1.5]}).to_parquet(path)
    return path


def test_pandas_metadata_makes_schema_unhashable(pandas_parquet):
    # the premise: without stripping, the file schema is unhashable
    full = pq.read_schema(pandas_parquet)
    assert full.metadata and b"pandas" in full.metadata
    with pytest.raises(TypeError):
        hash(full)


def test_clean_schema_strips_metadata_and_projects(pandas_parquet):
    s = _clean_schema(pandas_parquet, ["b", "a"])
    assert s is not None
    assert s.metadata is None
    assert s.names == ["b", "a"]  # caller's column order preserved
    assert s.field("a").type == pa.int64()
    hash(s)  # hashable → Ray's set-based schema dedup works


def test_clean_schema_no_columns_keeps_all_fields(pandas_parquet):
    s = _clean_schema(pandas_parquet, None)
    assert s is not None and s.metadata is None
    assert set(s.names) == {"a", "b", "c"}


def test_clean_schema_directory_uses_first_file(tmp_path, pandas_parquet):
    d = os.path.join(tmp_path, "dir")
    os.makedirs(d)
    pd.DataFrame({"a": [3], "b": ["z"], "c": [2.5]}).to_parquet(
        os.path.join(d, "part-0.parquet")
    )
    s = _clean_schema(d, ["a"])
    assert s is not None and s.metadata is None and s.names == ["a"]


def test_clean_schema_missing_path_falls_back_to_none(tmp_path):
    assert _clean_schema(os.path.join(tmp_path, "nope"), ["a"]) is None
    assert _clean_schema("s3://bucket/prefix", ["a"]) is None  # remote → fallback
