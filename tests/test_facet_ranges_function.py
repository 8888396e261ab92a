"""Numeric range facets (LongRangeFacetCounts analogue) and function-scored
search (FunctionScoreQuery recency decay) — engine semantics, sharded
identity, validation."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.fixtures import EPOCH_US, make_pages

RANGES = [
    ("short", None, 120),
    ("mid", 120, 300),
    ("long", 300, None, True, False),
    ("all", None, None, True, True),          # overlaps everything
    ("exact", 120, 120, True, True),          # single-point range
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root = str(tmp_path_factory.mktemp("idx_fr"))
    cfg = IndexConfig(index_root=root, num_partitions=5)
    build_index(make_pages(500, seed=17), cfg)
    return root, cfg, SearchEngine(root, cfg=cfg)


def _python_range_counts(eng, query, ranges):
    """Oracle: per-range counts off the engine's own sorted full match set
    (search_sorted returns EVERY matching doc with its stored warc_ts;
    doc_len oracle goes through facets_stats of a one-value field)."""
    st = eng.search_sorted(query, limit=1_000_000_000)
    ts = st["warc_ts"].to_numpy()
    out = []
    for r in ranges:
        label, lo, hi = r[0], r[1], r[2]
        lo_inc = r[3] if len(r) == 5 else True
        hi_inc = r[4] if len(r) == 5 else False
        m = np.ones(ts.size, dtype=bool)
        if lo is not None:
            m &= (ts >= lo) if lo_inc else (ts > lo)
        if hi is not None:
            m &= (ts <= hi) if hi_inc else (ts < hi)
        out.append((label, int(m.sum())))
    return out


def test_range_counts_match_python_oracle_warc_ts(built):
    _root, _cfg, eng = built
    lo = EPOCH_US
    ranges = [
        ("a", None, lo + 50_000_000, True, False),
        ("b", lo + 50_000_000, None, True, False),
        ("everything", None, None, True, True),
        ("bounded", lo, lo + 200_000_000, True, True),
    ]
    t = eng.facet_ranges("w00001", ranges, value_source="warc_ts")
    got = list(zip(t["label"].to_pylist(), t["count"].to_pylist()))
    assert got == _python_range_counts(eng, "w00001", ranges)
    # overlapping ranges count independently: a + b == everything
    d = dict(got)
    assert d["a"] + d["b"] == d["everything"] == eng.count("w00001")


def test_doc_len_ranges_partition_the_match_set(built):
    _root, _cfg, eng = built
    t = eng.facet_ranges("w00001", RANGES, value_source="doc_len")
    d = dict(zip(t["label"].to_pylist(), t["count"].to_pylist()))
    assert d["short"] + d["mid"] + d["long"] == d["all"] == eng.count("w00001")
    assert t["label"].to_pylist() == [r[0] for r in RANGES]  # caller order


def test_range_validation(built):
    _root, _cfg, eng = built
    for bad in (
        [],                                   # empty
        [("a", 5, 3)],                        # inverted
        [("a", 1, 1, False, False)],          # empty after exclusivity
        [("a", 0, 1), ("a", 2, 3)],           # duplicate label
        [("", 0, 1)],                         # empty label
        [("a", 0, 1, True)],                  # wrong arity
    ):
        with pytest.raises(ValueError):
            eng.facet_ranges("w00001", bad)
    with pytest.raises(ValueError):
        eng.facet_ranges("w00001", RANGES, value_source="nope")


def test_function_score_matches_python_recompute(built):
    _root, _cfg, eng = built
    q = "w00001 w00002"
    now, scale = EPOCH_US + 10**9, 10**8
    full = eng.search(q, limit=1_000_000_000)
    st = eng.search_sorted(q, limit=1_000_000_000)
    tsmap = dict(zip(st["url"].to_pylist(), st["warc_ts"].to_pylist()))
    urls = full["url"].to_numpy(zero_copy_only=False)
    age = np.maximum(
        now - np.array([tsmap[u] for u in urls], dtype=np.int64), 0
    ).astype(np.float64)
    fin = full["score"].to_numpy() * (float(scale) / (float(scale) + age))
    order = np.lexsort((urls, -fin))[:10]
    got = eng.search_function(q, now, scale, limit=10)
    assert got["url"].to_pylist() == list(urls[order])
    assert np.array_equal(got["score"].to_numpy(), fin[order])  # bit-exact


def test_function_score_future_docs_clamp_to_weight_one(built):
    """now BEFORE every warc_ts ⇒ age clamps to 0 ⇒ identical to search."""
    _root, _cfg, eng = built
    got = eng.search_function("w00001", 0, 10**8, limit=20)
    base = eng.search("w00001", limit=20)
    assert got.equals(base)


def test_function_score_weights_strictly_decay(built):
    """Every aged doc's final score is strictly below its BM25 score
    (w = scale/(scale+age) < 1 whenever age > 0), and the full result set
    is preserved — the weight reranks, never filters."""
    _root, _cfg, eng = built
    base = eng.search("w00001", limit=1_000_000_000)
    got = eng.search_function(
        "w00001", EPOCH_US + 10**9, 10**6, limit=1_000_000_000
    )
    assert got.num_rows == base.num_rows
    b = dict(zip(base["url"].to_pylist(), base["score"].to_pylist()))
    for u, s in zip(got["url"].to_pylist(), got["score"].to_pylist()):
        assert s < b[u]


def test_function_validation(built):
    _root, _cfg, eng = built
    with pytest.raises(ValueError):
        eng.search_function("w00001", EPOCH_US, 0)
    with pytest.raises(ValueError):
        eng.search_function("w00001", EPOCH_US, -5)
    with pytest.raises(ValueError):
        eng.search_function("w00001", EPOCH_US, 10, limit=0)


def test_sharded_identity(built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng = built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=3)
    try:
        single = eng.facet_ranges("w00001", RANGES)
        fleet = svc.facet_ranges("w00001", RANGES)
        assert fleet.equals(single)
        now, scale = EPOCH_US + 10**9, 10**8
        q = "w00001 w00002"
        s1 = eng.search_function(q, now, scale, limit=7)
        f1 = svc.search_function(q, now, scale, limit=7)
        assert f1.equals(s1)
        with pytest.raises(ValueError):
            svc.facet_ranges("w00001", [("a", 5, 3)])
        with pytest.raises(ValueError):
            svc.search_function(q, now, 0)
    finally:
        svc.shutdown()
