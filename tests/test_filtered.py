"""Filtered search — Lucene IndexSearcher.search(Query, Filter, n) /
BooleanClause.Occur.FILTER analogue (SearchEngine.search_filtered,
ShardedSearcherService.search_filtered).  Contract: match set = query
matches ∩ filter boolean matches; scores from the query ALONE (identical
to plain search for surviving docs); top-limit under (score desc, url
asc)."""

import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.queryparse import QueryParseError
from lucene_plugin_ray.pipelines.fixtures import make_pages


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root = str(tmp_path_factory.mktemp("idx_filtered"))
    cfg = IndexConfig(index_root=root, num_partitions=4)
    build_index(make_pages(400, seed=51), cfg)
    return root, cfg, SearchEngine(root, cfg=cfg)


def _match_urls(eng, q):
    return set(
        eng.search(q, limit=1_000_000)["url"].to_pylist()
    )


@pytest.mark.parametrize(
    "q,f",
    [
        ("w00001 w00002", "w00003"),
        ("w00001 w00002", "w00003 w00004"),          # OR filter
        ("w00001 w00002", "w00003 AND w00004"),      # AND filter
        ("w00001 w00002", "w00003 -w00001"),         # NOT in filter
        ("w00001 AND w00002", "w0000*"),             # wildcard filter
    ],
)
def test_filtered_equals_composed_restriction(built, q, f):
    """search_filtered == search(q) rows restricted to f's match set,
    scores bit-identical (the filter never touches statistics)."""
    _root, _cfg, eng = built
    full = eng.search(q, limit=1_000_000)
    fset = _match_urls(eng, f)
    want = full.filter(
        pa.array([u in fset for u in full["url"].to_pylist()])
    )
    got = eng.search_filtered(q, f, limit=1_000_000)
    assert got.num_rows == want.num_rows > 0, (q, f)
    assert got.equals(want), (q, f)


def test_filtered_truncation_is_global_topk(built):
    _root, _cfg, eng = built
    full = eng.search_filtered("w00001 w00002", "w00003", limit=1_000_000)
    assert full.num_rows > 5
    top3 = eng.search_filtered("w00001 w00002", "w00003", limit=3)
    assert top3.equals(full.slice(0, 3))


def test_filter_no_match_is_empty(built):
    _root, _cfg, eng = built
    t = eng.search_filtered("w00001", "zzznotinvocab")
    assert t.num_rows == 0


def test_validation(built):
    _root, _cfg, eng = built
    with pytest.raises(ValueError):
        eng.search_filtered("w00001", "w00002", limit=0)
    with pytest.raises((ValueError, QueryParseError)):
        eng.search_filtered("w00001", "")


def test_sharded_identity(built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng = built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=3)
    try:
        for limit in (3, 20, 1_000_000):
            single = eng.search_filtered(
                "w00001 w00002", "w00003 w00004", limit=limit
            )
            fleet = svc.search_filtered(
                "w00001 w00002", "w00003 w00004", limit=limit
            )
            assert fleet.equals(single), limit
        with pytest.raises(ValueError):
            svc.search_filtered("a", "b", limit=0)
    finally:
        svc.shutdown()


def test_facade_and_http_round_trip(ray_session, tmp_path):
    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    cfg = IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=2)
    service = LuceneHttpService(cfg, host="127.0.0.1", port=0).start()
    facade = service.facade
    for i in range(24):
        facade.index_text("default", f"doc{i:02d}", f"alpha beta gam{i % 3}")
    facade.commit()
    res = facade.search_filtered("default", "alpha", "gam1")
    want = {e.external_id for e in facade.search("default", "gam1", limit=100)}
    assert res and {e.external_id for e in res} == want
    base = {e.external_id: e.score
            for e in facade.search("default", "alpha", limit=100)}
    assert all(e.score == base[e.external_id] for e in res)
    with pytest.raises(Exception):
        facade.search_filtered("default", "alpha", "")
    try:
        client = LuceneHttpClient(service.url)
        h = client.search_filtered("default", "alpha", "gam1")
        assert [r["_externalId"] for r in h] == [e.external_id for e in res]
    finally:
        service.shutdown()
