"""DrillSideways — Lucene facets-module analogue
(SearchEngine.drill_sideways, ShardedSearcherService.drill_sideways).

Contract: hits = query FILTERed by every dim (search_filtered semantics);
per dim the sideways counts are that dim's facet counts over the match
set with the dim's OWN filter removed and every other dim kept."""

import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.analysis import analyze
from lucene_plugin_ray.pipelines.fixtures import make_pages

Q = "w00010 w00020 w00030"
DIMS = {"foo": ["v1", "v3"], "age": "23"}


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root = str(tmp_path_factory.mktemp("idx_ds"))
    cfg = IndexConfig(
        index_root=root, num_partitions=4, field_columns=("foo", "age")
    )
    corpus = make_pages(400, seed=71, with_fields=True)
    build_index(corpus, cfg)
    return root, cfg, SearchEngine(root, cfg=cfg), corpus


def _latest(corpus):
    best = {}
    for url, ts, foo, age in zip(
        corpus["url"].to_pylist(), corpus["warc_ts"].to_pylist(),
        corpus["foo"].to_pylist(), corpus["age"].to_pylist(),
    ):
        cur = best.get(url)
        if cur is None or ts > cur[0]:
            best[url] = (ts, foo, age)
    return {
        u: {"foo": set(analyze(foo)), "age": set(analyze(age))}
        for u, (_, foo, age) in best.items()
    }


def _expected_counts(eng, corpus, dims):
    base = set(eng.search(Q, limit=10**9)["url"].to_pylist())
    fields = _latest(corpus)
    vals = {f: {v for v in ([vv] if isinstance(vv, str) else vv)}
            for f, vv in dims.items()}
    out = {}
    for f in dims:
        side = {
            u for u in base
            if all(fields[u][o] & vals[o] for o in dims if o != f)
        }
        acc = {}
        for u in side:
            for v in fields[u][f]:
                acc[v] = acc.get(v, 0) + 1
        out[f] = acc
    return out


def test_sideways_counts_match_bruteforce(built):
    _root, _cfg, eng, corpus = built
    want = _expected_counts(eng, corpus, DIMS)
    _hits, got = eng.drill_sideways(Q, DIMS)
    for f in DIMS:
        got_map = dict(zip(got[f]["value"].to_pylist(),
                           got[f]["count"].to_pylist()))
        assert got_map == want[f], f
        # facets() output contract: (count desc, value asc)
        rows = list(zip(got[f]["count"].to_pylist(),
                        got[f]["value"].to_pylist()))
        assert rows == sorted(rows, key=lambda r: (-r[0], r[1])), f


def test_single_dim_sideways_equals_plain_facets(built):
    """With ONE dim its sideways set has no other filters — counts must
    equal facets(query, field) exactly."""
    _root, _cfg, eng, _corpus = built
    _hits, counts = eng.drill_sideways(Q, {"foo": "v1"})
    assert counts["foo"].equals(eng.facets(Q, "foo"))


def test_hits_equal_search_filtered(built):
    _root, _cfg, eng, _corpus = built
    hits, _counts = eng.drill_sideways(Q, DIMS, limit=10**9)
    want = eng.search_filtered(
        Q, "(foo:v1 OR foo:v3) AND (age:23)", limit=10**9
    )
    assert hits.equals(want)
    assert hits.num_rows > 0  # non-vacuous: the drill-down matches docs


def test_validation(built):
    _root, _cfg, eng, _corpus = built
    with pytest.raises(ValueError):
        eng.drill_sideways(Q, {})
    with pytest.raises(ValueError):
        eng.drill_sideways(Q, {"nope": "x"})
    with pytest.raises(ValueError):
        eng.drill_sideways(Q, {"foo": []})
    with pytest.raises(ValueError):
        eng.drill_sideways(Q, {"foo": "two words"})


def test_facade_and_http_round_trip(ray_session, tmp_path):
    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    cfg = IndexConfig(
        index_root=str(tmp_path / "idx"), num_partitions=2,
        field_columns=("tag",),
    )
    service = LuceneHttpService(cfg, host="127.0.0.1", port=0).start()
    facade = service.facade
    try:
        c = LuceneHttpClient(service.url)
        c.index_map("col", "a", {"text": "alpha beta", "tag": "red"})
        c.index_map("col", "b", {"text": "alpha gamma", "tag": "red"})
        c.index_map("col", "d", {"text": "alpha delta", "tag": "blue"})
        c.index_map("col", "e", {"text": "unrelated", "tag": "blue"})

        res = c.drill_sideways("col", "alpha", {"tag": "red"})
        assert {h["_externalId"] for h in res["hits"]} == {"a", "b"}
        # sideways: the tag filter removed -> counts over ALL alpha docs
        assert dict(map(tuple, res["counts"]["tag"])) == {"red": 2, "blue": 1}
        ent, counts = facade.drill_sideways("col", "alpha", {"tag": "red"})
        assert [(e.external_id, e.score) for e in ent] == [
            (h["_externalId"], h["_score"]) for h in res["hits"]
        ]
        assert [list(t) for t in counts["tag"]] == res["counts"]["tag"]

        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            c.drill_sideways("col", "alpha", {"nope": "x"})
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            c._get("drill-sideways",
                   {"collection": "col", "query": "alpha", "dims": "notjson"})
        assert ei.value.code == 400
        # non-string dim values are a 400, not a 500 (review regression)
        with pytest.raises(urllib.error.HTTPError) as ei:
            c.drill_sideways("col", "alpha", {"tag": 5})
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            c.drill_sideways("col", "alpha", {"tag": ["red", 7]})
        assert ei.value.code == 400
    finally:
        service.shutdown()


def test_sharded_identity(built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng, _corpus = built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=3)
    try:
        single_hits, single_counts = eng.drill_sideways(Q, DIMS, limit=10**9)
        fleet_hits, fleet_counts = svc.drill_sideways(Q, DIMS, limit=10**9)
        assert fleet_hits.equals(single_hits)
        for f in DIMS:
            assert fleet_counts[f].equals(single_counts[f]), f
        with pytest.raises(ValueError):
            svc.drill_sideways(Q, {"nope": "x"})
    finally:
        svc.shutdown()
