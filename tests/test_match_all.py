"""``*:*`` — MatchAllDocsQuery (classic QueryParser's field-*/term-* special
case).  Matches every live document at constant score 1.0 × boost, composes
with the boolean level like any constant-score clause, and respects
deletes / collection scoping.  Engine vs the brute-force OracleIndex."""

import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.queryparse import (
    MatchAllClause,
    QueryParseError,
    parse_query,
)
from lucene_plugin_ray.pipelines.fixtures import make_delete_set, make_pages
from lucene_plugin_ray.pipelines.oracle import OracleIndex


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = make_pages(150, seed=48, with_collections=True)
    root = str(tmp_path_factory.mktemp("idx_matchall"))
    cfg = IndexConfig(index_root=root, num_partitions=3)
    build_index(corpus, cfg)
    return corpus, cfg, SearchEngine(root, cfg=cfg), OracleIndex(corpus, cfg)


def _ranks(engine, oracle, query, coll="default", k=255):
    got = engine.search(query, collection=coll, limit=k)
    exp = oracle.search(query, collection=coll, limit=k)
    assert got["url"].to_pylist() == [u for u, _ in exp], query
    for s, (_, es) in zip(got["score"].to_pylist(), exp):
        assert abs(s - es) < 1e-6
    return got


def test_parse_match_all():
    (c,) = parse_query("*:*")
    assert isinstance(c, MatchAllClause) and c.boost == 1.0
    (c2,) = parse_query("*:*^2.5")
    assert isinstance(c2, MatchAllClause) and c2.boost == 2.5
    (c3,) = parse_query("-*:*")
    assert c3.occur == "MUST_NOT"
    with pytest.raises(QueryParseError):
        parse_query("text:*:*")  # explicit field prefix stays rejected
    with pytest.raises(QueryParseError):
        parse_query("*:*extra")  # not the literal token → leading wildcard


def test_match_all_returns_every_live_doc(built):
    corpus, cfg, engine, oracle = built
    n_default = sum(1 for c in oracle.coll_of.values() if c == "default")
    got = engine.search("*:*", limit=1_000_000)
    assert got.num_rows == n_default
    assert set(got["score"].to_pylist()) == {1.0}
    # url-asc tiebreak among all-equal scores
    urls = got["url"].to_pylist()
    assert urls == sorted(urls)
    assert engine.count("*:*") == n_default
    # collection scoping
    for coll in engine.collections():
        n_c = sum(1 for c in oracle.coll_of.values() if c == coll)
        assert engine.count("*:*", collection=coll) == n_c


def test_match_all_boolean_composition(built):
    corpus, cfg, engine, oracle = built
    _ranks(engine, oracle, "*:* AND w00000")
    _ranks(engine, oracle, "*:* w00000")       # SHOULD: all docs, scored hits on top
    _ranks(engine, oracle, "-w00000 *:*")      # everything except
    _ranks(engine, oracle, "*:*^2.5")
    assert engine.search("-*:*").num_rows == 0  # only-prohibited matches nothing
    # (*:*) in a group
    _ranks(engine, oracle, "(*:* w00000) AND w00001")


def test_match_all_respects_deletes(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = make_pages(120, seed=49)
    deletes = make_delete_set(corpus, every=10)
    root = str(tmp_path_factory.mktemp("idx_matchall_del"))
    cfg = IndexConfig(index_root=root, num_partitions=3)
    build_index(corpus, cfg, deletes=deletes)
    engine = SearchEngine(root, cfg=cfg)
    n_alive = len(set(corpus["url"].to_pylist())) - len(
        set(deletes["url"].to_pylist())
    )
    assert engine.count("*:*") == n_alive
    got = engine.search("*:*", limit=1_000_000)
    assert got.num_rows == n_alive
    assert not (set(got["url"].to_pylist()) & set(deletes["url"].to_pylist()))


def test_match_all_explain(built):
    corpus, cfg, engine, oracle = built
    url = engine.search("*:*", limit=1)["url"][0].as_py()
    ex = engine.explain("*:*", url)
    kinds = ex["kind"].to_pylist() if hasattr(ex, "column_names") else [
        r["kind"] for r in ex["clauses"]
    ]
    assert "match_all" in kinds
