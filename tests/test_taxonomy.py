"""Hierarchical (taxonomy) facets — Lucene facets-module
TaxonomyFacetCounts analogue (SearchEngine.facets_taxonomy,
ShardedSearcherService.facets_taxonomy).

Contract: the hierarchy is an ORDERED list of indexed metadata fields;
a path's count is the number of matching docs carrying EVERY component in
its level's field (multi-token field values count the doc once per
distinct path — Lucene's once-per-node multi-valued semantics); top_n
keeps the top-n children per parent under the facets (count desc, value
asc) rank, pruning whole subtrees; pruning runs AFTER the exact count
merge so the sharded twin is identical by construction."""

import itertools

import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.analysis import analyze
from lucene_plugin_ray.pipelines.fixtures import make_pages

Q = "w00010 w00020 w00030"


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root = str(tmp_path_factory.mktemp("idx_tax"))
    cfg = IndexConfig(
        index_root=root, num_partitions=4,
        field_columns=("lang", "foo", "age"),
    )
    corpus = make_pages(400, seed=71, with_fields=True)
    build_index(corpus, cfg)
    return root, cfg, SearchEngine(root, cfg=cfg), corpus


def _latest_fields(corpus, fields):
    best = {}
    cols = {f: corpus[f].to_pylist() for f in fields}
    for i, (url, ts) in enumerate(
        zip(corpus["url"].to_pylist(), corpus["warc_ts"].to_pylist())
    ):
        cur = best.get(url)
        if cur is None or ts > cur[0]:
            best[url] = (ts, i)
    return {
        u: {f: set(analyze(cols[f][i])) for f in fields}
        for u, (_, i) in best.items()
    }


def _expected(eng, corpus, levels):
    """Brute-force taxonomy oracle: every matching url contributes once to
    each distinct path in the cross-product of its per-level token sets,
    and to every prefix of it."""
    base = set(eng.search(Q, limit=10**9)["url"].to_pylist())
    fields = _latest_fields(corpus, levels)
    counts = {}
    for u in base:
        seen = set()
        for combo in itertools.product(*(sorted(fields[u][f]) for f in levels)):
            for d in range(1, len(combo) + 1):
                seen.add(combo[:d])
        for p in seen:
            counts[p] = counts.get(p, 0) + 1
    return counts


def _table_to_dict(t):
    return dict(zip(t["path"].to_pylist(), t["count"].to_pylist()))


def test_counts_match_bruteforce(built):
    _root, _cfg, eng, corpus = built
    levels = ["lang", "foo"]
    want = {"/".join(p): c for p, c in _expected(eng, corpus, levels).items()}
    got = eng.facets_taxonomy(Q, levels)
    assert _table_to_dict(got) == want
    assert got.num_rows > 0
    # ordering contract: path ascending
    paths = got["path"].to_pylist()
    assert paths == sorted(paths)


def test_multivalued_once_per_path(built):
    """foo is 'lamb little' on 1-in-5 docs — such a doc counts once under
    EACH child, so lamb/little counts are equal and child sums exceed the
    parent where multi-token values exist."""
    _root, _cfg, eng, corpus = built
    got = _table_to_dict(eng.facets_taxonomy(Q, ["foo"]))
    assert got.get("lamb", 0) == got.get("little", 0) > 0


def test_rollup_sum_on_single_valued_levels(built):
    """lang and age are single-token fields, so every parent's count is
    exactly the sum of its children (each doc lands in exactly one child)."""
    _root, _cfg, eng, _corpus = built
    got = _table_to_dict(eng.facets_taxonomy(Q, ["lang", "age"]))
    parents = {p: c for p, c in got.items() if "/" not in p}
    for parent, c in parents.items():
        kids = sum(v for p, v in got.items()
                   if p.startswith(parent + "/"))
        assert kids == c, parent
    # taxonomy invariant: parent >= child always
    for p, c in got.items():
        if "/" in p:
            assert got[p.rsplit("/", 1)[0]] >= c, p


def test_level1_equals_facets(built):
    _root, _cfg, eng, _corpus = built
    tax = _table_to_dict(eng.facets_taxonomy(Q, ["lang"]))
    fac = eng.facets(Q, "lang")
    assert tax == dict(zip(fac["value"].to_pylist(),
                           fac["count"].to_pylist()))


def test_top_n_pruning(built):
    """top_n keeps the top-n children per parent under (count desc, value
    asc) and drops pruned nodes' subtrees."""
    _root, _cfg, eng, _corpus = built
    full = _table_to_dict(eng.facets_taxonomy(Q, ["lang", "foo"]))
    # expected prune, computed independently from the full counts
    by_parent = {}
    for p, c in full.items():
        parts = p.split("/")
        by_parent.setdefault("/".join(parts[:-1]), []).append((p, c))
    want = {}
    for parent in sorted(by_parent, key=lambda s: s.count("/") if s else -1):
        if parent and parent not in want:
            continue
        kids = sorted(by_parent[parent], key=lambda kv: (-kv[1], kv[0]))
        for p, c in kids[:2]:
            want[p] = c
    got = _table_to_dict(eng.facets_taxonomy(Q, ["lang", "foo"], top_n=2))
    assert got == want
    # the kept level-1 set is the facets top-2 under (count desc, value asc)
    lvl1 = sorted(((p, c) for p, c in full.items() if "/" not in p),
                  key=lambda kv: (-kv[1], kv[0]))[:2]
    assert {p for p, _ in lvl1} == {p for p in got if "/" not in p}


def test_validation(built):
    _root, _cfg, eng, _corpus = built
    for bad in ([], ["nope"], ["lang", "lang"], [7], "lang", ["text"]):
        with pytest.raises(ValueError):
            eng.facets_taxonomy(Q, bad)
    with pytest.raises(ValueError):
        eng.facets_taxonomy(Q, ["lang"], top_n=0)


def test_sharded_identity(built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng, _corpus = built
    single = eng.facets_taxonomy(Q, ["lang", "foo"])
    single_top = eng.facets_taxonomy(Q, ["lang", "foo"], top_n=2)
    for shards in (1, 3):
        svc = ShardedSearcherService(root, cfg=cfg, num_shards=shards)
        try:
            assert svc.facets_taxonomy(Q, ["lang", "foo"]).equals(single)
            assert svc.facets_taxonomy(
                Q, ["lang", "foo"], top_n=2
            ).equals(single_top)
            with pytest.raises(ValueError):  # rejected before fan-out
                svc.facets_taxonomy(Q, ["nope"])
        finally:
            svc.shutdown()


def test_facade_and_http_round_trip(ray_session, tmp_path):
    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    cfg = IndexConfig(
        index_root=str(tmp_path / "idx"), num_partitions=2,
        field_columns=("tag", "grp"),
    )
    service = LuceneHttpService(cfg, host="127.0.0.1", port=0).start()
    facade = service.facade
    try:
        c = LuceneHttpClient(service.url)
        c.index_map("col", "a", {"text": "alpha beta", "tag": "red", "grp": "x"})
        c.index_map("col", "b", {"text": "alpha gamma", "tag": "red", "grp": "x"})
        c.index_map("col", "d", {"text": "alpha delta", "tag": "blue", "grp": "y"})
        c.index_map("col", "e", {"text": "unrelated", "tag": "blue", "grp": "y"})

        res = c.facets_taxonomy("col", "alpha", ["tag", "grp"])
        assert {(r["path"], r["count"]) for r in res} == {
            ("red", 2), ("red/x", 2), ("blue", 1), ("blue/y", 1)
        }
        assert res == facade.facets_taxonomy("col", "alpha", ["tag", "grp"])
        # top_n over the wire: only the larger root child survives
        res1 = c.facets_taxonomy("col", "alpha", ["tag", "grp"], top_n=1)
        assert {(r["path"], r["count"]) for r in res1} == {
            ("red", 2), ("red/x", 2)
        }

        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            c.facets_taxonomy("col", "alpha", ["nope"])
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            c._get("facets-taxonomy",
                   {"collection": "col", "query": "alpha", "fields": "notjson"})
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            c.facets_taxonomy("col", "alpha", ["tag"], top_n=0)
        assert ei.value.code == 400
    finally:
        service.shutdown()
