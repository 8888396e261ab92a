"""Two-pass query rescoring — Lucene QueryRescorer analogue
(SearchEngine.rescore, ShardedSearcherService.rescore, facade, HTTP, CLI).
Contract: pass 1 = top-window_size hits of the base query under
(score desc, url asc); pass 2 combines first + weight · second where
second is the rescore query's score over the WINDOW only (0.0 outside its
match set); output = top-limit window rows under (combined desc, url asc).
Docs outside the window never appear, whatever the rescore query says."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.fixtures import make_pages


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root = str(tmp_path_factory.mktemp("idx_rescore"))
    cfg = IndexConfig(index_root=root, num_partitions=5)
    build_index(make_pages(500, seed=37), cfg)
    return root, cfg, SearchEngine(root, cfg=cfg)


def _score_map(t: pa.Table) -> dict:
    return dict(zip(t["url"].to_pylist(), t["score"].to_pylist()))


@pytest.mark.parametrize(
    "q1,q2,weight",
    [
        ("w00001 w00002", "w00003 w00010", 1.0),
        ("w00001 w00002", "w00001", 0.5),          # overlap with pass 1
        ("w00001 w00002", '"w00001 w00002"~3', 2.0),  # phrase rescore
        ("w00001 AND w00002", "w00005 -w00001", -0.25),  # negative weight
    ],
)
def test_combine_is_first_plus_weight_times_second(built, q1, q2, weight):
    """Full-window rescore == search(q1) + weight · search(q2) gathered —
    bit-for-bit: both sides' scores come from the same TAAT arithmetic."""
    _root, _cfg, eng = built
    full1 = eng.search(q1, limit=1_000_000)
    assert full1.num_rows > 5
    s2 = _score_map(eng.search(q2, limit=1_000_000))
    r = eng.rescore(q1, q2, window_size=1_000_000, weight=weight,
                    limit=1_000_000, include_first=True)
    assert r.num_rows == full1.num_rows
    for url, combined, first in zip(
        r["url"].to_pylist(), r["score"].to_pylist(),
        r["first_score"].to_pylist(),
    ):
        assert combined == first + weight * s2.get(url, 0.0), (url, q2)
    # output order is (combined desc, url asc)
    sc = r["score"].to_numpy()
    urls = r["url"].to_pylist()
    for i in range(1, len(sc)):
        assert sc[i - 1] > sc[i] or (
            sc[i - 1] == sc[i] and urls[i - 1] < urls[i]
        )


def test_window_bounds_the_candidate_set(built):
    """Only pass-1's top-window docs can appear, even when the rescore
    query would rank an outside doc far higher."""
    _root, _cfg, eng = built
    q1, q2 = "w00001 w00002", "w00005"
    k = 7
    window_urls = set(eng.search(q1, limit=k)["url"].to_pylist())
    r = eng.rescore(q1, q2, window_size=k, weight=100.0, limit=1_000_000)
    assert r.num_rows == k
    assert set(r["url"].to_pylist()) == window_urls


def test_weight_zero_is_identity_reorder(built):
    _root, _cfg, eng = built
    first = eng.search("w00001 w00002", limit=20)
    r = eng.rescore("w00001 w00002", "w00003", window_size=20, weight=0.0)
    assert r.equals(first.select(["url", "score", "docid"]))


def test_limit_truncates_after_rescore(built):
    _root, _cfg, eng = built
    full = eng.rescore("w00001 w00002", "w00001", window_size=50, limit=50)
    top3 = eng.rescore("w00001 w00002", "w00001", window_size=50, limit=3)
    assert top3.equals(full.slice(0, 3))


def test_no_match_rescore_query_keeps_first_order(built):
    _root, _cfg, eng = built
    first = eng.search("w00001", limit=10)
    r = eng.rescore("w00001", "zzznotinvocab", window_size=10, weight=3.0)
    assert r.equals(first)


def test_validation(built):
    _root, _cfg, eng = built
    with pytest.raises(ValueError):
        eng.rescore("w00001", "w00002", window_size=0)
    with pytest.raises(ValueError):
        eng.rescore("w00001", "w00002", limit=0)
    with pytest.raises(ValueError):
        eng.rescore("w00001", "w00002", weight=float("nan"))
    with pytest.raises(ValueError):
        eng.rescore("w00001", "w00002", weight=float("inf"))


def test_sharded_identity(built):
    """Fleet rescore == single-engine rescore, including at a window that
    truncates (the driver re-derives the global window from first_score)."""
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng = built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=3)
    try:
        for window, weight, limit in ((6, 1.5, 6), (25, 0.5, 10), (10**6, 1.0, 10**6)):
            single = eng.rescore(
                "w00001 w00002", "w00003 w00001", window_size=window,
                weight=weight, limit=limit,
            )
            fleet = svc.rescore(
                "w00001 w00002", "w00003 w00001", window_size=window,
                weight=weight, limit=limit,
            )
            assert fleet.equals(single), (window, weight, limit)
        with pytest.raises(ValueError):
            svc.rescore("a", "b", window_size=0)
        with pytest.raises(ValueError):
            svc.rescore("a", "b", weight=float("inf"))
    finally:
        svc.shutdown()


def test_cross_generation_docid_overlap(ray_session, tmp_path):
    """Docid ranges of different GENERATIONS overlap (doc_base is
    per-partition, not per-generation) — pass-2 gather must join on url,
    never on docid, or a gen-0 window doc silently inherits a gen-1
    doc's rescore score (the exact bug this test pins)."""
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    cfg = IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=1)
    # make_pages emits duplicate urls (upsert fixtures); keep the LAST row
    # per url so the two generations below are url-DISJOINT — otherwise the
    # delta would LWW-overwrite the gen-0 'alpha' doc instead of adding docs.
    raw = make_pages(12, seed=5)
    last = {u: i for i, u in enumerate(raw["url"].to_pylist())}
    base = raw.take(pa.array(sorted(last.values())))
    assert base.num_rows >= 6

    def with_text(t, txt_by_url):
        import pyarrow as pa_

        urls = t["url"].to_pylist()
        texts = [txt_by_url.get(u, x) for u, x in
                 zip(urls, t["text"].to_pylist())]
        return t.set_column(t.schema.get_field_index("text"),
                            "text", pa_.array(texts, pa_.string()))

    urls = base["url"].to_pylist()
    # gen 0: url[0] matches base query only; gen 1 adds NEW docs where the
    # local rank-0 doc matches the rescore query
    g0 = with_text(base.slice(0, 3), {urls[0]: "alpha common",
                                      urls[1]: "common", urls[2]: "common"})
    g1 = with_text(base.slice(3, 3), {urls[3]: "boost common",
                                      urls[4]: "common", urls[5]: "common"})
    build_index(g0, cfg)
    build_delta(g1, cfg)
    eng = SearchEngine(cfg.index_root, cfg=cfg)
    segs = eng._segments["default"]
    bases = [s.reader.doc_base for s in segs]
    assert len(bases) == 2 and bases[0] == bases[1], "fixture must overlap"
    r = eng.rescore("alpha", "boost", window_size=10, weight=5.0,
                    include_first=True)
    assert r.num_rows == 1
    assert r["score"][0].as_py() == r["first_score"][0].as_py(), (
        "gen-0 window doc must NOT inherit the gen-1 doc's rescore score"
    )


def test_facade_and_http_round_trip(ray_session, tmp_path):
    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    cfg = IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=2)
    service = LuceneHttpService(cfg, host="127.0.0.1", port=0).start()
    facade = service.facade
    for i in range(30):
        facade.index_text("default", f"doc{i:02d}", f"alpha beta gam{i % 3}")
    facade.commit()
    base = facade.search("default", "alpha", limit=5)
    res = facade.rescore("default", "alpha", "gam1", window_size=5, weight=2.0)
    assert {e.external_id for e in res} == {e.external_id for e in base}
    boosted = [e for e in res if e.external_id in
               {x.external_id for x in facade.search("default", "gam1", limit=100)}]
    plain = [e for e in res if e not in boosted]
    assert all(b.score > p.score for b in boosted for p in plain)
    with pytest.raises(Exception):
        facade.rescore("default", "alpha", "")

    try:
        client = LuceneHttpClient(service.url)
        h = client.rescore("default", "alpha", "gam1", window=5, weight=2.0)
        assert [r["_externalId"] for r in h] == [e.external_id for e in res]
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            client._get("rescore", {"collection": "default", "query": "alpha",
                                    "rescore_query": "gam1", "weight": "zz"})
    finally:
        service.shutdown()
