"""Query-time join — Lucene join-module analogue
(JoinUtil.createJoinQuery(fromField, fromQuery, toField, searcher,
ScoreMode); SearchEngine.search_join, ShardedSearcherService.search_join).

Contract: from-side = per ``from_field`` value of the from-query's
matching docs, BM25 scores aggregated under ScoreMode
(none/max/min/total/avg); to-side = every alive doc carrying a joined
``to_field`` value, scored by folding its matched values' aggregates
under the same mode; (score desc, url asc) total order, top-limit."""

import numpy as np
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.analysis import analyze
from lucene_plugin_ray.pipelines.fixtures import make_pages

Q = "w00010 w00020 w00030"
MODES = ("none", "max", "min", "total", "avg")


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root = str(tmp_path_factory.mktemp("idx_join"))
    cfg = IndexConfig(
        index_root=root, num_partitions=4, field_columns=("foo", "age")
    )
    corpus = make_pages(400, seed=63, with_fields=True)
    build_index(corpus, cfg)
    return root, cfg, SearchEngine(root, cfg=cfg), corpus


def _latest(corpus):
    """url -> (foo tokens, age tokens) of the LWW-surviving version."""
    best = {}
    for url, ts, foo, age in zip(
        corpus["url"].to_pylist(), corpus["warc_ts"].to_pylist(),
        corpus["foo"].to_pylist(), corpus["age"].to_pylist(),
    ):
        cur = best.get(url)
        if cur is None or ts > cur[0]:
            best[url] = (ts, foo, age)
    return {
        u: {"foo": analyze(foo), "age": analyze(age)}
        for u, (_, foo, age) in best.items()
    }


def _expected(eng, corpus, from_field, to_field, mode, limit=10**9):
    """Brute-force reference: search() scores + raw-corpus field values."""
    full = eng.search(Q, limit=10**9)
    scores = dict(zip(full["url"].to_pylist(), full["score"].to_pylist()))
    fields = _latest(corpus)
    per_value: dict[str, list[float]] = {}
    for u, s in scores.items():
        for v in set(fields[u][from_field]):
            per_value.setdefault(v, []).append(s)

    def fold(vals):
        if mode == "none":
            return 1.0
        if mode == "max":
            return max(vals)
        if mode == "min":
            return min(vals)
        if mode == "total":
            return sum(vals)
        return sum(vals) / len(vals)

    vscore = {v: fold(s) for v, s in per_value.items()}
    hits = []
    for u, fv in fields.items():
        matched = [vscore[v] for v in set(fv[to_field]) if v in vscore]
        if not matched:
            continue
        if mode in ("none", "max"):
            s = max(matched)
        elif mode == "min":
            s = min(matched)
        elif mode == "total":
            s = sum(matched)
        else:
            s = sum(matched) / len(matched)
        hits.append((u, s))
    hits.sort(key=lambda t: (-t[1], t[0]))
    return hits[:limit]


@pytest.mark.parametrize("mode", MODES)
# (foo, age) vocabularies are DISJOINT in the fixture — that pair pins the
# cross-field empty-intersection behavior (0 rows on both sides)
@pytest.mark.parametrize("from_field,to_field", [("foo", "foo"), ("age", "age"), ("foo", "age")])
def test_join_matches_bruteforce(built, mode, from_field, to_field):
    _root, _cfg, eng, corpus = built
    want = _expected(eng, corpus, from_field, to_field, mode)
    got = eng.search_join(Q, from_field, to_field, score_mode=mode, limit=10**9)
    assert got.num_rows == len(want), (mode, from_field, to_field)
    np.testing.assert_array_equal(
        got["url"].to_numpy(zero_copy_only=False), [u for u, _ in want]
    )
    np.testing.assert_allclose(
        got["score"].to_numpy(), [s for _, s in want], rtol=0, atol=1e-12
    )


def test_multivalued_fold_total(built):
    """Docs whose foo = 'lamb little' carry TWO joined values; under
    ScoreMode.total their to-side score is s(lamb)+s(little) — the fold
    is over matched values, not a single lookup."""
    _root, _cfg, eng, corpus = built
    agg = eng.join_from_aggregates(Q, "foo")
    vs = eng.join_value_scores(agg, "total")
    assert "lamb" in vs and "little" in vs
    got = eng.search_join(Q, "foo", "foo", score_mode="total", limit=10**9)
    both = vs["lamb"] + vs["little"]
    fields = _latest(corpus)
    two_valued = {u for u, f in fields.items() if set(f["foo"]) == {"lamb", "little"}}
    by_url = dict(zip(got["url"].to_pylist(), got["score"].to_pylist()))
    hit = two_valued & set(by_url)
    assert hit
    for u in hit:
        assert by_url[u] == pytest.approx(both, abs=1e-12)


def test_truncation_is_global_topk(built):
    _root, _cfg, eng, _corpus = built
    full = eng.search_join(Q, "foo", "foo", score_mode="max", limit=10**9)
    assert full.num_rows > 5
    top3 = eng.search_join(Q, "foo", "foo", score_mode="max", limit=3)
    assert top3.equals(full.slice(0, 3))


def test_no_match_is_empty(built):
    _root, _cfg, eng, _corpus = built
    t = eng.search_join("zzznotinvocab", "foo", "foo")
    assert t.num_rows == 0


def test_validation(built):
    _root, _cfg, eng, _corpus = built
    with pytest.raises(ValueError):
        eng.search_join(Q, "foo", "foo", score_mode="sum")  # not a mode
    with pytest.raises(ValueError):
        eng.search_join(Q, "nope", "foo")
    with pytest.raises(ValueError):
        eng.search_join(Q, "foo", "text")  # text is not a metadata field


def test_sharded_identity(built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng, _corpus = built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=3)
    try:
        # order-free folds: bit-identical to the single engine
        for mode in ("none", "max", "min"):
            for limit in (3, 1_000_000):
                single = eng.search_join(
                    Q, "foo", "foo", score_mode=mode, limit=limit
                )
                fleet = svc.search_join(
                    Q, "foo", "foo", score_mode=mode, limit=limit
                )
                assert fleet.equals(single), (mode, limit)
        # float-sum modes: same membership/order, scores to 1e-9
        for mode in ("total", "avg"):
            single = eng.search_join(Q, "foo", "foo", score_mode=mode, limit=10**9)
            fleet = svc.search_join(Q, "foo", "foo", score_mode=mode, limit=10**9)
            assert fleet["url"].equals(single["url"]), mode
            np.testing.assert_allclose(
                fleet["score"].to_numpy(), single["score"].to_numpy(),
                rtol=1e-12, atol=0,
            )
        with pytest.raises(ValueError):
            svc.search_join(Q, "foo", "foo", limit=0)
        with pytest.raises(ValueError):
            svc.search_join(Q, "foo", "foo", score_mode="sum")
    finally:
        svc.shutdown()


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
        c.index_map("col", "a", {"text": "alpha alpha beta", "tag": "red"})
        c.index_map("col", "b", {"text": "alpha gamma", "tag": "red"})
        c.index_map("col", "d", {"text": "delta epsilon", "tag": "blue"})
        c.index_map("col", "e", {"text": "alpha", "tag": "blue"})

        # 'alpha' matches a/b/e; joined tags red+blue cover everything.
        # ScoreMode.max: each doc carries its tag's best alpha score.
        rows = c.search_join("col", "alpha", "tag", "tag", score_mode="max")
        assert {r["_externalId"] for r in rows} == {"a", "b", "d", "e"}
        # facade twin is identical
        ent = facade.search_join("col", "alpha", "tag", "tag", score_mode="max")
        assert [(e.external_id, e.score) for e in ent] == [
            (r["_externalId"], r["_score"]) for r in rows
        ]
        # 'delta' matches only d (tag blue) -> joined docs = blue docs
        rows = c.search_join("col", "delta", "tag", "tag")
        assert {r["_externalId"] for r in rows} == {"d", "e"}

        # engine-side validation surfaces as 400, not 500
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            c.search_join("col", "alpha", "tag", "tag", score_mode="sum")
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            c.search_join("col", "alpha", "nope", "tag")
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            c.search_join("col", "", "tag", "tag")
        assert ei.value.code == 400
    finally:
        service.shutdown()
