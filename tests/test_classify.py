"""Naive-Bayes classification — Lucene classification-module analogue
(SimpleNaiveBayesClassifier; SearchEngine.classify,
ShardedSearcherService.classify).

Contract: score(c) = ln(n_c/N) + Σ_occurrences ln((df(tok∧c)+1)/(n_c+V)),
every input an exact integer from posting intersections."""

import math

import numpy as np
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.analysis import analyze
from lucene_plugin_ray.pipelines.fixtures import make_pages

PROBE = "w00010 w00010 w00020"  # repeated token: occurrences must weigh


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root = str(tmp_path_factory.mktemp("idx_cls"))
    cfg = IndexConfig(
        index_root=root, num_partitions=4, field_columns=("foo", "age")
    )
    corpus = make_pages(400, seed=83, with_fields=True)
    build_index(corpus, cfg)
    return root, cfg, SearchEngine(root, cfg=cfg), corpus


def _latest(corpus):
    best = {}
    for url, ts, text, age in zip(
        corpus["url"].to_pylist(), corpus["warc_ts"].to_pylist(),
        corpus["text"].to_pylist(), corpus["age"].to_pylist(),
    ):
        cur = best.get(url)
        if cur is None or ts > cur[0]:
            best[url] = (ts, text, age)
    return best


def _expected(corpus, probe):
    docs = _latest(corpus)
    n_c: dict[str, int] = {}
    df: dict[tuple[str, str], int] = {}
    vocab = set()
    for _, (_ts, text, age) in docs.items():
        toks = set(analyze(text))
        vocab |= toks
        for c in set(analyze(age)):
            n_c[c] = n_c.get(c, 0) + 1
            for w in toks:
                df[(w, c)] = df.get((w, c), 0) + 1
    ptoks = analyze(probe)
    n_total = sum(n_c.values())
    rows = []
    for c in sorted(n_c):
        s = math.log(n_c[c] / n_total)
        for w in ptoks:
            s += math.log((df.get((w, c), 0) + 1) / (n_c[c] + len(vocab)))
        rows.append((c, s))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows


def test_classify_matches_bruteforce_bitexact(built):
    _root, _cfg, eng, corpus = built
    want = _expected(corpus, PROBE)
    got = eng.classify(PROBE, "age")
    assert got.num_rows == len(want) == 10  # ten age classes in the fixture
    assert got["class"].to_pylist() == [c for c, _ in want]
    np.testing.assert_array_equal(
        got["score"].to_numpy(), np.array([s for _, s in want])
    )


def test_repeated_tokens_weigh(built):
    """'w w x' scores differently from 'w x' — per-occurrence likelihoods."""
    _root, _cfg, eng, _corpus = built
    once = dict(zip(*(eng.classify("w00010 w00020", "age").columns[i].to_pylist() for i in (0, 1))))
    twice = dict(zip(*(eng.classify(PROBE, "age").columns[i].to_pylist() for i in (0, 1))))
    assert set(once) == set(twice)
    assert all(twice[c] < once[c] for c in once)  # one more ln(<1) term


def test_unknown_token_smoothing(built):
    """A vocabulary-free probe still classifies (add-one smoothing); the
    ranking then follows the class priors exactly."""
    _root, _cfg, eng, _corpus = built
    t = eng.classify("zzznotinvocab", "age")
    assert t.num_rows == 10
    n_c, _df = eng.classify_partials("zzznotinvocab", "age")
    vocab = eng.text_vocab_size()
    n_total = sum(n_c.values())
    want = sorted(
        ((c, math.log(n / n_total) + math.log(1.0 / (n + vocab)))
         for c, n in n_c.items()),
        key=lambda r: (-r[1], r[0]),
    )
    assert t["class"].to_pylist() == [c for c, _ in want]
    np.testing.assert_allclose(
        t["score"].to_numpy(), [s for _, s in want], rtol=0, atol=1e-12
    )


def test_validation(built):
    _root, _cfg, eng, _corpus = built
    with pytest.raises(ValueError):
        eng.classify("the and of", "age")  # all stop words → zero tokens
    with pytest.raises(ValueError):
        eng.classify("w00010", "nope")


def test_vocab_size_matches_live_distinct(built):
    """On a delete-free index the dictionary-union V equals the live
    distinct analyzed vocabulary."""
    _root, _cfg, eng, corpus = built
    docs = _latest(corpus)
    vocab = set()
    for _, (_ts, text, _age) in docs.items():
        vocab |= set(analyze(text))
    assert eng.text_vocab_size() == len(vocab)
    assert eng.text_vocab_hashes().size == len(vocab)  # no 64-bit collisions


def test_sharded_identity(built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng, _corpus = built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=3)
    try:
        for probe in (PROBE, "w00001", "zzznotinvocab"):
            single = eng.classify(probe, "age")
            fleet = svc.classify(probe, "age")
            assert fleet.equals(single), probe  # bit-identical driver fold
        with pytest.raises(ValueError):
            svc.classify("the", "age")
        with pytest.raises(ValueError):
            svc.classify("w00001", "nope")
    finally:
        svc.shutdown()


# ------------------------------------------------- KNN classifier -----------


def test_classify_knn_matches_vote_recompute(built):
    """Votes recomputed from the engine's own MLT hits + the corpus class
    values — integer-exact identity."""
    _root, _cfg, eng, corpus = built
    probe = "w00010 w00011 w00012 w00013 w00014"
    hits = eng.more_like_this(probe, max_query_terms=5, limit=10**9)
    docs = _latest(corpus)
    import numpy as np
    votes: dict[str, list[int]] = {}
    for u, s in zip(hits["url"].to_pylist(), hits["score"].to_pylist()):
        v = int(np.floor(round(s, 4) * 1e4 + 0.5))
        for c in set(analyze(docs[u][2])):  # age tokens
            a = votes.setdefault(c, [0, 0])
            a[0] += v
            a[1] += 1
    got = eng.classify_knn(probe, "age", k=10**9, max_query_terms=5)
    want = sorted(votes.items(), key=lambda kv: (-kv[1][0], kv[0]))
    assert got["class"].to_pylist() == [c for c, _ in want]
    assert got["vote_units"].to_pylist() == [a[0] for _, a in want]
    assert got["hits"].to_pylist() == [a[1] for _, a in want]


def test_classify_knn_finite_k_uses_topk_only(built):
    _root, _cfg, eng, _corpus = built
    probe = "w00010 w00011 w00012"
    small = eng.classify_knn(probe, "age", k=5, max_query_terms=3)
    big = eng.classify_knn(probe, "age", k=10**9, max_query_terms=3)
    assert sum(small["hits"].to_pylist()) == 5
    assert sum(big["hits"].to_pylist()) > 5


def test_classify_knn_sharded_identity(built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng, _corpus = built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=3)
    try:
        for k in (7, 10**9):
            single = eng.classify_knn("w00010 w00020", "age", k=k,
                                      max_query_terms=4)
            fleet = svc.classify_knn("w00010 w00020", "age", k=k,
                                     max_query_terms=4)
            assert fleet.equals(single), k
        with pytest.raises(ValueError):
            svc.classify_knn("w00010", "nope")
    finally:
        svc.shutdown()


def test_classify_knn_no_hits_empty(built):
    _root, _cfg, eng, _corpus = built
    with pytest.raises(ValueError):
        eng.classify_knn("w00010", "nope")


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
        c.index_map("col", "a", {"text": "alpha beta alpha", "tag": "red"})
        c.index_map("col", "b", {"text": "alpha gamma", "tag": "red"})
        c.index_map("col", "d", {"text": "delta epsilon zeta", "tag": "blue"})
        c.index_map("col", "e", {"text": "delta beta", "tag": "blue"})

        rows = c.classify("col", "alpha beta", "tag")
        assert [r["class"] for r in rows] == ["red", "blue"]
        ent = facade.classify("col", "alpha beta", "tag")
        assert [(r["class"], r["score"]) for r in rows] == [
            (cl, s) for cl, s in ent
        ]
        knn = c.classify_knn("col", "alpha beta", "tag", k=3)
        assert knn and knn[0]["class"] == "red"
        assert sum(r["hits"] for r in knn) == 3

        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            c.classify("col", "the and", "tag")  # zero tokens → 400
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            c.classify_knn("col", "alpha", "nope")
        assert ei.value.code == 400
    finally:
        service.shutdown()


# ------------------------------------------------------ index_stats ---------


def test_index_stats_semantics(built, tmp_path):
    """vocab = cross-segment distinct terms, postings = Σ dictionary df,
    docs_alive vs docs_stored diverge after a delete (numDocs vs maxDoc)."""
    from lucene_plugin_ray.pipelines.build import build_index, delete_docs
    from lucene_plugin_ray.pipelines.query import SearchEngine
    import pyarrow as pa

    _root, _cfg, eng, corpus = built
    t = eng.index_stats()
    by = {r["field"]: r for r in t.to_pylist()}
    assert set(by) == {"text", "foo", "age"}
    # vocab for text equals the cached exact distinct count
    assert by["text"]["vocab"] == eng.text_vocab_size()
    # single-valued metadata: every live doc carries exactly one age token
    docs = by["age"]["docs_alive"]
    assert by["age"]["postings"] == docs  # no deletes in this fixture yet
    assert by["age"]["docs_stored"] >= docs  # dup-url older versions stored

    # deletes: docs_alive drops, stored postings stay (Lucene maxDoc parity)
    root2 = str(tmp_path / "stats_del")
    cfg2 = IndexConfig(index_root=root2, num_partitions=2)
    build_index(
        pa.table(
            {
                "url": pa.array(["doc://a", "doc://b"], pa.string()),
                "warc_ts": pa.array([1, 2], pa.timestamp("us")),
                "text": pa.array(["alpha beta", "alpha gamma"], pa.string()),
            }
        ),
        cfg2,
    )
    delete_docs(
        cfg2,
        pa.table(
            {"collection": pa.array(["default"], pa.string()),
             "url": pa.array(["doc://b"], pa.string())}
        ),
    )
    e2 = SearchEngine(root2, cfg=cfg2)
    s2 = {r["field"]: r for r in e2.index_stats().to_pylist()}
    assert s2["text"]["docs_alive"] == 1
    assert s2["text"]["docs_stored"] == 2
    assert s2["text"]["postings"] == 4  # stored (pre-delete) dictionary dfs
